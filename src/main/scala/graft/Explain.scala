package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of named
  * registered queries — the `.explain("formatted")` loop the build
  * brief prescribes after each operator lands.
  *
  * Usage: `runMain graft.Explain [sfDir] [queryName ...]`
  *  - an absolute first arg selects the data dir; otherwise
  *    `SPARK_GRAFT_SF_DIR` (default sf0.01 — the driver's correctness
  *    scale, and what the pre-consolidation ExplainTool defaulted to).
  *    Plans are scale-dependent through AQE thresholds, so audit at
  *    the scale you care about.
  *  - with no names: the headline set, else every registered query.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, named) = args.toSeq match {
      case d +: rest if d.startsWith("/") => (d, rest)
      case rest =>
        (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
          rest)
    }
    val names =
      if (named.nonEmpty) named
      else if (SparkEntry.headline.nonEmpty) SparkEntry.headline
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qmap = SparkEntry.queries // rebuildable def — hoist like Bench does
    names.foreach { n =>
      println(s"===== $n =====")
      qmap.get(n) match {
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable =>
            System.err.println(s"[explain] $n failed: ${e.getMessage}") }
        case None => System.err.println(s"[explain] unknown query '$n'")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

/** Back-compat alias — earlier round notes reference
  * `runMain graft.ExplainTool`; both entries drive the same audit. */
object ExplainTool {
  def main(args: Array[String]): Unit = Explain.main(args)
}
