package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print the formatted physical plan of named
  * registered queries (all of them with no names given) against a
  * testdata dir — the `.explain("formatted")` loop the build brief
  * prescribes after each operator lands.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable =>
            System.err.println(s"[explain] $n failed: ${e.getMessage}") }
        case None => System.err.println(s"[explain] unknown query '$n'")
      }
    }
    spark.stop()
  }
}
