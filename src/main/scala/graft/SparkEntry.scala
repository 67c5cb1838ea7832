package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator suite's [[QueryDef]]s into the
  * queries / oracleSql maps the driver's verify + bench harness consumes.
  */
object SparkEntry {

  /** Every registered query across all operator suites. A duplicate
    * name would silently shadow one implementation through the toMap
    * below — Verify would then report full coverage while never
    * exercising the shadowed query — so it fails fast instead. */
  def all: Seq[QueryDef] = {
    val qs = operators.Relational.queries ++ operators.Types.queries ++
      operators.Pipeline.queries
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names across suites: ${dups.toSeq.sorted.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(sql => q.name -> sql.stripMargin.trim)).toMap

  /** Subset benchmarked by [[Bench]] (representative of each operator
    * class; the full set runs in Verify). */
  def headline: Seq[String] = all.filter(_.headline).map(_.name)
}
