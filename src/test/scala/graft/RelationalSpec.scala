package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Checks for relational queries whose semantics the DuckDB oracle
  * cannot pin down exactly. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q31: HLL++ estimate lands within tolerance of the exact count") {
    val rows = SparkEntry.queries("q31_approx_count_distinct")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val exact = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == exact.keySet)
    rows.foreach { case (k, n, ok) =>
      assert(n == exact(k), s"flag $k: exact count mismatch")
      assert(ok, s"flag $k: sketch drifted past 10% of exact (5×rsd=0.02)")
    }
  }

  test("q32: salted two-phase aggregation equals the direct plan") {
    import QueryDef._
    val salted = SparkEntry.queries("q32_salted_agg")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val direct = Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == direct)
  }
}
