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

  test("dedupEventsQuietGap: bursts keep their first event; a full quiet " +
      "gap re-admits; NULL timestamps are kept; keys isolate") {
    import spark.implicits._
    def ts(s: Long): java.sql.Timestamp = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      // user 1 / click: a burst at t=0,10,20 then quiet until t=200
      (1L, 1L, "click", Some(ts(0))),
      (2L, 1L, "click", Some(ts(10))),
      (3L, 1L, "click", Some(ts(20))),
      (4L, 1L, "click", Some(ts(200))),
      // gap exactly == window is still a duplicate (strict >)
      (5L, 1L, "click", Some(ts(300))),
      // other keys are independent even at identical timestamps
      (6L, 1L, "view", Some(ts(1))),
      (7L, 2L, "click", Some(ts(1))),
      // an ingest-failure row is not evidence of a retry
      (8L, 1L, "click", None))
      .toDF("event_id", "user_id", "event_type", "ts")
    val kept = operators.Relational.dedupEventsQuietGap(events,
      Seq("user_id", "event_type"), "ts", "event_id", windowSec = 100L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // 1 (first), 4 (gap 180 > 100), 6/7 (own keys), 8 (NULL ts);
    // 2/3 are burst retries, 5's gap is exactly 100 → still a duplicate
    assert(kept == Set(1L, 4L, 6L, 7L, 8L), s"kept $kept")
    assert(intercept[IllegalArgumentException](
      operators.Relational.dedupEventsQuietGap(events, Nil, "ts",
        "event_id", 100L)).getMessage.contains("keyCols"))
    assert(intercept[IllegalArgumentException](
      operators.Relational.dedupEventsQuietGap(events, Seq("user_id"),
        "ts", "event_id", 0L)).getMessage.contains("windowSec"))
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
