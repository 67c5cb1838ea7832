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

  test("cdcApply: latest version wins; tombstones drop keys; resurrection " +
      "works; NULL op is not a delete; ties break by the tie column") {
    import spark.implicits._
    val log = Seq(
      // key 1: I then U — latest U survives
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),
      // key 2: latest op is the tombstone → no current state
      (2L, 1L, "I", "c"), (2L, 2L, "D", "d"),
      // key 3: deleted then re-inserted → resurrected
      (3L, 1L, "D", "e"), (3L, 2L, "I", "f"),
      // key 4: NULL op is latest → kept (unclassified ≠ delete)
      (4L, 1L, "I", "g"), (4L, 2L, null.asInstanceOf[String], "h"),
      // key 5: same seq twice → the higher tie column wins
      (5L, 7L, "U", "old"), (5L, 7L, "U", "new"))
      .zipWithIndex.map { case ((k, sq, op, v), i) => (k, sq, i.toLong, op, v) }
      .toDF("key", "seq", "tie", "op", "v")
    val got = operators.Relational.cdcApply(log, Seq("key"),
      Seq("seq", "tie"), "op", deleteOp = "D")
      .select("key", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 3L -> "f", 4L -> "h", 5L -> "new"),
      s"got $got")
    assert(intercept[IllegalArgumentException](
      operators.Relational.cdcApply(log, Nil, Seq("seq"), "op", "D"))
      .getMessage.contains("keyCols"))
    assert(intercept[IllegalArgumentException](
      operators.Relational.cdcApply(log, Seq("key"), Nil, "op", "D"))
      .getMessage.contains("seqCols"))
  }

  test("scd2Merge: all five arms; closed history passes through; NULL " +
      "attrs compare null-safe; re-merging the same snapshot is a no-op") {
    import spark.implicits._
    def hist(rows: Seq[(Long, String, Option[String], Long, Option[Long])]) =
      rows.toDF("k", "a", "b", "valid_from", "valid_to")
    val history = hist(Seq(
      (1L, "x", Some("p"), 1L, Some(2L)),  // already closed: passthrough
      (1L, "y", Some("p"), 2L, None),      // open, unchanged in snapshot
      (2L, "z", None, 1L, None),           // open, attr b NULL — unchanged
      (3L, "w", Some("q"), 1L, None),      // open, CHANGES in snapshot
      (4L, "v", Some("r"), 1L, None)))     // open, DELETED from snapshot
    val snapshot = Seq(
      (1L, "y", Some("p")), (2L, "z", None),
      (3L, "w2", Some("q")),               // changed attr a
      (5L, "new", Some("s")))              // inserted key
      .toDF("k", "a", "b")
    val out = operators.Relational.scd2Merge(history, snapshot,
      Seq("k"), Seq("a", "b"), snapshotId = 3L)
    val got = out.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == Set(
      (1L, "x", Some("p"), 1L, Some(2L)),   // passthrough
      (1L, "y", Some("p"), 2L, None),       // stays open
      (2L, "z", None, 1L, None),            // NULL<=>NULL: stays open
      (3L, "w", Some("q"), 1L, Some(3L)),   // closed at 3
      (3L, "w2", Some("q"), 3L, None),      // reopened at 3
      (4L, "v", Some("r"), 1L, Some(3L)),   // delete closes
      (5L, "new", Some("s"), 3L, None)),    // insert opens
      s"got $got")
    // idempotence: folding the SAME snapshot again changes nothing
    val again = operators.Relational.scd2Merge(out, snapshot,
      Seq("k"), Seq("a", "b"), snapshotId = 4L)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(again == got, "re-merge was not a no-op")
    assert(intercept[IllegalArgumentException](
      operators.Relational.scd2Merge(history, snapshot, Nil, Seq("a"), 3L))
      .getMessage.contains("keyCols"))
    assert(intercept[IllegalArgumentException](
      operators.Relational.scd2Merge(history, snapshot, Seq("k"), Nil, 3L))
      .getMessage.contains("attrCols"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // an open row with a NULL valid_from must not vanish or skip its
    // close (presence is an explicit flag, not inferred from the
    // validity column — review r18.3)
    val nullFrom = Seq((9L, "old", Some("p"), Option.empty[Long],
      Option.empty[Long])).toDF("k", "a", "b", "valid_from", "valid_to")
    val gotNf = operators.Relational.scd2Merge(nullFrom,
      Seq((9L, "new", Some("p"))).toDF("k", "a", "b"),
      Seq("k"), Seq("a", "b"), snapshotId = 5L)
      .collect().map(r => (r.getString(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(gotNf == Set(("old", Some(5L)), ("new", None)), s"got $gotNf")
    // duplicate snapshot keys (and duplicate OPEN history rows) fail
    // loudly instead of emitting overlapping validity
    val dupSnap = Seq((1L, "y", Some("p")), (1L, "y2", Some("p")))
      .toDF("k", "a", "b")
    val eDup = intercept[Exception](operators.Relational.scd2Merge(
      history, dupSnap, Seq("k"), Seq("a", "b"), 3L).collect())
    assert(msgs(eDup).exists(_.contains("duplicate snapshot key")))
    val dupOpen = hist(Seq((1L, "y", Some("p"), 1L, None),
      (1L, "y2", Some("p"), 2L, None)))
    val eDup2 = intercept[Exception](operators.Relational.scd2Merge(
      dupOpen, snapshot, Seq("k"), Seq("a", "b"), 3L).collect())
    assert(msgs(eDup2).exists(_.contains("duplicate open-history key")))
  }

  test("funnelSteps: greedy earliest completion; strict ordering; " +
      "same-timestamp events never advance; counts non-increasing") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      // user 1 completes all three in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: click at the SAME instant as view → not progress;
      // a later purchase without a click cannot complete the funnel
      (2L, "view", ts(1)), (2L, "click", ts(1)), (2L, "purchase", ts(5)),
      // user 3: click BEFORE the first view doesn't count; the one
      // after does
      (3L, "click", ts(1)), (3L, "view", ts(2)), (3L, "click", ts(3)),
      // user 4 never views
      (4L, "purchase", ts(1)),
      // user 5's only view has no timestamp → not a funnel ENTRY
      // (review r18.4: min() ignoring the NULL would still have
      // counted the group)
      (5L, "view", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("user_id", "event_type", "ts")
    val got = operators.Relational.funnelSteps(events, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L),
      (3, "purchase", 1L)), s"got $got")
    assert(intercept[IllegalArgumentException](
      operators.Relational.funnelSteps(events, "user_id", "ts",
        "event_type", Nil)).getMessage.contains("steps"))
    assert(intercept[IllegalArgumentException](
      operators.Relational.funnelSteps(events, "user_id", "ts",
        "event_type", Seq("view", "view"))).getMessage.contains("duplicate"))
  }

  test("retentionCohorts: first-activity period is the cohort; offsets " +
      "count returning keys; NULL timestamps ignored") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      ("A", Some(ts(50))), ("A", Some(ts(150))), ("A", Some(ts(350))),
      ("A", Some(ts(160))),           // same period as 150 — distinct'd
      ("B", Some(ts(150))), ("B", Some(ts(250))),
      ("C", Some(ts(50))), ("C", None))
      .toDF("user_id", "ts")
    val got = operators.Relational.retentionCohorts(events, "user_id",
      "ts", periodSec = 100L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L), s"got $got")
    assert(intercept[IllegalArgumentException](
      operators.Relational.retentionCohorts(events, "user_id", "ts", 0L))
      .getMessage.contains("periodSec"))
    // far-range timestamps bucket by EXACT int64 floorDiv (r18 ADVICE:
    // Long `/` is double division in Spark — exact only below 2^53
    // epoch-µs, ~year 2255; `div` must hold to the timestamp limits)
    // pre-1970 but post-1582 (java.sql.Timestamp values before the
    // Gregorian cutover rebase by days on ingest — a calendar shift,
    // not a division concern), plus the >2^53-µs far future
    val farSecs = Seq(-5000000000L,            // year 1811
      13569465601L, 17987443199L, 9200000000000L) // 2400, 2540, ~293.5k
    val far = farSecs.map(s => ("F", Some(ts(s)))).toDF("user_id", "ts")
    val buckets = operators.Relational
      .retentionCohorts(far, "user_id", "ts", periodSec = 604800L)
      .collect().map(r => r.getLong(0) + r.getLong(1)).toSet
    val expected = farSecs
      .map(s => Math.floorDiv(s * 1000000L, 604800L * 1000000L)).toSet
    assert(buckets == expected, s"got $buckets vs $expected")
  }

  test("funnelStepsWithin: first-touch anchor, inclusive deadline, no " +
      "re-anchoring at later step-1 events") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      ("A", "view", 0L), ("A", "click", 10L), ("A", "purchase", 20L),
      ("B", "view", 0L), ("B", "click", 5L), ("B", "purchase", 12L),
      // C: the click fits a window anchored at the SECOND view but not
      // the first — first-touch semantics must NOT convert it
      ("C", "view", 0L), ("C", "view", 90L), ("C", "click", 100L),
      // D: click exactly AT the deadline — inclusive, converts
      ("D", "view", 0L), ("D", "click", 15L))
      .map { case (u, e, s) => (u, e, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val got = operators.Relational.funnelStepsWithin(events, "user_id",
      "ts", "event_type", Seq("view", "click", "purchase"), withinSec = 15L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 3L),
      (3, "purchase", 1L)), s"got $got")
    assert(intercept[IllegalArgumentException](
      operators.Relational.funnelStepsWithin(events, "user_id", "ts",
        "event_type", Seq("view"), 0L)).getMessage.contains("withinSec"))
  }

  test("funnelStepsAnchored: ∃ over step-1 anchors — a timed-out first " +
      "touch does not doom a later attempt; anchorCap is loud") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      // A: first-touch view@0 times out for the click@100 (T=15), but
      // the view@90 anchor converts — anchored counts it, q45 doesn't
      ("A", "view", 0L), ("A", "view", 90L), ("A", "click", 100L),
      // B: converts from the first anchor; purchase within 15 of ITS
      // anchor start
      ("B", "view", 0L), ("B", "click", 5L), ("B", "purchase", 12L),
      // C: click after every anchor's deadline → step 1 only
      ("C", "view", 0L), ("C", "click", 50L))
      .map { case (u, e, s) => (u, e, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val got = operators.Relational.funnelStepsAnchored(events, "user_id",
      "ts", "event_type", Seq("view", "click", "purchase"),
      withinSec = 15L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L),
      (3, "purchase", 1L)), s"got $got")
    // the first-touch variant misses A's conversion — the semantic gap
    // the anchored form exists to close
    val firstTouch = operators.Relational.funnelStepsWithin(events,
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
      withinSec = 15L)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(firstTouch(2) == 1L)
    // hot-key anchor cap raises loudly
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception](
      operators.Relational.funnelStepsAnchored(events, "user_id", "ts",
        "event_type", Seq("view", "click"), withinSec = 15L,
        anchorCap = 1).collect())
    assert(msgs(e).exists(_.contains("anchorCap")), s"got ${msgs(e)}")
    assert(intercept[IllegalArgumentException](
      operators.Relational.funnelStepsAnchored(events, "user_id", "ts",
        "event_type", Seq("view"), withinSec = 0L))
      .getMessage.contains("withinSec"))
  }

  test("retentionCohorts dual-grain: weekly-style cohorts at finer " +
      "activity buckets; offsets count activity periods since cohort start") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // cohort grain 100 s, activity grain 20 s (ratio 5)
    val events = Seq(
      ("A", ts(50)),   // p=2 → cohort ⌊2/5⌋=0, offset 2
      ("A", ts(130)),  // p=6 → offset 6
      ("B", ts(210)))  // p=10 → cohort 2, offset 0
      .toDF("user_id", "ts")
    val got = operators.Relational.retentionCohorts(events, "user_id",
      "ts", cohortPeriodSec = 100L, activityPeriodSec = 20L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(got == Map((0L, 2L) -> 1L, (0L, 6L) -> 1L, (2L, 0L) -> 1L),
      s"got $got")
    assert(intercept[IllegalArgumentException](
      operators.Relational.retentionCohorts(events, "user_id", "ts",
        cohortPeriodSec = 90L, activityPeriodSec = 20L))
      .getMessage.contains("multiple"))
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
