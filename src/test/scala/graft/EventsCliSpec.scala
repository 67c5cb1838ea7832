package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The `graft events` CLI subcommand: parse contract + end-to-end runs
  * pinning CLI ≡ the library product-analytics operators per mode
  * ([[graft.operators.Relational.funnelSteps]] / `funnelStepsWithin` /
  * `funnelStepsAnchored` / `retentionCohorts` / `dedupEventsQuietGap`
  * — never a reimplementation, the DedupCliSpec shape). */
class EventsCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private lazy val eventsDir: String = {
    import spark.implicits._
    val dir = tmp("events-in")
    Seq(
      (1L, "A", "view", ts(0), 1.0), (2L, "A", "view", ts(90), 2.0),
      (3L, "A", "click", ts(100), 3.0), (4L, "A", "purchase", ts(105), 40.0),
      (5L, "B", "view", ts(0), 1.0), (6L, "B", "click", ts(5), 1.5),
      (7L, "B", "purchase", ts(12), 2.0),
      (8L, "C", "view", ts(0), 0.5), (9L, "C", "click", ts(50), 0.6),
      (10L, "C", "click", ts(52), 0.7))   // burst retry for quiet-gap
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("parseEventsArgs: surface, defaults, cross-mode flags loud, " +
      "required flags per mode") {
    import Main.parseEventsArgs
    val a = parseEventsArgs(Seq("-i", "/in", "-o", "/out",
      "--step", "view", "--step", "click", "--quiet"))
    assert(a.mode == "funnel" && a.steps == Seq("view", "click") &&
      a.keyColumn == "user_id" && a.tsColumn == "ts" &&
      a.typeColumn == "event_type" && a.quiet)
    val w = parseEventsArgs(Seq("-i", "/in", "-o", "/out",
      "--mode", "funnel-anchored", "--step", "v", "--within-sec", "60",
      "--anchor-cap", "50", "--key-column", "uid", "--ts-column", "at",
      "--type-column", "kind"))
    assert(w.withinSec.contains(60L) && w.anchorCap == 50 &&
      w.keyColumn == "uid" && w.tsColumn == "at" && w.typeColumn == "kind")
    val r = parseEventsArgs(Seq("-i", "/in", "-o", "/out",
      "--mode", "retention", "--period-sec", "604800",
      "--activity-period-sec", "86400"))
    assert(r.periodSec.contains(604800L) &&
      r.activityPeriodSec.contains(86400L))

    // cross-mode flags are loud
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "retention",
        "--period-sec", "60", "--step", "view")))
      .getMessage.contains("no effect"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--step", "v", "--window-sec", "9")))
      .getMessage.contains("no effect"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--step", "v", "--within-sec", "9")))
      .getMessage.contains("funnel-window"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "funnel-window", "--step", "v",
        "--within-sec", "9", "--anchor-cap", "5")))
      .getMessage.contains("--anchor-cap"))
    // resample/zscore surface: shared tie/value columns, own requireds
    val rs = parseEventsArgs(Seq("-i", "/in", "-o", "/out",
      "--mode", "resample", "--period-sec", "60",
      "--tie-column", "eid", "--value-column", "v"))
    assert(rs.periodSec.contains(60L) && rs.tieColumn == "eid" &&
      rs.valueColumn == "v")
    val z = parseEventsArgs(Seq("-i", "/in", "-o", "/out",
      "--mode", "zscore", "--window-rows", "10", "--threshold", "2.5",
      "--min-periods", "3"))
    assert(z.windowRows.contains(10) && z.threshold == 2.5 &&
      z.minPeriods == 3)
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "resample")))
      .getMessage.contains("--period-sec"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "zscore")))
      .getMessage.contains("--window-rows"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "zscore", "--window-rows", "1")))
      .getMessage.contains("--window-rows"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "zscore", "--window-rows", "5",
        "--min-periods", "9")))
      .getMessage.contains("--min-periods"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "zscore", "--window-rows", "5",
        "--threshold", "NaN"))).getMessage.contains("--threshold"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "retention",
        "--period-sec", "60", "--value-column", "v")))
      .getMessage.contains("no effect"))
    // per-mode required flags
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b"))).getMessage.contains("--step"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "funnel-window", "--step", "v")))
      .getMessage.contains("--within-sec"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "retention")))
      .getMessage.contains("--period-sec"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "quiet-gap")))
      .getMessage.contains("--window-sec"))
    intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "nope")))
    intercept[IllegalArgumentException](parseEventsArgs(Seq("--nope")))
    intercept[Main.CliExit](parseEventsArgs(Seq("--help")))
    // non-positive durations rejected AT PARSE TIME, naming the FLAG
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "quiet-gap",
        "--window-sec", "0"))).getMessage.contains("--window-sec"))
    assert(intercept[IllegalArgumentException](parseEventsArgs(
      Seq("-i", "a", "-o", "b", "--mode", "retention",
        "--period-sec", "-5"))).getMessage.contains("--period-sec"))
  }

  test("events: every mode ≡ its library operator") {
    val steps = Seq("view", "click", "purchase")
    val events = spark.read.parquet(eventsDir)
    val R = operators.Relational
    def run(a: Main.EventsArgs): Set[String] = {
      Main.runEvents(spark, a)
      spark.read.parquet(a.outputFile).collect().map(_.toString).toSet
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val base = Main.EventsArgs(input = eventsDir, quiet = true)

    assert(run(base.copy(outputFile = tmp("ev-f") + "/f.parquet",
        steps = steps)) ==
      rows(R.funnelSteps(events, "user_id", "ts", "event_type", steps)))
    assert(run(base.copy(mode = "funnel-window",
        outputFile = tmp("ev-w") + "/w.parquet", steps = steps,
        withinSec = Some(15L))) ==
      rows(R.funnelStepsWithin(events, "user_id", "ts", "event_type",
        steps, 15L)))
    assert(run(base.copy(mode = "funnel-anchored",
        outputFile = tmp("ev-a") + "/a.parquet", steps = steps,
        withinSec = Some(15L))) ==
      rows(R.funnelStepsAnchored(events, "user_id", "ts", "event_type",
        steps, 15L)))
    assert(run(base.copy(mode = "retention",
        outputFile = tmp("ev-r") + "/r.parquet",
        periodSec = Some(100L), activityPeriodSec = Some(20L))) ==
      rows(R.retentionCohorts(events, "user_id", "ts", 100L, 20L)))
    assert(run(base.copy(mode = "quiet-gap",
        outputFile = tmp("ev-g") + "/g.parquet",
        windowSec = Some(10L))) ==
      rows(R.dedupEventsQuietGap(events, Seq("user_id"), "ts",
        "event_id", 10L)))
    assert(run(base.copy(mode = "resample",
        outputFile = tmp("ev-rs") + "/rs.parquet",
        periodSec = Some(30L))) ==
      rows(R.resampleFfill(events, "user_id", "ts", "event_id",
        "value", 30L)))
    assert(run(base.copy(mode = "zscore",
        outputFile = tmp("ev-z") + "/z.parquet",
        windowRows = Some(3), threshold = 2.0)) ==
      rows(R.rollingZscore(events, "user_id", "ts", "event_id",
        "value", 3, 2.0)))
    // the first-touch window and the anchored form genuinely differ on
    // this fixture (user A's first view times out; the view@90 anchor
    // converts) — the CLI exposes the semantics ladder, not one alias
    val ft = run(base.copy(mode = "funnel-window",
      outputFile = tmp("ev-w2") + "/w.parquet", steps = steps,
      withinSec = Some(15L)))
    val an = run(base.copy(mode = "funnel-anchored",
      outputFile = tmp("ev-a2") + "/a.parquet", steps = steps,
      withinSec = Some(15L)))
    assert(ft != an)
    // a missing column fails at read validation, naming the flag
    assert(intercept[IllegalArgumentException](Main.runEvents(spark,
      base.copy(outputFile = tmp("x") + "/x.parquet", steps = steps,
        keyColumn = "nope"))).getMessage.contains("--key-column"))
  }

  test("events: a TIMESTAMP(NANOS) log (INT64 epoch-nanos ts) converts " +
      "with the exact Tables.events floor — CLI ≡ library on the " +
      "driver fixture") {
    // the driver's events.parquet is TIMESTAMP(NANOS); under the
    // session's nanosAsLong flag its ts reads as LongType, which the
    // CLI must floor to µs exactly like Tables.events before bucketing
    val fx = s"${TestSpark.sfDir}/events.parquet"
    val out = tmp("ev-nanos") + "/r.parquet"
    Main.runEvents(spark, Main.EventsArgs(mode = "retention",
      input = fx, outputFile = out, periodSec = Some(604800L),
      quiet = true))
    val got = spark.read.parquet(out).collect().map(_.toString).toSet
    val want = operators.Relational.retentionCohorts(
      Tables.events(spark, TestSpark.sfDir), "user_id", "ts",
      periodSec = 604800L).collect().map(_.toString).toSet
    assert(got.nonEmpty && got == want)
  }
}
