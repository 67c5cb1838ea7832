package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":…,"value":…,"queries":{…}} for the
  * driver's BENCH_r{N}.json. Each query is forced with a count() action
  * (full plan execution, no result materialization on the driver).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // `all` medians-of-3 the whole suite; named args time just those;
    // no args = headline medians + a single-shot full sweep (below)
    val names =
      if (args.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else if (SparkEntry.headline.nonEmpty) SparkEntry.headline
      else SparkEntry.queries.keys.toSeq.sorted
    val qmap = SparkEntry.queries

    // warm EVERY query that will be timed — including the full-sweep
    // set on a default run — so file-listing/codegen/JIT costs don't
    // land inside any timed number (ADVICE r01: head-only warm-up
    // skewed q03+; r07 review: an unwarmed sweep re-imports the same
    // skew into the `full` deltas)
    val sweepNames =
      if (args.nonEmpty) Nil
      else qmap.keys.toSeq.sorted.filterNot(names.contains)
    (names ++ sweepNames).foreach { n =>
      try qmap(n)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] warm $n failed: $e") }
      // drop intra-query persists (p02) between runs: each timed run
      // must pay its own build, not time a cached re-read, and cached
      // blocks must not occupy memory during other queries' runs
      spark.catalog.clearCache()
    }

    // median of 3 timed runs per query: single-shot numbers on a shared
    // machine carry 20-30% noise, which reads as phantom regressions in
    // round-over-round comparisons. Failed runs are EXCLUDED from the
    // median and reported in a "failures" key (ADVICE r04: a silent
    // time-to-failure skewed the median with no marker in the JSON).
    def timedRun(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { qmap(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e"); false }
      val elapsed = (System.nanoTime() - t0) / 1e9 // before cache teardown
      spark.catalog.clearCache()
      if (ok) Some(elapsed) else None
    }

    val results = names.map { name =>
      val times = (1 to 3).flatMap(_ => timedRun(name))
      // even counts (a partially-failed query) average the two middle
      // values — upper-middle alone would report the SLOWER of 2 runs as
      // the "median" (ADVICE r05). Such a query appears in BOTH `queries`
      // (its median over successful runs) and `failures` (a marker that
      // not all 3 runs succeeded) by design.
      val median = if (times.isEmpty) -1.0 else {
        val s = times.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
      (name, median, times, times.size < 3)
    }
    val good = results.filter(_._2 >= 0)
    val qs = good.map { case (k, v, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // all three raw per-run times, not just the median: a regression
    // that is really shared-machine noise shows as one outlier run;
    // a real one shows in all three (VERDICT r06 asked for this to
    // separate the two without a bisect)
    val runs = good.map { case (k, _, ts, _) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]") }.mkString("{", ",", "}")
    val headFailed = results.filter(_._4).map(_._1)
    val total = good.map(_._2).sum

    // full-suite sweep (default run only): ONE timed (pre-warmed) pass
    // over every registered query not already medianed above, so
    // non-headline regressions are visible round-over-round —
    // single-shot times, comparable as deltas, cheap enough to run
    // every round. Explicit `all` arg instead medians-of-3 everything.
    val fullSingles = sweepNames.map(n => (n, timedRun(n)))
    val fullGood = fullSingles.collect { case (n, Some(t)) => (n, t) }
    val fullJson = fullGood.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullTotal = total + fullGood.map(_._2).sum
    val failures = (headFailed ++ fullSingles.collect { case (n, None) => n })
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"full":$fullJson,"full_total":$fullTotal,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
  }
}
