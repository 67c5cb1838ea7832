package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's pure pieces: median policy, the outlier
  * (load-window) trigger, and the quiet-window history parse that
  * feeds it. The end-to-end adaptive path re-uses exactly these —
  * deliberately loading the machine in a test is not reproducible, so
  * the decision logic is pinned here instead.
  */
class BenchSpec extends AnyFunSuite {

  test("median: odd takes middle, even averages the two middle, empty is -1") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0)) == 2.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
    assert(Bench.median(Nil) == -1.0)
  }

  test("isInflated: fires above 3x quiet history, not at routine noise") {
    assert(!Bench.isInflated(1.4, 1.0))  // ±30-50% machine noise
    assert(!Bench.isInflated(3.0, 1.0))  // exactly 3x: boundary stays calm
    assert(Bench.isInflated(3.01, 1.0))
    assert(Bench.isInflated(19.9, 0.68)) // the r08 artifact's q04
    assert(!Bench.isInflated(5.0, 0.0))  // no/invalid history → never
    assert(!Bench.isInflated(5.0, -1.0))
  }

  test("parseHistory: reads its own output shape, gated on matching sf") {
    val json = """{"metric":"total","value":7.99,"unit":"sec","queries":{"q01":0.5,"p04":3.878001153},"runs":{"q01":[0.5]},"full":{"q09":0.2},"full_total":8.1,"failures":[],"sf":"/root/testdata/sf0.1"}"""
    val h = Bench.parseHistory(json, "/root/testdata/sf0.1")
    // BOTH maps feed the outlier guard: headline medians (`queries`)
    // and the best-of-2 sweep singles (`full`) — so sweep entries are
    // re-measured under load windows too, not just the headline set
    assert(h == Map("q01" -> 0.5, "p04" -> 3.878001153, "q09" -> 0.2))
    // a key in both maps takes the headline median (stronger estimate)
    val dup = """{"queries":{"q01":0.5},"full":{"q01":9.9},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseHistory(dup, "/root/testdata/sf0.1") == Map("q01" -> 0.5))
    // a DIFFERENT sf must yield no history (an sf0.001 artifact would
    // make every sf0.1 median look 100x inflated)
    assert(Bench.parseHistory(json, "/root/testdata/sf0.001").isEmpty)
    // garbage never throws — the bench must run without history
    assert(Bench.parseHistory("not json", "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parseHistory("""{"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1").isEmpty)
    // a full-map-only artifact still yields history (sweep guard alive
    // even if the queries map were ever empty)
    assert(Bench.parseHistory(
      """{"full":{"q09":0.2},"sf":"/root/testdata/sf0.1"}""",
      "/root/testdata/sf0.1") == Map("q09" -> 0.2))
  }

  test("mergeHistory: a loaded re-run cannot raise any committed key") {
    val history = Map("q01" -> 0.5, "p04" -> 3.0, "q09" -> 0.2, "q10" -> 0.4)
    // capture under ~1.5x ambient load, plus one genuine improvement
    // (p04) and one brand-new query (p47); q10 failed this run
    val head = Seq("q01" -> 0.75, "p04" -> 2.6)
    val full = Seq("q09" -> 0.31, "p47" -> 1.1)
    val (mq, mf) = Bench.mergeHistory(history, head, full)
    // loaded keys keep their committed quiet-window minimum…
    assert(mq.toMap == Map("q01" -> 0.5, "p04" -> 2.6)) // …improvements land
    // sweep keys min-merge too; new keys enter at capture; the key that
    // failed this run is carried forward, not forgotten
    assert(mf.toMap == Map("q09" -> 0.2, "p47" -> 1.1, "q10" -> 0.4))
    // the ratchet property itself: no merged value exceeds its history
    (mq ++ mf).foreach { case (k, v) =>
      history.get(k).foreach(h => assert(v <= h, s"$k ratcheted: $v > $h")) }
    // no history at all (first run / sf mismatch) → capture passes through
    val (eq, ef) = Bench.mergeHistory(Map.empty, head, full)
    assert(eq == head && ef == full)
    // a non-positive history value must not lock the key at an
    // invalid floor
    val (zq, _) = Bench.mergeHistory(Map("q01" -> -1.0), Seq("q01" -> 0.3), Nil)
    assert(zq.toMap == Map("q01" -> 0.3))
  }

  test("loadHistory: a driver overwrite of BENCH_full.json cannot raise committed history") {
    // the r12 failure mode, now structurally closed: the driver
    // clobbers BENCH_full.json at round end, so the canonical history
    // lives in tools/bench_history.json (driver never writes tools/)
    // and loadHistory takes the per-key MIN across both files
    val dir = java.nio.file.Files.createTempDirectory("graft-bench-hist")
    def write(name: String, queries: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p,
        s"""{"metric":"total","value":1,"unit":"sec","queries":$queries,"sf":"/root/testdata/sf0.1"}"""
          .getBytes("UTF-8"))
      p.toString
    }
    val hist = write("bench_history.json", """{"q01":0.5,"q02":0.4}""")
    // the driver's overwrite: q01 inflated 10x, q02 gone, q03 new+lower
    val full = write("BENCH_full.json", """{"q01":5.0,"q03":0.3}""")
    val h = Bench.loadHistory("/root/testdata/sf0.1", Seq(hist, full))
    // committed keys hold their minimum; the clobber cannot raise them
    assert(h == Map("q01" -> 0.5, "q02" -> 0.4, "q03" -> 0.3))
    // mirror-only history (fresh checkout before the first merged run)
    // still feeds the guard; a missing file contributes nothing
    val missing = dir.resolve("absent.json").toString
    assert(Bench.loadHistory("/root/testdata/sf0.1", Seq(missing, full)) ==
      Map("q01" -> 5.0, "q03" -> 0.3))
    // sf gate still applies per file
    assert(Bench.loadHistory("/root/testdata/sf0.001", Seq(hist, full)).isEmpty)
    // degenerate inputs degrade to no-history, never throw
    assert(Bench.loadHistory("/root/testdata/sf0.1", Seq.empty).isEmpty)
  }

  test("historyWriteAllowed: a different-sf run cannot erase the committed record") {
    // the r18 near-miss: a local sf0.001 iteration run would have
    // wholesale-replaced the sf0.1 canonical line (loadHistory's sf
    // gate protects reads, so the next sf0.1 run would have seen NO
    // history and restarted the ratchet from scratch)
    val committed =
      """{"metric":"total","value":7.4,"queries":{"q01":0.5},"sf":"/root/testdata/sf0.1"}"""
    assert(!Bench.historyWriteAllowed(Some(committed), "/root/testdata/sf0.001"))
    // same sf: the min-merge write proceeds
    assert(Bench.historyWriteAllowed(Some(committed), "/root/testdata/sf0.1"))
    // first run ever / missing file: allowed
    assert(Bench.historyWriteAllowed(None, "/root/testdata/sf0.001"))
    // corrupt line without a parseable sf: refresh allowed
    assert(Bench.historyWriteAllowed(Some("{broken"), "/root/testdata/sf0.1"))
    // sf comparison goes through the same escaping as the write side
    val esc = Verify.jsonEscape("/tmp/with\"quote").stripPrefix("\"").stripSuffix("\"")
    assert(Bench.historyWriteAllowed(
      Some(s"""{"queries":{},"sf":"$esc"}"""), "/tmp/with\"quote"))
  }

  test("loadFactor: median measured/history ratio; None without history") {
    // the r10 shape: a uniformly ~1.25x-loaded capture self-reports it
    val history = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    val lf = Bench.loadFactor(history,
      Seq("a" -> 1.25, "b" -> 2.5, "c" -> 5.0, "new" -> 9.9))
    assert(lf.contains(1.25))
    // robust to a single true regression among quiet keys
    val lf2 = Bench.loadFactor(history,
      Seq("a" -> 1.0, "b" -> 2.0, "c" -> 40.0))
    assert(lf2.contains(1.0))
    assert(Bench.loadFactor(Map.empty, Seq("a" -> 1.0)).isEmpty)
    assert(Bench.loadFactor(Map("a" -> 0.0), Seq("a" -> 1.0)).isEmpty)
  }
}
