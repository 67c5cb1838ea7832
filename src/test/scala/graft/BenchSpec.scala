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
}
