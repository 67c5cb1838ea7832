package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** mahalanobisScores' training half (moment collect + Gauss-Jordan
  * inverse) — the parts the p109 gate can't replay in SQL. */
class MahalanobisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scale-invariance: stretched axes score the same sigma distance") {
    import spark.implicits._
    // axis 0 has 4x the variance of axis 1; a point 2 std-devs out
    // along EITHER axis must score the same m2 (~4) — the property
    // that separates Mahalanobis from Euclidean outliering
    val base = (0 until 200).flatMap { i =>
      val t = (i % 21 - 10).toDouble / 5.0 // mean 0, var ~1.47
      Seq((i.toLong * 2, Seq((2 * t).toFloat, 0f, 0f, 0f)),
        (i.toLong * 2 + 1, Seq(0f, t.toFloat, 0f, 0f)))
    }
    val sigma = math.sqrt(base.map(r => r._2(1).toDouble * r._2(1)).sum / base.size)
    val probeA = (100000L, Seq((4 * sigma).toFloat, 0f, 0f, 0f))
    val probeB = (100001L, Seq(0f, (2 * sigma).toFloat, 0f, 0f))
    val df = (base :+ probeA :+ probeB).toDF("vec_id", "embedding")
    val m2 = operators.Pipeline.mahalanobisScores(df, "embedding", dim = 4)
      .filter(col("vec_id") >= 100000L)
      .select("vec_id", "m2")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // axis 0 carries 2x the std-dev, so 4σ along it is ~2 "its own"
    // std-devs — both probes sit ~2 normalized std-devs out
    assert(math.abs(m2(100000L) - m2(100001L)) < 0.35,
      s"stretched-axis probes should score alike, got $m2")
    assert(m2(100001L) > 3.0 && m2(100001L) < 6.0, s"~2σ² + mean term: $m2")
  }

  test("invert: A * inv(A) = I on seeded random matrices; singular rejected") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 5) {
      val n = 2 + rnd.nextInt(6)
      val a = Array.tabulate(n, n)((_, _) => rnd.nextDouble() * 4 - 2)
      // diagonal dominance keeps the random draw comfortably invertible
      (0 until n).foreach(i => a(i)(i) += n * 4.0)
      val inv = operators.MahalanobisMath.invert(a)
      for (i <- 0 until n; j <- 0 until n) {
        val cell = (0 until n).map(k => a(i)(k) * inv(k)(j)).sum
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(cell - want) < 1e-9, s"(A*inv)($i)($j) = $cell")
      }
    }
    intercept[IllegalArgumentException](
      operators.MahalanobisMath.invert(Array(Array(1.0, 2.0), Array(2.0, 4.0))))
  }

  test("constant dims regularize finitely; scores deterministic") {
    import spark.implicits._
    val df = (0 until 50).map(i =>
      (i.toLong, Seq((i % 7).toFloat, 5f, 0f, 0f))).toDF("vec_id", "embedding")
    val run = () => operators.Pipeline
      .mahalanobisScores(df, "embedding", dim = 4, eps = 1e-6)
      .orderBy("vec_id").select("m2").collect().map(_.getDouble(0))
    val a = run()
    assert(a.forall(v => !v.isNaN && !v.isInfinite),
      "constant dims must score finitely under eps regularization")
    assert(a.sameElements(run()), "two runs must be identical")
  }
}
