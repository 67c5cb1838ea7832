package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** pcaFit/pcaProject/embeddingMeanCov: the training math the p105/p106
  * gates can't carry (eigensolves have no DuckDB replay) — known-axis
  * recovery, orthonormality, eigenvalue/variance agreement,
  * determinism. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fetchBasis(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("component").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Double](2).toArray))

  test("pcaFit recovers a planted principal axis") {
    import spark.implicits._
    // points spread along (0.6, 0.8, 0, 0) with small variance on axis 2
    val data = (0 until 400).map { i =>
      val t = (i % 21 - 10).toDouble       // main-axis coordinate, mean 0
      val n = ((i * 7) % 5 - 2).toDouble * 0.05
      (i.toLong, Seq(0.6f * t.toFloat, 0.8f * t.toFloat, n.toFloat, 0f))
    }.toDF("vec_id", "embedding")
    val b = fetchBasis(operators.Pipeline.pcaFit(data, "embedding",
      dim = 4, nComponents = 2))
    val u0 = b(0)._3
    assert(math.abs(u0(0) - 0.6) < 1e-6 && math.abs(u0(1) - 0.8) < 1e-6 &&
      math.abs(u0(2)) < 1e-3 && math.abs(u0(3)) < 1e-9,
      s"first component should be the planted axis, got ${u0.toSeq}")
    assert(b(0)._2 > b(1)._2 && b(1)._2 >= -1e-9,
      "eigenvalues must descend and stay non-negative")
  }

  test("fixture embeddings: orthonormal basis, eigenvalue ≈ projected variance, descending") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val fit = operators.Pipeline.pcaFit(e, "embedding", dim = 64,
      nComponents = 5)
    val b = fetchBasis(fit)
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, c) => a * c }.sum
    for (i <- b.indices; j <- i until b.length) {
      val d = dot(b(i)._3, b(j)._3)
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"|u$i| != 1")
      else assert(math.abs(d) < 1e-6, s"u($i).u($j) = $d not orthogonal")
    }
    assert(b.map(_._2).sliding(2).forall(p => p(0) >= p(1) - 1e-9),
      "eigenvalues must be descending")
    // projected per-component sample variance must match the eigenvalue
    // (population variance; float-quantized projection → loose 1e-3)
    val proj = operators.Pipeline.pcaProject(e, "embedding", fit)
    val stats = proj.select((0 until 5).map(c =>
      element_at(col("pca"), c + 1).cast("double").as(s"p$c")): _*)
    val n = stats.count().toDouble
    val row = stats.agg(
      expr("avg(p0)"), expr("avg(p0*p0)"), expr("avg(p1)"), expr("avg(p1*p1)"),
      expr("avg(p2)"), expr("avg(p2*p2)")).collect().head
    for (c <- 0 until 3) {
      val mean = row.getDouble(2 * c)
      val varP = row.getDouble(2 * c + 1) - mean * mean
      assert(math.abs(varP - b(c)._2) < 1e-3 * math.max(1.0, b(c)._2),
        s"component $c: projected variance $varP vs eigenvalue ${b(c)._2}")
    }
    assert(n > 0)
    // whitened projection: each component's variance collapses to ~1
    val white = operators.Pipeline.pcaProject(e, "embedding", fit,
      whiten = true)
    val w0 = white.select(element_at(col("pca"), 1).cast("double").as("w"))
      .agg(expr("avg(w)").as("m"), expr("avg(w*w)").as("m2")).collect().head
    val wVar = w0.getDouble(1) - w0.getDouble(0) * w0.getDouble(0)
    assert(math.abs(wVar - 1.0) < 1e-2,
      s"whitened component variance should be ~1, got $wVar")
  }

  test("rank-deficient corpus: tail components complete orthonormally with 0 eigenvalue") {
    import spark.implicits._
    // constant corpus → covariance exactly 0 everywhere: power
    // iteration annihilates every iterate; the basis must still come
    // back orthonormal (review r16: it used to return the raw
    // (1,2,...,dim) start vector, duplicated, norm ~sqrt(dim^3/3))
    val df = (0 until 40).map(i => (i.toLong, Seq(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val b = fetchBasis(operators.Pipeline.pcaFit(df, "embedding", 4, 3))
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    for (i <- b.indices; j <- i until b.length) {
      val d = dot(b(i)._3, b(j)._3)
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"|u$i| != 1: $d")
      else assert(math.abs(d) < 1e-9, s"u($i).u($j) = $d")
    }
    assert(b.forall(c => math.abs(c._2) < 1e-9),
      s"all eigenvalues must be ~0 on a constant corpus: ${b.map(_._2).toSeq}")
  }

  test("pcaFit is deterministic; guards reject bad parameters") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val a = fetchBasis(operators.Pipeline.pcaFit(e, "embedding", 64, 3))
    val b = fetchBasis(operators.Pipeline.pcaFit(e, "embedding", 64, 3))
    assert(a.zip(b).forall { case (x, y) =>
      x._2 == y._2 && x._3.sameElements(y._3) }, "two fits must be identical")
    intercept[IllegalArgumentException](
      operators.Pipeline.pcaFit(e, "embedding", 64, 0))
    intercept[IllegalArgumentException](
      operators.Pipeline.embeddingMeanCov(e, "embedding", 2000))
    intercept[IllegalArgumentException](
      operators.Pipeline.pcaProject(e, "embedding",
        operators.Pipeline.pcaFit(e, "embedding", 64, 1).limit(0)))
  }
}
