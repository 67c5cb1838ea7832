package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Checks for pipeline operators whose driver-gate queries can't
  * exercise every input shape (the gate runs them only on the fixture
  * corpus). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    operators.Pipeline.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents: a chain propagates the min across its full diameter") {
    // 9-node path 10-11-…-18: the min label needs 8 rounds to reach the
    // far end, so this fails if the loop stops before convergence
    val chain = (10L until 18L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got == (10L to 18L).map(_ -> 10L).toMap)
  }

  test("connectedComponents: disjoint components keep distinct min labels") {
    val got = cc(Seq((5L, 3L), (3L, 9L), (20L, 21L), (40L, 41L), (41L, 40L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 40L -> 40L, 41L -> 40L))
  }

  test("connectedComponents: empty pair list yields an empty result") {
    import spark.implicits._
    val out = operators.Pipeline.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.count() == 0)
  }

  test("connectedComponents: merging bridge joins two clusters under one min") {
    // two triangles joined by a bridge — every node must land on the
    // global min 1, including nodes whose direct neighbors never see it
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L), (3L, 7L))
    val got = cc(pairs)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 2L, 3L, 7L, 8L, 9L))
  }
}
