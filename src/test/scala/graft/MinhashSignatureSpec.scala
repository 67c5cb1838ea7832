package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The codegen'd one-pass minhash_sig expression (GraftExtensions). */
class MinhashSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val P = graft.plans.MinhashSignature.P

  test("minhash_sig: matches the 32 transform+array_min columns it replaces") {
    import spark.implicits._
    val df = Seq(
      Array(17L, 4096L, 99999L, 3L),
      Array(4294967295L), // max 32-bit shingle id
      Array(0L, 1L, 2L))
      .toDF("xs")
    val native = df.select(call_function("minhash_sig", col("xs"), lit(32)))
      .collect().map(_.getSeq[Long](0).toVector)
    val hof = df.select(array((0 until 32).map(i =>
      array_min(transform(col("xs"),
        x => (lit(2L * i + 1) * x + lit(99991L * i + 7)) % P))): _*))
      .collect().map(_.getSeq[Long](0).toVector)
    assert(native.toSeq == hof.toSeq)
  }

  test("minhash_sig: interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.ArrayType
    val expr = graft.plans.MinhashSignature(
      BoundReference(0, ArrayType(LongType), nullable = true), 8)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(Array(123L, 456789L, 42L)))
    val out = expr.eval(row).asInstanceOf[GenericArrayData].toLongArray()
    val expected = (0 until 8).map(i =>
      Seq(123L, 456789L, 42L)
        .map(x => ((2L * i + 1) * x + (99991L * i + 7)) % P).min)
    assert(out.toSeq == expected)
  }

  test("oph_sig: matches a local model incl. rotation densification offsets") {
    import spark.implicits._
    val k = 8
    // local reference model of the kernel's contract
    def model(xs: Seq[Long]): Seq[Long] = {
      val bins = Array.fill(k)(Long.MaxValue)
      xs.foreach { x =>
        val h = (x + 7L) % P
        val bin = (h % k).toInt
        if (h / k < bins(bin)) bins(bin) = h / k
      }
      (0 until k).map { b =>
        if (bins(b) != Long.MaxValue) bins(b)
        else (1 until k).collectFirst {
          case t if bins((b + t) % k) != Long.MaxValue =>
            bins((b + t) % k) + P * t
        }.getOrElse(Long.MaxValue)
      }
    }
    val inputs = Seq(
      Seq(17L, 4096L, 99999L, 3L, 888L, 1234567L),
      Seq(5L), // one shingle: every other slot borrows with +P·t offsets
      Seq(4294967295L, 0L),
      (1L to 200L).map(_ * 7919L)) // dense: likely no empty bin
    val got = inputs.map(_.toArray).toDF("xs")
      .select(call_function("oph_sig", col("xs"), lit(k)))
      .collect().map(_.getSeq[Long](0).toVector)
    assert(got.toSeq == inputs.map(x => model(x).toVector))
    // the single-shingle case: slot at its own bin is the raw quotient,
    // every other slot is donor + P·t with t the circular distance
    val single = model(Seq(5L))
    val binOf5 = ((5L + 7) % P % k).toInt
    assert(single(binOf5) == (5L + 7) / k)
    (0 until k).filter(_ != binOf5).foreach { b =>
      val t = ((binOf5 - b) % k + k) % k
      assert(single(b) == (5L + 7) / k + P * t)
    }
  }

  test("oph_sig: interpreted eval agrees with codegen result") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.ArrayType
    import spark.implicits._
    val xs = Array(123L, 456789L, 42L, 99L)
    val expr = graft.plans.OphSignature(
      BoundReference(0, ArrayType(LongType), nullable = true), 8)
    val interp = expr.eval(org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(xs))).asInstanceOf[GenericArrayData].toLongArray()
    val viaCodegen = Seq(xs).toDF("xs")
      .select(call_function("oph_sig", col("xs"), lit(8)))
      .collect().head.getSeq[Long](0)
    assert(interp.toSeq == viaCodegen.toSeq)
  }

  test("ophSignatures + ophAgreement: identical docs agree 1.0, disjoint ≈ 0, " +
      "agreement tracks Jaccard") {
    import spark.implicits._
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = (1 to 40).map(i => s"tok$i").mkString(" ") // identical
    val c = (101 to 140).map(i => s"tok$i").mkString(" ") // disjoint
    val m = ((1 to 20) ++ (201 to 220)).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, m))
      .toDF("post_key", "body")
    val sigs = operators.Pipeline.ophSignatures(docs, "post_key", "body",
      numBins = 32).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.keySet == Set(1L, 2L, 3L, 4L))
    assert(sigs(1L) == sigs(2L)) // identical text → identical signature
    def agree(x: Long, y: Long): Double = {
      import org.apache.spark.sql.functions.{col => fcol}
      Seq((sigs(x).toArray, sigs(y).toArray)).toDF("a", "b")
        .select(operators.Pipeline.ophAgreement(fcol("a"), fcol("b")))
        .collect().head.getDouble(0)
    }
    assert(agree(1L, 2L) == 1.0)
    assert(agree(1L, 3L) < 0.3) // disjoint shingles: near-zero agreement
    // half-overlapping word sets: estimate lands between the extremes
    val aj = agree(1L, 4L)
    assert(aj > 0.05 && aj < 0.8, s"agreement=$aj")
  }

  test("ophNeardupPairs: exact duplicates always surface (identical sigs " +
      "collide in every band); verified jaccard is exact") {
    import spark.implicits._
    val t1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val t2 = (51 to 80).map(i => s"beta$i").mkString(" ")
    val docs = Seq((1L, t1), (2L, t1), (3L, t2), (4L, t2), (5L, "short text here okay five"))
      .toDF("post_key", "body")
    val pairs = operators.Pipeline.ophNeardupPairs(docs, "post_key", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical texts share every slot → collide in EVERY band → found
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (3L, 4L)))
    assert(pairs.forall(_._3 == 1.0)) // exact verification, not estimate
  }

  test("oph/minhash neardup paths leave NO cached RDDs behind (the r17 " +
      "advice leak: candidates used to persist a corpus-sized frame)") {
    import spark.implicits._
    val t1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val docs = Seq((1L, t1), (2L, t1), (3L, t1 + " tail"))
      .toDF("post_key", "body")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    operators.Pipeline.ophNeardupPairs(docs, "post_key", "body").collect()
    operators.Pipeline.ophAccuracyReport(docs, "post_key", "body").collect()
    operators.Pipeline.minhashNeardupPairs(docs, "post_key", "body").collect()
    operators.Pipeline.minhashAccuracyReport(docs, "post_key", "body").collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }

  test("minhash_sig: null input yields null; wrong element type rejected") {
    import spark.implicits._
    val n = Seq(Option.empty[Array[Long]]).toDF("xs")
      .select(call_function("minhash_sig", col("xs"), lit(4)))
    assert(n.collect()(0).isNullAt(0))
    val e = intercept[Exception] {
      Seq(Array("a")).toDF("xs")
        .select(call_function("minhash_sig", col("xs"), lit(4))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("minhash_sig") ||
      e.getMessage.toLowerCase.contains("datatype"))
  }

  test("minhash_sig: non-literal numHashes rejected") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((Array(1L), 4)).toDF("xs", "n")
        .select(call_function("minhash_sig", col("xs"), col("n"))).collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
