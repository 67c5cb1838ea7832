package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.Streams
import graft.streaming.Streams.UserEvent

/** Incremental execution of the streaming transforms via MemoryStream. */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("blocklistGate: stateless per-batch whole-word blocking on a stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val gated = Streams.blocklistGate(
      in.toDF().toDF("doc_id", "text"), Seq("slow", "bad"))
    val q = gated.writeStream.format("memory")
      .queryName("blocklist_gate").outputMode("append").start()
    try {
      in.addData(
        (1L, "this page is SLOW today"),   // whole-word hit → dropped
        (2L, "moving slowly along"),       // substring only → kept
        (3L, "clean words here"))
      q.processAllAvailable()
      in.addData((4L, "another bad one"))  // gate keeps working batch 2
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("blocklist_gate")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(2L, 3L))
    // the gate is stateless: no watermark column was required and the
    // blocked flag never reaches the sink
    assert(!spark.table("blocklist_gate").columns.contains("blocked"))
  }

  test("auditGate: stateless row-local quality gate, stream ≡ batch, " +
      "keyed checks raise") {
    import spark.implicits._
    import graft.operators.Relational
    implicit val sc = spark.sqlContext
    val checks = Seq(Relational.NotNull("text"),
      Relational.InRange("score", lit(0.0), lit(1.0)),
      Relational.InSet("lang", Seq("en", "de")))
    val rows = Seq(
      (1L, Some("ok"), Some(0.5), Some("en")),    // clean
      (2L, None, Some(0.5), Some("en")),          // null text
      (3L, Some("ok"), Some(2.0), Some("de")),    // range
      (4L, Some("ok"), Some(0.1), Some("fr")),    // set
      (5L, Some("ok"), None, None))               // NULL range/set pass,
                                                  // only if not-null'd
    val in = MemoryStream[(Long, Option[String], Option[Double],
      Option[String])]
    val gated = Streams.auditGate(
      in.toDF().toDF("doc_id", "text", "score", "lang"), checks)
    val q = gated.writeStream.format("memory")
      .queryName("audit_gate").outputMode("append").start()
    try {
      in.addData(rows.take(3): _*)
      q.processAllAvailable()
      in.addData(rows.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("audit_gate")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // batch twin: same checks through flagRowViolations
    val want = Relational.flagRowViolations(
      rows.toDF("doc_id", "text", "score", "lang"), checks)
      .filter(col("n_violated") === 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got == Seq(1L, 5L))
    assert(!spark.table("audit_gate").columns.contains("violated"))
    // flag mode keeps every row and labels in check order
    val flagged = Streams.auditGate(
      rows.toDF("doc_id", "text", "score", "lang"), checks,
      dropViolations = false)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("violated")).toMap
    assert(flagged(2L) == "not_null(text)" &&
      flagged(3L) == "in_range(score)" && flagged(4L) == "in_set(lang)" &&
      flagged(1L) == "" && flagged(5L) == "")
    // keyed checks cannot ride a row-local gate
    val e = intercept[IllegalArgumentException](Streams.auditGate(
      rows.toDF("doc_id", "text", "score", "lang"),
      Seq(Relational.Unique(Seq("doc_id")))))
    assert(e.getMessage.contains("row-local"))
  }

  test("bloomGate: stateless snapshot-membership blocking on a stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val snapshot = Seq((100L, "seen before"), (101L, "also known"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val gated = Streams.bloomGate(in.toDF().toDF("doc_id", "text"),
      snapshot, "text", mBits = 1 << 20, k = 4)
    val q = gated.writeStream.format("memory")
      .queryName("bloom_gate").outputMode("append").start()
    try {
      in.addData(
        (1L, "seen before"),    // snapshot member → dropped
        (2L, "fresh content"))  // unknown → kept
      q.processAllAvailable()
      in.addData((3L, "also known"), (4L, "more fresh")) // batch 2 works
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("bloom_gate")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(2L, 4L))
    // stateless, and the probe columns never reach the sink
    assert(spark.table("bloom_gate").columns.toSeq == Seq("doc_id", "text"))
    // stream ≡ batch: the gate admits exactly what the batch operator
    // admits over the union of both micro-batches (the packed form the
    // gate broadcasts is pinned ≡ positions in BloomPackedSpec)
    val allData = Seq((1L, "seen before"), (2L, "fresh content"),
      (3L, "also known"), (4L, "more fresh")).toDF("doc_id", "text")
    val batchKept = graft.operators.Pipeline
      .bloomDedup(allData, snapshot, "text", mBits = 1 << 20, k = 4)
      .filter(!col("in_bloom"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == ids, "stream gate diverged from the batch operator")
  }

  test("neardupGateAgainstCorpus: stateless near-dup blocking vs a static corpus") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def mk(ws: Seq[String]) = ws.mkString(" ")
    val a = (1 to 30).map(i => s"ref$i")
    val z = (1 to 30).map(i => s"new$i")
    val snapshot = Seq((100L, mk(a))).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val gated = Streams.neardupGateAgainstCorpus(
      in.toDF().toDF("doc_id", "text"), snapshot, mBits = 1 << 18, k = 4)
    val q = gated.writeStream.format("memory")
      .queryName("neardup_ref_gate").outputMode("append").start()
    val data = Seq(
      (1L, mk(a)),                       // exact copy of the snapshot doc
      (2L, mk(z)),                       // unrelated → kept
      (3L, mk(a.updated(10, "edited"))), // one-word edit (LSH decides)
      (4L, "short doc"))                 // <5 words: no band keys → kept
    try {
      in.addData(data.take(2): _*)
      q.processAllAvailable()
      in.addData(data.drop(2): _*)       // batch 2: static side re-resolves
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("neardup_ref_gate")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.contains(2L) && ids.contains(4L), s"clean docs dropped: $ids")
    assert(!ids.contains(1L), "the exact twin of the reference passed")
    // the probe column never reaches the sink; the gate is stateless
    assert(spark.table("neardup_ref_gate").columns.toSeq ==
      Seq("doc_id", "text"))
    // stream ≡ batch: the gate admits exactly what the batch pair
    // admits over the union of both micro-batches (including doc 3,
    // whichever way the band lottery went — same arithmetic both sides)
    val batchKept = graft.operators.Pipeline.neardupFlagAgainstBloom(
      data.toDF("doc_id", "text"), "text",
      graft.operators.Pipeline.neardupBloomBuild(snapshot, "text",
        1 << 18, 4), 1 << 18, 4)
      .filter(!col("neardup_in_ref"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == ids, "stream gate diverged from the batch pair")
  }

  test("quietGapGate: stateful retry-storm blocking; state carries across " +
      "micro-batches; stream ≡ batch on an in-order feed") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // offset well past epoch 0: the initial watermark is 0, and a row
    // AT the watermark is border-late — not the semantics under test
    def ts(s: Long) = new java.sql.Timestamp((1000000L + s) * 1000L)
    val in = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val gated = Streams.quietGapGate(
      in.toDF().toDF("event_id", "user_id", "event_type", "ts"),
      Seq("user_id", "event_type"), "ts", "event_id", windowSec = 100L)
    val q = gated.writeStream.format("memory")
      .queryName("quiet_gap_gate").outputMode("append").start()
    val batch1 = Seq(
      (1L, 1L, "click", ts(0)),    // first of key → admitted
      (2L, 1L, "click", ts(10)),   // burst retry → dropped
      (6L, 1L, "view", ts(1)),     // own key → admitted
      (7L, 2L, "click", ts(1)))    // own key → admitted
    val batch2 = Seq(
      (3L, 1L, "click", ts(20)),   // still within 100s of event 2 → dropped
      (4L, 1L, "click", ts(200)),  // 180s quiet gap → admitted
      (5L, 1L, "click", ts(300)))  // gap exactly 100s → still a duplicate
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)      // state must carry event 2's ts over
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("quiet_gap_gate")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 4L, 6L, 7L), s"gate admitted $ids")
    // stream ≡ batch over the union of both micro-batches
    val batchKept = operators.Relational.dedupEventsQuietGap(
      (batch1 ++ batch2).toDF("event_id", "user_id", "event_type", "ts"),
      Seq("user_id", "event_type"), "ts", "event_id", windowSec = 100L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == ids, "stream gate diverged from the batch operator")

    // NULL key components form their OWN key: (NULL, "7") and
    // (7, NULL) must not collide into one state entry (review r18.3 —
    // bare concat_ws SKIPS nulls, which merged them)
    val in2 = MemoryStream[(Long, java.lang.Long, String, java.sql.Timestamp)]
    val gated2 = Streams.quietGapGate(
      in2.toDF().toDF("event_id", "user_id", "event_type", "ts"),
      Seq("user_id", "event_type"), "ts", "event_id", windowSec = 100L)
    val q2 = gated2.writeStream.format("memory")
      .queryName("quiet_gap_nullkey").outputMode("append").start()
    try {
      in2.addData(
        (10L, null.asInstanceOf[java.lang.Long], "7", ts(0)),
        (11L, java.lang.Long.valueOf(7L), null.asInstanceOf[String], ts(10)))
      q2.processAllAvailable()
    } finally q2.stop()
    val ids2 = spark.table("quiet_gap_nullkey")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids2 == Seq(10L, 11L),
      s"NULL-key events collided in the state key: $ids2")
  }

  test("cdcGate: latest-wins state across micro-batches; stale replays " +
      "emit nothing; tombstones; stream ≡ batch cdcApply on an in-order feed") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, String)]
    val changes = Streams.cdcGate(
      in.toDF().toDF("k", "seq", "op", "val"),
      keyCols = Seq("k"), seqCol = "seq", opCol = "op",
      deleteOp = "delete", payloadCols = Seq("val"))
    val q = changes.writeStream.format("memory")
      .queryName("cdc_gate").outputMode("append").start()
    val batch1 = Seq(
      (1L, 1L, "insert", "a1"), (1L, 2L, "update", "a2"), // net: a2
      (2L, 1L, "insert", "b1"),
      (3L, 1L, "insert", "c1"), (3L, 2L, "delete", "c1")) // net: tombstone
    val batch2 = Seq(
      (1L, 2L, "update", "a2"),   // exact replay → no emission
      (2L, 1L, "insert", "XX"),   // stale seq → ignored, no emission
      (3L, 3L, "insert", "c2"),   // resurrection after delete
      (4L, 7L, "update", "d1"))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("cdc_gate")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(3), r.getBoolean(4))).toSeq
    // batch 1: three net changes; batch 2: two (the replay and the
    // stale row are silent). Payload JSON carries the NATURAL key
    // alongside the values (review r19.3: the `key` string is the
    // internal state encoding, not a consumer contract)
    assert(out.size == 5, s"got $out")
    assert(out.contains(("v1", 2L, """{"k":1,"val":"a2"}""", false)))
    assert(out.contains(("v3", 2L, """{"k":3,"val":"c1"}""", true)),
      s"missing tombstone in $out")
    assert(out.contains(("v3", 3L, """{"k":3,"val":"c2"}""", false)))
    assert(out.contains(("v4", 7L, """{"k":4,"val":"d1"}""", false)))
    // stream ≡ batch: the latest emission per key (tombstones removed)
    // must equal cdcApply over the whole log
    val latest = out.groupBy(_._1).map { case (k, rs) => rs.maxBy(_._2) }
      .filterNot(_._4).map(t => (t._1.drop(1).toLong, t._2, t._3)).toSet
    val batchCur = operators.Relational.cdcApply(
      (batch1 ++ batch2).toDF("k", "seq", "op", "val"),
      keyCols = Seq("k"), seqCols = Seq("seq"), opCol = "op",
      deleteOp = "delete")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        s"""{"k":${r.getLong(0)},"val":"${r.getString(3)}"}""")).toSet
    assert(latest == batchCur,
      s"stream net state $latest diverged from batch cdcApply $batchCur")
    // a seq value that does not cast to long is DROPPED (no position in
    // the log), never an encoder crash mid-stream (review r19.1)
    val in3 = MemoryStream[(Long, String, String, String)]
    val g3 = Streams.cdcGate(in3.toDF().toDF("k", "seq", "op", "val"),
      Seq("k"), "seq", "op", "delete", Seq("val"))
    val q3 = g3.writeStream.format("memory")
      .queryName("cdc_gate_badseq").outputMode("append").start()
    try {
      in3.addData((1L, "not-a-number", "insert", "x"),
        (1L, "5", "insert", "y"))
      q3.processAllAvailable()
    } finally q3.stop()
    val out3 = spark.table("cdc_gate_badseq")
      .collect().map(r => (r.getLong(1), r.getString(3))).toSeq
    assert(out3 == Seq((5L, """{"k":1,"val":"y"}""")), s"got $out3")
  }

  test("funnelGate: step completions carry across micro-batches; " +
      "first-touch entry never re-anchors; stream ≡ batch " +
      "funnelStepsWithin on an in-order feed") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val steps = Seq("view", "click", "purchase")
    val in = MemoryStream[(String, String, java.sql.Timestamp)]
    val gated = Streams.funnelGate(
      in.toDF().toDF("user_id", "event_type", "ts"),
      "user_id", "ts", "event_type", steps, withinSec = 15L)
    val q = gated.writeStream.format("memory")
      .queryName("funnel_gate").outputMode("append").start()
    val batch1 = Seq(
      ("A", "view", ts(0)), ("B", "view", ts(0)),
      ("B", "click", ts(5)), ("C", "view", ts(0)),
      ("D", "view", ts(0)),
      ("E", "click", ts(1)))          // click before any view → nothing
    val batch2 = Seq(
      ("A", "click", ts(10)),         // within 15 of entry 0 → step 2
      ("B", "purchase", ts(12)),      // carried state → step 3
      ("C", "view", ts(90)),          // first-touch: NO re-anchor
      ("C", "click", ts(100)),        // outside entry 0's window → nothing
      ("D", "click", ts(15)))         // exactly AT the deadline → step 2
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("funnel_gate")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(hits == Set(("A", 1), ("A", 2), ("B", 1), ("B", 2), ("B", 3),
      ("C", 1), ("D", 1), ("D", 2)), s"got $hits")
    // stream ≡ batch: distinct keys per completed step equals the
    // batch first-touch windowed funnel over the union
    val streamCounts = hits.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val batchCounts = operators.Relational.funnelStepsWithin(
      (batch1 ++ batch2).toDF("user_id", "event_type", "ts"),
      "user_id", "ts", "event_type", steps, withinSec = 15L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(streamCounts == batchCounts,
      s"stream $streamCounts diverged from batch $batchCounts")
    // an uncastable ts degrades to a DROP (the cdcGate r19.1 stance),
    // never an NPE inside the state function
    val in2 = MemoryStream[(String, String, String)]
    val g2 = Streams.funnelGate(
      in2.toDF().toDF("user_id", "event_type", "ts"),
      "user_id", "ts", "event_type", steps, withinSec = 15L)
    val q2 = g2.writeStream.format("memory")
      .queryName("funnel_gate_badts").outputMode("append").start()
    try {
      in2.addData(("Z", "view", "garbage"),
        ("Z", "view", "2024-01-01 10:00:00"))
      q2.processAllAvailable()
    } finally q2.stop()
    val z = spark.table("funnel_gate_badts")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(z == Seq(("Z", 1)), s"got $z")
  }

  test("semanticGate: stateless embedding-proximity blocking vs a " +
      "static eval set; stream ≡ batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evalSet = Seq((100L, Seq(1f, 0f, 0f)), (101L, Seq(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val in = MemoryStream[(Long, Seq[Float])]
    val gated = Streams.semanticGate(
      in.toDF().toDF("doc_id", "embedding"), evalSet, "embedding", tau = 0.9)
    val q = gated.writeStream.format("memory")
      .queryName("semantic_gate").outputMode("append").start()
    val data = Seq(
      (1L, Seq(1f, 0f, 0f)),       // exactly an eval vector → dropped
      (2L, Seq(0f, 0f, 1f)),       // orthogonal to both → kept
      (3L, Seq(0.1f, 0.99f, 0f)),  // near eval 101 (cos > 0.9) → dropped
      (4L, Seq(1f, 1f, 0f)))       // cos ≈ 0.71 to both → kept
    try {
      in.addData(data.take(2): _*)
      q.processAllAvailable()
      in.addData(data.drop(2): _*) // batch 2: static side re-resolves
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("semantic_gate")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(2L, 4L), s"gate admitted $ids")
    // probe columns never reach the sink; the gate is stateless
    assert(spark.table("semantic_gate").columns.toSeq ==
      Seq("doc_id", "embedding"))
    // stream ≡ batch over the union of both micro-batches
    val batchKept = graft.operators.Pipeline.semanticDecontaminate(
      data.toDF("doc_id", "embedding"), evalSet, "embedding", 0.9)
      .filter(!col("flagged"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == ids, "stream gate diverged from the batch operator")
  }

  test("imageGateAgainstCorpus: in-stream decode + hash, stateless " +
      "Bloom probe; stream ≡ batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val M = graft.operators.Multimodal
    // reference = the δ=0 member of families 0..4; the stream carries
    // its δ-siblings (hamming-near → band collisions → dropped) and
    // images from far families (kept unless a band accidentally
    // collides — same arithmetic both sides, so the batch pin decides)
    val refIds = (0L until 5L).map(_ * 4)
    val streamIds = Seq(1L, 2L, 401L, 402L, 803L)
    val refHashes = M.imagePerceptualHash(
      refIds.map(id => M.MediaRecord(id, "image/png",
        M.renderPatternPng(id))).toDS())
    val in = MemoryStream[Long]
    // direct object references inside the lambda (static MODULE$
    // access): a `val M` alias would capture the non-serializable
    // Multimodal object into the streaming task closure
    val gated = Streams.imageGateAgainstCorpus(
      in.toDS().mapPartitions(_.map(id =>
        graft.operators.Multimodal.MediaRecord(id, "image/png",
          graft.operators.Multimodal.renderPatternPng(id)))),
      refHashes, mBits = 1 << 16, k = 4)
    val q = gated.writeStream.format("memory")
      .queryName("image_ref_gate").outputMode("append").start()
    try {
      in.addData(streamIds.take(2): _*)
      q.processAllAvailable()
      in.addData(streamIds.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("image_ref_gate")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // δ-siblings of reference family 0 share bands with it → dropped
    assert(!ids.contains(1L) && !ids.contains(2L),
      s"reference family siblings passed the gate: $ids")
    // stream ≡ batch over the union of both micro-batches
    val batchKept = M.imageFlagAgainstBloom(
      M.imagePerceptualHash(streamIds.map(id => M.MediaRecord(
        id, "image/png", M.renderPatternPng(id))).toDS()),
      M.imageBloomBuild(refHashes, 1 << 16, 4), 1 << 16, 4)
      .filter(!col("neardup_in_ref"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(batchKept == ids, "image stream gate diverged from the batch pair")
  }

  test("distinctCountHll: bounded-state streaming registers equal the " +
      "batch sketch at every point in the stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val counted = Streams.distinctCountHll(in.toDF().toDF("doc_id", "text"))
    val q = counted.writeStream.format("memory")
      .queryName("hll_stream").outputMode("complete").start()
    def streamRegs(): Map[Int, Long] = spark.table("hll_stream").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def batchRegs(rows: Seq[(Long, String)]): Map[Int, Long] =
      graft.operators.Pipeline.hllSketch(rows.toDF("doc_id", "text"), "text")
        .collect()(0).getSeq[Long](0).zipWithIndex
        .collect { case (r, i) if r > 0 => i -> r }.toMap
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "delta"))
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(streamRegs() == batchRegs(b1))
      // a second batch only raises (or confirms) registers — and the
      // stream state stays register-count-bounded by construction
      val b2 = Seq((3L, "epsilon alpha zeta"))
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(streamRegs() == batchRegs(b1 ++ b2))
    } finally q.stop()
  }

  test("termFrequencyCms: bounded-state streaming cells equal the " +
      "batch sketch cells at every point in the stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val counted = Streams.termFrequencyCms(
      in.toDF().toDF("doc_id", "text"), depth = 3, width = 64)
    val q = counted.writeStream.format("memory")
      .queryName("cms_stream").outputMode("complete").start()
    def streamCells(): Map[(Int, Long), Long] =
      spark.table("cms_stream").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def batchCells(rows: Seq[(Long, String)]): Map[(Int, Long), Long] = {
      val sk = graft.operators.Pipeline
        .cmsSketch(rows.toDF("doc_id", "text"), "text", 3, 64)
        .collect()(0)
      (0 until 3).flatMap { j =>
        sk.getSeq[Long](j).zipWithIndex.collect {
          case (c, pos) if c > 0 => (j, pos.toLong) -> c
        }
      }.toMap
    }
    val b1 = Seq((1L, "alpha beta alpha"), (2L, "gamma"))
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(streamCells() == batchCells(b1))
      val b2 = Seq((3L, "alpha delta"))
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(streamCells() == batchCells(b1 ++ b2))
    } finally q.stop()
  }

  test("sessionize: events within gap merge, beyond gap split") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("user_id", "ts")
    val q = Streams.sessionize(df, gap = "30 minutes")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
        (1L, ts("2024-01-01 12:00:00")), (2L, ts("2024-01-01 10:05:00")),
        // user 3: a gap of EXACTLY 30 minutes — the batch twin's strict
        // `gap > 30 min` keeps these in ONE session, and sessionize's
        // +1µs gap widening must agree (plain session_window would split)
        (3L, ts("2024-01-01 10:00:00")), (3L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // advance the watermark far enough to close all sessions
      in.addData((9L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)))
      // boundary pin (ADVICE r08): the +1µs gap widening must NOT leak
      // into the reported end — user 3's session is [10:00, last event
      // 10:30 + 30 min gap = 11:00] exactly, the batch twin's bound,
      // not 11:00:00.000001
      val u3 = spark.table("sess").filter(col("user_id") === 3L)
        .select("session_start", "session_end").collect().head
      assert(u3.getTimestamp(0) == ts("2024-01-01 10:00:00"))
      assert(u3.getTimestamp(1) == ts("2024-01-01 11:00:00"))
    } finally q.stop()
  }

  test("dedupDocuments/neardupGate refuse a caller column colliding with their derived key") {
    import spark.implicits._
    val withHash = Seq(("a", ts("2024-01-01 10:00:00"), "x"))
      .toDF("text", "ts", "content_hash")
    val e1 = intercept[IllegalArgumentException](Streams.dedupDocuments(withHash))
    assert(e1.getMessage.contains("content_hash"))
    val withSig = Seq(("a", ts("2024-01-01 10:00:00"), "x"))
      .toDF("text", "ts", "band_sig")
    val e2 = intercept[IllegalArgumentException](Streams.neardupGate(withSig))
    assert(e2.getMessage.contains("band_sig"))
  }

  test("eventCounts: tumbling window with watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "event_type")
    val q = Streams.eventCounts(df, window_ = "1 hour")
      .writeStream.format("memory").queryName("counts")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 10:01:00"), "click"), (ts("2024-01-01 10:59:00"), "click"),
        (ts("2024-01-01 10:30:00"), "purchase"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 13:00:00"), "click")) // closes the 10:00 window
      q.processAllAvailable()
      val rows = spark.table("counts")
        .select("event_type", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(rows == Seq(("click", 2L), ("purchase", 1L)))
    } finally q.stop()
  }

  test("sessionize agrees with the batch window-function sessionization (q30)") {
    // unified API: the same transform runs in batch mode over the real
    // events table; session_window(gap + 1µs) and the q30 lag-based
    // flags define identical sessions — including at exact-gap pairs
    // (see the +1µs note on sessionize; pinned by user 3 above)
    val viaStream = Streams.sessionize(
      Tables.events(spark, TestSpark.sfDir).select(col("user_id"), col("ts")))
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBatch = SparkEntry.queries("q30_sessionize")(spark, TestSpark.sfDir)
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStream == viaBatch)
  }

  test("attributePurchases: stream-stream interval join within horizon") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val q = Streams.attributePurchases(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "amount"),
      horizon = "30 minutes")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00")),   // within 30 min of purchase
        (1L, ts("2024-01-01 08:00:00")),   // too old
        (2L, ts("2024-01-01 10:00:00")))   // other user, no purchase
      purchases.addData((1L, ts("2024-01-01 10:20:00"), 9.99))
      q.processAllAvailable()
      // push both watermarks forward so buffered state resolves
      // (distinct users, so the advancing rows don't join each other)
      clicks.addData((8L, ts("2024-01-02 00:00:00")))
      purchases.addData((9L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("user_id", "amount").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(rows == Seq((1L, 9.99)))
    } finally q.stop()
  }

  test("attributePurchases: purchaseIdCol keeps identical same-instant purchases distinct") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double, String)]
    val q = Streams.attributePurchases(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "amount", "purchase_id"),
      horizon = "30 minutes", purchaseIdCol = Some("purchase_id"))
      .writeStream.format("memory").queryName("attrib_id")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")))
      // two byte-identical purchases in the same instant — an
      // at-least-once replay shape that merges without the id column
      purchases.addData(
        (1L, ts("2024-01-01 10:20:00"), 9.99, "A"),
        (1L, ts("2024-01-01 10:20:00"), 9.99, "B"))
      q.processAllAvailable()
      clicks.addData((8L, ts("2024-01-02 00:00:00")))
      purchases.addData((9L, ts("2024-01-02 00:00:00"), 0.0, "Z"))
      q.processAllAvailable()
      val rows = spark.table("attrib_id")
        .select("purchase_id", "amount").collect()
        .map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
      assert(rows == Seq(("A", 9.99), ("B", 9.99)))
    } finally q.stop()
  }

  test("dedupDocuments: in-watermark duplicates dropped, firsts kept") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.dedupDocuments(df, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, "alpha"),
        (ts("2024-01-01 10:05:00"), 2L, "alpha"),   // dup within watermark
        (ts("2024-01-01 10:10:00"), 3L, "beta"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 10:20:00"), 4L, "beta")) // dup, later batch
      q.processAllAvailable()
      val kept = spark.table("dedup").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 3L))
    } finally q.stop()
  }

  test("full ingest chain: scrub → neardupGate → exactly-once parquet sink") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("chain-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("chain-ckpt").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[(Timestamp, Long, String)]
    val chained = Streams.neardupGate(
      Streams.scrubAndGate(in.toDF().toDF("ts", "doc_id", "text"), minChars = 20))
    val q = Streams.toParquet(chained, outDir, ckpt)
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, base + " mail me a@b.com"),
        // 2 scrubs to EXACTLY doc 1's text (different address, same
        // <EMAIL> replacement) — the classic near-dup the raw-text
        // gate would miss; the chain order makes it an exact bucket hit
        (ts("2024-01-01 10:01:00"), 2L, base + " mail me c@d.com"),
        (ts("2024-01-01 10:02:00"), 3L, "short")) // gated by length
      q.processAllAvailable()
      in.addData(
        (ts("2024-01-01 10:10:00"), 4L, base + " mail me a@b.com")) // exact dup of 1 post-scrub
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(outDir)
    val ids = landed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 3 gated on raw length; 2 and 4 scrub to doc 1's exact text →
    // same shingle set → same band signature → dropped by the gate
    assert(ids == Seq(1L))
    // scrub ran before the sink: no raw email survives in landed text
    assert(landed.filter(col("text").contains("a@b.com")).count() == 0)
    assert(landed.filter(col("text").contains("<EMAIL>")).count() >= 1)
  }

  test("StreamDemo: JSONL file source → curated parquet, incremental across invocations") {
    val inDir = java.nio.file.Files.createTempDirectory("demo-in")
    val outDir = java.nio.file.Files.createTempDirectory("demo-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("demo-ckpt").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def writeJsonl(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val noTs = (1 to 40).map(i => s"q$i").mkString(" ")
    writeJsonl("batch1.jsonl", Seq(
      s"""{"ts":"2024-01-01T10:00:00Z","doc_id":1,"text":"$base mail a@b.com","source":"web"}""",
      s"""{"ts":"2024-01-01T10:01:00Z","doc_id":2,"text":"$base mail c@d.com","source":"web"}""",
      """{"ts":"2024-01-01T10:02:00Z","doc_id":3,"text":"short","source":"web"}""",
      // no ts: dropped by the EXPLICIT event-time gate (the watermarked
      // dedup can't place it), not lost inside watermark machinery
      s"""{"doc_id":6,"text":"$noTs","source":"web"}"""))
    // first invocation drains what exists and exits (AvailableNow)
    val q1 = streaming.StreamDemo.run(spark, inDir.toString, outDir, ckpt,
      minChars = 20)
    q1.awaitTermination()
    // second invocation resumes from the checkpoint: only the NEW file
    // is read, the neardupGate STATE STORE is restored with the source
    // offsets — so doc 4 (scrubs to doc 1's exact text, a cross-
    // invocation duplicate within the watermark) is still dropped —
    // and fresh-vocabulary doc 5 lands
    val fresh = (1 to 40).map(i => s"z$i").mkString(" ")
    writeJsonl("batch2.jsonl", Seq(
      s"""{"ts":"2024-01-01T10:10:00Z","doc_id":4,"text":"$base mail e@f.com","source":"web"}""",
      s"""{"ts":"2024-01-01T10:11:00Z","doc_id":5,"text":"$fresh","source":"web"}"""))
    val q2 = streaming.StreamDemo.run(spark, inDir.toString, outDir, ckpt,
      minChars = 20)
    q2.awaitTermination()
    val landed = spark.read.parquet(outDir)
    val ids = landed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 1 admitted; 2 scrubs to 1's exact text → same bucket → dropped;
    // 3 length-gated; 4 dropped by RESTORED state on invocation two;
    // 5 lands; 6 (no ts) gated by the explicit event-time filter
    assert(ids == Seq(1L, 5L))
    // the PII scrub ran before the sink
    assert(landed.filter(col("text").contains("a@b.com")).count() == 0)
    assert(landed.filter(col("text").contains("<EMAIL>")).count() == 1)
  }

  test("StreamDemo: maxFilesPerTrigger drains a backlog over multiple bounded micro-batches") {
    // the 100 TB first-run shape: a landing zone with a BACKLOG must
    // not drain in one unbounded micro-batch. AvailableNow + the rate
    // limit still drains everything and exits, but as a sequence of
    // bounded, individually-committed batches — same final contents,
    // more than one entry in the checkpoint's offsets log.
    val inDir = java.nio.file.Files.createTempDirectory("bp-in")
    val outDir = java.nio.file.Files.createTempDirectory("bp-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bp-ckpt").toString
    def vocab(p: String) = (1 to 40).map(i => s"$p$i").mkString(" ")
    (1 to 3).foreach { f =>
      java.nio.file.Files.write(inDir.resolve(s"f$f.jsonl"),
        (s"""{"ts":"2024-01-01T10:0$f:00Z","doc_id":$f,"text":"${vocab(s"f${f}w")}","source":"web"}""" + "\n")
          .getBytes("UTF-8"))
    }
    val q = streaming.StreamDemo.run(spark, inDir.toString, outDir, ckpt,
      minChars = 20, maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    val ids = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L)) // distinct vocab: nothing deduped
    // one committed offsets entry per bounded batch: 3 files at
    // maxFilesPerTrigger=1 → at LEAST 3 micro-batches (not 1 unbounded
    // drain). ≥, not ==: a watermarked AvailableNow drain may commit
    // one extra no-new-data batch to advance the watermark and expire
    // state (observed intermittently as a 4th offsets entry).
    val offsets = new java.io.File(ckpt, "offsets").list()
      .filterNot(_.startsWith(".")).toSeq
    assert(offsets.size >= 3, s"expected >= 3 bounded batches, got $offsets")
  }

  test("StreamDemo: maxBytesPerTrigger drains a backlog over multiple bounded micro-batches") {
    // the bytes-denominated twin of the files test: the knob callers
    // reach for when file sizes vary (a landing zone mixing 100 MB and
    // 100 KB drops). maxBytesPerTrigger is a SOFT cap — each batch
    // admits at least one file, then stops once the cap is exceeded —
    // so a cap below every file's size forces one file per batch.
    val inDir = java.nio.file.Files.createTempDirectory("bpb-in")
    val outDir = java.nio.file.Files.createTempDirectory("bpb-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bpb-ckpt").toString
    def vocab(p: String) = (1 to 40).map(i => s"$p$i").mkString(" ")
    (1 to 3).foreach { f =>
      java.nio.file.Files.write(inDir.resolve(s"f$f.jsonl"),
        (s"""{"ts":"2024-01-01T10:0$f:00Z","doc_id":$f,"text":"${vocab(s"f${f}w")}","source":"web"}""" + "\n")
          .getBytes("UTF-8"))
    }
    val q = streaming.StreamDemo.run(spark, inDir.toString, outDir, ckpt,
      minChars = 20, maxBytesPerTrigger = Some("1"))
    q.awaitTermination()
    val ids = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L)) // distinct vocab: nothing deduped
    // same committed-offsets contract as the files test: ≥ 3 bounded
    // batches (a watermark-advance batch may add a 4th entry)
    val offsets = new java.io.File(ckpt, "offsets").list()
      .filterNot(_.startsWith(".")).toSeq
    assert(offsets.size >= 3, s"expected >= 3 bounded batches, got $offsets")
  }

  test("neardupGate: near-duplicates share a band bucket and are dropped") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // 40-word documents; docB edits ONE word of docA (same band-0
    // signature with overwhelming probability at 4 rows/band), docC is
    // unrelated text; the short docs exercise the exact-hash fallback
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w37", "edited")
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    // precondition of the scenario, asserted so a kernel change that
    // splits the bucket fails loudly here instead of silently passing
    val sigs = Seq(base, nearDup, other).toDF("text")
      .select(graft.operators.Pipeline.bandSignature(
        graft.operators.Pipeline.shingleHashes(split(col("text"), "\\s+"))))
      .collect().map(_.getString(0))
    assert(sigs(0) == sigs(1) && sigs(0) != sigs(2))

    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.neardupGate(df, watermark = "1 hour")
      .writeStream.format("memory").queryName("neardup_gate")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, base),
        (ts("2024-01-01 10:01:00"), 2L, "tiny"),
        (ts("2024-01-01 10:02:00"), 3L, other))
      q.processAllAvailable()
      in.addData(
        (ts("2024-01-01 10:10:00"), 4L, nearDup), // near-dup of 1 → dropped
        (ts("2024-01-01 10:11:00"), 5L, "tiny"),  // exact short dup → dropped
        (ts("2024-01-01 10:12:00"), 6L, "tiny2")) // distinct short → kept
      q.processAllAvailable()
      val kept = spark.table("neardup_gate").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 2L, 3L, 6L))
    } finally q.stop()
  }

  test("neardupGateOph: the one-permutation band key drops near-dups and " +
      "keeps the null/short sentinels") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def ophKey(ts: Seq[String]): Seq[String] = ts.toDF("text")
      .select(array_join(transform(
        call_function("oph_sig", graft.operators.Pipeline.shingleHashes(
          split(col("text"), "\\s+")), lit(4)),
        v => v.cast("string")), ","))
      .collect().map(_.getString(0)).toSeq
    // find a 1-word edit that keeps the 4-slot OPH key (deterministic
    // kernel — the search pins the precondition instead of hardcoding
    // an edit position that a kernel change would silently invalidate)
    val candidates = (0 until 40).map(i =>
      base.split(" ").toVector.updated(i, "edited").mkString(" "))
    val keys = ophKey(base +: candidates)
    val nearDupIdx = candidates.indices.find(i => keys(i + 1) == keys.head)
    assert(nearDupIdx.isDefined,
      "no 1-word edit preserved the OPH band key — fixture precondition")
    val nearDup = candidates(nearDupIdx.get)
    val other = (1 to 40).map(i => s"v$i").mkString(" ")
    assert(ophKey(Seq(other)).head != keys.head)

    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.neardupGateOph(df, watermark = "1 hour")
      .writeStream.format("memory").queryName("neardup_gate_oph")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, base),
        (ts("2024-01-01 10:01:00"), 2L, "tiny"),
        (ts("2024-01-01 10:02:00"), 3L, other))
      q.processAllAvailable()
      in.addData(
        (ts("2024-01-01 10:10:00"), 4L, nearDup), // OPH near-dup → dropped
        (ts("2024-01-01 10:11:00"), 5L, "tiny"),  // exact short dup → dropped
        (ts("2024-01-01 10:12:00"), 6L, "tiny2")) // distinct short → kept
      q.processAllAvailable()
      val kept = spark.table("neardup_gate_oph").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 2L, 3L, 6L))
    } finally q.stop()
    val withSig = Seq(("a", ts("2024-01-01 10:00:00"), "x"))
      .toDF("text", "ts", "oph_band_sig")
    val e = intercept[IllegalArgumentException](Streams.neardupGateOph(withSig))
    assert(e.getMessage.contains("oph_band_sig"))
  }

  test("scrubAndGate: stateless scrub gives identical batch and stream results") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rows = Seq(
      (1L, "reach me at alice@example.com or +1-555-1234 " + ("pad " * 20)),
      (2L, "server 10.0.42.1 in rack " + ("pad " * 20)),
      (3L, "too short"), // gated out
      (4L, ("clean text " * 10)))
    val in = MemoryStream[(Long, String)]
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "n_pii").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val q = Streams.scrubAndGate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scrub")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = shape(spark.table("scrub"))
      val batch = shape(Streams.scrubAndGate(rows.toDF("doc_id", "text")))
      assert(stream == batch)
      assert(stream.map(_._1) == Seq(1L, 2L, 4L)) // doc 3 gated on RAW length
      assert(stream(0)._2.contains("<EMAIL>") && stream(0)._2.contains("<PHONE>"))
      assert(stream(1)._2.contains("<IP>") && stream(0)._3 == 2L)
    } finally q.stop()
    // the gate preserves every column, so it composes with the stateful
    // stages: dedup over the SCRUBBED text (r05 review: the old select
    // dropped text/ts and broke exactly this composition)
    val in2 = MemoryStream[(Long, String, Timestamp)]
    val q2 = Streams.dedupDocuments(
      Streams.scrubAndGate(in2.toDF().toDF("doc_id", "text", "ts")))
      .writeStream.format("memory").queryName("scrubdedup")
      .outputMode("append").start()
    try {
      in2.addData(
        (1L, "dup body " * 10 + "mail a@b.example", ts("2024-01-01 10:00:00")),
        (2L, "dup body " * 10 + "mail c@d.example", ts("2024-01-01 10:01:00")),
        (3L, "other " * 12, ts("2024-01-01 10:02:00")))
      q2.processAllAvailable()
      // both emails redact to <EMAIL>, so docs 1 and 2 become duplicates
      assert(spark.table("scrubdedup").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    } finally q2.stop()
  }

  test("quality packs are stream-composable: c4 + gopher identical on batch and stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.operators.Pipeline
    // the C4 and Gopher packs are pure map-side Columns (no state, no
    // shuffle), so the SAME calls must run unchanged on readStream —
    // the contract that lets the batch curation recipes serve as the
    // streaming ingest filter chain
    val good = "This is a perfectly reasonable sentence of prose."
    val rows = Seq(
      (1L, s"$good\n$good\nAnother fine sentence closes the page!"),
      (2L, s"$good\nno punctuation on this line\nToo few words."),
      (3L, s"$good\n$good\nlorem ipsum dolor sit amet for padding."))
    def chain(df: org.apache.spark.sql.DataFrame) =
      Pipeline.gopherQualitySignals(
        Pipeline.c4CleanLines(df, "doc_id", "text")
          .select(col("doc_id"), col("cleaned_text"), col("keep").as("c4_keep")),
        "doc_id", "cleaned_text", minWords = 0)
        .select("doc_id", "c4_keep", "n_words", "pass")
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val in = MemoryStream[(Long, String)]
    val q = chain(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qpacks")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val stream = shape(spark.table("qpacks"))
      val batch = shape(chain(rows.toDF("doc_id", "text")))
      assert(stream == batch)
      // and the verdicts are the interesting ones: 1 passes C4, 3 is
      // page-banned; gopher's word-count signal runs on CLEANED text
      assert(stream.map(s => s._1 -> s._2).toMap ==
        Map(1L -> true, 2L -> false, 3L -> false))
    } finally q.stop()
  }

  test("ngramDecontaminate composes stream-static: live docs vs a static eval set") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.operators.Pipeline
    // the eval side is a STATIC frame that collapses to one broadcast
    // row, so decontamination slots straight into an ingest stream —
    // each arriving doc is flagged against the fixed benchmark suite
    val evalSet = Seq((100L, (1 to 20).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val q = Pipeline.ngramDecontaminate(
        in.toDF().toDF("doc_id", "text"), evalSet, textCol = "text")
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, (1 to 20).map(i => s"e$i").mkString(" ")),  // verbatim eval doc
        (2L, (1 to 20).map(i => s"x$i").mkString(" ")),  // disjoint
        (3L, "short doc"))                                // < n words
      q.processAllAvailable()
      val got = spark.table("decon").collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(got == Map(1L -> true, 2L -> false, 3L -> false))
    } finally q.stop()
  }

  test("decontaminateSpans composes stream-static: spans excised on arrival") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.operators.Pipeline
    // same one-broadcast-row shape as the boolean gate, so the
    // span-excising variant also slots into an ingest stream: each
    // arriving doc loses just its contaminated windows, clean docs
    // pass byte-identical
    val evalSet = Seq((100L, (1 to 8).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, ((1 to 8).map(i => s"e$i") ++ (1 to 5).map(i => s"k$i"))
        .mkString(" ")),                                 // leads with the eval gram
      (2L, (1 to 12).map(i => s"x$i").mkString(" ")),    // disjoint
      (3L, "short doc"))                                 // < n words
    val in = MemoryStream[(Long, String)]
    val q = Pipeline.decontaminateSpans(
        in.toDF().toDF("doc_id", "text"), evalSet, textCol = "text", n = 8)
      .writeStream.format("memory").queryName("deconspan")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("deconspan").collect()
        .map(r => r.getLong(0) -> (r.getAs[Long]("n_flagged_grams"),
          r.getAs[String]("cut_spans"), r.getAs[String]("text_clean")))
        .toMap
      assert(got(1L) == ((1L, "0-8", (1 to 5).map(i => s"k$i")
        .mkString(" "))))
      assert(got(2L) == ((0L, "", docs(1)._2)))
      assert(got(3L) == ((0L, "", "short doc")))
      // bit-identical to the batch path (same code, both executions)
      val batch = Pipeline.decontaminateSpans(
          docs.toDF("doc_id", "text"), evalSet, textCol = "text", n = 8)
        .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_flagged_grams"),
          r.getAs[String]("cut_spans"), r.getAs[String]("text_clean")))
        .toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("assignToCentroids serves a trained index to a live vector stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.operators.Pipeline
    // train once on a static corpus, then assign ARRIVING vectors with
    // the identical map-side pass — the online half of an ANN index
    val train = (0 until 9).map { i =>
      (i.toLong, Array.tabulate(8)(j => 100f * (i % 3) + j * 0.1f))
    }.toDF("vec_id", "embedding")
    val (_, cents) = Pipeline.ivfIndex(train, "vec_id", "embedding",
      k = 3, dim = 8, iters = 1, seedRounds = 2)
    val centsRows = cents.collect() // force training before the stream
    assert(centsRows.length == 3)
    val in = MemoryStream[(Long, Array[Float])]
    val q = Pipeline.assignToCentroids(
        in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", cents)
      .select("vec_id", "cl")
      .writeStream.format("memory").queryName("assign")
      .outputMode("append").start()
    try {
      val arriving = (100 until 106).map { i =>
        (i.toLong, Array.tabulate(8)(j => 100f * (i % 3) + j * 0.1f))
      }
      in.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = spark.table("assign").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // batch and stream assignments are identical (same code path)
      val batch = Pipeline.assignToCentroids(
        arriving.toDF("vec_id", "embedding"), "vec_id", "embedding", cents)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(streamed == batch && streamed.size == 6)
      // and vectors landing on a training blob share its cluster
      // (training vec `b` sits exactly on blob b = id % 3)
      val trainCl = Pipeline.assignToCentroids(train, "vec_id", "embedding",
        cents).collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      arriving.foreach { case (id, _) =>
        assert(streamed(id) == trainCl(id % 3), s"vec $id landed off its blob")
      }
    } finally q.stop()
  }

  test("toParquet: checkpointed file sink resumes exactly-once across restarts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ssink").toString
    val out = s"$base/data"
    val ckpt = s"$base/ckpt"
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("id", "v")
    val q1 = Streams.toParquet(df, out, ckpt)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: committed batch 0 must not be
    // rewritten, new data lands in a new batch — exactly-once overall
    val q2 = Streams.toParquet(df, out, ckpt)
    try {
      in.addData((3L, "c"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("enrich: stream-static broadcast join keeps unknown keys with nulls") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq(("web", 0.9), ("books", 0.99)).toDF("source", "quality")
    val in = MemoryStream[(Long, String)]
    val q = Streams.enrich(in.toDF().toDF("doc_id", "source"), dim, "source")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData((1L, "web"), (2L, "books"), (3L, "unknown"))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .collect().map(r => (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
      assert(rows == Seq((1L, Some(0.9)), (2L, Some(0.99)), (3L, None)))
    } finally q.stop()
  }

  test("dedupDocuments + toParquet: dedup STATE survives a checkpoint restart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sdedup").toString
    val in = MemoryStream[(Long, String, Timestamp)]
    def dedup = Streams.dedupDocuments(
      in.toDF().toDF("doc_id", "text", "ts")).select("doc_id")
    val q1 = Streams.toParquet(dedup, s"$base/data", s"$base/ckpt")
    try {
      in.addData((1L, "same text", ts("2024-01-01 10:00:00")))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: the content-hash state store must be
    // recovered, so the same text arriving within the watermark is
    // dropped by the NEW query instance
    val q2 = Streams.toParquet(dedup, s"$base/data", s"$base/ckpt")
    try {
      in.addData(
        (2L, "same text", ts("2024-01-01 10:05:00")),
        (3L, "different text", ts("2024-01-01 10:06:00")))
      q2.processAllAvailable()
    } finally q2.stop()
    val ids = spark.read.parquet(s"$base/data")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L)) // doc 2 deduped against pre-restart state
  }

  test("runningUserStats: keyed state accumulates across batches, idle state evicts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = Streams.runningUserStats(in.toDS(), idleTimeout = "30 minutes",
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("stats")
      .outputMode(Streams.runningStatsOutputMode).start()
    try {
      in.addData(
        UserEvent(1, "click", ts("2024-01-01 10:00:00")),
        UserEvent(1, "purchase", ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      in.addData(
        UserEvent(1, "click", ts("2024-01-01 10:02:00")),
        UserEvent(2, "click", ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val last = spark.table("stats")
        .groupBy("user_id").agg(max("n_events").as("n"), max("n_purchases").as("p"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(last == Seq((1L, 3L, 1L), (2L, 1L, 0L)))
      // push the watermark past every idle horizon (sentinel user), then
      // send user 1 again: its state was EVICTED, so counters restart —
      // the bounded-state contract, not an accumulation bug
      in.addData(UserEvent(9, "click", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData(UserEvent(1, "click", ts("2024-01-01 12:00:30")))
      q.processAllAvailable()
      val user1 = spark.table("stats").filter(col("user_id") === 1L)
        .agg(max("n_events")).head.getLong(0)
      assert(user1 == 3L) // the re-start emits n_events=1, max stays 3
      val restarted = spark.table("stats")
        .filter(col("user_id") === 1L && col("n_events") === 1L)
      assert(restarted.count() >= 1L) // fresh state entry after eviction
    } finally q.stop()
  }

  test("runningUserStats: a late-but-admissible older event still accumulates") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // a generous watermark admits an event OLDER than the user's prior
    // max — the state must fold it in (and, per the UserState.maxTs
    // contract, must NOT rewind the idle deadline to the older time)
    val in = MemoryStream[UserEvent]
    val q = Streams.runningUserStats(in.toDS(), idleTimeout = "30 minutes",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("latestats")
      .outputMode(Streams.runningStatsOutputMode).start()
    try {
      in.addData(UserEvent(1, "click", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData(UserEvent(2, "click", ts("2024-01-01 10:25:00")))
      q.processAllAvailable() // watermark now 09:55
      in.addData(UserEvent(1, "purchase", ts("2024-01-01 09:58:00"))) // late
      q.processAllAvailable()
      val user1 = spark.table("latestats").filter(col("user_id") === 1L)
        .agg(max("n_events"), max("n_purchases")).head
      assert((user1.getLong(0), user1.getLong(1)) == ((2L, 1L)))
    } finally q.stop()
  }

  test("runningCardCounts: streaming per-stratum totals equal the batch data card") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    val counted = Streams.runningCardCounts(
      in.toDF().toDF("doc_id", "text", "lang"), "lang")
    val q = counted.writeStream.format("memory")
      .queryName("card_stream").outputMode("complete").start()
    try {
      in.addData((1L, "one two three", "en"), (2L, "vier", "de"),
        (3L, null, "en"))
      q.processAllAvailable()
      in.addData((4L, "cinq six", "fr"), (5L, "seven", "en"))
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("card_stream").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // batch twin over the union of both micro-batches
    val batch = operators.Pipeline.dataCard(
      Seq((1L, "one two three", "en"), (2L, "vier", "de"),
        (3L, null.asInstanceOf[String], "en"), (4L, "cinq six", "fr"),
        (5L, "seven", "en")).toDF("doc_id", "text", "lang"),
      "doc_id", "text", Seq("lang"))
      .filter(org.apache.spark.sql.functions.col("section") === "by_lang")
      .collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(stream == batch, s"stream $stream vs batch $batch")
  }
}
