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
    val rows = operators.Pipeline.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // toMap would mask a duplicate-node regression (keeping whichever
    // row collects last) — every node must appear exactly once
    assert(rows.length == rows.map(_._1).distinct.length,
      s"connectedComponents emitted duplicate node rows: ${rows.length} rows, " +
        s"${rows.map(_._1).distinct.length} distinct nodes")
    rows.toMap
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

  test("connectedComponents: refuses to return non-converged labels") {
    import spark.implicits._
    // a 6-node path needs 5 rounds; a 2-round budget must throw, not
    // silently return split components
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException](
      operators.Pipeline.connectedComponents(chain, maxIter = 2))
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents: raising maxIter converges a graph that first threw") {
    import spark.implicits._
    // a 60-edge path cannot converge in 3 plain rounds (labels move at
    // most 3 hops before pointer-jumping even starts): maxIter=3 must
    // throw, and the SAME input must converge when maxIter is raised —
    // proving the failure is a budget, not a bug
    val longChain = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException](
      operators.Pipeline.connectedComponents(longChain, maxIter = 3))
    assert(e.getMessage.contains("raise maxIter"))
    val got = operators.Pipeline.connectedComponents(longChain, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 60L).map(_ -> 0L).toMap)
  }

  test("connectedComponents: pointer-jumping converges a deep chain in the default budget") {
    import spark.implicits._
    // a 120-edge path has diameter 120 — plain min-propagation would
    // need 120 rounds and blow the default maxIter=50; the shortcut
    // step (lbl ← lbl(lbl) from round 4 on) contracts chains
    // geometrically, so the DEFAULT budget must now suffice. This is
    // the 100 TB story: round count scales with log(diameter), not
    // diameter, so no corpus shape needs a hand-tuned budget
    val deepChain = (0L until 120L).map(i => (i, i + 1)).toDF("a", "b")
    val got = operators.Pipeline.connectedComponents(deepChain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 120L).map(_ -> 0L).toMap)
  }

  test("connectedComponents: reliable-checkpoint strategy gives the same answer") {
    import spark.implicits._
    // the cluster-mode path: checkpoint(dir) instead of localCheckpoint
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    try {
      val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("a", "b")
      val out = operators.Pipeline
        .connectedComponents(pairs, checkpointDir = Some(dir))
      // the collect reads the FINAL round's checkpoint files — proving
      // the success-path cleanup kept the one directory the returned
      // DataFrame still needs
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
      // intermediates are deleted round-by-round as each checkpoint
      // materializes: exactly ONE rdd-N dir (the final labels') survives
      // under the per-call UUID subdir
      val rddDirs = scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)))(
        _.filter(p => p.getFileName.toString.startsWith("rdd-")).toArray)
      assert(rddDirs.length == 1, s"expected 1 surviving rdd dir, got ${rddDirs.length}")
    } finally
      // the operator documents that with no PRIOR dir, its own stays
      // set; unset it so later suites relying on "no checkpoint dir
      // configured" semantics aren't silently checkpointing here
      spark.sparkContext.setCheckpointDir(null)
  }

  test("connectedComponents: a concurrent foreign checkpoint is never deleted") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // ownership is POSITIVE (the checkpointed plan reports its own rdd
    // directory), so a foreign df.checkpoint() racing CC's rounds —
    // which lands inside CC's uuid root, the context-global dir — can
    // never be attributed to a CC round and deleted. The overlap is
    // timing-dependent, but the assertion is timing-INDEPENDENT under
    // the fix (foreign files survive any interleaving); the prior
    // listing-diff cleanup failed this test whenever a foreign
    // checkpoint landed inside a round's diff window.
    val dir = java.nio.file.Files.createTempDirectory("cc-race").toString
    try {
      // a chain deep enough for several checkpointed rounds
      val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
      val cc = Future(operators.Pipeline
        .connectedComponents(pairs, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      var foreign = Vector.empty[org.apache.spark.sql.DataFrame]
      while (!cc.isCompleted) {
        // throws until CC's thread sets the context checkpoint dir
        try foreign = foreign :+ spark.range(100).toDF("n").checkpoint()
        catch { case _: org.apache.spark.SparkException => () }
        Thread.sleep(20)
      }
      val got = Await.result(cc, 120.seconds)
      assert(got == (0L to 60L).map(_ -> 0L).toMap)
      assert(foreign.nonEmpty, "no foreign checkpoint overlapped the CC run")
      foreign.foreach(f => assert(f.count() == 100L,
        "a foreign checkpoint lost its files to CC's cleanup"))
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("connectedComponents: restores the caller's checkpoint LOCATION, not its uuid subdir") {
    import spark.implicits._
    // getCheckpointDir reports the <dir>/<uuid> subdir setCheckpointDir
    // created; restoring that value verbatim would nest a fresh uuid one
    // level deeper per call — the restore must land back under the
    // caller's ORIGINAL argument
    val sc = spark.sparkContext
    val callerDir = java.nio.file.Files.createTempDirectory("cc-caller").toString
    val ccDir = java.nio.file.Files.createTempDirectory("cc-own").toString
    sc.setCheckpointDir(callerDir)
    try {
      val pairs = Seq((1L, 2L)).toDF("a", "b")
      operators.Pipeline
        .connectedComponents(pairs, checkpointDir = Some(ccDir)).collect()
      val restored = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
      assert(restored.getParent.toUri.getPath ==
        new java.io.File(callerDir).getAbsolutePath,
        s"checkpoint dir restored to $restored, expected a uuid dir " +
          s"directly under $callerDir")
    } finally sc.setCheckpointDir(null)
  }

  test("connectedComponents: deep chain under reliable checkpointing cleans up and converges") {
    import spark.implicits._
    // pointer-jumping × incremental cleanup together: jump rounds read
    // round k−1's checkpoint files during round k's materialization,
    // and the cleanup deletes them right after — a deep chain (many
    // rounds past the jump threshold) would surface any ordering bug
    // as a FileNotFoundException here, and a cleanup-ownership bug as
    // leftover rdd dirs
    val dir = java.nio.file.Files.createTempDirectory("cc-deep-ckpt").toString
    try {
      val chain = (0L until 80L).map(i => (i, i + 1)).toDF("a", "b")
      val got = operators.Pipeline
        .connectedComponents(chain, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0L to 80L).map(_ -> 0L).toMap)
      val rddDirs = scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)))(
        _.filter(p => p.getFileName.toString.startsWith("rdd-")).toArray)
      assert(rddDirs.length == 1, s"expected 1 surviving rdd dir, got ${rddDirs.length}")
    } finally spark.sparkContext.setCheckpointDir(null) // see the sibling test
  }

  test("connectedComponents: superseded local-checkpoint rounds are released") {
    import spark.implicits._
    // the localCheckpoint path must free round j's blocks once round
    // j+1 materializes (the 100 TB concern: one label-table copy per
    // round pinned until JVM exit); only the FINAL labels' blocks —
    // the result — may survive the call
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = operators.Pipeline.connectedComponents(chain)
    assert(out.collect().length == 41)
    val extra = spark.sparkContext.getPersistentRDDs.keySet -- before
    // a 40-edge chain runs many rounds; exactly one (the final labels')
    // localCheckpoint RDD may remain
    assert(extra.size <= 1,
      s"superseded CC rounds leaked persistent RDDs: $extra")
  }

  test("dedupChainManaged: release() frees EVERY block the chain pinned " +
      "(incl. connectedComponents' inner labels — the r18 double-checkpoint leak)") {
    import spark.implicits._
    val t = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq((1L, t), (2L, t), (3L, t + " juliet"), (4L, "other words " +
      "entirely unrelated content here okay")).toDF("doc_id", "text")
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = operators.Pipeline.dedupChainManaged(docs, "doc_id", "text")
    assert(chain.deduped.count() >= 1 && chain.report.count() >= 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "the chain should pin its exact/components checkpoints while live")
    chain.release()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"chain.release() left blocks pinned: $leaked")
  }

  test("sharedComponents memo: release frees blocks; a 5th dir evicts the 1st") {
    import spark.implicits._
    val P = operators.Pipeline
    // five tiny corpora, each its own data dir (the memo key)
    def writeDir(tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"memo-$tag").toString
      val text = s"alpha bravo charlie delta echo foxtrot golf hotel $tag"
      Seq((1L, text), (2L, text), (3L, text + " india"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val dirs = (1 to 5).map(i => writeDir(s"d$i"))
    def persisted() = spark.sparkContext.getPersistentRDDs.keySet
    spark.catalog.clearCache() // isolate from other suites' leftovers
    val before = persisted()
    try {
      // build one entry, then release it: its checkpoint blocks go away
      P.sharedComponents(spark, dirs(0)).count()
      spark.catalog.clearCache() // drop the minhash build's session cache
      assert((persisted() -- before).nonEmpty,
        "a memoized components entry should pin a persisted RDD")
      P.releaseSharedComponents(spark, dirs(0))
      assert((persisted() -- before).isEmpty,
        s"release left blocks pinned: ${persisted() -- before}")
      // refill: entry 1 first, then four more — the 5th insertion must
      // evict entry 1 and free ITS blocks specifically
      P.sharedComponents(spark, dirs(0)).count()
      spark.catalog.clearCache()
      val firstRdds = persisted() -- before
      dirs.drop(1).foreach { d =>
        P.sharedComponents(spark, d).count(); spark.catalog.clearCache()
      }
      assert(firstRdds.forall(id => !persisted().contains(id)),
        "the 5th entry must evict the 1st entry's blocks")
      // live entries stay memoized: the same frame comes back
      assert(P.sharedComponents(spark, dirs(4)) eq
        P.sharedComponents(spark, dirs(4)))
      // an evicted dir transparently rebuilds
      assert(P.sharedComponents(spark, dirs(0)).count() > 0)
    } finally dirs.foreach(d => P.releaseSharedComponents(spark, d))
  }

  test("pinSharedComponents: a lazily-held pinned frame survives cap pressure") {
    import spark.implicits._
    val P = operators.Pipeline
    def writeDir(tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"pin-$tag").toString
      val text = s"alpha bravo charlie delta echo foxtrot golf hotel $tag"
      Seq((1L, text), (2L, text), (3L, text + " india"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val dirs = (1 to 6).map(i => writeDir(s"d$i"))
    try {
      // pin dir 0 and hold the frame LAZILY — no action yet
      val handle = P.pinSharedComponents(spark, dirs(0))
      spark.catalog.clearCache()
      // five more dirs blow well past the cap of 4: without the pin,
      // dir 0 would be the first eviction victim and the lazy frame's
      // blocks would be gone
      dirs.drop(1).foreach { d =>
        P.sharedComponents(spark, d).count(); spark.catalog.clearCache()
      }
      // the pinned frame still fires its action cleanly (all three
      // docs of the fixture are mutual near-dups → 3 labeled nodes)
      assert(handle.df.count() == 3)
      // still memoized (not rebuilt): same frame instance comes back
      assert(P.sharedComponents(spark, dirs(0)) eq handle.df)
      // close() restores eviction eligibility: the NEXT over-cap
      // insertion may now evict dir 0 (close is idempotent)
      handle.close(); handle.close()
      val extra = writeDir("d7")
      try {
        P.sharedComponents(spark, extra).count()
        // dir 0 was the oldest unpinned entry → evicted → a fresh call
        // rebuilds a NEW frame rather than returning the old instance
        assert(!(P.sharedComponents(spark, dirs(0)) eq handle.df))
      } finally P.releaseSharedComponents(spark, extra)
    } finally dirs.foreach(d => P.releaseSharedComponents(spark, d))
  }

  test("pin handles: stale close steals no pins; over-cap overhang drains") {
    import spark.implicits._
    val P = operators.Pipeline
    def writeDir(tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"pin2-$tag").toString
      val text = s"alpha bravo charlie delta echo foxtrot golf hotel $tag"
      Seq((1L, text), (2L, text)).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val dirs = (1 to 8).map(i => writeDir(s"d$i"))
    try {
      // STALE-HANDLE rule: after an explicit release + rebuild, the old
      // handle's close must not strip the NEW handle's pin
      val h1 = P.pinSharedComponents(spark, dirs(0))
      P.releaseSharedComponents(spark, dirs(0)) // owner override
      val h2 = P.pinSharedComponents(spark, dirs(0))
      h1.close() // stale: must be a no-op on h2's entry
      dirs.slice(1, 6).foreach(d =>
        P.sharedComponents(spark, d).count()) // cap pressure (cap 4)
      assert(h2.df.count() == 2, "stale close exposed a live pin to eviction")
      assert(P.sharedComponents(spark, dirs(0)) eq h2.df)
      h2.close()
      // OVERHANG rule: pin past the cap, close everything, and the
      // excess must drain on later insertions instead of persisting
      val handles = dirs.take(6).map(d => P.pinSharedComponents(spark, d))
      handles.foreach(_.close()) // memo now (possibly) above cap, all unpinned
      P.sharedComponents(spark, dirs(6)).count() // drains down to the cap
      // the OLDEST entries are gone: dir 0 rebuilds as a new frame…
      assert(!(P.sharedComponents(spark, dirs(0)) eq handles(0).df))
      // …while the newest pinned-then-closed entry is still memoized
      assert(P.sharedComponents(spark, dirs(5)) eq handles(5).df)
    } finally dirs.foreach(d => P.releaseSharedComponents(spark, d))
  }

  test("pinSharedIvfPq: pinned index artifacts survive cap pressure; stale close no-ops") {
    import spark.implicits._
    val P = operators.Pipeline
    def writeDir(tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"pinivf-$tag").toString
      (0 until 12).map { i =>
        (i.toLong, Array.tabulate(64)(j => 100f * (i % 3) + i * 0.5f + j * 0.01f),
          i % 3)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    val dirs = (1 to 4).map(i => writeDir(s"d$i"))
    try {
      val h = P.pinSharedIvfPq(spark, dirs(0))
      // three more dirs exceed the cap of 2: the pinned entry survives
      dirs.drop(1).foreach(d => P.sharedIvfPq(spark, d).cents.count())
      assert(h.art.cents.count() == 3 && h.art.codes.count() == 12)
      assert(P.sharedIvfPq(spark, dirs(0)).member eq h.art.member)
      // stale-close safety: release + rebuild, then the OLD handle's
      // close must not strip the new pin
      P.releaseSharedIvfPq(spark, dirs(0))
      val h2 = P.pinSharedIvfPq(spark, dirs(0))
      h.close(); h.close() // stale + idempotent
      dirs.drop(1).foreach(d => P.sharedIvfPq(spark, d).cents.count())
      assert(h2.art.books.count() == 16, "stale close exposed the new pin")
      h2.close()
    } finally dirs.foreach(d => P.releaseSharedIvfPq(spark, d))
  }

  test("sharedComponents memo: concurrent same-dir calls build once, share one frame") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("memo-conc").toString
    val text = "alpha bravo charlie delta echo foxtrot golf hotel india"
    Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      // the memo is the demo-harness dedup graph: racing consumers
      // (Verify's queries share one session) must get the SAME
      // materialized frame, never a duplicate graph build
      val frames = Await.result(
        Future.sequence((1 to 4).map(_ =>
          Future(operators.Pipeline.sharedComponents(spark, dir)))),
        120.seconds)
      assert(frames.forall(_ eq frames.head),
        "concurrent sharedComponents calls returned distinct frames")
      assert(frames.head.count() == 2)
    } finally operators.Pipeline.releaseSharedComponents(spark, dir)
  }

  test("KeyedMemo: other keys and release proceed while a build is parked") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val P = operators.Pipeline
    // the build-outside-lock CONTRACT (ADVICE r11): a long index build
    // for one key must not serialize the whole memo — other-key
    // callers, unpin and removeAndRelease all complete while the first
    // key's builder is parked on a latch
    val memo = new P.KeyedMemo[P.MemoEntry](cap = 4, _ => ())
    val buildStarted = new java.util.concurrent.CountDownLatch(1)
    val releaseBuild = new java.util.concurrent.CountDownLatch(1)
    val aDone = new java.util.concurrent.atomic.AtomicReference[P.MemoEntry]
    val builder = new Thread(() => {
      val e = memo.getOrBuild("A", pin = false) {
        buildStarted.countDown()
        releaseBuild.await()
        new P.MemoEntry(null)
      }
      aDone.set(e)
    })
    builder.start()
    try {
      assert(buildStarted.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // with A's build parked: a DIFFERENT key builds and returns…
      val b = Await.result(
        Future(memo.getOrBuild("B", pin = true)(new P.MemoEntry(null))),
        10.seconds)
      // …and the maintenance calls a close() makes don't block either
      Await.result(Future {
        memo.unpin("B", b)
        memo.removeAndRelease("B")
      }, 10.seconds)
      assert(aDone.get() == null, "A's build should still be parked")
      // a same-key waiter shares A's single in-flight build: its own
      // thunk must never run
      val waiter = Future(memo.getOrBuild("A", pin = false) {
        fail("same-key waiter ran a second build")
      })
      releaseBuild.countDown()
      val w = Await.result(waiter, 30.seconds)
      builder.join(30000)
      assert(aDone.get() != null && (w eq aDone.get()),
        "waiter must share the builder's entry")
    } finally {
      releaseBuild.countDown()
      builder.join(30000)
    }
  }

  test("KeyedMemo: a release during a build discards the stale result and rebuilds") {
    val P = operators.Pipeline
    // the generation contract (ADVICE r12): removeAndRelease landing
    // while a build is in flight must not be resurrected by that
    // build's insert — the builder discards its result (released, so
    // no block leak) and rebuilds under the new generation
    val released = new java.util.concurrent.ConcurrentLinkedQueue[P.MemoEntry]()
    val memo = new P.KeyedMemo[P.MemoEntry](cap = 4, e => released.add(e))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val firstStarted = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val made = new java.util.concurrent.ConcurrentLinkedQueue[P.MemoEntry]()
    val result = new java.util.concurrent.atomic.AtomicReference[P.MemoEntry]
    val builder = new Thread(() => result.set(memo.getOrBuild("A",
        pin = false) {
      if (builds.incrementAndGet() == 1) { firstStarted.countDown(); gate.await() }
      val e = new P.MemoEntry(null); made.add(e); e
    }))
    builder.start()
    try {
      assert(firstStarted.await(10, java.util.concurrent.TimeUnit.SECONDS))
      memo.removeAndRelease("A") // bumps the generation mid-build
      gate.countDown()
      builder.join(30000)
      assert(builds.get() == 2, "raced build must rebuild, not resurrect")
      val all = made.toArray(Array.empty[P.MemoEntry]).toSeq
      assert(all.size == 2 && (result.get() eq all(1)))
      // the stale first entry was released, never inserted
      assert(released.toArray(Array.empty[P.MemoEntry]).toSeq == Seq(all(0)))
      // and the fresh entry is what the memo serves from now on
      assert(memo.getOrBuild("A", pin = false) {
        fail("should be memoized")
      } eq all(1))
    } finally { gate.countDown(); builder.join(30000) }
  }

  test("sharedIvfPq memo: builds once, artifact shapes; release frees blocks") {
    import spark.implicits._
    val P = operators.Pipeline
    val dir = java.nio.file.Files.createTempDirectory("memo-ivfpq").toString
    // 12 deterministic 64-dim vectors in 3 crude blobs so k = 3 trains
    val vecs = (0 until 12).map { i =>
      (i.toLong,
        Array.tabulate(64)(j => (100f * (i % 3)) + i * 0.5f + j * 0.01f),
        i % 3)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def persisted() = spark.sparkContext.getPersistentRDDs.keySet
    spark.catalog.clearCache()
    val before = persisted()
    try {
      val art = P.sharedIvfPq(spark, dir)
      // fixture-parameter artifact shapes: corpus-sized labels + codes,
      // k centroid rows, m×ksub codebook rows
      assert(art.member.count() == 12 && art.codes.count() == 12)
      assert(art.cents.count() == 3 && art.books.count() == 16)
      spark.catalog.clearCache() // memo blocks are NOT CacheManager's
      assert((persisted() -- before).nonEmpty,
        "memoized index artifacts should pin persisted RDDs")
      // served, not retrained: the same artifact set comes back
      assert(P.sharedIvfPq(spark, dir) eq art)
      P.releaseSharedIvfPq(spark, dir)
      assert((persisted() -- before).isEmpty,
        s"release left blocks pinned: ${persisted() -- before}")
      // a released dir transparently rebuilds
      assert(P.sharedIvfPq(spark, dir).cents.count() == 3)
    } finally P.releaseSharedIvfPq(spark, dir)
  }

  test("connectedComponents: empty pair list yields an empty result") {
    import spark.implicits._
    val out = operators.Pipeline.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.count() == 0)
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { _ =>
      val n = 30
      val edges = Seq.fill(22)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      // union-find with min-id roots: the final root IS the component min
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = nodes.map(x => x -> find(x.toInt).toLong).toMap
      assert(cc(edges) == expected)
    }
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

  test("dedupLadderReport: four-layer matrix with the semantic input; exact hand-computed counts") {
    import spark.implicits._
    // 12-word docs so the minLen=10 substring layer has room: doc2 is
    // an exact copy of doc1 (also substring-cut in full, first copy
    // wins); doc5 quotes doc3's 10-word run (cut [0,10)); doc4 unique;
    // doc6 is 9 words (below minLen, never substring-flagged)
    val a = (1 to 12).map(i => s"a$i").mkString(" ")
    val run = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, a),
      (2L, a),
      (3L, "c1 c2 " + run),
      (4L, (1 to 11).map(i => s"d$i").mkString(" ")),
      (5L, run + " e1 e2"),
      (6L, (1 to 9).map(i => s"f$i").mkString(" ")))
      .toDF("doc_id", "text")
    // near-dup component graph: {1,2} and {3,5} → removed = {2, 5}
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 3L), (5L, 3L))
      .toDF("node", "component")
    // semantic layer: whatever semDedup dropped — ids {2, 6}; the
    // repeated 6 pins the dedup guard (a duplicate removed id must not
    // fan per-doc rows out through the join and inflate every count)
    val semRemoved = Seq(2L, 6L, 6L).toDF("vec_id")
    val out = operators.Pipeline.dedupLadderReport(docs, "doc_id", "text",
        comps, substringMinLen = 10, semanticRemoved = Some(semRemoved))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    val expected = Map(
      ("corpus", "corpus") -> ((6L, 68L)),
      ("exact", "exact") -> ((1L, 12L)),       // doc2
      ("near", "near") -> ((2L, 24L)),         // docs 2, 5
      ("semantic", "semantic") -> ((2L, 21L)), // docs 2, 6
      ("substring", "substring") -> ((2L, 22L)), // doc2 cut 12 + doc5 cut 10
      ("exact", "near") -> ((1L, -1L)),
      ("exact", "semantic") -> ((1L, -1L)),
      ("exact", "substring") -> ((1L, -1L)),
      ("near", "semantic") -> ((1L, -1L)),
      ("near", "substring") -> ((2L, -1L)),
      ("semantic", "substring") -> ((1L, -1L)),
      ("any", "any") -> ((3L, -1L)))           // docs 2, 5, 6
    assert(out == expected, s"got $out")
    // without the semantic input the matrix collapses to the 3-layer
    // 8-row form with identical text-layer numbers
    val noSem = operators.Pipeline.dedupLadderReport(docs, "doc_id",
        "text", comps, substringMinLen = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(noSem.size == 8)
    // without semantic, doc 6 is unflagged → any = {2, 5}
    assert(noSem(("near", "near")) == 2L && noSem(("any", "any")) == 2L)
  }

  test("corpusDiff: presence vs NULL-text disambiguation, all four statuses") {
    import spark.implicits._
    val prev = Seq(
      (1L, Option("same")),          // unchanged
      (2L, Option("old")),           // changed
      (3L, Option("gone")),          // removed
      (5L, Option.empty[String]),    // NULL text both sides → unchanged
      (6L, Option.empty[String]),    // NULL text prev, absent curr → removed
      (7L, Option("there")))         // present prev, NULL text curr → changed
      .toDF("doc_id", "text")
    val curr = Seq(
      (1L, Option("same")),
      (2L, Option("new")),
      (4L, Option("fresh")),         // added
      (5L, Option.empty[String]),
      (7L, Option.empty[String]),
      (8L, Option.empty[String]))    // absent prev, NULL text curr → added
      .toDF("doc_id", "text")
    val out = operators.Pipeline.corpusDiff(prev, curr, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "removed", 7L -> "changed",
      8L -> "added"), s"got $out")
  }

  test("nfcNormalizeText: composes decomposed text, flags changes, fast-path identity") {
    import spark.implicits._
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val out = operators.Pipeline.nfcNormalizeText(
      Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"),
        (4L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(out(1L) == (Some(composed), false), "already-NFC text untouched")
    assert(out(2L) == (Some(composed), true), "decomposed must compose")
    assert(out(3L) == (Some("plain ascii"), false))
    assert(out(4L) == (None, false), "NULL stays NULL, unflagged")
    // the dedup motivation: same visible text, same hash AFTER the pass
    val hashes = operators.Pipeline.nfcNormalizeText(
      Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text"), "text")
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text_nfc")))
      .collect().map(_.getString(0)).distinct
    assert(hashes.length == 1)
  }
}
