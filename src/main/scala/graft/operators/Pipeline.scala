package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables (builder brief; beyond the reference's surface).
  *
  * Scale stance (100 TB): every operator is bucketed/blocked — MinHash
  * bands and SimHash chunks turn near-dup search into `groupBy(bucket)`
  * (no all-pairs); candidate verification joins are bounded by bucket
  * collisions; embedding search broadcasts the (small) query side and
  * the IVF variant restricts the scan to one cluster. Nothing here
  * collects to the driver.
  *
  * Determinism stance: every floating-point reduction that must match
  * the DuckDB oracle bit-for-bit is either (a) an exact integer/decimal
  * aggregate, or (b) a *sequential* double fold (`aggregate` over an
  * array — same left-to-right order DuckDB's `list_reduce` uses), never
  * a partitioned float `SUM`.
  */
object Pipeline {

  private def words(c: Column): Column = split(c, "\\s+")

  /** Sequential (left-to-right) double dot product of two float arrays —
    * matches DuckDB list_reduce over list_transform exactly. Backed by
    * the codegen'd [[graft.plans.FloatDotProduct]] expression
    * (registered via GraftExtensions) instead of interpreted
    * higher-order functions. */
  private def dot(a: Column, b: Column): Column =
    call_function("float_dot", a, b)

  private def cosine(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / (sqrt(n2a) * sqrt(n2b))

  /** Integer-scaling factor for exact centroid sums — the SINGLE copy
    * shared by [[kmeansFit]]/[[kmeansCluster]]/[[centroidOutliers]] and
    * spliced into the p21/p29 oracle SQL: the determinism contract
    * (bit-identical means across engines) requires every copy to agree,
    * so there is exactly one. */
  private val IntScale = 10000000L

  /** Default exact-Jaccard admission threshold for the minhash pair
    * graph — spliced into [[NeardupPairsSql]] so the oracle twin can
    * never drift from the function default. */
  private val DefaultJaccardMin = 0.5

  /** MinHash params: 32 universal-hash functions h_i(x)=(a_i x+b_i) mod p
    * over the 32-bit shingle ids; 8 bands × 4 rows. */
  private val MinhashP = 4294967311L
  private val NumHashes = 32
  private val BandRows = 4
  private def hashA(i: Int): Long = 2L * i + 1
  private def hashB(i: Int): Long = 99991L * i + 7

  /** Distinct word-5-gram hash set of a words array (the p02/p19/p23
    * shingle artifact — one definition so the cluster keys can never
    * de-synchronize between operators). */
  private[graft] def shingleHashes(ws: Column): Column =
    call_function("kgram_hashes", ws, lit(5), lit(4))

  /** All-n minhash minima in ONE codegen'd pass over the shingle array
    * (the [[graft.plans.MinhashSignature]] expression — same universal
    * hashes as hashA/hashB, bit-identical integer arithmetic). */
  private def minhashSig(xs: Column, n: Int): Column =
    call_function("minhash_sig", xs, lit(n))

  /** Band-0 minhash signature over a shingle-hash array — the LSH
    * bucket key shared by p19, p23 and the streaming near-dup gate. */
  private[graft] def bandSignature(xs: Column): Column = {
    val sig = minhashSig(xs, BandRows)
    concat_ws(",", (0 until BandRows).map(i =>
      element_at(sig, i + 1).cast(StringType)): _*)
  }

  /** p04 stop-gram cap: a trigram shared by more than this many docs in
    * a lang block carries no dedup signal and would quadratically blow
    * up the self-join. Above the sf0.01 corpus size, so the driver-gated
    * result stays the exact Jaccard. */
  private val NgramDfCap = 1000

  /** p27 rarity bound: a bigram is "rare" when it appears in at most
    * this many distinct documents. */
  private val RareBigramDf = 2

  /** LSH bucket-size cap for the pair generators (p02/p26): the pair
    * explode is quadratic in bucket size, so one page duplicated 10^6
    * times would emit 10^12 pairs — the same scale-killer p04's
    * stop-gram cap bounds. A bucket larger than this is a mass-
    * duplicate class; pairwise output for it carries no information
    * per pair (run [[exactDedup]] first — the standard pipeline order
    * — and such buckets collapse before LSH ever sees them). Above
    * every fixture bucket size, so the driver-gated results stay
    * EXACT. */
  private val LshBucketCap = 1000

  /** p32 passage length in words: long enough that a shared passage
    * means copied text, not a common collocation. */
  private val PassageLen = 10

  /** p06 sign-random-projection LSH: 8 bands × 4 hyperplane-sign bits
    * bucket each label block so candidate pairing is bounded per
    * (label, band, sig) bucket instead of quadratic in the cluster. */
  private val SrpBands = 8
  private val SrpRows = 4
  private val EmbDim = 64

  /** Deterministic ±1 hyperplane weight for projection i, dimension d —
    * the parity of the first md5 byte of "srp-i-d". The oracle computes
    * the IDENTICAL formula in SQL (md5 is available in both engines), so
    * the buckets match by construction with no RNG anywhere. */
  private def srpWeight(i: Int, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srp-$i-$d".getBytes("UTF-8"))
      .take(1).map(b => f"${b & 0xff}%02x").mkString
    if (Integer.parseInt(hex, 16) % 2 == 0) 1 else -1
  }

  /** Verified near-dup pairs over ANY corpus: MinHash-LSH candidate
    * generation + exact-Jaccard verification (the p02 plan) as a
    * reusable library operator — `idCol`/`textCol` name the caller's
    * columns, output is (doc_a, doc_b, jaccard) with `jaccard >=
    * jaccardMin`. The p02/p25/p30/p31 QueryDefs all run THIS function,
    * so the fixture gate certifies the same code a library user calls.
    * Buckets larger than [[LshBucketCap]] are dropped (mass-duplicate
    * classes; pair output is quadratic in bucket size) — run
    * [[exactDedup]] first, the standard pipeline order, and such
    * buckets collapse before LSH ever sees them. */
  def minhashNeardupPairs(corpus: DataFrame, idCol: String, textCol: String,
      jaccardMin: Double = DefaultJaccardMin): DataFrame = {
    val docs = corpus
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 5)
    // Per-doc distinct shingle-hash ARRAY, built map-side with
    // higher-order functions — no explode, no (doc,shingle) shuffle.
    // This is the expensive artifact (one md5 per 5-gram); it feeds
    // the signature computation and both sides of the verification
    // join, so materialize it once (spills past memory — at 100 TB
    // you'd persist exactly this table). Session contract: the
    // persist lives until `spark.catalog.clearCache()` — Verify and
    // Bench call it after every query, so the cache is scoped to one
    // execution; long-lived sessions embedding this operator should
    // do the same once the result is materialized.
    // (measured: distincting the 5-gram strings before the md5 saves
    // duplicate hashes but costs an extra string-array materialization
    // — net slower on this corpus, so hash-then-distinct stays)
    val xs = docs
      .select(col("doc_id"), shingleHashes(col("ws")).as("xs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // All 32 minima in ONE codegen'd pass: the whole signature stage
    // is map-side, ZERO shuffle (the r03 plan shuffled every
    // (doc,shingle) pair through distinct + groupBy). Set sizes are
    // read off the arrays in the verification join.
    // (history: 32 separate transform+array_min columns = 32
    // interpreted traversals + 32 intermediate arrays per doc; a
    // 32-slot zip_with accumulator was ~19% slower still; the native
    // MinhashSignature expression does one traversal with a primitive
    // long[] accumulator inside whole-stage codegen)
    val mh = xs.select(col("doc_id"),
      minhashSig(col("xs"), NumHashes).as("mh"))

    val sigCols = (0 until NumHashes / BandRows).map(b =>
      concat_ws(",", (0 until BandRows).map(r =>
        element_at(col("mh"), b * BandRows + r + 1).cast(StringType)): _*)
        .as(s"sig$b"))
    val stackExpr = (0 until NumHashes / BandRows)
      .map(b => s"$b, sig$b").mkString(", ")
    val bands = mh.select(col("doc_id") +: sigCols: _*)
      .select(col("doc_id"),
        expr(s"stack(${NumHashes / BandRows}, $stackExpr) AS (band, sig)"))

    // The ONLY full shuffle in the pipeline: 8 signature rows per
    // doc, grouped by (band, sig) — the LSH bucketing itself.
    val buckets = bands.groupBy(col("band"), col("sig"))
      .agg(array_sort(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= LshBucketCap)
    val pairs = buckets
      .select(explode(col("docs")).as("da"), col("docs"))
      .select(col("da"), explode(col("docs")).as("db"))
      .filter(col("da") < col("db"))
      .distinct()

    // Exact-Jaccard verification: fetch the two shingle arrays and
    // intersect in place — bounded by bucket collisions (pairs is
    // tiny, so both joins broadcast it against the cached xs).
    pairs
      .join(xs.as("xa"), col("da") === col("xa.doc_id"))
      .join(xs.as("xb"), col("db") === col("xb.doc_id"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        size(array_intersect(col("xa.xs"), col("xb.xs")))
          .cast(DoubleType).as("c"),
        size(col("xa.xs")).as("na"), size(col("xb.xs")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
  }

  /** The fixture-corpus instantiation shared by p02/p25/p30/p31. */
  private def neardupPairs(s: SparkSession, d: String): DataFrame =
    minhashNeardupPairs(T.documents(s, d), "doc_id", "text")

  /** Per-JVM memo of the dedup pair GRAPH pass (minhash pairs →
    * [[connectedComponents]]) shared by the p25/p30/p31/p33/p34
    * QueryDef closures — the registered demo harness for the
    * components-sharing library API ([[collapseByComponents]] /
    * [[splitByComponents]] / [[dedupReport]]): within one driver run
    * (Verify, Bench, a notebook session) the graph is built ONCE and
    * every consumer reads the same materialized label table, exactly
    * how a production pipeline ships the suite (the graph build
    * dominates all consumers at 100 TB — VERDICT r08 measured the
    * four standalone rebuilds as the slowest sweep entries). The
    * memoized frame is [[connectedComponents]]' localCheckpoint'ed
    * output: already materialized, so reuse is a block read, and
    * `spark.catalog.clearCache()` (the bench's inter-run hygiene)
    * does not evict it — family bench numbers therefore measure the
    * SHARED path, the amortized cost a suite user actually pays,
    * while p02's standalone timing still prices the graph build
    * itself. Keyed by (spark application, data dir) so a fresh
    * session never reads another context's dead blocks.
    *
    * Lifecycle: each live entry pins a label-table-sized
    * localCheckpoint on the executors, so the memo is CAPPED at
    * [[ComponentsMemoCap]] entries — inserting beyond the cap evicts
    * the OLDEST entry and unpersists its blocks (insertion-order
    * LinkedHashMap; a long-lived session cycling over many data dirs
    * holds at most cap label tables, not one per dir ever touched).
    * [[releaseSharedComponents]] drops one entry on demand — the
    * explicit hand the library API offers callers done with a dir.
    *
    * EVICTION HAZARD: an evicted entry's blocks are unpersisted and
    * its lineage was truncated by the checkpoint, so a caller still
    * holding the frame LAZILY (no action run yet) fails with a
    * missing-checkpoint-block error when its action finally fires.
    * The same applies to a CONCURRENT thread mid-action on an older
    * entry (Verify's queries share one session): cap eviction
    * unpersists with blocking=true AFTER the new build completes, so
    * the block drop at least waits for the remove to finish rather
    * than racing the in-flight job's block fetches — a narrower
    * window, not a guarantee (ADVICE r10). The STRUCTURAL fix is
    * [[pinSharedComponents]]: a pinned entry is never a cap-eviction
    * victim, so a lazy or long-lived holder that pins survives any
    * amount of cap pressure and fires its action cleanly; `close()`
    * the handle when done. Unpinned [[sharedComponents]] callers keep
    * the convention: run the action before the session touches `cap`
    * more data dirs — every registered QueryDef does (the frame is
    * consumed within its own query). Library callers wanting a
    * longer-lived graph either pin, or own their components frame
    * explicitly via [[connectedComponents]]. */
  private val ComponentsMemoCap = 4
  private[graft] sealed trait PinnedEntry { var pins: Int = 0 }
  private[graft] final class MemoEntry(val df: DataFrame) extends PinnedEntry

  /** Keyed get-or-build memo with pin-aware cap eviction — the shared
    * machinery behind [[sharedComponents]] and [[sharedIvfPq]]. The
    * BUILD runs OUTSIDE the map lock (per-key FutureTask in
    * `inflight`): an index training chain takes multiple Spark jobs,
    * and holding the global lock for its duration would block every
    * concurrent caller for ANY key — including trivial `close()`
    * calls (ADVICE r11). Concurrent callers of the SAME key wait on
    * the builder's task (no double build); callers of other keys, and
    * pin/unpin/release, proceed immediately. The builder's INSERT and
    * its inflight-marker removal happen in one synchronized block
    * (ADVICE r12: a gap between them let a concurrent caller become a
    * second owner and leak the overwritten entry's blocks), and a
    * per-key generation bumped by [[removeAndRelease]] makes a build
    * that raced a release discard its result and rebuild rather than
    * resurrect pre-release artifacts. Eviction victims are collected
    * under the lock but their blocking unpersist also runs outside
    * it. */
  private[graft] final class KeyedMemo[E <: PinnedEntry](cap: Int,
      releaseEntry: E => Unit) {
    private val entries = new java.util.LinkedHashMap[String, E]()
    private val inflight =
      new java.util.HashMap[String, java.util.concurrent.FutureTask[E]]()
    // per-key epoch, bumped by removeAndRelease: a build that raced a
    // release is DISCARDED instead of inserted (ADVICE r12 — the old
    // insert-anyway resurrected pre-release artifacts, breaking the
    // "release then call retrains" contract)
    private val generations = new java.util.HashMap[String, java.lang.Long]()

    private def generation(key: String): Long =
      generations.getOrDefault(key, 0L)

    private def await(task: java.util.concurrent.FutureTask[E]): E =
      try task.get()
      catch { case e: java.util.concurrent.ExecutionException =>
        throw e.getCause }

    /** Fetch or build the entry for `key`; with `pin = true` the pin
      * count is incremented ATOMICALLY with the hit/insert (a pin
      * taken after the call could race a concurrent insert's cap
      * eviction and land on a dead entry). */
    def getOrBuild(key: String, pin: Boolean)(build: => E): E = {
      while (true) {
        var task: java.util.concurrent.FutureTask[E] = null
        var mine = false
        var genAtStart = 0L
        this.synchronized {
          val hit = entries.get(key)
          if (hit != null) { if (pin) hit.pins += 1; return hit }
          task = inflight.get(key)
          if (task == null) {
            task = new java.util.concurrent.FutureTask[E](() => build)
            inflight.put(key, task)
            mine = true
            genAtStart = generation(key)
          }
        }
        if (mine) {
          var built: E = null.asInstanceOf[E]
          try { task.run(); built = await(task) }
          finally if (built == null)
            // failed build: drop the inflight marker (and any bump it
            // attracted — nothing was inserted, so there is nothing
            // stale to guard) so the next caller retries; the
            // exception propagates below
            this.synchronized {
              inflight.remove(key); generations.remove(key)
            }
          // insert, inflight removal, pin and eviction scan in ONE
          // synchronized block (ADVICE r12 medium): with the removal
          // in a separate earlier block, a concurrent caller landing
          // in the gap saw neither entry nor inflight task, became a
          // second owner, and the second entries.put silently leaked
          // the overwritten entry's checkpoint blocks
          var stale = false
          val victims = this.synchronized {
            inflight.remove(key)
            val raced = generation(key) != genAtStart
            // the bump has served its purpose once the build it
            // guarded completes — drop the entry so generations stays
            // bounded by IN-FLIGHT keys, not every key ever released
            generations.remove(key)
            if (raced) { stale = true; Nil }
            else {
              val prev = entries.put(key, built)
              if (pin) built.pins += 1
              val out = List.newBuilder[E]
              // defensive: structurally impossible now, but an
              // overwritten entry must never leak its blocks
              if (prev != null && (prev ne built)) out += prev
              // evict OLDEST-first entries with no pins until back AT
              // the cap; when the remaining entries are all pinned the
              // memo temporarily exceeds the cap rather than yanking
              // blocks from under a live handle — and because eviction
              // keeps draining WHILE over cap, the excess is reclaimed
              // by later insertions once handles close (review r11)
              val it = entries.entrySet().iterator()
              while (entries.size > cap && it.hasNext) {
                val en = it.next()
                if (en.getValue.pins == 0 && (en.getValue ne built)) {
                  out += en.getValue
                  it.remove()
                }
              }
              out.result()
            }
          }
          victims.foreach(releaseEntry)
          if (stale) releaseEntry(built)
          // stale → loop: rebuild under the new generation, so this
          // caller too observes the release (fresh artifacts)
          else return built
        } else
          // another thread is building this key: wait on its task,
          // then loop — the re-check handles the (narrow) window where
          // the fresh entry is evicted or released before this waiter
          // reaches it
          await(task)
      }
      throw new IllegalStateException("unreachable")
    }

    /** Decrement `entry`'s pin count IF it still occupies `key`: after
      * an explicit release + rebuild, a stale handle's close must not
      * steal the fresh entry's pin and expose a still-open handle to
      * eviction (review r11). */
    def unpin(key: String, entry: E): Unit = this.synchronized {
      Option(entries.get(key)).filter(_ eq entry)
        .foreach(e => e.pins = math.max(0, e.pins - 1))
    }

    /** Remove `key`'s entry (pinned or not — the owner's override) and
      * release its blocks OUTSIDE the lock. Also bumps the key's
      * generation so an IN-FLIGHT build of the key discards its result
      * and rebuilds instead of inserting pre-release artifacts (ADVICE
      * r12). No-op on the map when absent — the bump still applies. */
    def removeAndRelease(key: String): Unit =
      this.synchronized {
        // the bump only matters to a build currently in flight (its
        // owner compares against the generation captured at start);
        // bumping unconditionally would grow the map by one entry per
        // key ever released
        if (inflight.containsKey(key))
          generations.merge(key, 1L, (a, b) => a + b)
        Option(entries.remove(key))
      }.foreach(releaseEntry)
  }

  private val componentsMemo = new KeyedMemo[MemoEntry](ComponentsMemoCap,
    e => releaseLocalCheckpoint(e.df, blocking = true))
  private def memoKey(s: SparkSession, d: String): String =
    s"${s.sparkContext.applicationId}:$d"

  private def buildComponentsEntry(s: SparkSession, d: String): MemoEntry =
    new MemoEntry(connectedComponents(
      neardupPairs(s, d).select(col("doc_a"), col("doc_b"))))

  private[graft] def sharedComponents(s: SparkSession, d: String): DataFrame =
    componentsMemo.getOrBuild(memoKey(s, d), pin = false)(
      buildComponentsEntry(s, d)).df

  /** A pin on a memoized shared-components entry: while any handle on
    * the entry is open, cap eviction skips it, so the held `df` stays
    * backed by live blocks no matter how many other data dirs the
    * session touches — the structural answer to the memo's eviction
    * hazard for lazy/long-lived holders. `close()` is idempotent;
    * [[releaseSharedComponents]] remains the owner's explicit override
    * (it releases even pinned entries — an open handle's frame must
    * not be used after that, like any released frame). */
  final class SharedComponentsHandle private[Pipeline] (
      private val entry: MemoEntry, key: String) extends AutoCloseable {
    def df: DataFrame = entry.df
    private val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    override def close(): Unit =
      if (closed.compareAndSet(false, true)) componentsMemo.unpin(key, entry)
  }

  /** [[sharedComponents]], PINNED: builds/fetches the memo entry and
    * returns a handle whose frame is exempt from cap eviction until
    * `close()`. The pin is taken atomically with the hit/insert. */
  def pinSharedComponents(s: SparkSession, d: String): SharedComponentsHandle = {
    val key = memoKey(s, d)
    new SharedComponentsHandle(
      componentsMemo.getOrBuild(key, pin = true)(buildComponentsEntry(s, d)),
      key)
  }

  /** Release the memoized shared-components entry for (spark,
    * dataDir): unpersists the label table's localCheckpoint blocks and
    * drops the memo entry — the next [[sharedComponents]] call for the
    * dir rebuilds from scratch. No-op when nothing is memoized. A
    * released DataFrame must not be reused by callers still holding
    * it: its lineage was truncated by the checkpoint, so the freed
    * blocks are unrecoverable (the same contract as Spark's own
    * unpersist-after-localCheckpoint). */
  def releaseSharedComponents(s: SparkSession, d: String): Unit =
    componentsMemo.removeAndRelease(memoKey(s, d))

  /** The coarse-quantizer + product-quantizer index artifacts the
    * p37/p40/p41 ANN gates share, built ONCE per (app, dataDir) at the
    * fixture parameters and memoized — the [[sharedComponents]]
    * pattern applied to index training. The three gates price the same
    * k-means‖-seeded coarse fit and the same four per-subspace
    * codebook fits; standalone they retrained the overlapping chain
    * per gate (~16 s of the r10 sweep). Memoizing mirrors production:
    * an ANN index is TRAINED once and SERVED many times — the serving
    * queries (probe selection, ADC scan) are what each gate times, and
    * p42 (residual IVFADC) deliberately stays standalone so one gate
    * still prices a full training chain end-to-end.
    *
    * Artifacts: `member` (vec_id, cluster — corpus-sized label table),
    * `cents` (k centroid rows), `books` (m×ksub codebook rows), `codes`
    * (vec_id + m codes — corpus-sized). All four are eagerly
    * localCheckpoint'ed: materialized once, lineage truncated, blocks
    * surviving `spark.catalog.clearCache()` (which drops only
    * CacheManager entries). Same cap/eviction/release lifecycle and
    * EVICTION HAZARD contract as [[sharedComponents]] (see there);
    * [[releaseSharedIvfPq]] is the explicit hand. Demo-harness scope:
    * parameters are the fixture suite's (k=3, dim=64, m=4, ksub=4) —
    * library callers own their artifacts via [[ivfIndex]]/[[pqTrain]]/
    * [[pqEncode]] directly. */
  final case class IvfPqArtifacts(member: DataFrame, cents: DataFrame,
      books: DataFrame, codes: DataFrame,
      sqBounds: DataFrame, sqCodes: DataFrame,
      sqBoundsResid: DataFrame, sqCodesResid: DataFrame) {
    private[Pipeline] def frames: Seq[DataFrame] =
      Seq(member, cents, books, codes,
        sqBounds, sqCodes, sqBoundsResid, sqCodesResid)
  }

  private val IvfPqMemoCap = 2
  private final class IvfPqEntry(val art: IvfPqArtifacts) extends PinnedEntry
  private val ivfPqMemo = new KeyedMemo[IvfPqEntry](IvfPqMemoCap,
    e => e.art.frames.foreach(releaseLocalCheckpoint(_, blocking = true)))

  private def buildIvfPqEntry(s: SparkSession, d: String): IvfPqEntry = {
    val e = T.embeddings(s, d)
    val (member0, cents0) = ivfIndex(e, "vec_id", "embedding",
      k = 3, dim = 64, iters = 1, seedRounds = 2)
    val member = member0.localCheckpoint()
    val cents = cents0.localCheckpoint()
    val books = pqTrain(e, "vec_id", "embedding", dim = 64, m = 4,
      ksub = 4, iters = 1).localCheckpoint()
    val codes = pqEncode(e, "vec_id", "embedding", books, dim = 64, m = 4)
      .localCheckpoint()
    // the SQ rungs of the same index family (p50/p54/p55's layouts):
    // bounds are dim-bounded, codes corpus-sized; the residual pair
    // trains on r(v) = v − c(cluster(v)) against the checkpointed
    // coarse artifacts (FAISS by_residual). The residual frame itself
    // is a build intermediate — checkpointed so bounds + codes don't
    // recompute it, released once both consumers are materialized.
    val sqBounds = sqTrain(e, "vec_id", "embedding", dim = 64)
      .localCheckpoint()
    val sqCodes = sqEncode(e, "vec_id", "embedding", sqBounds, dim = 64)
      .localCheckpoint()
    val resid = pqResiduals(e, "vec_id", "embedding", member, cents)
      .localCheckpoint()
    val sqBoundsResid = sqTrain(resid, "vec_id", "residual", dim = 64)
      .localCheckpoint()
    val sqCodesResid = sqEncode(resid, "vec_id", "residual", sqBoundsResid,
      dim = 64).localCheckpoint()
    releaseLocalCheckpoint(resid)
    new IvfPqEntry(IvfPqArtifacts(member, cents, books, codes,
      sqBounds, sqCodes, sqBoundsResid, sqCodesResid))
  }

  private[graft] def sharedIvfPq(s: SparkSession, d: String): IvfPqArtifacts =
    ivfPqMemo.getOrBuild(memoKey(s, d), pin = false)(
      buildIvfPqEntry(s, d)).art

  /** A pin on memoized [[sharedIvfPq]] artifacts — the
    * [[SharedComponentsHandle]] contract applied to the index memo:
    * while open, cap eviction skips the entry; `close()` is
    * idempotent and entry-identity-checked (a stale handle never
    * steals a rebuilt entry's pin). */
  final class SharedIvfPqHandle private[Pipeline] (
      private val entry: IvfPqEntry, key: String) extends AutoCloseable {
    def art: IvfPqArtifacts = entry.art
    private val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    override def close(): Unit =
      if (closed.compareAndSet(false, true)) ivfPqMemo.unpin(key, entry)
  }

  /** [[sharedIvfPq]], PINNED: the entry is exempt from cap eviction
    * until `close()` — for lazy or long-lived artifact holders. The
    * pin is taken atomically with the hit/insert. */
  def pinSharedIvfPq(s: SparkSession, d: String): SharedIvfPqHandle = {
    val key = memoKey(s, d)
    new SharedIvfPqHandle(
      ivfPqMemo.getOrBuild(key, pin = true)(buildIvfPqEntry(s, d)), key)
  }

  /** Release the memoized [[sharedIvfPq]] artifacts for (spark,
    * dataDir) — same contract as [[releaseSharedComponents]]: blocks
    * are freed, released frames must not be reused, the next call
    * retrains (the owner's override — it releases even pinned
    * entries). No-op when nothing is memoized. */
  def releaseSharedIvfPq(s: SparkSession, d: String): Unit =
    ivfPqMemo.removeAndRelease(memoKey(s, d))

  /** Oracle-side twin of the p49 DSIR chain as a CTE body ending in
    * `scores(doc_id, n_grams, dsir_logratio)` — p49 selects from it
    * directly and p51 layers the Gumbel-top-k draw on top, so both
    * gates replay the identical profile/llr/score derivation. */
  private lazy val DsirChainSql: String = s"""
    w AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS ws FROM documents),
    g AS MATERIALIZED (
      SELECT doc_id,
             CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) % 8192 AS b
      FROM w, unnest(range(1, len(ws) + 1)) t(i)
      UNION ALL
      SELECT doc_id,
             CAST('0x' || substr(md5(array_to_string(ws[i:i+1], ' ')), 1, 12) AS BIGINT) % 8192 AS b
      FROM w, unnest(range(1, len(ws))) t(i)),
    tb AS (SELECT b, COUNT(*) AS ct FROM g WHERE doc_id % 5 = 0 GROUP BY b),
    rb AS (SELECT b, COUNT(*) AS cr FROM g WHERE doc_id % 5 <> 0 GROUP BY b),
    prof AS (
      SELECT coalesce(tb.b, rb.b) AS b, coalesce(ct, 0) AS ct,
             coalesce(cr, 0) AS cr
      FROM tb FULL OUTER JOIN rb ON tb.b = rb.b),
    tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM prof),
    llr AS MATERIALIZED (
      SELECT b, round(ln((ct + 1.0) / (tt + 1.0 * 8192)) -
                      ln((cr + 1.0) / (tr + 1.0 * 8192)), 9) AS llr
      FROM prof CROSS JOIN tot),
    scores AS MATERIALIZED (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             ${graft.QueryDef.dsumSql("llr")} AS dsir_logratio
      FROM g JOIN llr USING (b) WHERE doc_id % 5 <> 0
      GROUP BY doc_id)"""

  /** Oracle-side twin of [[neardupPairs]] as a CTE chain ending in
    * `verified(doc_a, doc_b, jaccard)` — p02 and p25 splice it into
    * their oracle SQL so both engines derive the same pair graph. */
  private val NeardupPairsSql: String = s"""
    w AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
      WHERE len(string_split_regex(text, '\\s+')) >= 5),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8) AS BIGINT) AS x
      FROM w, unnest(range(1, len(ws) - 3)) t(i)),
    params AS (
      SELECT i, 2*i + 1 AS a, 99991*i + 7 AS b FROM unnest(range(0, $NumHashes)) t(i)),
    mh AS (
      SELECT doc_id, i, MIN((a*x + b) % $MinhashP) AS mh
      FROM sh, params GROUP BY doc_id, i),
    sig AS (
      SELECT doc_id, i // $BandRows AS band,
             string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
      FROM mh GROUP BY doc_id, i // $BandRows),
    buckets AS (
      SELECT band, sig, list_sort(list(DISTINCT doc_id)) AS docs
      FROM sig GROUP BY band, sig
      HAVING COUNT(DISTINCT doc_id) > 1
         AND COUNT(DISTINCT doc_id) <= $LshBucketCap),
    pairs AS (
      SELECT DISTINCT ta.da, tb.db
      FROM buckets, unnest(docs) ta(da), unnest(docs) tb(db) WHERE ta.da < tb.db),
    ns AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.da, p.db, COUNT(*) AS c
      FROM pairs p
      JOIN sh s1 ON s1.doc_id = p.da
      JOIN sh s2 ON s2.doc_id = p.db AND s2.x = s1.x
      GROUP BY p.da, p.db),
    verified AS (
      SELECT i.da AS doc_a, i.db AS doc_b,
             i.c / (na.n + nb.n - i.c) AS jaccard
      FROM inter i JOIN ns na ON na.doc_id = i.da JOIN ns nb ON nb.doc_id = i.db
      WHERE i.c / (na.n + nb.n - i.c) >= $DefaultJaccardMin)"""

  /** 48-bit SimHash fingerprint per document (p03's plan, factored out
    * so p26's Hamming-distance pairing runs over the identical
    * fingerprints). Entirely map-side: one md5 per token builds the
    * per-row hash array, then the codegen'd
    * [[graft.plans.SimhashFingerprint]] expression folds all 48 bit
    * votes in ONE traversal — ZERO shuffle. History: the r05 shape
    * exploded every (doc, token) pair through a groupBy carrying 48
    * conditional sums (dead-even at sf0.1 local[32] where shuffles are
    * nearly free, but shipping ~tokens-per-doc × corpus rows at
    * cluster scale); 48 per-row `aggregate` folds removed the shuffle
    * but paid 48 interpreted traversals per doc. Vote sums are
    * order-free integers, so the fingerprints are bit-identical under
    * every spelling and the oracle is unchanged. */
  def simhashFingerprints(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"),
        call_function("md5_prefix_array", words(col(textCol)), lit(6)).as("ts"))
      .select(col("doc_id"),
        call_function("simhash_fp", col("ts"), lit(48)).as("simhash"))

  /** The fixture-corpus instantiation shared by p03/p26. */
  private def simhashFp(s: SparkSession, d: String): DataFrame =
    simhashFingerprints(T.documents(s, d), "doc_id", "text")

  /** Exact k-nearest-neighbors by cosine over ANY embedding corpus —
    * the p05 plan as a reusable operator: the query set is broadcast
    * (callers keep it small; that is the brute-force contract), per-
    * vector norms are computed once per side, dot products are the
    * codegen'd sequential fold, and the only shuffle is the per-query
    * top-k window. Output: (q_id, vec_id, cos_sim, rk) with rk in 1..k.
    *
    * `excludeSelf` (default true) drops corpus rows whose id equals the
    * query id — the self-query shape where `queries` IS a slice of
    * `corpus` and ids share one space. When the query set is a SEPARATE
    * table whose ids may coincidentally collide with corpus ids, pass
    * `excludeSelf = false`, or legitimate neighbors are silently
    * excluded (id equality would not mean "same vector" there). */
  def knnBruteCosine(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val e = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("n2", dot(col("embedding"), col("embedding")))
    val q = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qe"))
      .withColumn("qn2", dot(col("qe"), col("qe")))
    val cross = e.crossJoin(broadcast(q))
    val scored = (if (excludeSelf) cross.filter(col("vec_id") =!= col("q_id"))
                  else cross)
      .select(col("q_id"), col("vec_id"),
        cosine(dot(col("qe"), col("embedding")), col("qn2"), col("n2"))
          .as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Hard-negative mining for contrastive training (Karpukhin et al.
    * 2020, "Dense Passage Retrieval", §3.2: the strongest training
    * signal comes from the top-scoring NON-positives of each query):
    * for every query vector, the `k` highest-cosine corpus vectors
    * that are neither the query row itself nor among its labeled
    * positives. `positives` is a two-column frame (query id, positive
    * id) — column NAMES are free, the first is matched against query
    * ids and the second against corpus ids.
    *
    * 100 TB stance: queries AND positives broadcast (per-query
    * positive sets are small — that is the mining contract, same as
    * [[knnBruteCosine]]'s query side); ONE corpus scan computes every
    * query's scores map-side with a broadcast anti-join folding the
    * exclusion into the same stage — zero pairing shuffle; the only
    * shuffle is the per-query top-k window. For corpus-sized query
    * sets, run the identical exclusion over [[ivfSearch]] candidates
    * instead of the brute scan. Output (q_id, vec_id, cos_sim, rk)
    * with rk in 1..k. */
  def hardNegativeMine(corpus: DataFrame, queries: DataFrame,
      positives: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val e = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("n2", dot(col("embedding"), col("embedding")))
    val q = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qe"))
      .withColumn("qn2", dot(col("qe"), col("qe")))
    val pc = positives.columns
    require(pc.length == 2,
      s"positives must have exactly (query id, positive id) columns, got ${pc.mkString(", ")}")
    val pos = positives.select(col(pc(0)).as("q_id"), col(pc(1)).as("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(pos), Seq("q_id", "vec_id"), "left_anti")
      .select(col("q_id"), col("vec_id"),
        cosine(dot(col("qe"), col("embedding")), col("qn2"), col("n2"))
          .as("cos_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)))
      .filter(col("rk") <= k)
  }

  /** Johnson–Lindenstrauss signed random projection (Achlioptas 2003,
    * "Database-friendly random projections": ±1 entries preserve
    * pairwise distances within (1±ε) for outDim = O(ln n / ε²), no
    * Gaussians needed): y_j = (Σ_d w(j,d)·x_d) / √outDim with the
    * SAME deterministic md5-derived ±1 family as the p06 SRP-LSH
    * hyperplanes ([[srpWeight]]) — no RNG anywhere, so projections
    * are reproducible across runs and replayable in the oracle.
    *
    * This is the standard precursor that makes high-dimensional
    * corpus clustering affordable: project 768-dim encoder embeddings
    * to 32–64 dims once, then run [[kmeansCluster]] / [[semDedup]] /
    * [[knnBruteCosine]] in the reduced space at a fraction of the
    * distance cost. Output elements are FLOAT so the projected column
    * composes directly with every embedding operator in this library
    * (they all take array&lt;float&gt;); each output dim is one
    * codegen'd [[graft.plans.FloatDotProduct]] fold — entirely
    * map-side, ZERO shuffle, embarrassingly parallel at any scale.
    * The double→float round is IEEE RNE in both engines and √outDim
    * is correctly-rounded in both, so projected values are
    * bit-identical in Spark and DuckDB. */
  def randomProject(corpus: DataFrame, vecCol: String, dim: Int,
      outDim: Int, outCol: String = "projected"): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    corpus.withColumn(outCol, array((0 until outDim).map { j =>
      val w = array((0 until dim).map(d => lit(srpWeight(j, d).toFloat)): _*)
      (dot(col(vecCol), w) * inv).cast(FloatType)
    }: _*))
  }

  /** Stopword-marker language ID over ANY corpus — the p09 heuristic
    * as a reusable operator: per-language marker-word votes with a
    * fixed deterministic tie-break chain. Returns all caller columns
    * plus `predicted_lang` ("und" when no marker hits). The marker
    * lists carry the signal on real corpora; swap in larger lists via
    * the `markers` parameter without touching the plan (per-row
    * map-side filters, embarrassingly parallel). */
  def langIdPredict(corpus: DataFrame, textCol: String,
      markers: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "a", "of", "and", "is"),
        "de" -> Seq("der", "die", "das", "und", "ist"),
        "fr" -> Seq("le", "la", "les", "et", "est"),
        "es" -> Seq("el", "los", "las", "y", "es"))): DataFrame = {
    val ws = words(col(textCol))
    val scores = markers.map { case (l, m) =>
      l -> size(filter(ws, w => w.isin(m.map(lit(_)): _*))).cast(LongType)
    }
    val total = scores.map(_._2).reduce(_ + _)
    // deterministic argmax: earlier markers win ties in list order
    val predicted = scores.reverse.foldLeft(lit("und")) {
      case (acc, (l, s)) =>
        val rest = scores.dropWhile(_._1 != l).drop(1).map(_._2)
        val beatsRest = rest match {
          case Nil => lit(true)
          case one :: Nil => s >= one
          case many => s >= greatest(many: _*)
        }
        when(total > 0 && beatsRest, l).otherwise(acc)
    }
    corpus.withColumn("predicted_lang", predicted)
  }

  /** Heuristic document quality score over ANY corpus — the p10 gate
    * as a reusable operator: length, stopword ratio, punctuation
    * ratio and token diversity combined in a fixed-order double
    * formula (per-row, embarrassingly parallel). `lenCol` lets callers
    * supply a precomputed length column; it defaults to
    * `length(textCol)`. Returns caller columns + (quality, keep). */
  /** The p10 quality formula as a bare Column — the SINGLE copy of the
    * fixed-order double arithmetic, shared by [[qualityScore]] and
    * [[Curation.curate]] so the two gated twins (p10, p13) can never
    * drift apart on a formula tweak. */
  def qualityExpr(text: Column, len: Column): Column = {
    val ws = words(text)
    val nWords = size(ws).cast(DoubleType)
    val stopRatio =
      size(filter(ws, w => w.isin("the", "a", "of", "and", "is")))
        .cast(DoubleType) / nWords
    val punctRatio =
      (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
        .cast(DoubleType) / length(text).cast(DoubleType)
    val diversity = size(array_distinct(ws)).cast(DoubleType) / nWords
    least(len.cast(DoubleType) / 500.0, lit(1.0)) * 0.4 +
      stopRatio * 0.2 + (lit(1.0) - punctRatio) * 0.2 + diversity * 0.2
  }

  def qualityScore(corpus: DataFrame, textCol: String,
      lenCol: Column = null, keepMin: Double = 0.5): DataFrame = {
    val q = qualityExpr(col(textCol),
      Option(lenCol).getOrElse(length(col(textCol))))
    corpus.withColumn("quality", q).withColumn("keep", q >= keepMin)
  }

  /** The Gopher/MassiveWeb quality-rule pack (Rae et al., "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", arXiv:2112.11446, Appendix A1.1) — the de-facto standard
    * pretraining document filter, as one per-row map pass (no shuffle,
    * embarrassingly parallel). Emitted per document: the raw signals
    * (word count, mean word length, symbol-to-word ratio over '#' and
    * '...', bullet-started and ellipsis-ended line ratios, the share
    * of words containing an ASCII letter, how many of Gopher's eight
    * stop words appear) and a `pass` verdict over the published
    * thresholds (all parameterized; defaults are the paper's).
    * Complements [[qualityScore]] (a scalar score to rank by) with
    * hard accept/reject rules to filter by. Word tokens are
    * whitespace-split with empty tokens removed ([[chunkText]]'s
    * convention); lines split on '\n'. All ratios are int/int double
    * divisions — engine-exact, so the whole pack is driver-gated. */
  def gopherQualitySignals(corpus: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.1,
      maxEllipsisLineRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val GopherStopwords =
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val ws = array_remove(words(col(textCol)), "")
    val nW = size(ws)
    val nWd = nW.cast(DoubleType)
    val meanLen = when(nW > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w))
        .cast(DoubleType) / nWd)
    val symbolRatio = when(nW > 0,
      (regexp_count(col(textCol), lit("#")) +
        regexp_count(col(textCol), lit("\\.\\.\\."))).cast(DoubleType) / nWd)
    val lines = split(col(textCol), "\n")
    val nL = size(lines).cast(DoubleType)
    val bulletRatio =
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast(DoubleType) / nL
    val ellipsisRatio =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
        .cast(DoubleType) / nL
    val alphaRatio = when(nW > 0,
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast(DoubleType) / nWd)
    val lowered = transform(ws, w => lower(w))
    val nStop = GopherStopwords
      .map(w => when(array_contains(lowered, w), 1).otherwise(0))
      .reduce(_ + _)
    corpus
      .withColumn("n_words", nW.cast(LongType))
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("bullet_ratio", bulletRatio)
      .withColumn("ellipsis_ratio", ellipsisRatio)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("n_stopwords", nStop.cast(LongType))
      // coalesce(false): with minWords = 0 an empty/whitespace-only doc
      // has NULL ratios, every >= conjunct that remains is true, and the
      // AND evaluates to NULL — filter(!pass) would then silently drop
      // the doc from the reject set (ADVICE r10). A doc with no words
      // fails the pack, it doesn't abstain.
      .withColumn("pass", coalesce(
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_ratio") <= maxBulletRatio &&
          col("ellipsis_ratio") <= maxEllipsisLineRatio &&
          col("alpha_ratio") >= minAlphaRatio &&
          col("n_stopwords") >= minStopwords,
        lit(false)))
  }

  /** The C4 line-level cleaning pack (Raffel et al., "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", JMLR 2020, §2.2 — the heuristics that built C4 from
    * Common Crawl), complementing [[gopherQualitySignals]] (whole-doc
    * accept/reject rules) with the LINE-granular web-page cleaning
    * production crawl pipelines run first. Per the paper: a line is
    * RETAINED only if it (a) ends in a terminal punctuation mark,
    * (b) has at least `minLineWords` words, and (c) contains none of
    * `lineBanned` (the paper drops lines with the word "javascript");
    * the PAGE is kept only if the cleaned text still has at least
    * `minSentences` sentences (counted as terminal punctuation marks in
    * the cleaned text — the paper counts on the page; cleaned is the
    * stricter, boilerplate-free reading) and the ORIGINAL page contains
    * none of `pageBanned` (the paper: "lorem ipsum" placeholder text
    * and the curly brace of leaked code; its dirty-word list is a
    * caller-supplied policy here, appended to `pageBanned`). One
    * map-side pass — the line split, per-line tests, and sentence
    * count are per-row array folds; no shuffle, embarrassingly
    * parallel at any corpus size. Lines are trimmed before testing and
    * emitted trimmed (C4 re-joins cleaned lines). Output: every caller
    * column + (cleaned_text, n_lines, n_kept_lines, n_sentences,
    * keep). */
  def c4CleanLines(corpus: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minSentences: Int = 3,
      lineBanned: Seq[String] = Seq("javascript"),
      pageBanned: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    require(minLineWords >= 0 && minSentences >= 0,
      s"thresholds must be >= 0, got $minLineWords / $minSentences")
    def noneOf(t: Column, banned: Seq[String]): Column =
      banned.map(b => !contains(lower(t), lit(b.toLowerCase)))
        .reduceOption(_ && _).getOrElse(lit(true))
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    val kept = filter(lines, t =>
      t.rlike("[.!?\"”]$") &&
        size(array_remove(split(t, "\\s+"), "")) >= minLineWords &&
        noneOf(t, lineBanned))
    corpus
      .withColumn("cleaned_text", array_join(kept, "\n"))
      .withColumn("n_lines", size(lines).cast(LongType))
      .withColumn("n_kept_lines", size(kept).cast(LongType))
      .withColumn("n_sentences",
        regexp_count(col("cleaned_text"), lit("[.!?]")).cast(LongType))
      // coalesce(false): a NULL page propagates NULL through every
      // signal and the verdict must still be a decision — a NULL keep
      // escapes both filter(keep) and filter(!keep) (the gopher
      // NULL-verdict lesson, review r11); signal columns stay NULL
      // like gopher's ratios
      .withColumn("keep", coalesce(
        col("n_sentences") >= minSentences &&
          noneOf(col(textCol), pageBanned),
        lit(false)))
  }

  /** GLOBAL paragraph-level dedup (the CCNet recipe — Wenzek et al.,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data", LREC 2020 §3: deduplicate paragraphs ACROSS the
    * whole corpus, which removes boilerplate — cookie banners,
    * navigation, legal footers — that per-document filters can't see
    * because it looks fine inside any single page). Every line (split
    * on `sep`) is kept only at its FIRST global occurrence (ordered by
    * doc id, then line position — deterministic, rerun-stable);
    * whitespace-only lines are structure, not content, and are never
    * deduplicated. Scale shape: one PARTIAL-AGG shuffle keyed by
    * paragraph content (hot boilerplate keys combine map-side — see
    * the first-occurrence aggregate below; swap in a content hash
    * upstream to cut shuffle bytes at the cost of
    * exactness-vs-collisions) and one doc-keyed rebuild shuffle.
    * Output: (doc_id, n_lines,
    * n_kept_lines, text_deduped), one row per input doc — a doc whose
    * every content line occurred earlier elsewhere keeps only its
    * whitespace lines (n_kept_lines counts what survived); join back
    * to the corpus by id for the full-column frame. */
  def dedupParagraphsGlobal(corpus: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val base = corpus.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    val lines = base.select(col("doc_id"),
      posexplode(split(col("__t"), sepRe)).as(Seq("line_no", "line")))
    // first occurrence via min(struct(doc_id, line_no)) AGGREGATION,
    // not a row_number window: boilerplate is by definition a
    // maximally HOT key (the same cookie banner on every page —
    // billions of identical lines at 100 TB), and a window partitioned
    // by line funnels every copy into one task, while the aggregate
    // combines duplicates map-side (partial agg) so the shuffle
    // carries one row per (mapper, line). Identical semantics: the
    // lexicographic struct minimum IS the (doc_id, line_no)-first row.
    val keptContent = lines.filter(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("line_no"))).as("f"))
      .select(col("f.doc_id").as("doc_id"),
        col("f.line_no").as("line_no"), col("line"))
    val kept = keptContent.unionByName(
      lines.filter(trim(col("line")) === ""))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept_lines"),
        array_join(transform(
          sort_array(collect_list(struct(col("line_no"), col("line")))),
          x => x.getField("line")), sep).as("text_deduped"))
    base.select(col("doc_id"),
        // a NULL text has ZERO lines — size(split(NULL)) is NULL and
        // would break downstream ratios (review r11)
        coalesce(size(split(col("__t"), sepRe)).cast(LongType), lit(0L))
          .as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  // ---- word-span excision machinery, shared by [[dedupSubstringsGlobal]]
  // and [[decontaminateSpans]]: both flag gram START positions and must
  // cut the word windows those grams cover out of the ORIGINAL text. ----

  /** Merged maximal cut intervals from flagged gram start positions:
    * position p flags the word window [p, p+L); windows whose starts
    * are ≤ L apart overlap or touch, and merge. `ps` must be ASCENDING
    * and distinct (`sort_array(collect_set(...))`, or the
    * [[graft.plans.PositionsInSorted]] kernel's naturally-ordered
    * output); NULL/empty → no cuts. Output: disjoint ascending
    * array<struct<cs, ce>> of [cs, ce) word intervals. Pure array
    * expressions over one row's (doc-bounded) positions — map-side, no
    * shuffle, no UDF. */
  private def cutIntervals(ps0: Column, L: Int): Column = {
    val ps = coalesce(ps0, array().cast("array<int>"))
    // a cut STARTS at p when no flagged position sits within L before
    // it, and ENDS at p+L when none sits within L after. Spark's Or
    // short-circuits (interpreted and codegen), so the i==0 / i==last
    // guards keep the neighbor probe from ever seeing index 0;
    // try_element_at additionally turns the one reachable
    // out-of-bounds probe (i+2 past the end on the last element) into
    // NULL, absorbed by the true disjunct.
    val starts = filter(ps, (p, i) =>
      (i === 0) || (p - try_element_at(ps, i) > L))
    val ends = filter(ps, (p, i) =>
      (i === size(ps) - 1) || (try_element_at(ps, i + 2) - p > L))
    zip_with(starts, ends, (s, e) => struct(s.as("cs"), (e + L).as("ce")))
  }

  /** [[cutIntervals]] as the oracle/report encoding "cs-ce,cs-ce,…"
    * ('' when no cuts) — word-domain, engine-neutral. */
  private def cutSpansText(cuts: Column): Column =
    array_join(transform(cuts, c => concat_ws("-",
      c.getField("cs").cast(StringType),
      c.getField("ce").cast(StringType))), ",")

  /** Total words removed by the (disjoint) cut intervals. */
  private def cutWordCount(cuts: Column): Column =
    coalesce(aggregate(cuts, lit(0L), (acc, c) =>
      acc + (c.getField("ce") - c.getField("cs")).cast(LongType)), lit(0L))

  /** Rebuild a document with the cut word intervals excised: each
    * maximal KEPT run of words becomes one segment sliced from the
    * ORIGINAL text via the [[graft.plans.WordSpans]] char offsets
    * (interior whitespace preserved verbatim), and segments re-join
    * with a single space. Returns the excised text for docs WITH cuts;
    * callers branch the no-cut case themselves so clean documents stay
    * byte-identical. */
  private def exciseSegments(text: Column, spans: Column, nWords: Column,
      cuts: Column): Column = {
    // kept runs = the complement of the cuts in [0, nWords)
    val ks = concat(array(lit(0)), transform(cuts, _.getField("ce")))
    val ke = concat(transform(cuts, _.getField("cs")),
      array(nWords.cast(IntegerType)))
    val runs = filter(
      zip_with(ks, ke, (a, b) => struct(a.as("a"), b.as("b"))),
      r => r.getField("a") < r.getField("b"))
    array_join(transform(runs, r => {
      // spans pack (start << 32) | end, 0-based code points;
      // element_at is 1-based, so word w lives at element w+1 and a
      // run [a, b) spans word a's start to word b-1's end — both
      // indices in [1, nWords] by construction, never out of bounds.
      val cs = shiftright(element_at(spans, r.getField("a") + 1), 32)
      val ce = element_at(spans, r.getField("b")).bitwiseAND(lit(0xFFFFFFFFL))
      text.substr((cs + 1).cast(IntegerType), (ce - cs).cast(IntegerType))
    }), " ")
  }

  /** GLOBAL exact substring dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022 — the ExactSubstr
    * recipe, re-expressed relationally): any word sequence of
    * ≥ `minLen` tokens occurring more than once ACROSS the corpus
    * (other documents or the same one) survives only at its FIRST
    * occurrence (ordered by doc id, then word position); every later
    * occurrence's window is excised from its document and the rest of
    * the page is kept (`keepFirst = false` excises EVERY occurrence
    * instead — the stricter drop-all-copies policy for pipelines that
    * treat the duplicate itself as a low-quality signal).
    * Complements [[dedupParagraphsGlobal]] (which
    * only catches separator-ALIGNED repeats) and the minhash family
    * (whole-doc similarity): this is the modality that removes a
    * quoted license block or syndicated paragraph mid-page regardless
    * of line breaks.
    *
    * Where the paper builds a corpus-wide suffix array, the
    * shuffle-native equivalent is positioned `minLen`-gram hashes: a
    * repeated run of W ≥ minLen words repeats all W−minLen+1 of its
    * grams, so cutting every non-first duplicated gram window excises
    * exactly the repeated run (the windows merge — [[cutIntervals]]);
    * conversely any duplicated gram IS a ≥ minLen-token duplicated
    * substring. Scale shape: the gram table is one posexplode (~one
    * row per corpus word — the same budget the suffix array pays);
    * duplicated grams + their first holder come from ONE partial
    * aggregation keyed by gram hash (`count` + `min(struct)` both
    * combine map-side, so a boilerplate gram with billions of copies
    * ships one row per mapper — the p52 lesson); the dup-gram table is
    * data-sized (NOT broadcastable), so flagging is a shuffle join on
    * the hash with AQE handling Zipf-head skew; the per-doc rebuild is
    * one doc-keyed aggregation bounded by doc length. Gram hashing is
    * the O(n) ROLLING kernel ([[graft.plans.KgramRollHashesAll]]):
    * each word is md5'd once and windows combine by a polynomial hash
    * mod 2⁶¹−1 slid in O(1) — the per-window-digest alternative
    * re-hashes every word minLen times, and at the default minLen = 50
    * that 50× redundant digest work dominates the whole pass at
    * corpus scale. A 61-bit collision can only over-cut one window
    * (false positive), never preserve a duplicate.
    *
    * Self-overlap caveat (documented, deliberate): in periodic text
    * ("x x x …") later occurrences overlap the first one's window, and
    * their cuts may clip it — the guarantee is "no ≥ minLen-token
    * substring occurs twice in the kept segments", not "the first copy
    * survives intact" (the paper's byte-range cuts behave the same).
    *
    * Output, one row per input doc: (doc_id, n_words, n_cut_words,
    * cut_spans "cs-ce,…" in the word domain, text_deduped). Clean docs
    * pass through byte-identical (NULL text → ''); a fully-duplicated
    * doc keeps ''. Join back to the corpus by id for full-column
    * frames. */
  def dedupSubstringsGlobal(corpus: DataFrame, idCol: String, textCol: String,
      minLen: Int = 50, keepFirst: Boolean = true): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val L = minLen
    val base = corpus.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__ws", array_remove(words(col("__t")), ""))
      .withColumn("__n", coalesce(size(col("__ws")), lit(0)))
    val grams = base.filter(col("__n") >= L)
      .select(col("doc_id"), posexplode(call_function("kgram_roll_hashes_all",
        col("__ws"), lit(L))).as(Seq("pos", "h")))
    val firsts = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col("doc_id"), col("pos"))).as("__first"))
      .filter(col("__cnt") >= 2)
      .select(col("h"), col("__first"))
    // keepFirst = false is the paper's drop-ALL-copies policy (no
    // occurrence of a duplicated substring survives — stricter, used
    // when the duplicate itself signals low quality): the
    // first-occurrence exemption filter is simply skipped
    val dupOccurrences = grams.join(firsts, Seq("h"))
    val flagged = (if (keepFirst)
        dupOccurrences.filter(
          struct(col("doc_id"), col("pos")) =!= col("__first"))
      else dupOccurrences)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("__ps"))
    base.join(flagged, Seq("doc_id"), "left")
      .withColumn("__cuts", cutIntervals(col("__ps"), L))
      .withColumn("__spans", call_function("word_spans", col("__t")))
      .select(col("doc_id"),
        col("__n").cast(LongType).as("n_words"),
        cutWordCount(col("__cuts")).as("n_cut_words"),
        cutSpansText(col("__cuts")).as("cut_spans"),
        when(size(col("__cuts")) === 0, coalesce(col("__t"), lit("")))
          .otherwise(exciseSegments(col("__t"), col("__spans"), col("__n"),
            col("__cuts"))).as("text_deduped"))
  }

  /** Boilerplate report for the PARAGRAPH dedup layer — what
    * [[dedupParagraphsGlobal]] would remove and from where, ranked:
    * the top-`k` duplicated lines by copy count, with the bytes the
    * dedup saves per line ((copies − 1) × UTF-8 line bytes — every
    * copy beyond the first occurrence is excised). The inspection
    * companion to the excision operator: curation engineers eyeball
    * exactly this table (hottest cookie banners / nav footers) before
    * turning the dedup loose. Scale shape: the same one partial-agg
    * shuffle keyed by line content as the dedup itself (hot
    * boilerplate combines map-side; countDistinct adds the standard
    * two-phase expansion), then orderBy+limit plans as TakeOrdered —
    * no full sort. Blank lines are structure, never reported. Output:
    * (rk, line, n_copies, n_docs, bytes_removed), rk 1..k by
    * (n_copies desc, line asc). */
  def dedupParagraphsReport(corpus: DataFrame, idCol: String,
      textCol: String, sep: String = "\n", k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sepRe = java.util.regex.Pattern.quote(sep)
    corpus.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), sepRe)).as("line"))
      .filter(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_copies") >= 2)
      .withColumn("bytes_removed",
        (col("n_copies") - 1) * octet_length(col("line")).cast(LongType))
      .orderBy(col("n_copies").desc, col("line").asc)
      .limit(k)
      .withColumn("rk", row_number().over(Window.orderBy(
        col("n_copies").desc, col("line").asc)))
      .select(col("rk"), col("line"), col("n_copies"), col("n_docs"),
        col("bytes_removed"))
  }

  /** Boilerplate report for the SUBSTRING dedup layer — the hottest
    * duplicated ≥ `minLen`-word runs [[dedupSubstringsGlobal]] would
    * excise, ranked by how many DOCUMENTS contain them (cross-document
    * boilerplate, the thing an engineer inspects; within-doc
    * repetition is the repetition-stats operator's job and is still
    * excised by the dedup itself). The ranking runs entirely on
    * ROLLING HASHES — one positioned-gram pass (the p56 kernel), one
    * partial-agg shuffle keyed by hash carrying (distinct-doc count,
    * first occurrence), TakeOrdered top-k with the HASH as the
    * deterministic tiebreak — and only the k WINNERS fetch their gram
    * text, by broadcasting the k (doc, pos) first occurrences back
    * onto the corpus and slicing. The string-keyed alternative ships
    * every minLen-word gram text through the shuffle (~minLen× corpus
    * bytes at the default 50) just to discard all but k rows.
    * bytes_removed is the per-gram floor ((n_docs − 1) × UTF-8 gram
    * bytes): overlapping grams of one long shared run each report
    * their own window, so the TOTAL is not the sum — the ranking, not
    * the sum, is the product here. Output: (rk, gram, n_docs,
    * bytes_removed), rk by (n_docs desc, hash asc). */
  def dedupSubstringsReport(corpus: DataFrame, idCol: String,
      textCol: String, minLen: Int = 50, k: Int = 20): DataFrame = {
    require(minLen >= 1 && k >= 1, s"need minLen/k >= 1, got $minLen/$k")
    val base = corpus.select(col(idCol).as("doc_id"),
        array_remove(words(col(textCol)), "").as("ws"))
      .filter(size(col("ws")) >= minLen)
    val top = base
      .select(col("doc_id"), posexplode(call_function(
        "kgram_roll_hashes_all", col("ws"), lit(minLen)))
        .as(Seq("pos", "h")))
      .groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("pos"))).as("f"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("h").asc)
      .limit(k)
      .select(col("h"), col("n_docs"),
        col("f.doc_id").as("doc_id"), col("f.pos").as("pos"))
    base.join(broadcast(top), Seq("doc_id"))
      .select(col("h"), col("n_docs"),
        array_join(slice(col("ws"), col("pos") + 1, lit(minLen)), " ")
          .as("gram"))
      .withColumn("bytes_removed",
        (col("n_docs") - 1) * octet_length(col("gram")).cast(LongType))
      .withColumn("rk", row_number().over(Window.orderBy(
        col("n_docs").desc, col("h").asc)))
      .select(col("rk"), col("gram"), col("n_docs"), col("bytes_removed"))
  }

  /** Winnowing-style fingerprints over ANY corpus — the p12 sketch as
    * a reusable operator, entirely map-side (the distinct k-gram hash
    * set is one codegen'd pass; the sketch is array_min + size).
    * Output: (doc_id, fingerprint, n_distinct_grams). */
  def winnowFingerprints(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"),
        call_function("kgram_hashes", col("ws"), lit(k), lit(4)).as("kh"))
      .select(col("doc_id"),
        array_min(col("kh")).as("fingerprint"),
        size(col("kh")).cast(LongType).as("n_distinct_grams"))

  /** Per-row token counts over ANY corpus — the p11 tokenizers as a
    * reusable operator: whitespace tokens and the BPE-ish regex
    * (letter runs | digit runs | single symbol). Map-side, caller
    * columns preserved; returns + (ws_tokens, bpe_tokens). */
  def tokenCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .withColumn("ws_tokens",
        size(words(col(textCol))).cast(LongType))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col(textCol),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast(LongType))

  /** Global top-k vocabulary over ANY corpus — the p14 term count as a
    * reusable operator: exact term and document frequencies, top-k by
    * tf with a deterministic word tiebreak. One groupBy(word) shuffle;
    * orderBy+limit plans as TakeOrdered (no full sort). */
  def vocabTopK(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("w").asc)
      .limit(k)

  /** Temperature-scaled source-mixing weights over ANY corpus — the
    * p18 Pile/LLaMA recipe as a reusable operator: weight ∝
    * sqrt(stratum tokens) (temperature fixed at 1/2: sqrt is
    * IEEE-exactly-rounded in every engine, a general pow is not — see
    * the p18 QueryDef for the exactness chain), plus the token budget
    * a `budgetTokens` mix draws from each stratum. `tokenCount` is
    * any integer Column over the row. */
  def sourceMixingWeights(corpus: DataFrame, stratumCol: String,
      tokenCount: Column, budgetTokens: Long = 1000000L): DataFrame = {
    val per = corpus
      .select(col(stratumCol), tokenCount.as("toks"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
      .withColumn("raw_w",
        floor(sqrt(col("tokens")) * lit(1000000.0)).cast(LongType))
    val total = per.agg(sum(col("raw_w")).as("total_w"))
    per.crossJoin(broadcast(total))
      .select(col(stratumCol), col("n_docs"), col("tokens"),
        (col("raw_w").cast(DoubleType) / col("total_w").cast(DoubleType))
          .as("mix_weight"),
        floor(col("raw_w").cast(DoubleType) / col("total_w").cast(DoubleType)
          * lit(budgetTokens)).cast(LongType).as("token_budget"))
  }

  /** Per-document repetition signals over ANY corpus — the p17
    * boilerplate gate (Gopher duplicate-chunk family) as a reusable
    * operator: non-overlapping `chunkWords`-word chunks, counted and
    * deduped as per-row array folds (entirely map-side, no shuffle).
    * Rows shorter than one chunk are dropped. Returns caller columns +
    * (n_chunks, n_distinct_chunks, dup_chunk_ratio). */
  def repetitionSignals(corpus: DataFrame, textCol: String,
      chunkWords: Int = 3): DataFrame = {
    val ws = words(col(textCol))
    val chunks = transform(
      sequence(lit(0), (size(ws) / chunkWords).cast(IntegerType) - 1),
      i => array_join(slice(ws, i * chunkWords + 1, lit(chunkWords)), " "))
    corpus
      .filter(size(ws) >= chunkWords)
      .withColumn("n_chunks", size(chunks))
      .withColumn("n_distinct_chunks", size(array_distinct(chunks)))
      .withColumn("dup_chunk_ratio",
        (col("n_chunks") - col("n_distinct_chunks")).cast(DoubleType) /
          col("n_chunks"))
  }

  /** The Gopher CHARACTER-fraction repetition pack (Rae et al. 2021,
    * Table A1 — the rows [[repetitionSignals]]' chunk ratios don't
    * cover): per document, the fraction of word characters inside the
    * single most frequent word-{2,3,4}-gram and inside all duplicated
    * word-{5..10}-grams. Gopher drops a page when any fraction
    * crosses its Table A1 threshold; this emits the raw signals so
    * the thresholds stay caller policy. Entirely map-side — the nine
    * signals come from ONE codegen'd pass per row
    * ([[graft.plans.GopherRepetition]]: one word-hash pass + nine
    * O(n) rolling scans, no gram strings, no shuffle). Every caller
    * column survives; docs shorter than k words score 0 for that k. */
  def gopherRepetitionSignals(corpus: DataFrame, textCol: String): DataFrame = {
    val sigs = corpus.withColumn("__gr", call_function("gopher_repetition",
      array_remove(words(col(textCol)), "")))
    val named = (2 to 4).map(k =>
      element_at(col("__gr"), k - 1).as(s"top_${k}gram_char_frac")) ++
      (5 to 10).map(k =>
        element_at(col("__gr"), k - 1).as(s"dup_${k}gram_char_frac"))
    sigs.select(corpus.columns.map(col).toIndexedSeq ++ named: _*)
  }

  /** The Gopher LINE-level duplicate signals (Rae'21 Table A1's other
    * repetition half — WITHIN-document duplicate lines/paragraphs,
    * complementing [[gopherRepetitionSignals]]' gram fractions and
    * [[dedupParagraphsGlobal]]'s CROSS-corpus dedup): per document,
    * the fraction of non-blank lines that are duplicates of another
    * line in the same doc, and the fraction of line CHARACTERS inside
    * lines occurring more than once (all occurrences count — the
    * boilerplate-mass reading). `sep` picks the unit: "\n" for lines,
    * "\n\n" for paragraphs — run twice for both signals. Map-side
    * per-row array folds (the occurrence counts are an O(L²) nested
    * scan over a doc's own lines — L is per-document and small), no
    * shuffle. Output: every caller column + (n_lines, dup_line_frac,
    * dup_line_char_frac); a doc with no non-blank lines scores 0s. */
  def gopherLineSignals(corpus: DataFrame, textCol: String,
      sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = filter(transform(split(col(textCol), sepRe), l => trim(l)),
      l => l =!= "")
    val counted = transform(lines, l =>
      struct(l.as("l"), size(filter(lines, x => x === l)).as("c")))
    corpus
      .withColumn("__ls", counted)
      .withColumn("n_lines",
        coalesce(size(col("__ls")), lit(0)).cast(LongType))
      .withColumn("dup_line_frac",
        when(col("n_lines") === 0, lit(0.0)).otherwise(
          (col("n_lines") - size(array_distinct(transform(col("__ls"),
            _.getField("l"))))).cast(DoubleType) / col("n_lines")))
      .withColumn("dup_line_char_frac",
        when(col("n_lines") === 0, lit(0.0)).otherwise(
          aggregate(col("__ls"), lit(0L), (acc, s) =>
            acc + when(s.getField("c") >= 2,
              length(s.getField("l")).cast(LongType)).otherwise(lit(0L)))
            .cast(DoubleType) /
          greatest(aggregate(col("__ls"), lit(0L), (acc, s) =>
            acc + length(s.getField("l")).cast(LongType)), lit(1L))))
      .drop("__ls")
  }

  /** LSH-bucket cluster representative selection over ANY corpus — the
    * p19 keep-best plan as a reusable operator: docs sharing a band-0
    * MinHash signature form a cluster; keep the member with the
    * highest `score` (id tie-break). One map-side signature + one
    * window over the bucket key — no pairwise work. Only clusters with
    * >1 member are returned (singletons need no selection). Output:
    * (band_sig, n_members, keep_id, keep_score).
    *
    * Scale note: the rank filter here deliberately does NOT get a
    * WindowGroupLimit pushdown — the n_members count window needs the
    * full bucket, so the group-limit cannot apply. That is safe because
    * band_sig is HIGH-cardinality (one key per near-dup cluster): the
    * sort distributes across all shuffle partitions, unlike a
    * low-cardinality label key (p29's shape, which does group-limit).
    * Splitting the count into a separate groupBy branch would let the
    * rank side group-limit, but the two branches' exchanges no longer
    * match, so the MinHash signature — the dominant cost — would be
    * computed twice; measured worse. */
  def clusterRepresentatives(corpus: DataFrame, idCol: String,
      textCol: String, score: Column): DataFrame = {
    val clustered = corpus
      .select(col(idCol).as("keep_id"), score.as("keep_score"),
        words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("keep_id"), col("keep_score"),
        bandSignature(shingleHashes(col("ws"))).as("band_sig"))
    val byScore = Window.partitionBy(col("band_sig"))
      .orderBy(col("keep_score").desc, col("keep_id").asc)
    clustered
      .withColumn("rk", row_number().over(byScore))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("band_sig"))))
      .filter(col("rk") === 1 && col("n_members") > 1)
      .select(col("band_sig"), col("n_members"), col("keep_id"),
        col("keep_score"))
  }

  /** Deterministic hash-bucket sampling of ANY corpus: keep a row when
    * `md5(id) % 100 < pct`, where `pct` is any integer Column over the
    * row (a constant, or per-stratum via `when(...)`) — the p15 plan as
    * a reusable operator. No RNG: membership is a pure function of the
    * id, so reruns, retries, and the oracle agree exactly. Caller
    * columns pass through untouched. */
  def hashSample(corpus: DataFrame, idCol: String, pct: Column): DataFrame =
    corpus.filter(
      call_function("md5_prefix_long", col(idCol).cast(StringType), lit(2))
        % 100 < pct)

  /** Rebalance ANY corpus to a TARGET stratum mix — the p24 plan as a
    * reusable operator. `weights` maps stratum value → integer weight;
    * the max total honoring the mix is T = min_s floor(n_s·W/w_s), and
    * each stratum keeps its floor(T·w_s/W) hash-first rows (md5 rank,
    * no RNG). A target stratum absent from the corpus drives T to 0
    * (empty sample) rather than shipping a sample that violates the
    * mix; corpus strata not in `weights` are dropped. Output: caller
    * columns (id and stratum first) plus the per-stratum hash rank. */
  /** The shared per-stratum RNG-free order: rank within each stratum
    * by md5(stratum:id), id tie-break. [[rebalanceToMix]] and
    * [[stratifiedSplit]] BOTH rank through this one definition — the
    * documented contract that related curation steps draw from one
    * consistent shuffle of each stratum (review r10: two verbatim
    * copies of the formula could drift apart). */
  private def stratumMd5Rank(stratumCol: String, idCol: String): Column =
    row_number().over(Window.partitionBy(col(stratumCol))
      .orderBy(md5(concat(col(stratumCol), lit(":"),
        col(idCol).cast(StringType))), col(idCol)))

  def rebalanceToMix(corpus: DataFrame, idCol: String, stratumCol: String,
      weights: Seq[(String, Long)]): DataFrame = {
    // a duplicate stratum key would silently duplicate every matching
    // corpus row through the weights join (and inflate W); non-positive
    // weights divide by zero or demand negative caps
    require(weights.nonEmpty, "weights must not be empty")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate stratum keys in weights: ${weights.map(_._1).diff(weights.map(_._1).distinct).distinct.mkString(", ")}")
    require(weights.forall(_._2 > 0),
      s"weights must be positive, got ${weights.filter(_._2 <= 0).mkString(", ")}")
    val spark = corpus.sparkSession
    import spark.implicits._
    val W = weights.map(_._2).sum
    val wDf = weights.toDF(stratumCol, "__w")
    val docs = corpus.join(broadcast(wDf), Seq(stratumCol))
    val caps = wDf.join(
        docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n")),
        Seq(stratumCol), "left")
      .select(floor(coalesce(col("__n"), lit(0L)) * W / col("__w")).as("__cap"))
    val t = caps.agg(min(col("__cap")).as("__t"))
    docs
      .withColumn("rk", stratumMd5Rank(stratumCol, idCol))
      .crossJoin(broadcast(t))
      .filter(col("rk") <= floor(col("__t") * col("__w") / W))
      .select(Seq(col(idCol), col(stratumCol))
        ++ corpus.columns.filterNot(c => c == idCol || c == stratumCol).map(col)
        :+ col("rk").cast(LongType).as("rk"): _*)
  }

  /** Temperature-smoothed stratified sampling (Conneau & Lample 2019
    * §3.1 — the α-exponent language rebalancing mBERT/XLM/mT5 all
    * train with): draw a `budget`-document sample whose per-stratum
    * share follows q_l ∝ n_l^α. α = 1 is the natural (proportional)
    * mix, α = 0 uniform across strata; in between, low-resource
    * strata are up-sampled relative to their share — the published
    * fix for high-resource languages drowning the tail. Per-stratum
    * quota = min(n_l, floor(budget·s_l/S)) with s_l = n_l^α quantized
    * to 1e-9 (pow's last ulp differs across engines — the ln stance)
    * and S their decimal-exact sum; clamped mass is NOT redistributed
    * (a deterministic one-pass contract — α < 1 clamps only strata it
    * boosted past their supply). Selection inside a stratum is the
    * md5-rank prefix: RNG-free and reproducible, like
    * [[rebalanceToMix]], and docs admitted at a smaller budget stay
    * admitted at a larger one (rank prefixes nest). Plan: one tiny
    * per-stratum count agg → one-row broadcast → one rank window per
    * stratum — the single corpus shuffle any stratified pass needs.
    * Output: caller columns + rk. */
  def temperatureSample(corpus: DataFrame, idCol: String,
      stratumCol: String, budget: Long, alpha: Double): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    val scores = corpus.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__s",
        round(pow(col("__n").cast(DoubleType), lit(alpha)), 9))
    val total = scores.agg(graft.QueryDef.dsum(col("__s")).as("__stot"))
    val quotas = scores.crossJoin(broadcast(total))
      .select(col(stratumCol),
        least(col("__n"),
          floor(lit(budget) * col("__s") / col("__stot"))).as("__q"))
    corpus.join(broadcast(quotas), Seq(stratumCol))
      .withColumn("rk", stratumMd5Rank(stratumCol, idCol))
      .filter(col("rk") <= col("__q"))
      .select(Seq(col(idCol), col(stratumCol))
        ++ corpus.columns.filterNot(c => c == idCol || c == stratumCol)
          .map(col)
        :+ col("rk").cast(LongType).as("rk"): _*)
  }

  /** Per-label centroid outliers over ANY embedding corpus — the p29
    * curation gate as a reusable operator: flag the `topK` vectors
    * farthest from their label's centroid (mislabeled or corrupt
    * embeddings). Centroids are exact integer-scaled means (bit-
    * identical across engines, see [[kmeansCluster]]); distances are
    * the codegen'd sequential fold; one k-row groupBy + broadcast join
    * + one window per label. Output: (label, vec_id, d2, rk). */
  def centroidOutliers(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, topK: Int, dim: Int): DataFrame = {
    val Scale = IntScale
    val e = vecs.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      col(vecCol).as("embedding"))
    val sums = (0 until dim).map(i =>
      sum(round(element_at(col("embedding"), i + 1).cast(DoubleType)
        * Scale).cast(LongType)).as(s"s$i"))
    val cents = e.groupBy(col("label"))
      .agg(count(lit(1)).as("cnt"), sums: _*)
      .select(col("label"), array((0 until dim).map(i =>
        col(s"s$i").cast(DoubleType) /
          (col("cnt") * Scale).cast(DoubleType)): _*).as("ce"))
    e.join(broadcast(cents), Seq("label"))
      .withColumn("d2", call_function("float_dist_sq",
        col("embedding"), col("ce")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("d2").desc, col("vec_id").asc))
        .cast(LongType))
      .filter(col("rk") <= topK)
      .select(col("label"), col("vec_id"), col("d2"), col("rk"))
  }

  /** Exact deduplication of ANY corpus: keep the minimum-id row per
    * content hash, preserving all caller columns — the p01 digest-
    * groupBy plan reshaped to return the deduped corpus itself (p01's
    * QueryDef is the per-hash REPORT; this is the dedup operator). One
    * shuffle on the 128-bit digest; no text comparison.
    *
    * NULL text never matches anything: md5(NULL) is NULL and the window
    * groups NULLs together, which would silently collapse every distinct
    * ingest-failure row into one — kept instead, the same decision
    * [[admitAgainstCorpus]] makes for a NULL content hash. NULL-text
    * rows get a per-row synthetic key ("n:" + id — disjoint from
    * 32-hex-char digests) so a corpus with millions of them never
    * funnels through one window partition. */
  def exactDedup(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus
      .withColumn("__rk", row_number().over(
        Window.partitionBy(coalesce(md5(col(textCol)),
            concat(lit("n:"), col(idCol).cast(StringType))))
          .orderBy(col(idCol))))
      .filter(col("__rk") === 1)
      .drop("__rk")

  /** Incremental admission of an incoming shard against an EXISTING
    * corpus — the p23 plan as a reusable operator: drop incoming rows
    * whose exact content hash OR near-dup band signature already
    * exists in the corpus (no pairwise work; the corpus side reduces
    * to its distinct key sets). Returns admitted rows with all caller
    * columns plus `content_hash` and `band_sig` (NULL when the text is
    * too short to shingle — such rows dedup exactly only). */
  def admitAgainstCorpus(corpus: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // fail fast instead of duplicate output columns (withColumn would
    // silently overwrite, then the final select lists the name twice
    // and every downstream col() throws ambiguous-reference) — this
    // includes re-admitting this function's OWN output; drop the two
    // added columns before feeding it back
    val taken = incoming.columns.toSet.intersect(Set("content_hash", "band_sig"))
    require(taken.isEmpty,
      s"incoming already has column(s) ${taken.mkString(", ")} — drop or " +
        "rename them before calling admitAgainstCorpus, which adds both")
    def keyed(df: DataFrame): DataFrame = df
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("__ws", words(col(textCol)))
      .withColumn("band_sig",
        when(size(col("__ws")) >= 5, bandSignature(shingleHashes(col("__ws")))))
      .drop("__ws")
    val c = keyed(corpus)
    // no broadcast hint: AQE broadcasts the distinct key sets while
    // they fit and falls back to the shuffle anti-join beyond
    keyed(incoming)
      .join(c.select(col("content_hash")).distinct(),
        Seq("content_hash"), "left_anti")
      .join(c.select(col("band_sig")).distinct()
        .filter(col("band_sig").isNotNull), Seq("band_sig"), "left_anti")
      // anti-joins pull their keys to the front; restore caller order
      .select(incoming.columns.map(col).toSeq
        :+ col("content_hash") :+ col("band_sig"): _*)
  }

  /** Sequence packing over ANY corpus — the p22 plan as a reusable
    * operator: concatenate-and-chunk the token stream into fixed
    * context windows where documents may straddle chunk boundaries.
    * `tokenCount` is any integer Column over the caller's row (a real
    * tokenizer count column, or an expression like
    * `size(split(col("text"), "\\s+"))`). The global token offset is a
    * TWO-PHASE prefix sum: per-shard running sums compute in parallel
    * windows (`shardCol` is the shard key), and the tiny per-shard
    * totals table carries the base offsets via broadcast — a single
    * global orderBy window would drag the whole corpus through ONE
    * partition; this shape never does. Output: (doc_id, <shardCol>,
    * tok, tok_offset, first_chunk, last_chunk, n_chunks). */
  def packSequences(corpus: DataFrame, idCol: String, shardCol: String,
      tokenCount: Column, contextLen: Int): DataFrame = {
    val toks = corpus.select(col(idCol).as("doc_id"), col(shardCol),
      tokenCount.as("tok"))
    val wIntra = Window.partitionBy(col(shardCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = toks.withColumn("run", sum(col("tok")).over(wIntra))
    val wBase = Window.orderBy(col(shardCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = toks.groupBy(col(shardCol)).agg(sum(col("tok")).as("total"))
      .withColumn("cum", sum(col("total")).over(wBase))
      .select(col(shardCol).as("b_shard"), (col("cum") - col("total")).as("base"))
    intra.join(broadcast(bases), col(shardCol) === col("b_shard"))
      .select(col("doc_id"), col(shardCol), col("tok"),
        (col("base") + col("run") - col("tok")).as("tok_offset"))
      .withColumn("first_chunk", floor(col("tok_offset") / contextLen))
      .withColumn("last_chunk",
        floor((col("tok_offset") + col("tok") - 1) / contextLen))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  /** Build an IVF index in ONE quantizer training: fit centroids
    * ([[kmeansFit]], k-means‖-seeded by default — the IVF-scale-k
    * shape), assign every corpus vector with one broadcast pass, and
    * return (assignments (vec_id, cluster), centroids (cl, ce)) —
    * exactly what [[ivfSearch]]'s `clusterCol` + `centroids` inputs
    * want. Composing kmeansFit + kmeansCluster by hand trains the
    * quantizer twice (kmeansCluster re-fits internally); this is the
    * single-fit spelling:
    * {{{
    * val (member, cents) = ivfIndex(vecs, "id", "vec", k = 256, dim = 64)
    * val hits = ivfSearch(vecs.join(member, vecs("id") === member("vec_id")),
    *   queries, "id", "vec", "cluster", k = 10, nprobe = 8,
    *   centroids = Some(cents))
    * }}} */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 2, seeding: String = "kmeans||",
      seedRounds: Int = 5): (DataFrame, DataFrame) = {
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val cents = kmeansFit(corpus, idCol, vecCol, k, dim, iters, seeding,
      seedRounds)
    val member = kmeansAssign(e, cents)
      .select(col("vec_id"), col("cl").as("cluster"))
    (member, cents)
  }

  /** IVF approximate nearest-neighbor over ANY embedding corpus that
    * carries a cluster assignment column (e.g. [[kmeansCluster]]
    * output, or any coarse partitioning) — the p07 plan as a reusable
    * operator. The quantizer selecting which clusters a query probes
    * is, in preference order: the TRAINED centroid table when
    * `centroids` is given ((cluster, vector) columns by position —
    * [[kmeansFit]]'s output shape; the production path, see the
    * example there), else one medoid per cluster (the minimum-id
    * member — a zero-training placeholder). Each query probes its
    * `nprobe` best quantizer entries (default 1) and searches ONLY
    * those clusters' members, so the scan covers ~nprobe/n_clusters of
    * the corpus and the quantizer table broadcasts. Raising nprobe is
    * the standard IVF recall knob — recall@k is monotone in nprobe
    * (candidate sets are nested; property-tested in TextApiSpec) and
    * nprobe = n_clusters degenerates to [[knnBruteCosine]]. Output:
    * (q_id, probe_label, vec_id, cos_sim, rk). */
  def ivfSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, clusterCol: String, k: Int,
      nprobe: Int = 1, excludeSelf: Boolean = true,
      centroids: Option[DataFrame] = None): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val e = corpus
      .select(col(idCol).as("vec_id"), col(clusterCol).as("label"),
        col(vecCol).as("embedding"))
      .withColumn("n2", dot(col("embedding"), col("embedding")))
    val wMed = Window.partitionBy(col("label")).orderBy(col("vec_id").asc)
    val medoids = centroids match {
      case Some(c) =>
        // trained quantizer: cast to float so the probe scoring runs
        // the same codegen'd float kernels as the member scan
        c.select(col(c.columns(0)).as("m_label"),
          transform(col(c.columns(1)), x => x.cast(FloatType)).as("me"))
          .withColumn("mn2", dot(col("me"), col("me")))
      case None =>
        e.withColumn("mrk", row_number().over(wMed))
          .filter(col("mrk") === 1)
          .select(col("label").as("m_label"), col("embedding").as("me"),
            col("n2").as("mn2"))
    }
    val wAssign = Window.partitionBy(col("q_id"))
      .orderBy(col("m_cos").desc, col("m_label").asc)
    // `nprobe` best medoids per query — the standard IVF recall/cost
    // knob: the scan covers ~nprobe/k_clusters of the corpus. Clusters
    // are disjoint, so probing more never duplicates a candidate.
    val assigned = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qe"))
      .withColumn("qn2", dot(col("qe"), col("qe")))
      .crossJoin(broadcast(medoids))
      .withColumn("m_cos", cosine(dot(col("qe"), col("me")), col("qn2"), col("mn2")))
      .withColumn("ark", row_number().over(wAssign))
      .filter(col("ark") <= nprobe)
      .select(col("q_id"), col("qe"), col("qn2"), col("m_label").as("probe_label"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val scanned = e.join(broadcast(assigned), col("label") === col("probe_label"))
    // same shared-id-space contract as [[knnBruteCosine]]: disable when
    // query ids live in a different id space than corpus ids
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col("q_id"))
     else scanned)
      .select(col("q_id"), col("probe_label"), col("vec_id"),
        cosine(dot(col("qe"), col("embedding")), col("qn2"), col("n2")).as("cos_sim"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** Deterministic EXACT-COUNT stratified split: within each stratum,
    * rows rank by the RNG-free md5 order [[rebalanceToMix]] uses (the
    * same `md5(stratum:id)` formula, so related curation steps draw
    * from one consistent shuffle of each stratum) and the first
    * ⌊trainFrac·n⌋ go to `train`, the next ⌊valFrac·n⌋ to `val`, the
    * rest to `test` — per-stratum proportions exact to integer
    * rounding, where hash-BUCKET assignment (e.g.
    * [[splitByComponents]]' component hashing) deviates by O(√n) per
    * stratum. Use THIS when strata are small enough for that
    * deviation to matter and rows are independent; use the
    * component-hashed split when near-dup leakage across splits is
    * the concern — exactness here is per-ROW, so near-dup pairs can
    * straddle splits. Plan shape: one tiny per-stratum count agg
    * (broadcast back), one rank window partitioned by stratum — the
    * single corpus shuffle any stratified pass needs. Fraction
    * thresholds are IEEE double products floored (correctly rounded,
    * engine-identical). Output: caller's columns + (rk, split). */
  def stratifiedSplit(corpus: DataFrame, idCol: String, stratumCol: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"need trainFrac, valFrac >= 0 with sum <= 1, got $trainFrac + $valFrac")
    val counts = corpus.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
    corpus
      .join(broadcast(counts), Seq(stratumCol))
      .withColumn("rk", stratumMd5Rank(stratumCol, idCol))
      .withColumn("split",
        when(col("rk") <= floor(lit(trainFrac) * col("__n")), "train")
          .when(col("rk") <= floor(lit(trainFrac) * col("__n"))
            + floor(lit(valFrac) * col("__n")), "val")
          .otherwise("test"))
      .select(Seq(col(idCol), col(stratumCol))
        ++ corpus.columns.filterNot(c => c == idCol || c == stratumCol).map(col)
        ++ Seq(col("rk").cast(LongType).as("rk"), col("split")): _*)
  }

  /** Overlapping word-window chunking — the context-preparation step
    * every RAG / long-document pipeline runs before embedding or
    * packing: chunk c covers words [c·stride, c·stride + chunkWords)
    * with stride = chunkWords − overlapWords, the final chunk keeps
    * the (possibly shorter) tail, and a doc shorter than one chunk
    * yields exactly one. Chunk count is closed-form integer
    * arithmetic (1 + max(0, ⌈(n − chunkWords)/stride⌉), floor
    * division — engine-exact), so the op is one map-side explode: no
    * shuffle, no state, linear in corpus size. Chunk text re-joins
    * the split words with single spaces (the tokenization this
    * library's dedup/stats ops use — original inter-word whitespace
    * is not preserved). Leading/trailing whitespace would split into
    * EMPTY tokens (Spark's split keeps them) that inflate the word
    * count and shift every chunk boundary — they are removed before
    * counting (the oracle filters identically). Each chunk also
    * carries its span in the ORIGINAL document — what a RAG pipeline
    * cites sources with: `start_char`/`end_char` are 1-based INCLUSIVE
    * code-point positions of the chunk's first and last word
    * characters, so `substring(text, start_char,
    * end_char - start_char + 1)` recovers the original passage
    * (whitespace inside and all) and re-tokenizes to exactly the
    * chunk's words. Offsets come from the codegen'd
    * [[graft.plans.WordSpans]] kernel — one extra map-side pass over
    * the text, still zero shuffle. A zero-word doc's single empty
    * chunk has NULL offsets (there is no span to cite). Output:
    * (doc_id, chunk_no, start_word, n_chunk_words, chunk_text,
    * start_char, end_char).
    *
    * `respectSentences = true` snaps every non-final chunk's end to
    * just after the LAST sentence-final word in its window (the C4
    * terminal-punctuation rule — [[graft.plans.SentenceChunkSpans]]),
    * so retrieval contexts stop at sentence boundaries instead of
    * mid-clause; when no sentence ends in-window the fixed window is
    * kept. The layout becomes data-dependent (chunks may be shorter
    * than `chunkWords`; `overlapWords` then overlaps backwards from
    * the SNAPPED end), but the operator stays one map-side pass —
    * the sequential per-doc walk runs inside the codegen'd kernel —
    * and the same columns, tail-chunk rule, char-span citations and
    * one-chunk floor for short docs apply. */
  def chunkText(corpus: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 512, overlapWords: Int = 64,
      respectSentences: Boolean = false): DataFrame = {
    require(chunkWords >= 1 && overlapWords >= 0 && overlapWords < chunkWords,
      s"need 0 <= overlapWords < chunkWords, got $overlapWords / $chunkWords")
    if (respectSentences) return chunkTextSentences(corpus, idCol, textCol,
      chunkWords, overlapWords)
    val stride = chunkWords - overlapWords
    corpus
      .select(col(idCol).as("doc_id"),
        array_remove(words(col(textCol)), "").as("ws"),
        call_function("word_spans", col(textCol)).as("spans"))
      .withColumn("n", size(col("ws")))
      .withColumn("chunk_no", explode(sequence(lit(0),
        greatest(lit(0), floor((col("n") - chunkWords + (stride - 1))
          .cast(DoubleType) / stride).cast(IntegerType)))))
      .withColumn("n_chunk_words",
        least(lit(chunkWords).cast(LongType),
          col("n") - col("chunk_no").cast(LongType) * stride))
      .select(col("doc_id"), col("chunk_no"),
        (col("chunk_no").cast(LongType) * stride).as("start_word"),
        col("n_chunk_words"),
        array_join(slice(col("ws"),
          col("chunk_no") * stride + 1, lit(chunkWords)), " ")
          .as("chunk_text"),
        // spans pack (start << 32) | end as 0-based [start, end);
        // `get` is 0-based and null-safe (a 0-word chunk's index -1
        // yields NULL, not an error). +1 converts to the 1-based
        // inclusive convention substring() cites with.
        (shiftright(get(col("spans"), col("chunk_no") * stride), 32) + 1)
          .as("start_char"),
        get(col("spans"),
          (col("chunk_no") * stride + col("n_chunk_words") - 1).cast("int"))
          .bitwiseAND(lit(0xFFFFFFFFL)).as("end_char"))
  }

  /** [[chunkText]]'s sentence-snapping path: the chunk layout comes
    * from the codegen'd [[graft.plans.SentenceChunkSpans]] walk (one
    * packed (start, end) word span per chunk), posexploded into rows;
    * everything downstream — single-space re-join, word_spans char
    * citations, the empty-doc NULL-offset rule — mirrors the
    * fixed-window path. Still zero shuffle. */
  private def chunkTextSentences(corpus: DataFrame, idCol: String,
      textCol: String, chunkWords: Int, overlapWords: Int): DataFrame =
    corpus
      .select(col(idCol).as("doc_id"),
        array_remove(words(col(textCol)), "").as("ws"),
        call_function("word_spans", col(textCol)).as("spans"))
      // a NULL text must still emit its one empty chunk, not VANISH
      // (posexplode of the null-intolerant kernel's NULL emits zero
      // rows — the gopher NULL-verdict lesson): the kernel walks a
      // coalesced empty array; ws/spans stay NULL so chunk_text and
      // offsets are NULL exactly like the fixed-window path
      .select(col("doc_id"), col("ws"), col("spans"),
        posexplode(call_function("sentence_chunk_spans",
          coalesce(col("ws"), array().cast("array<string>")),
          lit(chunkWords), lit(overlapWords))).as(Seq("chunk_no", "se")))
      .withColumn("start_word", shiftright(col("se"), 32))
      .withColumn("n_chunk_words",
        when(col("ws").isNull, lit(null).cast(LongType))
          .otherwise(col("se").bitwiseAND(lit(0xFFFFFFFFL))
            - col("start_word")))
      .select(col("doc_id"), col("chunk_no"), col("start_word"),
        col("n_chunk_words"),
        array_join(slice(col("ws"), (col("start_word") + 1).cast("int"),
          col("n_chunk_words").cast("int")), " ").as("chunk_text"),
        (shiftright(get(col("spans"), col("start_word").cast("int")), 32) + 1)
          .as("start_char"),
        get(col("spans"),
          (col("start_word") + col("n_chunk_words") - 1).cast("int"))
          .bitwiseAND(lit(0xFFFFFFFFL)).as("end_char"))

  /** Sparse dot-product top-k retrieval — the inverted-index shape
    * behind BM25 / learned-sparse (SPLADE-style) retrieval, where
    * vectors live as POSTING rows (id, term, weight) instead of dense
    * arrays: score(q, d) = Σ over shared terms of q_t·d_t, computed
    * by ONE equi-join on term with the query postings broadcast
    * (queries are small by the retrieval contract) and a per-(q, d)
    * aggregation. At 100 TB this is the classical scatter-gather:
    * corpus postings stream map-side against the broadcast query
    * terms — only matching rows reach the score shuffle, which is
    * bounded by Σ_t df(t)·|q_t| like any inverted-index scan; cap
    * stop-term df upstream exactly as a search engine prunes its
    * posting lists — [[capPostingsByDf]] is that operator, composed as
    * `sparseTopK(capPostingsByDf(postings, maxDf), …)` (the p46 gate
    * runs exactly this chain). Per-term products are exact doubles; the score
    * SUM runs through the decimal accumulator ([[QueryDef.dsum]]) so
    * it is order-free and engine-exact. Output: (q_id, doc_id, score,
    * rk ≤ k), ties to the lowest doc_id; `excludeSelf` as in
    * [[knnBruteCosine]]. */
  def sparseTopK(postings: DataFrame, queries: DataFrame,
      idCol: String = "doc_id", termCol: String = "term",
      weightCol: String = "weight", k: Int = 10,
      excludeSelf: Boolean = true): DataFrame = {
    val c = postings.select(col(idCol).as("doc_id"), col(termCol).as("term"),
      col(weightCol).cast(DoubleType).as("w"))
    val q = queries.select(col(idCol).as("q_id"), col(termCol).as("term"),
      col(weightCol).cast(DoubleType).as("qw"))
    val joined = c.join(broadcast(q), Seq("term"))
    (if (excludeSelf) joined.filter(col("doc_id") =!= col("q_id"))
     else joined)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(graft.QueryDef.dsum(col("w") * col("qw")).as("score"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rk") <= k)
  }

  /** Drop every posting of terms appearing in MORE than `maxDf`
    * documents — the stop-term pruning a search engine applies to its
    * posting lists, as the upstream companion to [[sparseTopK]] (whose
    * score shuffle is bounded by Σ_t df(t)·|q_t|: one runaway stop
    * term — "the" in 10¹⁰ docs — otherwise dominates the whole scan).
    * Semantics: capping only REMOVES terms; scores over the surviving
    * terms are unchanged (the dot product is a sum over terms), which
    * is exactly the idf intuition — a term in more than maxDf docs
    * carries ~zero ranking signal at its scan cost. Scale shape: one
    * partial-agg count per term (the shuffle is one row per distinct
    * term, not per posting), and the over-cap set is Zipf-HEAD-sized
    * (a handful of stop terms), so it broadcasts into a map-side
    * anti-join — the posting lists themselves never shuffle. Input
    * contract matches [[sparseTopK]]: one row per (id, term). All
    * caller columns survive. */
  def capPostingsByDf(postings: DataFrame, maxDf: Long,
      termCol: String = "term"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val over = postings.groupBy(col(termCol))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col(termCol))
    postings.join(broadcast(over), Seq(termCol), "left_anti")
      // the using-column join fronts the key; restore caller order
      .select(postings.columns.map(col).toIndexedSeq: _*)
  }

  /** Recall@k of an APPROXIMATE top-k result against an EXACT one —
    * the standard ANN tuning metric (how many of the true k nearest
    * neighbors the index returned), computed per query: join the two
    * (q, id) result sets and count hits. Feed it [[ivfSearch]] output
    * as `approx` and [[knnBruteCosine]] output (over a sampled query
    * set — recall evaluation never needs every query) as `exact` to
    * pick `nprobe`: recall@k is monotone in nprobe, so the smallest
    * nprobe reaching the recall target is the cheapest correct
    * setting. Scale shape: both inputs are top-k tables — k rows per
    * evaluated query, bounded by parameters — so the join and the
    * per-query agg are small regardless of corpus size. Both sides are
    * deduplicated on (q, id) first: top-k tables are unique by
    * construction, but an arbitrary caller's duplicate (q, id) rows
    * would otherwise fan out the join and inflate n_exact AND n_hits,
    * corrupting the recall ratio (ADVICE r10). Output:
    * (q_id, n_exact, n_hits, recall), one row per query present in
    * `exact`. */
  def recallAtK(approx: DataFrame, exact: DataFrame,
      qCol: String = "q_id", idCol: String = "vec_id"): DataFrame =
    exact.select(col(qCol).as("q_id"), col(idCol).as("vec_id"))
      .dropDuplicates("q_id", "vec_id")
      .join(approx.select(col(qCol).as("q_id"), col(idCol).as("vec_id"))
        .dropDuplicates("q_id", "vec_id")
        .withColumn("hit", lit(1)), Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("q_id"), col("n_exact"), col("n_hits"),
        (col("n_hits").cast(DoubleType) / col("n_exact").cast(DoubleType))
          .as("recall"))

  /** Distributed BPE vocabulary training (Sennrich, Haddow & Birch,
    * "Neural Machine Translation of Rare Words with Subword Units",
    * ACL 2016 §3.2) — learn `numMerges` byte-pair merges from a corpus:
    * start from characters (+ the '</w>' end-of-word marker), then
    * repeatedly merge the globally most frequent adjacent symbol pair.
    * The piece of the tokenizer story that is genuinely DISTRIBUTED:
    * the corpus is scanned ONCE (word counting — classic BPE trains on
    * the word-frequency dictionary, not the raw text), and every merge
    * round then runs on the dictionary: one explode of adjacent pairs
    * weighted by word count, one pair-keyed partial-agg shuffle, and a
    * single-ROW driver collect of the winning pair (the kmeans++
    * pattern — parameter-bounded at numMerges rows total). The merge
    * applies map-side as a left-to-right greedy fold (after a merge
    * the tail symbol becomes l+r ≠ l, so `last == l && x == r` is
    * exactly the non-overlapping scan — 'a a a' → ['aa','a']); each
    * round's dictionary is localCheckpoint'ed and the superseded
    * round's blocks released (the Lloyd's-round lineage discipline).
    * Ties break deterministically (count desc, then pair lexicographic
    * asc), so training is reproducible across runs and engines.
    * Training stops early when no pair reaches `minPairCount` (merging
    * singletons memorizes noise). Not SQL-expressible in the portable
    * oracle subset (iterative state); BpeSpec gates it against a
    * sequential reference implementation instead. Output: (merge_no,
    * left, right, pair_count) — the ordered merge list a tokenizer
    * runtime applies. */
  def bpeTrain(corpus: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2, localDictMax: Long = 1000000L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val spark = corpus.sparkSession
    var dict = bpeInitDict(corpus, textCol).localCheckpoint()
    // Driver-local fast path: the corpus was already collapsed to its
    // word-frequency dictionary (the ONE genuinely distributed pass),
    // and classic BPE training only ever reads that dictionary — so
    // when it fits in driver memory (vocabulary-bounded, NOT corpus-
    // bounded; even web-scale corpora are below ~10⁷ distinct words
    // after the usual pre-tokenization), running the merge loop
    // in-process with INCREMENTAL pair-count maintenance replaces
    // numMerges sequential Spark jobs (a 32k-merge vocabulary = 32k
    // scheduler round-trips, wall-clock-hostile at any corpus size)
    // with one collect + an in-memory loop. Above `localDictMax`
    // dictionary rows the distributed loop below takes over unchanged.
    // Both paths produce the IDENTICAL ordered merge list — same
    // greedy non-overlapping merge scan, same (count desc, pair
    // UTF-8-binary asc) tie-break — pinned by a BpeSpec property.
    if (dict.count() <= localDictMax) {
      val rows = dict.collect().map(r =>
        (r.getSeq[String](1).toArray, r.getLong(0)))
      releaseLocalCheckpoint(dict)
      import spark.implicits._
      return bpeTrainLocal(rows, numMerges, minPairCount)
        .toDF("merge_no", "left", "right", "pair_count")
    }
    val merges = collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    var round = 1
    while (!done && round <= numMerges) {
      val best = bpePairCounts(dict)
        .orderBy(col("pc").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, pc) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((round, l, r, pc))
        val merged = concat(lit(l), lit(r))
        val next = dict.select(col("cnt"),
          aggregate(col("syms"),
            array().cast(ArrayType(StringType, containsNull = false)),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === l && x === r,
              concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
              .otherwise(concat(acc, array(x)))).as("syms"))
          .localCheckpoint()
        releaseLocalCheckpoint(dict)
        dict = next
        round += 1
      }
    }
    releaseLocalCheckpoint(dict)
    import spark.implicits._
    merges.toSeq.toDF("merge_no", "left", "right", "pair_count")
  }

  /** UTF-8-binary string ordering — what Spark's `asc` on StringType
    * compares (UTF8String bytes, unsigned). The local BPE tie-break
    * must use THIS, not Java's UTF-16 compareTo, or the two training
    * paths could diverge on supplementary-plane ties. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** In-memory BPE merge loop over a collected word-frequency
    * dictionary — [[bpeTrain]]'s fast path. Pair counts are maintained
    * INCREMENTALLY (the Sennrich reference implementation's trick):
    * each merge touches only the words that contain the winning pair
    * (tracked in an inverted index), subtracting their old adjacent
    * pairs and adding the new ones, so a round costs
    * O(Σ affected word lengths) + one O(#live pairs) scan for the
    * maximum — not a full dictionary pass per merge. The greedy
    * non-overlapping left-to-right merge scan is the same fold the
    * distributed round applies ('a a a' + (a,a) → ['aa','a']). */
  private def bpeTrainLocal(dict0: Array[(Array[String], Long)],
      numMerges: Int, minPairCount: Long): Seq[(Int, String, String, Long)] = {
    val words = dict0.map(w =>
      collection.mutable.ArrayBuffer.from[String](w._1))
    val cnts = dict0.map(_._2)
    val stats = collection.mutable.HashMap.empty[(String, String), Long]
    val index = collection.mutable.HashMap
      .empty[(String, String), collection.mutable.Set[Int]]
    def addPairs(wi: Int, sign: Long): Unit = {
      val w = words(wi)
      var i = 0
      while (i < w.length - 1) {
        val p = (w(i), w(i + 1))
        val nv = stats.getOrElse(p, 0L) + sign * cnts(wi)
        if (nv == 0L) stats.remove(p) else stats(p) = nv
        if (sign > 0)
          index.getOrElseUpdate(p, collection.mutable.Set.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))
    val merges =
      collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (!done && round <= numMerges) {
      // linear max scan with the distributed tie-break:
      // count desc, then (l, r) UTF-8-binary ascending
      var bl: String = null
      var br: String = null
      var bc = 0L
      stats.foreach { case ((l, r), c) =>
        if (bl == null || c > bc || (c == bc &&
            (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))))) {
          bl = l; br = r; bc = c
        }
      }
      if (bl == null || bc < minPairCount) done = true
      else {
        merges += ((round, bl, br, bc))
        // stale index entries (words that lost the pair to an earlier
        // merge) are harmless: the re-derive below is a no-op for them
        val affected = index.remove((bl, br)).map(_.toArray)
          .getOrElse(Array.emptyIntArray)
        affected.foreach { wi =>
          addPairs(wi, -1L)
          val w = words(wi)
          val out = collection.mutable.ArrayBuffer.empty[String]
          w.foreach { x =>
            if (out.nonEmpty && out.last == bl && x == br)
              out(out.length - 1) = bl + br
            else out += x
          }
          words(wi) = out
          addPairs(wi, 1L)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** The BPE word-frequency dictionary: one corpus scan → (cnt, syms)
    * with syms = code points + '</w>'. Shared by [[bpeTrain]]'s loop
    * and the p53 gate so the gated aggregation IS the trained one. */
  private def bpeInitDict(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(array_remove(words(col(textCol)), "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), concat(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))),
        array(lit("</w>"))).as("syms"))

  /** Adjacent-pair counts over a (cnt, syms) dictionary — the
    * aggregation every [[bpeTrain]] round runs. Output: (l, r, pc). */
  private def bpePairCounts(dict: DataFrame): DataFrame =
    dict
      // a fully-merged word (one symbol) has no adjacent pairs — and
      // sequence(1, 0) would DESCEND into invalid indices
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l"), col("p.r"))
      .agg(sum(col("cnt")).as("pc"))

  /** Apply a learned BPE merge list to a corpus — the tokenizer
    * runtime over [[bpeTrain]]'s output: every whitespace word splits
    * into its BPE symbols (code points + '</w>' merged by the best-
    * ranked-pair loop, [[graft.plans.BpeSegment]]), flattened per doc.
    * The merge table is driver-collected ONCE (numMerges-bounded, the
    * centroid-table pattern) and baked into the codegen'd expression's
    * rank map — per row there is no parsing, no join, no shuffle: the
    * whole tokenization is one map pass. Output: every caller column +
    * `bpe_tokens` (array<string>) and `n_bpe_tokens` (no id column is
    * needed — all caller columns pass through untouched). */
  def bpeSegment(corpus: DataFrame, textCol: String,
      merges: DataFrame): DataFrame =
    corpus
      .withColumn("bpe_tokens",
        flatten(transform(array_remove(words(col(textCol)), ""),
          w => call_function("bpe_segment", w, lit(encodeMerges(merges))))))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast(LongType))

  /** The "l r"-lines encoding [[graft.plans.BpeSegment]] bakes its
    * rank table from — ONE driver collect of the numMerges-bounded
    * table, shared by [[bpeSegment]] and [[bpeEncodeIds]]. */
  private def encodeMerges(merges: DataFrame): String =
    merges.orderBy(col(merges.columns(0)))
      .select(col(merges.columns(1)), col(merges.columns(2)))
      .collect().map(r => r.getString(0) + " " + r.getString(1))
      .mkString("\n")

  /** The token-id vocabulary of a trained BPE model — (id, symbol),
    * the SentencePiece/HF vocab-file layout: base symbols first
    * ('</w>' + every distinct code point of the training corpus's
    * words, UTF-8-binary ascending), then the merge outputs in rank
    * order, ids = 0..V−1. Deterministic given (corpus, merges), so
    * train-once/serve-many pipelines can rebuild it bit-identically.
    * Scale shape: the base alphabet comes from one distinct-character
    * aggregation (alphabet-bounded — a few thousand rows even for CJK
    * corpora) and the merge table is numMerges-bounded, so both
    * collects are parameter-sized, the kmeans-centroid pattern. The
    * pathological collision (a merge output spelling exactly "</w>"
    * or another entry) keeps the FIRST id, like the runtime's
    * first-wins rank table. */
  def bpeVocab(corpus: DataFrame, textCol: String,
      merges: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    val base = corpus
      .select(explode(array_remove(words(col(textCol)), "")).as("w"))
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("sym"))
      .distinct()
      // no cluster-side orderBy: the driver sortWith below is the one
      // ordering that matters, and a global sort on the alphabet-sized
      // frame would just add a single-partition exchange
      .collect().map(_.getString(0))
    val mergeSyms = merges.orderBy(col(merges.columns(0)))
      .collect().map(r => r.getString(1) + r.getString(2))
    val all = ((("</w>" +: base.toSeq).sortWith(utf8Lt)) ++ mergeSyms).distinct
    import spark.implicits._
    all.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "symbol")
  }

  /** BPE tokenization to integer TOKEN IDS — what sequence packing,
    * length bucketing and every downstream training pipeline actually
    * consume (symbol strings are a debugging view; models eat ids).
    * Same single map pass as [[bpeSegment]] — the codegen'd
    * [[graft.plans.BpeEncodeIds]] expression segments each
    * whitespace word with the baked rank table and maps symbols
    * through the baked vocab-id table in one traversal; no per-row
    * parsing, no join, no shuffle. Symbols outside `vocab` (an
    * alphabet character never seen at training time) encode as -1,
    * the UNK sentinel — filter or remap downstream; ids are otherwise
    * exactly the `vocab` ids, so `bpeVocab`'s (id, symbol) table
    * round-trips ids back to [[bpeSegment]]'s symbols (pinned in
    * BpeSpec). Output: every caller column + `bpe_ids` (array<int>)
    * and `n_bpe_tokens`. */
  def bpeEncodeIds(corpus: DataFrame, textCol: String, merges: DataFrame,
      vocab: DataFrame): DataFrame = {
    val encodedVocab = vocab.orderBy(col(vocab.columns(0)))
      .select(col(vocab.columns(1)))
      .collect().map(_.getString(0)).mkString("\n")
    corpus
      .withColumn("bpe_ids",
        flatten(transform(array_remove(words(col(textCol)), ""),
          w => call_function("bpe_encode_ids", w,
            lit(encodeMerges(merges)), lit(encodedVocab)))))
      .withColumn("n_bpe_tokens", size(col("bpe_ids")).cast(LongType))
  }

  /** Gumbel-top-k importance RESAMPLING — the selection step DSIR runs
    * on [[dsirImportanceScores]] output (Xie NeurIPS'23 §2: sample k
    * documents WITHOUT replacement with probability ∝ exp(score/T)
    * by ranking score/T + Gumbel noise and keeping the top k — the
    * Gumbel-max trick makes one ranking pass equal sequential
    * weighted draws). The "noise" here is RNG-FREE like every sampler
    * in this library: u = (md5₄₈(id) + 0.5)/2⁴⁸ ∈ (0,1), g =
    * −ln(−ln(u)), so the same corpus + seed column always selects the
    * same k docs, across reruns AND engines. `temperature` → ∞
    * degenerates to uniform sampling; → 0 to deterministic top-k by
    * score. The Gumbel term is quantized to 1e-9 (the ln-ULP
    * reproducibility stance of [[dsirImportanceScores]]).
    *
    * Scale shape: the key is one map-side expression; selection is
    * `orderBy(key).limit(k)` — Spark's TakeOrdered keeps k rows per
    * partition and merges k on the driver, no full sort, no shuffle
    * of the corpus. Output: the top-k rows of `scored` + the
    * `gumbel_key` column, ties broken by `idCol` ascending. */
  def resampleByImportance(scored: DataFrame, idCol: String,
      scoreCol: String, k: Int, temperature: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val u = (conv(substring(md5(col(idCol).cast(StringType)), 1, 12), 16, 10)
      .cast(DoubleType) + 0.5) / lit(math.pow(2, 48))
    val key = col(scoreCol).cast(DoubleType) / temperature +
      round(-log(-log(u)), 9)
    scored.withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 §II):
    * the vector space splits into `m` contiguous subspaces of dim/m
    * dimensions, each trained as its OWN small k-means codebook of
    * `ksub` centroids — so a vector compresses to m small codes
    * (m bytes at ksub ≤ 256) while distances remain computable from
    * per-subspace lookup tables ([[pqSearch]]). Training reuses
    * [[kmeansFit]] verbatim over the sliced corpus, inheriting its
    * determinism contract (min-id seeds, integer-exact centroid sums,
    * ties to the lowest code) — m bounded passes over the corpus
    * (m is a small parameter, 4–16). Output: (j, code, ce) with
    * |ce| = dim/m. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, iters: Int = 1): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    (0 until m).map { j =>
      kmeansFit(
        corpus.select(col(idCol),
          slice(col(vecCol), j * sub + 1, sub).as("__sub")),
        idCol, "__sub", ksub, sub, iters)
        .select(lit(j).as("j"), col("cl").as("code"), col("ce"))
    }.reduce(_ unionByName _)
  }

  /** PQ encoding: each vector's m subspace codes (the compressed
    * representation [[pqSearch]] scans — m ints per vector instead of
    * dim floats). One broadcast of the full codebook, one map pass:
    * per subspace an argmin fold over its ksub centroids, ties to the
    * lowest code — the [[kmeansFit]] assignment contract per
    * subspace. Output: (vec_id, codes array&lt;int&gt; of length m). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    val cb = codebooks
      .groupBy(col("j"))
      .agg(sort_array(collect_list(struct(col("code"), col("ce")))).as("cs"))
      .agg(sort_array(collect_list(struct(col("j"), col("cs")))).as("js"))
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .crossJoin(broadcast(cb))
      .select(col("vec_id"), array((0 until m).map { j =>
        aggregate(element_at(col("js"), j + 1).getField("cs"),
          struct(lit(Double.MaxValue).as("d2"), lit(-1).as("code")),
          (acc, c) => {
            val d = call_function("float_dist_sq",
              slice(col("embedding"), j * sub + 1, sub), c.getField("ce"))
            when(d < acc.getField("d2"),
              struct(d.as("d2"), c.getField("code").as("code")))
              .otherwise(acc)
          }).getField("code")
      }: _*).as("codes"))
  }

  /** PQ asymmetric-distance search (ADC, Jégou TPAMI'11 §III): score
    * the CODES table against each query via per-subspace lookup
    * tables. Per query, ONE m×ksub distance table is built against
    * the broadcast codebook (dim multiplications per cell, parameter-
    * bounded); the corpus scan then costs m array lookups + m−1
    * additions per vector — it never touches the original vectors,
    * which is the PQ scale story: the scanned table is m ints per
    * vector (~m bytes at ksub ≤ 256) instead of dim floats, an
    * (4·dim)/m-fold bandwidth cut, and the approximate distance
    * d̂(q,v) = Σ_j d²(q_j, c_{j,code_j(v)}) needs no sqrt for ranking.
    * Additions run in fixed subspace order (left-associated), so
    * adist is bit-reproducible cross-engine. Output: (q_id, vec_id,
    * adist, rk ≤ k) ranked by ascending adist, ties to the lowest
    * vec_id. `excludeSelf` as in [[knnBruteCosine]].
    *
    * The codebook must be COMPLETE — every (j, code) for code <
    * ksub — because the lookup index is arithmetic (j·ksub + code);
    * validated eagerly (the codebook is parameter-sized), throwing on
    * a codebook whose empty clusters dropped codes (retrain with more
    * iters or smaller ksub). */
  def pqSearch(codes: DataFrame, queries: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, m: Int, ksub: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    val flat = collectCodebookFlat(codebooks, m, ksub)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qe"))
      .crossJoin(broadcast(flat))
      .select(col("q_id"),
        transform(col("fl"), c =>
          call_function("float_dist_sq",
            slice(col("qe"), c.getField("j") * sub + 1, lit(sub)),
            c.getField("ce"))).as("dtab"))
    val adist = (0 until m).map(j =>
      element_at(col("dtab"), lit(j * ksub) + element_at(col("codes"), j + 1) + 1))
      .reduceLeft(_ + _)
    val scanned = codes.crossJoin(broadcast(q))
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col("q_id"))
     else scanned)
      .select(col("q_id"), col("vec_id"), adist.as("adist"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("adist").asc, col("vec_id").asc)))
      .filter(col("rk") <= k)
  }

  /** Residual of each vector against its assigned coarse centroid —
    * the encoding input for IVFADC with residuals (Jégou TPAMI'11
    * §V.A: quantizing r(v) = v − c(cluster(v)) instead of v itself
    * concentrates the PQ codebooks on the WITHIN-cell distribution,
    * which is what the per-cell probe actually scans, and recovers
    * most of the accuracy raw-vector codes lose to coarse cell
    * spread). `member`/`centroids` are [[ivfIndex]] outputs; feed the
    * result to [[pqTrain]]/[[pqEncode]] and search with
    * `ivfpqSearch(..., residual = true)`. Elementwise arithmetic is
    * (double)v_i − c_i cast back to float (correctly-rounded in both
    * engines — the p42 oracle replays it). Output: (vec_id,
    * residual array&lt;float&gt;). */
  def pqResiduals(corpus: DataFrame, idCol: String, vecCol: String,
      member: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col(centroids.columns(0)).as("__cl"),
      transform(col(centroids.columns(1)), x => x.cast(DoubleType)).as("__ce"))
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .join(member.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .join(broadcast(cents), col("cluster") === col("__cl"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("__ce"),
          (a, b) => (a.cast(DoubleType) - b).cast(FloatType)).as("residual"))
  }

  /** Per-dimension [min, max] bounds for 8-bit SCALAR quantization
    * (FAISS's SQ8 / "uniform" scalar quantizer) — the simplest rung of
    * the compression ladder: 4× smaller than floats with far less
    * training than PQ (one bounds pass — no codebooks, no k-means).
    * One posexplode + per-dimension min/max agg: a `dim`-bounded
    * partial-agg shuffle (one row per (mapper, dimension)), any corpus
    * size. Output: (pos, mn, mx), `dim` rows — [[sqEncode]]/
    * [[sqSearch]]'s `bounds` input. */
  def sqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame =
    corpus.select(
        posexplode(dimChecked(col(vecCol), dim, "sq: vector")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Bounds table → one-row (mns, mxs) position-ordered arrays: the
    * broadcastable form the per-row encode/decode lambdas index. The
    * arrays are dimension-CHECKED here (once, on the single row): a
    * bounds table trained at a different dim would otherwise feed
    * out-of-range element_at lookups whose NULLs silently poison every
    * code and distance downstream (review r11). */
  private def sqBoundsRow(bounds: DataFrame, dim: Int): DataFrame = {
    def checked(c: Column) = when(size(c) === dim, c)
      .otherwise(raise_error(concat(
        lit("sq: bounds cover "), size(c).cast(StringType),
        lit(s" dimensions, expected $dim — train and encode/search must" +
          " use the same dim"))))
    bounds.agg(
      checked(transform(sort_array(collect_list(struct(col("pos"), col("mn")))),
        x => x.getField("mn"))).as("__mns"),
      checked(transform(sort_array(collect_list(struct(col("pos"), col("mx")))),
        x => x.getField("mx"))).as("__mxs"))
  }

  /** Per-row vector/codes length guard for the SQ lambdas — same
    * rationale as the bounds check; one size comparison per row. */
  private def dimChecked(c: Column, dim: Int, what: String): Column =
    when(size(c) === dim, c)
      .otherwise(raise_error(concat(
        lit(s"$what has "), size(c).cast(StringType),
        lit(s" dimensions, expected $dim"))))

  /** SQ8 encode: each dimension maps to an 8-bit level
    * round((x − mn)/(mx − mn) · 255), clamped to [0, 255] (new vectors
    * may exceed the training bounds); a degenerate dimension
    * (mx = mn) encodes 0. All arithmetic is explicit-double with one
    * HALF-UP round — both engines replay it bit-exactly. The bounds
    * collapse to one broadcast row, so encoding is a single map pass.
    * Output: (vec_id, codes array<int>). */
  def sqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      bounds: DataFrame, dim: Int): DataFrame =
    corpus.select(col(idCol).as("vec_id"),
        dimChecked(col(vecCol), dim, "sq: vector").as("embedding"))
      .crossJoin(broadcast(sqBoundsRow(bounds, dim)))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(dim)), i => {
          val x = element_at(col("embedding"), i).cast(DoubleType)
          val mn = element_at(col("__mns"), i).cast(DoubleType)
          val mx = element_at(col("__mxs"), i).cast(DoubleType)
          when(mx > mn,
            least(lit(255), greatest(lit(0),
              round((x - mn) / (mx - mn) * 255).cast(IntegerType))))
            .otherwise(0)
        }).as("codes"))

  /** SQ8 asymmetric search: queries keep full floats, the corpus scan
    * reads CODES and reconstructs each dimension INSIDE the distance
    * loop (mn + code/255 · (mx − mn) — the stored-at-rest compression
    * is the point; decode is register arithmetic, exactly FAISS's SQ
    * scan) via the fused [[graft.plans.SqAdist]] kernel: one codegen'd
    * pass per (vector, query), no intermediate decoded array, no
    * interpreted HOF in the hot loop — bit-identical to decode-then-
    * [[graft.plans.FloatDistSq]] (property-pinned in TextApiSpec).
    * Brute over the codes table — compose with an IVF membership
    * filter upstream to prune the scan, as [[ivfpqSearch]] does for
    * PQ. Query side broadcasts (retrieval contract). Output: (q_id,
    * vec_id, adist, rk ≤ k). */
  def sqSearch(codes: DataFrame, queries: DataFrame, bounds: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // query vectors are length-checked too: a wrong-dim query would
    // otherwise NULL every distance, and NULLS FIRST under ascending
    // rank silently returns k arbitrary vectors (review r11)
    val q = queries.select(col(idCol).as("q_id"),
      dimChecked(col(vecCol), dim, "sq: query vector").as("qe"))
    val joined = codes
      .withColumn("codes", dimChecked(col("codes"), dim, "sq: codes row"))
      .crossJoin(broadcast(sqBoundsRow(bounds, dim)))
      .crossJoin(broadcast(q))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    (if (excludeSelf) joined.filter(col("vec_id") =!= col("q_id"))
     else joined)
      .select(col("q_id"), col("vec_id"),
        call_function("sq_adist", col("qe"), col("codes"),
          col("__mns"), col("__mxs")).as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** IVF + SQ8 composed (the FAISS IVF-SQ shape — in practice the most
    * deployed compressed index: probe pruning × 4× scalar compression
    * without PQ's codebook training): each query probes its `nprobe`
    * best coarse cells exactly as [[ivfpqSearch]] does, then scans
    * ONLY those cells' members from the SQ codes table with the fused
    * decode-in-the-loop kernel ([[graft.plans.SqAdist]]) — the scan
    * covers ~nprobe/n_clusters of the corpus at a quarter of the
    * bytes per row. Inputs verbatim from the other operators:
    * `member`/`centroids` from [[ivfIndex]], `codes` from
    * [[sqEncode]], `bounds` from [[sqTrain]]. nprobe = n_clusters
    * degenerates to [[sqSearch]] over the whole corpus.
    * `residual = true` is FAISS's IVF-SQ DEFAULT (by_residual): codes
    * and bounds were trained on r(v) = v − c(cluster(v)) (feed
    * [[pqResiduals]] output to [[sqTrain]]/[[sqEncode]]), and each
    * probe's query side becomes q − c(probe) (same double-subtract →
    * float round-trip as [[ivfpqSearch]]'s residual path) so both ADC
    * sides sit in the probed cell's residual frame. Output:
    * (q_id, probe_label, vec_id, adist, rk ≤ k). */
  def ivfSqSearch(member: DataFrame, codes: DataFrame, queries: DataFrame,
      centroids: DataFrame, bounds: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      nprobe: Int = 1, excludeSelf: Boolean = true,
      residual: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // query vectors length-checked: a wrong-dim query NULLs every
    // distance and NULLS FIRST would silently return arbitrary
    // vectors (review r11)
    val sel = probeCells(queries, centroids, idCol, vecCol, nprobe,
      qe => dimChecked(qe, dim, "sq: query vector"),
      ce => dimChecked(ce, dim, "ivf: centroid vector"))
    val probes =
      (if (residual)
        sel.withColumn("qe", zip_with(col("qe"), col("me"),
          (a, b) => (a.cast(DoubleType) - b).cast(FloatType)))
      else sel)
        .select(col("q_id"), col("qe"), col("m_label").as("probe_label"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val scanned = codes
      .withColumn("codes", dimChecked(col("codes"), dim, "sq: codes row"))
      .join(member.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .join(broadcast(probes), col("cluster") === col("probe_label"))
      // bounds attach AFTER the probe pruning: the 2×dim-float arrays
      // would otherwise ride every corpus row through the member join
      // instead of only the ~nprobe/n_clusters survivors (review r11)
      .crossJoin(broadcast(sqBoundsRow(bounds, dim)))
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col("q_id"))
     else scanned)
      .select(col("q_id"), col("probe_label"), col("vec_id"),
        call_function("sq_adist", col("qe"), col("codes"),
          col("__mns"), col("__mxs")).as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** IVF + PQ composed (the FAISS-style IVFPQ shape, Jégou TPAMI'11
    * §V): each query probes its `nprobe` best coarse clusters against
    * the broadcast TRAINED centroid table ([[ivfIndex]] output), then
    * ADC-scores ONLY those clusters' members from the CODES table —
    * so the scan covers ~nprobe/n_clusters of the corpus AND touches
    * m ints per member instead of dim floats: the two scale levers
    * multiply. Inputs are the other operators' outputs verbatim:
    * `member`/`centroids` from [[ivfIndex]], `codes` from
    * [[pqEncode]], `codebooks` from [[pqTrain]]. Probe selection uses
    * squared euclidean distance to the coarse centroid (ascending —
    * the metric ADC ranks by), ties to the lowest cluster. Output:
    * (q_id, probe_label, vec_id, adist, rk ≤ k), ties to the lowest
    * vec_id. nprobe = n_clusters degenerates to [[pqSearch]] over the
    * whole corpus (property-tested in TextApiSpec). */
  def ivfpqSearch(member: DataFrame, codes: DataFrame, queries: DataFrame,
      centroids: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, m: Int, ksub: Int,
      nprobe: Int = 1, excludeSelf: Boolean = true,
      // true when `codes` came from [[pqResiduals]]-encoded vectors:
      // each probe's lookup table is then built on q − c(probe) so
      // both sides of the ADC sit in the same residual frame
      residual: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    val flat = collectCodebookFlat(codebooks, m, ksub)
    def dtabOver(qv: Column): Column =
      transform(col("fl"), c =>
        call_function("float_dist_sq",
          slice(qv, c.getField("j") * sub + 1, lit(sub)),
          c.getField("ce")))
    // nprobe best coarse cells per query (parameter-bounded); centroid
    // dims validated like the query side (review r11)
    val sel = probeCells(queries, centroids, idCol, vecCol, nprobe,
      cCheck = ce => dimChecked(ce, dim, "ivf: centroid vector"))
    // the ADC lookup table: per (query, probe) in residual mode (qv =
    // q − c(probe) differs per probe), but ONCE PER QUERY otherwise —
    // the raw-vector table depends only on q, and building it per
    // probe would cost nprobe× the distance computations and carry
    // nprobe identical copies in the broadcast (review r10)
    val probes =
      if (residual)
        sel
          .withColumn("qv", zip_with(col("qe"), col("me"),
            (a, b) => (a.cast(DoubleType) - b).cast(FloatType)))
          .crossJoin(broadcast(flat))
          .select(col("q_id"), col("m_label").as("probe_label"),
            dtabOver(col("qv")).as("dtab"))
      else {
        val qtab = queries.select(col(idCol).as("q_id"), col(vecCol).as("qe"))
          .crossJoin(broadcast(flat))
          .select(col("q_id"), dtabOver(col("qe")).as("dtab"))
        sel.select(col("q_id"), col("m_label").as("probe_label"))
          .join(qtab, Seq("q_id"))
      }
    val adist = (0 until m).map(j =>
      element_at(col("dtab"), lit(j * ksub) + element_at(col("codes"), j + 1) + 1))
      .reduceLeft(_ + _)
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val scanned = codes
      .join(member.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .join(broadcast(probes), col("cluster") === col("probe_label"))
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col("q_id"))
     else scanned)
      .select(col("q_id"), col("probe_label"), col("vec_id"),
        adist.as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** The nprobe best coarse cells per query — the probe-selection
    * block [[ivfpqSearch]] and [[ivfSqSearch]] share: positional
    * (cluster, vector) centroids cast to double, broadcast against the
    * query side, squared-euclidean ranking with ties to the lowest
    * cluster. `qCheck` lets a caller wrap the query vector in a
    * validation column. Output keeps (q_id, qe, me, m_label) for the
    * residual path. `cCheck` validates the centroid vectors the same
    * way — a wrong-dim centroid table otherwise NULLs every probe
    * distance and the NULLS-FIRST rank silently picks arbitrary cells
    * (review r11). */
  private def probeCells(queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int,
      qCheck: Column => Column = identity,
      cCheck: Column => Column = identity): DataFrame = {
    val cents = centroids.select(col(centroids.columns(0)).as("m_label"),
      transform(cCheck(col(centroids.columns(1))),
        x => x.cast(DoubleType)).as("me"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("m_d2").asc, col("m_label").asc)
    queries.select(col(idCol).as("q_id"), qCheck(col(vecCol)).as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("m_d2", call_function("float_dist_sq", col("qe"), col("me")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nprobe)
  }

  /** Collect + validate the parameter-sized codebook ONCE and return
    * the one-row `(fl array<struct<j,code,ce>>)` lookup frame as a
    * LOCAL relation — shared by [[pqSearch]]/[[ivfpqSearch]]. The
    * completeness gate exists because the ADC lookup index is
    * arithmetic (j·ksub + code): a dropped empty-cluster code would
    * silently misalign every distance. Building `fl` from the
    * collected rows (not from the codebooks frame) matters when the
    * caller did not persist the codebooks: their lineage is m corpus-
    * pass k-means fits, and the old validate-then-re-aggregate shape
    * evaluated it twice (review r10). */
  private def collectCodebookFlat(codebooks: DataFrame, m: Int, ksub: Int)
      : DataFrame = {
    val rows = codebooks
      .select(col("j").cast(IntegerType), col("code").cast(IntegerType),
        transform(col("ce"), x => x.cast(DoubleType)).as("ce"))
      .collect()
    val present = rows.map(r => (r.getInt(0), r.getInt(1))).toSet
    val missing = (for {
      j <- 0 until m; c <- 0 until ksub
    } yield (j, c)).filterNot(present)
    require(missing.isEmpty,
      s"need a complete m×ksub codebook; missing (j, code): " +
        s"${missing.take(8).mkString(", ")}")
    val schema = StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("ce", ArrayType(DoubleType))))
    codebooks.sparkSession
      .createDataFrame(java.util.Arrays.asList(
        rows.sortBy(r => (r.getInt(0), r.getInt(1))): _*), schema)
      .agg(sort_array(collect_list(struct(col("j"), col("code"), col("ce"))))
        .as("fl"))
  }

  /** Distributed Lloyd's k-means over ANY embedding corpus — the p21
    * plan as a reusable operator. Each iteration is the canonical
    * scalable shape: the k×dim centroid table collapses to ONE
    * broadcast row holding a k-struct array, assignment is a per-row
    * argmin fold inside the scan (zero shuffle; ties to the lowest
    * cluster id), and the update is ONE k-row groupBy carrying `dim`
    * partial-aggregated sums. Cross-engine determinism: elements are
    * scaled to exact integers (round(x·1e7)), summed exactly
    * (order-free), and the mean is one integer/integer double division
    * — centroids are bit-identical in Spark and DuckDB. Long sums hold
    * while cluster_size × 1e7·max|x| < 2^63 (~9e11 members at unit
    * norm); past that, widen the sums to DecimalType(38,0). Default
    * seeds are the k smallest-id vectors (TakeOrdered, no global
    * sort); pass seeding = "kmeans++" for the deterministic
    * D²-weighted spread ([[kmeansPlusPlusSeeds]]) real corpora want.
    * Output: (vec_id, cluster, d2, n_members). */
  def kmeansCluster(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 2,
      seeding: String = "min-id"): DataFrame = {
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    kmeansAssign(e, kmeansFit(corpus, idCol, vecCol, k, dim, iters, seeding))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cl"))))
      .select(col("vec_id"), col("cl").as("cluster"),
        col("d2"), col("n_members"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication", arXiv:2303.09540):
    * semantic near-duplicate REMOVAL over an embedding column —
    * cluster with k-means, search for duplicates only WITHIN each
    * cluster (cosine ≥ `tau`), and keep exactly one representative
    * per duplicate group: the member FARTHEST from its centroid (the
    * paper keeps the item with the lowest centroid similarity — for
    * unit-norm embeddings max squared euclidean distance is the same
    * ordering, and `d2` is already computed by the assignment pass),
    * ties to the lowest id.
    *
    * 100 TB stance: the clustering IS the blocking — the only pairing
    * work is a self-join shuffled on the cluster key, quadratic in
    * CLUSTER size, never in corpus size; that is the paper's own
    * contract (choose k ≈ n / desired-cluster-size — they run k=110k
    * over 5B embeddings). Duplicate groups close under transitivity
    * via [[connectedComponents]] (pointer-jumping, O(log d) rounds),
    * and the final prune is one anti-join against the (dup-bounded)
    * non-representative set, the [[collapseByComponents]] shape.
    * Everything downstream of the fit reuses the ONE assignment pass
    * (cluster id, d2 and the squared norm travel together through the
    * self-join — no second scan, no re-assignment).
    *
    * Determinism: centroids are the integer-scaled exact means of
    * [[kmeansFit]] (min-id seeding — the frozen p21 oracle contract),
    * cosines are sequential double folds ([[graft.plans.FloatDotProduct]])
    * over exact IEEE division, so the ≥ `tau` gate and the d2
    * representative ordering are bit-identical across engines.
    * Output: the SURVIVING rows (vec_id, cluster, d2). */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, tau: Double, iters: Int = 2): DataFrame = {
    // materialized ONCE: the assignment feeds four plan arms (both
    // pair sides, the representative's d2 join, the final anti-join) —
    // without truncation each arm would re-run the whole fit+assign
    // chain (same lineage stance as [[connectedComponents]]; swap for
    // a reliable checkpoint dir on a real cluster)
    val assigned = kmeansAssign(
      vecs.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
      kmeansFit(vecs, idCol, vecCol, k, dim, iters))
      .withColumn("n2", dot(col("embedding"), col("embedding")))
      .localCheckpoint()
    // the ONLY pairing shuffle: both sides hash-partitioned on the
    // cluster key; va < vb halves the work and orients every pair
    val a = assigned.select(col("cl"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("n2").as("n2a"))
    val b = assigned.select(col("cl"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("n2").as("n2b"))
    val pairs = a.join(b, Seq("cl"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        cosine(dot(col("ea"), col("eb")), col("n2a"), col("n2b"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= tau)
    // duplicate groups are transitive closures WITHIN a cluster (pairs
    // never cross clusters, so components cannot either)
    val comps = connectedComponents(pairs.select(col("va"), col("vb")))
    val drop = comps
      .join(assigned.select(col("vec_id").as("node"), col("d2")), Seq("node"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("d2").desc, col("node").asc)))
      .filter(col("__rk") > 1)
      .select(col("node").as("vec_id"))
    assigned.join(drop, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cl").as("cluster"), col("d2"))
  }

  /** The TRAINED quantizer behind [[kmeansCluster]]: Lloyd's
    * iterations only, returning the final centroid table
    * (cl int, ce array&lt;double&gt;) — the shape [[ivfSearch]] accepts
    * as `centroids` for trained-quantizer probe selection:
    * {{{
    * val cents  = kmeansFit(corpus, "id", "vec", k = 256, dim = 64)
    * val member = kmeansCluster(corpus, "id", "vec", k = 256, dim = 64)
    * val hits   = ivfSearch(corpus.join(member.select("vec_id", "cluster"),
    *   corpus("id") === member("vec_id")), queries, "id", "vec",
    *   "cluster", k = 10, nprobe = 8, centroids = Some(cents))
    * }}}
    * Same determinism contract as [[kmeansCluster]] (integer-scaled
    * exact sums, ties to the lowest cluster id). */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 2,
      seeding: String = "min-id",
      // kmeans|| sampling rounds (each is two driver-synchronized
      // corpus passes — ≈5 suffices per the paper; fewer trades seed
      // spread for latency). Ignored by the other seedings.
      seedRounds: Int = 5): DataFrame = {
    val Scale = IntScale
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val init = seeding match {
      case "min-id" =>
        e.orderBy(col("vec_id")).limit(k)
          .select((row_number().over(Window.orderBy(col("vec_id"))) - 1)
            .cast(IntegerType).as("cl"),
            transform(col("embedding"), x => x.cast(DoubleType)).as("ce"))
      // the spread seeding real corpora want (see [[kmeansPlusPlusSeeds]]):
      // min-id stays the DEFAULT only because it is the frozen contract
      // of the p21 oracle and of any caller relying on reproducible
      // seeds across library versions — new trained-quantizer fits
      // should pass "kmeans++"
      case "kmeans++" =>
        kmeansPlusPlusSeeds(corpus, idCol, vecCol, k, dim)
          .select(col("cl"), col("ce"))
      // the O(rounds)-pass seeding for IVF-scale k — see
      // [[kmeansParallelSeeds]]; k-means++ proper is k−1 passes
      case "kmeans||" =>
        kmeansParallelSeeds(corpus, idCol, vecCol, k, dim, seedRounds)
          .select(col("cl"), col("ce"))
      case other => throw new IllegalArgumentException(
        s"seeding must be 'min-id', 'kmeans++', or 'kmeans||', got '$other'")
    }
    def update(asg: DataFrame): DataFrame = {
      val sums = (0 until dim).map(i =>
        sum(round(element_at(col("embedding"), i + 1).cast(DoubleType)
          * Scale).cast(LongType)).as(s"s$i"))
      asg.groupBy(col("cl"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .select(col("cl"), array((0 until dim).map(i =>
          col(s"s$i").cast(DoubleType) /
            (col("cnt") * Scale).cast(DoubleType)): _*).as("ce"))
    }
    var cents = init
    var it = 0
    while (it < iters) { cents = update(kmeansAssign(e, cents)); it += 1 }
    cents
  }

  /** Free a superseded per-round `localCheckpoint`'s executor blocks.
    * The succeeding round's EAGER localCheckpoint has already
    * materialized an independent copy, so the old blocks are dead
    * weight — without the release they survive until the DataFrame is
    * GC'd, holding one corpus-sized copy PER ROUND on the executors.
    * Plan-shape-tolerant like the connectedComponents cleanup: if a
    * future Spark stops exposing the LogicalRDD, the collect finds
    * nothing and we skip the release (memory grows for the call,
    * correctness unchanged). blocking = false: no job waits on the
    * removal. */
  private def releaseLocalCheckpoint(df: DataFrame,
      blocking: Boolean = false): Unit =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking))

  /** Deterministic k-means++ seed selection (Arthur & Vassilvitskii,
    * SODA'07): after an initial anchor, each next seed is drawn
    * D²-WEIGHTED — probability proportional to the squared distance to
    * the nearest already-chosen seed — which is what gives k-means++
    * its O(log k)-competitive SSE guarantee and, practically, spreads
    * seeds across the data's real clusters where min-id seeding can
    * land every seed in one blob. The draw is RNG-FREE like p15's
    * membership hashing, so fits are reproducible across runs AND
    * engines: d² is integer-scaled EXACTLY like the centroid sums
    * (`round(d2·1e7)` — cross-engine-stable on the same grounds), each
    * point owns the half-open interval `(cum−w, cum]` of the integer
    * prefix-sum over a fixed total order, and round j picks the unique
    * interval containing `md5("kmppt:j") mod total` — exact integer
    * arithmetic end to end, no transcendentals whose libm rounding
    * could flip an argmax between engines.
    *
    * Scale shape (100 TB): the prefix sum is TWO-PHASE — points are
    * hash-bucketed (`buckets` keys; the bucket id is part of the fixed
    * total order (b, id), so any bucket count gives a valid order), a
    * `groupBy(b)` computes per-bucket sums, a window over the
    * `buckets`-row bucket table (the only single-partition step —
    * bounded by the parameter, not the data) turns them into bucket
    * offsets, and the within-bucket cumulative sum runs partitioned by
    * bucket. Each of the k−1 rounds updates d² incrementally against
    * ONLY the newest seed (`d² ← min(d², dist²(x, c_new))` — Lloyd's
    * standard trick, one narrow map per round, localCheckpoint'ed so
    * round j's plan never re-derives rounds 1..j−1) and collects
    * exactly one (id, vector) row to the driver — k·dim doubles total,
    * bounded by parameters like the IVF medoid collect, never by data.
    *
    * Output: (cl int — selection order, vec_id — the seed row's id,
    * ce array&lt;double&gt;) — drop `vec_id` and it is [[kmeansFit]]'s
    * centroid shape. Duplicate points of an already-chosen seed have
    * d² = 0 (an empty interval) and can never be re-picked; if the
    * corpus runs out of distinct points (total mass 0) the seed list
    * is returned SHORT — [[kmeansAssign]] handles any centroid count.
    * Driver-gated by p35 against a DuckDB replay of the same integer
    * selection. */
  def kmeansPlusPlusSeeds(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = corpus.sparkSession
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    def dist2(q: Column, c: Column): Column =
      call_function("float_dist_sq", q, c)
    def seedLit(s: Seq[Double]): Column = array(s.map(lit(_)): _*)
    def collectSeed(df: DataFrame): Array[org.apache.spark.sql.Row] = df
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("ce"))
      .collect()
    // anchor seed = the smallest id: k-means++ leaves the first seed
    // uniform-random; any fixed choice keeps the D² structure of the
    // remaining draws (and min-id matches the legacy seeding's anchor)
    val first = collectSeed(e.orderBy(col("vec_id")).limit(1))
    require(first.nonEmpty, "kmeansPlusPlusSeeds: empty corpus")
    // free superseded rounds as we go: without the release, every
    // round's corpus-sized checkpoint blocks survive until GC — k−1
    // live copies at 100 TB instead of ~2
    var seeds = Vector((first(0).get(0), first(0).getSeq[Double](1)))
    var state = e
      .withColumn("d2", dist2(col("embedding"), seedLit(seeds.head._2)))
      .localCheckpoint()
    var j = 1
    var exhausted = false
    while (j < k && !exhausted) {
      val w = state
        .withColumn("w", round(col("d2") * IntScale).cast(LongType))
        .withColumn("b", call_function("md5_prefix_long",
          concat(lit("kmppb:"), col("vec_id").cast(StringType)), lit(4))
          % buckets)
      val bSums = w.groupBy(col("b")).agg(sum(col("w")).as("bw"))
      val offs = bSums.select(col("b"),
        coalesce(sum(col("bw")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
      // total mass + this round's hashed threshold, in-plan (1 row);
      // the tot > 0 filter runs BEFORE pmod so an exhausted corpus
      // yields an empty frame instead of an ANSI divide-by-zero
      val tRow = bSums.agg(sum(col("bw")).as("tot"))
        .filter(col("tot") > 0)
        .select(pmod(call_function("md5_prefix_long",
          lit(s"kmppt:$j"), lit(7)), col("tot")).as("t"))
      val picked = w.join(offs, Seq("b"))
        .withColumn("cum", col("off") + sum(col("w")).over(
          Window.partitionBy(col("b")).orderBy(col("vec_id"))))
        .crossJoin(broadcast(tRow))
        .filter(col("cum") > col("t") && col("cum") - col("w") <= col("t"))
      val rows = collectSeed(picked)
      if (rows.isEmpty) exhausted = true
      else {
        seeds = seeds :+ ((rows(0).get(0), rows(0).getSeq[Double](1)))
        val next = state.withColumn("d2",
          least(col("d2"), dist2(col("embedding"), seedLit(seeds.last._2))))
          .localCheckpoint()
        releaseLocalCheckpoint(state)
        state = next
      }
      j += 1
    }
    releaseLocalCheckpoint(state) // nothing reads state past the loop
    val idType = e.schema("vec_id").dataType
    val schema = StructType(Seq(
      StructField("cl", IntegerType, nullable = false),
      StructField("vec_id", idType),
      StructField("ce", ArrayType(DoubleType))))
    val out = seeds.zipWithIndex.map { case ((id, ce), i) =>
      org.apache.spark.sql.Row(i, id, ce) }
    spark.createDataFrame(java.util.Arrays.asList(out: _*), schema)
  }

  /** Scalable k-means‖ seeding (Bahmani et al., "Scalable k-means++",
    * VLDB'12) — the 100 TB path [[kmeansPlusPlusSeeds]] is not:
    * k-means++ proper is k−1 SEQUENTIAL corpus passes (each draw
    * depends on the previous seed), which at IVF-scale k (hundreds of
    * centroids) means hundreds of full scans. k-means‖ replaces them
    * with `rounds` passes (≈5 suffices per the paper): each round
    * Bernoulli-samples every point INDEPENDENTLY with probability
    * min(1, l·d²/Σd²) — expected ≤ `oversample` = l candidates per
    * round, in ONE map over the corpus — then the ≤ l·rounds+1
    * collected candidates are weighted by how many corpus points each
    * one is nearest to (one more pass) and reduced to k seeds by
    * weighted k-means++ ON THE DRIVER, where the candidate set is
    * tiny. Total: 2·rounds+2 corpus passes, independent of k.
    *
    * Determinism: RNG-free like [[kmeansPlusPlusSeeds]] — the
    * Bernoulli draw compares a per-(point, round) md5 56-bit uniform
    * against l·w/Σw over the integer-scaled d² weights, candidates are
    * collected in vec_id order, and the driver-side weighted k-means++
    * replays the same integer-interval pick (BigInt-exact mass
    * arithmetic) with md5 round thresholds — the same corpus always
    * yields the same seeds. The anchor seed is the min-id point, as in
    * [[kmeansPlusPlusSeeds]].
    *
    * Output: (cl int — selection order, vec_id, ce array&lt;double&gt;),
    * the [[kmeansFit]] centroid shape with `vec_id` extra; SHORT when
    * the corpus has fewer than k distinct points. Driver memory is
    * bounded by the candidate count (≈ l·rounds vectors), a parameter
    * — never by the data. */
  def kmeansParallelSeeds(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, rounds: Int = 5, oversample: Double = -1)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(oversample == -1 || oversample > 0,
      s"oversample must be positive (or -1 for the 2k default), got $oversample")
    val l = if (oversample > 0) oversample else 2.0 * k
    val spark = corpus.sparkSession
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    def dist2(q: Column, c: Column): Column =
      call_function("float_dist_sq", q, c)
    def seedLit(s: Seq[Double]): Column = array(s.map(lit(_)): _*)
    def asCand(df: DataFrame) = df
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("ce"))
    val first = asCand(e.orderBy(col("vec_id")).limit(1)).collect()
    require(first.nonEmpty, "kmeansParallelSeeds: empty corpus")
    var cands = Vector((first(0).get(0), first(0).getSeq[Double](1)))
    var state = e
      .withColumn("d2", dist2(col("embedding"), seedLit(cands.head._2)))
      .localCheckpoint()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val w = state
        .withColumn("w", round(col("d2") * IntScale).cast(LongType))
      val totRow = w.agg(sum(col("w"))).collect()(0)
      val tot = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      if (tot == 0L) exhausted = true // every point duplicates a candidate
      else {
        // Bernoulli(min(1, l·w/tot)) per point: u56/2^56 < l·w/tot.
        // IEEE double division/multiplication are correctly rounded, so
        // the comparison is reproducible; candidates collect in vec_id
        // order so the driver-side ordering is too.
        val sampled = asCand(w.filter(
            call_function("md5_prefix_long",
              concat(lit(s"kmpar:$r:"), col("vec_id").cast(StringType)),
              lit(7)).cast(DoubleType) / lit(math.pow(2.0, 56)) <
              lit(l) * col("w").cast(DoubleType) / lit(tot.toDouble))
            .orderBy(col("vec_id")))
          .collect()
        if (sampled.nonEmpty) {
          val newC = sampled.map(row =>
            (row.get(0), row.getSeq[Double](1))).toVector
          cands = cands ++ newC
          // incremental d² against ONLY this round's candidates, as a
          // broadcast fold over one collected array column — the
          // expression tree stays O(1) regardless of sample size (a
          // per-candidate least() chain would grow with l and fall out
          // of codegen at IVF-scale oversampling)
          val newLits = array(newC.map(c => seedLit(c._2)): _*)
          val next = state
            .withColumn("d2", aggregate(newLits, col("d2"),
              (acc, c) => least(acc, dist2(col("embedding"), c))))
            .localCheckpoint()
          releaseLocalCheckpoint(state) // free the superseded round
          state = next
        }
        r += 1
      }
    }
    releaseLocalCheckpoint(state) // weighting reads e, not state
    // weight candidates by nearest-point counts (ties → lowest index,
    // [[kmeansAssign]]'s contract), then reduce to k on the driver
    val idType = e.schema("vec_id").dataType
    val candSchema = StructType(Seq(
      StructField("cl", IntegerType, nullable = false),
      StructField("vec_id", idType),
      StructField("ce", ArrayType(DoubleType))))
    val candRows = cands.zipWithIndex.map { case ((id, ce), i) =>
      org.apache.spark.sql.Row(i, id, ce) }
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*), candSchema)
    val wt = kmeansAssign(e, candDf.select(col("cl"), col("ce")))
      .groupBy(col("cl")).agg(count(lit(1)).as("wt"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    // driver-side weighted k-means++ over the candidate set: exact
    // BigInt mass intervals in candidate order, md5 pick per round —
    // the in-memory twin of the distributed draw in
    // [[kmeansPlusPlusSeeds]]
    def d2d(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        val d = a(i) - b(i); s += d * d; i += 1
      }
      s
    }
    def md5Mod(s: String, mod: BigInt): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      BigInt(1, d.take(7)).mod(mod)
    }
    val candVecs = cands.map(_._2)
    val minD2 = Array.tabulate(cands.size)(i => d2d(candVecs(i), candVecs.head))
    var picked = Vector(0)
    var j = 1
    var dry = false
    while (j < k && !dry) {
      val mass = minD2.zipWithIndex.map { case (d2v, i) =>
        BigInt(wt.getOrElse(i, 0L)) *
          BigInt(math.round(d2v * IntScale)) }
      val total = mass.sum
      if (total <= 0) dry = true
      else {
        val t = md5Mod(s"kmfin:$j", total)
        var cum = BigInt(0); var pick = -1; var i = 0
        while (pick < 0 && i < mass.length) {
          cum += mass(i)
          if (cum > t) pick = i
          i += 1
        }
        picked = picked :+ pick
        var m = 0
        while (m < minD2.length) {
          val d = d2d(candVecs(m), candVecs(pick))
          if (d < minD2(m)) minD2(m) = d
          m += 1
        }
      }
      j += 1
    }
    val out = picked.zipWithIndex.map { case (ci, i) =>
      org.apache.spark.sql.Row(i, cands(ci)._1, cands(ci)._2) }
    spark.createDataFrame(java.util.Arrays.asList(out: _*), candSchema)
  }

  /** Assign ANY vectors to a TRAINED centroid table — the SERVING side
    * of [[ivfIndex]]: training assigns the corpus once, but arriving
    * vectors (a notebook batch, a `readStream`) need the same argmin
    * pass without refitting. Pure map-side — the k-row centroid table
    * collapses to one broadcast row and each vector folds an argmin
    * over it (codegen'd distance kernel, ties to the lowest cluster),
    * so the SAME call runs unchanged on a stream (stream-static
    * broadcast; StreamsSpec drives it). `centroids` is positional
    * (cluster, vector) — [[kmeansFit]]/[[ivfIndex]] output. Output:
    * (vec_id, embedding, cl, d2). */
  def assignToCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    kmeansAssign(
      vecs.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
      centroids.select(col(centroids.columns(0)).as("cl"),
        col(centroids.columns(1)).as("ce")))

  /** One Lloyd's assignment pass: argmin distance against a broadcast
    * centroid row. `e` = (vec_id, embedding); `cents` = (cl, ce). */
  private def kmeansAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    // native codegen'd left-to-right fold — bit-identical to the
    // aggregate(zip_with(...)) HOF spelling and the oracle's
    // list_reduce, but inside whole-stage codegen (see FloatDistSq)
    def dist2(q: Column, c: Column): Column =
      call_function("float_dist_sq", q, c)
    // empty-centroid guard on the one broadcast row: an empty table
    // (an upstream filter gone wrong) would otherwise assign EVERY
    // vector the fold's sentinel (cl = -1, d2 = MaxValue) and no error
    // ever surfaces — downstream treats -1 as a real cluster
    // (review r11)
    val cArr = cents
      .agg(sort_array(collect_list(struct(col("cl"), col("ce")))).as("cs"))
      .select(when(size(col("cs")) > 0, col("cs"))
        .otherwise(raise_error(lit(
          "assignToCentroids: empty centroid table — nothing to assign to")))
        .as("cs"))
    e.crossJoin(broadcast(cArr))
      .withColumn("best", aggregate(col("cs"),
        struct(lit(Double.MaxValue).as("d2"), lit(-1).as("cl")),
        (acc, c) => {
          val d = dist2(col("embedding"), c.getField("ce"))
          // strict < keeps the first minimum; cs is sorted by cl,
          // so ties resolve to the lowest cluster id
          when(d < acc.getField("d2"),
            struct(d.as("d2"), c.getField("cl").as("cl")))
            .otherwise(acc)
        }))
      .select(col("vec_id"), col("embedding"),
        col("best.cl").as("cl"), col("best.d2").as("d2"))
  }

  /** SimHash near-dup pairs over ANY corpus by Hamming distance ≤
    * `maxHamming` (must be ≤ 3: the 4-chunk pigeonhole guarantees
    * exact recall only up to 3 differing bits of the 48) — the p26
    * plan as a reusable operator: one bucket shuffle, fingerprints
    * carried through it, map-side xor verification. Buckets larger
    * than [[LshBucketCap]] are dropped (see [[minhashNeardupPairs]]);
    * the pigeonhole recall guarantee holds below the cap. */
  def simhashNeardupPairs(corpus: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0,3] for 4-chunk pigeonhole recall, got $maxHamming")
    val fp = simhashFingerprints(corpus, idCol, textCol)
    val chunkExpr = (0 until 4)
      .map(c => s"$c, CAST((simhash >> ${12 * c}) & 4095 AS BIGINT)")
      .mkString(", ")
    fp.select(col("doc_id"), col("simhash"),
        expr(s"stack(4, $chunkExpr) AS (ck, cv)"))
      .groupBy(col("ck"), col("cv"))
      .agg(array_sort(collect_set(struct(col("doc_id"), col("simhash"))))
        .as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= LshBucketCap)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast(IntegerType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact character-n-gram Jaccard near-dup pairs over ANY corpus —
    * the p04 plan as a reusable operator, candidate-bounded by PREFIX
    * FILTERING (Bayardo et al., "Scaling Up All Pairs Similarity
    * Search", WWW'07; Chaudhuri et al., ICDE'06): two sets with
    * J ≥ t MUST share an element among each one's first
    * |s| − ⌈t·|s|⌉ + 1 n-grams in a single global rarest-first order
    * (df asc, gram asc), and their sizes must be within a factor of t.
    * So the self-join runs over prefixes only — at sf0.1 that is 33M
    * join rows instead of 114M, and the gap widens with corpus size
    * because prefixes concentrate on LOW-df grams. On top of that,
    * PPJoin's positional + index-prefix filters (Xiao et al., WWW'08)
    * prune candidates whose matched gram sits too deep in either set
    * for the overlap threshold to still be reachable — exactness-
    * preserving, see the inline proof sketch at the join. Each
    * distinct surviving candidate is verified exactly by one map-side
    * THRESHOLDED sorted-merge intersection
    * ([[graft.plans.SortedIntersectAtLeast]] — PPJoin's suffix
    * pruning applied at the merge: below-threshold pairs bail early
    * instead of scanning both arrays to the end). Results are EXACT
    * for the df-capped gram sets
    * (grams in more than `dfCap` docs are stop-grams, dropped from
    * sets on both engines — see the p04 QueryDef note).
    *
    * `groupCols` scope both the df statistic and the pairing (p04
    * groups by language). Output: (doc_a, doc_b, jaccard ≥ minJaccard).
    */
  def ngramJaccardPairs(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5, groupCols: Seq[String] = Nil,
      dfCap: Int = NgramDfCap): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0,1], got $minJaccard")
    val grp = groupCols.map(col)
    // per-doc DISTINCT n-gram rows, map-side (codegen'd kernel)
    val tri0 = corpus.select(col(idCol).as("doc_id") +: grp :+
      explode(call_function("chargram_strings", col(textCol), lit(n)))
        .as("tri"): _*)
    // df table: distinct n-grams are bounded by charset^n per group —
    // broadcastable at any corpus size; partial agg keeps the shuffle
    // at one row per (mapper, gram). Each surviving gram gets a UNIQUE
    // deterministic integer id: the id ↔ (group, gram) bijection lets
    // every downstream step — prefix join key, set arrays, intersection
    // — run on longs instead of strings, which keeps array_intersect on
    // Spark's specialized primitive path (measured 4× on the verify
    // stage). Ids are rank-within-hash-bucket composed with the bucket
    // index — unique and deterministic like a global row_number, but
    // the window sorts 4096 DISTRIBUTED partitions instead of funneling
    // the whole gram table through one task (a large-charset corpus —
    // CJK trigrams — can have 1e8+ distinct grams; a partition-less
    // window would serialize, and ids must NOT come from a content hash
    // because a hash collision would silently merge two grams and break
    // the exactness contract).
    val GidBuckets = 4096
    val dfTab = tri0.groupBy(grp :+ col("tri"): _*)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .withColumn("__b", pmod(hash(grp :+ col("tri"): _*), lit(GidBuckets)))
      .withColumn("gid",
        row_number().over(Window.partitionBy(col("__b"))
          .orderBy(groupCols.map(col) :+ col("tri"): _*))
          .cast("long") * GidBuckets + col("__b"))
      .drop("__b")
    // no forced broadcast: at fixture scale AQE converts this join to a
    // broadcast anyway, and at large-charset scale the gram table can
    // exceed the broadcast limit — let the planner pick per run
    val tri = tri0.join(dfTab, groupCols :+ "tri")
    // per-doc set in the GLOBAL canonical order prefix filtering
    // requires: rarest first, df asc with gid as the tie-break — any
    // deterministic total order shared across docs is correct (the
    // exact jaccard filter decides membership; order only steers
    // filter effectiveness), and gid is a bijection to (group, gram),
    // so (df, gid) is such an order while keeping the gram STRING out
    // of the collect_list shuffle and the array sort (measured ~10% off
    // the sets stage at sf0.1 vs the (df, tri, gid) struct)
    // persisted: sets feeds the prefix explode AND both verification
    // joins — recomputing the collect_list shuffle three times costs
    // more than the whole join (same clearCache contract as p02).
    // tri0 itself is deliberately NOT persisted although two branches
    // scan it: materializing the exploded gram rows costs ~n× the
    // corpus bytes on disk, while the second pass is one more linear
    // scan + the codegen'd kernel — the cheaper side at 100 TB (same
    // two-pass shape as the p27/p32 corpus statistics).
    // `set` is the (df, gid)-ordered array the PREFIX math runs on;
    // `vset` is the same ids sorted ascending — the representation the
    // verify stage's sorted-merge intersection kernel requires (both
    // sorts happen once per DOCUMENT, map-side; the merge then runs
    // once per candidate PAIR)
    val sets = tri.groupBy(col("doc_id") +: grp: _*)
      .agg(sort_array(collect_list(struct(col("df"), col("gid"))))
        .as("st"))
      .select(col("doc_id") +: grp :+
        transform(col("st"), x => x.getField("gid")).as("set") :+
        sort_array(transform(col("st"), x => x.getField("gid"))).as("vset") :+
        size(col("st")).as("sz"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ⌈t·|s|⌉ with an epsilon guard: IEEE rounding can land t·|s| a hair
    // ABOVE the true rational product (100 × 0.07 = 7.000000000000001),
    // and ceil would then shorten the prefix / tighten the size filter
    // enough to LOSE an exactly-at-threshold pair. The epsilon is
    // RELATIVE (1e-9 of the product, floored at 1e-9 absolute) so it
    // dominates the ~2⁻⁵² relative rounding error at ANY set size;
    // relaxation only ever lengthens prefixes and widens the candidate
    // set — the exact jaccard filter at the end still decides
    // membership, so correctness is one-sided by construction.
    def relaxed(product: Column): Column =
      product - greatest(product * lit(1e-9), lit(1e-9))
    def ceilT(sz: Column): Column = ceil(relaxed(sz * lit(minJaccard)))
    def ceilR(product: Column): Column = ceil(relaxed(product))
    // t/(1+t): J ≥ t ⟺ overlap c ≥ t/(1+t)·(|a|+|b|) — the PPJoin
    // overlap threshold (Xiao et al., "Efficient Similarity Joins for
    // Near-Duplicate Detection", WWW'08)
    val tOver = minJaccard / (1.0 + minJaccard)
    // prefix rows carry the gram's POSITION in the canonical order so
    // the join can apply PPJoin's positional filter per matching gram
    val pref = sets.select(col("doc_id"), col("sz"),
      posexplode(slice(col("set"), lit(1),
        (col("sz") - ceilT(col("sz")) + 1).cast("int"))).as(Seq("pos", "gid")))
    // Pairing is ordered by SIZE (id tie-break), not id: with a as the
    // ≤-size side, c ≥ t/(1+t)(|a|+|b|) ≥ 2t/(1+t)|a|, so a true
    // pair's first common gram sits within a's SHORTER indexing prefix
    // |a| − ⌈2t/(1+t)·|a|⌉ + 1 (PPJoin's index prefix) — the a.pos
    // bound below — while b still needs the full ⌈t·|b|⌉ probe prefix
    // (c ≥ t·|b| via the size filter), which is what the explode
    // emits. The POSITIONAL filter is per matching gram: common
    // elements of the first common gram's pair all sit at ≥ pos in
    // both sets, so c ≤ min(|a|−pos_a, |b|−pos_b); a row surviving
    // requires that bound ≥ ⌈t/(1+t)(|a|+|b|)⌉. Rows for LATER common
    // grams may be pruned even for a true pair, but the first-gram row
    // always survives, so the pair reaches verification — exactness is
    // per-pair, not per-row. All three ⌈·⌉ bounds are epsilon-relaxed
    // (see relaxed()), which only widens the candidate set — the exact
    // jaccard filter still decides membership. Measured at sf0.1 the
    // positional+index-prefix filters cut verified candidates ~3×
    // on top of the prefix filter alone.
    val cands = pref.as("a").join(pref.as("b"),
        // gid is unique per (group, gram), so equality on it alone
        // already enforces the same-group block
        col("a.gid") === col("b.gid") &&
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") &&
              col("a.doc_id") < col("b.doc_id"))) &&
          // size filter: J ≥ t forces |a| ≥ t·|b| (a is the small side)
          relaxed(col("b.sz") * lit(minJaccard)) <= col("a.sz") &&
          // PPJoin index prefix on the small side (pos is 0-based)
          col("a.pos") <= col("a.sz") - ceilR(col("a.sz") * lit(2 * tOver)) &&
          // positional filter: overlap upper bound from this gram
          least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >=
            ceilR((col("a.sz") + col("b.sz")) * lit(tOver)))
      // normalize orientation to doc_a < doc_b (pairing ordered by
      // size above, so a's id may exceed b's).
      // (A count-based suffix bound — groupBy pair, m matches + tail
      // positions vs the overlap threshold — was measured here and
      // pruned NOTHING at t = 0.5: the probe prefix is ~|s|/2 long, so
      // the tail term |s|−1−pos alone always reaches the ~(|sa|+|sb|)/3
      // overlap threshold; the bound only bites at high thresholds.
      // PPJoin's full suffix filter works by RECURSING into the suffix
      // with binary search — per-pair array access the join rows don't
      // carry. The early-exit bound lives in the verify merge instead,
      // see sorted_intersect_atleast below.)
      // (Length-BAND join keys — (gid, ⌊log_{1/t}|s|⌋) with the probe
      // side exploded to its two compatible bands, so size-incompatible
      // pairs never form — were measured at sf0.1 (r11) and NOT
      // adopted: the gid join matches only ~454k row pairs and the size
      // predicate kills just 24% of them, so banding would pay ~1.5×
      // prefix-row shuffle to skip a one-comparison filter on ~110k
      // rows. The join's cost is the PREFIX ROW volume, not the
      // matched-pair volume, and banding grows the former.)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .distinct()
    // exact verify: |A ∩ B| via the codegen'd two-pointer merge over
    // the gid-sorted arrays (vset invariant: ascending, distinct —
    // built by sort_array over per-doc distinct ids above). The merge
    // is O(|a|+|b|) with zero per-pair allocation, vs array_intersect
    // hashing AND materializing an array we only size(). The merge is
    // THRESHOLDED (sorted_intersect_atleast — PPJoin's suffix pruning
    // at the merge level): it bails with -1 as soon as matches-so-far
    // + min(remaining) proves the pair cannot reach the overlap
    // threshold ⌈t/(1+t)(|a|+|b|)⌉ — most candidates are far below
    // threshold, so most merges stop early. Exactness: -1 only when
    // overlap < the (epsilon-relaxed, hence one-sided) threshold,
    // which implies jaccard < t; -1 renders jaccard negative and the
    // final exact filter drops it — the admitted pair set and their
    // jaccard values are identical to the unthresholded merge.
    val slim = sets.select(col("doc_id"), col("vset"), col("sz"))
    cands
      .join(slim.select(col("doc_id").as("da"), col("vset").as("sa"),
        col("sz").as("na")), Seq("da"))
      .join(slim.select(col("doc_id").as("db"), col("vset").as("sb"),
        col("sz").as("nb")), Seq("db"))
      .withColumn("c", call_function("sorted_intersect_atleast",
        col("sa"), col("sb"),
        ceilR((col("na") + col("nb")) * lit(tOver)).cast("int")))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Per-(train, eval) shared distinct word-k-gram counts over ANY two
    * corpora — the p16 decontamination core as a reusable operator.
    * The eval side is broadcast (benchmarks are small by contract);
    * output is (train_doc, eval_doc, n_shared_kgrams). */
  def sharedKgramCounts(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, k: Int = 5, hashKeys: Boolean = false): DataFrame = {
    // hashKeys = the production contract: join on 48-bit gram hashes
    // instead of gram strings, cutting broadcast bytes (the registered
    // p16 keeps string keys so the oracle is byte-exact; 48-bit
    // collisions are ~0 at benchmark-suite scale but nonzero, hence
    // opt-in)
    // empty tokens are removed BEFORE gram formation, like p47 (ADVICE
    // r12): leading/trailing whitespace otherwise injects "" as a
    // word, and a boundary gram carrying only k-1 real words would
    // inflate the per-pair overlap counts
    def grams(df: DataFrame, outId: String) = df
      .select(col(idCol).as(outId),
        array_remove(words(col(textCol)), "").as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col(outId),
        explode(
          if (hashKeys) call_function("kgram_hashes", col("ws"), lit(k), lit(6))
          else call_function("kgram_strings", col("ws"), lit(k))).as("g"))
    grams(train, "train_doc")
      .join(broadcast(grams(evalSet, "eval_doc")), "g")
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(count(lit(1)).as(s"n_shared_${k}grams"))
  }

  /** N-gram eval-set decontamination over ANY corpus — the production
    * recipe (GPT-3, Brown et al. 2020, Appendix C; Gopher/MassiveText
    * train–test overlap): flag every corpus document sharing ANY word
    * n-gram (default n = 13) with the eval set, so contaminated docs
    * can be dropped before training rather than silently inflating
    * eval scores. Complements [[sharedKgramCounts]] (which reports
    * per-(train, eval-doc) overlap COUNTS through an explode + join):
    * this is the boolean bulk-filter form, and its shape is the one a
    * 100 TB pass wants — the eval side is benchmark-suite-sized by
    * contract, so its distinct n-gram hashes collapse to ONE row
    * (`sort_array(collect_set(h))`) that broadcasts to every executor,
    * and the corpus side is a single map pass: positioned ROLLING
    * gram hashes ([[graft.plans.KgramRollHashesAll]] — each word
    * md5'd ONCE, windows combined mod 2⁶¹−1 in O(1) per slide; the
    * per-window-digest kernel re-hashes every word n times, ~n×
    * redundant digest work on a full-corpus pass) probed into the
    * broadcast array by [[graft.plans.AnyInSorted]] (binary search
    * per gram — O(g log m) per doc, no per-row set build, no explode,
    * and the corpus never shuffles or joins on anything data-sized).
    * 61-bit hashes: eval suites fit ~10⁶ grams, where the collision
    * odds against any one document's grams are ~10⁻¹² — and a
    * collision only ever over-flags one doc (false positive), never
    * leaks contamination through.
    *
    * Output: every corpus row + a boolean `flagCol`. Docs shorter than
    * n words carry no n-gram and are never flagged; an empty eval set
    * flags nothing. `evalTextCol` defaults to `textCol` for same-schema
    * corpora. */
  def ngramDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, n: Int = 13,
      evalTextCol: String = "", flagCol: String = "contaminated"): DataFrame = {
    val evCol = if (evalTextCol.isEmpty) textCol else evalTextCol
    // empty tokens are removed BEFORE gram formation: leading/trailing
    // whitespace otherwise injects "" as a word, so a boundary gram
    // carries only n-1 real words and a shared (n-1)-word run at doc
    // start could flag as n-gram contamination (ADVICE r11). The
    // rolling kernel keeps repeats; collect_set dedups the eval side.
    val evalHashes = evalSet
      .select(explode(call_function("kgram_roll_hashes_all",
        array_remove(words(col(evCol)), ""), lit(n))).as("h"))
      .agg(sort_array(collect_set(col("h"))).as("__eval_ngram_hashes"))
    corpus.crossJoin(broadcast(evalHashes))
      // coalesce(false): a NULL text has no n-grams and is NOT
      // contaminated — a NULL flag would escape both filter(flag) and
      // filter(!flag), silently losing the doc from the clean AND the
      // contaminated sets (the gopher NULL-verdict lesson, review r11)
      .withColumn(flagCol, coalesce(call_function("any_in_sorted",
        call_function("kgram_roll_hashes_all",
          array_remove(words(col(textCol)), ""), lit(n)),
        col("__eval_ngram_hashes")), lit(false)))
      .drop("__eval_ngram_hashes")
  }

  /** SPAN-granular eval-set decontamination — the excise-the-span
    * variant of [[ngramDecontaminate]]: instead of flagging (and
    * typically dropping) every document sharing a word n-gram with the
    * eval set, cut just the contaminated windows out of the text and
    * KEEP the document — the recipe for high-value corpora where
    * whole-doc drops are too lossy (a 50k-word book is not discarded
    * for quoting one benchmark question). Same dataflow as the boolean
    * form, and the same 100 TB shape: the eval side collapses to ONE
    * sorted rolling-hash row that broadcasts, and the corpus side is a
    * single map pass — positioned ROLLING gram hashes
    * ([[graft.plans.KgramRollHashesAll]], each word md5'd once,
    * windows slid in O(1)) probed
    * by binary search into the broadcast array by the
    * [[graft.plans.PositionsInSorted]] kernel (O(g log m) per doc, no
    * explode, no join, no shuffle), then window merge + excision via
    * the [[graft.plans.WordSpans]] char offsets ([[cutIntervals]] /
    * [[exciseSegments]] — also map-side). The corpus never shuffles at
    * all: the operator is embarrassingly parallel.
    *
    * Output: every corpus row + (n_flagged_grams, cut_spans
    * "cs-ce,…" in the word domain, `cleanCol`). Clean documents pass
    * through BYTE-IDENTICAL (NULL stays NULL); contaminated ones
    * re-join their kept segments with single spaces (interior
    * whitespace of each segment preserved verbatim). Docs shorter than
    * n words carry no n-gram and are never cut; an empty eval set cuts
    * nothing. `evalTextCol` defaults to `textCol`. A 61-bit collision
    * can only over-cut one window, never leak contamination. */
  def decontaminateSpans(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, n: Int = 13,
      evalTextCol: String = "", cleanCol: String = "text_clean"): DataFrame = {
    val evCol = if (evalTextCol.isEmpty) textCol else evalTextCol
    val evalHashes = evalSet
      .select(explode(call_function("kgram_roll_hashes_all",
        array_remove(words(col(evCol)), ""), lit(n))).as("h"))
      .agg(sort_array(collect_set(col("h"))).as("__eval_ngram_hashes"))
    corpus.crossJoin(broadcast(evalHashes))
      .withColumn("__ws", array_remove(words(col(textCol)), ""))
      .withColumn("__ps", call_function("positions_in_sorted",
        call_function("kgram_roll_hashes_all", col("__ws"), lit(n)),
        col("__eval_ngram_hashes")))
      .withColumn("__cuts", cutIntervals(col("__ps"), n))
      .withColumn("__spans", call_function("word_spans", col(textCol)))
      .withColumn("n_flagged_grams",
        coalesce(size(col("__ps")), lit(0)).cast(LongType))
      .withColumn("cut_spans", cutSpansText(col("__cuts")))
      .withColumn(cleanCol,
        when(size(col("__cuts")) === 0, col(textCol))
          .otherwise(exciseSegments(col(textCol), col("__spans"),
            coalesce(size(col("__ws")), lit(0)), col("__cuts"))))
      .drop("__eval_ngram_hashes", "__ws", "__ps", "__cuts", "__spans")
  }

  /** [[decontaminateSpans]] for a DATA-SIZED exclusion corpus — same
    * semantics (cut every word window sharing an n-gram with
    * `reference`, keep the doc, clean docs byte-identical), different
    * physical strategy: the broadcast form collapses the eval side to
    * one row, which is right for benchmark suites but impossible when
    * the exclusion set is itself a corpus — the Lee et al. §6.2 /
    * GPT-3 App. C case of scrubbing a new crawl against the PREVIOUS
    * model's full training set. Here both sides emit positioned
    * rolling gram hashes and meet in a SHUFFLE join on the hash
    * (left_semi — the reference side needs no distinct pass, the semi
    * join dedups; AQE handles Zipf-head skew), then the per-doc
    * excision tail is identical. Pick by reference size: broadcast
    * below executor-memory scale, this above. The two
    * implementations are pinned equal on identical inputs in
    * TextApiSpec. Output: (doc_id, n_words, n_cut_words, cut_spans,
    * text_clean), one row per corpus doc. `refTextCol` defaults to
    * `textCol`. */
  def decontaminateSpansAgainstCorpus(corpus: DataFrame,
      reference: DataFrame, idCol: String, textCol: String, n: Int = 13,
      refTextCol: String = ""): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val rCol = if (refTextCol.isEmpty) textCol else refTextCol
    val base = corpus.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__ws", array_remove(words(col("__t")), ""))
      .withColumn("__n", coalesce(size(col("__ws")), lit(0)))
    val corpusGrams = base.filter(col("__n") >= n)
      .select(col("doc_id"), posexplode(call_function("kgram_roll_hashes_all",
        col("__ws"), lit(n))).as(Seq("pos", "h")))
    val refGrams = reference
      .select(array_remove(words(col(rCol)), "").as("__rws"))
      .filter(size(col("__rws")) >= n)
      .select(explode(call_function("kgram_roll_hashes_all",
        col("__rws"), lit(n))).as("h"))
    val flagged = corpusGrams.join(refGrams, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("__ps"))
    base.join(flagged, Seq("doc_id"), "left")
      .withColumn("__cuts", cutIntervals(col("__ps"), n))
      .withColumn("__spans", call_function("word_spans", col("__t")))
      .select(col("doc_id"),
        col("__n").cast(LongType).as("n_words"),
        cutWordCount(col("__cuts")).as("n_cut_words"),
        cutSpansText(col("__cuts")).as("cut_spans"),
        when(size(col("__cuts")) === 0, col("__t"))
          .otherwise(exciseSegments(col("__t"), col("__spans"), col("__n"),
            col("__cuts"))).as("text_clean"))
  }

  /** DSIR-style importance scores (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every raw-corpus document by how much more likely its hashed
    * n-gram bag is under a TARGET corpus's n-gram distribution than
    * under the raw corpus's own — the log importance ratio
    * Σ_grams (log p_target(bucket) − log p_raw(bucket)) over
    * `buckets` feature-hash buckets, with add-`alpha` smoothing. The
    * standard way to select web-scale data that "looks like" a small
    * high-quality target (Wikipedia, textbooks) without training a
    * model. Features are all word 1..`maxGram`-grams (the paper's
    * unigram+bigram bag), COUNTED not deduplicated
    * ([[graft.plans.KgramHashesAll]]).
    *
    * Scale shape: the two bucket profiles are `buckets`-bounded
    * partial-agg shuffles (one row per (mapper, bucket)); the log-ratio
    * table is ≤ `buckets` rows and BROADCASTS into the scoring join,
    * so the raw corpus streams map-side and the only data-sized
    * shuffle is the per-doc partial-agg score sum. Engine-exactness:
    * each bucket's log-ratio is quantized to 1e-9 (two ln's differing
    * by an ULP between engines/libms must not change selection — the
    * same reproducibility stance as the RNG-free md5 sampling) and the
    * per-doc sum runs through the decimal accumulator
    * ([[graft.QueryDef.dsum]], order-free). Output: (doc_id, n_grams,
    * `scoreCol`), one row per raw doc with ≥ 1 word; select by
    * `filter(col(scoreCol) > τ)` or rank for top-fraction selection.
    * `targetTextCol` defaults to `textCol`. */
  def dsirImportanceScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 8192, maxGram: Int = 2,
      alpha: Double = 1.0, nBytes: Int = 6, targetTextCol: String = "",
      scoreCol: String = "dsir_logratio"): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxGram >= 1, s"maxGram must be >= 1, got $maxGram")
    require(alpha > 0, s"alpha must be > 0 (smoothing), got $alpha")
    val tCol = if (targetTextCol.isEmpty) textCol else targetTextCol
    def bucketRows(df: DataFrame, c: String, keep: Seq[Column]): DataFrame =
      df.select(keep :+ explode(flatten(array((1 to maxGram).map(k =>
          call_function("kgram_hashes_all",
            array_remove(words(col(c)), ""), lit(k), lit(nBytes))): _*)))
        .as("h"): _*)
        .withColumn("b", pmod(col("h"), lit(buckets.toLong)))
        .drop("h")
    val tB = bucketRows(target, tCol, Nil)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rB = bucketRows(raw, textCol, Nil)
      .groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val prof = tB.join(rB, Seq("b"), "full_outer")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    // totals AND the per-bucket rows in ONE aggregation over the
    // bounded profile (collect_list of ≤ `buckets` structs into a
    // single row, then explode back): deriving totals from `prof` as a
    // separate branch made Catalyst recompute the whole
    // profile-join subtree — two extra corpus gram passes at scale
    val llr = prof
      .agg(collect_list(struct(col("b"), col("ct"), col("cr"))).as("ps"),
        sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
      .select(explode(col("ps")).as("p"), col("tt"), col("tr"))
      .select(col("p.b").as("b"),
        round(log((col("p.ct") + alpha) / (col("tt") + alpha * buckets)) -
          log((col("p.cr") + alpha) / (col("tr") + alpha * buckets)), 9)
          .as("llr"))
    bucketRows(raw, textCol, Seq(col(idCol).as("doc_id")))
      .join(broadcast(llr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        graft.QueryDef.dsum(col("llr")).as(scoreCol))
  }

  /** Hashed bag-of-ngrams features as a standalone TABLE — the
    * fastText/DSIR feature map (all word 1..`maxGram`-grams, COUNTED
    * — [[graft.plans.KgramHashesAll]] — and feature-hashed into
    * `buckets`), shared by [[trainQualityClassifier]] /
    * [[classifierScore]] and definition-identical to
    * [[dsirImportanceScores]]' buckets so the two selection signals
    * can never drift. Output: (doc_id, b, cnt, doc_grams), one row
    * per (doc, occupied bucket). Scale shape: the count is a
    * partial-agg shuffle on (doc, b); the per-doc totals join is one
    * doc-keyed shuffle more — iterative consumers checkpoint the
    * result once ([[trainQualityClassifier]] does). */
  def hashedNgramFeatures(corpus: DataFrame, idCol: String, textCol: String,
      buckets: Int = 8192, maxGram: Int = 2, nBytes: Int = 6): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxGram >= 1, s"maxGram must be >= 1, got $maxGram")
    val rows = corpus.select(col(idCol).as("doc_id"),
        explode(flatten(array((1 to maxGram).map(k =>
          call_function("kgram_hashes_all",
            array_remove(words(col(textCol)), ""), lit(k), lit(nBytes))): _*)))
          .as("h"))
      .withColumn("b", pmod(col("h"), lit(buckets.toLong)))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val totals = rows.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("doc_grams"))
    rows.join(totals, Seq("doc_id"))
  }

  /** Linear text-classifier scores over [[hashedNgramFeatures]]
    * output: score(doc) = w_bias + Σ_b w_b · (cnt_b / doc_grams) —
    * term-frequency features times a broadcast weight vector, the
    * decimal accumulator ([[graft.QueryDef.dsum]]) keeping the sum
    * order-free and engine-exact. `weights` is (b, w) with the
    * INTERCEPT at index `buckets` (what [[trainQualityClassifier]]
    * emits); buckets absent from `weights` contribute 0 rather than
    * dropping the doc. One broadcast join + one doc-keyed partial
    * agg — the whole corpus scores in a single pass, the CCNet/GPT-3
    * "score the crawl with the quality classifier" step. Output:
    * (doc_id, n_feats, score). */
  def classifierScore(features: DataFrame, weights: DataFrame,
      buckets: Int): DataFrame = {
    val wMain = weights.select(col("b"), col("w")).filter(col("b") < buckets)
    val bias = weights.filter(col("b") === buckets)
      .agg(coalesce(sum(col("w")), lit(0.0)).as("__bias"))
    features.join(broadcast(wMain), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        graft.QueryDef.dsum(coalesce(col("w"), lit(0.0)) *
          (col("cnt").cast(DoubleType) / col("doc_grams"))).as("__dot"))
      .crossJoin(broadcast(bias))
      .select(col("doc_id"), col("n_feats"),
        (col("__dot") + col("__bias")).as("score"))
  }

  /** CCNet-style n-gram language-model perplexity filtering (Wenzek
    * et al. 2020 §4.3 — the head/middle/tail bucketing CCNet popularized
    * and every web-scale corpus since runs some form of): train a
    * per-language trigram LM on a REFERENCE corpus, score every corpus
    * document by average token log-probability, and split each language
    * into thirds (head = most reference-like). The LM is Stupid Backoff
    * (Brants et al. 2007, "Large Language Models in Machine
    * Translation" — the count-ratio backoff built FOR distributed
    * settings: no discount normalization pass, so the model is just the
    * raw n-gram count table): with α = `alpha`,
    * S(w|w₋₂w₋₁) = c₃/c(w₋₂w₋₁) when the trigram is attested, else
    * α·S(w|w₋₁); S(w|w₋₁) = c₂/c(w₋₁) when attested, else α·S(w);
    * S(w) = (c₁+1)/(N+V) — add-one smoothed so out-of-vocabulary
    * tokens score finitely (KenLM's <unk> role). Positions 0 and 1 use
    * the longest context that EXISTS (no backoff penalty for context
    * that cannot be had). Only languages present in the reference are
    * scored (CCNet's per-language LMs; no LM → no score), and empty
    * documents are not scored at all.
    *
    * 100 TB stance: the count table is the model — built by one
    * partial-agg pass over the reference (hot grams combine map-side),
    * prunable with `minCount` (CCNet ships PRUNED KenLM models for
    * exactly this reason; pruning only drops rows whose longer-order
    * branch would barely fire — a pruned gram backs off, it never
    * divides by zero, because a surviving n-gram's prefix always
    * survives too: prefix counts dominate). Scoring is two shuffles of
    * token-scale data: every position melts map-side into its ≤5
    * needed gram keys (the trigram, the two backoff grams, their two
    * contexts — all substrings of the document), ONE gram-keyed join
    * against the counts (many-to-one; AQE splits hot-gram skew), and
    * one (doc, pos) regroup; the per-language (N, V) table is a
    * broadcast. Nothing collects; the bucket split is one window per
    * language partition.
    *
    * Determinism: every probability is an exact-integer-ratio IEEE
    * division (+ the exact double α product), ln is quantized to 1e-9
    * (the DSIR stance — ln's last ulp differs across engines), the
    * per-doc sum runs through the decimal accumulator
    * ([[graft.QueryDef.davg]], order-free), and the ntile order has a
    * doc-id tiebreak — so scores, ppl and buckets replay bit-for-bit
    * in the oracle. Output: (idCol, lang, n_tokens, logprob_avg, ppl,
    * bucket). */
  def lmPerplexity(reference: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, langCol: String,
      alpha: Double = 0.4, minCount: Long = 1L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    def toks(c: Column): Column = array_remove(words(c), "")
    val ref = reference
      .select(col(langCol).as("lang"), toks(col(textCol)).as("ws"))
      .filter(size(col("ws")) > 0)
    // orders 1..3 in ONE union-explode pass; tokens cannot contain
    // whitespace, so gram strings of different orders never collide
    // and one (lang, gram) table serves every order
    val gramRows = (1 to 3).map { n =>
      ref.select(col("lang"), explode(
        when(size(col("ws")) >= n,
          transform(sequence(lit(1), size(col("ws")) - (n - 1)),
            i => array_join(slice(col("ws"), i, lit(n)), " ")))
          .otherwise(array().cast(ArrayType(StringType)))).as("g"))
    }.reduce(_ unionAll _)
    val counts = gramRows.groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val stats = ref.select(col("lang"), explode(col("ws")).as("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("ntok"), countDistinct(col("w")).as("vsize"))
    // map-side melt: each position emits its needed gram keys (null
    // where the position has no such context), joined ONCE
    val docs = corpus
      .select(col(idCol), col(langCol).as("lang"),
        toks(col(textCol)).as("ws"))
      .filter(size(col("ws")) > 0)
    val melted = docs
      .select(col(idCol), col("lang"),
        explode(transform(sequence(lit(0), size(col("ws")) - 1), i => struct(
          i.as("pos"),
          element_at(col("ws"), i + 1).as("u"),
          when(i >= 1, concat_ws(" ",
            element_at(col("ws"), i))).as("c1"),
          when(i >= 1, concat_ws(" ",
            element_at(col("ws"), i),
            element_at(col("ws"), i + 1))).as("b"),
          when(i >= 2, concat_ws(" ",
            element_at(col("ws"), i - 1),
            element_at(col("ws"), i))).as("c2"),
          when(i >= 2, concat_ws(" ",
            element_at(col("ws"), i - 1),
            element_at(col("ws"), i),
            element_at(col("ws"), i + 1))).as("t")))).as("p"))
      .select(col(idCol), col("lang"), col("p.pos").as("pos"),
        explode(filter(array(
          struct(lit("u").as("role"), col("p.u").as("g")),
          struct(lit("c1").as("role"), col("p.c1").as("g")),
          struct(lit("b").as("role"), col("p.b").as("g")),
          struct(lit("c2").as("role"), col("p.c2").as("g")),
          struct(lit("t").as("role"), col("p.t").as("g"))),
          s => s.getField("g").isNotNull)).as("rg"))
      .select(col(idCol), col("lang"), col("pos"),
        col("rg.role").as("role"), col("rg.g").as("g"))
    def cOf(role: String): Column =
      coalesce(max(when(col("role") === role, col("cnt"))), lit(0L))
        .as(role + "c")
    val perPos = melted.join(counts, Seq("lang", "g"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col(idCol), col("lang"), col("pos"))
      .agg(cOf("u"), cOf("c1"), cOf("b"), cOf("c2"), cOf("t"))
      .join(broadcast(stats), Seq("lang"))
    val uniP = (col("uc") + 1).cast(DoubleType) /
      (col("ntok") + col("vsize")).cast(DoubleType)
    val biP = col("bc").cast(DoubleType) / col("c1c").cast(DoubleType)
    val triP = col("tc").cast(DoubleType) / col("c2c").cast(DoubleType)
    val lp = round(
      when(col("pos") === 0, log(uniP))
        .when(col("pos") === 1 && col("bc") > 0, log(biP))
        .when(col("pos") === 1, log(lit(alpha) * uniP))
        .when(col("tc") > 0, log(triP))
        .when(col("bc") > 0, log(lit(alpha) * biP))
        .otherwise(log(lit(alpha) * lit(alpha) * uniP)), 9)
    perPos.withColumn("__lp", lp)
      .groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        graft.QueryDef.davg(col("__lp")).as("logprob_avg"))
      .withColumn("ppl", round(exp(-col("logprob_avg")), 6))
      .withColumn("bucket",
        when(ntile(3).over(Window.partitionBy(col("lang"))
          .orderBy(col("logprob_avg").desc, col(idCol).asc)) === 1, "head")
          .when(ntile(3).over(Window.partitionBy(col("lang"))
            .orderBy(col("logprob_avg").desc, col(idCol).asc)) === 2,
            "middle")
          .otherwise("tail"))
  }

  /** Trained data-quality classifier — the CCNet (Wenzek'20 §4) /
    * GPT-3 (Brown'20 App. A) recipe this library was missing between
    * its heuristic packs and DSIR: fit a cheap LINEAR model on
    * curated-vs-crawl labels over hashed n-gram features, then score
    * the whole crawl with [[classifierScore]] and keep the high end.
    * The model is logistic regression trained by full-batch gradient
    * descent: per iteration, one broadcast-weights join + doc-keyed
    * partial agg computes every document's margin z and residual
    * σ(z) − y, and one bucket-keyed partial agg reduces the gradient
    * to ≤ buckets+1 rows collected on the driver (the
    * kmeans/Lloyd's-round pattern — every collect parameter-bounded,
    * the corpus-sized features frame localCheckpoint'ed ONCE and
    * re-read per round). Deterministic: features are md5-derived, the
    * per-doc sums run through the decimal accumulator (order-free),
    * σ is quantized to 1e-9, and the weight updates are driver-side
    * double arithmetic — two runs on the same inputs produce
    * bit-identical weight tables (spec-pinned). Output: (b, w) with
    * the intercept at index `buckets`, ready for
    * [[classifierScore]]. */
  def trainQualityClassifier(pos: DataFrame, neg: DataFrame,
      textCol: String, buckets: Int = 8192, maxGram: Int = 2,
      iters: Int = 20, lr: Double = 1.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be > 0, got $lr")
    val spark = pos.sparkSession
    import spark.implicits._
    // monotonically_increasing_id is nondeterministic across plan
    // re-executions — checkpoint BEFORE anything derives from the
    // ids, so every consumer sees the one materialized assignment
    val docs = pos.select(col(textCol).as("__t")).withColumn("__y", lit(1.0))
      .unionByName(
        neg.select(col(textCol).as("__t")).withColumn("__y", lit(0.0)))
      .withColumn("__doc", monotonically_increasing_id())
      .localCheckpoint()
    val nDocs = docs.count().toDouble
    require(nDocs > 0, "need at least one labeled document")
    val feats = hashedNgramFeatures(docs, "__doc", "__t", buckets, maxGram)
      .join(docs.select(col("__doc").as("doc_id"), col("__y")), Seq("doc_id"))
      .select(col("doc_id"), col("__y"),
        col("b").cast(IntegerType).as("b"),
        (col("cnt").cast(DoubleType) / col("doc_grams")).as("fv"))
      // the intercept rides as one constant feature per doc
      .unionByName(docs.select(col("__doc").as("doc_id"), col("__y"),
        lit(buckets).as("b"), lit(1.0).as("fv")))
      .localCheckpoint()
    releaseLocalCheckpoint(docs)
    val w = Array.fill(buckets + 1)(0.0)
    (1 to iters).foreach { _ =>
      val wDf = broadcast(w.toIndexedSeq.zipWithIndex
        .map { case (v, b) => (b, v) }.toDF("b", "w"))
      val resid = feats.join(wDf, Seq("b"), "left")
        .groupBy(col("doc_id"), col("__y"))
        .agg(graft.QueryDef.dsum(
          coalesce(col("w"), lit(0.0)) * col("fv")).as("z"))
        .select(col("doc_id"),
          (round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 9) - col("__y"))
            .as("r"))
      val grad = feats.join(resid, Seq("doc_id"))
        .groupBy(col("b"))
        .agg(graft.QueryDef.dsum(col("r") * col("fv")).as("g"))
        .collect()
      grad.foreach { row =>
        w(row.getInt(0)) -= lr * row.getDouble(1) / nDocs
      }
    }
    releaseLocalCheckpoint(feats)
    w.toIndexedSeq.zipWithIndex.map { case (v, b) => (b, v) }.toDF("b", "w")
  }

  /** Per-document repeated-passage share over ANY corpus — the p32
    * core as a reusable operator: the fraction of a doc's distinct
    * word-`passageLen`-gram passages that also occur in ANOTHER
    * document. Output: (doc_id, n_passages, n_shared, shared_ratio). */
  def passageShareStats(corpus: DataFrame, idCol: String, textCol: String,
      passageLen: Int = PassageLen): DataFrame = {
    val passages = corpus
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= passageLen)
      .select(col("doc_id"),
        explode(call_function("kgram_hashes",
          col("ws"), lit(passageLen), lit(6))).as("h"))
    val dfTab = passages.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
    passages.join(dfTab, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_passages"), col("n_shared"),
        (col("n_shared") / col("n_passages")).as("shared_ratio"))
  }

  /** Near-dup collapse of ANY corpus: keep ONE representative (minimum
    * id) per connected near-dup component and every unpaired row — the
    * p30 plan as a reusable operator, preserving ALL caller columns.
    * `pairs` is any (first col, second col) = (id, id) pair table, e.g.
    * [[minhashNeardupPairs]] or [[simhashNeardupPairs]] output. */
  def collapseNeardups(corpus: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    collapseByComponents(corpus, idCol, connectedComponents(
      pairs.select(pairs.columns(0), pairs.columns(1))))

  /** [[collapseNeardups]] from a PRECOMPUTED component table — the
    * (node, component) output of [[connectedComponents]]. Collapse,
    * split and report each need the same pair graph; at 100 TB the
    * graph (minhash signatures + bucket shuffle + label propagation)
    * is far more expensive than any of the three consumers, so a
    * pipeline that ships all of them should run [[connectedComponents]]
    * ONCE and fan out from the result instead of letting each consumer
    * re-derive it (the pairs-taking signatures stay as conveniences
    * for single-consumer calls). */
  def collapseByComponents(corpus: DataFrame, idCol: String,
      components: DataFrame): DataFrame = {
    val drop = components
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** Leakage-safe train/val/test split of ANY corpus: the assignment
    * is hashed from the near-dup COMPONENT representative, not the
    * doc, so a near-duplicate pair can never straddle train and test
    * (the classic eval-leakage bug a doc-hash split ships silently) —
    * the p31 plan as a reusable operator, preserving ALL caller
    * columns and adding `component` and `split`. `pairs` is any
    * (id, id) pair table (e.g. [[minhashNeardupPairs]]); unpaired rows
    * are their own component. RNG-free md5 bucketing in tenths:
    * `trainBuckets`/10 train, `valBuckets`/10 val, remainder test.
    * One broadcast join against the component table (bounded by the
    * near-dup set); the corpus side hashes map-side. */
  def leakageSafeSplit(corpus: DataFrame, idCol: String, pairs: DataFrame,
      trainBuckets: Int = 8, valBuckets: Int = 1): DataFrame =
    splitByComponents(corpus, idCol, connectedComponents(
      pairs.select(pairs.columns(0), pairs.columns(1))),
      trainBuckets, valBuckets)

  /** [[leakageSafeSplit]] from a PRECOMPUTED component table — the
    * (node, component) output of [[connectedComponents]]; see
    * [[collapseByComponents]] for why sharing one pass matters. */
  def splitByComponents(corpus: DataFrame, idCol: String,
      components: DataFrame,
      trainBuckets: Int = 8, valBuckets: Int = 1): DataFrame = {
    require(trainBuckets >= 1 && valBuckets >= 0 &&
      trainBuckets + valBuckets < 10,
      s"need 1 <= trainBuckets and trainBuckets + valBuckets < 10, " +
        s"got $trainBuckets + $valBuckets")
    // fail fast instead of an ambiguous-reference AnalysisException
    // (component) or a silent caller-column overwrite (split)
    val taken = corpus.columns.toSet.intersect(Set("component", "split"))
    require(taken.isEmpty,
      s"corpus already has column(s) ${taken.mkString(", ")} — rename " +
        "them before calling leakageSafeSplit, which adds both")
    val comp = components.select(col("node").as(idCol), col("component"))
    corpus.join(broadcast(comp), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("__bucket",
        call_function("md5_prefix_long",
          concat(lit("split:"), col("component").cast(StringType)),
          lit(4)) % 10)
      .withColumn("split",
        when(col("__bucket") < trainBuckets, lit("train"))
          .when(col("__bucket") < trainBuckets + valBuckets, lit("val"))
          .otherwise(lit("test")))
      .drop("__bucket")
  }

  /** Oracle-side twin of [[simhashFp]] as a CTE chain ending in
    * `fp(doc_id, simhash)`. */
  private val SimhashFpSql: String = """
    toks AS (
      SELECT doc_id, CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) AS t
      FROM documents, unnest(string_split_regex(text, '\s+')) u(w)),
    votes AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (t >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM toks, unnest(range(0, 48)) bb(b)
      GROUP BY doc_id, b),
    fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id)"""

  /** Connected components over an undirected pair list (first two
    * columns = the two endpoint ids): returns (node, component) where
    * component = the minimum node id reachable from `node`.
    *
    * Iterative min-label propagation with pointer-jumping: each round
    * joins labels across edges and keeps the per-node minimum; labels
    * only decrease, so the fixpoint is exactly min-reachable. From the
    * 4th round on, a shortcut step also folds in the label's OWN label
    * (`lbl ← min(lbl, lbl(lbl))`, the classic pointer-jumping /
    * "shortcutting" step of parallel CC — cf. Shiloach–Vishkin and the
    * two-phase algorithms in Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14), which contracts label chains
    * geometrically: worst-case rounds drop from O(diameter) to
    * O(log diameter) after the 3 plain warmup rounds. Shallow graphs —
    * near-dup components are usually star-like, converging in ≤3
    * rounds — never pay the extra join; a 100 TB dup-CHAIN no longer
    * needs a diameter-sized round budget (a 120-hop path converges in
    * ~12 rounds, inside the default maxIter=50 that plain propagation
    * would blow). Correctness is unchanged: the shortcut only moves a
    * label to another node id provably inside the same component, and
    * convergence (no label decreased, shortcut included) still implies
    * neighbor-min stability, which forces every label to the component
    * minimum. Each round's label table is checkpointed —
    * an iterative join plan grows EXPONENTIALLY in lineage (next
    * references labels twice via the self-join), so without per-round
    * truncation even a 9-node chain OOMs the driver building plan
    * strings. The checkpoint doubles as the convergence probe's
    * materialization (ONE count() per round). The strategy is
    * injectable: `checkpointDir = None` (default) uses
    * `localCheckpoint` — fast, but blocks live on executors, so a lost
    * executor fails the job; pass a reliable dir (HDFS/S3 on a
    * cluster) for `checkpoint`, whose truncated lineage survives
    * executor loss — the right choice for long dedup graphs at 100 TB.
    * Only nodes that appear in a pair are returned (isolated nodes are
    * their own component trivially). Public because its output is the
    * fan-out point for [[collapseByComponents]], [[splitByComponents]]
    * and [[dedupReport]] — one graph pass, many consumers. */
  def connectedComponents(
      pairsDf: DataFrame, maxIter: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    // NOTE: setting a checkpointDir mutates the SparkContext-wide
    // checkpoint location for the duration of this call; a previously
    // set dir is restored on return (Spark offers no per-Dataset dir
    // and no way to UNSET one, so with no prior dir ours remains).
    // Intermediate rounds' checkpoint files are deleted INCREMENTALLY:
    // once round k is materialized its lineage no longer reads round
    // k−1's files, so they are removed right then — disk stays bounded
    // at ~2 rounds' worth of labels instead of growing with graph
    // diameter (50 rounds × 100 TB-scale label tables). Ownership is
    // POSITIVE: the checkpointed Dataset's own plan (its LogicalRDD)
    // reports the exact rdd directory its files landed in
    // (getCheckpointFile), so only files THIS call wrote are ever
    // deleted — a concurrent foreign df.checkpoint() into the same
    // (context-global) location is invisible to the cleanup (r08
    // ADVICE closed the prior listing-diff's mis-attribution window).
    // The final labels' files (which the returned DataFrame reads)
    // are structurally un-deletable (they are never in lastRoundDirs
    // when a delete runs). A foreign checkpoint taken while this call
    // holds the global dir lands under OUR uuid root and simply stays
    // there — never deleted, merely mislocated, the caller-visible
    // remnant of Spark's context-global setting.
    // On failure the last round's files (and
    // the in-flight round's partial files) remain for forensics; the
    // caller-owned lifecycle on success is ONE rdd directory per call.
    // Concurrent calls with different dirs in one context still race
    // on the global dir SETTING (their files interleave across the two
    // uuid roots); the cleanup itself no longer mis-attributes.
    val sc = pairsDf.sparkSession.sparkContext
    val prevCkptDir = sc.getCheckpointDir
    var lastRoundDirs: Seq[org.apache.hadoop.fs.Path] = Nil
    val ckpt: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        sc.setCheckpointDir(dir)
        val root = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
        val fs = root.getFileSystem(sc.hadoopConfiguration)
        df => {
          val out = df.checkpoint() // eager: materialized on return
          // positive ownership: the checkpointed plan's LogicalRDD
          // carries the rdd whose getCheckpointFile IS the directory
          // this call's files landed in. If a future Spark changes the
          // plan shape the collect finds nothing and we simply skip
          // deletion (disk grows for the run, nothing foreign is ever
          // touched) — fail-safe in the direction that loses no data.
          val mine = out.queryExecution.logical.collect {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }.flatMap(_.getCheckpointFile)
            .map(new org.apache.hadoop.fs.Path(_))
          lastRoundDirs.foreach(p => fs.delete(p, true))
          lastRoundDirs = mine
          out
        }
      case None =>
        // same round-by-round cleanup as the reliable path: once round
        // j+1's EAGER localCheckpoint has materialized, round j's
        // blocks are dead weight — without the release every round
        // pins a label-table-sized copy on the executors until the JVM
        // exits (the final round's blocks stay: they ARE the result)
        var lastLocal: Option[DataFrame] = None
        df => {
          val out = df.localCheckpoint()
          lastLocal.foreach(releaseLocalCheckpoint(_))
          lastLocal = Some(out)
          out
        }
    }
    try {
    val Seq(a, b) = pairsDf.columns.take(2).toSeq.map(col)
    val half = pairsDf.select(a.as("src"), b.as("dst"))
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = ckpt(edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    var changed = 1L
    var iter = 0
    // plain neighbor-min rounds before pointer-jumping kicks in: the
    // common near-dup graph converges within these, paying zero extra;
    // only graphs that are still moving after 3 rounds (deep chains)
    // take on the shortcut join's cost — exactly the graphs where
    // O(log d) instead of O(d) rounds pays for it many times over
    val ShortcutFromRound = 3
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("lbl").as("nl")),
          Seq("dst"))
        .groupBy(col("src")).agg(min(col("nl")).as("nbr"))
      val stepped = labels
        .join(nbrMin.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"))
      val jumped =
        if (iter < ShortcutFromRound) stepped
        else stepped
          // pointer jump: lbl ← min(lbl, lbl(lbl)). The invariant
          // ℓ(v) ≤ v (labels start at self, only decrease) makes the
          // jump monotone too; lbl(lbl) is read from the PREVIOUS
          // round's table, which is materialized — no lineage blowup
          .join(labels.select(col("lbl").as("ll"), col("node").as("lbl")),
            Seq("lbl"), "left")
          .select(col("node"), col("old"),
            least(col("lbl"), coalesce(col("ll"), col("lbl"))).as("lbl"))
      val next = ckpt(jumped)
      changed = next.filter(col("lbl") < col("old")).count()
      labels = next.select(col("node"), col("lbl"))
      iter += 1
    }
    // the final labels are localCheckpoint'ed (materialized), so the
    // edge cache is no longer referenced — release it here rather than
    // leaking one cached table per library call (r06 review)
    edges.unpersist()
    // Returning non-converged labels would SILENTLY split components —
    // p31 would then hash the halves into different train/test buckets,
    // the exact leakage it exists to prevent. Fail loudly instead.
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still decreasing)" +
        (if (maxIter > 4) s" — with pointer-jumping that needs a graph " +
          s"of diameter well beyond 2^${maxIter - 3}" else "") +
        "; raise maxIter")
    // (intermediate checkpoint cleanup happens inside ckpt() above —
    // by the time we return, only the final labels' rdd dir remains)
    labels.select(col("node"), col("lbl").as("component"))
    } finally if (checkpointDir.isDefined) {
      // restore the caller's context-wide checkpoint location (the
      // returned labels are already materialized, so they don't need
      // it). getCheckpointDir reports the <dir>/<uuid> SUBDIR that the
      // caller's own setCheckpointDir created — setting it back
      // verbatim would nest a fresh uuid one level deeper per call, so
      // restore the caller's original argument (the uuid dir's parent;
      // a new uuid beside the old one is the best Spark's API can do).
      // The API cannot UNSET the dir, so when the caller had none set,
      // ours stays — harmless (unused unless something later
      // checkpoints) and stated in the NOTE above.
      prevCkptDir.foreach(d => sc.setCheckpointDir(
        new org.apache.hadoop.fs.Path(d).getParent.toString))
    }
  }

  /** Dedup report from a PRECOMPUTED component table (the
    * (node, component) output of [[connectedComponents]]) — the
    * component-size histogram every dedup pass ships with its output:
    * (csize, n_components, n_docs, docs_removed), where docs_removed
    * is what [[collapseByComponents]] would drop. Two tiny aggs on a
    * table bounded by the near-dup doc count — the p33 plan as a
    * reusable operator. */
  def dedupReport(components: DataFrame): DataFrame =
    components.groupBy(col("component")).agg(count(lit(1)).as("csize"))
      .groupBy(col("csize"))
      .agg(count(lit(1)).as("n_components"),
        sum(col("csize")).as("n_docs"))
      .withColumn("docs_removed", col("n_docs") - col("n_components"))

  /** Oracle-side twin of [[connectedComponents]] over the `verified`
    * pair CTE: ground-truth min-reachable via a recursive CTE, ending
    * in `comp(node, component)`. Shared by p25 and p30 (the splicing
    * query must open with WITH RECURSIVE). */
  private val ComponentsSql: String = """
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION ALL
      SELECT doc_b, doc_a FROM verified),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)"""

  // ---- k-means oracle-SQL builders — ONE copy of each replayed
  // fragment, shared by the seeding gates (p35/p36), the fit gates
  // (p21/p38) and the trained-IVF gate (p37), so the integer selection
  // / exact-sum machinery can never drift between gates. Every builder
  // emits WITH-clause bodies over an `e(vec_id, emb)` opening CTE.
  // State-carrying CTEs are AS MATERIALIZED: DuckDB inlines plain CTEs
  // per reference, so a round chain whose every stage reads its
  // predecessor ~3× would expand to 3^rounds parquet scans — at the
  // p37 depth (5 seeding rounds + Lloyd's + probe replay) that
  // exhausted the process fd limit ("Too many open files").
  // MATERIALIZED pins each stage to one evaluation; results are
  // unchanged (verified bit-exact against the unmaterialized p36).

  /** Sequential squared-distance fold as DuckDB SQL — the oracle twin
    * of [[graft.plans.FloatDistSq]]'s left-to-right double fold. Both
    * sides are cast per element (identity when already DOUBLE). */
  private def kmD2Sql(dim: Int, q: String, c: String): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
      s"(CAST($q[i] AS DOUBLE) - CAST($c[i] AS DOUBLE)) * " +
      s"(CAST($q[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))), " +
      "(acc, x) -> acc + x)"

  /** Sequential dot-product fold — the [[graft.plans.FloatDotProduct]]
    * twin (per-element double casts, left-to-right accumulation). */
  private def kmDotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)"

  /** k-means++ D²-weighted seed selection ([[kmeansPlusPlusSeeds]]'
    * integer machinery) as a WITH body: opens `e`, anchors `s0` (min
    * id), and emits pick CTEs `p1..p{k-1}`, each carrying the chosen
    * (vec_id, emb). Replays, per round: d² to the nearest chosen seed,
    * round(d²·scale) integer weights, the two-phase (bucket, id)-
    * ordered prefix sum, and the md5 threshold pick. */
  private def kmppChainSql(k: Int, dim: Int): String = {
    val Scale = IntScale.toString
    def pick(j: Int): String = {
      val prev = if (j == 1) "d0" else s"d${j - 1}"
      s"""w$j AS MATERIALIZED (
         |  SELECT vec_id, emb, d2, CAST(ROUND(d2 * $Scale) AS BIGINT) AS w,
         |         CAST('0x' || substr(md5('kmppb:' || CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 4096 AS b
         |  FROM $prev),
         |bs$j AS (SELECT b, SUM(w) AS bw FROM w$j GROUP BY b),
         |off$j AS (
         |  SELECT b, COALESCE(SUM(bw) OVER (ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM bs$j),
         |t$j AS (
         |  SELECT CAST('0x' || substr(md5('kmppt:$j'), 1, 14) AS BIGINT) % SUM(w) AS t
         |  FROM w$j),
         |cum$j AS (
         |  SELECT w$j.vec_id, w$j.emb, w$j.w,
         |         off$j.off + SUM(w$j.w) OVER (PARTITION BY w$j.b ORDER BY w$j.vec_id) AS cum
         |  FROM w$j JOIN off$j ON w$j.b = off$j.b),
         |p$j AS (
         |  SELECT c.vec_id, c.emb FROM cum$j c, t$j
         |  WHERE c.cum > t$j.t AND c.cum - c.w <= t$j.t),
         |d$j AS MATERIALIZED (
         |  SELECT d.vec_id, d.emb, LEAST(d.d2, ${kmD2Sql(dim, "d.emb", "p.emb")}) AS d2
         |  FROM $prev d CROSS JOIN p$j p)""".stripMargin
    }
    s"""e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
       |s0 AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 1),
       |d0 AS (
       |  SELECT e.vec_id, e.emb, ${kmD2Sql(dim, "e.emb", "s.emb")} AS d2
       |  FROM e CROSS JOIN s0 s),
       |${(1 until k).map(pick).mkString(",\n")}""".stripMargin
  }

  /** k-means‖ seeding ([[kmeansParallelSeeds]]) as a WITH body: opens
    * `e`, runs `rounds` Bernoulli sampling rounds (md5 56-bit uniform
    * vs l·w/Σw), weights candidates by nearest-point counts, and
    * replays the driver-side weighted k-means++ reduction — emitting
    * `s0` (the anchor) and pick CTEs `p1..p{k-1}` with (cl, vec_id,
    * emb). Oversample l = 2k, the Spark default. */
  private def kmparChainSql(k: Int, rounds: Int, dim: Int): String = {
    val Scale = IntScale.toString
    val L = s"${2.0 * k}" // oversample default 2k, exactly representable
    def rnd(r: Int): String =
      s"""w$r AS MATERIALIZED (
         |  SELECT vec_id, emb, d2, CAST(ROUND(d2 * $Scale) AS BIGINT) AS w
         |  FROM dr${r - 1}),
         |s$r AS MATERIALIZED (
         |  SELECT w$r.vec_id, w$r.emb FROM w$r,
         |       (SELECT CAST(SUM(w) AS DOUBLE) AS tot FROM w$r) t
         |  WHERE CAST(CAST('0x' || substr(md5('kmpar:$r:' || CAST(vec_id AS VARCHAR)), 1, 14) AS BIGINT) AS DOUBLE)
         |          / 72057594037927936.0
         |        < $L * CAST(w AS DOUBLE) / t.tot),
         |n$r AS (
         |  SELECT w$r.vec_id, MIN(${kmD2Sql(dim, s"w$r.emb", "s.emb")}) AS nd
         |  FROM w$r, s$r s GROUP BY w$r.vec_id),
         |dr$r AS MATERIALIZED (
         |  SELECT w$r.vec_id, w$r.emb, LEAST(w$r.d2, COALESCE(n$r.nd, w$r.d2)) AS d2
         |  FROM w$r LEFT JOIN n$r ON w$r.vec_id = n$r.vec_id)""".stripMargin
    def fin(j: Int): String = {
      val m = if (j == 1)
        s"""m1 AS (
           |  SELECT c.cl, c.vec_id, c.emb, ${kmD2Sql(dim, "c.emb", "a.emb")} AS md
           |  FROM cands c, (SELECT emb FROM cands WHERE cl = 0) a)""".stripMargin
      else
        s"""m$j AS (
           |  SELECT g${j - 1}.cl, g${j - 1}.vec_id, g${j - 1}.emb,
           |         LEAST(g${j - 1}.md, ${kmD2Sql(dim, s"g${j - 1}.emb", "p.emb")}) AS md
           |  FROM g${j - 1}, p${j - 1} p)""".stripMargin
      s"""$m,
         |g$j AS MATERIALIZED (
         |  SELECT m$j.cl, m$j.vec_id, m$j.emb, m$j.md,
         |         COALESCE(w.wt, 0) * CAST(ROUND(m$j.md * $Scale) AS BIGINT) AS mass
         |  FROM m$j LEFT JOIN wtab w ON m$j.cl = w.cl),
         |c$j AS (
         |  SELECT cl, vec_id, emb, mass, SUM(mass) OVER (ORDER BY cl) AS cum
         |  FROM g$j),
         |t${j}s AS (
         |  SELECT CAST('0x' || substr(md5('kmfin:$j'), 1, 14) AS BIGINT) % SUM(mass) AS t
         |  FROM g$j),
         |p$j AS MATERIALIZED (
         |  SELECT cl, vec_id, emb FROM c$j, t${j}s
         |  WHERE cum > t AND cum - mass <= t)""".stripMargin
    }
    s"""e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
       |s0 AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 1),
       |dr0 AS MATERIALIZED (
       |  SELECT e.vec_id, e.emb, ${kmD2Sql(dim, "e.emb", "s.emb")} AS d2
       |  FROM e CROSS JOIN s0 s),
       |${(1 to rounds).map(rnd).mkString(",\n")},
       |cands AS MATERIALIZED (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rnd, vec_id) - 1 AS INT) AS cl,
       |         vec_id, emb
       |  FROM (SELECT 0 AS rnd, vec_id, emb FROM s0
       |${(1 to rounds).map(r => s"        UNION ALL SELECT $r, vec_id, emb FROM s$r").mkString("\n")}) u),
       |asg AS (
       |  SELECT e.vec_id, c.cl,
       |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${kmD2Sql(dim, "e.emb", "c.emb")}, c.cl) AS rk
       |  FROM e, cands c),
       |wtab AS MATERIALIZED (
       |  SELECT cl, CAST(COUNT(*) AS BIGINT) AS wt
       |  FROM asg WHERE rk = 1 GROUP BY cl),
       |${(1 until k).map(fin).mkString(",\n")}""".stripMargin
  }

  /** Squared distance of `q`'s subspace slice (1-based offset `off`)
    * against a `len`-length centroid — the float_dist_sq-over-a-slice
    * fold the PQ gates replay. */
  private def pqD2SubSql(len: Int, q: String, off: Int, c: String): String =
    s"list_reduce(list_transform(range(1, ${len + 1}), i -> " +
      s"(CAST($q[$off + i] AS DOUBLE) - CAST($c[i] AS DOUBLE)) * " +
      s"(CAST($q[$off + i] AS DOUBLE) - CAST($c[i] AS DOUBLE))), " +
      "(acc, x) -> acc + x)"

  /** One PQ subspace's full training chain ([[pqTrain]] at iters = 1 +
    * [[pqEncode]]'s assignment, shared by p40/p41): min-id seeds →
    * assign → integer-exact update → final code assignment, emitting
    * `cf_j` (the codebook) and `code_j` (vec_id → code). */
  private def pqSpaceSql(j: Int, sub: Int, ksub: Int,
      src: String = "e"): String = {
    val off = j * sub
    val Scale = IntScale.toString
    val sumCols = (1 to sub).map(i =>
      s"SUM(CAST(ROUND(CAST(emb[${off + i}] AS DOUBLE) * $Scale) AS BIGINT)) AS s$i")
      .mkString(", ")
    val meanList = (1 to sub).map(i =>
      s"CAST(s$i AS DOUBLE) / CAST(cnt * $Scale AS DOUBLE)").mkString(", ")
    s"""c0_$j AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
       |         list_transform(range(1, ${sub + 1}), i -> CAST(emb[$off + i] AS DOUBLE)) AS ce
       |  FROM $src QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= $ksub),
       |a_$j AS MATERIALIZED (
       |  SELECT s.vec_id, s.emb, c.code
       |  FROM $src s CROSS JOIN c0_$j c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${pqD2SubSql(sub, "s.emb", off, "c.ce")} ASC, c.code ASC) = 1),
       |u_$j AS (
       |  SELECT code, COUNT(*) AS cnt, $sumCols FROM a_$j GROUP BY code),
       |cf_$j AS MATERIALIZED (
       |  SELECT code, [$meanList] AS ce FROM u_$j),
       |code_$j AS MATERIALIZED (
       |  SELECT s.vec_id, c.code
       |  FROM $src s CROSS JOIN cf_$j c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${pqD2SubSql(sub, "s.emb", off, "c.ce")} ASC, c.code ASC) = 1)"""
      .stripMargin
  }

  /** The per-query ADC distance cells for subspace `j` (queries =
    * vec_id ≤ 4, the fixture query slice). */
  private def pqDtSql(j: Int, sub: Int): String =
    s"""dt_$j AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, c.code, ${pqD2SubSql(sub, "q.emb", j * sub, "c.ce")} AS d2
       |  FROM e q CROSS JOIN cf_$j c WHERE q.vec_id <= 4)""".stripMargin

  /** Seed rows (`s0` + `p1..p{k-1}`) folded into [[kmeansFit]]'s
    * centroid shape `(cl int, ce array<double>)` as CTE `c0`. */
  private def kmSeedCentroidsSql(k: Int): String =
    s"""c0 AS MATERIALIZED (
       |  SELECT CAST(scl AS INT) AS cl,
       |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM (SELECT 0 AS scl, emb FROM s0
       |${(1 until k).map(j => s"        UNION ALL SELECT $j, emb FROM p$j").mkString("\n")}) seeds)""".stripMargin

  /** One Lloyd's assignment CTE ([[kmeansAssign]]'s twin): argmin of
    * `src`(vec_id, emb) against `cents`(cl, ce), ties to the lowest
    * cl, emitting (vec_id, emb, cl, d2). */
  private def kmAssignSql(name: String, cents: String, dim: Int,
      src: String = "e"): String =
    s"""$name AS MATERIALIZED (
       |  SELECT s.vec_id, s.emb, c.cl, ${kmD2Sql(dim, "s.emb", "c.ce")} AS d2
       |  FROM $src s CROSS JOIN $cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${kmD2Sql(dim, "s.emb", "c.ce")} ASC, c.cl ASC) = 1)""".stripMargin

  /** One Lloyd's centroid update ([[kmeansFit]]'s exact integer-sum
    * update): `from`(cl, emb) → `cname`(cl, ce) via `uname`. */
  private def kmUpdateSql(uname: String, cname: String, from: String,
      dim: Int): String = {
    val Scale = IntScale.toString
    val sumCols = (1 to dim).map(i =>
      s"SUM(CAST(ROUND(CAST(emb[$i] AS DOUBLE) * $Scale) AS BIGINT)) AS s$i")
      .mkString(", ")
    val meanList = (1 to dim).map(i =>
      s"CAST(s$i AS DOUBLE) / CAST(cnt * $Scale AS DOUBLE)").mkString(", ")
    s"""$uname AS (
       |  SELECT cl, COUNT(*) AS cnt, $sumCols FROM $from GROUP BY cl),
       |$cname AS MATERIALIZED (
       |  SELECT cl, [$meanList] AS ce FROM $uname)""".stripMargin
  }

  /** One [[randomProject]] output dimension as DuckDB SQL — the
    * IDENTICAL arithmetic (sequential double fold over the same
    * md5-derived ±1 weights, × 1/√outDim, rounded to FLOAT), shared by
    * the p69/p70 oracles so they can never drift from the operator. */
  private def jlProjSql(j: Int, dim: Int, outDim: Int,
      emb: String = "embedding"): String = {
    val w = (0 until dim).map(d => if (srpWeight(j, d) > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")
    s"""CAST(list_reduce(list_transform(range(1, ${dim + 1}),
       |  d -> CAST($emb[d] AS DOUBLE) * CAST($w[d] AS DOUBLE)),
       |  (acc, x) -> acc + x) * (1.0 / sqrt(${outDim}.0)) AS FLOAT)""".stripMargin
  }

  val queries: Seq[QueryDef] = Seq(

    // ---- p01: exact deduplication via content hash — one shuffle on the
    // 128-bit digest; representative = min doc_id per group. At 100 TB
    // the digest groupBy is the canonical exact-dedup plan (no text
    // comparison, fixed-width keys).
    QueryDef(
      "p01_exact_dedup",
      (s, d) =>
        T.documents(s, d)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(
            min(col("doc_id")).as("keep_doc_id"),
            count(lit(1)).as("n_copies"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy(col("keep_doc_id")),
      Some("""
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY md5(text) ORDER BY keep_doc_id"""),
      headline = true),

    // ---- p02: MinHash-LSH near-duplicate detection. Single shuffle
    // computes all 32 min-hashes (no 32× row blowup); stack() emits the
    // 8 banded signatures; near-dup candidates come from bucket
    // collisions only (groupBy(band, sig)); exact word-5-gram Jaccard
    // verifies candidates. The oracle recomputes the identical pipeline
    // in SQL from the same hash formulas.
    QueryDef(
      "p02_minhash_lsh",
      (s, d) => neardupPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH $NeardupPairsSql
        SELECT doc_a, doc_b, jaccard FROM verified
        ORDER BY doc_a, doc_b"""),
      headline = true),

    // ---- p03: SimHash fingerprints — 48-bit weighted-bit-vote hash,
    // fully map-side (one codegen'd pass per doc, see simhashFp). The
    // fingerprint builder is shared with p26, which pairs documents by
    // Hamming distance over these fingerprints.
    QueryDef(
      "p03_simhash",
      (s, d) => simhashFp(s, d).orderBy(col("doc_id")),
      Some(s"""
        WITH $SimhashFpSql
        SELECT doc_id, simhash FROM fp ORDER BY doc_id""")),

    // ---- p04: character-trigram Jaccard near-dup, blocked by lang AND
    // capped by gram document-frequency: a trigram shared by more than
    // NgramDfCap documents ("the" in en) discriminates nothing and would
    // make the self-join output quadratic in the matching docs — the r04
    // scale-killer. At fixture scale the cap exceeds the corpus, so
    // results are EXACT; at 100 TB this is the standard stop-gram
    // approximation (and p02 MinHash-LSH remains the production sketch
    // path). Candidate generation is prefix-filtered (see
    // [[ngramJaccardPairs]]) — exact same result set as the oracle's
    // brute-force capped join, at a fraction of the join volume (r07:
    // 114M → 33M rows at sf0.1, verified 0 pairs missed).
    QueryDef(
      "p04_ngram_jaccard",
      (s, d) =>
        ngramJaccardPairs(T.documents(s, d), "doc_id", "text",
          n = 3, minJaccard = 0.5, groupCols = Seq("lang"))
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH tri0 AS (
          SELECT DISTINCT doc_id, lang, substr(text, CAST(i AS INT), 3) AS tri
          FROM documents, unnest(range(1, length(text) - 1)) t(i)),
        tri AS (
          SELECT doc_id, lang, tri FROM tri0
          QUALIFY COUNT(*) OVER (PARTITION BY lang, tri) <= $NgramDfCap),
        inter AS (
          SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
          FROM tri a JOIN tri b
            ON a.lang = b.lang AND a.tri = b.tri AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        ns AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id)
        SELECT i.da AS doc_a, i.db AS doc_b,
               i.c / (na.n + nb.n - i.c) AS jaccard
        FROM inter i JOIN ns na ON na.doc_id = i.da JOIN ns nb ON nb.doc_id = i.db
        WHERE i.c / (na.n + nb.n - i.c) >= 0.5
        ORDER BY doc_a, doc_b"""),
      // headline since r07: the one historically quadratic operator —
      // keep its median-of-3 visible round-over-round, not just the
      // single-shot sweep number
      headline = true),

    // ---- p05: brute-force cosine top-k over embeddings — the ANN
    // baseline. Query side (k rows) is broadcast; per-vector norms are
    // computed once; the scan side streams. Dot products are sequential
    // double folds (see object doc) so ranks agree with the oracle.
    QueryDef(
      "p05_embedding_knn",
      (s, d) => {
        val e = T.embeddings(s, d)
        knnBruteCosine(e, e.filter(col("vec_id") <= 4), "vec_id", "embedding",
          k = 3)
          .orderBy(col("q_id"), col("rk"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, embedding,
                 list_reduce(list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) AS n2
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS q_id, c.vec_id,
                 list_reduce(list_transform(range(1, len(q.embedding) + 1),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) / (sqrt(q.n2) * sqrt(c.n2)) AS cos_sim
          FROM e q, e c WHERE q.vec_id <= 4 AND c.vec_id <> q.vec_id)
        SELECT q_id, vec_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rk
        FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk"""),
      headline = true),

    // ---- p06: embedding cosine near-dup, blocked by label cluster AND
    // sub-bucketed by sign-random-projection LSH (the r04 scale fix:
    // within-cluster all-pairs was quadratic in cluster size, and label
    // cardinality is small). 32 hyperplane-sign bits are map-side
    // float_dot projections against deterministic ±1 weight vectors; 8
    // bands of 4 bits each feed ONE (label, band, sig) bucket shuffle —
    // the p02 MinHash shape transplanted to embeddings — and only bucket
    // collisions reach the exact-cosine verification. Candidate recall is
    // the standard SRP-LSH trade (pairs colliding in no band are missed);
    // the oracle computes the identical buckets (same weights, same
    // sequential fold) so both engines see the same candidate set.
    QueryDef(
      "p06_embedding_neardup",
      (s, d) => {
        val e = T.embeddings(s, d)
          .select(col("vec_id"), col("label"), col("embedding"),
            dot(col("embedding"), col("embedding")).as("n2"))
        // 32 sign bits: each projection is float_dot(embedding, ±1
        // weights) — the codegen'd sequential double fold; ±1.0 products
        // are exact sign flips, so the left-to-right sum (and thus the
        // sign) matches the oracle's list_reduce bit-for-bit, with none
        // of the interpreted decimal-fold cost (measured ~3× faster at
        // sf0.1)
        val bitCols = (0 until SrpBands * SrpRows).map { i =>
          val w = array((0 until EmbDim).map(dd => lit(srpWeight(i, dd).toFloat)): _*)
          when(dot(col("embedding"), w) >= 0, lit("1")).otherwise(lit("0"))
            .as(s"bit$i")
        }
        val sigExpr = (0 until SrpBands).map(b =>
          s"$b, concat(${(0 until SrpRows).map(r => s"bit${b * SrpRows + r}").mkString(", ")})")
          .mkString(", ")
        val bands = e.select(Seq(col("vec_id"), col("label")) ++ bitCols: _*)
          .select(col("vec_id"), col("label"),
            expr(s"stack($SrpBands, $sigExpr) AS (band, sig)"))
        // the ONLY pairing shuffle: bucket collisions within the block;
        // buckets beyond LshBucketCap are mass-duplicate embedding
        // classes (pair output quadratic in bucket size — same bound
        // as p02/p26), exact at fixture scale
        val buckets = bands.groupBy(col("label"), col("band"), col("sig"))
          .agg(array_sort(collect_set(col("vec_id"))).as("vs"))
          .filter(size(col("vs")) > 1 && size(col("vs")) <= LshBucketCap)
        val pairs = buckets
          .select(explode(col("vs")).as("va"), col("vs"))
          .select(col("va"), explode(col("vs")).as("vb"))
          .filter(col("va") < col("vb"))
          .distinct()
        pairs
          .join(e.as("a"), col("va") === col("a.vec_id"))
          .join(e.as("b"), col("vb") === col("b.vec_id"))
          .select(col("va").as("vec_a"), col("vb").as("vec_b"),
            col("a.label").as("label"),
            cosine(dot(col("a.embedding"), col("b.embedding")),
              col("a.n2"), col("b.n2")).as("cos_sim"))
          .filter(col("cos_sim") >= 0.4)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id, label, embedding,
                 list_reduce(list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) AS n2
          FROM embeddings),
        bits AS (
          SELECT vec_id, label,
                 ${(0 until SrpBands * SrpRows).map { i =>
                   val w = (0 until EmbDim)
                     .map(d => if (srpWeight(i, d) > 0) "1.0" else "-1.0")
                     .mkString("[", ",", "]")
                   s"""CASE WHEN list_reduce(list_transform(range(1, ${EmbDim + 1}),
                      |   d -> CAST(embedding[d] AS DOUBLE) * CAST($w[d] AS DOUBLE)),
                      |   (acc, x) -> acc + x) >= 0 THEN '1' ELSE '0' END AS b$i""".stripMargin
                 }.mkString(",\n                 ")}
          FROM e),
        bands AS (
          SELECT vec_id, label, t.band,
                 ${(0 until SrpBands).map(b =>
                   s"concat(${(0 until SrpRows).map(r => s"b${b * SrpRows + r}").mkString(", ")})")
                   .mkString("[", ", ", "]")}[CAST(t.band AS INT) + 1] AS sig
          FROM bits, unnest(range(0, $SrpBands)) t(band)),
        bands_c AS (
          SELECT * FROM bands
          QUALIFY COUNT(*) OVER (PARTITION BY label, band, sig) <= $LshBucketCap),
        pairs AS (
          SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
          FROM bands_c a JOIN bands_c b
            ON a.label = b.label AND a.band = b.band AND a.sig = b.sig
           AND a.vec_id < b.vec_id)
        SELECT p.va AS vec_a, p.vb AS vec_b, a.label AS label,
               list_reduce(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                 (acc, x) -> acc + x) / (sqrt(a.n2) * sqrt(b.n2)) AS cos_sim
        FROM pairs p JOIN e a ON a.vec_id = p.va JOIN e b ON b.vec_id = p.vb
        WHERE list_reduce(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                 (acc, x) -> acc + x) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.4
        ORDER BY vec_a, vec_b"""),
      headline = true),

    // ---- p07: IVF approximate nearest-neighbor — coarse quantizer
    // (one deterministic medoid per label cluster; k-means training is
    // an offline job — p21 implements the real distributed Lloyd's
    // iterations — stubbed here by min-vec_id medoids), probe the
    // best cluster, then search only that cluster's members. The scale
    // path: the scan is restricted to ~1/k of the corpus and the
    // centroid table broadcasts.
    QueryDef(
      "p07_ann_ivf",
      (s, d) => {
        val e = T.embeddings(s, d)
        ivfSearch(e, e.filter(col("vec_id") <= 4), "vec_id", "embedding",
          clusterCol = "label", k = 3)
          .orderBy(col("q_id"), col("rk"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, embedding,
                 list_reduce(list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) AS n2
          FROM embeddings),
        medoids AS (
          SELECT label AS m_label, embedding AS me, n2 AS mn2
          FROM e QUALIFY ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id ASC) = 1),
        assigned AS (
          SELECT q.vec_id AS q_id, q.embedding AS qe, q.n2 AS qn2, m.m_label AS probe_label
          FROM e q, medoids m WHERE q.vec_id <= 4
          QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
            list_reduce(list_transform(range(1, len(q.embedding) + 1),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(m.me[i] AS DOUBLE)),
              (acc, x) -> acc + x) / (sqrt(q.n2) * sqrt(m.mn2)) DESC, m.m_label ASC) = 1),
        scored AS (
          SELECT a.q_id, a.probe_label, c.vec_id,
                 list_reduce(list_transform(range(1, len(a.qe) + 1),
                   i -> CAST(a.qe[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) / (sqrt(a.qn2) * sqrt(c.n2)) AS cos_sim
          FROM assigned a JOIN e c ON c.label = a.probe_label AND c.vec_id <> a.q_id)
        SELECT q_id, probe_label, vec_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rk
        FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""")),

    // ---- p08: corpus text statistics per language (partial-aggregable;
    // exact integer sums so the double means are deterministic).
    QueryDef(
      "p08_text_stats",
      (s, d) =>
        T.documents(s, d)
          .select(col("lang"), col("n_chars"),
            size(words(col("text"))).cast(LongType).as("n_words"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
            sum(col("n_words")).as("total_words"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy(col("lang")),
      Some("""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
               CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_words,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    // ---- p09: language-ID heuristic — stopword-marker voting with a
    // fixed tie-break chain (deterministic argmax). On real corpora the
    // marker lists carry the signal; here they exercise the operator.
    QueryDef(
      "p09_lang_id",
      (s, d) =>
        langIdPredict(T.documents(s, d).select(col("doc_id"), col("lang"),
          col("text")), "text")
          .select(col("doc_id"), col("lang"),
            col("predicted_lang").as("predicted"),
            (col("predicted_lang") === col("lang")).as("agrees"))
          .orderBy(col("doc_id")),
      Some("""
        WITH scored AS (
          SELECT doc_id, lang,
            CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('the','a','of','and','is'))) AS BIGINT) AS s_en,
            CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
            CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('le','la','les','et','est'))) AS BIGINT) AS s_fr,
            CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('el','los','las','y','es'))) AS BIGINT) AS s_es
          FROM documents)
        SELECT doc_id, lang,
               -- COALESCE: NULL text makes every score NULL, which
               -- would skip all WHENs and fall to ELSE 'es'; the Spark
               -- operator's when-chain falls back to 'und' instead
               CASE WHEN COALESCE(s_en + s_de + s_fr + s_es, 0) = 0 THEN 'und'
                    WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                    WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS predicted,
               CASE WHEN COALESCE(s_en + s_de + s_fr + s_es, 0) = 0 THEN 'und'
                    WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                    WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END = lang AS agrees
        FROM scored ORDER BY doc_id""")),

    // ---- p10: document quality scoring — length, stopword ratio,
    // punctuation ratio, token diversity, combined with a fixed-order
    // double formula (deterministic; per-row, embarrassingly parallel).
    QueryDef(
      "p10_quality_score",
      (s, d) =>
        qualityScore(T.documents(s, d), "text", lenCol = col("n_chars"))
          .select(col("doc_id"), col("quality"), col("keep"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
          + CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('the','a','of','and','is'))) AS DOUBLE)
            / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) * 0.2
          + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE)) * 0.2
          + CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS DOUBLE)
            / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) * 0.2 AS quality,
          least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
          + CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('the','a','of','and','is'))) AS DOUBLE)
            / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) * 0.2
          + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE)) * 0.2
          + CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS DOUBLE)
            / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) * 0.2 >= 0.5 AS keep
        FROM documents ORDER BY doc_id""")),

    // ---- p11: token counting — whitespace tokens and a BPE-ish
    // regex tokenizer (letter runs | digit runs | single symbol),
    // aggregated per language.
    QueryDef(
      "p11_token_count",
      (s, d) =>
        tokenCounts(T.documents(s, d), "text")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ws_tokens")).as("total_ws_tokens"),
            sum(col("bpe_tokens")).as("total_bpe_tokens"))
          .orderBy(col("lang")),
      Some("""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens
        FROM documents GROUP BY lang ORDER BY lang""")),

    // ---- p12: document fingerprinting — min-of-rolling-window hashes
    // (winnowing-style, window = word 3-grams) + distinct-gram count;
    // a compact per-doc sketch for shard-local dedup indexes. Entirely
    // map-side: kgram_hashes emits the distinct 3-gram hash SET per row
    // in one codegen'd pass, so the sketch is array_min + size — no
    // explode, no groupBy, ZERO shuffle (history: the r05 shape exploded
    // every (doc, gram) pair through a groupBy(doc_id); min and
    // count-distinct over the multiset equal min and size over the set).
    QueryDef(
      "p12_fingerprint",
      (s, d) =>
        winnowFingerprints(T.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""
        WITH w AS (
          SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents
          WHERE len(string_split_regex(text, '\s+')) >= 3),
        g AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')), 1, 8) AS BIGINT) AS h
          FROM w, unnest(range(1, len(ws) - 1)) t(i))
        SELECT doc_id, MIN(h) AS fingerprint, COUNT(DISTINCT h) AS n_distinct_grams
        FROM g GROUP BY doc_id ORDER BY doc_id""")),

    // ---- p13: the composed curation pipeline (operators.Curation) —
    // dedup → lang gate → length gate → quality gate → token cap, the
    // end-to-end corpus-prep job, oracle-checked as one query.
    QueryDef(
      "p13_curation_pipeline",
      (s, d) =>
        Curation.curate(T.documents(s, d)).orderBy(col("doc_id")),
      Some("""
        WITH dedup AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank
          FROM documents),
        scored AS (
          SELECT doc_id, lang, source, n_chars,
                 CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
                 least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
                 + CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w IN ('the','a','of','and','is'))) AS DOUBLE)
                   / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) * 0.2
                 + (1.0 - CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                          / CAST(length(text) AS DOUBLE)) * 0.2
                 + CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS DOUBLE)
                   / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) * 0.2 AS quality
          FROM dedup
          -- NULL text never matches anything (mirrors exactDedup's
          -- keep-all-NULL-text contract)
          WHERE (dup_rank = 1 OR text IS NULL)
            AND lang IN ('en','de','fr','es') AND n_chars >= 100)
        SELECT doc_id, lang, source, n_chars, n_tokens, quality
        FROM scored WHERE quality >= 0.5 AND n_tokens <= 10000
        ORDER BY doc_id""")),

    // ---- p14: corpus vocabulary — global word frequencies with exact
    // doc-frequency, top-100 by count (deterministic tiebreak on the
    // word). The groupBy(word) shuffle is the canonical distributed
    // term-count; TakeOrdered handles the top-k without a full sort.
    QueryDef(
      "p14_vocab_topk",
      (s, d) => vocabTopK(T.documents(s, d), "doc_id", "text", k = 100),
      Some("""
        SELECT w, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM documents, unnest(string_split_regex(text, '\s+')) t(w)
        GROUP BY w ORDER BY tf DESC, w ASC LIMIT 100""")),

    // ---- p15: deterministic stratified sampling — hash-bucket
    // subsampling per language stratum (10% en, 50% others), the
    // reproducible corpus-downsampling op (no RNG: membership is a pure
    // function of doc_id, so reruns and the oracle agree exactly).
    QueryDef(
      "p15_stratified_sample",
      (s, d) =>
        hashSample(T.documents(s, d), "doc_id",
          pct = when(col("lang") === "en", 10).otherwise(50))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sampled_chars"))
          .orderBy(col("lang")),
      Some("""
        WITH b AS (
          SELECT lang, n_chars,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket
          FROM documents)
        SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
        FROM b
        WHERE (lang = 'en' AND bucket < 10) OR (lang <> 'en' AND bucket < 50)
        GROUP BY lang ORDER BY lang""")),

    // ---- p16: benchmark decontamination — flag training docs sharing
    // any distinct word-5-gram with a held-out eval set (the GPT-3/PaLM
    // n-gram-overlap recipe; the eval set here is a deterministic
    // doc_id slice standing in for a benchmark suite). Scale shape:
    // grams explode only ONCE per side, the eval side is tiny by
    // construction (benchmarks are KBs against a 100 TB corpus) so it
    // broadcasts, and the train side streams through a map-side hash
    // join — no shuffle of the corpus. In production the join key would
    // be a 64-bit gram hash instead of the string to cut broadcast
    // bytes; the string key keeps the oracle byte-exact here.
    QueryDef(
      "p16_decontaminate",
      (s, d) => {
        val all = T.documents(s, d)
        sharedKgramCounts(
          train = all.filter(col("doc_id") % 97 =!= 0),
          evalSet = all.filter(col("doc_id") % 97 === 0),
          idCol = "doc_id", textCol = "text", k = 5)
          .orderBy(col("train_doc"), col("eval_doc"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS ws FROM documents
          WHERE len(list_filter(string_split_regex(text, '\s+'),
                                x -> x <> '')) >= 5),
        g AS (
          SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS g5
          FROM w, unnest(range(1, len(ws) - 3)) t(i)),
        ev AS (SELECT doc_id AS eval_doc, g5 FROM g WHERE doc_id % 97 = 0),
        tr AS (SELECT doc_id AS train_doc, g5 FROM g WHERE doc_id % 97 <> 0)
        SELECT train_doc, eval_doc, COUNT(*) AS n_shared_5grams
        FROM tr JOIN ev ON tr.g5 = ev.g5
        GROUP BY train_doc, eval_doc ORDER BY train_doc, eval_doc"""),
      headline = true),

    // ---- p17: repetition / boilerplate quality filter — fraction of
    // duplicated non-overlapping 3-word chunks per doc (the Gopher
    // duplicate-line/-paragraph family adapted to unpunctuated text).
    // Chunking, counting, AND deduping are per-row array folds
    // (transform + array_distinct), so the whole per-doc stage is
    // map-side; the only shuffle is the per-language rollup. Ratios are
    // exact-integer sums divided once at the end (no float partial-agg
    // nondeterminism).
    QueryDef(
      "p17_repetition",
      (s, d) =>
        repetitionSignals(
          T.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
          "text")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("n_distinct_chunks") < col("n_chunks"), 1L)
              .otherwise(0L)).as("n_repetitive"),
            ((sum(col("n_chunks")) - sum(col("n_distinct_chunks")))
              .cast(DoubleType) / sum(col("n_chunks"))).as("dup_chunk_ratio"))
          .orderBy(col("lang")),
      Some("""
        WITH w AS (
          SELECT doc_id, lang, string_split_regex(text, '\s+') AS ws FROM documents
          WHERE len(string_split_regex(text, '\s+')) >= 3),
        c AS (
          SELECT doc_id, lang,
                 list_transform(range(0, len(ws) // 3),
                   i -> array_to_string(ws[(3*i+1):(3*i+3)], ' ')) AS chunks
          FROM w),
        st AS (
          SELECT lang, len(chunks) AS n, len(list_distinct(chunks)) AS nd FROM c)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN nd < n THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
               CAST(SUM(n) - SUM(nd) AS DOUBLE) / SUM(n) AS dup_chunk_ratio
        FROM st GROUP BY lang ORDER BY lang""")),

    // ---- p18: source-mixing weights — temperature-scaled sampling
    // weights per corpus source (the Pile/LLaMA data-mixing recipe at
    // temperature 1/2: weight ∝ sqrt(tokens)), plus the token budget a
    // 1M-token mix would draw from each source. Token counts are exact
    // integer sums; sqrt and the ×1e6 product are IEEE-exactly-rounded
    // in both engines, so quantizing the weight to an INTEGER via floor
    // makes the normalizing sum exact and order-independent (a decimal
    // cast here would hit the Spark-HALF_UP-vs-DuckDB rounding split on
    // midpoint reprs — QueryDef.dsum scaladoc). The per-source
    // aggregate is one shuffle over a handful of groups; the scalar
    // total broadcasts.
    QueryDef(
      "p18_source_mixing",
      (s, d) =>
        sourceMixingWeights(T.documents(s, d), "source",
          tokenCount = size(words(col("text"))).cast(LongType))
          .orderBy(col("source")),
      Some("""
        WITH per AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS tokens
          FROM documents GROUP BY source),
        w AS (
          SELECT *, CAST(FLOOR(sqrt(tokens) * 1000000) AS BIGINT) AS raw_w FROM per),
        t AS (SELECT CAST(SUM(raw_w) AS BIGINT) AS total_w FROM w)
        SELECT source, n_docs, tokens,
               CAST(raw_w AS DOUBLE) / CAST(total_w AS DOUBLE) AS mix_weight,
               CAST(FLOOR(CAST(raw_w AS DOUBLE) / CAST(total_w AS DOUBLE) * 1000000) AS BIGINT) AS token_budget
        FROM w, t ORDER BY source""")),

    // ---- p19: near-dup cluster representative selection — the
    // keep-best half of a dedup pass: docs sharing an LSH bucket (the
    // band-0 minhash signature, same formulas as p02) form a cluster;
    // keep the longest member, doc_id tie-break. One map-side signature
    // computation + one window over the bucket key — no pairwise work
    // at all, which is what makes representative selection tractable at
    // corpus scale (connected-components refinement is an offline
    // graph job; the bucket proxy is the shard-local policy).
    QueryDef(
      "p19_cluster_representative",
      (s, d) =>
        clusterRepresentatives(T.documents(s, d), "doc_id", "text",
          score = col("n_chars"))
          .select(col("band_sig").as("sig"), col("n_members"),
            col("keep_id").as("keep_doc_id"), col("keep_score").as("kept_chars"))
          .orderBy(col("keep_doc_id")),
      Some(s"""
        WITH w AS (
          SELECT doc_id, n_chars, string_split_regex(text, '\\s+') AS ws
          FROM documents WHERE len(string_split_regex(text, '\\s+')) >= 5),
        sh AS (
          SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8) AS BIGINT) AS x
          FROM w, unnest(range(1, len(ws) - 3)) t(i)),
        params AS (
          SELECT i, 2*i + 1 AS a, 99991*i + 7 AS b FROM unnest(range(0, $BandRows)) t(i)),
        mh AS (
          SELECT doc_id, i, MIN((a*x + b) % $MinhashP) AS m
          FROM sh CROSS JOIN params GROUP BY doc_id, i),
        sig AS (
          SELECT doc_id, string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS sig
          FROM mh GROUP BY doc_id),
        c AS (
          SELECT s.sig, s.doc_id, w.n_chars,
                 COUNT(*) OVER (PARTITION BY s.sig) AS n_members,
                 ROW_NUMBER() OVER (PARTITION BY s.sig
                   ORDER BY w.n_chars DESC, s.doc_id ASC) AS rk
          FROM sig s JOIN w ON w.doc_id = s.doc_id)
        SELECT sig, CAST(n_members AS BIGINT) AS n_members,
               keep_doc_id, kept_chars
        FROM (SELECT sig, n_members, doc_id AS keep_doc_id,
                     n_chars AS kept_chars, rk FROM c)
        WHERE rk = 1 AND n_members > 1 ORDER BY keep_doc_id""")),

    // ---- p20: PII detection + redaction — the scrub stage every
    // training-data pipeline runs before anything else. Pure map-side
    // regex work (counts on the raw text, chained replacements for the
    // redacted form); the ONLY shuffle is the final presentation sort,
    // so the plan is embarrassingly parallel at any corpus size. The
    // synthetic corpus carries no digits at all, so PII-shaped tokens
    // (emails, a NANP phone, an IPv4) are injected deterministically
    // from doc_id on BOTH sides — the same synthesize-then-operate
    // trick t21 uses — making counts and the redacted-text hash a real
    // oracle rather than all-zeros.
    QueryDef(
      "p20_pii_scrub",
      (s, d) => {
        val id = col("doc_id")
        // coalesce: Spark's concat propagates NULL, DuckDB's skips it —
        // a NULL text row must not zero out the injected suffix
        val injected = concat(coalesce(col("text"), lit("")),
          when(id % 3 === 0, concat(
            lit(" contact user"), id.cast(StringType),
            lit("@mail.example.com or +1-555-"),
            lpad((id % 10000).cast(StringType), 4, "0"),
            lit(" from 10.0."), (id % 256).cast(StringType), lit(".1")))
            .otherwise(lit("")),
          when(id % 6 === 0, lit(" cc admin@corp.example.org"))
            .otherwise(lit("")))
        val redacted = PiiScrub.redact(injected)
        T.documents(s, d)
          .select(id +: PiiScrub.counts(injected) :+
            md5(redacted).as("redacted_hash") :+
            length(redacted).cast(LongType).as("redacted_len"): _*)
          .orderBy(id)
      },
      Some("""
        WITH inj AS (
          SELECT doc_id,
                 concat(text,
                   CASE WHEN doc_id % 3 = 0 THEN
                     concat(' contact user', CAST(doc_id AS VARCHAR),
                       '@mail.example.com or +1-555-',
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                       ' from 10.0.', CAST(doc_id % 256 AS VARCHAR), '.1')
                   ELSE '' END,
                   CASE WHEN doc_id % 6 = 0 THEN ' cc admin@corp.example.org'
                   ELSE '' END) AS t
          FROM documents),
        red AS (
          SELECT doc_id, t,
                 regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
          FROM inj),
        red2 AS (
          SELECT doc_id, t, t1,
                 regexp_replace(t1, '\+1-555-[0-9]{4,}', '<PHONE>', 'g') AS t2
          FROM red),
        red3 AS (
          SELECT doc_id, t, t1, t2,
                 regexp_replace(t2, '10\.0\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS r
          FROM red2)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t1, '\+1-555-[0-9]{4,}')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(t2, '10\.0\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
               md5(r) AS redacted_hash,
               CAST(length(r) AS BIGINT) AS redacted_len
        FROM red3 ORDER BY doc_id""")),

    // ---- p21: distributed k-means over the embedding corpus — the
    // real Lloyd's iterations p07's IVF stubs out with medoids. Each
    // iteration is the canonical scalable shape: broadcast the k×64
    // centroid table, assign map-side (argmin over k distances, ties to
    // the lowest cluster id), update with ONE k-row groupBy carrying 64
    // partial-aggregated sums — no explode, no per-dimension shuffle.
    // Cross-engine determinism: float sums are order-dependent, so each
    // element is scaled to an exact integer (round(x*1e7) — identical
    // IEEE ops in both engines), summed exactly (order-free), and the
    // mean is a single integer/integer double division. Centroids are
    // therefore bit-identical in Spark and DuckDB, and every distance
    // is a sequential per-row fold like p05-p07. Bound: long sums hold
    // while cluster_size × 1e7·max|x| < 2^63 — ~9e11 members at unit
    // norm; past that, widen the sums to DecimalType(38,0) (exactness
    // and order-freedom carry over; only the agg width changes).
    QueryDef(
      "p21_kmeans_cluster",
      (s, d) =>
        kmeansCluster(T.embeddings(s, d), "vec_id", "embedding",
          k = 4, dim = 64, iters = 2)
          .orderBy(col("vec_id")),
      Some {
        val K = 4; val Dim = 64
        s"""WITH e AS (SELECT vec_id, embedding AS emb FROM embeddings),
           |c0 AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
           |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
           |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= $K),
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "c1", "a1", Dim)},
           |${kmAssignSql("a2", "c1", Dim)},
           |${kmUpdateSql("u2", "c2", "a2", Dim)},
           |${kmAssignSql("a3", "c2", Dim)}
           |SELECT vec_id, cl AS cluster, d2,
           |       COUNT(*) OVER (PARTITION BY cl) AS n_members
           |FROM a3 ORDER BY vec_id""".stripMargin
      },
      headline = true),

    // ---- p24: distribution rebalancing — subsample the corpus to a
    // TARGET language mix (en 40%, de/fr/es/zh 15% each), the curation
    // step that fixes source skew before training. The max total
    // honoring the target is T = min_l floor(n_l·W/w_l) (integer-exact
    // with integer weights w_l summing to W); each language keeps its
    // floor(T·w_l/W) hash-first documents — selection is an md5 rank,
    // so the sample is deterministic and reproducible with NO RNG, like
    // p15. Plan shape: one tiny per-lang count agg, a scalar broadcast,
    // and one rank window partitioned by lang (parallel across
    // languages) — the single corpus shuffle any stratified pass needs.
    QueryDef(
      "p24_rebalance_sample",
      (s, d) =>
        rebalanceToMix(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id", "lang",
          weights = Seq("en" -> 40L, "de" -> 15L, "fr" -> 15L,
            "es" -> 15L, "zh" -> 15L))
          .orderBy(col("doc_id")),
      Some("""
        WITH w(lang, w) AS (VALUES
          ('en', 40), ('de', 15), ('fr', 15), ('es', 15), ('zh', 15)),
        docs AS (
          SELECT d.doc_id, d.lang, w.w FROM documents d JOIN w ON d.lang = w.lang),
        t AS (
          SELECT MIN(CAST(FLOOR(COALESCE(n, 0) * 100.0 / ww.w) AS BIGINT)) AS t
          FROM w ww LEFT JOIN
            (SELECT lang, COUNT(*) AS n FROM docs GROUP BY lang) c
            ON ww.lang = c.lang),
        ranked AS (
          SELECT doc_id, lang, w,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM docs)
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        FROM ranked, t
        WHERE rk <= CAST(FLOOR(t * w / 100.0) AS BIGINT)
        ORDER BY doc_id""")),

    // ---- p23: incremental dedup — admit an incoming shard against an
    // EXISTING corpus, the shape every continuously-ingesting pipeline
    // runs (p01/p02 dedup a closed corpus; ingest never sees one).
    // Two anti-joins: exact (content hash) then near-dup (band-0
    // minhash signature, p19's formulas — docs whose bucket already
    // exists in the corpus are dropped without any pairwise work). At
    // scale the corpus side reduces to its distinct hash/signature
    // sets — fixed-width keys, broadcastable for corpus sizes that fit
    // and a plain shuffle anti-join beyond; nothing is ever quadratic.
    // Fixture split: doc_id < 250 = corpus, >= 250 = incoming shard.
    QueryDef(
      "p23_incremental_dedup",
      (s, d) => {
        val all = T.documents(s, d)
        admitAgainstCorpus(
          corpus = all.filter(col("doc_id") < 250),
          incoming = all.filter(col("doc_id") >= 250),
          idCol = "doc_id", textCol = "text")
          .select(col("doc_id"), col("content_hash").as("h"),
            col("band_sig").as("sig"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, md5(text) AS h, string_split_regex(text, '\\s+') AS ws
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8) AS BIGINT) AS x
          FROM w, unnest(range(1, len(ws) - 3)) t(i)
          WHERE len(ws) >= 5),
        params AS (
          SELECT i, 2*i + 1 AS a, 99991*i + 7 AS b FROM unnest(range(0, $BandRows)) t(i)),
        mh AS (
          SELECT doc_id, i, MIN((a*x + b) % $MinhashP) AS m
          FROM sh CROSS JOIN params GROUP BY doc_id, i),
        sig AS (
          SELECT doc_id, string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS sig
          FROM mh GROUP BY doc_id),
        ds AS (
          SELECT w.doc_id, w.h, sig.sig
          FROM w LEFT JOIN sig ON w.doc_id = sig.doc_id)
        SELECT doc_id, h, sig FROM ds
        WHERE doc_id >= 250
          AND (h IS NULL OR h NOT IN
               (SELECT h FROM ds WHERE doc_id < 250 AND h IS NOT NULL))
          AND (sig IS NULL OR sig NOT IN
               (SELECT sig FROM ds WHERE doc_id < 250 AND sig IS NOT NULL))
        ORDER BY doc_id""")),

    // ---- p22: sequence packing — concatenate-and-chunk the token
    // stream into fixed context windows (L=512), the standard
    // pre-training data prep where documents may straddle chunk
    // boundaries. The global token offset is a TWO-PHASE prefix sum:
    // per-source running sums compute in parallel windows (source is
    // the shard key), and the tiny per-source totals table — one row
    // per source — carries the base offsets via broadcast. A single
    // global orderBy window would drag the whole corpus through ONE
    // partition; this shape never does. All-integer arithmetic, so the
    // oracle matches exactly.
    QueryDef(
      "p22_sequence_packing",
      (s, d) =>
        packSequences(T.documents(s, d), "doc_id", "source",
          size(words(col("text"))).cast(LongType), contextLen = 512)
          .orderBy(col("doc_id")),
      Some("""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tok
          FROM documents),
        r AS (
          SELECT *, SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS run FROM t),
        bb AS (
          SELECT source AS b_source,
                 CAST(SUM(total) OVER (ORDER BY source ROWS UNBOUNDED PRECEDING)
                   - total AS BIGINT) AS base
          FROM (SELECT source, SUM(tok) AS total FROM t GROUP BY source)),
        o AS (
          SELECT doc_id, r.source, tok, base + run - tok AS tok_offset
          FROM r JOIN bb ON r.source = bb.b_source)
        SELECT doc_id, source, tok, CAST(tok_offset AS BIGINT) AS tok_offset,
               CAST(FLOOR(tok_offset / 512) AS BIGINT) AS first_chunk,
               CAST(FLOOR((tok_offset + tok - 1) / 512) AS BIGINT) AS last_chunk,
               CAST(FLOOR((tok_offset + tok - 1) / 512) - FLOOR(tok_offset / 512) + 1 AS BIGINT) AS n_chunks
        FROM o ORDER BY doc_id""")),

    // ---- p25: connected components over the verified near-dup pair
    // graph — p02 emits PAIRS, but collapsing duplicates needs CLUSTERS
    // (a~b, b~c must keep one of {a,b,c}, not two). Component id = min
    // reachable doc_id via iterative min-label propagation: each round
    // is one join + one groupBy(min), and labels only ever decrease, so
    // the loop converges in graph-diameter rounds (near-dup components
    // are shallow — dup chains, not long paths). The driver-side loop
    // runs ONE count() per round purely as the convergence test; all
    // label state stays distributed, localCheckpoint'ed per round (see
    // [[connectedComponents]] — lineage truncation, not caching, is
    // what keeps the loop viable). At 100 TB this is the standard
    // DataFrame CC shape (hash-to-min); the oracle computes
    // ground-truth min-reachable via a recursive CTE, so the gate
    // proves the propagation converged.
    QueryDef(
      "p25_dedup_components",
      (s, d) => {
        sharedComponents(s, d)
          .withColumn("csize",
            count(lit(1)).over(Window.partitionBy(col("component"))))
          .select(col("node").as("doc_id"), col("component"), col("csize"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE $NeardupPairsSql,
        $ComponentsSql
        SELECT node AS doc_id, component,
               CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS csize
        FROM comp ORDER BY doc_id""")),

    // ---- p30: near-dup collapse — the end-to-end dedup deliverable
    // p01/p02/p25 build toward: keep exactly ONE representative (the
    // min doc_id) per near-dup component and pass every unpaired doc
    // through. One left-anti join of the corpus against the (tiny)
    // non-representative node set; at 100 TB the anti-join side is
    // the component table, which is bounded by the number of
    // near-duplicate docs, not the corpus.
    QueryDef(
      "p30_collapse_neardups",
      (s, d) =>
        collapseByComponents(
          T.documents(s, d).select(col("doc_id"), col("lang"), col("source")),
          "doc_id", sharedComponents(s, d))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH RECURSIVE $NeardupPairsSql,
        $ComponentsSql
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
        ORDER BY doc_id""")),

    // ---- p26: SimHash near-dup pairing by Hamming distance ≤ 3 over
    // p03's 48-bit fingerprints — the O(n) alternative to shingle-set
    // LSH when fingerprints are already materialized. Candidate
    // generation is the pigeonhole block trick (Manku et al., WWW'07
    // shape): split 48 bits into 4 chunks of 12; any pair within
    // Hamming 3 differs in at most 3 chunks, so it MUST agree on at
    // least one → groupBy (chunk-index, chunk-value) finds every such
    // pair with one shuffle of 4 rows/doc, never an all-pairs join.
    // Verification is one xor+bit_count per candidate. The oracle
    // replays the SAME pigeonhole candidate generation (chunk buckets
    // capped at LshBucketCap, mirroring the Spark side as p02/p06 do)
    // then verifies by xor — so the gate proves the two ENGINES agree,
    // cap semantics included, but no longer proves recall against
    // brute force by itself (a chunking mistake mirrored on both sides
    // would pass). The recall proof lives in TextApiSpec's randomized
    // simhashNeardupPairs-vs-brute-force test instead.
    QueryDef(
      "p26_simhash_neardup",
      (s, d) =>
        simhashNeardupPairs(T.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH $SimhashFpSql,
        chunks AS (
          SELECT f.doc_id, f.simhash, t.ck,
                 (f.simhash >> CAST(12 * t.ck AS INT)) & 4095 AS cv
          FROM fp f, range(0, 4) AS t(ck)),
        ok AS (
          SELECT ck, cv FROM chunks GROUP BY ck, cv
          HAVING COUNT(DISTINCT doc_id) <= $LshBucketCap)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM chunks a
        JOIN chunks b ON a.ck = b.ck AND a.cv = b.cv AND a.doc_id < b.doc_id
        JOIN ok ON ok.ck = a.ck AND ok.cv = a.cv
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY doc_a, doc_b"""),
      headline = true),

    // ---- p27: rare-bigram ratio — the share of a document's word
    // bigrams whose corpus document-frequency is ≤ RareBigramDf, a
    // fluency/quality signal (gibberish and OCR noise are rare-bigram
    // dense; fluent text reuses common collocations). All-integer
    // counts, so the double ratio is one exact int/int division in both
    // engines. Plan: one explode + groupBy(bigram) for the DF table,
    // one shuffle join back on bigram, one groupBy(doc) — the canonical
    // two-pass corpus-statistic shape; nothing is quadratic and the DF
    // table join is plain hash-partitioned at any scale.
    QueryDef(
      "p27_rare_bigram_ratio",
      (s, d) => {
        val bigrams = T.documents(s, d)
          .select(col("doc_id"), words(col("text")).as("ws"))
          .filter(size(col("ws")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("ws")) - 1),
              i => concat_ws(" ",
                element_at(col("ws"), i), element_at(col("ws"), i + 1))))
              .as("bg"))
        val dfTab = bigrams.groupBy(col("bg"))
          .agg(countDistinct(col("doc_id")).as("df"))
        bigrams.join(dfTab, Seq("bg"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(when(col("df") <= RareBigramDf, 1L).otherwise(0L))
              .as("n_rare"))
          .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
            (col("n_rare") / col("n_bigrams")).as("rare_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
          WHERE len(string_split_regex(text, '\\s+')) >= 2),
        bg AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
          FROM w, unnest(range(1, len(ws))) t(i)),
        dftab AS (
          SELECT bg, COUNT(DISTINCT doc_id) AS df FROM bg GROUP BY bg)
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN d.df <= $RareBigramDf THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
               SUM(CASE WHEN d.df <= $RareBigramDf THEN 1 ELSE 0 END) / COUNT(*) AS rare_ratio
        FROM bg b JOIN dftab d ON b.bg = d.bg
        GROUP BY b.doc_id ORDER BY b.doc_id""")),

    // ---- p28: characteristic terms — per-document keyword extraction
    // by an integer-only salience order (tf DESC, corpus-df ASC, term
    // ASC). The all-integer ranking is deliberate: a float tf·idf
    // needs ln(), whose last-ulp behavior differs between engines,
    // while this ordering is the same ranking logic with zero float
    // ops (df ASC plays the idf role at every tf tie). Production use
    // adds a df cap dropping ubiquitous terms before ranking (as p04
    // caps stop-grams); the fixture corpus has a 31-word vocabulary
    // where any such cap degenerates, so the registered query ranks
    // the full term set. Plan: groupBy(doc,term) → groupBy(term) →
    // term-keyed join + one window per doc — every stage
    // hash-partitioned on its key; the hot-term skew in the df join is
    // bounded because the tf table is already deduplicated per doc.
    QueryDef(
      "p28_characteristic_terms",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("doc_id"), explode(words(col("text"))).as("w"))
        val tf = toks.groupBy(col("doc_id"), col("w"))
          .agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        tf.join(dfT, Seq("w"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("tf").desc, col("df").asc, col("w").asc))
            .cast(LongType))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("w").as("term"), col("tf"), col("df"),
            col("rk"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, w
          FROM documents, unnest(string_split_regex(text, '\s+')) u(w)),
        tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
        dfx AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
        r AS (
          SELECT t.doc_id, t.w, t.tf, d.df,
                 ROW_NUMBER() OVER (PARTITION BY t.doc_id
                   ORDER BY t.tf DESC, d.df ASC, t.w ASC) AS rk
          FROM tf t JOIN dfx d USING (w))
        SELECT doc_id, w AS term, tf, df, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 3 ORDER BY doc_id, rk""")),

    // ---- p29: embedding outlier detection — the curation gate that
    // flags vectors far from their label's centroid (mislabeled or
    // corrupt embeddings). Centroids are the p21 exact-integer means
    // (bit-identical across engines); distances are the codegen'd
    // sequential fold; "outlier" = the top-3 largest distances per
    // label via one window, so no float aggregate ever crosses a
    // partition boundary. Plan: one k-row groupBy for centroids, a
    // broadcast join back, map-side distances, one window per label.
    QueryDef(
      "p29_embedding_outliers",
      (s, d) =>
        centroidOutliers(T.embeddings(s, d), "vec_id", "embedding",
          labelCol = "label", topK = 3, dim = 64)
          .select(col("label").cast(LongType).as("label"), col("vec_id"),
            col("d2"), col("rk"))
          .orderBy(col("label"), col("rk")),
      Some {
        val Dim = 64; val Scale = IntScale.toString
        val sumCols = (1 to Dim).map(i =>
          s"SUM(CAST(ROUND(CAST(embedding[$i] AS DOUBLE) * $Scale) AS BIGINT)) AS s$i")
          .mkString(", ")
        val meanList = (1 to Dim).map(i =>
          s"CAST(s$i AS DOUBLE) / CAST(cnt * $Scale AS DOUBLE)").mkString(", ")
        val d2 = s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> " +
          "(CAST(e.embedding[i] AS DOUBLE) - c.ce[i]) * " +
          "(CAST(e.embedding[i] AS DOUBLE) - c.ce[i])), (acc, x) -> acc + x)"
        s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
           |u AS (SELECT label, COUNT(*) AS cnt, $sumCols FROM e GROUP BY label),
           |c AS (SELECT label, [$meanList] AS ce FROM u),
           |r AS (
           |  SELECT e.label, e.vec_id, $d2 AS d2,
           |         ROW_NUMBER() OVER (PARTITION BY e.label
           |           ORDER BY $d2 DESC, e.vec_id ASC) AS rk
           |  FROM e JOIN c USING (label))
           |SELECT CAST(label AS BIGINT) AS label, vec_id, d2,
           |       CAST(rk AS BIGINT) AS rk
           |FROM r WHERE rk <= 3 ORDER BY label, rk""".stripMargin
      },
      headline = true),

    // ---- p31: leakage-safe train/val/test split — the assignment is
    // hashed from the near-dup COMPONENT representative, not the doc,
    // so a near-duplicate pair can never straddle train and test (the
    // classic eval-leakage bug a doc-hash split ships silently).
    // Singletons are their own component. RNG-free md5 split (like
    // p15/p24) at 80/10/10; one broadcast join against the component
    // table (bounded by the near-dup set), map-side hashing for the
    // corpus.
    QueryDef(
      "p31_leakage_safe_split",
      (s, d) => {
        splitByComponents(T.documents(s, d).select(col("doc_id")),
            "doc_id", sharedComponents(s, d))
          .select(col("doc_id"), col("component"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE $NeardupPairsSql,
        $ComponentsSql,
        assigned AS (
          SELECT d.doc_id,
                 COALESCE(c.component, d.doc_id) AS component,
                 CAST('0x' || substr(md5('split:' ||
                   CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)), 1, 8)
                   AS BIGINT) % 10 AS bucket
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
        SELECT doc_id, component,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'val'
                    ELSE 'test' END AS split
        FROM assigned ORDER BY doc_id""")),

    // ---- p32: repeated-passage detection — per-document share of word
    // 10-gram passages that also occur in ANOTHER document (the exact-
    // substring dedup signal of Lee et al., "Deduplicating Training Data
    // Makes Language Models Better", at passage granularity: boilerplate
    // headers, license blocks and templated text score high; original
    // prose scores 0). Passages are 48-bit kgram_hashes built map-side
    // (distinct per doc, so document frequency = distinct-doc count with
    // a plain COUNT); the plan is one explode + groupBy(passage-hash) df
    // table + one hash join back + one groupBy(doc) — the same two-pass
    // corpus-statistic shape as p27, linear at any scale, with all-
    // integer counts so the final ratio is one exact division.
    QueryDef(
      "p32_passage_dedup",
      (s, d) =>
        passageShareStats(T.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some(s"""
        WITH w AS (
          SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
          WHERE len(string_split_regex(text, '\\s+')) >= $PassageLen),
        p AS (
          SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+${PassageLen - 1}], ' ')), 1, 12) AS BIGINT) AS h
          FROM w, unnest(range(1, len(ws) - ${PassageLen - 2})) t(i)),
        dftab AS (SELECT h, COUNT(*) AS df FROM p GROUP BY h)
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_passages,
               CAST(SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) / COUNT(*) AS shared_ratio
        FROM p JOIN dftab d ON p.h = d.h
        GROUP BY p.doc_id ORDER BY p.doc_id""")),

    // ---- p33: dedup report — the component-size histogram every
    // dedup pass ships with its output (how much mass is duplicated,
    // and in what cluster shapes): components from the p25 graph,
    // grouped by size. docs_removed = what p30's collapse would drop.
    // Two tiny aggs on top of the component table; the oracle derives
    // the identical histogram from the recursive-CTE ground truth.
    QueryDef(
      "p33_dedup_report",
      (s, d) =>
        dedupReport(sharedComponents(s, d))
          .orderBy(col("csize")),
      Some(s"""
        WITH RECURSIVE $NeardupPairsSql,
        $ComponentsSql,
        sizes AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
          FROM comp GROUP BY component)
        SELECT csize, CAST(COUNT(*) AS BIGINT) AS n_components,
               CAST(SUM(csize) AS BIGINT) AS n_docs,
               CAST(SUM(csize) - COUNT(*) AS BIGINT) AS docs_removed
        FROM sizes GROUP BY csize ORDER BY csize""")),

    // ---- p34: the dedup SUITE as one shared-graph pass — the shape a
    // production pipeline actually ships: ONE minhash-pair + connected-
    // components build ([[sharedComponents]]) fanning out to the three
    // consumers ([[collapseByComponents]], [[splitByComponents]],
    // [[dedupReport]]) plus the component table itself, unioned into a
    // single sectioned result. p25/p30/p31/p33 gate each consumer in
    // isolation; this entry gates the FAN-OUT — all four sections must
    // agree with ONE oracle component table (`comp`, built once in the
    // CTE below and read by every section), proving the sharing API
    // returns the same answers as the standalone paths. At 100 TB the
    // graph build dominates every consumer, so running it once instead
    // of four times is most of the suite's cost — see the memo note on
    // [[sharedComponents]].
    // Sectioned layout (driver-scalar columns; k is the section's
    // natural key): 'component' → (k=node, v1=component);
    // 'collapse' → (k=kept doc_id); 'split' → (k=doc_id, v1=component,
    // s=split); 'report' → (k=csize, v1=n_components, v2=docs_removed;
    // n_docs = csize·n_components is derivable so it is not repeated).
    QueryDef(
      "p34_dedup_suite",
      (s, d) => {
        val comps = sharedComponents(s, d)
        val corpus = T.documents(s, d).select(col("doc_id"))
        val nullL = lit(null).cast(LongType)
        val nullS = lit(null).cast(StringType)
        val component = comps.select(
          lit("component").as("section"), col("node").as("k"),
          col("component").as("v1"), nullL.as("v2"), nullS.as("s"))
        val collapse = collapseByComponents(corpus, "doc_id", comps)
          .select(lit("collapse").as("section"), col("doc_id").as("k"),
            nullL.as("v1"), nullL.as("v2"), nullS.as("s"))
        val splits = splitByComponents(corpus, "doc_id", comps)
          .select(lit("split").as("section"), col("doc_id").as("k"),
            col("component").as("v1"), nullL.as("v2"), col("split").as("s"))
        val report = dedupReport(comps)
          .select(lit("report").as("section"), col("csize").as("k"),
            col("n_components").as("v1"), col("docs_removed").as("v2"),
            nullS.as("s"))
        component.unionByName(collapse).unionByName(splits)
          .unionByName(report)
          .orderBy(col("section"), col("k"))
      },
      Some(s"""
        WITH RECURSIVE $NeardupPairsSql,
        $ComponentsSql,
        sizes AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
          FROM comp GROUP BY component),
        assigned AS (
          SELECT d.doc_id,
                 COALESCE(c.component, d.doc_id) AS component,
                 CAST('0x' || substr(md5('split:' ||
                   CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)), 1, 8)
                   AS BIGINT) % 10 AS bucket
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
        SELECT 'component' AS section, node AS k, component AS v1,
               CAST(NULL AS BIGINT) AS v2, CAST(NULL AS VARCHAR) AS s
        FROM comp
        UNION ALL
        SELECT 'collapse', doc_id, NULL, NULL, NULL FROM documents
        WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
        UNION ALL
        SELECT 'split', doc_id, component, NULL,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket = 8 THEN 'val'
                    ELSE 'test' END
        FROM assigned
        UNION ALL
        SELECT 'report', csize, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(csize) - COUNT(*) AS BIGINT), NULL
        FROM sizes GROUP BY csize
        ORDER BY section, k""")),

    // ---- p35: deterministic k-means++ seeding — the cross-engine gate
    // for [[kmeansPlusPlusSeeds]]' D²-weighted draw. The selection is
    // where determinism is hardest (a single flipped comparison changes
    // every later seed), so the oracle replays the EXACT integer
    // machinery per round: d² to the nearest chosen seed (the proven
    // float-fold), round(d²·1e7) integer weights, the two-phase
    // (bucket, id)-ordered prefix sum, and the md5 threshold pick —
    // four seeds means three sequential picks, generated below as one
    // CTE chain. Output is the selection order and the chosen row ids.
    QueryDef(
      "p35_kmeanspp_seeds",
      (s, d) =>
        kmeansPlusPlusSeeds(T.embeddings(s, d), "vec_id", "embedding",
          k = 4, dim = 64)
          .select(col("cl"), col("vec_id"))
          .orderBy(col("cl")),
      Some {
        val K = 4
        s"""WITH ${kmppChainSql(K, 64)}
           |SELECT CAST(0 AS INT) AS cl, vec_id FROM s0
           |${(1 until K).map(j => s"UNION ALL SELECT $j, vec_id FROM p$j").mkString("\n")}
           |ORDER BY cl""".stripMargin
      }),

    // ---- p36: k-means‖ seeding — the cross-engine gate for
    // [[kmeansParallelSeeds]]. Three independently-failable stages are
    // each replayed exactly: (1) the per-round Bernoulli sample
    // (md5 56-bit uniform vs l·w/Σw — IEEE division/multiplication are
    // correctly rounded, so the comparison is engine-stable), (2) the
    // nearest-candidate weighting (strict-< first-minimum ≡ ORDER BY
    // (d², cl) rank 1), and (3) the driver-side weighted k-means++
    // reduction (BigInt mass intervals ≡ exact BIGINT/HUGEINT window
    // sums, md5 thresholds). k = 3, rounds = 2 keeps the CTE chain
    // readable while touching every stage at least twice.
    QueryDef(
      "p36_kmeanspar_seeds",
      (s, d) =>
        kmeansParallelSeeds(T.embeddings(s, d), "vec_id", "embedding",
          k = 3, dim = 64, rounds = 2)
          .select(col("cl"), col("vec_id"))
          .orderBy(col("cl")),
      Some {
        val K = 3
        s"""WITH ${kmparChainSql(K, rounds = 2, dim = 64)}
           |SELECT CAST(0 AS INT) AS cl, vec_id FROM s0
           |${(1 until K).map(j => s"UNION ALL SELECT $j, vec_id FROM p$j").mkString("\n")}
           |ORDER BY cl""".stripMargin
      }),

    // ---- p37: the trained-IVF path END-TO-END — [[ivfIndex]]
    // (k-means‖ seeding → one Lloyd's round → broadcast assignment)
    // composed with [[ivfSearch]] over its membership and TRAINED
    // centroids, in one driver-gated query: the library's flagship ANN
    // entry point (p07 searches precomputed labels with medoid
    // quantizers; this gates fit→assign→search as one plan). nprobe=2
    // exercises the multi-probe recall knob. The oracle replays the
    // whole chain: the p36 seeding CTEs (shared builder, seedRounds = 2 —
    // each round is two driver-synchronized corpus passes, and p36
    // gates the round machinery itself), the p21 Lloyd's update, the assignment,
    // and the float-cast centroid probe scoring.
    QueryDef(
      "p37_ivf_trained",
      (s, d) => {
        val e = T.embeddings(s, d)
        // the trained index comes from the shared memo: built once per
        // (app, dataDir), served to p37/p40/p41 (the production
        // pattern — index artifacts are trained once, then served;
        // p42 still prices a full standalone training chain)
        val art = sharedIvfPq(s, d)
        ivfSearch(
          e.select(col("vec_id"), col("embedding")).join(art.member, Seq("vec_id")),
          e.filter(col("vec_id") <= 4),
          "vec_id", "embedding", "cluster", k = 3, nprobe = 2,
          centroids = Some(art.cents))
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val K = 3; val Dim = 64
        s"""WITH ${kmparChainSql(K, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(K)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |eq AS MATERIALIZED (
           |  SELECT vec_id, emb, ${kmDotSql("emb", "emb")} AS n2 FROM e),
           |med AS (
           |  SELECT cl AS m_label, list_transform(ce, x -> CAST(x AS FLOAT)) AS me
           |  FROM cf),
           |med2 AS MATERIALIZED (
           |  SELECT m_label, me, ${kmDotSql("me", "me")} AS mn2 FROM med),
           |assigned AS MATERIALIZED (
           |  SELECT q.vec_id AS q_id, q.emb AS qe, q.n2 AS qn2,
           |         m.m_label AS probe_label
           |  FROM eq q, med2 m WHERE q.vec_id <= 4
           |  QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |    ${kmDotSql("q.emb", "m.me")} / (sqrt(q.n2) * sqrt(m.mn2)) DESC,
           |    m.m_label ASC) <= 2),
           |scored AS (
           |  SELECT a.q_id, a.probe_label, c.vec_id,
           |         ${kmDotSql("a.qe", "c.emb")} / (sqrt(a.qn2) * sqrt(c.n2)) AS cos_sim
           |  FROM assigned a
           |  JOIN mem m ON m.cl = a.probe_label
           |  JOIN eq c ON c.vec_id = m.vec_id AND c.vec_id <> a.q_id)
           |SELECT q_id, probe_label, vec_id, cos_sim,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p38: k-means++-seeded clustering — closes the seam between
    // [[kmeansPlusPlusSeeds]] (p35 gates the seed SELECTION alone) and
    // [[kmeansFit]]'s Lloyd's machinery: one fit at k = 3 with ONE
    // Lloyd's update, then assignment, so the driver certifies the
    // seeding COMPOSED with update/assign — not just the pieces. The
    // oracle chains the shared p35 seed replay into the shared p21
    // Lloyd's replay.
    QueryDef(
      "p38_kmeanspp_fit",
      (s, d) =>
        kmeansCluster(T.embeddings(s, d), "vec_id", "embedding",
          k = 3, dim = 64, iters = 1, seeding = "kmeans++")
          .orderBy(col("vec_id")),
      Some {
        val K = 3; val Dim = 64
        s"""WITH ${kmppChainSql(K, Dim)},
           |${kmSeedCentroidsSql(K)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("a2", "cf", Dim)}
           |SELECT vec_id, cl AS cluster, d2,
           |       COUNT(*) OVER (PARTITION BY cl) AS n_members
           |FROM a2 ORDER BY vec_id""".stripMargin
      }),

    // ---- p39: ANN recall evaluation — [[recallAtK]] of the p07 IVF
    // search against the p05 exact brute-force top-k, per query: the
    // metric an operator tunes nprobe with (recall@k is monotone in
    // nprobe; pick the smallest nprobe meeting the target). The oracle
    // composes the proven p05 and p07 CTE chains and replays the
    // hit-count join.
    QueryDef(
      "p39_ann_recall",
      (s, d) => {
        val e = T.embeddings(s, d)
        val queries = e.filter(col("vec_id") <= 4)
        recallAtK(
          ivfSearch(e, queries, "vec_id", "embedding",
            clusterCol = "label", k = 3),
          knnBruteCosine(e, queries, "vec_id", "embedding", k = 3))
          .orderBy(col("q_id"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, embedding,
                 list_reduce(list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) AS n2
          FROM embeddings),
        exact AS (
          SELECT q_id, vec_id FROM (
            SELECT q.vec_id AS q_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                     list_reduce(list_transform(range(1, len(q.embedding) + 1),
                       i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
                       (acc, x) -> acc + x) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
                     c.vec_id ASC) AS rk
            FROM e q, e c WHERE q.vec_id <= 4 AND c.vec_id <> q.vec_id) t
          WHERE rk <= 3),
        medoids AS (
          SELECT label AS m_label, embedding AS me, n2 AS mn2
          FROM e QUALIFY ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id ASC) = 1),
        assigned AS (
          SELECT q.vec_id AS q_id, q.embedding AS qe, q.n2 AS qn2, m.m_label AS probe_label
          FROM e q, medoids m WHERE q.vec_id <= 4
          QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
            list_reduce(list_transform(range(1, len(q.embedding) + 1),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(m.me[i] AS DOUBLE)),
              (acc, x) -> acc + x) / (sqrt(q.n2) * sqrt(m.mn2)) DESC, m.m_label ASC) = 1),
        approx AS (
          SELECT q_id, vec_id FROM (
            SELECT a.q_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY a.q_id ORDER BY
                     list_reduce(list_transform(range(1, len(a.qe) + 1),
                       i -> CAST(a.qe[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
                       (acc, x) -> acc + x) / (sqrt(a.qn2) * sqrt(c.n2)) DESC,
                     c.vec_id ASC) AS rk
            FROM assigned a JOIN e c ON c.label = a.probe_label AND c.vec_id <> a.q_id) t
          WHERE rk <= 3)
        SELECT ex.q_id, COUNT(*) AS n_exact,
               CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
               CAST(SUM(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS recall
        FROM exact ex LEFT JOIN approx ap
          ON ap.q_id = ex.q_id AND ap.vec_id = ex.vec_id
        GROUP BY ex.q_id ORDER BY ex.q_id""")),

    // ---- p40: product quantization end-to-end — [[pqTrain]] (m
    // per-subspace k-means codebooks) → [[pqEncode]] (m codes per
    // vector) → [[pqSearch]] (ADC: per-query lookup tables over the
    // codes scan). The oracle replays every stage: per-subspace min-id
    // seeds + one integer-exact Lloyd's update, argmin code
    // assignment, the m×ksub distance table, and the fixed-order
    // 4-term adist sum (left-associated in both engines, so the
    // doubles are bit-identical).
    QueryDef(
      "p40_pq_adc",
      (s, d) => {
        val e = T.embeddings(s, d)
        // codebooks + codes come from the shared memo (trained once,
        // served — see sharedIvfPq); the ADC scan is what this gate
        // exercises
        val art = sharedIvfPq(s, d)
        pqSearch(
          art.codes,
          e.filter(col("vec_id") <= 4), art.books,
          "vec_id", "embedding", k = 3, dim = 64, m = 4, ksub = 4)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val M = 4; val Sub = 16; val Ksub = 4
        s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
           |${(0 until M).map(pqSpaceSql(_, Sub, Ksub)).mkString(",\n")},
           |${(0 until M).map(pqDtSql(_, Sub)).mkString(",\n")},
           |scored AS (
           |  SELECT d0.q_id, v0.vec_id,
           |         d0.d2 + d1.d2 + d2_.d2 + d3.d2 AS adist
           |  FROM code_0 v0
           |  JOIN code_1 v1 ON v1.vec_id = v0.vec_id
           |  JOIN code_2 v2 ON v2.vec_id = v0.vec_id
           |  JOIN code_3 v3 ON v3.vec_id = v0.vec_id
           |  JOIN dt_0 d0 ON d0.code = v0.code
           |  JOIN dt_1 d1 ON d1.q_id = d0.q_id AND d1.code = v1.code
           |  JOIN dt_2 d2_ ON d2_.q_id = d0.q_id AND d2_.code = v2.code
           |  JOIN dt_3 d3 ON d3.q_id = d0.q_id AND d3.code = v3.code
           |  WHERE v0.vec_id <> d0.q_id)
           |SELECT q_id, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p41: IVF + PQ composed (the FAISS-style IVFPQ shape) — the
    // flagship scale path end-to-end in ONE gated plan: k-means‖-
    // seeded coarse quantizer (p37's chain), per-subspace PQ training
    // + encoding (p40's chains), then the multi-probe ADC scan that
    // touches only the probed clusters' CODES. Both scale levers
    // (cluster pruning × m-byte codes) are live in the gated query.
    QueryDef(
      "p41_ivfpq",
      (s, d) => {
        val e = T.embeddings(s, d)
        // the full artifact set (coarse index + codebooks + codes)
        // comes from the shared memo; this gate times the composed
        // probe-pruned ADC scan
        val art = sharedIvfPq(s, d)
        ivfpqSearch(art.member, art.codes, e.filter(col("vec_id") <= 4),
          art.cents, art.books, "vec_id", "embedding",
          k = 3, dim = 64, m = 4, ksub = 4, nprobe = 2)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val M = 4; val Sub = 16; val Ksub = 4; val Dim = 64
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |${(0 until M).map(pqSpaceSql(_, Sub, Ksub)).mkString(",\n")},
           |${(0 until M).map(pqDtSql(_, Sub)).mkString(",\n")},
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |scored AS (
           |  SELECT p.q_id, p.probe_label, v0.vec_id,
           |         d0.d2 + d1.d2 + d2_.d2 + d3.d2 AS adist
           |  FROM probes p
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN code_0 v0 ON v0.vec_id = mm.vec_id
           |  JOIN code_1 v1 ON v1.vec_id = v0.vec_id
           |  JOIN code_2 v2 ON v2.vec_id = v0.vec_id
           |  JOIN code_3 v3 ON v3.vec_id = v0.vec_id
           |  JOIN dt_0 d0 ON d0.q_id = p.q_id AND d0.code = v0.code
           |  JOIN dt_1 d1 ON d1.q_id = p.q_id AND d1.code = v1.code
           |  JOIN dt_2 d2_ ON d2_.q_id = p.q_id AND d2_.code = v2.code
           |  JOIN dt_3 d3 ON d3.q_id = p.q_id AND d3.code = v3.code
           |  WHERE v0.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p42: IVFADC with RESIDUAL encoding — the faithful Jégou §V
    // formulation: PQ codebooks train on r(v) = v − c(cluster(v)), so
    // codes describe the within-cell distribution the probe actually
    // scans, and each probe's lookup table is built on q − c(probe).
    // The oracle replays the residual construction (double subtract,
    // float round-trip), the per-subspace training over residuals,
    // and the per-(query, probe) distance tables.
    QueryDef(
      "p42_ivfpq_residual",
      (s, d) => {
        val e = T.embeddings(s, d)
        // DELIBERATELY standalone (no sharedIvfPq): p42 is the one ANN
        // gate still pricing a full training chain end-to-end, so the
        // index build cost stays visible in the sweep while p37/p40/
        // p41 time the serving path. The residual frame feeds FOUR
        // codebook fits + the encode — materialize it (and the index
        // artifacts) once; without the persists this gate re-derived
        // the coarse chain ~8x
        val (member0, cents0) = ivfIndex(e, "vec_id", "embedding",
          k = 3, dim = 64, iters = 1, seedRounds = 2)
        val member = member0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cents = cents0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val resid = pqResiduals(e, "vec_id", "embedding", member, cents).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val books = pqTrain(resid, "vec_id", "residual", dim = 64, m = 4,
          ksub = 4, iters = 1).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val codes = pqEncode(resid, "vec_id", "residual", books,
          dim = 64, m = 4)
        ivfpqSearch(member, codes, e.filter(col("vec_id") <= 4),
          cents, books, "vec_id", "embedding",
          k = 3, dim = 64, m = 4, ksub = 4, nprobe = 2, residual = true)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val M = 4; val Sub = 16; val Ksub = 4; val Dim = 64
        def dtr(j: Int): String =
          s"""dtr_$j AS MATERIALIZED (
             |  SELECT p.q_id, p.probe_label, c.code,
             |         ${pqD2SubSql(Sub, "p.qr", j * Sub, "c.ce")} AS d2
             |  FROM probes p CROSS JOIN cf_$j c)""".stripMargin
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |rs AS MATERIALIZED (
           |  SELECT mm.vec_id, mm.cl,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(mm.emb[i] AS DOUBLE) - c.ce[i] AS FLOAT)) AS emb
           |  FROM mem mm JOIN cf c ON c.cl = mm.cl),
           |${(0 until M).map(pqSpaceSql(_, Sub, Ksub, src = "rs")).mkString(",\n")},
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(qe[i] AS DOUBLE) - pce[i] AS FLOAT)) AS qr
           |  FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label, q.emb AS qe, c.ce AS pce,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |${(0 until M).map(dtr).mkString(",\n")},
           |scored AS (
           |  SELECT p.q_id, p.probe_label, v0.vec_id,
           |         d0.d2 + d1.d2 + d2_.d2 + d3.d2 AS adist
           |  FROM probes p
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN code_0 v0 ON v0.vec_id = mm.vec_id
           |  JOIN code_1 v1 ON v1.vec_id = v0.vec_id
           |  JOIN code_2 v2 ON v2.vec_id = v0.vec_id
           |  JOIN code_3 v3 ON v3.vec_id = v0.vec_id
           |  JOIN dtr_0 d0 ON d0.q_id = p.q_id AND d0.probe_label = p.probe_label AND d0.code = v0.code
           |  JOIN dtr_1 d1 ON d1.q_id = p.q_id AND d1.probe_label = p.probe_label AND d1.code = v1.code
           |  JOIN dtr_2 d2_ ON d2_.q_id = p.q_id AND d2_.probe_label = p.probe_label AND d2_.code = v2.code
           |  JOIN dtr_3 d3 ON d3.q_id = p.q_id AND d3.probe_label = p.probe_label AND d3.code = v3.code
           |  WHERE v0.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p43: overlapping text chunking — [[chunkText]] at 20-word
    // chunks / 5-word overlap (stride 15) over the fixture corpus, so
    // most docs emit several chunks and the tail-chunk rule is
    // exercised. The oracle replays the closed-form chunk count
    // (floor-division; the n < chunkWords branch is masked identically
    // by greatest(0, ·) in both engines), the slice windows, the
    // single-space re-join, AND the original-document char spans: the
    // word_spans kernel's offsets are recomputed in DuckDB by per-char
    // classification (a word START is a non-ws char at position 1 or
    // after a ws char; a word END mirrors it), so both engines must
    // agree on every chunk's citable (start_char, end_char).
    QueryDef(
      "p43_chunk_text",
      (s, d) =>
        chunkText(T.documents(s, d), "doc_id", "text",
          chunkWords = 20, overlapWords = 5)
          .orderBy(col("doc_id"), col("chunk_no")),
      Some("""
        WITH w AS (
          SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '') AS ws FROM documents),
        n AS (SELECT doc_id, text, ws, len(ws) AS n FROM w),
        sp AS MATERIALIZED (
          SELECT doc_id, ws, n,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = 1 OR substr(text, i - 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS starts,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = len(text) OR substr(text, i + 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS ends
          FROM n),
        c AS (
          SELECT doc_id, ws, n, starts, ends, CAST(i AS INT) AS chunk_no
          FROM sp, unnest(range(0, 1 + greatest(0, (n - 20 + 14) // 15))) t(i))
        SELECT doc_id, chunk_no,
               CAST(chunk_no AS BIGINT) * 15 AS start_word,
               CAST(least(20, n - chunk_no * 15) AS BIGINT) AS n_chunk_words,
               array_to_string(ws[chunk_no * 15 + 1 : chunk_no * 15 + 20], ' ') AS chunk_text,
               starts[chunk_no * 15 + 1] AS start_char,
               ends[chunk_no * 15 + least(20, n - chunk_no * 15)] AS end_char
        FROM c ORDER BY doc_id, chunk_no""")),

    // ---- p44: exact-count stratified split — [[stratifiedSplit]] by
    // language at 80/10/10. The oracle replays the md5 rank order and
    // the double-product floor thresholds (CAST(0.8 AS DOUBLE): a bare
    // 0.8 literal is DECIMAL in DuckDB and its exact product can
    // disagree with the IEEE double floor at some n).
    QueryDef(
      "p44_stratified_split",
      (s, d) =>
        stratifiedSplit(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id", "lang", trainFrac = 0.8, valFrac = 0.1)
          .orderBy(col("doc_id")),
      Some("""
        WITH docs AS (SELECT doc_id, lang FROM documents),
        n AS (SELECT lang, COUNT(*) AS n FROM docs GROUP BY lang),
        ranked AS (
          SELECT d.doc_id, d.lang,
                 ROW_NUMBER() OVER (PARTITION BY d.lang
                   ORDER BY md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
          FROM docs d)
        SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk,
               CASE WHEN r.rk <= FLOOR(CAST(0.8 AS DOUBLE) * n.n) THEN 'train'
                    WHEN r.rk <= FLOOR(CAST(0.8 AS DOUBLE) * n.n)
                                 + FLOOR(CAST(0.1 AS DOUBLE) * n.n) THEN 'val'
                    ELSE 'test' END AS split
        FROM ranked r JOIN n ON n.lang = r.lang
        ORDER BY doc_id""")),

    // ---- p45: the Gopher quality-rule pack — [[gopherQualitySignals]]
    // at minWords = 20 / minStopwords = 1 (the fixture's ~45-word
    // synthetic docs then split 367/133 pass/fail, so the threshold
    // conjunction flips BOTH ways in the gated output; the other
    // thresholds are the paper's). The oracle recomputes every signal
    // from the same token/line definitions and replays the
    // conjunction.
    QueryDef(
      "p45_gopher_rules",
      (s, d) =>
        gopherQualitySignals(
          T.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", minWords = 20, minStopwords = 1)
          .select(col("doc_id"), col("n_words"), col("mean_word_len"),
            col("symbol_ratio"), col("bullet_ratio"), col("ellipsis_ratio"),
            col("alpha_ratio"), col("n_stopwords"), col("pass"))
          .orderBy(col("doc_id")),
      Some("""
        WITH w AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws,
                 string_split(text, chr(10)) AS ls
          FROM documents),
        sig AS (
          SELECT doc_id,
            CAST(len(ws) AS BIGINT) AS n_words,
            CASE WHEN len(ws) > 0 THEN
              CAST(list_reduce(list_transform(ws, x -> len(x)), (a, b) -> a + b) AS DOUBLE)
                / len(ws) END AS mean_word_len,
            CASE WHEN len(ws) > 0 THEN
              CAST(len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
                / len(ws) END AS symbol_ratio,
            CAST(len(list_filter(ls, x -> regexp_matches(x, '^\s*[-*•]'))) AS DOUBLE)
              / len(ls) AS bullet_ratio,
            CAST(len(list_filter(ls, x -> regexp_matches(x, '(\.\.\.|…)\s*$'))) AS DOUBLE)
              / len(ls) AS ellipsis_ratio,
            CASE WHEN len(ws) > 0 THEN
              CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                / len(ws) END AS alpha_ratio,
            CAST((CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'the') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'be') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'to') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'of') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'and') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'that') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'have') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_transform(ws, x -> lower(x)), 'with') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_stopwords
          FROM w)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
               ellipsis_ratio, alpha_ratio, n_stopwords,
               (n_words >= 20 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.1
                AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
                AND n_stopwords >= 1) AS pass
        FROM sig ORDER BY doc_id""")),

    // ---- p46: sparse top-k retrieval — [[capPostingsByDf]] →
    // [[sparseTopK]] over term-frequency postings built from the
    // fixture corpus (term = word, weight = tf), queried by the first
    // five documents' own postings: the production inverted-index
    // chain — stop-term posting lists pruned first (maxDf = 395 drops
    // the corpus's 4 most ubiquitous terms at sf0.01), then the
    // scatter-gather join, scored engine-exactly through the decimal
    // accumulator. The oracle builds the identical postings, replays
    // the df cap, and then the join + dsum + rank over the SURVIVING
    // terms — certifying both that over-cap terms drop and that
    // surviving-term scores are untouched by the cap.
    QueryDef(
      "p46_sparse_topk",
      (s, d) => {
        val tf = T.documents(s, d)
          .select(col("doc_id"),
            explode(array_remove(words(col("text")), "")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).cast(DoubleType).as("weight"))
        val capped = capPostingsByDf(tf, maxDf = 395)
        sparseTopK(capped, capped.filter(col("doc_id") <= 4), k = 3)
          .orderBy(col("q_id"), col("rk"))
      },
      Some(s"""
        WITH tf AS (
          SELECT doc_id, w AS term, CAST(COUNT(*) AS DOUBLE) AS weight
          FROM (SELECT doc_id, unnest(list_filter(
                  string_split_regex(text, '\\s+'), x -> x <> '')) AS w
                FROM documents)
          GROUP BY doc_id, w),
        over AS (SELECT term FROM tf GROUP BY term HAVING COUNT(*) > 395),
        ctf AS (SELECT * FROM tf
                WHERE term NOT IN (SELECT term FROM over)),
        scored AS (
          SELECT q.doc_id AS q_id, c.doc_id,
                 ${graft.QueryDef.dsumSql("c.weight * q.weight")} AS score
          FROM ctf c JOIN ctf q ON q.term = c.term
          WHERE q.doc_id <= 4 AND c.doc_id <> q.doc_id
          GROUP BY q.doc_id, c.doc_id)
        SELECT q_id, doc_id, score,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY score DESC, doc_id ASC) AS INT) AS rk
        FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""")),

    // ---- p47: n-gram eval-set decontamination — [[ngramDecontaminate]]
    // with the production 13-gram recipe (GPT-3 App. C): every tenth
    // doc_id stands in for the benchmark suite, the rest is the
    // training corpus, and each training doc is flagged iff it shares
    // any distinct word-13-gram with the suite. The eval side collapses
    // to ONE sorted rolling-hash array that broadcasts; the corpus
    // side is a single map pass (kgram_roll_hashes_all →
    // any_in_sorted binary search) — no explode, no join, no shuffle.
    // The oracle replays the rolling arithmetic (per-word md5 prefixes
    // × spliced B-power literals, summed mod 2⁶¹−1 in HUGEINT) and
    // the membership in DuckDB.
    QueryDef(
      "p47_ngram_decontaminate",
      (s, d) => {
        val all = T.documents(s, d)
        ngramDecontaminate(
          corpus = all.filter(col("doc_id") % 10 =!= 0),
          evalSet = all.filter(col("doc_id") % 10 === 0),
          textCol = "text", n = 13)
          .select(col("doc_id"), col("lang"), col("contaminated"))
          .orderBy(col("doc_id"))
      },
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 12)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d AS (
          SELECT doc_id, lang, list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '') AS ws
          FROM documents),
        w AS (SELECT doc_id, ws, len(ws) AS n FROM d WHERE len(ws) >= 13),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) AS HUGEINT) AS h
          FROM w, unnest(range(1, n + 1)) t(i)),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT DISTINCT w0.doc_id,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 12
          JOIN pw ON pw.e = 12 - (w2.i - w0.i)
          WHERE w0.i <= w0.n - 12
          GROUP BY w0.doc_id, w0.i),
        ev AS (SELECT DISTINCT h FROM g WHERE doc_id % 10 = 0),
        hit AS (SELECT DISTINCT doc_id FROM g JOIN ev USING (h)
                WHERE doc_id % 10 <> 0)
        SELECT d.doc_id, d.lang,
               (d.doc_id IN (SELECT doc_id FROM hit)) AS contaminated
        FROM d WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id"""
      }),

    // ---- p48: C4 line-level cleaning — [[c4CleanLines]] (Raffel'20
    // §2.2). The fixture corpus is punctuation-free word soup, so the
    // gate first lays each doc out as a deterministic PAGE both
    // engines construct identically: 8-word lines, line i suffixed
    // '.' / '' / '?' by i mod 3 (so the terminal-punctuation rule
    // genuinely splits lines), a "javascript" line appended on every
    // 41st doc (line ban) and a "lorem ipsum" line on every 37th
    // (page ban). The operator then runs UNMODIFIED on the page and
    // the oracle replays both the construction and every rule:
    // punctuation/word-count/line-ban retention, cleaned-text
    // sentence count, and the page verdict.
    QueryDef(
      "p48_c4_clean",
      (s, d) => {
        val ws = array_remove(words(col("text")), "")
        val nl = greatest(ceil(size(ws) / lit(8.0)).cast(IntegerType), lit(1))
        val lines = transform(sequence(lit(0), nl - 1), i =>
          concat(array_join(slice(ws, i * 8 + 1, lit(8)), " "),
            when(i % 3 === 0, ".").when(i % 3 === 1, "").otherwise("?")))
        val page = concat(array_join(lines, "\n"),
          when(col("doc_id") % 41 === 0,
            "\nthe page mentions javascript in this long line.").otherwise(""),
          when(col("doc_id") % 37 === 0,
            "\nlorem ipsum dolor sit amet padding line.").otherwise(""))
        c4CleanLines(
          T.documents(s, d).select(col("doc_id"), page.as("page")),
          "doc_id", "page")
          .select(col("doc_id"), col("n_lines"), col("n_kept_lines"),
            col("n_sentences"), col("keep"), col("cleaned_text"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS ws FROM documents),
        pg AS MATERIALIZED (
          SELECT doc_id,
                 array_to_string(list_transform(range(0,
                     greatest(CAST(ceil(len(ws) / 8.0) AS INT), 1)), i ->
                   coalesce(array_to_string(ws[i*8+1 : i*8+8], ' '), '') ||
                   CASE WHEN i % 3 = 0 THEN '.'
                        WHEN i % 3 = 1 THEN '' ELSE '?' END), chr(10)) ||
                 CASE WHEN doc_id % 41 = 0
                      THEN chr(10) || 'the page mentions javascript in this long line.'
                      ELSE '' END ||
                 CASE WHEN doc_id % 37 = 0
                      THEN chr(10) || 'lorem ipsum dolor sit amet padding line.'
                      ELSE '' END AS page
          FROM w),
        ln AS MATERIALIZED (
          SELECT doc_id, page,
                 list_transform(string_split(page, chr(10)), l -> trim(l)) AS lines
          FROM pg),
        cl AS MATERIALIZED (
          SELECT doc_id, page, lines,
                 list_filter(lines, t ->
                   regexp_matches(t, '[.!?"”]$')
                   AND len(list_filter(string_split_regex(t, '\s+'),
                                       x -> x <> '')) >= 5
                   AND NOT contains(lower(t), 'javascript')) AS kept
          FROM ln),
        sig AS (
          SELECT doc_id,
                 CAST(len(lines) AS BIGINT) AS n_lines,
                 CAST(len(kept) AS BIGINT) AS n_kept_lines,
                 CAST(len(regexp_extract_all(array_to_string(kept, chr(10)),
                   '[.!?]')) AS BIGINT) AS n_sentences,
                 array_to_string(kept, chr(10)) AS cleaned_text,
                 page
          FROM cl)
        SELECT doc_id, n_lines, n_kept_lines, n_sentences,
               (n_sentences >= 3
                AND NOT contains(lower(page), 'lorem ipsum')
                AND NOT contains(lower(page), '{')) AS keep,
               cleaned_text
        FROM sig ORDER BY doc_id""")),

    // ---- p49: DSIR importance scores — [[dsirImportanceScores]] with
    // every fifth doc_id as the quality TARGET and the rest as the raw
    // pool: the hashed unigram+bigram importance-resampling recipe
    // (Xie NeurIPS'23). The oracle replays the whole chain — the
    // non-distinct gram hashing, the mod-8192 feature buckets, both
    // smoothed profiles, the 1e-9-quantized log ratios, and the
    // decimal-exact per-doc sum.
    QueryDef(
      "p49_dsir_scores",
      (s, d) => {
        val all = T.documents(s, d)
        dsirImportanceScores(
          raw = all.filter(col("doc_id") % 5 =!= 0),
          target = all.filter(col("doc_id") % 5 === 0),
          idCol = "doc_id", textCol = "text")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $DsirChainSql
        SELECT doc_id, n_grams, dsir_logratio
        FROM scores ORDER BY doc_id""")),

    // ---- p51: DSIR importance RESAMPLING — [[resampleByImportance]]
    // composed on the p49 scores: the Gumbel-top-k draw that actually
    // selects the k training docs, with the RNG-free md5 Gumbel term.
    // The oracle replays the p49 chain (shared CTE body) plus the
    // uniform, the quantized Gumbel key, and the top-k rank.
    QueryDef(
      "p51_dsir_resample",
      (s, d) => {
        val all = T.documents(s, d)
        resampleByImportance(
          dsirImportanceScores(
            raw = all.filter(col("doc_id") % 5 =!= 0),
            target = all.filter(col("doc_id") % 5 === 0),
            idCol = "doc_id", textCol = "text"),
          "doc_id", "dsir_logratio", k = 50)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH $DsirChainSql,
        keyed AS (
          SELECT doc_id, n_grams, dsir_logratio,
                 dsir_logratio / 1.0 + round(-ln(-ln(
                   (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) + 0.5)
                     / 281474976710656.0)), 9) AS gumbel_key
          FROM scores)
        SELECT doc_id, n_grams, dsir_logratio, gumbel_key
        FROM keyed
        QUALIFY ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id ASC) <= 50
        ORDER BY doc_id""")),

    // ---- p50: SQ8 scalar quantization end-to-end — [[sqTrain]] (per-
    // dimension bounds) → [[sqEncode]] (8-bit levels) → [[sqSearch]]
    // (asymmetric decode-in-the-scan L2): the simplest rung of the
    // compression ladder next to the PQ gates (4× smaller vectors, no
    // codebook training). The oracle replays the bounds agg, the
    // clamped HALF-UP level assignment, the float-rounded decode, and
    // the sequential-fold distance — bit-exact across engines.
    QueryDef(
      "p50_sq8_adc",
      (s, d) => {
        val e = T.embeddings(s, d)
        // bounds feed encode AND search; 64 rows — materialize once
        val bounds = sqTrain(e, "vec_id", "embedding", dim = 64)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sqSearch(
          sqEncode(e, "vec_id", "embedding", bounds, dim = 64),
          e.filter(col("vec_id") <= 4), bounds,
          "vec_id", "embedding", k = 3, dim = 64)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val Dim = 64
        s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
           |b AS MATERIALIZED (
           |  SELECT i AS pos, min(emb[i]) AS mn, max(emb[i]) AS mx
           |  FROM e, unnest(range(1, ${Dim + 1})) t(i) GROUP BY i),
           |ba AS (SELECT array_agg(mn ORDER BY pos) AS mns,
           |              array_agg(mx ORDER BY pos) AS mxs FROM b),
           |codes AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CASE WHEN CAST(mxs[i] AS DOUBLE) > CAST(mns[i] AS DOUBLE)
           |      THEN least(255, greatest(0, CAST(round(
           |        (CAST(emb[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) /
           |        (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) * 255) AS INT)))
           |      ELSE 0 END) AS codes
           |  FROM e CROSS JOIN ba),
           |dec AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CAST(mns[i] AS DOUBLE) + CAST(codes[i] AS DOUBLE) / 255.0 *
           |      (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE))) AS dv
           |  FROM codes CROSS JOIN ba),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id,
           |         ${kmD2Sql(Dim, "q.emb", "c.dv")} AS adist
           |  FROM e q CROSS JOIN dec c
           |  WHERE q.vec_id <= 4 AND c.vec_id <> q.vec_id)
           |SELECT q_id, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p52: global paragraph dedup — [[dedupParagraphsGlobal]]
    // (CCNet boilerplate removal). Pages are the p48-style synthesized
    // layout (8-word '.'-suffixed lines) with the SAME cookie-banner
    // boilerplate line appended to EVERY page: exactly the shape the
    // operator exists for — the banner survives only in the lowest
    // doc_id, and naturally-shared aligned chunks between near-dup
    // fixture docs dedup too. The oracle replays the layout, the
    // first-occurrence window, the whitespace-line exemption, and the
    // per-doc rebuild.
    QueryDef(
      "p52_paragraph_dedup",
      (s, d) => {
        val ws = array_remove(words(col("text")), "")
        val nl = greatest(ceil(size(ws) / lit(8.0)).cast(IntegerType), lit(1))
        val lines = transform(sequence(lit(0), nl - 1), i =>
          concat(array_join(slice(ws, i * 8 + 1, lit(8)), " "), lit(".")))
        val page = concat(array_join(lines, "\n"),
          lit("\naccept cookies to continue reading this website today."))
        dedupParagraphsGlobal(
          T.documents(s, d).select(col("doc_id"), page.as("page")),
          "doc_id", "page")
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS ws FROM documents),
        pg AS MATERIALIZED (
          SELECT doc_id,
                 array_to_string(list_transform(range(0,
                     greatest(CAST(ceil(len(ws) / 8.0) AS INT), 1)), i ->
                   coalesce(array_to_string(ws[i*8+1 : i*8+8], ' '), '') || '.'), chr(10)) ||
                 chr(10) || 'accept cookies to continue reading this website today.' AS page
          FROM w),
        l AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) - 1 AS line_no, lines[i] AS line
          FROM (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pg),
               unnest(range(1, len(lines) + 1)) t(i)),
        ne AS (
          SELECT doc_id, line_no, line,
                 ROW_NUMBER() OVER (PARTITION BY line
                   ORDER BY doc_id, line_no) AS rk
          FROM l WHERE trim(line) <> ''),
        kept AS (
          SELECT doc_id, line_no, line FROM ne WHERE rk = 1
          UNION ALL
          SELECT doc_id, line_no, line FROM l WHERE trim(line) = ''),
        reb AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept_lines,
                 array_to_string(array_agg(line ORDER BY line_no), chr(10)) AS text_deduped
          FROM kept GROUP BY doc_id),
        base AS (
          SELECT doc_id,
                 CAST(len(string_split(page, chr(10))) AS BIGINT) AS n_lines
          FROM pg)
        SELECT base.doc_id, base.n_lines,
               coalesce(n_kept_lines, 0) AS n_kept_lines,
               coalesce(text_deduped, '') AS text_deduped
        FROM base LEFT JOIN reb USING (doc_id) ORDER BY base.doc_id""")),

    // ---- p53: BPE pair statistics — the distributed CORE of
    // [[bpeTrain]]'s merge rounds (word-frequency dictionary → symbol
    // pairs weighted by word count → global ranking) as one gated
    // plan: the top-10 first-round merge candidates over the fixture
    // corpus, ties broken (count desc, pair asc) exactly as training
    // breaks them. The iterative loop itself is spec-gated against a
    // sequential reference (BpeSpec); this pins the aggregation that
    // every round runs cross-engine.
    QueryDef(
      "p53_bpe_pair_stats",
      (s, d) => {
        // the SAME helpers the bpeTrain loop runs — the gate pins the
        // trained aggregation itself, not a hand-copied twin
        bpePairCounts(bpeInitDict(T.documents(s, d), "text"))
          .select(col("l").as("left"), col("r").as("right"),
            col("pc").as("pair_count"))
          .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
          .limit(10)
          .withColumn("rk", row_number().over(Window.orderBy(
            col("pair_count").desc, col("left").asc, col("right").asc)))
      },
      Some("""
        WITH d AS (
          SELECT w, COUNT(*) AS cnt FROM (
            SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS w FROM documents)
          GROUP BY w),
        sy AS (
          SELECT cnt, list_append(list_transform(range(1, length(w) + 1),
                   i -> substr(w, i, 1)), '</w>') AS syms
          FROM d),
        pr AS (
          SELECT syms[i] AS "left", syms[i + 1] AS "right", SUM(cnt) AS pair_count
          FROM sy, unnest(range(1, len(syms))) t(i)
          GROUP BY 1, 2)
        SELECT "left", "right", CAST(pair_count AS BIGINT) AS pair_count,
               CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC,
                 "left" ASC, "right" ASC) AS INT) AS rk
        FROM pr
        ORDER BY pair_count DESC, "left" ASC, "right" ASC LIMIT 10""")),

    // ---- p54: IVF + SQ8 composed — [[ivfSqSearch]] entirely over the
    // shared memoized artifacts (coarse index + SQ bounds/codes now
    // both live in [[sharedIvfPq]] — r11 retrained the SQ chain per
    // gate): probe pruning × scalar compression, the most deployed
    // compressed-index layout; the gate times the SERVING scan, p50
    // still prices a standalone SQ train/encode chain. The oracle
    // replays the coarse chain (p37's CTEs), the SQ chain (p50's
    // CTEs), the probe selection, and the decode-distance scan over
    // probed cells only.
    QueryDef(
      "p54_ivfsq",
      (s, d) => {
        val e = T.embeddings(s, d)
        val art = sharedIvfPq(s, d)
        ivfSqSearch(art.member, art.sqCodes,
          e.filter(col("vec_id") <= 4), art.cents, art.sqBounds,
          "vec_id", "embedding", k = 3, dim = 64, nprobe = 2)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val Dim = 64
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |b AS MATERIALIZED (
           |  SELECT i AS pos, min(emb[i]) AS mn, max(emb[i]) AS mx
           |  FROM e, unnest(range(1, ${Dim + 1})) t(i) GROUP BY i),
           |ba AS (SELECT array_agg(mn ORDER BY pos) AS mns,
           |              array_agg(mx ORDER BY pos) AS mxs FROM b),
           |sqc AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CASE WHEN CAST(mxs[i] AS DOUBLE) > CAST(mns[i] AS DOUBLE)
           |      THEN least(255, greatest(0, CAST(round(
           |        (CAST(emb[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) /
           |        (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) * 255) AS INT)))
           |      ELSE 0 END) AS codes
           |  FROM e CROSS JOIN ba),
           |dec AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CAST(mns[i] AS DOUBLE) + CAST(codes[i] AS DOUBLE) / 255.0 *
           |      (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE))) AS dv
           |  FROM sqc CROSS JOIN ba),
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |scored AS (
           |  SELECT p.q_id, p.probe_label, dv.vec_id,
           |         ${kmD2Sql(Dim, "q.emb", "dv.dv")} AS adist
           |  FROM probes p
           |  JOIN e q ON q.vec_id = p.q_id
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN dec dv ON dv.vec_id = mm.vec_id
           |  WHERE dv.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p55: IVF-SQ8 with RESIDUAL encoding — FAISS's by_residual
    // default for IndexIVFScalarQuantizer: bounds and codes train on
    // r(v) = v − c(cluster(v)) (the within-cell distribution the probe
    // actually scans — tighter bounds → finer 8-bit levels), and each
    // probe's query side becomes q − c(probe). The oracle replays the
    // coarse chain, the residual frame (p42's construction), the
    // residual bounds/encode/decode, the per-probe query residuals,
    // and the pruned decode-distance scan.
    QueryDef(
      "p55_ivfsq_residual",
      (s, d) => {
        val e = T.embeddings(s, d)
        val art = sharedIvfPq(s, d)
        ivfSqSearch(art.member, art.sqCodesResid,
          e.filter(col("vec_id") <= 4), art.cents, art.sqBoundsResid,
          "vec_id", "embedding", k = 3, dim = 64, nprobe = 2,
          residual = true)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val Dim = 64
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |rs AS MATERIALIZED (
           |  SELECT mm.vec_id, mm.cl,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(mm.emb[i] AS DOUBLE) - c.ce[i] AS FLOAT)) AS emb
           |  FROM mem mm JOIN cf c ON c.cl = mm.cl),
           |b AS MATERIALIZED (
           |  SELECT i AS pos, min(emb[i]) AS mn, max(emb[i]) AS mx
           |  FROM rs, unnest(range(1, ${Dim + 1})) t(i) GROUP BY i),
           |ba AS (SELECT array_agg(mn ORDER BY pos) AS mns,
           |              array_agg(mx ORDER BY pos) AS mxs FROM b),
           |sqc AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CASE WHEN CAST(mxs[i] AS DOUBLE) > CAST(mns[i] AS DOUBLE)
           |      THEN least(255, greatest(0, CAST(round(
           |        (CAST(emb[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) /
           |        (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) * 255) AS INT)))
           |      ELSE 0 END) AS codes
           |  FROM rs CROSS JOIN ba),
           |dec AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CAST(mns[i] AS DOUBLE) + CAST(codes[i] AS DOUBLE) / 255.0 *
           |      (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE))) AS dv
           |  FROM sqc CROSS JOIN ba),
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(qe[i] AS DOUBLE) - pce[i] AS FLOAT)) AS qr
           |  FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label, q.emb AS qe, c.ce AS pce,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |scored AS (
           |  SELECT p.q_id, p.probe_label, dv.vec_id,
           |         ${kmD2Sql(Dim, "p.qr", "dv.dv")} AS adist
           |  FROM probes p
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN dec dv ON dv.vec_id = mm.vec_id
           |  WHERE dv.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p56: GLOBAL exact substring dedup — [[dedupSubstringsGlobal]]
    // (Lee et al. 2022 ExactSubstr) at minLen = 10 over the fixture
    // corpus (where ~10% of docs share aligned near-dup runs, so both
    // the cut and the byte-identical-passthrough branches carry rows).
    // The oracle replays the positioned ROLLING gram hashes (per-word
    // 48-bit md5 prefixes × spliced B-power literals, summed mod
    // 2⁶¹−1 in HUGEINT — bit-identical to the O(n) sliding kernel),
    // the global first-occurrence rule (ROW_NUMBER over h ≡
    // min(struct)), the gaps-and-islands window merge (≡
    // cutIntervals), the kept-run complement, and the word_spans
    // char-offset excision (the p43 per-char classification).
    QueryDef(
      "p56_substring_dedup",
      (s, d) =>
        dedupSubstringsGlobal(T.documents(s, d), "doc_id", "text",
          minLen = 10)
          .orderBy(col("doc_id")),
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 9)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d AS (
          SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '') AS ws
          FROM documents),
        nn AS MATERIALIZED (SELECT doc_id, text, ws, len(ws) AS n FROM d),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) AS HUGEINT) AS h
          FROM nn, unnest(range(1, n + 1)) t(i)
          WHERE n >= 10),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT w0.doc_id, CAST(w0.i - 1 AS INT) AS pos,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 9
          JOIN pw ON pw.e = 9 - (w2.i - w0.i)
          JOIN nn ON nn.doc_id = w0.doc_id
          WHERE w0.i <= nn.n - 9
          GROUP BY w0.doc_id, w0.i),
        f AS (
          SELECT doc_id, pos,
                 ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk,
                 COUNT(*) OVER (PARTITION BY h) AS cnt
          FROM g),
        flg AS MATERIALIZED (SELECT doc_id, pos FROM f WHERE cnt >= 2 AND rk > 1),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 10
                      THEN 0 ELSE 1 END AS brk
          FROM flg),
        grp AS (
          SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
          FROM isl),
        cuts AS MATERIALIZED (
          SELECT doc_id, CAST(MIN(pos) AS INT) AS cs,
                 CAST(MAX(pos) + 10 AS INT) AS ce
          FROM grp GROUP BY doc_id, gid),
        runs AS MATERIALIZED (
          SELECT doc_id, a, b FROM (
            SELECT doc_id,
                   COALESCE(LAG(ce) OVER (PARTITION BY doc_id ORDER BY cs), 0) AS a,
                   cs AS b
            FROM cuts) WHERE a < b
          UNION ALL
          SELECT c.doc_id, MAX(c.ce) AS a, MIN(nn.n) AS b
          FROM cuts c JOIN nn ON nn.doc_id = c.doc_id
          GROUP BY c.doc_id HAVING MAX(c.ce) < MIN(nn.n)),
        sp AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = 1 OR substr(text, i - 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS starts,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = len(text) OR substr(text, i + 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS ends
          FROM nn),
        segs AS (
          SELECT r.doc_id, r.a,
                 substr(n2.text, CAST(sp.starts[r.a + 1] AS INT),
                        CAST(sp.ends[r.b] - sp.starts[r.a + 1] + 1 AS INT)) AS seg
          FROM runs r
          JOIN nn n2 ON n2.doc_id = r.doc_id
          JOIN sp ON sp.doc_id = r.doc_id),
        reb AS (
          SELECT doc_id, array_to_string(array_agg(seg ORDER BY a), ' ') AS txt
          FROM segs GROUP BY doc_id),
        ca AS (
          SELECT doc_id, CAST(SUM(ce - cs) AS BIGINT) AS n_cut_words,
                 array_to_string(array_agg(CAST(cs AS VARCHAR) || '-' || CAST(ce AS VARCHAR)
                   ORDER BY cs), ',') AS cut_spans
          FROM cuts GROUP BY doc_id)
        SELECT nn.doc_id,
               CAST(COALESCE(nn.n, 0) AS BIGINT) AS n_words,
               COALESCE(ca.n_cut_words, 0) AS n_cut_words,
               COALESCE(ca.cut_spans, '') AS cut_spans,
               CASE WHEN ca.doc_id IS NULL THEN COALESCE(nn.text, '')
                    ELSE COALESCE(reb.txt, '') END AS text_deduped
        FROM nn
        LEFT JOIN ca ON ca.doc_id = nn.doc_id
        LEFT JOIN reb ON reb.doc_id = nn.doc_id
        ORDER BY nn.doc_id"""
      }),

    // ---- p57: span-granular decontamination — [[decontaminateSpans]]
    // at n = 8 with the p47 carve-out (every tenth doc_id is the eval
    // suite, the rest is the corpus): contaminated docs keep their
    // clean words, clean docs pass through byte-identical. The oracle
    // replays the positioned ROLLING grams (the p47/p56 HUGEINT
    // arithmetic), the eval-hash membership (≡ the
    // positions_in_sorted probe), and the same merge/complement/
    // excision chain as p56.
    QueryDef(
      "p57_decontaminate_spans",
      (s, d) => {
        val all = T.documents(s, d)
        decontaminateSpans(
          corpus = all.filter(col("doc_id") % 10 =!= 0),
          evalSet = all.filter(col("doc_id") % 10 === 0),
          textCol = "text", n = 8)
          .select(col("doc_id"), col("lang"), col("n_flagged_grams"),
            col("cut_spans"), col("text_clean"))
          .orderBy(col("doc_id"))
      },
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 7)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d AS (
          SELECT doc_id, lang, text, list_filter(string_split_regex(text, '\s+'),
                                                 x -> x <> '') AS ws
          FROM documents),
        nn AS MATERIALIZED (SELECT doc_id, lang, text, ws, len(ws) AS n FROM d),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) AS HUGEINT) AS h
          FROM nn, unnest(range(1, n + 1)) t(i)
          WHERE n >= 8),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT w0.doc_id, CAST(w0.i - 1 AS INT) AS pos,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 7
          JOIN pw ON pw.e = 7 - (w2.i - w0.i)
          WHERE w0.i <= w0.n - 7
          GROUP BY w0.doc_id, w0.i),
        ev AS (SELECT DISTINCT h FROM g WHERE doc_id % 10 = 0),
        flg AS MATERIALIZED (
          SELECT g.doc_id, g.pos FROM g JOIN ev ON ev.h = g.h
          WHERE g.doc_id % 10 <> 0),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                      THEN 0 ELSE 1 END AS brk
          FROM flg),
        grp AS (
          SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
          FROM isl),
        cuts AS MATERIALIZED (
          SELECT doc_id, CAST(MIN(pos) AS INT) AS cs,
                 CAST(MAX(pos) + 8 AS INT) AS ce
          FROM grp GROUP BY doc_id, gid),
        runs AS MATERIALIZED (
          SELECT doc_id, a, b FROM (
            SELECT doc_id,
                   COALESCE(LAG(ce) OVER (PARTITION BY doc_id ORDER BY cs), 0) AS a,
                   cs AS b
            FROM cuts) WHERE a < b
          UNION ALL
          SELECT c.doc_id, MAX(c.ce) AS a, MIN(nn.n) AS b
          FROM cuts c JOIN nn ON nn.doc_id = c.doc_id
          GROUP BY c.doc_id HAVING MAX(c.ce) < MIN(nn.n)),
        sp AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = 1 OR substr(text, i - 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS starts,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = len(text) OR substr(text, i + 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS ends
          FROM nn),
        segs AS (
          SELECT r.doc_id, r.a,
                 substr(n2.text, CAST(sp.starts[r.a + 1] AS INT),
                        CAST(sp.ends[r.b] - sp.starts[r.a + 1] + 1 AS INT)) AS seg
          FROM runs r
          JOIN nn n2 ON n2.doc_id = r.doc_id
          JOIN sp ON sp.doc_id = r.doc_id),
        reb AS (
          SELECT doc_id, array_to_string(array_agg(seg ORDER BY a), ' ') AS txt
          FROM segs GROUP BY doc_id),
        fc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged_grams
          FROM flg GROUP BY doc_id),
        ca AS (
          SELECT doc_id,
                 array_to_string(array_agg(CAST(cs AS VARCHAR) || '-' || CAST(ce AS VARCHAR)
                   ORDER BY cs), ',') AS cut_spans
          FROM cuts GROUP BY doc_id)
        SELECT nn.doc_id, nn.lang,
               COALESCE(fc.n_flagged_grams, 0) AS n_flagged_grams,
               COALESCE(ca.cut_spans, '') AS cut_spans,
               CASE WHEN ca.doc_id IS NULL THEN nn.text
                    ELSE COALESCE(reb.txt, '') END AS text_clean
        FROM nn
        LEFT JOIN fc ON fc.doc_id = nn.doc_id
        LEFT JOIN ca ON ca.doc_id = nn.doc_id
        LEFT JOIN reb ON reb.doc_id = nn.doc_id
        WHERE nn.doc_id % 10 <> 0
        ORDER BY nn.doc_id"""
      }),

    // ---- p61: span decontamination against a DATA-SIZED corpus —
    // [[decontaminateSpansAgainstCorpus]] with the p57 carve-out and
    // n = 8: identical SEMANTICS to p57 (the oracle is the same
    // replay, projected to this operator's columns) through the
    // shuffle-join strategy instead of the broadcast probe — the gate
    // certifies that the scale path computes the same cuts.
    QueryDef(
      "p61_decontaminate_join",
      (s, d) => {
        val all = T.documents(s, d)
        decontaminateSpansAgainstCorpus(
          corpus = all.filter(col("doc_id") % 10 =!= 0),
          reference = all.filter(col("doc_id") % 10 === 0),
          idCol = "doc_id", textCol = "text", n = 8)
          .orderBy(col("doc_id"))
      },
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 7)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d AS (
          SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'),
                                           x -> x <> '') AS ws
          FROM documents),
        nn AS MATERIALIZED (SELECT doc_id, text, ws, len(ws) AS n FROM d),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) AS HUGEINT) AS h
          FROM nn, unnest(range(1, n + 1)) t(i)
          WHERE n >= 8),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT w0.doc_id, CAST(w0.i - 1 AS INT) AS pos,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 7
          JOIN pw ON pw.e = 7 - (w2.i - w0.i)
          WHERE w0.i <= w0.n - 7
          GROUP BY w0.doc_id, w0.i),
        ev AS (SELECT DISTINCT h FROM g WHERE doc_id % 10 = 0),
        flg AS MATERIALIZED (
          SELECT g.doc_id, g.pos FROM g JOIN ev ON ev.h = g.h
          WHERE g.doc_id % 10 <> 0),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                      THEN 0 ELSE 1 END AS brk
          FROM flg),
        grp AS (
          SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
          FROM isl),
        cuts AS MATERIALIZED (
          SELECT doc_id, CAST(MIN(pos) AS INT) AS cs,
                 CAST(MAX(pos) + 8 AS INT) AS ce
          FROM grp GROUP BY doc_id, gid),
        runs AS MATERIALIZED (
          SELECT doc_id, a, b FROM (
            SELECT doc_id,
                   COALESCE(LAG(ce) OVER (PARTITION BY doc_id ORDER BY cs), 0) AS a,
                   cs AS b
            FROM cuts) WHERE a < b
          UNION ALL
          SELECT c.doc_id, MAX(c.ce) AS a, MIN(nn.n) AS b
          FROM cuts c JOIN nn ON nn.doc_id = c.doc_id
          GROUP BY c.doc_id HAVING MAX(c.ce) < MIN(nn.n)),
        sp AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = 1 OR substr(text, i - 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS starts,
                 list_filter(range(1, len(text) + 1), i ->
                   substr(text, i, 1) NOT IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13))
                   AND (i = len(text) OR substr(text, i + 1, 1) IN (' ', chr(9), chr(10), chr(11), chr(12), chr(13)))) AS ends
          FROM nn),
        segs AS (
          SELECT r.doc_id, r.a,
                 substr(n2.text, CAST(sp.starts[r.a + 1] AS INT),
                        CAST(sp.ends[r.b] - sp.starts[r.a + 1] + 1 AS INT)) AS seg
          FROM runs r
          JOIN nn n2 ON n2.doc_id = r.doc_id
          JOIN sp ON sp.doc_id = r.doc_id),
        reb AS (
          SELECT doc_id, array_to_string(array_agg(seg ORDER BY a), ' ') AS txt
          FROM segs GROUP BY doc_id),
        ca AS (
          SELECT doc_id, CAST(SUM(ce - cs) AS BIGINT) AS n_cut_words,
                 array_to_string(array_agg(CAST(cs AS VARCHAR) || '-' || CAST(ce AS VARCHAR)
                   ORDER BY cs), ',') AS cut_spans
          FROM cuts GROUP BY doc_id)
        SELECT nn.doc_id,
               CAST(COALESCE(nn.n, 0) AS BIGINT) AS n_words,
               COALESCE(ca.n_cut_words, 0) AS n_cut_words,
               COALESCE(ca.cut_spans, '') AS cut_spans,
               CASE WHEN ca.doc_id IS NULL THEN nn.text
                    ELSE COALESCE(reb.txt, '') END AS text_clean
        FROM nn
        LEFT JOIN ca ON ca.doc_id = nn.doc_id
        LEFT JOIN reb ON reb.doc_id = nn.doc_id
        WHERE nn.doc_id % 10 <> 0
        ORDER BY nn.doc_id"""
      }),

    // ---- p58: paragraph-dedup boilerplate report —
    // [[dedupParagraphsReport]] over the p52 page layout (8-word
    // '.'-lines + the same cookie banner on EVERY page): the banner
    // tops the table at n_copies = corpus size, naturally-shared
    // near-dup lines fill the tail. The oracle replays the layout,
    // the duplicate filter, the bytes accounting and the
    // (copies desc, line asc) top-k cut.
    QueryDef(
      "p58_paragraph_dedup_report",
      (s, d) => {
        val ws = array_remove(words(col("text")), "")
        val nl = greatest(ceil(size(ws) / lit(8.0)).cast(IntegerType), lit(1))
        val lines = transform(sequence(lit(0), nl - 1), i =>
          concat(array_join(slice(ws, i * 8 + 1, lit(8)), " "), lit(".")))
        val page = concat(array_join(lines, "\n"),
          lit("\naccept cookies to continue reading this website today."))
        dedupParagraphsReport(
          T.documents(s, d).select(col("doc_id"), page.as("page")),
          "doc_id", "page", k = 15)
          .orderBy(col("rk"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS ws FROM documents),
        pg AS MATERIALIZED (
          SELECT doc_id,
                 array_to_string(list_transform(range(0,
                     greatest(CAST(ceil(len(ws) / 8.0) AS INT), 1)), i ->
                   coalesce(array_to_string(ws[i*8+1 : i*8+8], ' '), '') || '.'), chr(10)) ||
                 chr(10) || 'accept cookies to continue reading this website today.' AS page
          FROM w),
        l AS (
          SELECT doc_id, unnest(string_split(page, chr(10))) AS line FROM pg),
        c AS (
          SELECT line, CAST(COUNT(*) AS BIGINT) AS n_copies,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM l WHERE trim(line) <> '' GROUP BY line
          HAVING COUNT(*) >= 2)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_copies DESC, line ASC) AS INT) AS rk,
               line, n_copies, n_docs,
               CAST((n_copies - 1) * strlen(line) AS BIGINT) AS bytes_removed
        FROM c ORDER BY n_copies DESC, line ASC LIMIT 15""")),

    // ---- p59: substring-dedup boilerplate report —
    // [[dedupSubstringsReport]] at minLen = 10 over the raw fixture
    // corpus: the hottest cross-document duplicated 10-word runs (the
    // p56 cut targets), ranked by document frequency with the ROLLING
    // HASH as tiebreak (the scale path never shuffles gram strings —
    // only the k winners fetch text from their first occurrence). The
    // oracle replays the rolling arithmetic, the distinct-doc counts,
    // the (df desc, hash asc) top-k cut and the first-occurrence
    // slice.
    QueryDef(
      "p59_substring_dedup_report",
      (s, d) =>
        dedupSubstringsReport(T.documents(s, d), "doc_id", "text",
          minLen = 10, k = 15)
          .orderBy(col("rk")),
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 9)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS ws FROM documents),
        nn AS MATERIALIZED (
          SELECT doc_id, ws, len(ws) AS n FROM d WHERE len(ws) >= 10),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) AS HUGEINT) AS h
          FROM nn, unnest(range(1, n + 1)) t(i)),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT w0.doc_id, CAST(w0.i - 1 AS INT) AS pos,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 9
          JOIN pw ON pw.e = 9 - (w2.i - w0.i)
          WHERE w0.i <= w0.n - 9
          GROUP BY w0.doc_id, w0.i),
        c AS (
          SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        firstocc AS (
          SELECT h, doc_id, pos FROM (
            SELECT h, doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
            FROM g) WHERE rn = 1),
        top AS (
          SELECT c.h, c.n_docs, f.doc_id, f.pos
          FROM c JOIN firstocc f ON f.h = c.h
          ORDER BY c.n_docs DESC, c.h ASC LIMIT 15),
        fetched AS (
          SELECT top.h, top.n_docs,
                 array_to_string(nn.ws[top.pos + 1 : top.pos + 10], ' ') AS gram
          FROM top JOIN nn ON nn.doc_id = top.doc_id)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, h ASC) AS INT) AS rk,
               gram, n_docs,
               CAST((n_docs - 1) * strlen(gram) AS BIGINT) AS bytes_removed
        FROM fetched ORDER BY rk"""
      }),

    // ---- p60: sentence-boundary-aware chunking — [[chunkText]] with
    // respectSentences = true at 20-word chunks / 5-word overlap. The
    // fixture corpus is punctuation-free, so every 7th word gets a '.'
    // suffix (both engines synthesize the page identically); the
    // oracle then replays the SEQUENTIAL snap walk with a recursive
    // CTE — next start = max(s+1, e−overlap), end = last in-window
    // sentence boundary + 1, fixed window when none, whole tail when
    // it fits — plus the slice re-join and the per-char word-span
    // citations (the p43 classification).
    QueryDef(
      "p60_sentence_chunks",
      (s, d) => {
        val ws0 = array_remove(words(col("text")), "")
        val wsP = transform(ws0, (x, i) =>
          when((i + 1) % 7 === 0, concat(x, lit("."))).otherwise(x))
        chunkText(
          T.documents(s, d).select(col("doc_id"),
            array_join(wsP, " ").as("page")),
          "doc_id", "page", chunkWords = 20, overlapWords = 5,
          respectSentences = true)
          .orderBy(col("doc_id"), col("chunk_no"))
      },
      Some("""
        WITH RECURSIVE
        w AS (
          SELECT doc_id, list_transform(
                   list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                   (x, i) -> CASE WHEN i % 7 = 0 THEN x || '.' ELSE x END) AS ws
          FROM documents),
        pgx AS MATERIALIZED (
          SELECT doc_id, ws, array_to_string(ws, ' ') AS page FROM w),
        nn AS MATERIALIZED (
          SELECT doc_id, ws, page, len(ws) AS n,
                 list_filter(range(0, len(ws)), j ->
                   ws[j + 1][-1] IN ('.', '!', '?', '"', '”')) AS sends
          FROM pgx),
        walk(doc_id, chunk_no, s, e) AS (
          SELECT doc_id, 0, 0,
                 CASE WHEN n <= 20 THEN n
                      ELSE coalesce(list_max(list_filter(sends, j ->
                             j >= 0 AND j < 20)) + 1, 20) END
          FROM nn
          UNION ALL
          SELECT k.doc_id, k.chunk_no + 1,
                 greatest(k.s + 1, k.e - 5),
                 CASE WHEN nn.n - greatest(k.s + 1, k.e - 5) <= 20 THEN nn.n
                      ELSE coalesce(list_max(list_filter(nn.sends, j ->
                             j >= greatest(k.s + 1, k.e - 5) AND
                             j < greatest(k.s + 1, k.e - 5) + 20)) + 1,
                           greatest(k.s + 1, k.e - 5) + 20) END
          FROM walk k JOIN nn ON nn.doc_id = k.doc_id
          WHERE k.e < nn.n),
        sp AS MATERIALIZED (
          SELECT doc_id,
                 list_filter(range(1, len(page) + 1), i ->
                   substr(page, i, 1) <> ' '
                   AND (i = 1 OR substr(page, i - 1, 1) = ' ')) AS cstarts,
                 list_filter(range(1, len(page) + 1), i ->
                   substr(page, i, 1) <> ' '
                   AND (i = len(page) OR substr(page, i + 1, 1) = ' ')) AS cends
          FROM pgx)
        SELECT k.doc_id, CAST(k.chunk_no AS INT) AS chunk_no,
               CAST(k.s AS BIGINT) AS start_word,
               CAST(k.e - k.s AS BIGINT) AS n_chunk_words,
               coalesce(array_to_string(nn.ws[k.s + 1 : k.e], ' '), '') AS chunk_text,
               sp.cstarts[k.s + 1] AS start_char,
               sp.cends[k.e] AS end_char
        FROM walk k
        JOIN nn ON nn.doc_id = k.doc_id
        JOIN sp ON sp.doc_id = k.doc_id
        ORDER BY k.doc_id, k.chunk_no""")),

    // ---- p62: linear quality-classifier scoring —
    // [[classifierScore]] over [[hashedNgramFeatures]] (512 buckets,
    // 1..2-grams) with a deterministic dyadic-rational weight table
    // (w_b = (b mod 7 − 3)/4, intercept 1/4): every per-row product
    // is IEEE-exact in both engines and the sum runs through the
    // decimal accumulator, so the gate certifies the scoring pass
    // bit-for-bit. Training itself is iterative (not
    // SQL-expressible in the portable subset) and is spec-gated for
    // determinism + separation in TextApiSpec, the bpeTrain stance.
    QueryDef(
      "p62_classifier_score",
      (s, d) => {
        import s.implicits._
        val weights = (0 to 512).map(b =>
          (b, if (b == 512) 0.25 else ((b % 7) - 3).toDouble / 4))
          .toDF("b", "w")
        classifierScore(
          hashedNgramFeatures(T.documents(s, d), "doc_id", "text",
            buckets = 512, maxGram = 2),
          weights, buckets = 512)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS ws
          FROM documents),
        g AS MATERIALIZED (
          SELECT doc_id,
                 CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) % 512 AS b
          FROM w, unnest(range(1, len(ws) + 1)) t(i)
          UNION ALL
          SELECT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+1], ' ')), 1, 12) AS BIGINT) % 512 AS b
          FROM w, unnest(range(1, len(ws))) t(i)),
        f AS (SELECT doc_id, b, COUNT(*) AS cnt FROM g GROUP BY doc_id, b),
        tt AS (SELECT doc_id, SUM(cnt) AS doc_grams FROM f GROUP BY doc_id)
        SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
               ${graft.QueryDef.dsumSql(
                 "((b % 7) - 3) / 4.0 * (CAST(cnt AS DOUBLE) / doc_grams)")}
                 + 0.25 AS score
        FROM f JOIN tt ON tt.doc_id = f.doc_id
        GROUP BY f.doc_id ORDER BY f.doc_id""")),

    // ---- p63: Gopher character-fraction repetition signals —
    // [[gopherRepetitionSignals]] over pages with the SAME 9-word
    // banner appended twice (internal duplication, so the dup-k
    // branches fire for k ≤ 9 and the zero branch for k = 10, while
    // the word-soup body keeps the top-k winners doc-specific). The
    // oracle replays all nine signals: per-k rolling gram hashes
    // (shared power table), most-frequent/duplicated winner selection
    // with the hash tiebreak, the once-per-word coverage union, and
    // the exact char-fraction division.
    QueryDef(
      "p63_gopher_repetition",
      (s, d) => {
        val banner = "accept all cookies to continue reading this site today"
        gopherRepetitionSignals(
          T.documents(s, d).select(col("doc_id"),
            concat_ws(" ", col("text"), lit(banner), lit(banner))
              .as("page")),
          "page")
          .drop("page")
          .orderBy(col("doc_id"))
      },
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 9)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        val outCols = ((2 to 4).map(k =>
          s"MAX(CASE WHEN k = $k THEN f END) AS top_${k}gram_char_frac") ++
          (5 to 10).map(k =>
            s"MAX(CASE WHEN k = $k THEN f END) AS dup_${k}gram_char_frac"))
          .mkString(",\n               ")
        raw"""
        WITH d0 AS (
          SELECT doc_id,
                 concat_ws(' ', text,
                   'accept all cookies to continue reading this site today',
                   'accept all cookies to continue reading this site today') AS page
          FROM documents),
        w AS (
          SELECT doc_id, list_filter(string_split_regex(page, '\s+'),
                                     x -> x <> '') AS ws
          FROM d0),
        nn AS MATERIALIZED (
          SELECT doc_id, ws, len(ws) AS n,
                 COALESCE(list_sum(list_transform(ws, x -> len(x))), 0) AS tot
          FROM w),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT) AS HUGEINT) AS h
          FROM nn, unnest(range(1, n + 1)) t(i)),
        ks(k) AS (VALUES (2), (3), (4), (5), (6), (7), (8), (9), (10)),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT w0.doc_id, ks.k, CAST(w0.i - 1 AS INT) AS pos,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          CROSS JOIN ks
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + ks.k - 1
          JOIN pw ON pw.e = ks.k - 1 - (w2.i - w0.i)
          WHERE w0.i + ks.k - 1 <= w0.n
          GROUP BY w0.doc_id, ks.k, w0.i),
        cnts AS MATERIALIZED (
          SELECT doc_id, k, h, COUNT(*) AS c FROM g GROUP BY doc_id, k, h),
        winners AS (
          SELECT doc_id, k, h FROM (
            SELECT doc_id, k, h,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, k
                     ORDER BY c DESC, h ASC) AS rn
            FROM cnts) WHERE rn = 1 AND k <= 4
          UNION ALL
          SELECT doc_id, k, h FROM cnts WHERE k >= 5 AND c >= 2),
        occ AS (
          SELECT g.doc_id, g.k, g.pos
          FROM g JOIN winners x ON x.doc_id = g.doc_id AND x.k = g.k
                              AND x.h = g.h),
        cov AS (
          SELECT DISTINCT doc_id, k, pos + j AS widx
          FROM occ, unnest(range(0, k)) t(j)),
        covch AS (
          SELECT c.doc_id, c.k, SUM(len(nn.ws[c.widx + 1])) AS chars
          FROM cov c JOIN nn ON nn.doc_id = c.doc_id
          GROUP BY c.doc_id, c.k),
        frac AS (
          SELECT nn.doc_id, ks.k,
                 CAST(COALESCE(cc.chars, 0) AS DOUBLE) / CAST(nn.tot AS DOUBLE) AS f
          FROM nn CROSS JOIN ks
          LEFT JOIN covch cc ON cc.doc_id = nn.doc_id AND cc.k = ks.k)
        SELECT doc_id,
               $outCols
        FROM frac GROUP BY doc_id ORDER BY doc_id"""
      }),

    // ---- p64: Gopher line-duplicate signals — [[gopherLineSignals]]
    // over the p52-style synthesized pages with a short banner line
    // appended TWICE (guaranteed within-doc duplication; word-soup
    // body lines stay unique unless docs genuinely repeat them). The
    // oracle replays the page layout, the non-blank trim, the per-doc
    // line occurrence counts and both exact fractions.
    QueryDef(
      "p64_gopher_line_signals",
      (s, d) => {
        val ws = array_remove(words(col("text")), "")
        val nl = greatest(ceil(size(ws) / lit(8.0)).cast(IntegerType), lit(1))
        val lines = transform(sequence(lit(0), nl - 1), i =>
          concat(array_join(slice(ws, i * 8 + 1, lit(8)), " "), lit(".")))
        val page = concat(array_join(lines, "\n"),
          lit("\naccept cookies now.\naccept cookies now."))
        gopherLineSignals(
          T.documents(s, d).select(col("doc_id"), page.as("page")), "page")
          .drop("page")
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS ws FROM documents),
        pg AS MATERIALIZED (
          SELECT doc_id,
                 array_to_string(list_transform(range(0,
                     greatest(CAST(ceil(len(ws) / 8.0) AS INT), 1)), i ->
                   coalesce(array_to_string(ws[i*8+1 : i*8+8], ' '), '') || '.'), chr(10)) ||
                 chr(10) || 'accept cookies now.' ||
                 chr(10) || 'accept cookies now.' AS page
          FROM w),
        l AS (
          SELECT doc_id, trim(x) AS line
          FROM (SELECT doc_id, unnest(string_split(page, chr(10))) AS x
                FROM pg)
          WHERE trim(x) <> ''),
        c AS (SELECT doc_id, line, COUNT(*) AS c
              FROM l GROUP BY doc_id, line),
        agg AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_lines,
                 CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                   AS dup_line_frac,
                 CAST(SUM(CASE WHEN c >= 2 THEN c * len(line) ELSE 0 END) AS DOUBLE)
                   / CAST(greatest(SUM(c * len(line)), 1) AS DOUBLE)
                   AS dup_line_char_frac
          FROM c GROUP BY doc_id)
        SELECT pg.doc_id,
               COALESCE(agg.n_lines, 0) AS n_lines,
               COALESCE(agg.dup_line_frac, 0.0) AS dup_line_frac,
               COALESCE(agg.dup_line_char_frac, 0.0) AS dup_line_char_frac
        FROM pg LEFT JOIN agg ON agg.doc_id = pg.doc_id
        ORDER BY pg.doc_id""")),

    // ---- p65: CCNet perplexity filtering — [[lmPerplexity]] with the
    // fixture's DSIR convention for the reference/corpus split
    // (doc_id % 5 = 0 trains the per-language Stupid Backoff LM, the
    // rest is scored and bucketed head/middle/tail per language). The
    // oracle replays the full chain: the (lang, gram) count table over
    // orders 1..3, per-language (N, V), the per-position 5-key melt as
    // five LEFT JOINs, the identical backoff CASE with 1e-9-quantized
    // ln, the decimal-accumulator doc mean, and the tie-broken ntile.
    QueryDef(
      "p65_lm_perplexity",
      (s, d) => {
        val all = T.documents(s, d)
        lmPerplexity(
          reference = all.filter(col("doc_id") % 5 === 0),
          corpus = all.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text", "lang")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH r AS (
          SELECT lang, ws FROM (
            SELECT lang, list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS ws
            FROM documents WHERE doc_id % 5 = 0)
          WHERE len(ws) > 0),
        rg AS MATERIALIZED (
          SELECT lang, ws[i] AS g, 1 AS o
          FROM r, unnest(range(1, len(ws) + 1)) t(i)
          UNION ALL
          SELECT lang, array_to_string(ws[i:i+1], ' ') AS g, 2 AS o
          FROM r, unnest(range(1, len(ws))) t(i)
          UNION ALL
          SELECT lang, array_to_string(ws[i:i+2], ' ') AS g, 3 AS o
          FROM r, unnest(range(1, len(ws) - 1)) t(i)),
        cnts AS MATERIALIZED (
          SELECT lang, g, COUNT(*) AS cnt FROM rg GROUP BY lang, g),
        st AS MATERIALIZED (
          SELECT lang, COUNT(*) AS ntok, COUNT(DISTINCT g) AS vsize
          FROM rg WHERE o = 1 GROUP BY lang),
        dd AS (
          SELECT doc_id, lang, ws FROM (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS ws
            FROM documents WHERE doc_id % 5 <> 0)
          WHERE len(ws) > 0),
        pp AS MATERIALIZED (
          SELECT doc_id, lang, i - 1 AS pos, ws[i] AS u,
                 CASE WHEN i >= 2 THEN ws[i-1] END AS c1,
                 CASE WHEN i >= 2 THEN ws[i-1] || ' ' || ws[i] END AS b,
                 CASE WHEN i >= 3 THEN ws[i-2] || ' ' || ws[i-1] END AS c2,
                 CASE WHEN i >= 3
                   THEN ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i] END AS t
          FROM dd, unnest(range(1, len(ws) + 1)) x(i)),
        jj AS MATERIALIZED (
          SELECT p.doc_id, p.lang, p.pos,
                 COALESCE(cu.cnt, 0) AS uc, COALESCE(cc1.cnt, 0) AS c1c,
                 COALESCE(cb.cnt, 0) AS bc, COALESCE(cc2.cnt, 0) AS c2c,
                 COALESCE(ct.cnt, 0) AS tc, st.ntok, st.vsize
          FROM pp p
          JOIN st ON st.lang = p.lang
          LEFT JOIN cnts cu  ON cu.lang = p.lang AND cu.g = p.u
          LEFT JOIN cnts cc1 ON cc1.lang = p.lang AND cc1.g = p.c1
          LEFT JOIN cnts cb  ON cb.lang = p.lang AND cb.g = p.b
          LEFT JOIN cnts cc2 ON cc2.lang = p.lang AND cc2.g = p.c2
          LEFT JOIN cnts ct  ON ct.lang = p.lang AND ct.g = p.t),
        lpt AS MATERIALIZED (
          SELECT doc_id, lang, round(CASE
            WHEN pos = 0 THEN
              ln(CAST(uc + 1 AS DOUBLE) / CAST(ntok + vsize AS DOUBLE))
            WHEN pos = 1 AND bc > 0 THEN
              ln(CAST(bc AS DOUBLE) / CAST(c1c AS DOUBLE))
            WHEN pos = 1 THEN
              ln(CAST(0.4 AS DOUBLE) *
                 (CAST(uc + 1 AS DOUBLE) / CAST(ntok + vsize AS DOUBLE)))
            WHEN tc > 0 THEN
              ln(CAST(tc AS DOUBLE) / CAST(c2c AS DOUBLE))
            WHEN bc > 0 THEN
              ln(CAST(0.4 AS DOUBLE) *
                 (CAST(bc AS DOUBLE) / CAST(c1c AS DOUBLE)))
            ELSE
              ln((CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)) *
                 (CAST(uc + 1 AS DOUBLE) / CAST(ntok + vsize AS DOUBLE)))
          END, 9) AS lp
          FROM jj),
        sc AS MATERIALIZED (
          SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 ${graft.QueryDef.davgSql("lp")} AS logprob_avg
          FROM lpt GROUP BY doc_id, lang)
        SELECT doc_id, lang, n_tokens, logprob_avg,
               round(exp(-logprob_avg), 6) AS ppl,
               CASE ntile(3) OVER (PARTITION BY lang
                   ORDER BY logprob_avg DESC, doc_id ASC)
                 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                 ELSE 'tail' END AS bucket
        FROM sc ORDER BY doc_id""")),

    // ---- p66: SemDeDup — [[semDedup]] over the embeddings table
    // (k = 16 — the paper's own scale lever is MORE clusters, keeping
    // within-cluster pair work linear-ish; min-id/2-iter fit as p21,
    // τ = 0.35: the fixture's
    // random embeddings top out at cos ≈ 0.51, so the production-scale
    // τ ≈ 0.95 would fire on nothing — the gate needs the prune path
    // to actually run). The oracle replays the p21 k-means chain, the
    // within-cluster cosine self-join, the recursive-CTE transitive
    // closure, and the farthest-from-centroid representative rule.
    QueryDef(
      "p66_semdedup",
      (s, d) =>
        semDedup(T.embeddings(s, d), "vec_id", "embedding",
          k = 16, dim = 64, tau = 0.35)
          .orderBy(col("vec_id")),
      Some {
        val Dim = 64
        s"""WITH RECURSIVE e AS (SELECT vec_id, embedding AS emb FROM embeddings),
           |c0 AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
           |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
           |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16),
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "c1", "a1", Dim)},
           |${kmAssignSql("a2", "c1", Dim)},
           |${kmUpdateSql("u2", "c2", "a2", Dim)},
           |${kmAssignSql("a3", "c2", Dim)},
           |n AS MATERIALIZED (
           |  SELECT vec_id, emb, cl, d2, ${kmDotSql("emb", "emb")} AS n2
           |  FROM a3),
           |pr AS MATERIALIZED (
           |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
           |  FROM n x JOIN n y ON x.cl = y.cl AND x.vec_id < y.vec_id
           |  WHERE ${kmDotSql("x.emb", "y.emb")} / (sqrt(x.n2) * sqrt(y.n2))
           |        >= CAST(0.35 AS DOUBLE)),
           |verified AS (SELECT doc_a, doc_b FROM pr),
           |$ComponentsSql,
           |reps AS (
           |  SELECT comp.node, ROW_NUMBER() OVER (
           |      PARTITION BY comp.component
           |      ORDER BY n.d2 DESC, comp.node ASC) AS rk
           |  FROM comp JOIN n ON n.vec_id = comp.node)
           |SELECT n.vec_id, n.cl AS cluster, n.d2
           |FROM n
           |WHERE n.vec_id NOT IN (SELECT node FROM reps WHERE rk > 1)
           |ORDER BY n.vec_id""".stripMargin
      }),

    // ---- p67: temperature sampling — [[temperatureSample]] at
    // α = 0.5 over the language strata (budget 200 of 500 docs). The
    // oracle replays the quantized pow scores, the decimal-exact score
    // sum, the floor/min quota, and the identical md5 rank prefix.
    QueryDef(
      "p67_temperature_sample",
      (s, d) =>
        temperatureSample(
          T.documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id", "lang", budget = 200L, alpha = 0.5)
          .orderBy(col("doc_id")),
      Some(s"""
        WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        sc AS (SELECT lang, n,
                      round(pow(CAST(n AS DOUBLE), 0.5), 9) AS s FROM n),
        tot AS (SELECT ${graft.QueryDef.dsumSql("s")} AS st FROM sc),
        q AS (SELECT lang, least(n, CAST(floor(200 * s / st) AS BIGINT)) AS q
              FROM sc CROSS JOIN tot),
        ranked AS (
          SELECT d.doc_id, d.lang, q.q,
                 ROW_NUMBER() OVER (PARTITION BY d.lang
                   ORDER BY md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)),
                            d.doc_id) AS rk
          FROM documents d JOIN q ON q.lang = d.lang)
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= q ORDER BY doc_id""")),

    // ---- p68: hard-negative mining — [[hardNegativeMine]] with the
    // label classes as the positive sets (queries = the 4 smallest-id
    // vectors, positives = every same-label vector): the DPR recipe's
    // "top non-positives" per query. The oracle expresses the
    // anti-join as label inequality — the same set by construction.
    QueryDef(
      "p68_hard_negatives",
      (s, d) => {
        val e = T.embeddings(s, d)
        val q = e.filter(col("vec_id") <= 4)
        val pos = q.select(col("vec_id").as("q_id"), col("label"))
          .join(e.select(col("vec_id"), col("label")), Seq("label"))
          .select(col("q_id"), col("vec_id"))
        hardNegativeMine(e, q, pos, "vec_id", "embedding", k = 3)
          .orderBy(col("q_id"), col("rk"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, embedding,
                 list_reduce(list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) AS n2
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS q_id, c.vec_id,
                 list_reduce(list_transform(range(1, len(q.embedding) + 1),
                   i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) / (sqrt(q.n2) * sqrt(c.n2)) AS cos_sim
          FROM e q, e c
          WHERE q.vec_id <= 4 AND c.vec_id <> q.vec_id AND c.label <> q.label)
        SELECT q_id, vec_id, cos_sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rk
        FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""")),

    // ---- p69: JL random projection — [[randomProject]] 64 → 4 dims,
    // flattened to scalar per-dim columns for the driver's comparator.
    // The oracle replays the identical ±1 weights, sequential fold,
    // 1/√outDim scale and FLOAT round.
    QueryDef(
      "p69_random_projection",
      (s, d) =>
        randomProject(T.embeddings(s, d), "embedding", EmbDim, 4)
          .select(col("vec_id") +: (0 until 4).map(j =>
            element_at(col("projected"), j + 1).cast(DoubleType)
              .as(s"proj_$j")): _*)
          .orderBy(col("vec_id")),
      Some(s"""
        SELECT vec_id,
               ${(0 until 4).map(j =>
                 s"CAST(${jlProjSql(j, EmbDim, 4)} AS DOUBLE) AS proj_$j")
                 .mkString(",\n               ")}
        FROM embeddings ORDER BY vec_id""")),

    // ---- p70: clustering in the projected space — the composition
    // [[randomProject]] feeds ([[kmeansCluster]]) that IS the JL
    // operator's production purpose: the full Lloyd's chain (min-id
    // seeds, 2 iterations, final assignment) runs over 4-dim
    // projections at 1/16th the distance cost of the raw 64-dim
    // space. The oracle projects inside its first CTE with the shared
    // [[jlProjSql]] arithmetic, then replays the p21 k-means chain at
    // dim = 4 — bit-identical end-to-end.
    QueryDef(
      "p70_project_cluster",
      (s, d) =>
        kmeansCluster(
          randomProject(T.embeddings(s, d), "embedding", EmbDim, 4, "pe"),
          "vec_id", "pe", k = 8, dim = 4, iters = 2)
          .orderBy(col("vec_id")),
      Some {
        val Dim = 4
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id,
           |         [${(0 until Dim).map(j => jlProjSql(j, EmbDim, Dim))
                        .mkString(",\n          ")}] AS emb
           |  FROM embeddings),
           |c0 AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
           |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
           |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 8),
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "c1", "a1", Dim)},
           |${kmAssignSql("a2", "c1", Dim)},
           |${kmUpdateSql("u2", "c2", "a2", Dim)},
           |${kmAssignSql("a3", "c2", Dim)}
           |SELECT vec_id, cl AS cluster, d2,
           |       COUNT(*) OVER (PARTITION BY cl) AS n_members
           |FROM a3 ORDER BY vec_id""".stripMargin
      }),

    // ---- m01: multimodal column plumbing — opaque binary payload +
    // typed metadata struct; "decode"/feature steps are deterministic
    // byte-level functions (the real decode is stubbed — image/audio
    // libs are not in scope; the schema/partitioning/batch shape is the
    // real deliverable, see operators.Multimodal for the typed
    // mapPartitions path).
    QueryDef(
      "m01_multimodal_meta",
      (s, d) => {
        val payload = encode(col("text"), "UTF-8")
        // metadata struct is built, then flattened to scalar fields for
        // the driver's comparator (struct cells crash it, r03 m01); the
        // typed-struct path lives in operators.Multimodal + its spec.
        val meta = struct(
          lit("text/plain").as("mime"),
          octet_length(payload).cast(LongType).as("n_bytes"))
        T.documents(s, d)
          .select(col("doc_id"),
            meta.getField("mime").as("meta_mime"),
            meta.getField("n_bytes").as("meta_n_bytes"),
            substring(hex(payload), 1, 16).as("head_hex"),
            (octet_length(payload).cast(LongType) / lit(100L)).cast(LongType)
              .as("n_frames"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               'text/plain' AS meta_mime,
               CAST(octet_length(encode(text)) AS BIGINT) AS meta_n_bytes,
               substr(hex(encode(text)), 1, 16) AS head_hex,
               CAST(octet_length(encode(text)) // 100 AS BIGINT) AS n_frames
        FROM documents ORDER BY doc_id""")),

    // ---- m03: overlapping analysis windows (audio-style STFT layout)
    // through the typed mapPartitions path — 200-byte windows every 100
    // bytes (50% overlap), final partial window kept iff ≥ half a
    // window remains. The oracle derives the identical emission rule
    // arithmetically.
    QueryDef(
      "m03_multimodal_windows",
      (s, d) =>
        Multimodal.sampleWindows(Multimodal.fromDocuments(s, d),
          width = 200, hop = 100)
          .toDF()
          .orderBy(col("doc_id"), col("window_no")),
      Some("""
        WITH m AS (
          SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        SELECT doc_id, CAST(i AS INT) AS window_no,
               CAST(i * 100 AS BIGINT) AS "offset",
               CAST(least(200, n - i * 100) AS BIGINT) AS length
        FROM m, unnest(range(0, n // 100 + 1)) t(i)
        WHERE i * 100 < n AND n - i * 100 >= 100
        ORDER BY doc_id, window_no""")),

    // ---- m02: multimodal frame sampling through the REAL typed path —
    // Dataset[MediaRecord] → mapPartitions (codec-init-per-partition
    // shape) → Dataset[FrameSample] — so the driver gate covers the
    // mapPartitions plumbing itself, not just m01's column projection.
    // One "frame" per stride bytes of payload; a real decoder swaps in
    // for the stub with no plumbing change (operators.Multimodal).
    QueryDef(
      "m02_multimodal_frames",
      (s, d) => {
        Multimodal.sampleFrames(Multimodal.fromDocuments(s, d), stride = 100)
          .toDF()
          .orderBy(col("doc_id"), col("frame_no"))
      },
      Some("""
        SELECT doc_id, CAST(i AS INT) AS frame_no,
               CAST(i * 100 AS BIGINT) AS "offset"
        FROM documents,
             unnest(range(0, octet_length(encode(text)) // 100)) t(i)
        ORDER BY doc_id, frame_no"""))
  )
}
