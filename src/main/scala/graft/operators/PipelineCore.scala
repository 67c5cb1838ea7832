package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Shared helpers for every pipeline suite: hash/shingle primitives,
  * determinism constants, the pinned keyed memo machinery, and the
  * localCheckpoint release discipline.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait PipelineCore { self: Pipeline.type =>

  private[operators] def words(c: Column): Column = split(c, "\\s+")

  /** Scale-adaptive scan fan-out for the FUSED map-side kernels (r19):
    * when an operator's whole cost is one codegen'd pass per row, its
    * parallelism is the SCAN's — and a small input (one parquet file,
    * one row group: every local fixture, any small dimension-ish
    * corpus) plans as ONE task, serializing work the pre-fusion
    * shuffle used to spread by accident. Round-robin repartition to
    * the session's default parallelism, but ONLY when the input plans
    * to fewer partitions: at real corpus scale the scan already
    * carries ≥ cores splits and this is a provable no-op (no exchange
    * enters the plan), so the 100 TB shape is untouched — the only
    * time the exchange exists is exactly when the data is small
    * enough for it to be trivially cheap. Derived from the ACTUAL
    * planned partition count, not a constant — the brief's
    * "scale-adaptive, not tuned for either local mode or the
    * cluster" rule. */
  private[operators] def fanOutSmallScan(df: DataFrame): DataFrame = {
    // streaming frames have no planned partition count to inspect (and
    // their micro-batch parallelism is the source's business) — no-op
    if (df.isStreaming) return df
    // LAZINESS GUARD (ADVICE r19 medium): with AQE on, `.rdd` on a plan
    // containing exchanges forces getFinalPhysicalPlan — every upstream
    // shuffle stage RUNS at DataFrame-construction time, its jobs are
    // thrown away, and the real action re-runs them. So inspect the
    // NON-adaptive physical plan first (planning only, no jobs): a
    // shuffle-derived input already carries the session's shuffle
    // parallelism and needs no fan-out; only an exchange-free plan
    // (scan / localCheckpoint — every in-repo caller) may consult
    // `.rdd`, where AQE has no stages to materialize and the call
    // stays lazy.
    val target = df.sparkSession.sparkContext.defaultParallelism
    val hasExchange = df.queryExecution.sparkPlan.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isDefined
    if (hasExchange) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** Sequential (left-to-right) double dot product of two float arrays —
    * matches DuckDB list_reduce over list_transform exactly. Backed by
    * the codegen'd [[graft.plans.FloatDotProduct]] expression
    * (registered via GraftExtensions) instead of interpreted
    * higher-order functions. */
  private[operators] def dot(a: Column, b: Column): Column =
    call_function("float_dot", a, b)

  private[operators] def cosine(dotAb: Column, n2a: Column, n2b: Column): Column =
    dotAb / (sqrt(n2a) * sqrt(n2b))

  /** Integer-scaling factor for exact centroid sums — the SINGLE copy
    * shared by [[kmeansFit]]/[[kmeansCluster]]/[[centroidOutliers]] and
    * spliced into the p21/p29 oracle SQL: the determinism contract
    * (bit-identical means across engines) requires every copy to agree,
    * so there is exactly one. */
  private[operators] val IntScale = 10000000L

  /** Default exact-Jaccard admission threshold for the minhash pair
    * graph — spliced into [[NeardupPairsSql]] so the oracle twin can
    * never drift from the function default. */
  private[operators] val DefaultJaccardMin = 0.5

  /** MinHash params: 32 universal-hash functions h_i(x)=(a_i x+b_i) mod p
    * over the 32-bit shingle ids; 8 bands × 4 rows. */
  private[operators] val MinhashP = 4294967311L

  private[operators] val NumHashes = 32

  private[operators] val BandRows = 4

  private[operators] def hashA(i: Int): Long = 2L * i + 1

  private[operators] def hashB(i: Int): Long = 99991L * i + 7

  /** Optimal LSH banding plan for a target Jaccard threshold — the
    * standard S-curve tuning (Leskovec/Rajaraman/Ullman, "Mining of
    * Massive Datasets" §3.4.3; the procedure datasketch ships as
    * `_optimal_param`): a (b bands × r rows) scheme admits a pair of
    * similarity s with probability 1 − (1 − s^r)^b, so pick the
    * (b, r) with b·r ≤ `numPerm` minimizing the weighted area of the
    * two error regions — FP = ∫₀ᵗ P(s) ds (dissimilar pairs that
    * bucket together and must be verified: wasted join work) and
    * FN = ∫ₜ¹ (1 − P(s)) ds (true near-dups the buckets miss:
    * recall loss). Midpoint rule at 1000 points; ties prefer fewer
    * bands (each band is a row in the bucket shuffle — at 100 TB,
    * b IS the LSH stage's shuffle amplification factor). Driver-side
    * pure function: feed the result to [[DedupOps.minhashNeardupPairs]]'
    * (bands, rows) parameters. */
  def minhashBandPlan(threshold: Double, numPerm: Int = NumHashes,
      wFalsePositive: Double = 0.5, wFalseNegative: Double = 0.5): (Int, Int) = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1), got $threshold")
    require(numPerm >= 1, s"numPerm must be >= 1, got $numPerm")
    require(wFalsePositive >= 0 && wFalseNegative >= 0 &&
      wFalsePositive + wFalseNegative > 0,
      "weights must be non-negative and not both zero")
    val grid = 1000
    def admitP(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    var best = (1, 1)
    var bestObj = Double.MaxValue
    var b = 1
    while (b <= numPerm) {
      val r = numPerm / b
      if (r >= 1) {
        var fp = 0.0
        var fn = 0.0
        var i = 0
        while (i < grid) {
          val sFp = threshold * (i + 0.5) / grid
          fp += admitP(sFp, b, r) * threshold / grid
          val sFn = threshold + (1.0 - threshold) * (i + 0.5) / grid
          fn += (1.0 - admitP(sFn, b, r)) * (1.0 - threshold) / grid
          i += 1
        }
        val obj = wFalsePositive * fp + wFalseNegative * fn
        if (obj < bestObj) { bestObj = obj; best = (b, r) }
      }
      b += 1
    }
    best
  }

  /** Distinct word-5-gram hash set of a words array (the p02/p19/p23
    * shingle artifact — one definition so the cluster keys can never
    * de-synchronize between operators). */
  private[graft] def shingleHashes(ws: Column): Column =
    call_function("kgram_hashes", ws, lit(5), lit(4))

  /** All-n minhash minima in ONE codegen'd pass over the shingle array
    * (the [[graft.plans.MinhashSignature]] expression — same universal
    * hashes as hashA/hashB, bit-identical integer arithmetic). */
  private[operators] def minhashSig(xs: Column, n: Int): Column =
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
  private[operators] val NgramDfCap = 1000

  /** p27 rarity bound: a bigram is "rare" when it appears in at most
    * this many distinct documents. */
  private[operators] val RareBigramDf = 2

  /** LSH bucket-size cap for the pair generators (p02/p26): the pair
    * explode is quadratic in bucket size, so one page duplicated 10^6
    * times would emit 10^12 pairs — the same scale-killer p04's
    * stop-gram cap bounds. A bucket larger than this is a mass-
    * duplicate class; pairwise output for it carries no information
    * per pair (run [[exactDedup]] first — the standard pipeline order
    * — and such buckets collapse before LSH ever sees them). Above
    * every fixture bucket size, so the driver-gated results stay
    * EXACT. */
  private[operators] val LshBucketCap = 1000

  /** p32 passage length in words: long enough that a shared passage
    * means copied text, not a common collocation. */
  private[operators] val PassageLen = 10

  /** p06 sign-random-projection LSH: 8 bands × 4 hyperplane-sign bits
    * bucket each label block so candidate pairing is bounded per
    * (label, band, sig) bucket instead of quadratic in the cluster. */
  private[operators] val SrpBands = 8

  private[operators] val SrpRows = 4

  private[operators] val EmbDim = 64

  /** Deterministic ±1 hyperplane weight for projection i, dimension d —
    * the parity of the first md5 byte of "srp-i-d". The oracle computes
    * the IDENTICAL formula in SQL (md5 is available in both engines), so
    * the buckets match by construction with no RNG anywhere. */
  private[operators] def srpWeight(i: Int, d: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srp-$i-$d".getBytes("UTF-8"))
      .take(1).map(b => f"${b & 0xff}%02x").mkString
    if (Integer.parseInt(hex, 16) % 2 == 0) 1 else -1
  }

  /** The k double-hashed table positions of a string key in [0, m) —
    * the Kirsch–Mitzenmacher scheme ("Less Hashing, Same Performance",
    * Random Struct. Alg. 2008): two base hashes from one md5 (h1 = the
    * first 48 bits, h2 = 2·(the next 48 bits)+1, forced odd so it is
    * coprime with any power-of-two m), position j = (h1 + j·h2) mod m.
    * One md5 per key serves any k — and the arithmetic stays exact in
    * 64-bit (h1 + j·h2 < 2⁴⁸ + k·2⁴⁹, far under 2⁶³ for any sane k), so
    * a DuckDB oracle replays it with the verbatim
    * `('0x'||substr(md5(key),…))::BIGINT` formula. Shared by the Bloom
    * membership gate ([[DedupOps.bloomDedup]]) and the Count-Min sketch
    * ([[TextOps.cmsSketch]]) so the two probabilistic structures can
    * never drift onto different hash families. NULL key → NULL. */
  private[operators] def doubleHashPositions(key: Column, k: Int, m: Int): Column = {
    require(k >= 1, s"need k >= 1 hash positions, got $k")
    require(m >= 1, s"need a positive table size, got $m")
    val h1 = conv(substring(md5(key), 1, 12), 16, 10).cast(LongType)
    val h2 = conv(substring(md5(key), 13, 12), 16, 10).cast(LongType) * 2 + 1
    transform(sequence(lit(0), lit(k - 1)),
      j => pmod(h1 + j * h2, lit(m.toLong)))
  }

  private[graft] trait PinnedEntry { var pins: Int = 0 }

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

  private[operators] def memoKey(s: SparkSession, d: String): String =
    s"${s.sparkContext.applicationId}:$d"

  /** Free a `localCheckpoint`'s executor blocks once the frame (and
    * everything derived from it) has had its LAST action. PUBLIC: this
    * is the release half of the checkpoint-lifecycle discipline that
    * [[Curation.CleanTextHandle]] and [[DedupOps.DedupChain]] package —
    * long-lived sessions that localCheckpoint their own intermediates
    * (e.g. a split table feeding several consumers) need the same
    * lever, or each checkpoint pins a table-sized copy on the
    * executors until the JVM exits. Walks the frame's logical plan for
    * LogicalRDD nodes, so it also reaches a checkpoint sitting beneath
    * projections (e.g. [[DedupOps.connectedComponents]]' returned
    * labels). Plan-shape-tolerant: if a future Spark stops exposing
    * the LogicalRDD, the collect finds nothing and we skip the release
    * (memory grows for the call, correctness unchanged). blocking =
    * false: no job waits on the removal. */
  def releaseLocalCheckpoint(df: DataFrame,
      blocking: Boolean = false): Unit =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking))

}
