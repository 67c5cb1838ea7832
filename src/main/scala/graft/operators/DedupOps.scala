package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Near-duplicate pair generation (MinHash-LSH / SimHash / n-gram
  * Jaccard), the shared connected-components dedup graph, and the
  * collapse / split / report consumers.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait DedupOps { self: Pipeline.type =>

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
      jaccardMin: Double = DefaultJaccardMin,
      bands: Int = NumHashes / BandRows, rows: Int = BandRows): DataFrame = {
    // (bands, rows) default to the registry-pinned 8×4 scheme; tune
    // with [[minhashBandPlan]] for other thresholds — more bands =
    // higher recall at lower thresholds, more rows = sharper cutoff.
    // bands·rows signature slots compute in the same single kernel
    // pass whatever the split.
    require(bands >= 1 && rows >= 1,
      s"need bands, rows >= 1, got ($bands, $rows)")
    val (xs, _, pairs) = minhashCandidates(corpus, idCol, textCol,
      bands, rows)

    // Exact-Jaccard verification: fetch the two shingle arrays and
    // intersect in place — bounded by bucket collisions (xs covers
    // only candidate docs, so AQE broadcasts whichever side is
    // smaller).
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

  /** One-permutation MinHash signatures ([[graft.plans.OphSignature]]
    * — Li/Owen/Zhang NIPS'12 + Shrivastava/Li ICML'14 densification):
    * the k-slot MinHash signature computed with ONE hash evaluation
    * per shingle instead of k — slot agreement / k estimates Jaccard
    * exactly like the classic signature, at 1/k the per-element cost
    * of the signature map pass (the whole-corpus stage at 100 TB).
    * Shares [[minhashNeardupPairs]]'s 5-gram shingle construction, so
    * signatures are comparable across any two corpora processed by
    * this library. Docs under 5 words carry no signature (the p02
    * contract). Output: (doc_id, oph_sig array&lt;long&gt;). Use
    * [[ophAgreement]] for the pairwise estimate. */
  def ophSignatures(corpus: DataFrame, idCol: String, textCol: String,
      numBins: Int = 32): DataFrame = {
    require(numBins >= 1 && numBins <= 64,
      s"numBins must be in [1, 64], got $numBins")
    corpus
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"),
        call_function("oph_sig", shingleHashes(col("ws")), lit(numBins))
          .as("oph_sig"))
  }

  /** Jaccard estimate from two [[ophSignatures]] columns: matching
    * slots / numBins, entirely map-side. */
  def ophAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v).cast(DoubleType) /
      size(a).cast(DoubleType)

  /** Near-dup pairs over [[ophSignatures]] — the [[minhashNeardupPairs]]
    * pipeline (band buckets → [[LshBucketCap]] → exact-Jaccard verify)
    * with the one-permutation signature supplying the bands, so the
    * full-corpus signature map pass costs ONE hash per shingle instead
    * of bands·rows. Same output contract: (doc_a, doc_b, jaccard ≥
    * `jaccardMin`), same verification arithmetic — only the CANDIDATE
    * set differs (OPH's slot randomness vs k independent hashes; both
    * are unbiased Jaccard samplers, so the S-curve tuning of
    * [[minhashBandPlan]] applies unchanged). */
  def ophNeardupPairs(corpus: DataFrame, idCol: String, textCol: String,
      jaccardMin: Double = DefaultJaccardMin,
      bands: Int = 4, rows: Int = 4): DataFrame = {
    val (xs, _, pairs) = ophCandidates(corpus, idCol, textCol, bands, rows)
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

  /** Shared candidate generation for [[ophNeardupPairs]] and
    * [[ophAccuracyReport]] — the [[minhashCandidates]] shape on the
    * one-permutation signature: (CANDIDATE-subset shingle-hash arrays;
    * candidate-subset OPH signatures; banded candidate pairs under
    * [[LshBucketCap]]). See [[minhashCandidates]] for why the verify
    * arrays are recomputed for the candidate subset instead of
    * persisting a corpus-sized frame. */
  private def ophCandidates(corpus: DataFrame, idCol: String,
      textCol: String, bands: Int, rows: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(bands >= 1 && rows >= 1,
      s"need bands, rows >= 1, got ($bands, $rows)")
    val k = bands * rows
    val docs = corpus
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 5)
    val sigs = docs.select(col("doc_id"),
      call_function("oph_sig", shingleHashes(col("ws")), lit(k)).as("sig"))
    val bucketed = sigs
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), array_join(transform(
          slice(col("sig"), b * rows + 1, lit(rows)),
          v => v.cast(StringType)), ",").as("key")))).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val pairs = bucketed
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= LshBucketCap)
      .select(explode(col("docs")).as("da"), col("docs"))
      .select(col("da"), explode(col("docs")).as("db"))
      .filter(col("da") < col("db"))
      .distinct()
    val candIds = pairs
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct()
    // the repartition plants an exchange at the top of the candidate
    // frame, so every verify-join arm (xa/xb and sa/sb) reads ONE
    // ReusedExchange instead of rescanning + rehashing the corpus per
    // arm — a candidate-sized shuffle buys 3 saved corpus scans
    val candXs = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingleHashes(col("ws")).as("xs"))
      .repartition(col("doc_id"))
    val candSigs = candXs.select(col("doc_id"),
      call_function("oph_sig", col("xs"), lit(k)).as("sig"))
    (candXs, candSigs, pairs)
  }

  /** Sketch-accuracy audit of the OPH signature — the
    * [[minhashAccuracyReport]] pattern on [[ophSignatures]]: for every
    * banded candidate pair, the slot-agreement Jaccard estimate vs the
    * exact shingle Jaccard, plus the decimal-averaged MAE over all
    * candidates. Audits the very pairs [[ophNeardupPairs]] acts on
    * (shared candidate generation). */
  def ophAccuracyReport(corpus: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rows: Int = 4): DataFrame = {
    val k = bands * rows
    val (xs, sigs, pairs) = ophCandidates(corpus, idCol, textCol,
      bands, rows)
    val scored = pairs
      .join(sigs.as("sa"), col("da") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("db") === col("sb.doc_id"))
      .join(xs.as("xa"), col("da") === col("xa.doc_id"))
      .join(xs.as("xb"), col("db") === col("xb.doc_id"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        aggregate(zip_with(col("sa.sig"), col("sb.sig"),
          (x, y) => (x === y).cast(LongType)), lit(0L), _ + _)
          .as("n_agree"),
        size(array_intersect(col("xa.xs"), col("xb.xs")))
          .cast(DoubleType).as("c"),
        size(col("xa.xs")).as("na"), size(col("xb.xs")).as("nb"))
      .select(col("doc_a"), col("doc_b"), col("n_agree"),
        (col("n_agree").cast(DoubleType) / k).as("est"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .withColumn("abs_err", abs(col("est") - col("jaccard")))
    val mae = scored.agg(graft.QueryDef.davg(col("abs_err")).as("mae"))
    scored.crossJoin(broadcast(mae))
  }

  /** Shared candidate generation for [[minhashNeardupPairs]] and
    * [[minhashAccuracyReport]]: (CANDIDATE-subset shingle-hash arrays;
    * candidate-subset signature arrays; LSH candidate pairs from
    * bucket collisions). The first two frames cover exactly the docs
    * appearing in `pairs` — every consumer joins them on pair ids, so
    * restricting them is free, and it is what lets this function hold
    * NO corpus-sized persist (the r17 cache-leak fix). */
  private def minhashCandidates(corpus: DataFrame, idCol: String,
      textCol: String, bands: Int, rows: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val numHashes = bands * rows
    val docs = corpus
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 5)
    // Per-doc distinct shingle-hash ARRAY, built map-side with
    // higher-order functions — no explode, no (doc,shingle) shuffle.
    // This is the expensive artifact (one md5 per 5-gram). It is NOT
    // persisted: the signature chain consumes it once map-side, and
    // the verification join recomputes it ONLY for the candidate
    // subset (see candXs below) — a corpus-sized MEMORY_AND_DISK
    // cache would leak for the session lifetime in embedding
    // libraries and, at 100 TB, spill a larger-than-corpus artifact
    // to executor disks; recomputing a candidate-bounded slice is
    // strictly cheaper.
    // (measured: distincting the 5-gram strings before the md5 saves
    // duplicate hashes but costs an extra string-array materialization
    // — net slower on this corpus, so hash-then-distinct stays)
    // All 32 minima in ONE codegen'd pass: the whole signature stage
    // is map-side, ZERO shuffle (the r03 plan shuffled every
    // (doc,shingle) pair through distinct + groupBy). Set sizes are
    // read off the arrays in the verification join.
    // (history: 32 separate transform+array_min columns = 32
    // interpreted traversals + 32 intermediate arrays per doc; a
    // 32-slot zip_with accumulator was ~19% slower still; the native
    // MinhashSignature expression does one traversal with a primitive
    // long[] accumulator inside whole-stage codegen)
    val mh = docs.select(col("doc_id"),
      minhashSig(shingleHashes(col("ws")), numHashes).as("mh"))

    val sigCols = (0 until bands).map(b =>
      concat_ws(",", (0 until rows).map(r =>
        element_at(col("mh"), b * rows + r + 1).cast(StringType)): _*)
        .as(s"sig$b"))
    val stackExpr = (0 until bands)
      .map(b => s"$b, sig$b").mkString(", ")
    val banded = mh.select(col("doc_id") +: sigCols: _*)
      .select(col("doc_id"),
        expr(s"stack($bands, $stackExpr) AS (band, sig)"))

    // The ONLY full shuffle in the pipeline: `bands` signature rows
    // per doc, grouped by (band, sig) — the LSH bucketing itself.
    val buckets = banded.groupBy(col("band"), col("sig"))
      .agg(array_sort(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= LshBucketCap)
    val pairs = buckets
      .select(explode(col("docs")).as("da"), col("docs"))
      .select(col("da"), explode(col("docs")).as("db"))
      .filter(col("da") < col("db"))
      .distinct()
    // Verify-side arrays for the CANDIDATE subset only: semi-join the
    // word arrays down to docs that appear in some pair, THEN hash.
    // Candidates are bucket-bounded (tiny vs the corpus), so this
    // recompute costs one corpus scan + a candidate-sized hash pass —
    // and the banded-bucket exchange above is computed once and
    // ReusedExchange'd across the pairs/candIds occurrences in the
    // final plan.
    val candIds = pairs
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .distinct()
    // exchange at the top of the candidate frame → every verify-join
    // arm reads ONE ReusedExchange instead of rescanning the corpus
    // (see ophCandidates; same trick)
    val candXs = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingleHashes(col("ws")).as("xs"))
      .repartition(col("doc_id"))
    val candMh = candXs.select(col("doc_id"),
      minhashSig(col("xs"), numHashes).as("mh"))
    (candXs, candMh, pairs)
  }

  /** MinHash estimation-accuracy report — the sketch-accuracy
    * companion to [[minhashNeardupPairs]] (the pattern p39 applies to
    * ANN recall, p78 to Count-Min overcounts and p86 to HLL): for
    * every LSH candidate pair, the textbook signature estimate
    * ĵ = (agreeing slots)/n — unbiased because P[slot agrees] = J —
    * beside the exact shingle Jaccard, plus the report-level mean
    * absolute error. This is how banding/permutation counts get
    * validated before a production dedup run commits to them. Same
    * bounded shapes as the dedup pass itself: candidates come only
    * from bucket collisions, and the shingle/signature artifacts are
    * recomputed for the candidate subset only. Output per candidate
    * pair: (doc_a, doc_b, n_agree, est, jaccard, abs_err) + the
    * constant `mae` column. */
  def minhashAccuracyReport(corpus: DataFrame, idCol: String,
      textCol: String, bands: Int = NumHashes / BandRows,
      rows: Int = BandRows): DataFrame = {
    require(bands >= 1 && rows >= 1,
      s"need bands, rows >= 1, got ($bands, $rows)")
    val n = bands * rows
    val (xs, mh, pairs) = minhashCandidates(corpus, idCol, textCol,
      bands, rows)
    val scored = pairs
      .join(mh.as("ma"), col("da") === col("ma.doc_id"))
      .join(mh.as("mb"), col("db") === col("mb.doc_id"))
      .join(xs.as("xa"), col("da") === col("xa.doc_id"))
      .join(xs.as("xb"), col("db") === col("xb.doc_id"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        aggregate(zip_with(col("ma.mh"), col("mb.mh"),
          (x, y) => (x === y).cast(LongType)), lit(0L), _ + _)
          .as("n_agree"),
        size(array_intersect(col("xa.xs"), col("xb.xs")))
          .cast(DoubleType).as("c"),
        size(col("xa.xs")).as("na"), size(col("xb.xs")).as("nb"))
      .select(col("doc_a"), col("doc_b"), col("n_agree"),
        (col("n_agree").cast(DoubleType) / n).as("est"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .withColumn("abs_err", abs(col("est") - col("jaccard")))
    val mae = scored.agg(graft.QueryDef.davg(col("abs_err")).as("mae"))
    scored.crossJoin(broadcast(mae))
  }

  /** Edit-distance-verified near-duplicates — the character-level
    * verification stage over the LSH candidate pairs (the RETSim/
    * SuffixArray-paper observation that shingle Jaccard misses small
    * EDITS inside shingles; exact Levenshtein is the ground-truth
    * verifier, affordable precisely because candidates are
    * bucket-bounded): for each [[minhashCandidates]] pair, the exact
    * edit distance between the two texts and the normalized similarity
    * 1 − d/max(len). Cost contract: Levenshtein is O(|a|·|b|) PER
    * PAIR — bounded by candidate count, not corpus size, but callers
    * with book-length docs should verify on a prefix or chunk.
    * Cross-engine note: Spark's levenshtein counts CODEPOINTS while
    * DuckDB's counts bytes — identical on ASCII (the gate corpus), a
    * documented divergence on multibyte text (the spec pins Spark's
    * codepoint semantics separately). Output: pairs with
    * sim ≥ minSim: (doc_a, doc_b, dist, len_a, len_b, sim). */
  def editDistanceNeardupPairs(corpus: DataFrame, idCol: String,
      textCol: String, minSim: Double = 0.8,
      bands: Int = NumHashes / BandRows, rows: Int = BandRows): DataFrame = {
    require(minSim >= 0 && minSim <= 1, s"minSim must be in [0,1], got $minSim")
    require(bands >= 1 && rows >= 1,
      s"need bands, rows >= 1, got ($bands, $rows)")
    val (_, _, pairs) = minhashCandidates(corpus, idCol, textCol,
      bands, rows)
    val txt = corpus.select(col(idCol).as("__tid"),
      col(textCol).as("__txt"))
    pairs
      .join(txt.as("ta"), col("da") === col("ta.__tid"))
      .join(txt.as("tb"), col("db") === col("tb.__tid"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        // THRESHOLDED Levenshtein (r19): banded DP, O(len·t) per pair
        // instead of the full O(len²) matrix over document texts. The
        // per-row threshold ceil((1−minSim)·maxLen)+1 over-covers the
        // admission bound by a full edit, so every pair the original
        // double-arithmetic sim filter could admit gets its EXACT
        // distance (the 3-arg function is exact at or under the
        // threshold); pairs past it return the -1 sentinel, which the
        // sim formula turns into sim = 1 + 1/maxLen — ABOVE any
        // minSim, so the `dist >= 0` predicate below is the
        // load-bearing exclusion of those pairs (do not drop or
        // reorder it). Every excluded pair is one the unthresholded
        // spelling scored below minSim, so the admitted pair set,
        // their dist and sim are bit-identical to it.
        call_function("levenshtein", col("ta.__txt"), col("tb.__txt"),
          (ceil((lit(1.0) - lit(minSim)) *
            greatest(length(col("ta.__txt")), length(col("tb.__txt")))
              .cast(DoubleType)) + 1).cast(IntegerType))
          .cast(LongType).as("dist"),
        length(col("ta.__txt")).cast(LongType).as("len_a"),
        length(col("tb.__txt")).cast(LongType).as("len_b"))
      .withColumn("sim", lit(1.0) - col("dist").cast(DoubleType) /
        greatest(col("len_a"), col("len_b")).cast(DoubleType))
      // dist >= 0 first: the -1 over-threshold sentinel would read as
      // sim > 1 in the formula; such pairs are exactly the ones the
      // unthresholded spelling scored below minSim
      .filter(col("dist") >= 0 && col("sim") >= minSim)
  }

  /** Containment-verified near-duplicate pairs (Broder '97: C(A→B) =
    * |A∩B| / |A| over the shingle sets): detects SUBSET duplication —
    * a document quoted or wholly embedded in a larger one — which
    * Jaccard systematically under-scores (a small doc inside a big one
    * has J ≈ |A|/|B| ≈ 0 while C(A→B) = 1; dropping such pairs is how
    * boilerplate-wrapped copies survive a Jaccard-only dedup). Same
    * LSH candidate chain as [[minhashNeardupPairs]] (shared
    * generation, same [[LshBucketCap]]); both directions are reported
    * and a pair survives when EITHER reaches `minContainment`. Recall
    * caveat: candidates still come from Jaccard-tuned LSH bands, so an
    * extreme-size-ratio containment pair may never collide in a band —
    * raise bands (or lower rows) when hunting those; what IS reported
    * is exact (the p124 oracle replays the identical chain). Output:
    * (doc_a, doc_b, containment_a, containment_b) where containment_a
    * = |A∩B|/|A| (how much of A is inside B). */
  def containmentNeardupPairs(corpus: DataFrame, idCol: String,
      textCol: String, minContainment: Double = 0.6,
      bands: Int = NumHashes / BandRows, rows: Int = BandRows): DataFrame = {
    require(minContainment > 0 && minContainment <= 1,
      s"minContainment must be in (0, 1], got $minContainment")
    require(bands >= 1 && rows >= 1,
      s"need bands, rows >= 1, got ($bands, $rows)")
    val (xs, _, pairs) = minhashCandidates(corpus, idCol, textCol,
      bands, rows)
    pairs
      .join(xs.as("xa"), col("da") === col("xa.doc_id"))
      .join(xs.as("xb"), col("db") === col("xb.doc_id"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        size(array_intersect(col("xa.xs"), col("xb.xs")))
          .cast(DoubleType).as("c"),
        size(col("xa.xs")).as("na"), size(col("xb.xs")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("c") / col("na").cast(DoubleType)).as("containment_a"),
        (col("c") / col("nb").cast(DoubleType)).as("containment_b"))
      .filter(greatest(col("containment_a"), col("containment_b"))
        >= minContainment)
  }

  /** Blocked record linkage over STRUCTURED entity tables — the
    * classic blocking-then-verify shape of the Fellegi-Sunter record-
    * linkage tradition (and of every production MDM/entity-resolution
    * pipeline): candidate pairs come ONLY from records sharing a
    * deterministic blocking key (`blockCols` — nation + segment, zip +
    * surname initial, …), then exact Levenshtein on `fieldCol`
    * verifies each candidate. Every other near-dup operator here keys
    * on document TEXT; this is the counterpart for entity tables
    * (customers, suppliers, users), where duplication means "the same
    * real-world entity typed twice" and the evidence lives in a short
    * name/address field, not a shingle set.
    *
    * Scale shape: ONE block-key shuffle; pair work is quadratic in
    * BLOCK size only, and blocks past `blockCap` are dropped loudly
    * via the [[LshBucketCap]] stance (a degenerate blocking key —
    * blocking a national registry on 'country' — must surface as a
    * modeling error, not as an executor OOM). Levenshtein cost is
    * O(|a|·|b|) per pair, affordable precisely because blocking
    * bounds the pair count; byte-vs-codepoint caveat as on
    * [[editDistanceNeardupPairs]]. Records with a NULL field never
    * link (their distance is NULL), and records with a NULL in ANY
    * blocking column never link either — blocking is KEY EQUALITY
    * (the SQL semantics the p134 oracle's self-join has), and a bare
    * groupBy would instead pool every key-less record into one
    * NULL-block that pairs strangers or silently vanishes past
    * blockCap (review r18). Output: (<blockCols>, id_a, id_b,
    * dist, sim) with dist ≤ maxDist, sim = 1 − dist/max(len). */
  def blockedRecordLinkage(records: DataFrame, idCol: String,
      blockCols: Seq[String], fieldCol: String, maxDist: Int,
      blockCap: Int = 1000): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockCap >= 2, s"blockCap must be >= 2, got $blockCap")
    val recs = records
      .filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        struct(blockCols.map(col): _*).as("__blk"),
        col(idCol).as("__rid"), col(fieldCol).as("__f"))
    val buckets = recs
      .groupBy(col("__blk"))
      .agg(sort_array(collect_list(struct(col("__rid"), col("__f"))))
        .as("rs"))
      .filter(size(col("rs")) > 1 && size(col("rs")) <= blockCap)
    // ordered pairs DIRECTLY (posexplode + tail slice): rs is sorted by
    // (__rid, __f), so pairing each element with its strict suffix
    // enumerates exactly the __rid-ascending pairs — half the generated
    // rows of the old explode² + id< filter, with no row ever built
    // just to be dropped (r19 measurement: the pair-row stream, not
    // Levenshtein itself, was the stage's cost at fixture scale).
    buckets
      .select(col("__blk"), posexplode(col("rs")).as(Seq("__i", "a")),
        col("rs"))
      .select(col("__blk"), col("a"),
        explode(slice(col("rs"), col("__i") + 2, size(col("rs")))).as("b"))
      // suffix pairing gives a.__rid <= b.__rid; the old explode² used
      // STRICT `<`, which also dropped duplicate-id pairs — keep that
      // exact semantics (near-free filter: only fires on dup ids)
      .filter(col("a.__rid") =!= col("b.__rid"))
      // exact length prefilter: dist >= |len(a) - len(b)|, so pairs
      // further apart than maxDist can never survive — an int compare
      // that skips the DP entirely on skewed-length fields (NULL
      // fields drop here exactly as their NULL distance dropped them)
      .filter(abs(length(col("a.__f")) - length(col("b.__f"))) <= maxDist)
      .select(blockCols.map(n => col("__blk").getField(n).as(n)) ++ Seq(
        col("a.__rid").as("id_a"), col("b.__rid").as("id_b"),
        // thresholded Levenshtein (banded DP, O(len·maxDist) per pair
        // and early exit, vs the full O(len²) matrix): returns -1 past
        // maxDist, and the exact distance — identical to the full
        // computation — at or under it, so the ≤ maxDist survivor set
        // and every reported dist are unchanged (p134 oracle replays
        // the UNthresholded arithmetic and still hash-matches)
        levenshtein(col("a.__f"), col("b.__f"), maxDist).cast(LongType)
          .as("dist"),
        greatest(length(col("a.__f")), length(col("b.__f")))
          .cast(DoubleType).as("__ml")): _*)
      .filter(col("dist") >= 0)
      .withColumn("sim", lit(1.0) - col("dist").cast(DoubleType) / col("__ml"))
      .drop("__ml")
  }

  /** Multimodal near-duplicate union report — the governance view a
    * paired-corpus curation (LAION-style caption+image datasets) needs
    * before deciding a dedup policy: which near-dup pairs does each
    * MODALITY catch? Takes the two pair tables the modality operators
    * already produce ([[minhashNeardupPairs]]-shaped (doc_a, doc_b,
    * jaccard) and [[Multimodal.imageNeardupPairs]]-shaped (doc_a,
    * doc_b, hamming)) and full-outer-joins them on the pair key:
    * `modality` says 'text', 'image' or 'both', with each side's
    * evidence column NULL where that modality did not fire. Filter
    * `modality = 'both'` for the strict policy (dup only when caption
    * AND image agree), or take everything for the aggressive one —
    * either way ONE report drives the decision. Scale shape: both
    * inputs are candidate-bounded pair tables, so the full-outer join
    * is pair-keyed and small regardless of corpus size. Output:
    * (doc_a, doc_b, jaccard, hamming, modality). */
  def multimodalNeardupPairs(textPairs: DataFrame,
      imagePairs: DataFrame): DataFrame = {
    Seq("doc_a", "doc_b", "jaccard").foreach(c => require(
      textPairs.columns.contains(c), s"textPairs needs column $c"))
    Seq("doc_a", "doc_b", "hamming").foreach(c => require(
      imagePairs.columns.contains(c), s"imagePairs needs column $c"))
    textPairs.select(col("doc_a"), col("doc_b"), col("jaccard"))
      .join(imagePairs.select(col("doc_a"), col("doc_b"), col("hamming")),
        Seq("doc_a", "doc_b"), "full_outer")
      .withColumn("modality",
        when(col("jaccard").isNotNull && col("hamming").isNotNull, "both")
          .when(col("jaccard").isNotNull, "text")
          .otherwise("image"))
  }

  /** CROSS-corpus near-duplicate scrub (the Dolma/BFF deployment
    * shape: match a NEW crawl against a REFERENCE corpus — yesterday's
    * training set, a licensed collection, an eval suite at document
    * granularity — without ever pairing new-vs-new or ref-vs-ref):
    * the [[minhashNeardupPairs]] chain with the band buckets built
    * PER SIDE and candidates taken only from the cross join of
    * same-(band, signature) buckets. Same arithmetic as the
    * within-corpus chain (identical shingle hashes, signature kernel
    * and band keys — a pair flagged here at (bands, rows) would also
    * collide within one merged corpus), so thresholds tune once.
    * Scale shape: signatures are map-side per side; ONE (band, sig)
    * shuffle each; the bucket join is key-equality (no cartesian);
    * each side's buckets are independently [[LshBucketCap]]-capped, so
    * a boilerplate signature explodes to at most cap² pairs; exact
    * Jaccard verification recomputes shingles for the CANDIDATE
    * subset only (no corpus-sized persist, the r17 discipline).
    * Asymmetric by design: `ref` never pairs with itself, so a
    * pre-deduped reference corpus is not re-examined. Anti-join the
    * flagged `doc_id`s against the new corpus to scrub. Output:
    * (doc_id ∈ new, ref_id ∈ ref, jaccard ≥ jaccardMin). */
  def minhashNeardupAgainstCorpus(newCorpus: DataFrame,
      refCorpus: DataFrame, idCol: String, textCol: String,
      jaccardMin: Double = DefaultJaccardMin,
      bands: Int = NumHashes / BandRows, rows: Int = BandRows): DataFrame = {
    require(jaccardMin > 0 && jaccardMin <= 1,
      s"jaccardMin must be in (0, 1], got $jaccardMin")
    require(bands >= 1 && rows >= 1,
      s"need bands, rows >= 1, got ($bands, $rows)")
    val numHashes = bands * rows
    def prep(c: DataFrame): DataFrame = c
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 5)
    // per-side (band, sig) buckets, each independently capped; no
    // `> 1` floor — a singleton bucket still matches the OTHER side
    def buckets(docs: DataFrame): DataFrame = {
      val mh = docs.select(col("doc_id"),
        minhashSig(shingleHashes(col("ws")), numHashes).as("mh"))
      val sigCols = (0 until bands).map(b =>
        concat_ws(",", (0 until rows).map(r =>
          element_at(col("mh"), b * rows + r + 1).cast(StringType)): _*)
          .as(s"sig$b"))
      val stackExpr = (0 until bands).map(b => s"$b, sig$b").mkString(", ")
      mh.select(col("doc_id") +: sigCols: _*)
        .select(col("doc_id"),
          expr(s"stack($bands, $stackExpr) AS (band, sig)"))
        .groupBy(col("band"), col("sig"))
        .agg(array_sort(collect_set(col("doc_id"))).as("docs"))
        .filter(size(col("docs")) <= LshBucketCap)
    }
    val newDocs = prep(newCorpus)
    val refDocs = prep(refCorpus)
    val pairs = buckets(newDocs).as("bn")
      .join(buckets(refDocs).withColumnRenamed("docs", "rdocs"),
        Seq("band", "sig"))
      .select(explode(col("docs")).as("doc_id"), col("rdocs"))
      .select(col("doc_id"), explode(col("rdocs")).as("ref_id"))
      .distinct()
    // verify = the inner joins themselves (r20): the old shape
    // semi-joined each side against `pairs` and repartitioned before
    // joining again — but an inner join on the id IS that filter, and
    // unlike the WITHIN-corpus minhashCandidates (where the candidate
    // frame feeds two verify arms and the repartition's exchange is
    // genuinely ReusedExchange'd), each cross-corpus candidate frame
    // feeds exactly ONE arm, so the semi bought no reuse while its
    // candIds arm re-evaluated the whole bucket-join `pairs` plan —
    // the r20 before-plan evaluates `pairs` THREE times (16 scans,
    // zero ReusedExchange). shingleHashes sits ABOVE the join, so only
    // candidate rows are hashed, exactly as before.
    pairs
      .join(newDocs.select(col("doc_id"), col("ws").as("__wa")),
        Seq("doc_id"))
      .join(refDocs.select(col("doc_id").as("ref_id"),
        col("ws").as("__wb")), Seq("ref_id"))
      .select(col("doc_id"), col("ref_id"),
        shingleHashes(col("__wa")).as("xs_a"),
        shingleHashes(col("__wb")).as("xs_b"))
      .select(col("doc_id"), col("ref_id"),
        size(array_intersect(col("xs_a"), col("xs_b")))
          .cast(DoubleType).as("c"),
        size(col("xs_a")).as("na"), size(col("xs_b")).as("nb"))
      .select(col("doc_id"), col("ref_id"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
  }

  /** Per-doc OPH band-key strings — the LSH bucket keys
    * [[ophNeardupPairs]] hashes on, exposed as ONE map-side array
    * column ("b|s₀,…,s₍rows₋₁₎" over the densified [[ophSignatures]]
    * slots of band b) so gates can probe them against a reference
    * structure without materializing the bucket table. Docs under 5
    * words and NULL text carry an EMPTY array — they never near-dup
    * (the p02 contract). Entirely map-side. */
  private[graft] def ophBandKeys(textCol: Column, bands: Int,
      rows: Int): Column = {
    val ws = words(textCol)
    val sig = call_function("oph_sig", shingleHashes(ws), lit(bands * rows))
    when(textCol.isNotNull && size(ws) >= 5,
      transform(sequence(lit(0), lit(bands - 1)), b =>
        concat(b.cast(StringType), lit("|"),
          array_join(transform(slice(sig, b * rows + 1, lit(rows)),
            v => v.cast(StringType)), ","))))
      .otherwise(array().cast("array<string>"))
  }

  /** Bloom filter over a REFERENCE corpus's OPH band keys — the
    * fixed-size (mBits/8-byte) broadcastable summary of "which LSH
    * buckets the reference occupies". At 100 TB the reference's bucket
    * table is data-sized and cannot broadcast; this filter is a fixed
    * budget that can, making reference-corpus near-dup gating a
    * map-side probe ([[neardupFlagAgainstBloom]] in batch,
    * [[graft.streaming.Streams.neardupGateAgainstCorpus]] on a
    * stream). Build once per snapshot and reuse; (mBits, k, bands,
    * rows) MUST match between build and probe — they parameterize the
    * hash family. Output: one row, one packed-bitset column. */
  def neardupBloomBuild(reference: DataFrame, textCol: String,
      mBits: Int, k: Int = 5,
      bands: Int = NumHashes / BandRows, rows: Int = BandRows): DataFrame = {
    require(bands * rows <= 64,
      s"bands*rows must be <= 64 oph bins, got ${bands * rows}")
    reference
      .select(explode(ophBandKeys(col(textCol), bands, rows)).as("__key"))
      .select(explode(doubleHashPositions(col("__key"), k, mBits))
        .as("__pos"))
      .distinct()
      .agg(sort_array(collect_list(col("__pos"))).as("__bloom"))
      .select(call_function("bitset_pack", col("__bloom"), lit(mBits))
        .as("__bloomBits"))
  }

  /** Flag every corpus doc whose ANY OPH band key the reference Bloom
    * filter claims to contain — near-dup-vs-reference gating at Bloom
    * cost (the [[minhashNeardupAgainstCorpus]] CANDIDATE stage without
    * the exact-verify join: a gate, not a report). Error surface is
    * the union of the two structures' documented trades: LSH misses a
    * true near-dup only when no band agrees (recall), and the Bloom
    * filter can claim an absent key with the usual (bits-set/m)^k
    * false-positive rate — so a flagged doc MIGHT be clean, a
    * non-flagged doc is clean up to LSH recall. Plan: the corpus
    * crossJoin(broadcast)s one fixed-size row and probes map-side —
    * the corpus never shuffles. Output: every caller column +
    * `neardup_in_ref`. */
  def neardupFlagAgainstBloom(corpus: DataFrame, textCol: String,
      bloom: DataFrame, mBits: Int, k: Int = 5,
      bands: Int = NumHashes / BandRows, rows: Int = BandRows): DataFrame = {
    require(!corpus.columns.contains("neardup_in_ref"),
      "corpus already has column neardup_in_ref — rename it before " +
        "calling neardupFlagAgainstBloom, which adds it")
    corpus
      .crossJoin(broadcast(bloom))
      .withColumn("neardup_in_ref",
        exists(ophBandKeys(col(textCol), bands, rows), key => {
          val pp = sort_array(array_distinct(
            doubleHashPositions(key, k, mBits)))
          call_function("bitset_count_set", pp, col("__bloomBits"))
            .cast(LongType) === size(pp).cast(LongType)
        }))
      .drop("__bloomBits")
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

  private val componentsMemo = new KeyedMemo[MemoEntry](ComponentsMemoCap,
    e => releaseLocalCheckpoint(e.df, blocking = true))

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
  final class SharedComponentsHandle private[operators] (
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

  /** Oracle-side twin of [[neardupPairs]] as a CTE chain ending in
    * `verified(doc_a, doc_b, jaccard)` — p02 and p25 splice it into
    * their oracle SQL so both engines derive the same pair graph. */
  /** [[NeardupPairsSql]] parameterized over the source relation — the
    * p118 chain gate runs the identical CTE arithmetic over the
    * exact-deduped survivors instead of raw `documents`. */
  private def neardupPairsSqlFrom(src: String): String = s"""
    w AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM $src
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

  private val NeardupPairsSql: String = neardupPairsSqlFrom("documents")

  /** Oracle twin of [[minhashNeardupAgainstCorpus]] for the p128
    * fixture split (new = even doc_ids, ref = odd): the p02 CTE
    * arithmetic duplicated per side, candidates from the (band, sig)
    * bucket JOIN across sides, each side's buckets independently
    * capped — ends in `xverified(doc_id, ref_id, jaccard)`. */
  private val NeardupAgainstSql: String = {
    def side(tag: String, pred: String) = s"""
      w$tag AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
        WHERE $pred
          AND len(string_split_regex(text, '\\s+')) >= 5),
      sh$tag AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8) AS BIGINT) AS x
        FROM w$tag, unnest(range(1, len(ws) - 3)) t(i)),
      mh$tag AS (
        SELECT doc_id, i, MIN((a*x + b) % $MinhashP) AS mh
        FROM sh$tag, params GROUP BY doc_id, i),
      sig$tag AS (
        SELECT doc_id, i // $BandRows AS band,
               string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
        FROM mh$tag GROUP BY doc_id, i // $BandRows),
      b$tag AS (
        SELECT band, sig, list(DISTINCT doc_id) AS docs
        FROM sig$tag GROUP BY band, sig
        HAVING COUNT(DISTINCT doc_id) <= $LshBucketCap)"""
    s"""params AS (
        SELECT i, 2*i + 1 AS a, 99991*i + 7 AS b
        FROM unnest(range(0, $NumHashes)) t(i)),
      ${side("N", "doc_id % 2 = 0")},
      ${side("R", "doc_id % 2 = 1")},
      cpairs AS (
        SELECT DISTINCT ta.d AS doc_id, tb.r AS ref_id
        FROM bN JOIN bR ON bN.band = bR.band AND bN.sig = bR.sig,
             unnest(bN.docs) ta(d), unnest(bR.docs) tb(r)),
      nsN AS (SELECT doc_id, COUNT(*) AS n FROM shN GROUP BY doc_id),
      nsR AS (SELECT doc_id, COUNT(*) AS n FROM shR GROUP BY doc_id),
      xinter AS (
        SELECT p.doc_id, p.ref_id, COUNT(*) AS c
        FROM cpairs p
        JOIN shN s1 ON s1.doc_id = p.doc_id
        JOIN shR s2 ON s2.doc_id = p.ref_id AND s2.x = s1.x
        GROUP BY p.doc_id, p.ref_id),
      xverified AS (
        SELECT i.doc_id, i.ref_id, i.c / (na.n + nb.n - i.c) AS jaccard
        FROM xinter i JOIN nsN na ON na.doc_id = i.doc_id
                      JOIN nsR nb ON nb.doc_id = i.ref_id
        WHERE i.c / (na.n + nb.n - i.c) >= $DefaultJaccardMin)"""
  }

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

  /** Soft deduplication (He et al. 2024, "SoftDedup: an Efficient Data
    * Reweighting Method for Speeding Up Language Model Pre-training",
    * ACL 2024 — the reweighting alternative to hard removal): instead
    * of DROPPING duplicates, every row gains `n_copies` (the size of
    * its exact-content group) and `soft_weight` = 1/n_copies, so each
    * distinct content's total sampling mass is equalized while the
    * corpus keeps its full diversity — feed the weight into
    * [[graft.operators.SamplingOps]] resampling or a trainer's example
    * weighting. NULL text never matches anything (per-row synthetic
    * key, weight 1 — the [[exactDedup]] stance). Same scale shape as
    * exactDedup: ONE shuffle on the content digest (a count window
    * instead of a rank window). All caller columns survive. */
  def softDedupWeights(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus
      .withColumn("n_copies", count(lit(1)).over(
        Window.partitionBy(coalesce(md5(col(textCol)),
          concat(lit("n:"), col(idCol).cast(StringType))))))
      .withColumn("soft_weight",
        lit(1.0) / col("n_copies").cast(DoubleType))

  /** Word-order-insensitive exact dedup: the canonical key is the md5
    * of the SORTED token multiset, so a doc whose words were merely
    * permuted (scraped tables re-serialized in a different order,
    * shuffled-sentence plagiarism, list pages) collapses onto its
    * twin even though the byte-level hash differs — the cheap
    * order-free layer between [[exactDedup]] (misses any reorder) and
    * [[minhashNeardupPairs]] (pays LSH for what is really an exact
    * multiset match). Multiset, not set: duplicate words are KEPT by
    * the sort, so "big big data" never collapses onto "big data".
    * Keeps the min-id row per key; NULL text never matches anything
    * (per-row synthetic key — the [[exactDedup]] stance); whitespace
    * runs normalize away (empty tokens removed). One shuffle on the
    * 128-bit digest, token sort entirely map-side. */
  def dedupBagOfWords(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus
      .withColumn("__rk", row_number().over(
        Window.partitionBy(coalesce(
            md5(array_join(array_sort(
              array_remove(words(col(textCol)), "")), " ")),
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


  /** Snapshot-over-snapshot corpus diff: classify every doc id across
    * two corpus versions as `added` (only in `curr`), `removed` (only
    * in `prev`), `changed` (both, different content hash) or
    * `unchanged` — the audit table every incremental ingest publishes
    * next to its new snapshot (which ids does the delta touch, how
    * much re-tokenization does it imply). NULL text hashes to NULL;
    * two NULL-text versions of an id count `unchanged` (no content to
    * differ), one-sided NULL counts `changed` — the same
    * NULL-is-not-content stance as [[exactDedup]]. Scale shape: ONE
    * id-keyed full-outer SortMergeJoin of the two snapshots (both
    * sides hash-partition on the id — with both snapshots bucketed by
    * id on disk this is exchange-free), content compare map-side via
    * md5; no collect, no skew hazard beyond the id key itself (unique
    * per side). Output: (doc_id, prev_hash, curr_hash, status). */
  def corpusDiff(prev: DataFrame, curr: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // explicit presence flags: after a full-outer join a NULL hash is
    // ambiguous (side absent vs side present with NULL text) — the
    // literal marker disambiguates, and <=> makes two NULL-text
    // versions compare unchanged
    def keyed(df: DataFrame, side: String): DataFrame = df
      .select(col(idCol).as("doc_id"),
        md5(col(textCol)).as(s"${side}_hash"),
        lit(true).as(s"__${side}_present"))
    keyed(prev, "prev")
      .join(keyed(curr, "curr"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("prev_hash"), col("curr_hash"),
        when(coalesce(col("__prev_present"), lit(false)) === false,
          lit("added"))
          .when(coalesce(col("__curr_present"), lit(false)) === false,
            lit("removed"))
          .when(col("prev_hash") <=> col("curr_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The set-bit positions of a Bloom filter over a reference corpus's
    * exact text content, as ONE sorted-array row ready to broadcast —
    * the build half of [[bloomDedup]] (Bloom, CACM 1970; the BFF shape
    * Dolma runs for snapshot-over-snapshot dedup — Soldaini et al.
    * 2024 §4.2: build a Bloom filter of everything already admitted,
    * drop incoming docs the filter claims to have seen). Each non-NULL
    * text sets its k [[doubleHashPositions]] bits of an `mBits`-wide
    * table. Scale shape: the position fan-out is map-side (k rows per
    * doc), the `.distinct()` partial-agg collapses repeats mapper-side
    * and bounds the shuffle by `mBits` KEYS — so the one-row gather
    * receives at most `mBits` rows, the filter's own memory budget, no
    * matter how large the reference corpus is. The sorted-position row
    * is the ORACLE representation (engine-replayable via the shared
    * `sorted_intersect_count` kernel but ~32× the broadcast bytes of a
    * bitset); production deploys broadcast the PACKED form instead —
    * [[bloomBuildBitset]] / [[bloomDedupPacked]], 128 MiB not 4 GiB at
    * the 2³⁰-bit filter a 100 TB snapshot wants — pinned flag-identical
    * to this form by BloomPackedSpec. */
  def bloomBuildPositions(reference: DataFrame, textCol: String,
      mBits: Int, k: Int): DataFrame =
    reference
      .filter(col(textCol).isNotNull)
      .select(explode(doubleHashPositions(col(textCol), k, mBits)).as("__pos"))
      .distinct()
      .agg(sort_array(collect_list(col("__pos"))).as("__bloom"))

  /** Bloom-filter membership dedup: flag every corpus doc whose exact
    * text the `reference` Bloom filter CLAIMS to contain — true
    * members always flag (no false negatives); a non-member can flag
    * with probability ≈ (bits-set/m)^k (the filter's documented false-
    * positive trade: at 100 TB the reference's exact key set is
    * data-sized, but the filter is a fixed `mBits` budget that
    * broadcasts). A doc is `in_bloom` when ALL of its k distinct
    * [[doubleHashPositions]] are set; `bloom_hits` reports how many
    * were (diagnostic — a near-miss scores k−1). NULL text never
    * flags, matching [[exactDedup]]'s NULL stance. Plan: the reference
    * collapses to ONE sorted-position row ([[bloomBuildPositions]]),
    * the corpus crossJoin(broadcast)s it and probes map-side via the
    * codegen'd sorted-merge intersect — the corpus itself never
    * shuffles and never joins anything data-sized. Output: every
    * caller column + (bloom_hits, in_bloom); drop flagged rows with
    * `.filter(!col("in_bloom"))`. */
  def bloomDedup(corpus: DataFrame, reference: DataFrame,
      textCol: String, mBits: Int, k: Int): DataFrame = {
    val bloomRow = bloomBuildPositions(reference, textCol, mBits, k)
    corpus
      .crossJoin(broadcast(bloomRow))
      .withColumn("__pp", sort_array(array_distinct(
        doubleHashPositions(col(textCol), k, mBits))))
      .withColumn("bloom_hits", coalesce(
        call_function("sorted_intersect_count", col("__pp"), col("__bloom"))
          .cast(LongType), lit(0L)))
      .withColumn("in_bloom", col(textCol).isNotNull &&
        col("bloom_hits") === size(col("__pp")).cast(LongType))
      .drop("__pp", "__bloom")
  }

  /** The PACKED build half: [[bloomBuildPositions]]' one gathered row,
    * bit-packed into ceil(mBits/64) longs by the codegen'd
    * `bitset_pack` kernel — identical m-bounded build shuffle (packing
    * is a map step on the single row), ~32× smaller broadcast. This is
    * the form a production snapshot persists and re-broadcasts. */
  def bloomBuildBitset(reference: DataFrame, textCol: String,
      mBits: Int, k: Int): DataFrame =
    bloomBuildPositions(reference, textCol, mBits, k)
      .select(call_function("bitset_pack", col("__bloom"), lit(mBits))
        .as("__bloomBits"))

  /** [[bloomDedup]] over the packed bitset: same flags (pinned by
    * BloomPackedSpec on randomized corpora), O(k) bit tests per doc
    * instead of the sorted-merge against the set-bit array, and the
    * broadcast is the fixed `mBits/8`-byte filter itself — the scale
    * path for raw-crawl snapshots where bits-set approaches m/2 and
    * the position array would be gigabytes. */
  def bloomDedupPacked(corpus: DataFrame, reference: DataFrame,
      textCol: String, mBits: Int, k: Int): DataFrame = {
    val bloomRow = bloomBuildBitset(reference, textCol, mBits, k)
    corpus
      .crossJoin(broadcast(bloomRow))
      .withColumn("__pp", sort_array(array_distinct(
        doubleHashPositions(col(textCol), k, mBits))))
      .withColumn("bloom_hits", coalesce(
        call_function("bitset_count_set", col("__pp"), col("__bloomBits"))
          .cast(LongType), lit(0L)))
      .withColumn("in_bloom", col(textCol).isNotNull &&
        col("bloom_hits") === size(col("__pp")).cast(LongType))
      .drop("__pp", "__bloomBits")
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
      dfCap: Int = NgramDfCap,
      // broadcast advisory: fail fast when the df-capped dictionary
      // exceeds ~4096·this many rows (see the guard below); the
      // default sits where the forced broadcast nears its hard cap
      dictMaxPerBucket: Int = 16384): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0,1], got $minJaccard")
    require(dictMaxPerBucket >= 1,
      s"dictMaxPerBucket must be >= 1, got $dictMaxPerBucket")
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
    // dictionary-size advisory (r20, VERDICT r19): the dictionary is
    // force-broadcast below, and a broadcast relation hard-caps at
    // 8 GB / 512M rows — an over-cap dictionary (CJK-extreme gram
    // spaces with a loose dfCap) would otherwise fail deep inside the
    // broadcast build with a driver OOM. Fail FAST and actionably
    // instead: the per-bucket rank already exists for gid assignment,
    // and buckets are hash-balanced, so rank > DictMaxPerBucket ≈
    // 16384 means the dictionary passed ~67M rows (× ~60 framed bytes
    // ≈ 4 GB — the loud side of safe). One integer compare per
    // dictionary row; fixture-scale dictionaries sit 4 orders below.
    val DictMaxPerBucket = dictMaxPerBucket
    val rank = row_number().over(Window.partitionBy(col("__b"))
      .orderBy(groupCols.map(col) :+ col("tri"): _*))
    val dfTab = tri0.groupBy(grp :+ col("tri"): _*)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .withColumn("__b", pmod(hash(grp :+ col("tri"): _*), lit(GidBuckets)))
      .withColumn("gid",
        when(rank > DictMaxPerBucket, raise_error(lit(
          s"ngramJaccardPairs: the df-capped gram dictionary exceeds " +
            s"~${GidBuckets.toLong * DictMaxPerBucket / 1000000}M rows — " +
            "past the forced-broadcast advisory. Tighten dfCap or add " +
            "groupCols so the dictionary stays broadcastable.")))
          .otherwise(rank)
          .cast("long") * GidBuckets + col("__b"))
      .drop("__b")
    // FORCED broadcast of the gram dictionary (r19): left to its size
    // estimates the planner inverted the build side at sf0.1 —
    // BroadcastExchange of the 712k-row CORPUS gram stream (tri0,
    // BuildLeft) probing the 1.7k-row dictionary — i.e. it broadcast
    // the side that scales with the corpus and streamed the side
    // bounded by charset^n per group (guide §3.1: size estimates after
    // aggregations are unreliable; hint the side you KNOW is small).
    // The dictionary is df-capped and charset-bounded, the corpus side
    // never is; a dictionary approaching the 8 GB broadcast cap
    // (CJK-extreme gram spaces) fails FAST on the DictMaxPerBucket
    // advisory above with an actionable error instead of degrading
    // into a broadcast-build driver OOM.
    val tri = tri0.join(broadcast(dfTab), groupCols :+ "tri")
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


  /** Near-dup collapse of ANY corpus: keep ONE representative (minimum
    * id) per connected near-dup component and every unpaired row — the
    * p30 plan as a reusable operator, preserving ALL caller columns.
    * `pairs` is any (first col, second col) = (id, id) pair table, e.g.
    * [[minhashNeardupPairs]] or [[simhashNeardupPairs]] output. */
  def collapseNeardups(corpus: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    collapseByComponents(corpus, idCol, connectedComponents(
      pairs.select(pairs.columns(0), pairs.columns(1))))

  /** The managed two-layer dedup chain of [[dedupChainManaged]]:
    * `deduped` is the surviving corpus (all caller columns), `report`
    * the component-size histogram of the NEAR layer ([[dedupReport]]),
    * `release()` frees the chain's localCheckpoint blocks once both
    * frames are written/consumed (the [[graft.operators.Curation]]
    * CleanHandle discipline). */
  final case class DedupChain(deduped: DataFrame, report: DataFrame,
      release: () => Unit)

  /** The standard production dedup chain as ONE managed operator —
    * exact content-hash dedup FIRST (mass-duplicate classes collapse
    * before LSH ever sees them, which is also what keeps
    * [[LshBucketCap]] from dropping their buckets), then minhash-LSH
    * near-dup collapse over the survivors. The component graph is
    * built ONCE and shared by the collapse and the report (the p34
    * fan-out stance: at 100 TB the graph build dominates every
    * consumer). Both intermediates are localCheckpoint-pinned — each
    * feeds two plan arms — and handed back for release. */
  def dedupChainManaged(corpus: DataFrame, idCol: String, textCol: String,
      jaccardMin: Double = DefaultJaccardMin,
      bands: Int = NumHashes / BandRows, rows: Int = BandRows): DedupChain = {
    val exact = exactDedup(corpus, idCol, textCol).localCheckpoint()
    // connectedComponents returns ALREADY-materialized labels (its
    // final round's eager localCheckpoint) — checkpointing again here
    // would copy the table AND leak the inner blocks: release() walks
    // the plan for LogicalRDDs, and a second checkpoint hides the
    // first one's rdd from it (the r18 composed-drive finding)
    val comps = connectedComponents(
      minhashNeardupPairs(exact, idCol, textCol, jaccardMin, bands, rows)
        .select(col("doc_a"), col("doc_b")))
    DedupChain(
      collapseByComponents(exact, idCol, comps),
      dedupReport(comps),
      () => {
        releaseLocalCheckpoint(exact, blocking = true)
        releaseLocalCheckpoint(comps, blocking = true)
      })
  }

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

  /** Quality-aware near-dup collapse: keep, per component, the member
    * maximizing `keepBy` (id tie-break) instead of
    * [[collapseByComponents]]' min-LABEL representative — the curation
    * stance real pipelines want when duplicates differ in quality
    * (keep the longest / highest-scored / least-boilerplate copy of a
    * page, drop its degraded mirrors). `keepBy` is any Column over the
    * corpus row (a length, a p10-style quality score, a perplexity).
    * NULL scores sort LAST (a missing score never beats a present
    * one). Plan shape: one corpus⋈components join (the component
    * table is bounded by the near-dup set — AQE broadcasts it at
    * curated scale), one rank window PARTITIONED by component, and
    * the same anti-join collapse; unpaired rows never enter the
    * window and always survive. */
  def collapseByComponentsBest(corpus: DataFrame, idCol: String,
      components: DataFrame, keepBy: Column): DataFrame = {
    val byBest = Window.partitionBy(col("component"))
      .orderBy(keepBy.desc_nulls_last, col(idCol).asc)
    val drop = corpus
      .join(components.withColumnRenamed("node", idCol), Seq(idCol))
      .withColumn("__rk", row_number().over(byBest))
      .filter(col("__rk") > 1)
      .select(col(idCol))
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
    * near-dup set); the corpus side hashes map-side.
    *
    * Lifecycle note: [[connectedComponents]]' returned labels are
    * localCheckpoint-materialized and the returned frame reads those
    * blocks — in a long-lived session, run [[connectedComponents]]
    * yourself, feed [[splitByComponents]], and release the labels with
    * [[PipelineCore.releaseLocalCheckpoint]] after the last action
    * (the composed-pipeline stress drive is the executable example). */
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
    // both edge directions from ONE evaluation of the pair plan (r19):
    // the old `half union half.reversed` evaluated `pairsDf` TWICE when
    // the persist materialized — and a CC input is typically the most
    // expensive plan in its whole operator (the cosine self-join in
    // p66, the banded-LSH verify in p118/p02). One explode of a
    // two-struct array emits the same rows from a single pass.
    // persisted PRE-PARTITIONED on dst (r20): every round's first join
    // probes edges by dst, and a cache with no layout re-shuffled the
    // full edge table once per round — the only edge-SCALE exchange in
    // the loop (the label tables are node-scale, and the neighbor-min
    // agg exchange carries only the map-side partial minima). One
    // repartition at build time removes it from every round: N rounds
    // keyed the same way share one exchange (guide §2.4), which at
    // 100 TB is one edge shuffle per CC call instead of one per round.
    val edges = pairsDf.select(a.as("src"), b.as("dst"))
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // round 1 FUSED into initialization (r19): the one shuffle that
    // used to build the distinct node set (labels = self) now also
    // computes each node's neighbor minimum in the same groupBy, so
    // labels start at min(self, min neighbor) — exactly the old round
    // 1's output (from self-labels, round 1 took min(self, min nbr)) —
    // and every call saves one full round: two joins, one checkpoint
    // materialization and one convergence count. Star-like near-dup
    // graphs that converged in 2 rounds now converge in 1.
    var labels = ckpt(edges.groupBy(col("src"))
      .agg(min(col("dst")).as("__m"))
      .select(col("src").as("node"),
        least(col("src"), col("__m")).as("lbl")))
    var changed = 1L
    var iter = 0
    // plain neighbor-min rounds before pointer-jumping kicks in: the
    // common near-dup graph converges within these, paying zero extra;
    // only graphs that are still moving after 3 rounds (deep chains)
    // take on the shortcut join's cost — exactly the graphs where
    // O(log d) instead of O(d) rounds pays for it many times over
    // one less than the pre-r19 value of 3: initialization now carries
    // round 1's propagation, so the same effective plain-round warmup
    // precedes the first shortcut join
    val ShortcutFromRound = 2
    // NOT delta-frontier (r20 measurement): joining edges against only
    // the CHANGED label rows per round (exact by monotonicity) was
    // measured WORSE at sf0.1 — p66's CC 2.2 → 3.2 s min-of-3 in the
    // same window: each round's fixed cost here is plan/stage
    // overhead, and the frontier arm adds plan nodes to every round.
    // Revisit only with a cluster-scale profile showing late-round
    // edge-join shuffle as the bottleneck.
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
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $iter changed=$changed")
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

  /** CROSS-SOURCE duplication matrix — the dedup GOVERNANCE report:
    * for every (source_a, source_b) pair, how many verified near-dup
    * pairs straddle the two sources and how similar they are. This is
    * the table that tells a corpus owner which feeds copy from each
    * other (a crawl mirroring a curated set, two crawls overlapping),
    * i.e. where dedup budget and licensing attention go — per-pair
    * evidence the aggregate [[dedupReport]] can't show. Source labels
    * are ordered lexicographically within a pair so (a, b) and (b, a)
    * accumulate into one cell; same-source duplication shows on the
    * diagonal. Scale shape: one broadcast-able join of the
    * bucket-bounded pair table against the corpus's (id, source)
    * projection, then a cells-bounded aggregate — the corpus never
    * shuffles more than that projection. `pairs` is
    * [[minhashNeardupPairs]]-shaped (doc_a, doc_b, jaccard). Output:
    * (source_a ≤ source_b, n_pairs, avg_jaccard — decimal-averaged,
    * cross-engine exact). */
  def crossSourceDupMatrix(corpus: DataFrame, idCol: String,
      sourceCol: String, pairs: DataFrame): DataFrame = {
    val src = corpus.select(col(idCol).as("__id"),
      col(sourceCol).cast(StringType).as("__src"))
    pairs
      .join(src.as("sa"), col("doc_a") === col("sa.__id"))
      .join(src.as("sb"), col("doc_b") === col("sb.__id"))
      .select(
        least(col("sa.__src"), col("sb.__src")).as("source_a"),
        greatest(col("sa.__src"), col("sb.__src")).as("source_b"),
        col("jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.QueryDef.davg(col("jaccard")).as("avg_jaccard"))
  }

  /** Composition report over the FULL dedup ladder — what each layer
    * removes and how the layers overlap, the audit a production
    * pipeline publishes alongside a curated corpus (and the question
    * that sizes each layer's budget: which docs does the semantic
    * layer catch that MinHash misses?). Layers over one corpus:
    *
    *  - `exact`     — non-first copies per content hash (the p01 rule)
    *  - `near`      — non-representative members of `components`
    *    (pass [[sharedComponents]] / [[connectedComponents]] output)
    *  - `substring` — docs [[dedupSubstringsGlobal]] cuts at
    *    `substringMinLen` (flag = any cut; words = words excised)
    *  - `semantic`  — optional: the ids the semantic layer REMOVED
    *    (e.g. corpus ids anti-joined against [[semDedup]] survivors),
    *    first column = id, joined by the shared id space
    *
    * Output rows: ('corpus','corpus') totals; one diagonal row per
    * layer with (n_docs flagged, n_words removed — whole-doc words
    * for exact/near/semantic, excised words for substring); one row
    * per layer PAIR (lexicographic, n_words NULL) counting docs both
    * flag; ('any','any') = docs at least one layer flags. One
    * aggregation over per-doc flags — every input is a frame the
    * ladder already computed; nothing re-derives. */
  def dedupLadderReport(corpus: DataFrame, idCol: String, textCol: String,
      components: DataFrame, substringMinLen: Int = 20,
      semanticRemoved: Option[DataFrame] = None): DataFrame = {
    val base = corpus.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("n_words",
        size(array_remove(words(col("__t")), "")).cast(LongType))
      .withColumn("f_exact", row_number().over(
        Window.partitionBy(coalesce(md5(col("__t")),
            concat(lit("n:"), col("doc_id").cast(StringType))))
          .orderBy(col("doc_id"))) > 1)
    val near = components.filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"), lit(true).as("__fn"))
    val sub = dedupSubstringsGlobal(corpus, idCol, textCol,
        minLen = substringMinLen)
      .select(col("doc_id"), col("n_cut_words"))
    val sem = semanticRemoved match {
      case Some(df) =>
        // dropDuplicates: a repeated removed id would fan the per-doc
        // row out through the left join and inflate EVERY count
        df.select(col(df.columns(0)).as("doc_id"), lit(true).as("__fs"))
          .dropDuplicates("doc_id")
      case None =>
        base.select(col("doc_id")).limit(0).withColumn("__fs", lit(true))
    }
    val perDoc = base
      .join(near, Seq("doc_id"), "left")
      .join(sub, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .select(col("n_words"), col("f_exact"),
        coalesce(col("__fn"), lit(false)).as("f_near"),
        (coalesce(col("n_cut_words"), lit(0L)) > 0).as("f_sub"),
        coalesce(col("n_cut_words"), lit(0L)).as("cut_words"),
        coalesce(col("__fs"), lit(false)).as("f_sem"))
    def d(c: Column) = sum(when(c, 1L).otherwise(0L))
    def ww(c: Column) = sum(when(c, col("n_words")).otherwise(0L))
    val m = perDoc.agg(
      count(lit(1)).as("n_total"), sum(col("n_words")).as("w_total"),
      d(col("f_exact")).as("d_e"), ww(col("f_exact")).as("w_e"),
      d(col("f_near")).as("d_n"), ww(col("f_near")).as("w_n"),
      d(col("f_sub")).as("d_s"), sum(col("cut_words")).as("w_s"),
      d(col("f_sem")).as("d_m"), ww(col("f_sem")).as("w_m"),
      d(col("f_exact") && col("f_near")).as("d_en"),
      d(col("f_exact") && col("f_sem")).as("d_em"),
      d(col("f_exact") && col("f_sub")).as("d_es"),
      d(col("f_near") && col("f_sem")).as("d_nm"),
      d(col("f_near") && col("f_sub")).as("d_ns"),
      d(col("f_sem") && col("f_sub")).as("d_ms"),
      d(col("f_exact") || col("f_near") || col("f_sub") || col("f_sem"))
        .as("d_any"))
    val nullW = "CAST(NULL AS BIGINT)"
    val rows =
      if (semanticRemoved.isDefined) Seq(
        "'corpus', 'corpus', n_total, w_total",
        "'exact', 'exact', d_e, w_e",
        "'near', 'near', d_n, w_n",
        "'semantic', 'semantic', d_m, w_m",
        "'substring', 'substring', d_s, w_s",
        s"'exact', 'near', d_en, $nullW",
        s"'exact', 'semantic', d_em, $nullW",
        s"'exact', 'substring', d_es, $nullW",
        s"'near', 'semantic', d_nm, $nullW",
        s"'near', 'substring', d_ns, $nullW",
        s"'semantic', 'substring', d_ms, $nullW",
        s"'any', 'any', d_any, $nullW")
      else Seq(
        "'corpus', 'corpus', n_total, w_total",
        "'exact', 'exact', d_e, w_e",
        "'near', 'near', d_n, w_n",
        "'substring', 'substring', d_s, w_s",
        s"'exact', 'near', d_en, $nullW",
        s"'exact', 'substring', d_es, $nullW",
        s"'near', 'substring', d_ns, $nullW",
        s"'any', 'any', d_any, $nullW")
    m.selectExpr(s"stack(${rows.size}, ${rows.mkString(", ")}) " +
      "AS (layer_a, layer_b, n_docs, n_words)")
  }

  /** Oracle-side twin of [[connectedComponents]] over the `verified`
    * pair CTE: ground-truth min-reachable via a recursive CTE, ending
    * in `comp(node, component)`. Shared by p25 and p30 (the splicing
    * query must open with WITH RECURSIVE). */
  private[operators] val ComponentsSql: String = """
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION ALL
      SELECT doc_b, doc_a FROM verified),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)"""

  /** DedupOps QueryDefs — registered through [[Pipeline.queries]];
    * names, plans and oracle SQL unchanged by the r15 module split. */
  /** The p114/p115/p117 oracle chain through candidate pairs +
    * exact-Jaccard ingredients — shared so all OPH gates certify ONE
    * pipeline. Ends at CTEs `dens` (signatures), `pairs`, `ns`,
    * `inter`. */
  private val OphCandidatesSql: String = s"""w AS (
          SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
          WHERE len(string_split_regex(text, '\\s+')) >= 5),
        sh AS (
          SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8)
                   AS BIGINT) AS x
          FROM w, unnest(range(1, len(ws) - 3)) t(i)),
        h AS (SELECT doc_id, (x + 7) % $MinhashP AS h FROM sh),
        bm AS (
          SELECT doc_id, h % 16 AS bin, MIN(h // 16) AS v
          FROM h GROUP BY doc_id, h % 16),
        grid AS (
          SELECT s.doc_id, t.j, bm.v
          FROM (SELECT DISTINCT doc_id FROM sh) s
          CROSS JOIN unnest(range(0, 16)) t(j)
          LEFT JOIN bm ON bm.doc_id = s.doc_id AND bm.bin = t.j),
        packed AS (
          SELECT doc_id, list(v ORDER BY j) AS vals FROM grid GROUP BY doc_id),
        dens AS (
          SELECT doc_id,
                 list_transform(range(0, 16), j ->
                   list_filter(list_transform(range(0, 16), t ->
                     CASE WHEN vals[((j + t) % 16) + 1] IS NOT NULL
                          THEN vals[((j + t) % 16) + 1] + $MinhashP * t
                     END), u -> u IS NOT NULL)[1]) AS sig
          FROM packed),
        bnd AS (
          SELECT doc_id, b,
                 array_to_string(sig[b*4 + 1 : b*4 + 4], ',') AS key
          FROM dens, unnest(range(0, 4)) t(b)),
        buckets AS (
          SELECT b, key, list_sort(list(DISTINCT doc_id)) AS docs
          FROM bnd GROUP BY b, key
          HAVING COUNT(DISTINCT doc_id) > 1
             AND COUNT(DISTINCT doc_id) <= $LshBucketCap),
        pairs AS (
          SELECT DISTINCT ta.da, tb.db
          FROM buckets, unnest(docs) ta(da), unnest(docs) tb(db)
          WHERE ta.da < tb.db),
        ns AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT p.da, p.db, COUNT(*) AS c
          FROM pairs p
          JOIN sh s1 ON s1.doc_id = p.da
          JOIN sh s2 ON s2.doc_id = p.db AND s2.x = s1.x
          GROUP BY p.da, p.db)"""

  private[operators] lazy val dedupQueries: Seq[QueryDef] = Seq(
    // ---- p113: bag-of-words dedup — [[dedupBagOfWords]] must collapse
    // word-order-permuted copies that byte-level exact dedup provably
    // misses. The fixture corpus has no natural permuted twins, so the
    // gate synthesizes them (the p108 injected-marker trick): every odd
    // doc's text is REPLACED by the descending-sorted word order of its
    // predecessor's text — a true permutation (same multiset, different
    // bytes except for ≤1-word docs). The oracle replays the twin
    // construction, the sorted-multiset key (DuckDB list_sort and
    // Spark array_sort agree on binary UTF-8 string order), the min-id
    // window and the NULL-text synthetic-key rule.
    QueryDef(
      "p113_bow_dedup",
      (s, d) => {
        val base = T.documents(s, d).select(col("doc_id"), col("text"))
        val prev = base.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__pt"))
        val marked = base.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("doc_id") % 2 === 1 && col("__pt").isNotNull,
              array_join(sort_array(
                array_remove(words(col("__pt")), ""), asc = false), " "))
              .otherwise(col("text")).as("t"))
        dedupBagOfWords(marked, "doc_id", "t")
          .select(col("doc_id"), md5(col("t")).as("content_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH prev AS (
          SELECT doc_id + 1 AS doc_id, text AS pt FROM documents),
        m AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 2 = 1 AND p.pt IS NOT NULL
                      THEN array_to_string(list_reverse_sort(
                             list_filter(string_split_regex(p.pt, '\s+'),
                               x -> x <> '')), ' ')
                      ELSE d.text END AS t
          FROM documents d LEFT JOIN prev p USING (doc_id)),
        k AS (
          SELECT doc_id, t,
                 COALESCE(md5(array_to_string(list_sort(
                     list_filter(string_split_regex(t, '\s+'),
                       x -> x <> '')), ' ')),
                   'n:' || CAST(doc_id AS VARCHAR)) AS bk
          FROM m),
        r AS (
          SELECT doc_id, t,
                 ROW_NUMBER() OVER (PARTITION BY bk ORDER BY doc_id) AS rk
          FROM k)
        SELECT doc_id, md5(t) AS content_md5
        FROM r WHERE rk = 1 ORDER BY doc_id""")),

    // ---- p114: one-permutation MinHash signatures —
    // [[ophSignatures]] at 16 bins over every (≥ 5-word) document.
    // The oracle replays the 5-gram shingle-hash set (the p02 CTE
    // arithmetic), the single (x+7) mod P hash, the per-bin minimum
    // quotient, and the rotation densification with its +P·t offsets
    // via nested list lambdas — every slot of every signature
    // bit-exact. At sf0.01 both genuinely-occupied and densified
    // (borrowed) slots occur: 16 bins over 30-120 shingles leaves
    // empty bins on the short docs.
    QueryDef(
      "p114_oph_signature",
      (s, d) =>
        ophSignatures(T.documents(s, d), "doc_id", "text", numBins = 16)
          .select(col("doc_id"),
            graft.QueryDef.canonArray(col("oph_sig")).as("oph_sig"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH w AS (
          SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
          WHERE len(string_split_regex(text, '\\s+')) >= 5),
        sh AS (
          SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8)
                   AS BIGINT) AS x
          FROM w, unnest(range(1, len(ws) - 3)) t(i)),
        h AS (SELECT doc_id, (x + 7) % $MinhashP AS h FROM sh),
        bm AS (
          SELECT doc_id, h % 16 AS bin, MIN(h // 16) AS v
          FROM h GROUP BY doc_id, h % 16),
        grid AS (
          SELECT s.doc_id, t.j, bm.v
          FROM (SELECT DISTINCT doc_id FROM sh) s
          CROSS JOIN unnest(range(0, 16)) t(j)
          LEFT JOIN bm ON bm.doc_id = s.doc_id AND bm.bin = t.j),
        packed AS (
          SELECT doc_id, list(v ORDER BY j) AS vals FROM grid GROUP BY doc_id),
        dens AS (
          SELECT doc_id,
                 list_transform(range(0, 16), j ->
                   list_filter(list_transform(range(0, 16), t ->
                     CASE WHEN vals[((j + t) % 16) + 1] IS NOT NULL
                          THEN vals[((j + t) % 16) + 1] + $MinhashP * t
                     END), u -> u IS NOT NULL)[1]) AS sig
          FROM packed)
        SELECT doc_id,
               '[' || array_to_string(sig, ',') || ']' AS oph_sig
        FROM dens ORDER BY doc_id""")),

    // ---- p117: OPH accuracy report — [[ophAccuracyReport]] over the
    // shared candidate chain: per candidate the slot-agreement
    // estimate, the exact shingle Jaccard, the absolute error, and
    // the decimal-averaged MAE broadcast onto every row (the p94
    // pattern on the one-permutation signature). The oracle reads the
    // SAME dens/pairs/ns/inter CTEs as p115.
    QueryDef(
      "p117_oph_accuracy",
      (s, d) =>
        ophAccuracyReport(T.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH $OphCandidatesSql,
        agr AS (
          SELECT p.da, p.db,
                 CAST(len(list_filter(range(1, 17),
                   i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)]))
                   AS BIGINT) AS n_agree
          FROM pairs p
          JOIN dens sa ON sa.doc_id = p.da
          JOIN dens sb ON sb.doc_id = p.db),
        scored AS (
          SELECT a.da AS doc_a, a.db AS doc_b, a.n_agree,
                 CAST(a.n_agree AS DOUBLE) / 16 AS est,
                 CAST(i.c AS DOUBLE) / (na.n + nb.n - i.c) AS jaccard
          FROM agr a
          JOIN inter i ON i.da = a.da AND i.db = a.db
          JOIN ns na ON na.doc_id = a.da
          JOIN ns nb ON nb.doc_id = a.db),
        s2 AS (
          SELECT doc_a, doc_b, n_agree, est, jaccard,
                 abs(est - jaccard) AS abs_err
          FROM scored),
        m AS (SELECT ${graft.QueryDef.davgSql("abs_err")} AS mae FROM s2)
        SELECT s2.*, m.mae FROM s2, m
        ORDER BY doc_a, doc_b""")),

    // ---- p119: SoftDedup reweighting — [[softDedupWeights]] with
    // injected exact duplicates (the p113/p118 twin trick: doc_id % 9
    // == 4 copies its predecessor's text) so copy groups of size > 1
    // exist; the oracle replays the synthetic-key count window and the
    // exact 1/n division (n small integer → IEEE-exact both engines).
    QueryDef(
      "p119_soft_dedup",
      (s, d) => {
        val base = T.documents(s, d).select(col("doc_id"), col("text"))
        val prev = base.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__pt"))
        val marked = base.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("doc_id") % 9 === 4 && col("__pt").isNotNull,
              col("__pt")).otherwise(col("text")).as("t"))
        softDedupWeights(marked, "doc_id", "t")
          .select(col("doc_id"), col("n_copies"), col("soft_weight"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH prevd AS (
          SELECT doc_id + 1 AS doc_id, text AS pt FROM documents),
        m AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 9 = 4 AND p.pt IS NOT NULL
                      THEN p.pt ELSE d.text END AS t
          FROM documents d LEFT JOIN prevd p USING (doc_id))
        SELECT doc_id,
               COUNT(*) OVER (PARTITION BY
                 COALESCE(md5(t), 'n:' || CAST(doc_id AS VARCHAR)))
                 AS n_copies,
               1.0 / CAST(COUNT(*) OVER (PARTITION BY
                 COALESCE(md5(t), 'n:' || CAST(doc_id AS VARCHAR)))
                 AS DOUBLE) AS soft_weight
        FROM m ORDER BY doc_id""")),

    // ---- p121: soft-dedup-weighted Gumbel resampling — the p70-style
    // COMPOSITION gate: [[softDedupWeights]]' 1/n_copies weights feed
    // [[graft.operators.SamplingOps]]' resampleByImportance (RNG-free
    // Gumbel-top-k, the p51 machinery) so duplicates' equalized mass
    // drives the actual draw — the SoftDedup paper's end use. The
    // oracle splices the p119 weight window into the p51 gumbel-key
    // arithmetic verbatim.
    QueryDef(
      "p121_soft_resample",
      (s, d) => {
        val base = T.documents(s, d).select(col("doc_id"), col("text"))
        val prev = base.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__pt"))
        val marked = base.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("doc_id") % 9 === 4 && col("__pt").isNotNull,
              col("__pt")).otherwise(col("text")).as("t"))
        resampleByImportance(
          softDedupWeights(marked, "doc_id", "t"),
          "doc_id", "soft_weight", k = 100)
          .select(col("doc_id"), col("n_copies"), col("soft_weight"),
            col("gumbel_key"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH prevd AS (
          SELECT doc_id + 1 AS doc_id, text AS pt FROM documents),
        m AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 9 = 4 AND p.pt IS NOT NULL
                      THEN p.pt ELSE d.text END AS t
          FROM documents d LEFT JOIN prevd p USING (doc_id)),
        wgt AS (
          SELECT doc_id,
                 COUNT(*) OVER (PARTITION BY
                   COALESCE(md5(t), 'n:' || CAST(doc_id AS VARCHAR)))
                   AS n_copies,
                 1.0 / CAST(COUNT(*) OVER (PARTITION BY
                   COALESCE(md5(t), 'n:' || CAST(doc_id AS VARCHAR)))
                   AS DOUBLE) AS soft_weight
          FROM m),
        keyed AS (
          SELECT doc_id, n_copies, soft_weight,
                 soft_weight / 1.0 + round(-ln(-ln(
                   (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                      AS BIGINT) + 0.5) / 281474976710656.0)), 9)
                   AS gumbel_key
          FROM wgt)
        SELECT doc_id, n_copies, soft_weight, gumbel_key
        FROM keyed
        QUALIFY ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id ASC)
          <= 100
        ORDER BY doc_id""")),

    // ---- p118: the production dedup CHAIN (exact → minhash collapse
    // + report) certified cross-engine in ORDER — the composition
    // `graft dedup` ships ([[dedupChainManaged]]; DedupCliSpec pins
    // CLI ≡ these pieces, this gate pins the pieces' composition).
    // The fixture has no exact duplicates, so the gate synthesizes
    // them (the p113 trick): every doc_id % 9 == 4 row REPLACES its
    // text with the previous doc's verbatim — the exact layer must
    // collapse those BEFORE LSH ever sees them, and the near layer
    // then runs over the survivors. The oracle replays the injection,
    // the md5 keep-min-id window, the full minhash chain OVER THE
    // SURVIVORS (the parameterized CTE source), the recursive closure
    // and both consumers' outputs in one sectioned result.
    QueryDef(
      "p118_dedup_chain",
      (s, d) => {
        val base = T.documents(s, d).select(col("doc_id"), col("text"))
        val prev = base.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__pt"))
        val marked = base.join(prev, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("doc_id") % 9 === 4 && col("__pt").isNotNull,
              col("__pt")).otherwise(col("text")).as("text"))
        val exact = exactDedup(marked, "doc_id", "text")
        val comps = connectedComponents(
          minhashNeardupPairs(exact, "doc_id", "text")
            .select(col("doc_a"), col("doc_b")))
        val nullL = lit(null).cast(LongType)
        val kept = collapseByComponents(exact, "doc_id", comps)
          .select(lit("kept").as("section"), col("doc_id").as("k"),
            nullL.as("v1"), nullL.as("v2"))
        val report = dedupReport(comps)
          .select(lit("report").as("section"), col("csize").as("k"),
            col("n_components").as("v1"), col("docs_removed").as("v2"))
        kept.unionByName(report).orderBy(col("section"), col("k"))
      },
      Some(s"""
        WITH RECURSIVE prevd AS (
          SELECT doc_id + 1 AS doc_id, text AS pt FROM documents),
        m AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 9 = 4 AND p.pt IS NOT NULL
                      THEN p.pt ELSE d.text END AS t
          FROM documents d LEFT JOIN prevd p USING (doc_id)),
        ex AS (
          SELECT doc_id, t AS text FROM (
            SELECT doc_id, t, ROW_NUMBER() OVER (
              PARTITION BY COALESCE(md5(t), 'n:' || CAST(doc_id AS VARCHAR))
              ORDER BY doc_id) AS rk
            FROM m) WHERE rk = 1),
        ${neardupPairsSqlFrom("ex")},
        $ComponentsSql,
        sizes AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
          FROM comp GROUP BY component)
        SELECT 'kept' AS section, doc_id AS k,
               CAST(NULL AS BIGINT) AS v1, CAST(NULL AS BIGINT) AS v2
        FROM ex
        WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
        UNION ALL
        SELECT 'report', csize, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(csize) - COUNT(*) AS BIGINT)
        FROM sizes GROUP BY csize
        ORDER BY section, k""")),

    // ---- p115: OPH near-dup pairs — [[ophNeardupPairs]] at 4×4 bands
    // over the 16-slot p114 signature: band buckets, the LshBucketCap
    // guard, and the exact-Jaccard verification all replayed on the
    // densified one-permutation slots. Certifies the full cheap-
    // signature dedup path end to end (candidates AND verified pairs),
    // not just the signature table.
    QueryDef(
      "p115_oph_neardup",
      (s, d) =>
        ophNeardupPairs(T.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH $OphCandidatesSql
        SELECT i.da AS doc_a, i.db AS doc_b,
               CAST(i.c AS DOUBLE) / (na.n + nb.n - i.c) AS jaccard
        FROM inter i
        JOIN ns na ON na.doc_id = i.da
        JOIN ns nb ON nb.doc_id = i.db
        WHERE CAST(i.c AS DOUBLE) / (na.n + nb.n - i.c) >= 0.5
        ORDER BY doc_a, doc_b""")),

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

    // ---- p124: containment-verified pairs over the SAME candidate
    // chain as p02 — the subset-duplication verifier (max containment
    // ≥ Jaccard always, so this surfaces a superset of p02's pairs at
    // the same threshold). The oracle reuses p02's CTE chain down to
    // the exact intersection counts and replays the containment
    // division per direction.
    QueryDef(
      "p124_containment_pairs",
      (s, d) => containmentNeardupPairs(T.documents(s, d), "doc_id",
        "text", minContainment = 0.6)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH $NeardupPairsSql,
        cont AS (
          SELECT i.da AS doc_a, i.db AS doc_b,
                 i.c / na.n AS containment_a,
                 i.c / nb.n AS containment_b
          FROM inter i
          JOIN ns na ON na.doc_id = i.da
          JOIN ns nb ON nb.doc_id = i.db
          WHERE GREATEST(i.c / na.n, i.c / nb.n) >= CAST(0.6 AS DOUBLE))
        SELECT doc_a, doc_b, containment_a, containment_b
        FROM cont ORDER BY doc_a, doc_b""")),

    // ---- p128: cross-corpus near-dup scrub — the fixture splits
    // documents by doc_id parity (new = even, ref = odd; 12 of p02's
    // 25 verified pairs cross the parity line, so the gate has real
    // matches to certify). The oracle duplicates the p02 CTE chain
    // per side and takes candidates ONLY from the cross bucket join —
    // a within-side duplicate pair appearing in the result would
    // hash-mismatch immediately.
    QueryDef(
      "p128_neardup_against_corpus",
      (s, d) => {
        val docs = T.documents(s, d)
        minhashNeardupAgainstCorpus(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1),
          "doc_id", "text")
          .orderBy(col("doc_id"), col("ref_id"))
      },
      Some(s"""
        WITH $NeardupAgainstSql
        SELECT doc_id, ref_id, jaccard FROM xverified
        ORDER BY doc_id, ref_id""")),

    // ---- p129: the near-dup-vs-reference BLOOM gate — OPH band keys
    // (the p114 densified-signature arithmetic at 16 bins) hashed into
    // a p104-style packed Bloom filter built over the doc_id%3=0
    // reference slice, then every doc probed map-side ("any band key
    // claimed present" flags). The oracle replays the whole
    // composition — OPH dens chain → band-key strings → double-hash
    // positions → set-membership probe — so even the filter's false
    // positives (deterministic at mBits=4096) must match bit-for-bit.
    QueryDef(
      "p129_neardup_bloom_gate",
      (s, d) => {
        val docs = T.documents(s, d)
        neardupFlagAgainstBloom(docs.select(col("doc_id"), col("text")),
          "text",
          neardupBloomBuild(docs.filter(col("doc_id") % 3 === 0), "text",
            mBits = 4096, k = 3, bands = 4, rows = 4),
          mBits = 4096, k = 3, bands = 4, rows = 4)
          .select(col("doc_id"), col("neardup_in_ref"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
          WHERE len(string_split_regex(text, '\\s+')) >= 5),
        sh AS (
          SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 8)
                   AS BIGINT) AS x
          FROM w, unnest(range(1, len(ws) - 3)) t(i)),
        h AS (SELECT doc_id, (x + 7) % $MinhashP AS h FROM sh),
        bm AS (
          SELECT doc_id, h % 16 AS bin, MIN(h // 16) AS v
          FROM h GROUP BY doc_id, h % 16),
        grid AS (
          SELECT s.doc_id, t.j, bm.v
          FROM (SELECT DISTINCT doc_id FROM sh) s
          CROSS JOIN unnest(range(0, 16)) t(j)
          LEFT JOIN bm ON bm.doc_id = s.doc_id AND bm.bin = t.j),
        packed AS (
          SELECT doc_id, list(v ORDER BY j) AS vals FROM grid GROUP BY doc_id),
        dens AS (
          SELECT doc_id,
                 list_transform(range(0, 16), j ->
                   list_filter(list_transform(range(0, 16), t ->
                     CASE WHEN vals[((j + t) % 16) + 1] IS NOT NULL
                          THEN vals[((j + t) % 16) + 1] + $MinhashP * t
                     END), u -> u IS NOT NULL)[1]) AS sig
          FROM packed),
        keys AS (
          SELECT doc_id,
                 b || '|' || array_to_string(sig[b*4 + 1 : b*4 + 4], ',') AS key
          FROM dens, unnest(range(0, 4)) t(b)),
        kh AS (
          SELECT doc_id, key,
                 CAST('0x' || substr(md5(key), 1, 12) AS BIGINT) AS h1,
                 2 * CAST('0x' || substr(md5(key), 13, 12) AS BIGINT) + 1 AS h2
          FROM keys),
        refbits AS (
          SELECT DISTINCT (h1 + j * h2) % 4096 AS pos
          FROM kh, unnest(range(0, 3)) t(j)
          WHERE doc_id % 3 = 0),
        bloom AS (SELECT list_sort(list(pos)) AS bs FROM refbits),
        kp AS (
          SELECT doc_id, key,
                 list_sort(list_distinct(list((h1 + j * h2) % 4096))) AS ps
          FROM kh, unnest(range(0, 3)) t(j)
          GROUP BY doc_id, key),
        probe AS (
          SELECT kp.doc_id,
                 bool_or(len(list_filter(ps, p -> list_contains(bs, p)))
                   = len(ps)) AS neardup_in_ref
          FROM kp CROSS JOIN bloom
          GROUP BY kp.doc_id)
        SELECT d.doc_id, COALESCE(p.neardup_in_ref, FALSE) AS neardup_in_ref
        FROM documents d LEFT JOIN probe p ON p.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---- p131: cross-source duplication matrix over the p02 verified
    // pairs — the governance report (which sources copy from each
    // other). The oracle reuses the full NeardupPairsSql chain and
    // replays the ordered-pair cells and the decimal-exact mean.
    QueryDef(
      "p131_cross_source_dup_matrix",
      (s, d) => crossSourceDupMatrix(T.documents(s, d), "doc_id",
        "source", neardupPairs(s, d))
        .orderBy(col("source_a"), col("source_b")),
      Some(s"""
        WITH $NeardupPairsSql,
        cells AS (
          SELECT LEAST(da.source, db.source) AS source_a,
                 GREATEST(da.source, db.source) AS source_b,
                 v.jaccard
          FROM verified v
          JOIN documents da ON da.doc_id = v.doc_a
          JOIN documents db ON db.doc_id = v.doc_b)
        SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ${graft.QueryDef.davgSql("jaccard")} AS avg_jaccard
        FROM cells GROUP BY source_a, source_b
        ORDER BY source_a, source_b""")),

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

    // ---- p140: quality-aware near-dup collapse —
    // [[collapseByComponentsBest]] over the SAME shared component
    // graph as p30, keeping the LONGEST member (n_chars) per component
    // instead of the min-label one. The oracle reuses the p30 CTE
    // chain and replays the per-component (n_chars DESC NULLS LAST,
    // id) rank; the two gates together certify that representative
    // POLICY, not component structure, is the only difference.
    QueryDef(
      "p140_collapse_best",
      (s, d) =>
        collapseByComponentsBest(
          T.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id", sharedComponents(s, d), keepBy = col("n_chars"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH RECURSIVE $NeardupPairsSql,
        $ComponentsSql,
        members AS (
          SELECT d.doc_id,
                 ROW_NUMBER() OVER (PARTITION BY c.component
                   ORDER BY d.n_chars DESC NULLS LAST, d.doc_id) AS rk
          FROM documents d JOIN comp c ON d.doc_id = c.node)
        SELECT doc_id, lang, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM members WHERE rk > 1)
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

    // ---- p75: the dedup-LADDER composition report —
    // [[dedupLadderReport]] over exact (content hash), near (the p34
    // shared component graph) and substring (Lee'22 at minLen=10, the
    // p56 config) layers: per-layer docs/words removed plus every
    // pairwise overlap — the audit that shows what each layer
    // uniquely catches. The oracle recomputes all three flags (md5
    // copy rank, the recursive component table, the p56 rolling-hash
    // cut chain) and the one matrix aggregation. The semantic
    // (SemDeDup) layer rides the same operator via its optional input
    // — spec-gated in PipelineSpec (its k-means chain is p66's gate).
    QueryDef(
      "p75_dedup_ladder",
      (s, d) =>
        dedupLadderReport(T.documents(s, d), "doc_id", "text",
          sharedComponents(s, d), substringMinLen = 10)
          .orderBy(col("layer_a"), col("layer_b")),
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 9)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH RECURSIVE $NeardupPairsSql,
        $ComponentsSql,
        d AS (
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
        cuts AS (
          SELECT doc_id, CAST(MIN(pos) AS INT) AS cs,
                 CAST(MAX(pos) + 10 AS INT) AS ce
          FROM grp GROUP BY doc_id, gid),
        ca AS (
          SELECT doc_id, CAST(SUM(ce - cs) AS BIGINT) AS cw
          FROM cuts GROUP BY doc_id),
        pd AS (
          SELECT nn.doc_id, CAST(nn.n AS BIGINT) AS n_words,
                 (ROW_NUMBER() OVER (PARTITION BY md5(nn.text)
                    ORDER BY nn.doc_id) > 1) AS f_e,
                 (rm.node IS NOT NULL) AS f_n,
                 COALESCE(ca.cw, 0) AS cw
          FROM nn
          LEFT JOIN (SELECT node FROM comp WHERE node <> component) rm
            ON rm.node = nn.doc_id
          LEFT JOIN ca ON ca.doc_id = nn.doc_id),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                 CAST(SUM(n_words) AS BIGINT) AS w_total,
                 CAST(SUM(CASE WHEN f_e THEN 1 ELSE 0 END) AS BIGINT) AS d_e,
                 CAST(SUM(CASE WHEN f_e THEN n_words ELSE 0 END) AS BIGINT) AS w_e,
                 CAST(SUM(CASE WHEN f_n THEN 1 ELSE 0 END) AS BIGINT) AS d_n,
                 CAST(SUM(CASE WHEN f_n THEN n_words ELSE 0 END) AS BIGINT) AS w_n,
                 CAST(SUM(CASE WHEN cw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_s,
                 CAST(SUM(cw) AS BIGINT) AS w_s,
                 CAST(SUM(CASE WHEN f_e AND f_n THEN 1 ELSE 0 END) AS BIGINT) AS d_en,
                 CAST(SUM(CASE WHEN f_e AND cw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_es,
                 CAST(SUM(CASE WHEN f_n AND cw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_ns,
                 CAST(SUM(CASE WHEN f_e OR f_n OR cw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_any
          FROM pd)
        SELECT 'corpus' AS layer_a, 'corpus' AS layer_b,
               n_total AS n_docs, w_total AS n_words FROM m
        UNION ALL SELECT 'exact', 'exact', d_e, w_e FROM m
        UNION ALL SELECT 'near', 'near', d_n, w_n FROM m
        UNION ALL SELECT 'substring', 'substring', d_s, w_s FROM m
        UNION ALL SELECT 'exact', 'near', d_en, CAST(NULL AS BIGINT) FROM m
        UNION ALL SELECT 'exact', 'substring', d_es, CAST(NULL AS BIGINT) FROM m
        UNION ALL SELECT 'near', 'substring', d_ns, CAST(NULL AS BIGINT) FROM m
        UNION ALL SELECT 'any', 'any', d_any, CAST(NULL AS BIGINT) FROM m
        ORDER BY layer_a, layer_b"""
      }),

    // ---- p76: Bloom-filter membership dedup — [[bloomDedup]] with the
    // doc_id ≡ 0 (mod 3) docs as the "prior snapshot" reference, m =
    // 1024 bits, k = 3. m is sized so the fixture LOADS the filter
    // (~500 of 1024 bits set): members must all flag, and a visible
    // fraction of non-members false-positive — so the gate certifies
    // genuine Bloom semantics (all-k-positions probe over the exact
    // double-hashed bit positions), not a disguised exact-membership
    // join. The oracle replays the md5 double-hashing, the distinct
    // set-bit union and the all-positions probe verbatim.
    QueryDef(
      "p76_bloom_dedup",
      (s, d) => {
        val docs = T.documents(s, d)
        bloomDedup(docs.select(col("doc_id"), col("text")),
            docs.filter(col("doc_id") % 3 === 0), "text",
            mBits = 1024, k = 3)
          .select(col("doc_id"), col("bloom_hits"), col("in_bloom"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(text), 1, 12) AS BIGINT) AS h1,
                 2 * CAST('0x' || substr(md5(text), 13, 12) AS BIGINT) + 1 AS h2
          FROM documents WHERE text IS NOT NULL),
        bits AS (
          SELECT DISTINCT (h1 + j * h2) % 1024 AS pos
          FROM h, unnest(range(0, 3)) t(j)
          WHERE doc_id % 3 = 0),
        bloom AS (SELECT list_sort(list(pos)) AS bs FROM bits),
        pp AS (
          SELECT doc_id,
                 list_sort(list_distinct(list((h1 + j * h2) % 1024))) AS ps
          FROM h, unnest(range(0, 3)) t(j) GROUP BY doc_id),
        probe AS (
          SELECT pp.doc_id,
                 CAST(len(list_filter(ps, p -> list_contains(bs, p)))
                   AS BIGINT) AS bloom_hits,
                 len(list_filter(ps, p -> list_contains(bs, p))) = len(ps)
                   AS in_bloom
          FROM pp CROSS JOIN bloom)
        SELECT d.doc_id,
               COALESCE(p.bloom_hits, 0) AS bloom_hits,
               COALESCE(p.in_bloom, FALSE) AS in_bloom
        FROM documents d LEFT JOIN probe p ON p.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---- p104: the PACKED Bloom path — [[bloomDedupPacked]] with
    // p76's exact parameters. The bitset_pack/bitset_count_set codegen
    // kernels must reproduce p76's flags bit-for-bit, so the oracle is
    // p76's position-arithmetic replay VERBATIM: a packing defect
    // (wrong word index, shift, sign, range clamp) diverges here at
    // the driver gate, not just in the randomized spec. This is the
    // representation the 100 TB snapshot broadcast actually ships
    // (mBits/8 bytes instead of 8 bytes per set bit).
    QueryDef(
      "p104_bloom_packed",
      (s, d) => {
        val docs = T.documents(s, d)
        bloomDedupPacked(docs.select(col("doc_id"), col("text")),
            docs.filter(col("doc_id") % 3 === 0), "text",
            mBits = 1024, k = 3)
          .select(col("doc_id"), col("bloom_hits"), col("in_bloom"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
                 CAST('0x' || substr(md5(text), 1, 12) AS BIGINT) AS h1,
                 2 * CAST('0x' || substr(md5(text), 13, 12) AS BIGINT) + 1 AS h2
          FROM documents WHERE text IS NOT NULL),
        bits AS (
          SELECT DISTINCT (h1 + j * h2) % 1024 AS pos
          FROM h, unnest(range(0, 3)) t(j)
          WHERE doc_id % 3 = 0),
        bloom AS (SELECT list_sort(list(pos)) AS bs FROM bits),
        pp AS (
          SELECT doc_id,
                 list_sort(list_distinct(list((h1 + j * h2) % 1024))) AS ps
          FROM h, unnest(range(0, 3)) t(j) GROUP BY doc_id),
        probe AS (
          SELECT pp.doc_id,
                 CAST(len(list_filter(ps, p -> list_contains(bs, p)))
                   AS BIGINT) AS bloom_hits,
                 len(list_filter(ps, p -> list_contains(bs, p))) = len(ps)
                   AS in_bloom
          FROM pp CROSS JOIN bloom)
        SELECT d.doc_id,
               COALESCE(p.bloom_hits, 0) AS bloom_hits,
               COALESCE(p.in_bloom, FALSE) AS in_bloom
        FROM documents d LEFT JOIN probe p ON p.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---- p107: snapshot diff — [[corpusDiff]] between two derived
    // versions of the documents table, built so all four statuses and
    // both NULL-ambiguity cases appear: curr gains the doc_id%5=0 ids
    // prev lacks (added), loses the %3=0 ids (removed), mutates the
    // %7=0 texts (changed), and both sides NULL the %11=0 texts
    // (NULL <=> NULL -> unchanged; an id missing on one side must NOT
    // collapse into that — the presence-flag semantics the operator
    // exists to get right). The oracle replays the same full-outer
    // join + null-safe compare.
    QueryDef(
      "p107_corpus_diff",
      (s, d) => {
        val docs = T.documents(s, d)
        def vtext = when(col("doc_id") % 11 === 0, lit(null).cast(StringType))
          .otherwise(col("text"))
        val prev = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), vtext.as("text"))
        val curr = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0,
              concat(col("text"), lit(" v2"))).otherwise(vtext).as("text"))
        corpusDiff(prev, curr, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH prev AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0 THEN NULL ELSE text END AS text
          FROM documents WHERE doc_id % 5 <> 0),
        curr AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0 THEN NULL
                      WHEN doc_id % 7 = 0 THEN text || ' v2'
                      ELSE text END AS text
          FROM documents WHERE doc_id % 3 <> 0)
        SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
               md5(p.text) AS prev_hash, md5(c.text) AS curr_hash,
               CASE WHEN p.doc_id IS NULL THEN 'added'
                    WHEN c.doc_id IS NULL THEN 'removed'
                    WHEN md5(p.text) IS NOT DISTINCT FROM md5(c.text)
                      THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
        ORDER BY doc_id""")),

    // ---- p94: MinHash accuracy report — [[minhashAccuracyReport]]
    // over p02's own candidate pairs: signature-agreement estimate vs
    // exact shingle Jaccard per pair + the MAE (decimal-averaged). The
    // oracle splices the shared NeardupPairsSql CTEs so both engines
    // derive the identical candidates, signatures and exact counts —
    // the sketch-accuracy pattern (p39/p78/p86) applied to the LSH
    // dedup path.
    QueryDef(
      "p94_minhash_accuracy",
      (s, d) =>
        minhashAccuracyReport(T.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH $NeardupPairsSql,
        agree AS (
          SELECT p.da, p.db,
                 CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_agree
          FROM pairs p
          JOIN mh a ON a.doc_id = p.da
          JOIN mh b ON b.doc_id = p.db AND b.i = a.i
          GROUP BY p.da, p.db),
        ex AS (
          SELECT p.da, p.db, COALESCE(i.c, 0) AS c, na.n AS na, nb.n AS nb
          FROM pairs p
          LEFT JOIN inter i ON i.da = p.da AND i.db = p.db
          JOIN ns na ON na.doc_id = p.da
          JOIN ns nb ON nb.doc_id = p.db),
        rep AS (
          SELECT a.da AS doc_a, a.db AS doc_b, a.n_agree,
                 CAST(a.n_agree AS DOUBLE) / CAST($NumHashes AS DOUBLE)
                   AS est,
                 CAST(e.c AS DOUBLE) / (e.na + e.nb - CAST(e.c AS DOUBLE))
                   AS jaccard,
                 abs(CAST(a.n_agree AS DOUBLE) / CAST($NumHashes AS DOUBLE)
                     - CAST(e.c AS DOUBLE)
                       / (e.na + e.nb - CAST(e.c AS DOUBLE))) AS abs_err
          FROM agree a JOIN ex e ON e.da = a.da AND e.db = a.db),
        m AS (SELECT ${graft.QueryDef.davgSql("abs_err")} AS mae FROM rep)
        SELECT rep.doc_a, rep.doc_b, rep.n_agree, rep.est, rep.jaccard,
               rep.abs_err, m.mae
        FROM rep, m ORDER BY rep.doc_a, rep.doc_b""")),

    // ---- p95: edit-distance-verified near-dups —
    // [[editDistanceNeardupPairs]] at minSim = 0.5 over p02's own
    // candidates: exact Levenshtein + normalized similarity per pair.
    // Both engines compute the exact integer distance (byte ≡
    // codepoint on this ASCII corpus; the divergence on multibyte
    // text is documented on the operator); the similarity is one
    // IEEE division mirrored verbatim.
    QueryDef(
      "p95_editdist_neardup",
      (s, d) =>
        editDistanceNeardupPairs(T.documents(s, d), "doc_id", "text",
          minSim = 0.5)
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH $NeardupPairsSql,
        txt AS (SELECT doc_id, text FROM documents),
        e AS (
          SELECT p.da AS doc_a, p.db AS doc_b,
                 CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
                 CAST(length(ta.text) AS BIGINT) AS len_a,
                 CAST(length(tb.text) AS BIGINT) AS len_b
          FROM pairs p
          JOIN txt ta ON ta.doc_id = p.da
          JOIN txt tb ON tb.doc_id = p.db),
        r AS (
          SELECT doc_a, doc_b, dist, len_a, len_b,
                 CAST(1.0 AS DOUBLE) - CAST(dist AS DOUBLE)
                   / CAST(greatest(len_a, len_b) AS DOUBLE) AS sim
          FROM e)
        SELECT doc_a, doc_b, dist, len_a, len_b, sim
        FROM r WHERE sim >= CAST(0.5 AS DOUBLE)
        ORDER BY doc_a, doc_b""")),

    // ---- p134: blocked record linkage over the STRUCTURED customer
    // table — [[blockedRecordLinkage]] with (nation, segment) as the
    // blocking key and exact Levenshtein on the name field. The only
    // gate whose dedup subject is an entity table rather than document
    // text. The oracle replays blocking as a key-equality self-join
    // (candidate generation differs — bucket shuffle vs join — the
    // PAIR SET must not) and the identical distance + similarity
    // arithmetic.
    QueryDef(
      "p134_record_linkage",
      (s, d) =>
        blockedRecordLinkage(T.customer(s, d), "c_custkey",
          Seq("c_nationkey", "c_mktsegment"), "c_name", maxDist = 2)
          .orderBy(col("id_a"), col("id_b")),
      Some("""
        WITH r AS (
          SELECT c_custkey AS id, c_nationkey, c_mktsegment, c_name
          FROM customer),
        p AS (
          SELECT a.c_nationkey, a.c_mktsegment,
                 a.id AS id_a, b.id AS id_b,
                 CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist,
                 CAST(1.0 AS DOUBLE)
                   - CAST(levenshtein(a.c_name, b.c_name) AS DOUBLE)
                     / CAST(greatest(length(a.c_name), length(b.c_name))
                            AS DOUBLE) AS sim
          FROM r a JOIN r b
            ON a.c_nationkey = b.c_nationkey
           AND a.c_mktsegment = b.c_mktsegment
           AND a.id < b.id)
        SELECT c_nationkey, c_mktsegment, id_a, id_b, dist, sim
        FROM p WHERE dist <= 2 ORDER BY id_a, id_b""")),

    // ---- p135: the multimodal near-dup union report —
    // [[multimodalNeardupPairs]] over the p02 text pairs and the m07
    // image pairs on the SAME doc ids (text from the documents table,
    // image from its patterned-PNG fixture). The oracle composes both
    // full CTE chains — minhash verify AND closed-form pixel aHash —
    // and replays the full-outer modality classification, so a drift
    // in EITHER modality's arithmetic (or in the join/flag logic)
    // hash-mismatches. On this fixture: 25 text pairs, 1350 image
    // pairs, exactly 1 caught by both.
    QueryDef(
      "p135_multimodal_neardups",
      (s, d) => {
        val M = graft.operators.Multimodal
        multimodalNeardupPairs(
          minhashNeardupPairs(T.documents(s, d), "doc_id", "text"),
          M.imageNeardupPairs(
            M.imagePerceptualHash(M.imageRecordsPatterned(s, d))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
            tau = 3))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $NeardupPairsSql,
        $ImagePHashOracleSql,
        ipairs AS (
          SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
                 CAST(bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
                    + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3))
                    AS INT) AS hamming
          FROM hashes l JOIN hashes r
            ON l.doc_id < r.doc_id
           AND (l.b0 = r.b0 OR l.b1 = r.b1 OR l.b2 = r.b2 OR l.b3 = r.b3)
          WHERE bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
              + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3)) <= 3)
        SELECT COALESCE(t.doc_a, i.doc_a) AS doc_a,
               COALESCE(t.doc_b, i.doc_b) AS doc_b,
               t.jaccard, i.hamming,
               CASE WHEN t.doc_a IS NOT NULL AND i.doc_a IS NOT NULL
                      THEN 'both'
                    WHEN t.doc_a IS NOT NULL THEN 'text'
                    ELSE 'image' END AS modality
        FROM (SELECT doc_a, doc_b, jaccard FROM verified) t
        FULL OUTER JOIN ipairs i
          ON t.doc_a = i.doc_a AND t.doc_b = i.doc_b
        ORDER BY doc_a, doc_b"""))
  )
}
