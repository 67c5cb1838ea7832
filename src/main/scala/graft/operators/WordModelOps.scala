package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Word-level statistical models over the corpus: collocation mining,
  * skip-gram pair generation and GloVe co-occurrence (the word2vec /
  * GloVe preparation family), the interpolated Kneser–Ney bigram and
  * trigram models with the KN document scorer, and TextRank keyword
  * extraction.
  *
  * Split out of QualityOps when it outgrew the r15 ~2k-line module
  * guideline; mixed into [[Pipeline]], which remains the single public
  * entry point — no caller, gate, or oracle changed. */
private[operators] trait WordModelOps { self: Pipeline.type =>
  /** Collocation / phrase mining (Mikolov et al., "Distributed
    * Representations of Words and Phrases", NeurIPS 2013 §4 — the
    * word2phrase score every phrase-vocabulary pass runs before
    * tokenizer or embedding training): rank adjacent word pairs by
    * score(a,b) = (count(ab) − δ) / (count(a)·count(b)), where the
    * discount δ kills rare-pair noise; pairs scoring high co-occur far
    * above chance ("new york") and deserve a single vocabulary slot.
    * All arithmetic is IEEE-exact with NO transcendentals (unlike PMI,
    * whose ln the score order doesn't need), so both engines agree
    * bit-for-bit without quantization. Scale shape: bigram counts are
    * one explode + partial agg (the p27 shape); the unigram table is
    * hapax-inclusive (minCount prunes the BIGRAM side only) so it
    * grows with the corpus — its two joins are left UNHINTED for AQE,
    * which broadcasts at curated scale and shuffle-joins at raw-crawl
    * scale instead of OOMing the driver; and
    * selection is orderBy+limit → TakeOrdered (k per partition, no
    * full sort). Output: (w1, w2, c_ab, c_a, c_b, score) top-k by
    * (score desc, pair asc). */
  def collocations(corpus: DataFrame, textCol: String, k: Int = 20,
      minCount: Long = 5, delta: Double = 5.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(delta >= 0, s"delta must be >= 0, got $delta")
    val ws = corpus
      .select(array_remove(words(col(textCol)), "").as("ws"))
    val bc = ws.filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("p"))
      .groupBy(col("p.w1"), col("p.w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uc = ws.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    bc
      .join(uc.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uc.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("c_ab").cast(DoubleType) - lit(delta)) /
          (col("c_a").cast(DoubleType) * col("c_b").cast(DoubleType)))
          .as("score"))
      .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Skip-gram training-pair generation (Mikolov et al., "Efficient
    * Estimation of Word Representations", ICLR 2013 — the (center,
    * context) stream word2vec/fastText train on): for each token
    * occurrence, emit every neighbor within a per-center window b
    * sampled uniformly from 1..window — the paper's actual rule (the
    * uniform b is what makes nearer contexts proportionally more
    * frequent, §3.1's implicit 1/d weighting). RNG-free in the
    * [[SamplingOps.frequencySubsample]] stance: b is md5-derived from
    * (doc, position), so reruns and engines agree exactly. Scale
    * shape: ONE posexplode (≤ 2·window+1 rows per token, the corpus's
    * own token budget), window draw + neighbor fan-out + bounds check
    * all map-side — the corpus never shuffles; callers feed the pairs
    * straight into their (center, context)-keyed trainer, which owns
    * the one real shuffle. Output: (doc_id, center_no, center,
    * context_no, context, win). */
  def skipgramPairs(corpus: DataFrame, idCol: String, textCol: String,
      window: Int = 5): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val win = pmod(conv(substring(md5(concat(
      col("doc_id").cast(StringType), lit(":"),
      col("center_no").cast(StringType))), 1, 12), 16, 10)
      .cast(LongType), lit(window.toLong)) + 1
    corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        array_remove(words(col(textCol)), "").as("__ws"))
      .select(col("doc_id"), col("__ws"),
        posexplode(col("__ws")).as(Seq("center_no", "center")))
      .withColumn("center_no", col("center_no").cast(LongType))
      .withColumn("win", win)
      .select(col("doc_id"), col("__ws"), col("center_no"), col("center"),
        col("win"),
        explode(concat(sequence(-col("win"), lit(-1L)),
          sequence(lit(1L), col("win")))).as("__off"))
      .withColumn("context_no", col("center_no") + col("__off"))
      .filter(col("context_no") >= 0 &&
        col("context_no") < size(col("__ws")))
      .select(col("doc_id"), col("center_no"), col("center"),
        col("context_no"),
        element_at(col("__ws"),
          (col("context_no") + 1).cast(IntegerType)).as("context"),
        col("win"))
  }

  /** GloVe co-occurrence accumulation (Pennington, Socher & Manning,
    * "GloVe: Global Vectors for Word Representation", EMNLP 2014 §4):
    * X_ij = Σ 1/d over every occurrence of word j within `window`
    * tokens of word i — the decaying-weight count matrix the GloVe
    * objective factorizes. Kept engine-exact without decimals: the
    * per-distance counts are exact integers from ONE (w1, w2)-keyed
    * partial agg (the distance pivot rides the same groupBy — no
    * second shuffle), and the weighted sum folds cnt_d/d in FIXED
    * ascending-d order, so the IEEE result is deterministic and the
    * oracle replays the identical expression. Top-k plans as
    * TakeOrdered. Output: (w1, w2, cnt_1..cnt_window, xij) top-k by
    * (xij desc, pair asc). */
  def gloveCooc(corpus: DataFrame, textCol: String, window: Int = 3,
      k: Int = 50): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(k >= 1, s"k must be >= 1, got $k")
    val offs = ((-window to -1) ++ (1 to window)).map(_.toLong)
    val pairs = corpus
      .filter(col(textCol).isNotNull)
      .select(array_remove(words(col(textCol)), "").as("__ws"))
      .select(col("__ws"), posexplode(col("__ws")).as(Seq("__i", "w1")))
      .select(col("__ws"), col("__i").cast(LongType).as("__i"), col("w1"),
        explode(array(offs.map(lit): _*)).as("__off"))
      .filter(col("__i") + col("__off") >= 0 &&
        col("__i") + col("__off") < size(col("__ws")))
      .select(col("w1"),
        element_at(col("__ws"),
          (col("__i") + col("__off") + 1).cast(IntegerType)).as("w2"),
        abs(col("__off")).as("__d"))
    val cnts = (1 to window).map(d =>
      coalesce(sum(when(col("__d") === d, 1L)), lit(0L)).as(s"cnt_$d"))
    val xij = (1 to window).map(d =>
      col(s"cnt_$d").cast(DoubleType) / lit(d.toDouble)).reduce(_ + _)
    pairs
      .groupBy(col("w1"), col("w2"))
      .agg(cnts.head, cnts.tail: _*)
      .withColumn("xij", xij)
      .orderBy(col("xij").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Interpolated Kneser–Ney bigram model (Kneser & Ney, ICASSP 1995;
    * Chen & Goodman, "An Empirical Study of Smoothing Techniques",
    * 1999 — THE reference n-gram smoothing; the exact complement to
    * [[lmPerplexity]]'s Stupid Backoff, which trades this properness
    * for a normalization-free count table). For each attested bigram:
    *
    *   P_KN(b|a) = max(c(ab) − D, 0)/c(a·) + λ(a)·P_cont(b)
    *   λ(a)      = D·N1+(a·)/c(a·)
    *   P_cont(b) = N1+(·b)/N1+(··)
    *
    * with c(a·) the context total, N1+(a·)/N1+(·b) the distinct right/
    * left continuation counts and N1+(··) the distinct-bigram total.
    * λ(a) is exactly the mass the discount frees, so P_KN is a proper
    * distribution over the vocabulary — unseen b score λ(a)·P_cont(b),
    * and the spec asserts the full-vocabulary sum is 1 per context.
    * The continuation probability (how many DISTINCT contexts b
    * follows, not how often) is the fix for the "San Francisco"
    * pathology: frequent-but-context-locked words stop inflating
    * their unigram backoff.
    *
    * Engine-exactness: D = 0.75 is a dyadic double, so c − D is exact;
    * every other factor is an exact-integer IEEE division composed in
    * fixed order — the oracle replays p_kn bit-for-bit, no
    * quantization anywhere. Scale shape: bigram counts are one
    * explode + partial agg over the corpus (the [[collocations]]
    * shape); the context, continuation and total tables fold over the
    * BIGRAM table (vocab-bounded, far below corpus scale) and
    * broadcast back onto it. Unseen-pair scoring needs only the
    * model's own columns: distinct (w1, lambda) × distinct (w2,
    * p_cont). Output: (w1, w2, c_ab, c_ctx, n1p_ctx, n1p_right,
    * p_cont, lambda, p_kn) for every attested bigram. */
  def knBigramModel(corpus: DataFrame, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val ws = corpus
      .select(array_remove(words(col(textCol)), "").as("ws"))
    val bc = ws.filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("p"))
      .groupBy(col("p.w1"), col("p.w2"))
      .agg(count(lit(1)).as("c_ab"))
    val ctx = bc.groupBy(col("w1"))
      .agg(sum(col("c_ab")).as("c_ctx"), count(lit(1)).as("n1p_ctx"))
    val cont = bc.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1p_right"))
    val nb = bc.agg(count(lit(1)).as("n_bigrams"))
    bc
      .join(broadcast(ctx), Seq("w1"))
      .join(broadcast(cont), Seq("w2"))
      .crossJoin(broadcast(nb))
      .withColumn("p_cont",
        col("n1p_right").cast(DoubleType) / col("n_bigrams").cast(DoubleType))
      .withColumn("lambda",
        (lit(discount) * col("n1p_ctx").cast(DoubleType)) /
          col("c_ctx").cast(DoubleType))
      .withColumn("p_kn",
        greatest(col("c_ab").cast(DoubleType) - lit(discount), lit(0.0)) /
          col("c_ctx").cast(DoubleType) +
          col("lambda") * col("p_cont"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_ctx"),
        col("n1p_ctx"), col("n1p_right"), col("p_cont"), col("lambda"),
        col("p_kn"))
  }

  /** Document scoring under a [[knBigramModel]] — the serving half of
    * the KN story (what [[lmPerplexity]] does with Stupid Backoff,
    * done with the proper model): every adjacent word pair in the
    * corpus scores through the full interpolated backoff chain,
    *
    *   seen bigram            → P = P_KN(w2|w1)       (model row)
    *   unseen bigram,
    *     attested context w1  → P = λ(w1)·P_cont(w2)
    *     unattested context   → P = P_cont(w2)        (longest context
    *                                                   that EXISTS —
    *                                                   the p65 stance)
    *
    * and out-of-vocabulary continuations (P_cont = 0: the reference
    * corpus never saw w2 follow anything) are COUNTED (`n_oov`) but
    * excluded from the average rather than scored −∞ — KN reserves no
    * OOV mass by construction, and pretending otherwise would poison
    * the mean. Per-doc score = decimal-averaged round-9 ln P (the
    * portable recipe), so the whole chain replays bit-for-bit.
    * Scale shape: the model's three lookup tables are vocab-sized or
    * smaller — bigram rows join on their pair key (shuffle under AQE,
    * the p65 precedent), λ and P_cont broadcast. CACHE CONTRACT
    * (r19/r20): the (reference-bounded) model frame is persisted
    * inside the operator — the three lookup arms would otherwise each
    * re-derive its join chain — and the blocks stay cached in the
    * session after the action (there is no per-call handle to return
    * without changing the output type). Long-lived library sessions
    * that score many batches should call
    * `spark.catalog.clearCache()` between batches, or build and
    * persist [[knBigramModel]] themselves and compose the score
    * manually to own the lifecycle. Output: (doc_id, n_pairs, n_seen,
    * n_backoff, n_oov, logprob_avg); docs with fewer than 2 words
    * carry no row. */
  /** The occurrence-level KN-scored pair stream shared by
    * [[knBigramScore]] and [[knMinKProb]] (one chain, two aggregations
    * — the qualityExpr no-drift stance): every adjacent pair of every
    * corpus doc joined against the reference model with the
    * seen → backoff → continuation coalesce. Columns: (doc_id, p_kn,
    * __p). */
  private def knBigramScoredPairs(reference: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, discount: Double): DataFrame = {
    // model persisted AT THE CONSUMER (r19): the three lookup arms
    // (pairs, λ, P_cont) each re-derive the model's post-shuffle join
    // chain — exchange reuse dedups the underlying shuffles but not
    // the joins above them. The model is bigram-type-bounded. Inside
    // knTrigramModel/knBigramModel themselves a persist measurably
    // HURT the model-only gates (p97: 0.89 → 1.52 s), so the builders
    // stay persist-free. Same clearCache contract as p02.
    val model = knBigramModel(reference, textCol, discount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = model.select(col("w1"), col("w2"), col("p_kn"))
    val lam = model.select(col("w1"), col("lambda")).distinct()
    val cont = model.select(col("w2"), col("p_cont")).distinct()
    val occ = corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        array_remove(words(col(textCol)), "").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("__ws")) - 1),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    occ
      .join(pairs, Seq("w1", "w2"), "left")
      .join(broadcast(lam), Seq("w1"), "left")
      .join(broadcast(cont), Seq("w2"), "left")
      .withColumn("__p", coalesce(col("p_kn"),
        col("lambda") * col("p_cont"), col("p_cont")))
  }

  def knBigramScore(reference: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val scored = knBigramScoredPairs(reference, corpus, idCol, textCol,
      discount)
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("p_kn").isNotNull, 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("p_kn").isNull && col("__p").isNotNull, 1L)
          .otherwise(0L)).as("n_backoff"),
        sum(when(col("__p").isNull, 1L).otherwise(0L)).as("n_oov"),
        // dsum skips the NULL (OOV) terms; the mean divides by the
        // SCORED count, not the pair count
        graft.QueryDef.dsum(when(col("__p").isNotNull,
          round(log(col("__p")), 9))).as("__ls"))
      .withColumn("logprob_avg",
        when(col("n_pairs") - col("n_oov") > 0,
          col("__ls") / (col("n_pairs") - col("n_oov"))
            .cast(DoubleType)))
      .select(col("doc_id"), col("n_pairs"), col("n_seen"),
        col("n_backoff"), col("n_oov"), col("logprob_avg"))
  }


  /** Min-K% Prob membership signal (Shi et al., "Detecting Pretraining
    * Data from Large Language Models", ICLR 2024): the average
    * log-probability of a document's LOWEST-k% scored tokens under a
    * reference LM — memorized/training-set text has few low-probability
    * outliers, so its min-k tail sits far above fresh text's; the
    * per-doc aggregate is the standard contamination/memorization
    * audit. Here the LM is the [[knBigramModel]] (the engine's exact
    * cross-engine LM) via the SHARED [[knBigramScoredPairs]] chain, so
    * the scorer and this detector can never drift. Selection: the
    * ⌈kPct·n_scored⌉ lowest round-9 log-probs per doc via a doc-keyed
    * row_number — tie order is engine-arbitrary but the selected VALUE
    * multiset is tie-invariant, so the decimal sum is bit-stable
    * (kPct defaults to a dyadic 0.25: ceil(kPct·n) then never wobbles
    * on the 53rd bit). OOV pairs are excluded like [[knBigramScore]];
    * docs with zero scored pairs are absent. Scale shape: the scored
    * chain is p101's (gram joins under AQE, vocab broadcasts), the
    * ranking is ONE doc-keyed window — no global sort. Output:
    * (doc_id, n_scored, k_count, mink_avg). */
  def knMinKProb(reference: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, kPct: Double = 0.25,
      discount: Double = 0.75): DataFrame = {
    require(kPct > 0 && kPct <= 1, s"kPct must be in (0,1], got $kPct")
    val lp = knBigramScoredPairs(reference, corpus, idCol, textCol, discount)
      .filter(col("__p").isNotNull)
      .select(col("doc_id"), round(log(col("__p")), 9).as("__lp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    // both window expressions share ONE (partition, order) spec — the
    // per-partition count takes the ordered spec with an explicit
    // unbounded frame (same value) so Spark plans a single Window
    // operator instead of two stacked ones (r20; the unordered count
    // spec forced a second operator and a second buffer pass)
    val wOrd = w.orderBy(col("__lp").asc)
    val ranked = lp
      .withColumn("__r", row_number().over(wOrd))
      .withColumn("__ns", count(lit(1)).over(wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("__m", greatest(lit(1L),
        ceil(lit(kPct) * col("__ns").cast(DoubleType)).cast(LongType)))
    ranked
      .groupBy(col("doc_id"))
      .agg(max(col("__ns")).as("n_scored"),
        max(col("__m")).as("k_count"),
        (graft.QueryDef.dsum(when(col("__r") <= col("__m"), col("__lp")))
          / max(col("__m")).cast(DoubleType)).as("mink_avg"))
  }

  /** Interpolated Kneser–Ney TRIGRAM model (Chen & Goodman 1999
    * §2.7 — the production order; [[knBigramModel]] is the two-level
    * teaching case, this is what a deployed KN LM actually ships):
    * lower orders use CONTINUATION counts derived from the trigram
    * table (the KN insight applied recursively — how many distinct
    * contexts a gram completes, not how often), with one dyadic
    * discount D per level:
    *
    *   P1(w3)       = N1+(·w3) / N1+(··)
    *   P2(w3|w2)    = max(ĉ(w2w3)−D, 0)/ĉ(w2·) + λ2(w2)·P1(w3)
    *   P3(w3|w1w2)  = max(c(w1w2w3)−D, 0)/c(w1w2·) + λ3(w1w2)·P2(w3|w2)
    *
    * where ĉ(w2w3) = N1+(·w2w3) counts distinct predecessors, and each
    * λ = D·(distinct continuations)/(context total) is exactly the
    * discounted mass, so P3 is proper over the vocabulary per context
    * (spec-asserted with the unseen mass). Engine-exactness as in the
    * bigram model: dyadic D, exact integer ratios, fixed-order IEEE —
    * the oracle replays every probability bit-for-bit. Scale shape:
    * the trigram table is ONE explode + partial agg; the (w1,w2)- and
    * (w2,w3)-keyed summary tables are bigram-type-sized and join back
    * on their gram keys (shuffle under AQE — the p65 LM-scoring
    * precedent; bigram types outgrow any broadcast at 100 TB), while
    * the vocab-sized unigram/context tables and the one-row total
    * broadcast. Output per attested trigram: (w1, w2, w3, c3, c12,
    * n3, chat, chat2, n2, n1, p1, p2, p_kn). */
  def knTrigramModel(corpus: DataFrame, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val ws = corpus
      .select(array_remove(words(col(textCol)), "").as("ws"))
    // NOT persisted (r19 measurement): the fan-out (final join, ctx3,
    // bt and bt's own consumers) is already served by Spark's exchange
    // reuse — every arm reads the ONE materialized shuffle of the
    // trigram partial agg — and an explicit persist on top measurably
    // HURT (p97 min-of-5 at sf0.1: 0.89 s unpersisted vs 1.52 s
    // persisted; the cache write is pure overhead).
    val tc = ws.filter(size(col("ws")) >= 3)
      .select(explode(transform(sequence(lit(1), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2"),
          element_at(col("ws"), i + 2).as("w3")))).as("t"))
      .groupBy(col("t.w1"), col("t.w2"), col("t.w3"))
      .agg(count(lit(1)).as("c3"))
    val ctx3 = tc.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).as("c12"), count(lit(1)).as("n3"))
    // tc rows are unique triples, so count(*) per (w2,w3) IS the
    // distinct-predecessor continuation count N1+(·w2w3)
    val bt = tc.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("chat"))
    val ctx2 = bt.groupBy(col("w2"))
      .agg(sum(col("chat")).as("chat2"), count(lit(1)).as("n2"))
    val uni = bt.groupBy(col("w3")).agg(count(lit(1)).as("n1"))
    val ntot = bt.agg(count(lit(1)).as("ntot"))
    val d = lit(discount)
    tc
      .join(ctx3, Seq("w1", "w2"))
      .join(bt, Seq("w2", "w3"))
      .join(broadcast(ctx2), Seq("w2"))
      .join(broadcast(uni), Seq("w3"))
      .crossJoin(broadcast(ntot))
      .withColumn("p1",
        col("n1").cast(DoubleType) / col("ntot").cast(DoubleType))
      .withColumn("p2",
        greatest(col("chat").cast(DoubleType) - d, lit(0.0)) /
          col("chat2").cast(DoubleType) +
          ((d * col("n2").cast(DoubleType)) /
            col("chat2").cast(DoubleType)) * col("p1"))
      .withColumn("p_kn",
        greatest(col("c3").cast(DoubleType) - d, lit(0.0)) /
          col("c12").cast(DoubleType) +
          ((d * col("n3").cast(DoubleType)) /
            col("c12").cast(DoubleType)) * col("p2"))
      .select(col("w1"), col("w2"), col("w3"), col("c3"), col("c12"),
        col("n3"), col("chat"), col("chat2"), col("n2"), col("n1"),
        col("p1"), col("p2"), col("p_kn"))
  }


  /** Document scoring under a [[knTrigramModel]] — the production
    * serving path ([[knBigramScore]] one order up): every trigram
    * position scores through the full three-level interpolated
    * backoff, each level falling to the LONGEST CONTEXT THAT EXISTS
    * (the p65 stance):
    *
    *   level 2: P2' = coalesce(P2(w3|w2), λ2(w2)·P1(w3), P1(w3))
    *   level 3: P   = coalesce(P3(w1w2w3), λ3(w1w2)·P2', P2')
    *
    * OOV continuations (P1 = 0: the reference never saw w3 complete
    * anything) are counted and excluded from the mean, as in the
    * bigram scorer. All lookup tables are DERIVED FROM THE MODEL'S
    * OWN OUTPUT (distinct projections of [[knTrigramModel]] rows), so
    * scoring can never drift from training. The first two tokens of a
    * document carry no trigram and are not scored (kept crisp rather
    * than mixing orders per position). Scale: the trigram and
    * (w2,w3)-level tables join on their gram keys (shuffle under
    * AQE); λ2/P1 are vocab-sized broadcasts; the reference-bounded
    * model frame is persisted inside the operator (five lookup arms)
    * and stays cached in the session after the action — the
    * [[knBigramScore]] cache contract: long-lived sessions release it
    * with `spark.catalog.clearCache()` or compose [[knTrigramModel]]
    * + scoring manually to own the lifecycle. Output:
    * (doc_id, n_grams, n_seen, n_backoff, n_oov, logprob_avg); docs
    * under 3 words carry no row. */
  def knTrigramScore(reference: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    // model persisted at the consumer — five lookup arms; see the
    // knBigramScoredPairs note (builders stay persist-free: p97)
    val model = knTrigramModel(reference, textCol, discount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = lit(discount)
    val m3 = model.select(col("w1"), col("w2"), col("w3"), col("p_kn"))
    val lam3 = model.select(col("w1"), col("w2"),
      ((d * col("n3").cast(DoubleType)) / col("c12").cast(DoubleType))
        .as("__lam3")).distinct()
    val p2t = model.select(col("w2"), col("w3"), col("p2").as("__p2"))
      .distinct()
    val lam2 = model.select(col("w2"),
      ((d * col("n2").cast(DoubleType)) / col("chat2").cast(DoubleType))
        .as("__lam2")).distinct()
    val p1t = model.select(col("w3"), col("p1").as("__p1")).distinct()
    val occ = corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        array_remove(words(col(textCol)), "").as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("__ws")) - 2),
        i => struct(element_at(col("__ws"), i).as("w1"),
          element_at(col("__ws"), i + 1).as("w2"),
          element_at(col("__ws"), i + 2).as("w3")))).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val scored = occ
      .join(m3, Seq("w1", "w2", "w3"), "left")
      .join(lam3, Seq("w1", "w2"), "left")
      .join(p2t, Seq("w2", "w3"), "left")
      .join(broadcast(lam2), Seq("w2"), "left")
      .join(broadcast(p1t), Seq("w3"), "left")
      .withColumn("__p2f",
        coalesce(col("__p2"), col("__lam2") * col("__p1"), col("__p1")))
      .withColumn("__p",
        coalesce(col("p_kn"), col("__lam3") * col("__p2f"), col("__p2f")))
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("p_kn").isNotNull, 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("p_kn").isNull && col("__p").isNotNull, 1L)
          .otherwise(0L)).as("n_backoff"),
        sum(when(col("__p").isNull, 1L).otherwise(0L)).as("n_oov"),
        graft.QueryDef.dsum(when(col("__p").isNotNull,
          round(log(col("__p")), 9))).as("__ls"))
      .withColumn("logprob_avg",
        when(col("n_grams") - col("n_oov") > 0,
          col("__ls") / (col("n_grams") - col("n_oov"))
            .cast(DoubleType)))
      .select(col("doc_id"), col("n_grams"), col("n_seen"),
        col("n_backoff"), col("n_oov"), col("logprob_avg"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, "TextRank:
    * Bringing Order into Text", EMNLP 2004 — PageRank over the word
    * co-occurrence graph; the classic unsupervised keyword ranker, and
    * this library's demonstration of ITERATIVE graph computation):
    * nodes are words, edges connect words co-occurring within `window`
    * tokens (self-loops dropped) with weight = co-occurrence count
    * (the §4.2 weighted variant; symmetric by construction since both
    * directions fan out), and
    *
    *   r_{t+1}(v) = (1−d) + d · Σ_{u∼v} (w_uv / W_u) · r_t(u)
    *
    * runs `iters` damped rounds from r_0 = 1. Determinism: the
    * neighbor sum is the one order-dependent reduction, so it runs
    * through the decimal accumulator ([[graft.QueryDef.dsum]] — exact,
    * order-free addition, 4-dp requantization replayed identically by
    * both engines); the (w_uv/W_u)·r product is fixed-order IEEE on
    * exact inputs, so every iteration replays bit-for-bit and the
    * oracle unrolls the rounds verbatim. Scale shape: the edge table
    * is token-scale (ONE explode + partial agg, the [[gloveCooc]]
    * shape, built once); ranks and weighted degrees are vocab-keyed
    * and hapax-inclusive, so their per-round joins are left UNHINTED
    * for AQE — at curated scale AQE broadcasts them back onto the
    * edges, at raw-crawl vocab (10⁸–10⁹ words) it shuffle-joins
    * instead of OOMing the driver; `iters` passes over the edge
    * table, nothing collects. Words with no neighbor (single-word docs) carry no
    * edge and rank nothing, as in the paper. Output: top-k
    * (word, score) by (score desc, word). */
  def textrankKeywords(corpus: DataFrame, textCol: String,
      window: Int = 2, damping: Double = 0.85, iters: Int = 3,
      k: Int = 20): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1), got $damping")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(k >= 1, s"k must be >= 1, got $k")
    val offs = ((-window to -1) ++ (1 to window)).map(_.toLong)
    val edges = corpus
      .filter(col(textCol).isNotNull)
      .select(array_remove(words(col(textCol)), "").as("__ws"))
      .select(col("__ws"), posexplode(col("__ws")).as(Seq("__i", "w1")))
      .select(col("__ws"), col("__i").cast(LongType).as("__i"), col("w1"),
        explode(array(offs.map(lit): _*)).as("__off"))
      .filter(col("__i") + col("__off") >= 0 &&
        col("__i") + col("__off") < size(col("__ws")))
      .select(col("w1"), element_at(col("__ws"),
        (col("__i") + col("__off") + 1).cast(IntegerType)).as("w2"))
      .filter(col("w1") =!= col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("weight"))
    val wdeg = edges.groupBy(col("w1")).agg(sum(col("weight")).as("wdeg"))
    var ranks = wdeg.select(col("w1").as("w"), lit(1.0).as("r"))
    for (_ <- 1 to iters) {
      ranks = edges
        .join(wdeg, Seq("w1"))
        .join(ranks.withColumnRenamed("w", "w1"), Seq("w1"))
        .groupBy(col("w2"))
        .agg(((lit(1.0) - lit(damping)) + lit(damping) *
          graft.QueryDef.dsum((col("weight").cast(DoubleType) /
            col("wdeg").cast(DoubleType)) * col("r"))).as("r"))
        .select(col("w2").as("w"), col("r"))
    }
    ranks
      .select(col("w").as("word"), col("r").as("score"))
      .orderBy(col("score").desc, col("word").asc)
      .limit(k)
  }


  private[operators] lazy val wordmodelQueries: Seq[QueryDef] = Seq(
    // ---- p84: collocation mining — [[collocations]] over the corpus
    // (word2phrase score, δ = 5, minCount = 5, top-20). Zero
    // transcendentals: the oracle replays counts and the exact double
    // (c_ab − δ)/(c_a·c_b) verbatim; ties break on the pair.
    QueryDef(
      "p84_collocations",
      (s, d) =>
        collocations(T.documents(s, d), "text", k = 20, minCount = 5,
          delta = 5.0),
      Some("""
        WITH w AS (
          SELECT list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        bc AS (
          SELECT ws[i] AS w1, ws[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
          FROM w, unnest(range(1, len(ws))) t(i)
          WHERE len(ws) >= 2
          GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        uc AS (
          SELECT w AS wrd, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT unnest(ws) AS w FROM w) GROUP BY w)
        SELECT bc.w1, bc.w2, bc.c_ab, u1.c AS c_a, u2.c AS c_b,
               (CAST(bc.c_ab AS DOUBLE) - CAST(5.0 AS DOUBLE))
                 / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS score
        FROM bc JOIN uc u1 ON u1.wrd = bc.w1 JOIN uc u2 ON u2.wrd = bc.w2
        ORDER BY score DESC, bc.w1 ASC, bc.w2 ASC LIMIT 20"""))
    ,

    // ---- p87: skip-gram pair generation — [[skipgramPairs]] at
    // window = 3. The oracle replays the md5-derived per-center window
    // draw and the neighbor fan-out verbatim; the gate covers every
    // (center, context) pair the corpus yields, certifying bounds
    // handling at both document edges and the uniform 1..window draw.
    QueryDef(
      "p87_skipgram_pairs",
      (s, d) =>
        skipgramPairs(T.documents(s, d), "doc_id", "text", window = 3)
          .orderBy(col("doc_id"), col("center_no"), col("context_no")),
      Some("""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        c AS (
          SELECT doc_id, ws, CAST(i AS BIGINT) - 1 AS center_no, ws[i] AS center
          FROM w, unnest(range(1, len(ws) + 1)) t(i)),
        b AS (
          SELECT *, (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                CAST(center_no AS VARCHAR)), 1, 12) AS BIGINT) % 3) + 1 AS win
          FROM c),
        p AS (
          SELECT doc_id, center_no, center, center_no + off AS context_no,
                 ws[CAST(center_no + off AS INTEGER) + 1] AS context,
                 CAST(win AS BIGINT) AS win
          FROM b, unnest(list_concat(range(-win, 0), range(1, win + 1))) t(off)
          WHERE center_no + off >= 0 AND center_no + off < len(ws))
        SELECT doc_id, center_no, center, context_no, context, win
        FROM p ORDER BY doc_id, center_no, context_no""")),

    // ---- p88: GloVe co-occurrence matrix — [[gloveCooc]] at
    // window = 3, top-50 cells. Counts per distance are exact
    // integers; the 1/d-weighted xij folds in fixed ascending-d order,
    // which both engines spell as the identical left-associated
    // expression, so the doubles match bit-for-bit with no decimal
    // quantization anywhere.
    QueryDef(
      "p88_glove_cooc",
      (s, d) => gloveCooc(T.documents(s, d), "text", window = 3, k = 50),
      Some("""
        WITH w AS (
          SELECT list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        c AS (
          SELECT ws, CAST(i AS BIGINT) - 1 AS i0, ws[i] AS w1
          FROM w, unnest(range(1, len(ws) + 1)) t(i)),
        p AS (
          SELECT w1, ws[CAST(i0 + off AS INTEGER) + 1] AS w2,
                 abs(off) AS d
          FROM c, unnest([-3, -2, -1, 1, 2, 3]) t(off)
          WHERE i0 + off >= 0 AND i0 + off < len(ws)),
        g AS (
          SELECT w1, w2,
                 CAST(COUNT(*) FILTER (WHERE d = 1) AS BIGINT) AS cnt_1,
                 CAST(COUNT(*) FILTER (WHERE d = 2) AS BIGINT) AS cnt_2,
                 CAST(COUNT(*) FILTER (WHERE d = 3) AS BIGINT) AS cnt_3
          FROM p GROUP BY w1, w2)
        SELECT w1, w2, cnt_1, cnt_2, cnt_3,
               CAST(cnt_1 AS DOUBLE) / CAST(1.0 AS DOUBLE)
               + CAST(cnt_2 AS DOUBLE) / CAST(2.0 AS DOUBLE)
               + CAST(cnt_3 AS DOUBLE) / CAST(3.0 AS DOUBLE) AS xij
        FROM g ORDER BY xij DESC, w1 ASC, w2 ASC LIMIT 50""")),

    // ---- p89: interpolated Kneser–Ney bigram model —
    // [[knBigramModel]] at D = 0.75 over every attested bigram. D is
    // dyadic and every factor an exact integer ratio in fixed order,
    // so the oracle replays c_ab, the three summary tables, p_cont,
    // lambda and p_kn all bit-for-bit — a full smoothed-LM gate with
    // zero quantization.
    QueryDef(
      "p89_kneser_ney",
      (s, d) => knBigramModel(T.documents(s, d), "text", discount = 0.75)
        .orderBy(col("w1"), col("w2")),
      Some("""
        WITH w AS (
          SELECT list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        bc AS (
          SELECT ws[i] AS w1, ws[i+1] AS w2,
                 CAST(COUNT(*) AS BIGINT) AS c_ab
          FROM w, unnest(range(1, len(ws))) t(i)
          WHERE len(ws) >= 2 GROUP BY 1, 2),
        ctx AS (
          SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_ctx,
                 CAST(COUNT(*) AS BIGINT) AS n1p_ctx
          FROM bc GROUP BY w1),
        cont AS (
          SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_right
          FROM bc GROUP BY w2),
        nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM bc)
        SELECT bc.w1, bc.w2, bc.c_ab, ctx.c_ctx, ctx.n1p_ctx,
               cont.n1p_right,
               CAST(cont.n1p_right AS DOUBLE)
                 / CAST(nb.n_bigrams AS DOUBLE) AS p_cont,
               (CAST(0.75 AS DOUBLE) * CAST(ctx.n1p_ctx AS DOUBLE))
                 / CAST(ctx.c_ctx AS DOUBLE) AS lambda,
               greatest(CAST(bc.c_ab AS DOUBLE) - CAST(0.75 AS DOUBLE),
                   CAST(0.0 AS DOUBLE))
                 / CAST(ctx.c_ctx AS DOUBLE)
               + ((CAST(0.75 AS DOUBLE) * CAST(ctx.n1p_ctx AS DOUBLE))
                    / CAST(ctx.c_ctx AS DOUBLE))
                 * (CAST(cont.n1p_right AS DOUBLE)
                    / CAST(nb.n_bigrams AS DOUBLE)) AS p_kn
        FROM bc JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nb
        ORDER BY w1, w2""")),

    // ---- p91: TextRank keywords — [[textrankKeywords]] at window 2,
    // d = 0.85, THREE unrolled PageRank iterations, top-20. Each
    // round's neighbor sum goes through the decimal accumulator
    // (dsum/dsumSql — exact order-free addition, matched HALF_UP
    // 4-dp requantization), so the oracle replays all three rounds
    // bit-for-bit — an iterative graph computation under the full
    // rows+schema+hash gate.
    QueryDef(
      "p91_textrank",
      (s, d) => textrankKeywords(T.documents(s, d), "text", window = 2,
        damping = 0.85, iters = 3, k = 20),
      Some {
        val its = Seq(("r0", "r1"), ("r1", "r2"), ("r2", "r3")).map {
          case (prev, cur) => s"""
        $cur AS MATERIALIZED (
          SELECT e.w2 AS w,
                 (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                 + CAST(0.85 AS DOUBLE) *
                   ${graft.QueryDef.dsumSql(
            "(CAST(e.weight AS DOUBLE) / CAST(d.wdeg AS DOUBLE)) * r.r")}
                   AS r
          FROM edges e JOIN wdeg d USING (w1)
          JOIN $prev r ON r.w = e.w1
          GROUP BY e.w2)"""
        }.mkString(",")
        raw"""
        WITH w AS (
          SELECT list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        c AS (
          SELECT ws, CAST(i AS BIGINT) - 1 AS i0, ws[i] AS w1
          FROM w, unnest(range(1, len(ws) + 1)) t(i)),
        e0 AS (
          SELECT w1, ws[CAST(i0 + off AS INTEGER) + 1] AS w2
          FROM c, unnest([-2, -1, 1, 2]) t(off)
          WHERE i0 + off >= 0 AND i0 + off < len(ws)),
        edges AS MATERIALIZED (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS weight
          FROM e0 WHERE w1 <> w2 GROUP BY 1, 2),
        wdeg AS MATERIALIZED (
          SELECT w1, CAST(SUM(weight) AS BIGINT) AS wdeg
          FROM edges GROUP BY w1),
        r0 AS (SELECT w1 AS w, CAST(1.0 AS DOUBLE) AS r FROM wdeg),$its
        SELECT w AS word, r AS score FROM r3
        ORDER BY score DESC, word ASC LIMIT 20"""
      }),

    // ---- p97: interpolated Kneser–Ney TRIGRAM model —
    // [[knTrigramModel]] at D = 0.75 over every attested trigram,
    // all three levels (continuation-count P2/P1 included) replayed
    // bit-for-bit: dyadic discount, exact integer ratios, fixed-order
    // IEEE composition.
    QueryDef(
      "p97_kneser_ney_trigram",
      (s, d) => knTrigramModel(T.documents(s, d), "text", discount = 0.75)
        .orderBy(col("w1"), col("w2"), col("w3")),
      Some("""
        WITH w AS (
          SELECT list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        tc AS MATERIALIZED (
          SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3,
                 CAST(COUNT(*) AS BIGINT) AS c3
          FROM w, unnest(range(1, len(ws) - 1)) t(i)
          WHERE len(ws) >= 3 GROUP BY 1, 2, 3),
        ctx3 AS (
          SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12,
                 CAST(COUNT(*) AS BIGINT) AS n3
          FROM tc GROUP BY 1, 2),
        bt AS MATERIALIZED (
          SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS chat
          FROM tc GROUP BY 1, 2),
        ctx2 AS (
          SELECT w2, CAST(SUM(chat) AS BIGINT) AS chat2,
                 CAST(COUNT(*) AS BIGINT) AS n2
          FROM bt GROUP BY 1),
        uni AS (SELECT w3, CAST(COUNT(*) AS BIGINT) AS n1
                FROM bt GROUP BY 1),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM bt)
        SELECT tc.w1, tc.w2, tc.w3, tc.c3, ctx3.c12, ctx3.n3, bt.chat,
               ctx2.chat2, ctx2.n2, uni.n1,
               CAST(uni.n1 AS DOUBLE) / CAST(nt.ntot AS DOUBLE) AS p1,
               greatest(CAST(bt.chat AS DOUBLE) - CAST(0.75 AS DOUBLE),
                   CAST(0.0 AS DOUBLE)) / CAST(ctx2.chat2 AS DOUBLE)
               + ((CAST(0.75 AS DOUBLE) * CAST(ctx2.n2 AS DOUBLE))
                    / CAST(ctx2.chat2 AS DOUBLE))
                 * (CAST(uni.n1 AS DOUBLE) / CAST(nt.ntot AS DOUBLE))
                 AS p2,
               greatest(CAST(tc.c3 AS DOUBLE) - CAST(0.75 AS DOUBLE),
                   CAST(0.0 AS DOUBLE)) / CAST(ctx3.c12 AS DOUBLE)
               + ((CAST(0.75 AS DOUBLE) * CAST(ctx3.n3 AS DOUBLE))
                    / CAST(ctx3.c12 AS DOUBLE))
                 * (greatest(CAST(bt.chat AS DOUBLE)
                       - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE))
                      / CAST(ctx2.chat2 AS DOUBLE)
                    + ((CAST(0.75 AS DOUBLE) * CAST(ctx2.n2 AS DOUBLE))
                         / CAST(ctx2.chat2 AS DOUBLE))
                      * (CAST(uni.n1 AS DOUBLE)
                         / CAST(nt.ntot AS DOUBLE)))
                 AS p_kn
        FROM tc
        JOIN ctx3 USING (w1, w2)
        JOIN bt USING (w2, w3)
        JOIN ctx2 USING (w2)
        JOIN uni USING (w3)
        CROSS JOIN nt
        ORDER BY w1, w2, w3""")),

    // ---- p101: KN-scored documents — [[knBigramScore]] trained on
    // the even-id half, scoring EVERY document: the gate exercises
    // the seen and unseen-bigram backoff outcomes on real data (the
    // fixture's 31-word vocabulary leaves no OOV continuation — the
    // OOV-excluded and unseen-context arms are pinned by the spec's
    // hand fixture instead). The oracle rebuilds the p89 model on the
    // even half and replays the coalesce chain, the round-9 ln and
    // the decimal mean verbatim.
    QueryDef(
      "p101_kn_score",
      (s, d) => {
        val all = T.documents(s, d)
        knBigramScore(all.filter(col("doc_id") % 2 === 0), all,
          "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        bcm AS (
          SELECT ws[i] AS w1, ws[i+1] AS w2,
                 CAST(COUNT(*) AS BIGINT) AS c_ab
          FROM w, unnest(range(1, len(ws))) t(i)
          WHERE len(ws) >= 2 AND doc_id % 2 = 0 GROUP BY 1, 2),
        ctx AS (
          SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_ctx,
                 CAST(COUNT(*) AS BIGINT) AS n1p
          FROM bcm GROUP BY w1),
        cont AS (
          SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1pr
          FROM bcm GROUP BY w2),
        nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bcm),
        model AS (
          SELECT bcm.w1, bcm.w2,
                 greatest(CAST(c_ab AS DOUBLE) - CAST(0.75 AS DOUBLE),
                     CAST(0.0 AS DOUBLE)) / CAST(c_ctx AS DOUBLE)
                 + ((CAST(0.75 AS DOUBLE) * CAST(n1p AS DOUBLE))
                      / CAST(c_ctx AS DOUBLE))
                   * (CAST(n1pr AS DOUBLE) / CAST(nb.n AS DOUBLE)) AS p_kn
          FROM bcm JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nb),
        lam AS (
          SELECT w1, (CAST(0.75 AS DOUBLE) * CAST(n1p AS DOUBLE))
                   / CAST(c_ctx AS DOUBLE) AS lambda
          FROM ctx),
        pc AS (
          SELECT cont.w2, CAST(n1pr AS DOUBLE) / CAST(nb.n AS DOUBLE)
                   AS p_cont
          FROM cont CROSS JOIN nb),
        occ AS (
          SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
          FROM w, unnest(range(1, len(ws))) t(i)
          WHERE len(ws) >= 2),
        sc AS (
          SELECT occ.doc_id, model.p_kn,
                 COALESCE(model.p_kn, lam.lambda * pc.p_cont, pc.p_cont)
                   AS p
          FROM occ
          LEFT JOIN model ON model.w1 = occ.w1 AND model.w2 = occ.w2
          LEFT JOIN lam ON lam.w1 = occ.w1
          LEFT JOIN pc ON pc.w2 = occ.w2)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN p_kn IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_seen,
               CAST(SUM(CASE WHEN p_kn IS NULL AND p IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
               CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_oov,
               CASE WHEN COUNT(*) - SUM(CASE WHEN p IS NULL
                        THEN 1 ELSE 0 END) > 0
                    THEN ${graft.QueryDef.dsumSql(
        "CASE WHEN p IS NOT NULL THEN round(ln(p), 9) END")}
                         / CAST(COUNT(*) - SUM(CASE WHEN p IS NULL
                             THEN 1 ELSE 0 END) AS DOUBLE)
               END AS logprob_avg
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // ---- p111: Min-K% Prob — [[knMinKProb]] with p101's exact setup
    // (bigram KN trained on the even-id half, scoring every document,
    // k = 25%). The oracle rebuilds the p101 model CTEs verbatim, then
    // replays the doc-keyed rank/cutoff selection: ROW_NUMBER ties are
    // engine-arbitrary but the selected value multiset is invariant,
    // so the decimal sum matches bit-for-bit.
    QueryDef(
      "p111_min_k_prob",
      (s, d) => {
        val all = T.documents(s, d)
        knMinKProb(all.filter(col("doc_id") % 2 === 0), all,
          "doc_id", "text", kPct = 0.25)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        bcm AS (
          SELECT ws[i] AS w1, ws[i+1] AS w2,
                 CAST(COUNT(*) AS BIGINT) AS c_ab
          FROM w, unnest(range(1, len(ws))) t(i)
          WHERE len(ws) >= 2 AND doc_id % 2 = 0 GROUP BY 1, 2),
        ctx AS (
          SELECT w1, CAST(SUM(c_ab) AS BIGINT) AS c_ctx,
                 CAST(COUNT(*) AS BIGINT) AS n1p
          FROM bcm GROUP BY w1),
        cont AS (
          SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1pr
          FROM bcm GROUP BY w2),
        nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bcm),
        model AS (
          SELECT bcm.w1, bcm.w2,
                 greatest(CAST(c_ab AS DOUBLE) - CAST(0.75 AS DOUBLE),
                     CAST(0.0 AS DOUBLE)) / CAST(c_ctx AS DOUBLE)
                 + ((CAST(0.75 AS DOUBLE) * CAST(n1p AS DOUBLE))
                      / CAST(c_ctx AS DOUBLE))
                   * (CAST(n1pr AS DOUBLE) / CAST(nb.n AS DOUBLE)) AS p_kn
          FROM bcm JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nb),
        lam AS (
          SELECT w1, (CAST(0.75 AS DOUBLE) * CAST(n1p AS DOUBLE))
                   / CAST(c_ctx AS DOUBLE) AS lambda
          FROM ctx),
        pc AS (
          SELECT cont.w2, CAST(n1pr AS DOUBLE) / CAST(nb.n AS DOUBLE)
                   AS p_cont
          FROM cont CROSS JOIN nb),
        occ AS (
          SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
          FROM w, unnest(range(1, len(ws))) t(i)
          WHERE len(ws) >= 2),
        sc AS (
          SELECT occ.doc_id,
                 COALESCE(model.p_kn, lam.lambda * pc.p_cont, pc.p_cont)
                   AS p
          FROM occ
          LEFT JOIN model ON model.w1 = occ.w1 AND model.w2 = occ.w2
          LEFT JOIN lam ON lam.w1 = occ.w1
          LEFT JOIN pc ON pc.w2 = occ.w2),
        rkd AS (
          SELECT doc_id, round(ln(p), 9) AS lp,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY round(ln(p), 9) ASC) AS r,
                 COUNT(*) OVER (PARTITION BY doc_id) AS ns
          FROM sc WHERE p IS NOT NULL),
        cut AS (
          SELECT doc_id, lp, r, ns,
                 greatest(1, CAST(ceil(0.25 * CAST(ns AS DOUBLE))
                   AS BIGINT)) AS m
          FROM rkd)
        SELECT doc_id, CAST(MAX(ns) AS BIGINT) AS n_scored,
               CAST(MAX(m) AS BIGINT) AS k_count,
               ${graft.QueryDef.dsumSql("CASE WHEN r <= m THEN lp END")}
                 / CAST(MAX(m) AS DOUBLE) AS mink_avg
        FROM cut GROUP BY doc_id ORDER BY doc_id""")),

    // ---- p103: trigram-KN-scored documents — [[knTrigramScore]]
    // trained on the even half, scoring every document through the
    // full three-level backoff. The oracle rebuilds the p97 tables on
    // the even half and replays both coalesce levels, the round-9 ln
    // and the decimal mean verbatim.
    QueryDef(
      "p103_kn3_score",
      (s, d) => {
        val all = T.documents(s, d)
        knTrigramScore(all.filter(col("doc_id") % 2 === 0), all,
          "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        tc AS MATERIALIZED (
          SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3,
                 CAST(COUNT(*) AS BIGINT) AS c3
          FROM w, unnest(range(1, len(ws) - 1)) t(i)
          WHERE len(ws) >= 3 AND doc_id % 2 = 0 GROUP BY 1, 2, 3),
        ctx3 AS (
          SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12,
                 CAST(COUNT(*) AS BIGINT) AS n3
          FROM tc GROUP BY 1, 2),
        bt AS MATERIALIZED (
          SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS chat
          FROM tc GROUP BY 1, 2),
        ctx2 AS (
          SELECT w2, CAST(SUM(chat) AS BIGINT) AS chat2,
                 CAST(COUNT(*) AS BIGINT) AS n2
          FROM bt GROUP BY 1),
        uni AS (SELECT w3, CAST(COUNT(*) AS BIGINT) AS n1
                FROM bt GROUP BY 1),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM bt),
        p2t AS (
          SELECT bt.w2, bt.w3,
                 greatest(CAST(bt.chat AS DOUBLE) - CAST(0.75 AS DOUBLE),
                     CAST(0.0 AS DOUBLE)) / CAST(ctx2.chat2 AS DOUBLE)
                 + ((CAST(0.75 AS DOUBLE) * CAST(ctx2.n2 AS DOUBLE))
                      / CAST(ctx2.chat2 AS DOUBLE))
                   * (CAST(uni.n1 AS DOUBLE) / CAST(nt.ntot AS DOUBLE))
                   AS p2
          FROM bt JOIN ctx2 USING (w2) JOIN uni ON uni.w3 = bt.w3
          CROSS JOIN nt),
        m3 AS (
          SELECT tc.w1, tc.w2, tc.w3,
                 greatest(CAST(tc.c3 AS DOUBLE) - CAST(0.75 AS DOUBLE),
                     CAST(0.0 AS DOUBLE)) / CAST(ctx3.c12 AS DOUBLE)
                 + ((CAST(0.75 AS DOUBLE) * CAST(ctx3.n3 AS DOUBLE))
                      / CAST(ctx3.c12 AS DOUBLE)) * p2t.p2 AS p_kn
          FROM tc JOIN ctx3 USING (w1, w2)
          JOIN p2t ON p2t.w2 = tc.w2 AND p2t.w3 = tc.w3),
        lam3 AS (
          SELECT w1, w2, (CAST(0.75 AS DOUBLE) * CAST(n3 AS DOUBLE))
                   / CAST(c12 AS DOUBLE) AS l3
          FROM ctx3),
        lam2 AS (
          SELECT w2, (CAST(0.75 AS DOUBLE) * CAST(n2 AS DOUBLE))
                   / CAST(chat2 AS DOUBLE) AS l2
          FROM ctx2),
        p1t AS (
          SELECT w3, CAST(n1 AS DOUBLE) / CAST(nt.ntot AS DOUBLE) AS p1
          FROM uni CROSS JOIN nt),
        occ AS (
          SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
          FROM w, unnest(range(1, len(ws) - 1)) t(i)
          WHERE len(ws) >= 3),
        s1 AS (
          SELECT occ.doc_id, m3.p_kn, lam3.l3,
                 COALESCE(p2t.p2, lam2.l2 * p1t.p1, p1t.p1) AS p2f
          FROM occ
          LEFT JOIN m3 ON m3.w1 = occ.w1 AND m3.w2 = occ.w2
                      AND m3.w3 = occ.w3
          LEFT JOIN lam3 ON lam3.w1 = occ.w1 AND lam3.w2 = occ.w2
          LEFT JOIN p2t ON p2t.w2 = occ.w2 AND p2t.w3 = occ.w3
          LEFT JOIN lam2 ON lam2.w2 = occ.w2
          LEFT JOIN p1t ON p1t.w3 = occ.w3),
        sc AS (
          SELECT doc_id, p_kn, COALESCE(p_kn, l3 * p2f, p2f) AS p
          FROM s1)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN p_kn IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_seen,
               CAST(SUM(CASE WHEN p_kn IS NULL AND p IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
               CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_oov,
               CASE WHEN COUNT(*) - SUM(CASE WHEN p IS NULL
                        THEN 1 ELSE 0 END) > 0
                    THEN ${graft.QueryDef.dsumSql(
        "CASE WHEN p IS NOT NULL THEN round(ln(p), 9) END")}
                         / CAST(COUNT(*) - SUM(CASE WHEN p IS NULL
                             THEN 1 ELSE 0 END) AS DOUBLE)
               END AS logprob_avg
        FROM sc GROUP BY doc_id ORDER BY doc_id"""))
  )
}
