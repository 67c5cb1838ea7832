package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Sampling and mixing: deterministic hash sampling, stratified
  * splits, temperature-scaled source mixing, and DSIR importance
  * scoring / resampling.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait SamplingOps { self: Pipeline.type =>

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
  /** The shared per-stratum RNG-free ordering hash: md5(stratum:id),
    * id tie-break. Every stratified sampler ranks through the ONE
    * [[withStratumMd5Rank]] definition built on this hash — the
    * documented contract that related curation steps draw from one
    * consistent shuffle of each stratum (review r10: two verbatim
    * copies of the formula could drift apart). */
  private def stratumMd5(stratumCol: String, idCol: String): Column =
    md5(concat(col(stratumCol), lit(":"), col(idCol).cast(StringType)))

  /** Exact per-stratum md5 rank WITHOUT a stratum-sized window task —
    * the two-level salted construction (r18 verdict #1). A plain
    * `row_number() OVER (PARTITION BY stratum ORDER BY md5, id)` puts
    * each stratum's FULL row set through one window task; strata are
    * languages/domains — maybe 5–50 — so at 100 TB one task sorts
    * terabytes. Here rows rank inside (stratum, salt) where the salt is
    * the first 2 hex chars of the ordering md5 ITSELF: the
    * within-stratum order IS the md5 string order, so the 256 salt
    * prefixes are disjoint CONTIGUOUS rank ranges, and
    * per-(stratum, salt) count offsets (|strata|·256 rows, broadcast)
    * complete the exact global-within-stratum rank — identical ranks,
    * ~256× the parallelism, spec-pinned ≡ the one-level window in
    * SamplingTwoLevelSpec. `running` adds exact per-stratum RUNNING
    * SUMS over the same order (the [[unimaxSample]] admission sum),
    * each completed with sum offsets from the SAME tiny offsets table.
    * Adds `rankCol` (1-based long) and one long column per `running`
    * entry; `__h`/`__salt` scratch columns are dropped. A NULL md5
    * (NULL stratum or id) salts to "" — before "00" in string order,
    * matching Spark's NULLS FIRST ascending placement. */
  private def withStratumMd5Rank(df: DataFrame, stratumCol: String,
      idCol: String, rankCol: String,
      running: Seq[(Column, String)] = Nil): DataFrame = {
    val salted = df
      .withColumn("__h", stratumMd5(stratumCol, idCol))
      .withColumn("__salt", coalesce(substring(col("__h"), 1, 2), lit("")))
    val w = Window.partitionBy(col(stratumCol), col("__salt"))
      .orderBy(col("__h"), col(idCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // each running sum also tracks its NON-NULL count: the one-level
    // window's sum is NULL exactly when the stratum-prefix holds zero
    // non-null source values, and salt-local sums alone cannot tell
    // "prefix all-NULL" (one-level NULL) from "this salt all-NULL but
    // earlier salts had values" (one-level non-NULL) — review r19.2
    val ranked = running.foldLeft(
      salted.withColumn("__srk", row_number().over(w))) {
      case (d, (src, out)) =>
        d.withColumn(s"__sc_$out", sum(src).over(cum))
          .withColumn(s"__sn_$out", count(src).over(cum))
    }
    // per-(stratum, salt) counts and sums with an EXCLUSIVE cumulative
    // over the salt order WITHIN each stratum: |strata|·256 rows — the
    // offsets window is parameter-scale, never corpus-sized
    val aggs = count(lit(1)).as("__n") +:
      running.flatMap { case (src, out) =>
        Seq(sum(src).as(s"__s_$out"), count(src).as(s"__cn_$out")) }
    val offW = Window.partitionBy(col(stratumCol)).orderBy(col("__salt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs0 = salted.groupBy(col(stratumCol), col("__salt"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__off", coalesce(sum(col("__n")).over(offW), lit(0L)))
    val offs = running.foldLeft(offs0) { case (d, (_, out)) =>
      d.withColumn(s"__o_$out",
        coalesce(sum(col(s"__s_$out")).over(offW), lit(0L)))
        .withColumn(s"__oc_$out",
          coalesce(sum(col(s"__cn_$out")).over(offW), lit(0L)))
    }.select(col(stratumCol) +: col("__salt") +: col("__off") +:
      running.flatMap { case (_, out) =>
        Seq(col(s"__o_$out"), col(s"__oc_$out")) }: _*)
    val joined = ranked.join(broadcast(offs), Seq(stratumCol, "__salt"))
      .withColumn(rankCol, (col("__off") + col("__srk")).cast(LongType))
    running.foldLeft(joined) { case (d, (_, out)) =>
      d.withColumn(out,
        when(col(s"__oc_$out") + col(s"__sn_$out") === 0,
          lit(null).cast(LongType))
          .otherwise((col(s"__o_$out") + coalesce(col(s"__sc_$out"), lit(0L)))
            .cast(LongType)))
        .drop(s"__o_$out", s"__oc_$out", s"__sc_$out", s"__sn_$out")
    }.drop("__h", "__salt", "__srk", "__off")
  }

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
    withStratumMd5Rank(docs, stratumCol, idCol, "rk")
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
    * per-stratum count agg → one-row broadcast → the two-level
    * (stratum, md5-salt) rank of [[withStratumMd5Rank]] — the single
    * corpus shuffle any stratified pass needs, ~256 window tasks per
    * stratum. Output: caller columns + rk. */
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
    withStratumMd5Rank(corpus.join(broadcast(quotas), Seq(stratumCol)),
        stratumCol, idCol, "rk")
      .filter(col("rk") <= col("__q"))
      .select(Seq(col(idCol), col(stratumCol))
        ++ corpus.columns.filterNot(c => c == idCol || c == stratumCol)
          .map(col)
        :+ col("rk").cast(LongType).as("rk"): _*)
  }

  /** UniMax budget allocation + selection (Chung et al., "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", ICLR 2023): spread a total token
    * `budget` as UNIFORMLY as possible across strata, subject to the
    * per-stratum epoch cap — no stratum may contribute more than
    * `epochs` passes over its own `n_l` tokens. The published fix for
    * temperature sampling's failure modes at large budgets (α must be
    * retuned per budget; tail languages silently over-epoch): capacity
    * c_l = epochs·n_l, then exact integer waterfilling — strata whose
    * capacity falls below the fair share are capped AT capacity and
    * the remainder re-spreads over the rest, i.e. ascending by c_l a
    * stratum is capped iff c_l·(remaining strata) + (capacities
    * already paid) ≤ budget, and every uncapped stratum gets
    * ⌊(budget − Σ capped c_l) / #uncapped⌋. All-integer (engine-exact;
    * overflow needs c_l·L ≥ 2⁶³ — a yotta-token stratum). Selection
    * materializes ONE epoch greedily: within each stratum docs take
    * the shared RNG-free md5 order ([[rebalanceToMix]]'s formula, via
    * the one [[withStratumMd5Rank]] definition — rank and running sum can
    * never drift apart) and a doc is kept while the running token sum
    * stays within the quota; a quota above n_l (epochs > 1 worth of
    * repetition) keeps the whole stratum and reports the surplus in
    * `quota` for the caller's epoch loop. NULL-stratum rows are
    * dropped (the quota join is inner), like [[rebalanceToMix]]'s
    * unknown strata. Plan shape: one per-stratum token-sum agg, the
    * waterfilling windows run over L = |strata| rows (parameter-scale
    * — the whole quota table broadcasts), then ONE two-level
    * (stratum, md5-salt) pass carrying BOTH the rank and the running
    * token sum ([[withStratumMd5Rank]]'s `running` hook — never a
    * stratum-sized window task). Output: (idCol, stratumCol,
    * tokensCol, rk, quota). */
  def unimaxSample(corpus: DataFrame, idCol: String, stratumCol: String,
      tokensCol: String, budget: Long, epochs: Int = 1): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val caps = corpus.groupBy(col(stratumCol))
      .agg(sum(col(tokensCol).cast(LongType)).as("__n"))
      .select(col(stratumCol), (col("__n") * epochs).as("__c"))
    // the waterfilling windows are unpartitioned BY DESIGN: they run
    // over one row per stratum (languages/domains — parameter-scale),
    // never over the corpus
    val byCap = Window.orderBy(col("__c"), col(stratumCol))
    val pre = Window.orderBy(col("__c"), col(stratumCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(col("__c"), col(stratumCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = caps
      .withColumn("__i", row_number().over(byCap))
      .withColumn("__L", count(lit(1)).over(all))
      .withColumn("__pre", coalesce(sum(col("__c")).over(pre), lit(0L)))
      .withColumn("__capped",
        col("__c") * (col("__L") - col("__i") + 1) + col("__pre") <= budget)
      .withColumn("__sc",
        sum(when(col("__capped"), col("__c")).otherwise(0L)).over(all))
      .withColumn("__u",
        sum(when(col("__capped"), 0L).otherwise(1L)).over(all))
      .select(col(stratumCol),
        when(col("__capped"), col("__c"))
          .otherwise(expr(s"($budget - __sc) div __u")).as("quota"))
    // rank AND running token sum ride ONE two-level pass: both are
    // (stratum, salt)-windowed and completed by the same broadcast
    // offsets table — never a stratum-sized window task
    withStratumMd5Rank(corpus.join(broadcast(quotas), Seq(stratumCol)),
        stratumCol, idCol, "rk",
        running = Seq((col(tokensCol).cast(LongType), "__cum")))
      .filter(col("__cum") <= col("quota"))
      .select(Seq(col(idCol), col(stratumCol))
        ++ corpus.columns.filterNot(c => c == idCol || c == stratumCol).map(col)
        ++ Seq(col("rk").cast(LongType).as("rk"), col("quota")): _*)
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
    * (broadcast back), then the two-level (stratum, md5-salt) rank of
    * [[withStratumMd5Rank]] — the single corpus shuffle any stratified
    * pass needs, ~256 window tasks per stratum. Fraction
    * thresholds are IEEE double products floored (correctly rounded,
    * engine-identical). Output: caller's columns + (rk, split). */
  def stratifiedSplit(corpus: DataFrame, idCol: String, stratumCol: String,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      s"need trainFrac, valFrac >= 0 with sum <= 1, got $trainFrac + $valFrac")
    val counts = corpus.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
    withStratumMd5Rank(corpus.join(broadcast(counts), Seq(stratumCol)),
        stratumCol, idCol, "rk")
      .withColumn("split",
        when(col("rk") <= floor(lit(trainFrac) * col("__n")), "train")
          .when(col("rk") <= floor(lit(trainFrac) * col("__n"))
            + floor(lit(valFrac) * col("__n")), "val")
          .otherwise("test"))
      .select(Seq(col(idCol), col(stratumCol))
        ++ corpus.columns.filterNot(c => c == idCol || c == stratumCol).map(col)
        ++ Seq(col("rk").cast(LongType).as("rk"), col("split")): _*)
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

  /** Frequency-based token subsampling (Mikolov et al., NeurIPS 2013
    * §2.3 — word2vec's famous subsampling trick, the occurrence-level
    * downsampler embedding and LM pipelines run to stop "the"/"of"
    * from dominating the training stream): each OCCURRENCE of word w
    * survives with probability √(t / f(w)) where f is w's corpus
    * frequency fraction — words rarer than the threshold t always
    * survive (keep-p ≥ 1), ubiquitous words keep ~√t/√f of their
    * occurrences. RNG-free (the [[resampleByImportance]] stance): the
    * uniform is md5-derived from (word, doc, position), so reruns and
    * engines agree exactly — and here even the keep probability is
    * transcendental-free (√ of an IEEE division is correctly rounded
    * in both engines), so nothing is quantized. keep_p is capped at
    * 1.0 (it IS a probability), which buys the scale bound: only
    * words with f > t can ever be dropped, and since Σf = 1 there are
    * FEWER THAN 1/t of them (1,000 at the paper's t = 1e-3) — so the
    * broadcast frequency table is bounded by the THRESHOLD, not the
    * vocabulary, whose hapax tail is unbounded at 100 TB. The corpus
    * side stays one exploded pass with a broadcast left join + a
    * map-side filter — it never shuffles (plan-pinned). Output: the
    * kept occurrences (doc_id, word_no, word, keep_p); absent-from-
    * table words carry keep_p = 1.0. */
  def frequencySubsample(corpus: DataFrame, idCol: String, textCol: String,
      t: Double = 1e-3): DataFrame = {
    require(t > 0, s"t must be > 0, got $t")
    val occ = corpus
      .select(col(idCol).as("doc_id"),
        posexplode(array_remove(words(col(textCol)), ""))
          .as(Seq("word_no", "word")))
      .select(col("doc_id"), col("word_no").cast(LongType), col("word"))
    val uc = occ.groupBy(col("word")).agg(count(lit(1)).as("c"))
    val tot = occ.agg(count(lit(1)).as("n"))
    // the <1/t frequent words, with their sub-1 keep probability; the
    // f = t boundary is safe on either side (√(t/f) = 1 ⟺ keep-always)
    val freq = uc.crossJoin(broadcast(tot))
      .filter(col("c").cast(DoubleType) / col("n").cast(DoubleType) > t)
      .select(col("word"), sqrt(lit(t) /
        (col("c").cast(DoubleType) / col("n").cast(DoubleType)))
        .as("__kp"))
    val u = (conv(substring(md5(concat(col("word"), lit(":"),
      col("doc_id").cast(StringType), lit(":"),
      col("word_no").cast(StringType))), 1, 12), 16, 10)
      .cast(DoubleType) + 0.5) / lit(math.pow(2, 48))
    occ.join(broadcast(freq), Seq("word"), "left")
      .withColumn("keep_p", coalesce(col("__kp"), lit(1.0)))
      .filter(u < col("keep_p"))
      .select(col("doc_id"), col("word_no"), col("word"), col("keep_p"))
  }

  /** Curriculum training order (Bengio et al. ICML'09 applied to LLM
    * data: easy-first document scheduling): assign every row a global
    * training position that visits difficulty buckets in ascending
    * order, md5-shuffled WITHIN each bucket (deterministic, RNG-free —
    * the [[stratifiedSplit]] rank machinery). `bucketCol` is any
    * caller-derived integer difficulty band (a length band, a quality
    * quartile, a perplexity band — fixed boundaries keep it a map-side
    * derivation). Plan shape: positions come from the two-level
    * (bucket, md5-salt) rank of [[withStratumMd5Rank]] (~256 window
    * tasks per bucket — difficulty bands are FEW, so bucket-only
    * partitioning would bottleneck on 4–10 tasks) plus per-bucket
    * offsets from a bucket-count aggregate (bucket-cardinality-sized,
    * broadcast back), NOT a corpus-wide single-partition row_number —
    * the p92 slice trick, so the op survives 100 TB. Output: caller
    * columns + rk (rank within bucket) + pos (global 1-based training
    * position). */
  def curriculumOrder(corpus: DataFrame, idCol: String,
      bucketCol: String): DataFrame = {
    // a NULL bucket raises LOUDLY (riding the rank column): the offset
    // equi-join can never match a NULL key, so such rows would
    // otherwise vanish from the training layout without a trace
    // (review r18.2)
    val b = corpus.withColumn("__b",
      when(col(bucketCol).isNull, raise_error(concat(
        lit("curriculumOrder: NULL bucket for row "),
        col(idCol).cast(StringType),
        lit(s" — assign every row a difficulty in '$bucketCol' first"))))
        .otherwise(col(bucketCol).cast(StringType)))
    val ranked = withStratumMd5Rank(b, "__b", idCol, "rk")
    // bucket offsets: counts (one tiny agg), cumulative sum over the
    // ascending bucket order — bucket-cardinality rows, broadcast back
    val offs = b.groupBy(col(bucketCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(Window.orderBy(col(bucketCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(bucketCol), col("__off"))
    ranked.join(broadcast(offs), Seq(bucketCol))
      .select(Seq(col(idCol), col(bucketCol))
        ++ corpus.columns.filterNot(c => c == idCol || c == bucketCol).map(col)
        :+ col("rk")
        :+ (col("__off") + col("rk")).cast(LongType).as("pos"): _*)
  }

  /** Token-balanced shard assignment — the training-data placement
    * step: spread documents over `nShards` output shards so per-shard
    * token totals stay close (boustrophedon/"snake" placement over the
    * tokens-descending order: shard pattern 0..S−1, S−1..0, repeating —
    * each full snake cycle gives every shard exactly two docs from one
    * size neighborhood, so totals track each other far tighter than
    * hash placement, which leaves Θ(√n) skew). The global
    * tokens-descending rank does NOT use a corpus-wide single-partition
    * window: rows rank inside their (size class, top-9-bits sub-class)
    * — disjoint token ranges, a PARTITIONED window with up to ~16 k
    * parallel tasks — and per-(class, sub-class) count offsets
    * (≤ 64·256 rows) complete the exact global rank
    * ([[rankByValueClass]], the two-level p92 slice trick).
    * Ties break by id, so reruns and the oracle agree exactly.
    * Output: caller columns + rank (global, tokens-descending) +
    * shard (0-based). */
  /** Exact global rank over (`valueCol` asc/desc, id asc) WITHOUT a
    * corpus-wide single-partition window — the p92 slice trick shared
    * by [[balancedShards]] and [[paddingWasteReport]], TWO-LEVEL
    * (r18 verdict #1): the binary size class (`length(bin(value))` —
    * disjoint value ranges) alone is ≤ 64 partitions, and real
    * doc-length distributions put 30–50 % of a corpus in 1–2 modal
    * classes — one window task carrying terabytes at 100 TB. So each
    * class is SUB-CLASSED on the value's top 9 bits
    * (`value >> max(bitlen − 9, 0)` — still disjoint, still
    * order-preserving value sub-ranges, ≤ 256 per class): the window
    * partitions by (class, sub-class) — up to ~16 k parallel tasks —
    * and (class, sub-class) count offsets (≤ 64·256 rows, broadcast;
    * the offsets window is parameter-scale) complete the exact global
    * rank, spec-pinned ≡ the plain single window in
    * SamplingTwoLevelSpec. Values must be non-negative (a negative
    * long's two's-complement bin() is 64 chars — it would silently
    * class ABOVE every positive value); the guard rides the rank
    * column so pruning cannot elide it. Adds `rankCol` (1-based long);
    * the `__cls`/`__sub` scratch columns are dropped. */
  private def rankByValueClass(df: DataFrame, valueCol: String,
      idCol: String, rankCol: String, ascending: Boolean): DataFrame = {
    val guarded = when(col(valueCol) < 0, raise_error(concat(
      lit(s"rank over '$valueCol': negative value "), col(valueCol),
      lit(" — binary size classes require non-negative keys"))))
      .otherwise(col(valueCol))
    val c = df.withColumn("__cls", length(bin(guarded)))
      .withColumn("__sub", expr(
        s"shiftright($valueCol, greatest(cast(length(bin($valueCol)) as int) - 9, 0))"))
    val order =
      if (ascending) Seq(col(valueCol).asc, col(idCol).asc)
      else Seq(col(valueCol).desc, col(idCol).asc)
    val ranked = c.withColumn("__rk",
      row_number().over(Window.partitionBy(col("__cls"), col("__sub"))
        .orderBy(order: _*)))
    val offOrder =
      if (ascending) Seq(col("__cls").asc, col("__sub").asc)
      else Seq(col("__cls").desc, col("__sub").desc)
    val offs = c.groupBy(col("__cls"), col("__sub"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(Window.orderBy(offOrder: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__cls"), col("__sub"), col("__off"))
    ranked.join(broadcast(offs), Seq("__cls", "__sub"))
      .withColumn(rankCol, (col("__off") + col("__rk")).cast(LongType))
      .drop("__cls", "__sub", "__rk", "__off")
  }

  def balancedShards(corpus: DataFrame, idCol: String, tokenCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val c = corpus.withColumn("__toks",
      coalesce(col(tokenCol).cast(LongType), lit(0L)))
    val snake = rankByValueClass(c, "__toks", idCol, "rank",
      ascending = false)
      .withColumn("__r0", (col("rank") - 1) % (2L * nShards))
    snake.select(Seq(col(idCol))
      ++ corpus.columns.filterNot(_ == idCol).map(col)
      :+ col("rank")
      :+ when(col("__r0") < nShards, col("__r0"))
        .otherwise(lit(2L * nShards - 1) - col("__r0"))
        .cast(IntegerType).as("shard"): _*)
  }

  /** Padding-waste report — the batching-efficiency diagnostic behind
    * length-bucketed batching (every serving/training stack pads a
    * batch's rows to its longest member, so batch COMPOSITION sets the
    * waste): for `arrival` (id-order) and `sorted` (token-descending)
    * batch layouts of size `batchSize`, the padded-token overhead
    * n_b·max(len) − Σlen summed over batches, and its share of the
    * padded stream. Sorting by length is the standard fix (e.g.
    * dynamic batching in inference servers); this op QUANTIFIES what
    * it saves on a concrete corpus. Both layouts rank through
    * [[rankByValueClass]] (no single-partition window); the per-batch
    * aggregate shuffles ⌈n/B⌉ keys. All counts are exact integers;
    * the share is one double division. Output: (strategy, n_batches,
    * total_tokens, padded_tokens, waste_share). */
  def paddingWasteReport(corpus: DataFrame, idCol: String,
      tokenCol: String, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    // the arrival-order rank keys on the id itself, so a non-integral
    // id would silently cast to NULL and report n_batches = 0 for the
    // arrival strategy while 'sorted' computes fine (review r18.2)
    val idType = corpus.schema(idCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, LongType).contains(idType),
      s"paddingWasteReport: idCol '$idCol' must be an integral type " +
        s"(the arrival-order rank keys on it), found $idType")
    val base = corpus.select(col(idCol),
      coalesce(col(tokenCol).cast(LongType), lit(0L)).as("__toks"))
    def wasteOf(ranked: DataFrame, strategy: String): DataFrame =
      ranked
        .withColumn("__batch", ((col("__rank") - 1) / batchSize)
          .cast(LongType))
        .groupBy(col("__batch"))
        .agg(count(lit(1)).as("__n"), max(col("__toks")).as("__mx"),
          sum(col("__toks")).as("__sum"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("__sum")).as("total_tokens"),
          sum(col("__n") * col("__mx") - col("__sum")).as("padded_tokens"))
        .select(lit(strategy).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          when(col("total_tokens") + col("padded_tokens") > 0,
            col("padded_tokens").cast(DoubleType)
              / (col("total_tokens") + col("padded_tokens"))
                .cast(DoubleType)).as("waste_share"))
        // an empty corpus must yield ZERO rows (the oracle's GROUP BY
        // over an empty union), not one n_batches=0 / NULL-totals row
        // per strategy that downstream summaries would have to
        // special-case (r18 ADVICE)
        .filter(col("n_batches") > 0)
    val arrival = wasteOf(
      rankByValueClass(base.withColumn("__id", col(idCol).cast(LongType)),
        "__id", idCol, "__rank", ascending = true), "arrival")
    val srt = wasteOf(
      rankByValueClass(base, "__toks", idCol, "__rank", ascending = false),
      "sorted")
    arrival.union(srt).orderBy(col("strategy"))
  }

  /** SamplingOps QueryDefs — registered through [[Pipeline.queries]];
    * names, plans and oracle SQL unchanged by the r15 module split. */
  private[operators] lazy val samplingQueries: Seq[QueryDef] = Seq(
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

    // ---- p24: distribution rebalancing — subsample the corpus to a
    // TARGET language mix (en 40%, de/fr/es/zh 15% each), the curation
    // step that fixes source skew before training. The max total
    // honoring the target is T = min_l floor(n_l·W/w_l) (integer-exact
    // with integer weights w_l summing to W); each language keeps its
    // floor(T·w_l/W) hash-first documents — selection is an md5 rank,
    // so the sample is deterministic and reproducible with NO RNG, like
    // p15. Plan shape: one tiny per-lang count agg, a scalar broadcast,
    // and the two-level (lang, md5-salt) rank — the single corpus
    // shuffle any stratified pass needs, ~256 window tasks per lang.
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

    // ---- p77: UniMax epoch-capped sampling — [[unimaxSample]] over
    // the language strata at budget 40 000 word-tokens, epochs = 2.
    // At sf0.01 that lands the interesting mixed outcome: the four
    // small languages hit their 2-epoch capacity (quota = 2·n_l — the
    // whole stratum admits, surplus reported for the epoch loop) and
    // `en` alone is budget-limited (quota = budget − Σ capped < n_en),
    // so its md5-ordered prefix cuts mid-stratum. The oracle replays
    // the integer waterfilling windows, the capped condition, the
    // integer division and the rank+running-sum admission verbatim.
    QueryDef(
      "p77_unimax_sample",
      (s, d) =>
        unimaxSample(
          T.documents(s, d).select(col("doc_id"), col("lang"),
            size(array_remove(words(col("text")), ""))
              .cast(LongType).as("n_tok")),
          "doc_id", "lang", "n_tok", budget = 40000L, epochs = 2)
          .orderBy(col("doc_id")),
      Some("""
        WITH d AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents),
        c AS (SELECT lang, 2 * SUM(n_tok) AS c FROM d GROUP BY lang),
        r AS (
          SELECT lang, c,
                 ROW_NUMBER() OVER (ORDER BY c, lang) AS i,
                 COUNT(*) OVER () AS L,
                 COALESCE(SUM(c) OVER (ORDER BY c, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS pre
          FROM c),
        f AS (SELECT *, (c * (L - i + 1) + pre <= 40000) AS capped FROM r),
        g AS (
          SELECT *,
                 SUM(CASE WHEN capped THEN c ELSE 0 END) OVER () AS sc,
                 SUM(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS u
          FROM f),
        q AS (
          SELECT lang, CAST(CASE WHEN capped THEN c
                   ELSE (40000 - sc) // u END AS BIGINT) AS quota
          FROM g),
        ranked AS (
          SELECT d.doc_id, d.lang, d.n_tok, q.quota,
                 ROW_NUMBER() OVER (PARTITION BY d.lang
                   ORDER BY md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)),
                            d.doc_id) AS rk,
                 SUM(d.n_tok) OVER (PARTITION BY d.lang
                   ORDER BY md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)),
                            d.doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM d JOIN q USING (lang))
        SELECT doc_id, lang, n_tok, CAST(rk AS BIGINT) AS rk, quota
        FROM ranked WHERE cum <= quota ORDER BY doc_id""")),

    // ---- p85: word2vec frequency subsampling — [[frequencySubsample]]
    // at t = 1e-3 (the paper's recommended threshold; the 31-word
    // fixture vocabulary makes every word frequent enough that keep
    // probabilities sit well inside (0,1), so the gate certifies real
    // probabilistic thinning, not all-keep). The oracle replays the
    // threshold-bounded frequency table (only f > t words — the <1/t
    // broadcast bound), the √(t/f) keep probability, the keep_p = 1.0
    // fallback for rare words, and the md5-derived per-occurrence
    // uniform verbatim — all IEEE-exact, nothing quantized.
    QueryDef(
      "p85_freq_subsample",
      (s, d) =>
        frequencySubsample(T.documents(s, d), "doc_id", "text", t = 1e-3)
          .orderBy(col("doc_id"), col("word_no")),
      Some("""
        WITH w AS (
          SELECT doc_id, CAST(i AS BIGINT) - 1 AS word_no, ws[i] AS word
          FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '') AS ws
                FROM documents WHERE text IS NOT NULL),
               unnest(range(1, len(ws) + 1)) t(i)),
        uc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
               FROM w GROUP BY word),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w),
        f AS (
          SELECT word,
                 sqrt(CAST(0.001 AS DOUBLE) /
                   (CAST(uc.c AS DOUBLE) / CAST(tot.n AS DOUBLE))) AS kp
          FROM uc CROSS JOIN tot
          WHERE CAST(uc.c AS DOUBLE) / CAST(tot.n AS DOUBLE)
                  > CAST(0.001 AS DOUBLE)),
        j AS (
          SELECT w.doc_id, w.word_no, w.word,
                 COALESCE(f.kp, CAST(1.0 AS DOUBLE)) AS keep_p,
                 (CAST(CAST('0x' || substr(md5(w.word || ':' ||
                      CAST(w.doc_id AS VARCHAR) || ':' ||
                      CAST(w.word_no AS VARCHAR)), 1, 12) AS BIGINT)
                    AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / 281474976710656.0 AS u
          FROM w LEFT JOIN f USING (word))
        SELECT doc_id, word_no, word, keep_p
        FROM j WHERE u < keep_p ORDER BY doc_id, word_no""")),

    // ---- p136: curriculum training order — [[curriculumOrder]] with a
    // fixed-boundary length band as the difficulty bucket (short docs
    // first; boundaries 200/300/400 straddle the fixture quartiles so
    // all four bands populate). The oracle replays the md5
    // within-bucket shuffle, the bucket-count offsets (window SUM cast
    // back to BIGINT — the recorded DuckDB HUGEINT gotcha) and the
    // offset+rank position arithmetic verbatim.
    QueryDef(
      "p136_curriculum_order",
      (s, d) =>
        curriculumOrder(
          T.documents(s, d).select(col("doc_id"),
            when(col("n_chars") < 200, 0).when(col("n_chars") < 300, 1)
              .when(col("n_chars") < 400, 2).otherwise(3)
              .cast(IntegerType).as("difficulty")),
          "doc_id", "difficulty")
          .orderBy(col("pos")),
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CAST(CASE WHEN n_chars < 200 THEN 0
                           WHEN n_chars < 300 THEN 1
                           WHEN n_chars < 400 THEN 2
                           ELSE 3 END AS INTEGER) AS difficulty
          FROM documents),
        ranked AS (
          SELECT doc_id, difficulty,
                 ROW_NUMBER() OVER (PARTITION BY difficulty
                   ORDER BY md5(CAST(difficulty AS VARCHAR) || ':' ||
                                CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM d),
        cnt AS (SELECT difficulty, COUNT(*) AS n FROM d GROUP BY difficulty),
        offs AS (
          SELECT difficulty,
                 CAST(COALESCE(SUM(n) OVER (ORDER BY difficulty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS off
          FROM cnt)
        SELECT r.doc_id, r.difficulty, CAST(r.rk AS BIGINT) AS rk,
               CAST(o.off + r.rk AS BIGINT) AS pos
        FROM ranked r JOIN offs o USING (difficulty)
        ORDER BY pos""")),

    // ---- p137: token-balanced shard assignment — [[balancedShards]]
    // at 8 shards over whitespace token counts. The oracle's global
    // rank uses the plain single-window spelling (ORDER BY tokens
    // DESC, doc_id) — provably equal to the operator's two-level
    // class+offset construction, which is exactly what the gate
    // certifies — then replays the snake fold.
    QueryDef(
      "p137_balanced_shards",
      (s, d) =>
        balancedShards(
          T.documents(s, d).select(col("doc_id"),
            coalesce(size(array_remove(words(col("text")), ""))
              .cast(LongType), lit(0L)).as("n_tok")),
          "doc_id", "n_tok", nShards = 8)
          .orderBy(col("doc_id")),
      Some("""
        WITH d AS (
          SELECT doc_id,
                 COALESCE(CAST(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS BIGINT), 0) AS n_tok
          FROM documents),
        ranked AS (
          SELECT doc_id, n_tok,
                 ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) AS rank
          FROM d),
        s AS (SELECT *, (rank - 1) % 16 AS r0 FROM ranked)
        SELECT doc_id, n_tok, CAST(rank AS BIGINT) AS rank,
               CAST(CASE WHEN r0 < 8 THEN r0 ELSE 15 - r0 END AS INTEGER)
                 AS shard
        FROM s ORDER BY doc_id""")),

    // ---- p141: padding-waste report — [[paddingWasteReport]] at
    // batch size 32 over whitespace token counts: arrival-order vs
    // length-sorted batch layouts, exact integer padded-token overhead
    // per strategy. The oracle replays both rank orders with the plain
    // single-window spelling (≡ the operator's class+offset
    // construction, certified by p137), the per-batch n·max−sum fold,
    // and the one double division.
    QueryDef(
      "p141_padding_waste",
      (s, d) =>
        paddingWasteReport(
          T.documents(s, d).select(col("doc_id"),
            coalesce(size(array_remove(words(col("text")), ""))
              .cast(LongType), lit(0L)).as("n_tok")),
          "doc_id", "n_tok", batchSize = 32),
      Some("""
        WITH d AS (
          SELECT doc_id,
                 COALESCE(CAST(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS BIGINT), 0) AS n_tok
          FROM documents),
        ranked AS (
          SELECT doc_id, n_tok,
                 ROW_NUMBER() OVER (ORDER BY doc_id) AS r_arr,
                 ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) AS r_srt
          FROM d),
        per AS (
          SELECT 'arrival' AS strategy, (r_arr - 1) // 32 AS b,
                 n_tok FROM ranked
          UNION ALL
          SELECT 'sorted' AS strategy, (r_srt - 1) // 32 AS b,
                 n_tok FROM ranked),
        batches AS (
          SELECT strategy, b, COUNT(*) AS n, MAX(n_tok) AS mx,
                 SUM(n_tok) AS sm
          FROM per GROUP BY strategy, b),
        agg AS (
          SELECT strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
                 CAST(SUM(sm) AS BIGINT) AS total_tokens,
                 CAST(SUM(n * mx - sm) AS BIGINT) AS padded_tokens
          FROM batches GROUP BY strategy)
        SELECT strategy, n_batches, total_tokens, padded_tokens,
               CASE WHEN total_tokens + padded_tokens > 0
                    THEN CAST(padded_tokens AS DOUBLE)
                         / CAST(total_tokens + padded_tokens AS DOUBLE)
               END AS waste_share
        FROM agg ORDER BY strategy"""))
  )
}
