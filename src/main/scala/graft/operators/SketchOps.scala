package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded-size sketches and corpus diagnostics: the Count-Min
  * frequency sketch, the HyperLogLog distinct sketch (with its
  * lossless register-max merge), the datasheet-style corpus data
  * card, the vocabulary growth curve and the corpus drift report.
  *
  * Split out of TextOps when it outgrew the r15 ~2k-line module
  * guideline; mixed into [[Pipeline]], which remains the single public
  * entry point, so no caller, gate, or oracle changed. */
private[operators] trait SketchOps { self: Pipeline.type =>
  /** Count-Min sketch of a corpus's whitespace-token frequencies, as
    * ONE broadcast-ready row of `depth` dense count arrays (Cormode &
    * Muthukrishnan, "An Improved Data Stream Summary: the Count-Min
    * Sketch and its Applications", J. Algorithms 2005). Row j of the
    * sketch counts every occurrence at column [[doubleHashPositions]]
    * j of the token; estimates ([[cmsEstimate]]) take the min over
    * rows and can only OVER-count (collisions add, never subtract).
    * This is the scale-contract counterpart of [[vocabTopK]]'s exact
    * counting: exact term frequency shuffles an UNBOUNDED key space
    * (the vocabulary grows with the corpus — hapaxes dominate at
    * 100 TB), while the sketch's partial agg collapses to at most
    * depth×width cells PER MAPPER regardless of corpus size — a fixed
    * shuffle and memory budget chosen up front, with the standard
    * guarantee err ≤ (e/width)·N at probability 1 − e^−depth.
    * Plan: occurrence fan-out map-side (depth rows per token via
    * posexplode — the row index IS j), one (j, pos)-keyed partial-agg
    * shuffle over ≤ depth·width keys, then a depth·width-bounded
    * collapse into dense arrays so probes are O(1) element_at, never a
    * map scan. NULL text contributes nothing. */
  def cmsSketch(corpus: DataFrame, textCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    // batch cell pass counts words FIRST and hashes each DISTINCT word
    // once, weighting its cells by the count (r19): md5 work drops
    // from occurrence-scale to vocabulary-scale, and a gate/caller
    // that also computes exact term frequencies shares the word-count
    // shuffle via exchange reuse. Identical cells by associativity:
    // sum over grouped occurrences = count over occurrences. The
    // streaming twin keeps the single-aggregation [[cmsCells]] shape
    // (two chained aggregations are unsupported in a stream); both
    // paths share the ONE [[doubleHashPositions]] arithmetic, and the
    // stream ≡ batch pin certifies they cannot drift.
    val cells = corpus
      .filter(col(textCol).isNotNull)
      .select(explode(array_remove(words(col(textCol)), "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__wc"))
      .select(col("__wc"),
        posexplode(doubleHashPositions(col("__w"), depth, width))
          .as(Seq("__j", "__pos")))
      .groupBy(col("__j"), col("__pos"))
      .agg(sum(col("__wc")).as("__c"))
    cells
      .groupBy(col("__j"))
      .agg(map_from_entries(collect_list(
        struct(col("__pos").cast(IntegerType), col("__c")))).as("__m"))
      .select(col("__j"), transform(sequence(lit(0), lit(width - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0L))).as("__arr"))
      .groupBy()
      .agg(
        first(when(col("__j") === 0, col("__arr")), ignoreNulls = true)
          .as("__cms_0"),
        (1 until depth).map(j =>
          first(when(col("__j") === j, col("__arr")), ignoreNulls = true)
            .as(s"__cms_$j")): _*)
  }

  /** The cell-count half of [[cmsSketch]]: one (__j, __pos, __c) row
    * per non-empty sketch cell. Factored out so the streaming counter
    * ([[graft.streaming.Streams.termFrequencyCms]]) aggregates the
    * SAME double-hash arithmetic the batch sketch does. */
  private[graft] def cmsCells(corpus: DataFrame, textCol: String,
      depth: Int, width: Int): DataFrame =
    corpus
      .filter(col(textCol).isNotNull)
      .select(explode(array_remove(words(col(textCol)), "")).as("__w"))
      .select(posexplode(doubleHashPositions(col("__w"), depth, width))
        .as(Seq("__j", "__pos")))
      .groupBy(col("__j"), col("__pos"))
      .agg(count(lit(1)).as("__c"))

  /** Count-Min frequency estimates for a candidate item frame against
    * a [[cmsSketch]] row: est(x) = min_j sketch[j][pos_j(x)] ≥ the
    * true count, with the sketch's (e/width)·N error bound. The
    * candidate side is whatever bounded set the caller cares about (a
    * sample's distinct tokens, a blocklist, last snapshot's heavy
    * hitters — the sketch itself deliberately cannot enumerate keys);
    * the sketch row broadcasts and every probe is a map-side
    * element_at chain, so candidates never shuffle and never join
    * anything data-sized. Output: every caller column + `cms_est`
    * (0 for items the corpus never hashed into non-zero cells; NULL
    * items estimate 0). */
  def cmsEstimate(items: DataFrame, itemCol: String,
      sketch: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    val pos = doubleHashPositions(col(itemCol), depth, width)
    val probes = (0 until depth).map(j => coalesce(
      element_at(col(s"__cms_$j"),
        element_at(pos, j + 1).cast(IntegerType) + 1), lit(0L)))
    val est = if (depth == 1) probes.head else least(probes: _*)
    items
      .crossJoin(broadcast(sketch))
      .withColumn("cms_est", coalesce(est, lit(0L)))
      .drop((0 until depth).map(j => s"__cms_$j"): _*)
  }

  /** HyperLogLog sketch of a corpus's DISTINCT whitespace-token count,
    * as one broadcast-ready row holding the m = 2^b dense registers
    * (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the analysis of
    * a near-optimal cardinality estimation algorithm", AofA 2007). The
    * cardinality counterpart of [[cmsSketch]]'s frequency sketch — and
    * the same scale contract: exact `countDistinct` shuffles the whole
    * unbounded vocabulary (hapaxes dominate at 100 TB), while HLL's
    * partial agg collapses to at most m cells PER MAPPER (max combines
    * map-side) for a fixed ~1.04/√m relative error chosen up front.
    * Per occurrence: one md5 → 48-bit h; register index = the low b
    * bits, payload w = the high 48−b bits, rank = leading zeros of w
    * within its width + 1 (via the BINARY-STRING length — `bin` is
    * minimal-length in both Spark and DuckDB, so the oracle replays
    * the rank with zero floating point); register = max rank. Max is
    * idempotent, so occurrences need no distinct pass. NULL text
    * contributes nothing; an untouched register stays 0. */
  def hllSketch(corpus: DataFrame, textCol: String, b: Int = 6): DataFrame =
    hllRegisters(hllMelt(corpus, textCol, b), b)

  /** The reduce half shared by [[hllSketch]] and the n-gram profile's
    * approx mode: melted (bucket, rank) rows → ONE dense-register
    * sketch row (`__hll`, m longs). `carryTotal = true` adds the
    * melted ROW COUNT as `__total` in the same aggregation — the melt
    * emits exactly one row per item, so consumers needing both the
    * sketch and the item count read the (exploded, expensive) item
    * stream ONCE instead of once per statistic (review r19.5). */
  private[graft] def hllRegisters(melted: DataFrame, b: Int,
      carryTotal: Boolean = false): DataFrame = {
    require(b >= 1 && b <= 16, s"b must be in [1,16], got $b")
    val m = 1 << b
    val perBucket = melted
      .groupBy(col("__b"))
      .agg(max(col("__rk")).as("__r"), count(lit(1)).as("__c"))
    val folded = perBucket
      .groupBy()
      .agg(map_from_entries(collect_list(
        struct(col("__b"), col("__r")))).as("__m"),
        sum(col("__c")).as("__t"))
    val regs = transform(sequence(lit(0), lit(m - 1)),
      i => coalesce(element_at(col("__m"), i), lit(0L))).as("__hll")
    if (carryTotal)
      folded.select(regs, coalesce(col("__t"), lit(0L)).as("__total"))
    else folded.select(regs)
  }

  /** The map-side half of [[hllSketch]]: one (__b bucket, __rk rank)
    * row per token occurrence. Factored out so the streaming counter
    * ([[graft.streaming.Streams.distinctCountHll]]) aggregates the
    * SAME arithmetic the batch sketch does — two spellings of the
    * hash/rank math could silently drift. */
  private[graft] def hllMelt(corpus: DataFrame, textCol: String,
      b: Int): DataFrame =
    hllMeltItems(corpus
      .filter(col(textCol).isNotNull)
      .select(explode(array_remove(words(col(textCol)), "")).as("__w")),
      "__w", b)

  /** The ONE hash/rank spelling under every HLL consumer (tokens,
    * n-grams, stream batches): per item, register index = low b bits
    * of the 48-bit md5 hash, rank = leading-zero count of the high
    * 48−b bits + 1 via the minimal-length binary string (`bin` agrees
    * between Spark and DuckDB — zero floating point in the
    * registers). */
  private[graft] def hllMeltItems(items: DataFrame, itemCol: String,
      b: Int): DataFrame = {
    require(b >= 1 && b <= 16, s"b must be in [1,16], got $b")
    val m = 1 << b
    val wBits = 48 - b
    val h = conv(substring(md5(col(itemCol)), 1, 12), 16, 10).cast(LongType)
    val payload = shiftright(h, b)
    val rank = when(payload === 0, lit((wBits + 1).toLong))
      .otherwise(lit((wBits + 1).toLong) - length(bin(payload)).cast(LongType))
    items
      .select(h.bitwiseAND(lit((m - 1).toLong)).cast(IntegerType).as("__b"),
        rank.as("__rk"))
  }

  /** Lossless HLL union: register-wise max over any number of
    * [[hllSketch]] rows → one merged sketch row. This is the algebra
    * that makes HLL a distributed summary (Flajolet et al. 2007 §4 —
    * the registers of A∪B are exactly the element-wise max of A's and
    * B's): shards/partitions/days sketch independently, ship one
    * m-long array each, and merge commutes with estimation — so a
    * 100 TB corpus's distinct count is a tree of register maxes over
    * per-split sketches, never a re-scan. Spec-pinned:
    * sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly. */
  def hllMerge(sketches: DataFrame, b: Int = 6): DataFrame = {
    require(b >= 1 && b <= 16, s"b must be in [1,16], got $b")
    val m = 1 << b
    sketches
      .select(posexplode(col("__hll")).as(Seq("__b", "__r")))
      .groupBy(col("__b"))
      .agg(max(col("__r")).as("__r"))
      .groupBy()
      .agg(map_from_entries(collect_list(
        struct(col("__b"), col("__r")))).as("__m"))
      .select(transform(sequence(lit(0), lit(m - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0L))).as("__hll"))
  }

  /** HyperLogLog raw estimate over a [[hllSketch]] row: appends
    * `hll_v0` (empty registers), `hll_hsum` (the harmonic denominator
    * Σ 2^−M_j) and `hll_raw_est` (α_m·m²/hsum). Deliberately the RAW
    * estimator only — the paper's small-range linear-counting branch
    * needs ln(), whose last-bit rounding the engines don't guarantee;
    * callers needing it apply m·ln(m/V) on the emitted v0. Everything
    * here IS bit-replayable: each term is 1/2^M via an exact integer
    * shift, and every partial sum of the m terms needs at most
    * b + (48−b) + 1 = 49 mantissa bits, so the double sum is EXACT and
    * order-independent at any b — no fold-order pinning required.
    * α_m uses the paper's closed form 0.7213/(1+1.079/m) for all m
    * (the classic small-m constants differ below m=128 only in the
    * bias regime the raw estimator doesn't correct anyway). The sketch
    * row is one broadcast row; the probe is map-side element_at. */
  def hllEstimate(sketch: DataFrame, b: Int = 6): DataFrame = {
    require(b >= 1 && b <= 16, s"b must be in [1,16], got $b")
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val terms = sequence(lit(1), lit(m))
    val hsum = aggregate(terms, lit(0.0), (acc, i) => acc +
      lit(1.0) / call_function("shiftleft", lit(1L),
        element_at(col("__hll"), i).cast(IntegerType)).cast(DoubleType))
    val v0 = size(filter(col("__hll"), r => r === 0L)).cast(LongType)
    sketch
      .withColumn("hll_v0", v0)
      .withColumn("hll_hsum", hsum)
      .withColumn("hll_raw_est",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / col("hll_hsum"))
  }

  /** Corpus data card — the quantitative core of a dataset datasheet
    * (Gebru et al., "Datasheets for Datasets", CACM 2021; the summary
    * table every released pretraining corpus ships — Dolma, FineWeb,
    * RedPajama all publish exactly these axes): ONE long-format frame
    * of (section, key, n_docs, n_tokens, n_chars) rows covering corpus
    * totals, per-stratum breakdowns (language, source, … — any caller
    * columns), a fixed-boundary document-length histogram (integer
    * thresholds, engine-exact), and data-quality counters (NULL texts,
    * whitespace-only texts, docs whose exact content duplicates
    * another). Each section is one partial-agg pass over the corpus
    * and the union is section-count × stratum-cardinality rows —
    * report-sized at any corpus scale; the only non-trivial shuffle is
    * the md5-keyed duplicate count, the [[DedupOps.exactDedup]] shape.
    * n_tokens/n_chars are NULL where the axis doesn't apply (quality
    * counters). */
  /** The data-card counter columns — ONE definition shared with the
    * streaming twin ([[graft.streaming.Streams.runningCardCounts]]),
    * so the pinned stream ≡ batch equivalence holds by construction
    * rather than by parallel maintenance (review r16). NULL text
    * counts 0 tokens / 0 chars but still one doc. */
  private[graft] def cardTokenCount(text: Column): Column =
    coalesce(when(text.isNotNull,
      size(array_remove(words(text), "")).cast(LongType)), lit(0L))
  private[graft] def cardCharCount(text: Column): Column =
    coalesce(when(text.isNotNull, length(text).cast(LongType)), lit(0L))
  private[graft] def cardStratumKey(c: Column): Column =
    coalesce(c.cast(StringType), lit("NULL"))

  def dataCard(corpus: DataFrame, idCol: String, textCol: String,
      strataCols: Seq[String] = Seq.empty): DataFrame = {
    val base = corpus.select(Seq(col(idCol).as("__id"),
      col(textCol).as("__t"),
      cardTokenCount(col(textCol)).as("__tok"),
      cardCharCount(col(textCol)).as("__ch"))
      ++ strataCols.map(c => col(c).cast(StringType).as(c)): _*)
    def pack(section: String, key: Column, grouped: DataFrame): DataFrame =
      grouped.select(lit(section).as("section"), key.as("key"),
        col("__d").as("n_docs"), col("__tk").as("n_tokens"),
        col("__c").as("n_chars"))
    val totals = pack("corpus", lit("all"),
      base.agg(count(lit(1)).as("__d"), sum(col("__tok")).as("__tk"),
        sum(col("__ch")).as("__c")))
    val strata = strataCols.map { sc =>
      pack(s"by_$sc", coalesce(col(sc), lit("NULL")),
        base.groupBy(col(sc)).agg(count(lit(1)).as("__d"),
          sum(col("__tok")).as("__tk"), sum(col("__ch")).as("__c")))
    }
    // power-of-two token-length buckets at fixed integer boundaries:
    // "0", "1-32", "33-64", "65-128", …, "1025+" — deterministic CASE
    // thresholds, no float log anywhere
    val bounds = Seq(32L, 64L, 128L, 256L, 512L, 1024L)
    val bucket = bounds.zip(1L +: bounds.dropRight(1).map(_ + 1))
      .foldRight(when(col("__tok") === 0L, "0")
          .otherwise(s"${bounds.last + 1}+")) { case ((hi, lo), acc) =>
        when(col("__tok") === 0L, "0")
          .when(col("__tok") <= hi, s"$lo-$hi").otherwise(acc)
      }
    val hist = pack("tokens_bucket", col("__b"),
      base.select(bucket.as("__b"), col("__tok"), col("__ch"))
        .groupBy(col("__b")).agg(count(lit(1)).as("__d"),
          sum(col("__tok")).as("__tk"), sum(col("__ch")).as("__c")))
    // quality counters: token/char sums don't apply → NULL
    val nullLong = lit(null).cast(LongType)
    val quality = Seq(
      ("null_text", col("__t").isNull),
      ("blank_text", col("__t").isNotNull && trim(col("__t")) === ""),
      ("exact_dup_docs",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(coalesce(md5(col("__t")),
            concat(lit("n:"), col("__id").cast(StringType))))
          .orderBy(col("__id"))) > 1))
    val qualityRows = {
      val flags = base.select(
        quality.map { case (k, c) => c.cast(LongType).as(k) }: _*)
      val agg = flags.agg(
        sum(col(quality.head._1)).as(quality.head._1),
        quality.drop(1).map { case (k, _) => sum(col(k)).as(k) }: _*)
      quality.map { case (k, _) =>
        agg.select(lit("quality").as("section"), lit(k).as("key"),
          coalesce(col(k), lit(0L)).as("n_docs"),
          nullLong.as("n_tokens"), nullLong.as("n_chars"))
      }.reduce(_ unionByName _)
    }
    (Seq(totals) ++ strata ++ Seq(hist, qualityRows))
      .reduce(_ unionByName _)
  }

  /** Vocabulary growth curve — Heaps'-law diagnostics without the
    * transcendental fit (Heaps 1978; the "is more data still adding
    * new types?" curve corpus reports plot): split the id range into
    * `buckets` equal-width slices and report, per slice, how many
    * NEVER-BEFORE-SEEN words first appear there, plus the cumulative
    * vocabulary. A flattening vocab_cum says the source is exhausting
    * its novelty — the data-acquisition signal. Everything is integer
    * arithmetic: each word reduces to min(first-seen id) in ONE
    * partial agg (hapaxes combine map-side — the same shuffle budget
    * as a vocabulary count), slice assignment is an exact integer
    * formula off one broadcast (min, max) row, and the cumulative sum
    * is a window over `buckets` rows. Docs are sliced by ID RANGE
    * (ingest order), not by a computed rank — at 100 TB a global
    * row_number is a sort nobody needs when the ingest id already
    * encodes order. Output: (bucket, id_lo, id_hi, n_docs, n_tokens,
    * vocab_new, vocab_cum). */
  def vocabGrowth(corpus: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val bounds = corpus.agg(min(col(idCol)).cast(LongType).as("__lo"),
      (max(col(idCol)).cast(LongType) + 1).as("__hi"))
    def bucketOf(id: Column): Column =
      least(call_function("div", (id - col("__lo")) * buckets,
        greatest(col("__hi") - col("__lo"), lit(1L))),
        lit((buckets - 1).toLong)).cast(IntegerType)
    val docsB = corpus
      .select(col(idCol).cast(LongType).as("__id"),
        coalesce(size(array_remove(words(col(textCol)), "")), lit(0))
          .cast(LongType).as("__tok"))
      .crossJoin(broadcast(bounds))
      .groupBy(bucketOf(col("__id")).as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
    val firstSeen = corpus
      .select(col(idCol).cast(LongType).as("__id"),
        explode(array_remove(words(col(textCol)), "")).as("__w"))
      .groupBy(col("__w")).agg(min(col("__id")).as("__first"))
      .crossJoin(broadcast(bounds))
      .groupBy(bucketOf(col("__first")).as("bucket"))
      .agg(count(lit(1)).as("vocab_new"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docsB
      .join(firstSeen, Seq("bucket"), "left")
      .na.fill(0L, Seq("vocab_new"))
      .crossJoin(broadcast(bounds))
      .select(col("bucket"),
        (col("__lo") + call_function("div",
          (col("__hi") - col("__lo")) * col("bucket").cast(LongType),
          lit(buckets.toLong))).as("id_lo"),
        (col("__lo") + call_function("div",
          (col("__hi") - col("__lo")) * (col("bucket") + 1).cast(LongType),
          lit(buckets.toLong)) - 1).as("id_hi"),
        col("n_docs"), col("n_tokens"), col("vocab_new"))
      .withColumn("vocab_cum", sum(col("vocab_new")).over(win))
      .orderBy(col("bucket"))
  }

  /** Corpus drift report — total-variation distance between the
    * unigram distributions of two corpus slices (snapshots, sources,
    * time windows; the distribution-shift monitor a mixing pipeline
    * watches): TVD(P,Q) = ½ Σ_w |p_w − q_w| over the union vocabulary,
    * with the top-k drift CONTRIBUTORS (largest |p_w − q_w|) named so
    * the report says WHAT moved, not just how much. TVD is the
    * transcendental-free divergence (KL's ln is deliberately avoided —
    * the [[hllEstimate]] stance), so everything replays exactly: p/q
    * are exact integer ratios, |p−q| is one IEEE subtraction, and the
    * union-vocab sum rides the decimal accumulator. Shape: one
    * slice-labeled token pass, ONE word-keyed partial agg carrying
    * both slices' counts, one broadcast totals row; the TVD row is a
    * vocab-bounded fold broadcast back onto the top-k. Output: top-k
    * (word, c_a, c_b, p_a, p_b, abs_diff) + constant `tvd`. */
  def corpusDrift(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def toks(df: DataFrame, label: Int): DataFrame = df
      .filter(col(textCol).isNotNull)
      .select(explode(array_remove(words(col(textCol)), "")).as("__w"),
        lit(label).as("__s"))
    val counts = toks(a, 0).unionAll(toks(b, 1))
      .groupBy(col("__w"))
      .agg(coalesce(sum(when(col("__s") === 0, 1L)), lit(0L)).as("c_a"),
        coalesce(sum(when(col("__s") === 1, 1L)), lit(0L)).as("c_b"))
    val totals = counts.agg(sum(col("c_a")).as("__na"),
      sum(col("c_b")).as("__nb"))
    val scored = counts
      .crossJoin(broadcast(totals))
      .withColumn("p_a",
        col("c_a").cast(DoubleType) / col("__na").cast(DoubleType))
      .withColumn("p_b",
        col("c_b").cast(DoubleType) / col("__nb").cast(DoubleType))
      .withColumn("abs_diff", abs(col("p_a") - col("p_b")))
    val tvd = scored.agg(
      (lit(0.5) * graft.QueryDef.dsum(col("abs_diff"))).as("tvd"))
    scored
      .select(col("__w").as("word"), col("c_a"), col("c_b"),
        col("p_a"), col("p_b"), col("abs_diff"))
      .orderBy(col("abs_diff").desc, col("word").asc)
      .limit(k)
      .crossJoin(broadcast(tvd))
  }

  /** Zipf rank–frequency slope: least-squares fit of ln(freq) over
    * ln(rank) across the top-`topK` vocabulary head — the classic
    * corpus-health diagnostic (natural text sits near slope −1;
    * template/boilerplate-heavy or gibberish corpora drift off it,
    * Zipf 1949 / Piantadosi 2014's review). Complements [[vocabGrowth]]
    * (the Heaps'-law tail view) with the head view.
    *
    * Scale shape: one unigram partial agg, then a TakeOrdered top-K —
    * the rank window runs over K rows only, NEVER a global window over
    * the (corpus-growing) vocabulary. Determinism: ranks total-ordered
    * by (count desc, word asc); x/y carry the shared round-9 ln
    * stance; all four regression sums ride [[graft.QueryDef.dsum]]
    * (exact order-free decimal addition), so slope and intercept are
    * bit-identical across engines. Output: ONE row
    * (n_ranks, slope, intercept). */
  def zipfSlope(corpus: DataFrame, textCol: String,
      topK: Int = 100): DataFrame = {
    require(topK >= 2, s"topK must be >= 2 to fit a line, got $topK")
    val counts = corpus
      .select(explode(array_remove(words(col(textCol)), "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val head = counts.orderBy(col("cnt").desc, col("w").asc).limit(topK)
    val ranked = head.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("w").asc)))
    val x = round(log(col("rank").cast(DoubleType)), 9)
    val y = round(log(col("cnt").cast(DoubleType)), 9)
    val sums = ranked.agg(
      count(lit(1)).as("n_ranks"),
      graft.QueryDef.dsum(x).as("sx"),
      graft.QueryDef.dsum(y).as("sy"),
      graft.QueryDef.dsum(x * y).as("sxy"),
      graft.QueryDef.dsum(x * x).as("sxx"))
    val n = col("n_ranks").cast(DoubleType)
    sums
      // loud degenerate guard (r17 self-review): a corpus with < 2
      // distinct words has a zero regression denominator — NaN would
      // silently flow downstream; the error rides the slope column so
      // column pruning cannot elide it
      .withColumn("slope",
        when(col("n_ranks") >= 2,
          (n * col("sxy") - col("sx") * col("sy")) /
            (n * col("sxx") - col("sx") * col("sx")))
          .otherwise(raise_error(concat(
            lit("zipfSlope: corpus has only "), col("n_ranks"),
            lit(" distinct word(s) — need >= 2 ranks to fit a line")))
            .cast(DoubleType)))
      .select(col("n_ranks"),
        col("slope"),
        ((col("sy") - col("slope") * col("sx")) / n).as("intercept"))
  }

  /** N-gram duplication profile — the corpus-health diagnostic behind
    * dedup POLICY choices (Lee et al. "Deduplicating Training Data
    * Makes Language Models Better", ACL 2022 reports exactly this
    * sweep): for each gram length n, the share of n-gram OCCURRENCES
    * that are repeats of an already-counted gram
    * ((total − distinct) / total). Read as a curve: high dup share at
    * large n means copied PASSAGES (substring/near dedup will bite);
    * high share only at small n is ordinary language redundancy.
    * One (count, count-distinct) aggregation per requested n — each an
    * exact gram-keyed shuffle, the audited-diagnostic contract. Docs
    * shorter than n words contribute no n-grams; NULL texts none at
    * any n.
    *
    * `approx = true` is the 100 TB mode: the exact distinct over
    * 8-gram space is the most expensive aggregate in the profile (the
    * gram-keyed shuffle carries the hapax-dominated gram universe), so
    * the distinct side routes through the [[hllSketch]] machinery
    * instead — the gram melt collapses to at most m = 2^`b` register
    * cells PER MAPPER (max combines map-side; NOTHING gram-keyed ever
    * shuffles), for a documented ±1.04/√m relative error on
    * `distinct_grams` (±1.6 % at the default b = 12) and whatever that
    * propagates to `dup_gram_share` (error ≤ distinct/total · 1.6 %,
    * amplified when total ≈ distinct). Estimation follows Flajolet
    * §4: linear counting m·ln(m/V) in the small range (raw ≤ 2.5 m,
    * V > 0; the ln carries the shared round-9 stance so both engines
    * agree bit-for-bit — the p112 precedent), the raw harmonic
    * estimate otherwise; the estimate is rounded to a long so the
    * column stays drop-in for the exact mode's schema, and the share
    * is clamped at 0 (an estimator overshoot past total must not
    * report negative duplication). Exact ≡ approx within the band is
    * spec-pinned; the p144 gate certifies the full estimator replay
    * against DuckDB. */
  def ngramDupProfile(corpus: DataFrame, textCol: String,
      ns: Seq[Int] = Seq(1, 2, 4, 8), approx: Boolean = false,
      b: Int = 12): DataFrame = {
    require(ns.nonEmpty, "ns must not be empty")
    require(ns.forall(_ >= 1), s"gram lengths must be >= 1, got $ns")
    require(ns.distinct.size == ns.size, s"duplicate gram lengths in $ns")
    require(b >= 1 && b <= 16, s"b must be in [1,16], got $b")
    val ws = corpus
      .select(array_remove(words(col(textCol)), "").as("ws"))
      .filter(col("ws").isNotNull)
    val perN = ns.map { n =>
      // the size >= n filter keeps sequence() ascending (sequence(1, 0)
      // is DESCENDING in Spark — the recorded BpeSpec gotcha)
      val grams = ws.filter(size(col("ws")) >= n)
        .select(explode(transform(
          sequence(lit(1), size(col("ws")) - n + 1),
          i => array_join(slice(col("ws"), i, lit(n)), " "))).as("g"))
      val counted =
        if (!approx)
          grams.agg(count(lit(1)).as("total_grams"),
            countDistinct(col("g")).as("distinct_grams"))
        else {
          val m = 1 << b
          val mD = m.toDouble
          // ONE pass over the exploded gram stream: registers AND the
          // occurrence total ride the same aggregation (review r19.5 —
          // a separate count() re-ran the explode, doubling the
          // dominant cost of the 100 TB mode)
          hllEstimate(
            hllRegisters(hllMeltItems(grams, "g", b), b,
              carryTotal = true), b)
            .select(col("__total").as("total_grams"),
              when(col("hll_v0") > 0 && col("hll_raw_est") <= lit(2.5 * mD),
                round(round(log(lit(mD) / col("hll_v0").cast(DoubleType)),
                  9) * mD))
                .otherwise(round(col("hll_raw_est")))
                .cast(LongType).as("distinct_grams"))
        }
      counted
        .select(lit(n).as("n"), col("total_grams"), col("distinct_grams"),
          when(col("total_grams") > 0,
            greatest(lit(0.0),
              (col("total_grams") - col("distinct_grams")).cast(DoubleType)
                / col("total_grams").cast(DoubleType)))
            .as("dup_gram_share"))
    }
    perN.reduce(_.union(_)).orderBy(col("n"))
  }

  private[operators] lazy val sketchQueries: Seq[QueryDef] = Seq(
    // ---- p112: Zipf rank–frequency slope — [[zipfSlope]] over the
    // documents table's top-100 vocabulary head. The oracle replays
    // the unigram counts, the total-ordered top-K, the round-9 ln
    // points and all four decimal regression sums, then spells the
    // identical slope/intercept double arithmetic — bit-exact.
    QueryDef(
      "p112_zipf_slope",
      (s, d) => zipfSlope(T.documents(s, d), "text"),
      Some(s"""
        WITH w AS (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> x <> '')) AS w
          FROM documents),
        c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY w),
        h AS (SELECT w, cnt FROM c ORDER BY cnt DESC, w ASC LIMIT 100),
        r AS (SELECT cnt, CAST(ROW_NUMBER() OVER
                (ORDER BY cnt DESC, w ASC) AS BIGINT) AS rank FROM h),
        t AS (SELECT round(ln(CAST(rank AS DOUBLE)), 9) AS x,
                     round(ln(CAST(cnt AS DOUBLE)), 9) AS y FROM r),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
                ${graft.QueryDef.dsumSql("x")} AS sx,
                ${graft.QueryDef.dsumSql("y")} AS sy,
                ${graft.QueryDef.dsumSql("x * y")} AS sxy,
                ${graft.QueryDef.dsumSql("x * x")} AS sxx
              FROM t),
        s2 AS (SELECT n_ranks, sx, sy,
                 (CAST(n_ranks AS DOUBLE) * sxy - sx * sy) /
                 (CAST(n_ranks AS DOUBLE) * sxx - sx * sx) AS slope
               FROM s)
        SELECT n_ranks, slope,
               (sy - slope * sx) / CAST(n_ranks AS DOUBLE) AS intercept
        FROM s2""")),

    // ---- p78: Count-Min sketch frequency estimates — [[cmsSketch]] /
    // [[cmsEstimate]] at depth 3 × width 64 over the corpus's
    // whitespace tokens, probed with the distinct tokens of the
    // doc_id < 20 sample as candidates, against the EXACT term
    // frequencies. width is sized BELOW the fixture vocabulary so
    // cells genuinely collide: several candidates must overcount
    // (overcount > 0) while none may ever undercount — certifying real
    // sketch semantics (sum-on-collision, min-over-rows) rather than a
    // disguised exact count. The oracle replays the double-hashed
    // cells, the min-over-rows probe and the exact counts verbatim.
    QueryDef(
      "p78_cms_heavy_hitters",
      (s, d) => {
        val docs = T.documents(s, d)
        val sketch = cmsSketch(docs, "text", depth = 3, width = 64)
        val cand = docs
          .filter(col("doc_id") < 20 && col("text").isNotNull)
          .select(explode(array_remove(words(col("text")), "")).as("word"))
          .distinct()
        val exact = docs.filter(col("text").isNotNull)
          .select(explode(array_remove(words(col("text")), "")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("exact_tf"))
        cmsEstimate(cand, "word", sketch, depth = 3, width = 64)
          .join(exact, Seq("word"), "left")
          .select(col("word"), col("cms_est"),
            coalesce(col("exact_tf"), lit(0L)).as("exact_tf"),
            (col("cms_est") - coalesce(col("exact_tf"), lit(0L)))
              .as("overcount"))
          .orderBy(col("word"))
      },
      Some("""
        WITH occ AS (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS w
          FROM documents WHERE text IS NOT NULL),
        hh AS (
          SELECT w, CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) AS h1,
                 2 * CAST('0x' || substr(md5(w), 13, 12) AS BIGINT) + 1 AS h2
          FROM occ),
        cells AS (
          SELECT j, (h1 + j * h2) % 64 AS pos, COUNT(*) AS c
          FROM hh, unnest(range(0, 3)) t(j) GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT unnest(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS w
          FROM documents WHERE text IS NOT NULL AND doc_id < 20),
        ch AS (
          SELECT w, CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) AS h1,
                 2 * CAST('0x' || substr(md5(w), 13, 12) AS BIGINT) + 1 AS h2
          FROM cand),
        probe AS (
          SELECT w, j, (h1 + j * h2) % 64 AS pos
          FROM ch, unnest(range(0, 3)) t(j)),
        est AS (
          SELECT probe.w, MIN(COALESCE(cells.c, 0)) AS cms_est
          FROM probe LEFT JOIN cells USING (j, pos) GROUP BY probe.w),
        ex AS (SELECT w, COUNT(*) AS exact_tf FROM occ GROUP BY w)
        SELECT est.w AS word, CAST(est.cms_est AS BIGINT) AS cms_est,
               CAST(COALESCE(ex.exact_tf, 0) AS BIGINT) AS exact_tf,
               CAST(est.cms_est - COALESCE(ex.exact_tf, 0) AS BIGINT)
                 AS overcount
        FROM est LEFT JOIN ex ON ex.w = est.w ORDER BY word""")),

    // ---- p80: corpus data card — [[dataCard]] over (lang, source)
    // strata: totals, per-stratum doc/token/char masses, the
    // fixed-boundary token-length histogram, and the quality counters
    // (NULL / blank / exact-duplicate docs). The oracle replays every
    // section with integer aggregates; quality rows carry NULL
    // token/char masses in both engines.
    QueryDef(
      "p80_data_card",
      (s, d) =>
        dataCard(T.documents(s, d), "doc_id", "text",
          strataCols = Seq("lang", "source"))
          .orderBy(col("section"), col("key")),
      Some("""
        WITH b AS (
          SELECT doc_id, text, lang, source,
                 CASE WHEN text IS NULL THEN 0
                      ELSE len(list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '')) END AS tok,
                 CASE WHEN text IS NULL THEN 0 ELSE len(text) END AS ch
          FROM documents),
        tot AS (
          SELECT 'corpus' AS section, 'all' AS key,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(ch) AS BIGINT) AS n_chars
          FROM b),
        bl AS (
          SELECT 'by_lang' AS section, COALESCE(lang, 'NULL') AS key,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(ch) AS BIGINT) AS n_chars
          FROM b GROUP BY lang),
        bs AS (
          SELECT 'by_source' AS section, COALESCE(source, 'NULL') AS key,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(ch) AS BIGINT) AS n_chars
          FROM b GROUP BY source),
        hist AS (
          SELECT 'tokens_bucket' AS section,
                 CASE WHEN tok = 0 THEN '0'
                      WHEN tok <= 32 THEN '1-32'
                      WHEN tok <= 64 THEN '33-64'
                      WHEN tok <= 128 THEN '65-128'
                      WHEN tok <= 256 THEN '129-256'
                      WHEN tok <= 512 THEN '257-512'
                      WHEN tok <= 1024 THEN '513-1024'
                      ELSE '1025+' END AS key,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(ch) AS BIGINT) AS n_chars
          FROM b GROUP BY 2),
        q AS (
          SELECT 'quality' AS section, 'null_text' AS key,
                 CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_docs,
                 CAST(NULL AS BIGINT) AS n_tokens,
                 CAST(NULL AS BIGINT) AS n_chars
          FROM b
          UNION ALL
          SELECT 'quality', 'blank_text',
                 CAST(SUM(CASE WHEN text IS NOT NULL AND trim(text) = ''
                   THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
          FROM b
          UNION ALL
          SELECT 'quality', 'exact_dup_docs',
                 (SELECT CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                    AS BIGINT)
                  FROM (SELECT ROW_NUMBER() OVER (
                          PARTITION BY COALESCE(md5(text),
                            'n:' || CAST(doc_id AS VARCHAR))
                          ORDER BY doc_id) AS rn
                        FROM b)),
                 CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
        SELECT * FROM tot
        UNION ALL SELECT * FROM bl
        UNION ALL SELECT * FROM bs
        UNION ALL SELECT * FROM hist
        UNION ALL SELECT * FROM q
        ORDER BY section, key""")),

    // ---- p86: HyperLogLog distinct-token sketch — [[hllSketch]] +
    // [[hllEstimate]] at b = 6 (64 registers), emitted beside the
    // exact countDistinct for context. The oracle replays the whole
    // structure bit-for-bit: the md5-derived 48-bit hash, the
    // binary-string rank (bin is minimal-length in both engines — no
    // floating point anywhere in the registers), and the raw estimate,
    // whose harmonic sum is EXACT in doubles (each term is 1/2^M via
    // an integer shift; every partial sum fits 49 mantissa bits), so
    // even the estimator needs no quantization. The sf0.01 corpus has
    // a 31-word vocabulary — deliberately the paper's SMALL-RANGE
    // regime (n < 2.5m), where the raw estimator overshoots (63.5
    // here) and §4 prescribes linear counting on the zero-register
    // count: m·ln(m/V) = 64·ln(64/39) ≈ 31.7, within 2.3% of the
    // exact 31. The gate certifies the registers and raw estimate
    // bit-for-bit; v0 is emitted precisely so callers can apply that
    // correction (its ln stays out of the gate by design).
    QueryDef(
      "p86_hll_distinct",
      (s, d) => {
        val docs = T.documents(s, d)
        val sk = hllEstimate(hllSketch(docs, "text", b = 6), b = 6)
        val exact = docs.filter(col("text").isNotNull)
          .select(explode(array_remove(words(col("text")), "")).as("w"))
          .agg(countDistinct(col("w")).as("exact_distinct"))
        sk.crossJoin(broadcast(exact))
          .select(lit(64L).as("m"), col("hll_v0"),
            graft.QueryDef.canonArray(col("__hll")).as("registers"),
            col("hll_hsum"), col("hll_raw_est"), col("exact_distinct"))
      },
      Some("""
        WITH occ AS (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS w
          FROM documents WHERE text IS NOT NULL),
        hr AS (
          SELECT CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) AS h
          FROM occ),
        rk AS (
          SELECT h & 63 AS b,
                 CASE WHEN (h >> 6) = 0 THEN 43
                      ELSE 43 - length(bin(h >> 6)) END AS r
          FROM hr),
        regs AS (
          SELECT CAST(t.i AS INTEGER) AS b,
                 CAST(COALESCE(MAX(rk.r), 0) AS BIGINT) AS r
          FROM range(0, 64) t(i) LEFT JOIN rk ON rk.b = t.i
          GROUP BY 1),
        est AS (
          SELECT CAST(COUNT(*) FILTER (WHERE r = 0) AS BIGINT) AS v0,
                 SUM(CAST(1.0 AS DOUBLE) /
                   CAST(CAST(1 AS BIGINT) << CAST(r AS INTEGER)
                     AS DOUBLE)) AS hsum,
                 string_agg(CAST(r AS VARCHAR), ',' ORDER BY b) AS regstr
          FROM regs),
        ex AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS exact_distinct
               FROM occ)
        SELECT CAST(64 AS BIGINT) AS m, v0 AS hll_v0,
               '[' || regstr || ']' AS registers,
               CAST(hsum AS DOUBLE) AS hll_hsum,
               ((CAST(0.7213 AS DOUBLE)
                  / (CAST(1.0 AS DOUBLE)
                     + CAST(1.079 AS DOUBLE) / CAST(64.0 AS DOUBLE)))
                 * CAST(64.0 AS DOUBLE)) * CAST(64.0 AS DOUBLE)
                 / CAST(hsum AS DOUBLE) AS hll_raw_est,
               exact_distinct
        FROM est CROSS JOIN ex""")),

    // ---- p92: vocabulary growth curve — [[vocabGrowth]] over ten
    // equal-width id slices. All integer arithmetic (min-first-seen
    // partial agg, exact integer slice formula, window cumsum over 10
    // rows); the DuckDB window SUM needs its HUGEINT cast back.
    QueryDef(
      "p92_vocab_growth",
      (s, d) => vocabGrowth(T.documents(s, d), "doc_id", "text",
        buckets = 10),
      Some("""
        WITH b AS (
          SELECT CAST(MIN(doc_id) AS BIGINT) AS lo,
                 CAST(MAX(doc_id) AS BIGINT) + 1 AS hi
          FROM documents),
        d AS (
          SELECT doc_id,
                 COALESCE(len(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')), 0) AS tok
          FROM documents),
        db AS (
          SELECT CAST(LEAST(((d.doc_id - b.lo) * 10)
                   // GREATEST(b.hi - b.lo, 1), 9) AS INTEGER) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS n_tokens
          FROM d, b GROUP BY 1),
        fs AS (
          SELECT w, MIN(doc_id) AS fst
          FROM (SELECT doc_id,
                  unnest(list_filter(string_split_regex(text, '\s+'),
                    x -> x <> '')) AS w
                FROM documents WHERE text IS NOT NULL)
          GROUP BY w),
        vb AS (
          SELECT CAST(LEAST(((fs.fst - b.lo) * 10)
                   // GREATEST(b.hi - b.lo, 1), 9) AS INTEGER) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS vocab_new
          FROM fs, b GROUP BY 1)
        SELECT db.bucket,
               b.lo + ((b.hi - b.lo) * db.bucket) // 10 AS id_lo,
               b.lo + ((b.hi - b.lo) * (db.bucket + 1)) // 10 - 1 AS id_hi,
               db.n_docs, db.n_tokens,
               COALESCE(vb.vocab_new, 0) AS vocab_new,
               CAST(SUM(COALESCE(vb.vocab_new, 0)) OVER (
                 ORDER BY db.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS vocab_cum
        FROM db LEFT JOIN vb USING (bucket) CROSS JOIN b
        ORDER BY db.bucket""")),

    // ---- p93: corpus drift report — [[corpusDrift]] between the
    // even- and odd-id halves of the corpus: top-20 |p−q| contributors
    // + the total-variation distance (the transcendental-free
    // divergence — exact integer ratios, one IEEE subtraction, the
    // union-vocab sum through dsum), all replayed bit-for-bit.
    QueryDef(
      "p93_corpus_drift",
      (s, d) => {
        val all = T.documents(s, d)
        corpusDrift(all.filter(col("doc_id") % 2 === 0),
          all.filter(col("doc_id") % 2 =!= 0), "text", k = 20)
      },
      Some(s"""
        WITH occ AS (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> x <> '')) AS w,
                 CAST(doc_id % 2 AS INTEGER) AS s
          FROM documents WHERE text IS NOT NULL),
        counts AS (
          SELECT w, CAST(COUNT(*) FILTER (WHERE s = 0) AS BIGINT) AS c_a,
                 CAST(COUNT(*) FILTER (WHERE s <> 0) AS BIGINT) AS c_b
          FROM occ GROUP BY w),
        tot AS (SELECT CAST(SUM(c_a) AS BIGINT) AS na,
                       CAST(SUM(c_b) AS BIGINT) AS nb FROM counts),
        sc AS (
          SELECT w, c_a, c_b,
                 CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE) AS p_a,
                 CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE) AS p_b,
                 abs(CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE)
                     - CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE))
                   AS abs_diff
          FROM counts, tot),
        tv AS (SELECT CAST(0.5 AS DOUBLE) *
                 ${graft.QueryDef.dsumSql("abs_diff")} AS tvd FROM sc),
        top AS (SELECT * FROM sc
                ORDER BY abs_diff DESC, w ASC LIMIT 20)
        SELECT top.w AS word, top.c_a, top.c_b, top.p_a, top.p_b,
               top.abs_diff, tv.tvd
        FROM top, tv ORDER BY top.abs_diff DESC, word ASC""")),

    // ---- p139: n-gram duplication profile — [[ngramDupProfile]] at
    // the default n ∈ {1, 2, 4, 8} sweep. The oracle replays each
    // length's gram formation (1-based inclusive list slices joined
    // with ' '), the exact count / count-distinct pair and the double
    // division verbatim, one UNION ALL block per n.
    QueryDef(
      "p139_ngram_dup_profile",
      (s, d) =>
        ngramDupProfile(T.documents(s, d), "text"),
      Some {
        val blocks = Seq(1, 2, 4, 8).map { n =>
          s"""
          SELECT CAST($n AS INTEGER) AS n,
                 CAST(COUNT(*) AS BIGINT) AS total_grams,
                 CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_grams,
                 CAST(COUNT(*) - COUNT(DISTINCT g) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS dup_gram_share
          FROM (SELECT array_to_string(ws[i:i+${n - 1}], ' ') AS g
                FROM w, unnest(range(1, len(ws) - $n + 2)) t(i)
                WHERE len(ws) >= $n)"""
        }
        s"""
        WITH w AS (
          SELECT list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL)
        ${blocks.mkString(" UNION ALL ")}
        ORDER BY n"""
      }),

    // ---- p144: n-gram duplication profile, HLL mode —
    // [[ngramDupProfile]] with approx = true at the default b = 12
    // (4096 registers, ±1.6 %): the 100 TB form, where NOTHING
    // gram-keyed ever shuffles (register cells only). The oracle
    // replays the whole estimator per n: the md5 48-bit hash, the
    // bin-length ranks, the 4096 dense registers, the exact harmonic
    // sum, the raw estimate, the Flajolet §4 linear-counting branch
    // (round-9 ln — the p112 stance), the rounding to a long and the
    // clamped share — so the gate certifies the ESTIMATOR bit-for-bit
    // on both engines; exact-vs-approx accuracy is spec-pinned in
    // TextApiSpec. At sf0.01 the n = 1 arm sits deep in the
    // linear-counting range and n = 8 in the raw range, so both
    // branches execute.
    QueryDef(
      "p144_ngram_profile_hll",
      (s, d) =>
        ngramDupProfile(T.documents(s, d), "text", approx = true),
      Some {
        val alpha = "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) " +
          "+ CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))"
        val raw = s"(($alpha * CAST(4096.0 AS DOUBLE)) " +
          "* CAST(4096.0 AS DOUBLE) / hsum)"
        val ctes = Seq(1, 2, 4, 8).map { n =>
          s"""
          g$n AS (SELECT array_to_string(ws[i:i+${n - 1}], ' ') AS g
                  FROM w, unnest(range(1, len(ws) - $n + 2)) t(i)
                  WHERE len(ws) >= $n),
          t$n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM g$n),
          k$n AS (SELECT h & 4095 AS b,
                         CASE WHEN (h >> 12) = 0 THEN 37
                              ELSE 37 - length(bin(h >> 12)) END AS r
                  FROM (SELECT CAST('0x' || substr(md5(g), 1, 12)
                                 AS BIGINT) AS h FROM g$n)),
          q$n AS (SELECT CAST(t.i AS INTEGER) AS b,
                         CAST(COALESCE(MAX(k$n.r), 0) AS BIGINT) AS r
                  FROM range(0, 4096) t(i) LEFT JOIN k$n ON k$n.b = t.i
                  GROUP BY 1),
          v$n AS (SELECT CAST(COUNT(*) FILTER (WHERE r = 0) AS BIGINT)
                           AS v0,
                         SUM(CAST(1.0 AS DOUBLE) /
                             CAST(CAST(1 AS BIGINT) << CAST(r AS INTEGER)
                               AS DOUBLE)) AS hsum
                  FROM q$n),
          e$n AS (SELECT CASE
                    WHEN v0 > 0 AND $raw <= CAST(10240.0 AS DOUBLE)
                    THEN CAST(round(round(ln(CAST(4096.0 AS DOUBLE)
                           / CAST(v0 AS DOUBLE)), 9)
                           * CAST(4096.0 AS DOUBLE)) AS BIGINT)
                    ELSE CAST(round($raw) AS BIGINT) END AS est
                  FROM v$n)"""
        }
        val selects = Seq(1, 2, 4, 8).map { n =>
          s"""
          SELECT CAST($n AS INTEGER) AS n, t$n.total AS total_grams,
                 e$n.est AS distinct_grams,
                 CASE WHEN t$n.total > 0 THEN greatest(
                   CAST(0.0 AS DOUBLE),
                   CAST(t$n.total - e$n.est AS DOUBLE)
                     / CAST(t$n.total AS DOUBLE)) END AS dup_gram_share
          FROM t$n CROSS JOIN e$n"""
        }
        s"""
        WITH w AS (
          SELECT list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        ${ctes.mkString(",")}
        ${selects.mkString(" UNION ALL ")}
        ORDER BY n"""
      })
  )
}
