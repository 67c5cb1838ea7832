package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Document quality: language-ID, heuristic and trained quality
  * scoring, Gopher / C4 rule packs, repetition signals, and CCNet
  * perplexity filtering.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait QualityOps { self: Pipeline.type =>

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
    * per-row array folds over a SORTED copy of the doc's lines —
    * a line occurs once iff it differs from both sorted neighbors —
    * so the per-doc cost is O(L log L), not the nested-scan O(L²)
    * that melted on book-length documents (ADVICE r14). No shuffle.
    * Output: every caller column + (n_lines, dup_line_frac,
    * dup_line_char_frac); a doc with no non-blank lines scores 0s. */
  def gopherLineSignals(corpus: DataFrame, textCol: String,
      sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = filter(transform(split(col(textCol), sepRe), l => trim(l)),
      l => l =!= "")
    val srt = col("__srt")
    val sz = size(srt)
    val cur = (i: Column) => element_at(srt, i)
    // chars inside lines occurring EXACTLY once: sorted-neighbor test
    // (guards keep element_at off indices 0 / sz+1; CaseWhen evaluates
    // branches lazily in both eval and codegen)
    val onceChars = aggregate(sequence(lit(1), sz), lit(0L), (acc, i) =>
      acc + when(
        when(i === 1, lit(true)).otherwise(cur(i - 1) =!= cur(i)) &&
        when(i === sz, lit(true)).otherwise(cur(i + 1) =!= cur(i)),
        length(cur(i)).cast(LongType)).otherwise(lit(0L)))
    val totalChars = aggregate(srt, lit(0L), (acc, l) =>
      acc + length(l).cast(LongType))
    corpus
      .withColumn("__srt", sort_array(lines))
      .withColumn("n_lines",
        coalesce(size(col("__srt")), lit(0)).cast(LongType))
      .withColumn("dup_line_frac",
        when(col("n_lines") === 0, lit(0.0)).otherwise(
          (col("n_lines") - size(array_distinct(col("__srt"))))
            .cast(DoubleType) / col("n_lines")))
      .withColumn("dup_line_char_frac",
        when(col("n_lines") === 0, lit(0.0)).otherwise(
          (totalChars - onceChars).cast(DoubleType) /
            greatest(totalChars, lit(1L))))
      .drop("__srt")
  }

  /** C4 document-level badwords filter (Raffel et al. 2020 §2.2: drop
    * any page containing a word from the blocklist — the "List of
    * Dirty, Naughty, Obscene..." step every C4 reproduction runs,
    * complementing [[c4CleanLines]]' LINE-level rules): flags each
    * document whose whitespace tokens (lowercased when
    * `caseInsensitive`) contain ANY blocklist word, whole-word only —
    * "slowly" never matches "slow" because matching is on tokens, not
    * substrings. The blocklist is config-sized (C4's is ~400 words) so
    * it collapses to ONE sorted 48-bit-hash broadcast row; the corpus
    * side is a single map pass (distinct word hashes via
    * [[graft.plans.KgramHashes]] k=1, probed by the
    * [[graft.plans.AnyInSorted]] binary search) — no explode, no join,
    * no shuffle of the corpus; a 48-bit collision can only over-flag.
    * Output: every caller column + `blocked`; NULL text is never
    * blocked. Callers drop with `.filter(!col("blocked"))`. */
  def badwordsFilter(corpus: DataFrame, textCol: String,
      badwords: Seq[String], caseInsensitive: Boolean = true): DataFrame = {
    require(badwords.nonEmpty, "need a non-empty blocklist")
    // matching is per whitespace TOKEN: a multi-word phrase can never
    // match a single token, so it would silently filter nothing —
    // fail fast instead (phrase blocking = an n-gram probe, see
    // [[phraseBlocklistFilter]])
    val phrases = badwords.filter(_.exists(_.isWhitespace))
    require(phrases.isEmpty,
      s"blocklist entries must be single tokens (matching is per word); " +
        s"phrases: ${phrases.take(5).mkString(", ")} — use " +
        "phraseBlocklistFilter for phrase blocking")
    val spark = corpus.sparkSession
    import spark.implicits._
    val norm: Column => Column =
      if (caseInsensitive) lower(_: Column) else identity
    // blocklist → one sorted distinct-hash row, through the SAME word-
    // hash kernel the corpus probe uses (never driver-side md5 — the
    // two arithmetics could drift)
    val bwRow = badwords.toDF("__w")
      .select(call_function("kgram_hashes",
        array(norm(col("__w"))), lit(1), lit(6)).as("__h"))
      .agg(sort_array(array_distinct(flatten(collect_list(col("__h")))))
        .as("__bw"))
    corpus
      .crossJoin(broadcast(bwRow))
      .withColumn("blocked", coalesce(
        call_function("any_in_sorted",
          call_function("kgram_hashes",
            array_remove(words(norm(col(textCol))), ""), lit(1), lit(6)),
          col("__bw")),
        lit(false)))
      .drop("__bw")
  }

  /** Multi-word phrase blocklist filter — the companion
    * [[badwordsFilter]] fails fast toward: flags each document whose
    * whitespace tokens contain ANY blocklist phrase as a CONTIGUOUS
    * whole-word run ("fast table" matches "a fast table row", never
    * "fast red table" and never the substring "breakfast table" of a
    * single token). The mechanism is the decontamination probe
    * generalized to the blocklist's own lengths: phrases group by
    * token count L, each group collapses to one sorted 61-bit
    * rolling-hash row (config-sized — a blocklist is hundreds of
    * entries), and the corpus side is ONE map pass per distinct L
    * (positioned rolling grams via [[graft.plans.KgramRollHashesAll]],
    * [[graft.plans.AnyInSorted]] binary-search probe, ORed across
    * lengths) — no explode, no join, no shuffle of the corpus. Both
    * sides hash through the SAME kernel, never driver-side md5 (the
    * [[badwordsFilter]] stance: two arithmetics could drift). A 61-bit
    * collision can only over-flag. Output: every caller column +
    * `blocked`; NULL text is never blocked. */
  def phraseBlocklistFilter(corpus: DataFrame, textCol: String,
      phrases: Seq[String], caseInsensitive: Boolean = true): DataFrame = {
    require(phrases.nonEmpty, "need a non-empty blocklist")
    val spark = corpus.sparkSession
    import spark.implicits._
    val norm: Column => Column =
      if (caseInsensitive) lower(_: Column) else identity
    // lengths come from the driver-side Seq (it is config-sized by
    // contract); the HASHES come from the kernel
    val lens = phrases
      .map(_.trim.split("\\s+").count(_.nonEmpty)).filter(_ >= 1)
      .distinct.sorted
    require(lens.nonEmpty, "blocklist contains no non-empty phrase")
    val phraseRows = lens.map { l =>
      phrases.toDF("__p")
        .select(array_remove(words(norm(trim(col("__p")))), "").as("__ws"))
        .filter(size(col("__ws")) === l)
        .select(explode(call_function("kgram_roll_hashes_all",
          col("__ws"), lit(l))).as("h"))
        .agg(sort_array(collect_set(col("h"))).as(s"__ph_$l"))
    }
    val withRows = phraseRows.foldLeft(corpus)(
      (df, row) => df.crossJoin(broadcast(row)))
    val flags = lens.map { l =>
      coalesce(call_function("any_in_sorted",
        call_function("kgram_roll_hashes_all",
          array_remove(words(norm(col(textCol))), ""), lit(l)),
        col(s"__ph_$l")), lit(false))
    }
    withRows
      .withColumn("blocked", flags.reduce(_ || _))
      .drop(lens.map(l => s"__ph_$l"): _*)
  }

  /** Canonical URL form for [[dedupByUrl]]: trim, lowercase, strip the
    * `#fragment`, collapse trailing slashes. Deliberately conservative
    * (no query-param reordering, no default-port logic) — the C4
    * URL-dedup step needs a stable key, not full RFC 3986
    * canonicalization; both regexes replay verbatim in the oracle. */
  def urlNormalize(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(trim(url)), "#.*$", ""), "/+$", "")

  /** URL-level exact dedup — C4 §2.2's "deduplicate by URL" step: keep
    * ONE page (the minimum id) per [[urlNormalize]]d URL. The
    * [[exactDedup]] plan shape on the URL key: one shuffle on the
    * normalized-URL hash, nothing pairwise, NULL URLs never collapse
    * with each other. Output: every caller column + `url_norm`. */
  def dedupByUrl(corpus: DataFrame, idCol: String, urlCol: String): DataFrame =
    corpus
      .withColumn("url_norm", urlNormalize(col(urlCol)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(coalesce(col("url_norm"),
            concat(lit("n:"), col(idCol).cast(StringType))))
          .orderBy(col(idCol))))
      .filter(col("__rk") === 1)
      .drop("__rk")

  /** Hashed bag-of-ngrams features as a standalone TABLE — the
    * fastText/DSIR feature map (all word 1..`maxGram`-grams, COUNTED
    * — [[graft.plans.KgramHashesAll]] — and feature-hashed into
    * `buckets`), shared by [[trainQualityClassifier]] /
    * [[classifierScore]] and definition-identical to
    * [[dsirImportanceScores]]' buckets so the two selection signals
    * can never drift. Output: (doc_id, b, cnt, doc_grams), one row
    * per (doc, occupied bucket). Scale shape: ZERO shuffles — the
    * whole feature table is one codegen'd pass per document
    * ([[graft.plans.KgramBucketCounts]] buckets and counts the grams
    * inside the row; the per-doc total folds over the same array), so
    * at 100 TB this is a pure map stage. The explode → (doc, b)
    * partial-agg shuffle → doc-keyed totals join it replaces pushed
    * every gram occurrence through a hash-aggregate probe;
    * row-identical output (pinned in TextHashesSpec). */
  def hashedNgramFeatures(corpus: DataFrame, idCol: String, textCol: String,
      buckets: Int = 8192, maxGram: Int = 2, nBytes: Int = 6): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxGram >= 1, s"maxGram must be >= 1, got $maxGram")
    // ONE explode, nothing else: the kernel's elements carry
    // (b, cnt, doc_grams) complete, and explode of the empty array
    // drops gram-less docs exactly like the old per-gram explode did.
    // (A scalar `aggregate(...)` total beside the explode was measured
    // 5× SLOWER than the old shape: it collapses into the
    // post-Generate projection and re-folds the array per OUTPUT row.)
    fanOutSmallScan(corpus).select(col(idCol).as("doc_id"),
        explode(call_function("kgram_bucket_counts",
          array_remove(words(col(textCol)), ""), lit(maxGram),
          lit(buckets), lit(nBytes))).as("__e"))
      .select(col("doc_id"), col("__e.b").as("b"),
        col("__e.cnt").as("cnt"), col("__e.doc_grams").as("doc_grams"))
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
    * in the oracle. CACHE CONTRACT: the vocabulary-bounded count table
    * is persisted inside the operator (it feeds both the model and the
    * (N, V) stats) and stays cached in the session after the action —
    * long-lived library sessions release it with
    * `spark.catalog.clearCache()` between batches. Output: (idCol,
    * lang, n_tokens, logprob_avg, ppl, bucket). */
  def lmPerplexity(reference: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, langCol: String,
      alpha: Double = 0.4, minCount: Long = 1L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    def toks(c: Column): Column = array_remove(words(c), "")
    val ref = reference
      .select(col(langCol).as("lang"), toks(col(textCol)).as("ws"))
      .filter(size(col("ws")) > 0)
    // orders 1..3 in ONE explode pass (r19: the old per-order unionAll
    // re-tokenized and re-scanned the reference once per order, and the
    // (N, V) stats pass was a fourth scan — 4 reference passes for one
    // model build): each row emits its n=1..3 gram arrays concatenated;
    // tokens cannot contain whitespace, so gram strings of different
    // orders never collide and one (lang, gram) table serves every
    // order, with the order recoverable as the gram's space count
    val gramRows = ref.select(col("lang"), explode(flatten(array(
      (1 to 3).map(n =>
        when(size(col("ws")) >= n,
          transform(sequence(lit(1), size(col("ws")) - (n - 1)),
            i => array_join(slice(col("ws"), i, lit(n)), " ")))
          .otherwise(array().cast(ArrayType(StringType)))): _*))).as("g"))
    // the pre-prune count table feeds both the model and the (N, V)
    // stats — persisted because it is VOCABULARY-bounded (it IS the
    // model CCNet ships), so two consumers must not re-run the
    // token-scale explode+agg; same clearCache contract as p02
    val counts0 = gramRows.groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = counts0.filter(col("cnt") >= minCount)
    // N = total unigram occurrences, V = distinct unigrams — read off
    // the unigram rows (no space) of the count table instead of a
    // separate corpus pass; identical by construction to the old
    // explode+countDistinct over the reference tokens
    val stats = counts0.filter(!col("g").contains(" "))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("ntok"), count(lit(1)).as("vsize"))
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
      iters: Int = 20, lr: Double = 1.0): DataFrame =
    trainLinearClassifier(pos, neg, textCol, buckets, iters, lr,
      (df, id, t) => hashedNgramFeatures(df, id, t, buckets, maxGram))

  /** The shared deterministic logistic-regression loop behind
    * [[trainQualityClassifier]] (word-gram features) and
    * [[trainLangIdClassifier]] (char-gram features): batch gradient
    * descent where each iteration is two bounded Spark passes (one
    * residual agg, one ≤`buckets+1`-row gradient collect) and the
    * weight state lives driver-side — the same scale contract as the
    * public wrapper documents. `featureFn(df, idCol, textCol)` must
    * emit the [[hashedNgramFeatures]] shape (doc_id, b, cnt,
    * doc_grams). */
  private def trainLinearClassifier(pos: DataFrame, neg: DataFrame,
      textCol: String, buckets: Int, iters: Int, lr: Double,
      featureFn: (DataFrame, String, String) => DataFrame): DataFrame = {
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
    val feats = featureFn(docs, "__doc", "__t")
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

  /** Hashed bag-of-CHAR-grams features — the fastText feature map
    * (Joulin et al. 2017, "Bag of Tricks for Efficient Text
    * Classification": character n-grams hashed into a fixed bucket
    * space), emitting the SAME (doc_id, b, cnt, doc_grams) shape as
    * [[hashedNgramFeatures]] so [[classifierScore]] and the shared
    * trainer consume either interchangeably. Grams are the DISTINCT
    * character k-grams for k in kMin..kMax (the codegen'd
    * [[graft.plans.ChargramStrings]] pass — distinct-per-k unions to
    * distinct overall since k-grams of different lengths never
    * collide), hashed by 48-bit md5 prefix
    * (the same oracle-replayable arithmetic every gram gate uses) and
    * bucketed by pmod. Scale shape: ZERO shuffles — the whole feature
    * table is one codegen'd pass per document
    * ([[graft.plans.ChargramBucketCounts]] enumerates, dedups, hashes
    * and buckets the grams inside the row; the per-doc total folds
    * over the same array), so at 100 TB this is a pure map stage. The
    * explode → (doc, b) partial-agg shuffle → doc-keyed totals join
    * it replaces pushed ~3× document-length gram rows through a
    * hash-aggregate probe per document; row-identical output (pinned
    * in TextHashesSpec). */
  def hashedChargramFeatures(corpus: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096, kMin: Int = 1, kMax: Int = 3,
      nBytes: Int = 6): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(kMin >= 1 && kMax >= kMin,
      s"need 1 <= kMin <= kMax, got kMin=$kMin kMax=$kMax")
    // ONE explode, nothing else (see hashedNgramFeatures for why the
    // total rides inside each element rather than a scalar fold)
    fanOutSmallScan(corpus).select(col(idCol).as("doc_id"),
        explode(call_function("chargram_bucket_counts", col(textCol),
          lit(kMin), lit(kMax), lit(buckets), lit(nBytes))).as("__e"))
      .select(col("doc_id"), col("__e.b").as("b"),
        col("__e.cnt").as("cnt"), col("__e.doc_grams").as("doc_grams"))
  }

  /** fastText-style language-ID training (Joulin'17 — the linear
    * classifier over hashed char n-grams CCNet actually ships, vs
    * [[langIdPredict]]'s marker-word heuristic): one-vs-rest logistic
    * regression per language over [[hashedChargramFeatures]], via the
    * same deterministic trainer as [[trainQualityClassifier]].
    * `labeled` is the reference corpus with a ground-truth `langCol`
    * (Wikipedia/Tatoeba in production). The language set is collected
    * once (parameter-bounded — a langid model has tens of classes) and
    * each class trains on the SAME feature table schema, so
    * [[langIdScore]] can score all classes in one pass. Output:
    * (lang, b, w) with the intercept at b = buckets — one weight row
    * group per language, ordered by (lang, b). */
  def trainLangIdClassifier(labeled: DataFrame, textCol: String,
      langCol: String, buckets: Int = 4096, kMin: Int = 1, kMax: Int = 3,
      iters: Int = 20, lr: Double = 1.0): DataFrame = {
    val langs = labeled.select(col(langCol).cast(StringType).as("l"))
      .filter(col("l").isNotNull).distinct()
      .collect().map(_.getString(0)).sorted
    require(langs.length >= 2,
      s"need at least two labeled languages, got ${langs.length}")
    langs.map { l =>
      trainLinearClassifier(
        pos = labeled.filter(col(langCol) === l),
        neg = labeled.filter(col(langCol) =!= l),
        textCol, buckets, iters, lr,
        (df, id, t) => hashedChargramFeatures(df, id, t, buckets, kMin, kMax))
        .select(lit(l).as("lang"), col("b"), col("w"))
    }.reduce(_ unionByName _)
  }

  /** Language-ID scoring + argmax over a [[trainLangIdClassifier]]
    * weight table (or any (lang, b, w) table with intercepts at
    * b = buckets): every document scores against every language in ONE
    * corpus pass — features build once, the dense weight table
    * broadcasts, the per-(doc, lang) dot products partial-aggregate
    * through the decimal accumulator (order-free, engine-exact), and
    * the winner is the highest score with ties to the lexicographically
    * first language. Documents with no features (empty text) score
    * bias-only, never drop. `margin` = winner score − runner-up score
    * (NULL when the table has one language... which the trainer
    * rejects). Scale shape: the feature shuffle carries gram-scale
    * rows × |langs| into one (doc, lang) partial agg; the corpus
    * itself never joins anything non-broadcast. Output: (doc_id,
    * lang_pred, score, margin). */
  def langIdScore(corpus: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int, kMin: Int = 1,
      kMax: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    // the weight table is parameter-bounded (|langs| × (buckets+1) —
    // the langid contract): collect it ONCE and reshape into a single
    // broadcast ROW of per-language dense arrays, so scoring is one
    // element_at lookup per (feature, language) inside a doc-keyed
    // partial agg — no per-(gram, lang) row fan-out, no (doc, lang)
    // shuffle key (the first cut joined features × languages and the
    // L-times-wider shuffle dominated the whole gate)
    val wRows = weights
      .select(col("lang").cast(StringType), col("b").cast(IntegerType),
        col("w").cast(DoubleType))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val langs = wRows.map(_._1).distinct.sorted
    require(langs.nonEmpty, "weights carry no languages")
    val byLang = wRows.groupBy(_._1)
    val dense = langs.map { l =>
      val arr = Array.fill(buckets)(0.0)
      var bias = 0.0
      byLang(l).foreach { case (_, b, v) =>
        // out-of-range rows are ignored like the join formulation
        // silently ignored them (b in [0, buckets) never matches a
        // pmod bucket when negative or past the end)
        if (b >= 0 && b < buckets) arr(b) += v
        else if (b == buckets) bias += v
      }
      (arr.toSeq, bias)
    }
    val wSchema = StructType(langs.zipWithIndex.flatMap { case (_, i) =>
      Seq(StructField(s"__w_$i", ArrayType(DoubleType), nullable = false),
        StructField(s"__b_$i", DoubleType, nullable = false))
    }.toArray)
    val wRow = spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row.fromSeq(dense.flatMap {
          case (arr, bias) => Seq(arr, bias)
        })),
      wSchema)
    val feats = hashedChargramFeatures(
      corpus.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
      "doc_id", "__t", buckets, kMin, kMax)
    val fv = col("cnt").cast(DoubleType) / col("doc_grams")
    val dots = feats.crossJoin(broadcast(wRow))
      .groupBy(col("doc_id"))
      .agg(graft.QueryDef.dsum(
          element_at(col(s"__w_0"), col("b").cast(IntegerType) + 1) * fv)
          .as("__dot_0"),
        langs.indices.drop(1).map(i => graft.QueryDef.dsum(
          element_at(col(s"__w_$i"), col("b").cast(IntegerType) + 1) * fv)
          .as(s"__dot_$i")): _*)
    // featureless docs (empty text) score bias-only — right join keeps
    // every corpus row; then melt the L score columns back to rows for
    // the argmax (n_docs × L rows, trivially small next to the grams)
    val biasSeq = dense.map(_._2)
    val scored = corpus.select(col(idCol).as("doc_id"))
      .join(dots, Seq("doc_id"), "left")
      .select(col("doc_id") +: langs.indices.map(i =>
        (coalesce(col(s"__dot_$i"), lit(0.0)) + lit(biasSeq(i)))
          .as(s"__s_$i")): _*)
    val melted = scored.select(col("doc_id"), explode(array(
      langs.indices.map(i =>
        struct(lit(langs(i)).as("lang"), col(s"__s_$i").as("score"))): _*))
      .as("__ls"))
      .select(col("doc_id"), col("__ls.lang").as("lang"),
        col("__ls.score").as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang").asc)
    melted
      .withColumn("__rk", row_number().over(w))
      .withColumn("margin", col("score") - lead(col("score"), 1).over(w))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"), col("score"),
        col("margin"))
  }

  /** QualityOps QueryDefs — registered through [[Pipeline.queries]];
    * names, plans and oracle SQL unchanged by the r15 module split. */
  /** Flesch reading-ease signal (Flesch 1948; the readability score
    * quality packs ship beside length/punct ratios — extreme scores
    * flag boilerplate, legalese and gibberish):
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * with the standard structural heuristics kept ENGINE-EXACT:
    * sentences = regex runs of [.!?]+ (floored at 1 so unpunctuated
    * text scores as one sentence), syllables = vowel-group runs
    * [aeiouy]+ per lowercased word floored at 1 per word. All three
    * counts are exact integers from one map-side pass (no shuffle at
    * all — plan-pinnable), and the score is a fixed-order IEEE
    * composition of exact ratios, so the oracle replays it
    * bit-for-bit. Docs with no words carry no row (the ratio is
    * undefined, not zero). Output: (doc_id, n_words, n_sentences,
    * n_syllables, flesch). */
  def fleschSignal(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ws = array_remove(words(lower(col(textCol))), "")
    val nWords = size(ws).cast(LongType)
    val nSents = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))),
      lit(1)).cast(LongType)
    val nSyll = aggregate(ws, lit(0L), (acc, w) => acc +
      greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))),
        lit(1)).cast(LongType))
    corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), nWords.as("n_words"),
        nSents.as("n_sentences"), nSyll.as("n_syllables"))
      .filter(col("n_words") >= 1)
      .withColumn("flesch",
        lit(206.835) -
          lit(1.015) * (col("n_words").cast(DoubleType) /
            col("n_sentences").cast(DoubleType)) -
          lit(84.6) * (col("n_syllables").cast(DoubleType) /
            col("n_words").cast(DoubleType)))
  }

  /** Character-entropy quality signal — the Shannon entropy of each
    * document's character distribution, in nats: encoding noise and
    * random bytes read anomalously HIGH, key-mash and repeated-char
    * runs anomalously LOW, making H = −Σ_c p_c·ln(p_c) the standard
    * cheap gibberish detector beside p10's length/punct ratios (every
    * web-scale quality pack ships some form of it). Engine-exactness
    * via the portable-ln recipe (ln is not correctly rounded across
    * libms, so round(ln, 9) on BOTH engines — the DSIR/p49 stance)
    * and the per-doc sum through the decimal accumulator. Shape: one
    * char explode + (doc, char) partial agg (≤ alphabet-size keys per
    * doc combine map-side), then a doc-keyed exchange shared by the
    * total window and the final regroup — two exchanges, both over
    * the alphabet-bounded count table, never the raw char stream.
    * ASCII note: Spark's
    * empty-regex split severs surrogate pairs where DuckDB splits
    * codepoints — identical on ASCII (the gate corpus). Docs with no
    * characters carry no entropy row. Output: (doc_id, n_chars,
    * entropy). */
  def charEntropySignal(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val cc = corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val p = col("c").cast(DoubleType) / col("n").cast(DoubleType)
    cc
      .withColumn("n", sum(col("c")).over(w))
      .withColumn("term", p * round(log(p), 9))
      .groupBy(col("doc_id"), col("n"))
      .agg((-graft.QueryDef.dsum(col("term"))).as("entropy"))
      .select(col("doc_id"), col("n").as("n_chars"), col("entropy"))
  }

  /** Per-source quality-score calibration: `q_norm` is the score's
    * percent-rank WITHIN its source (0 = worst in source, 1 = best) —
    * the standard fix for mixing corpora whose raw quality scores live
    * on incomparable scales (a web crawl's 0.4 and a books corpus's
    * 0.4 mean different things; one global threshold then silently
    * empties the weaker-scaled source). Filter on `q_norm >= 1 - f`
    * to keep the best fraction f OF EACH source. Ordering is made
    * STRICT with the id tie-break, so equal raw scores get distinct,
    * deterministic (and cross-engine identical) ranks — calibration
    * here is a reproducibility contract, not a statistics one.
    * Scale shape: one window per source partition (sources are
    * many-rows-each, so partitions parallelize; no global sort). All
    * caller columns survive. */
  def calibrateScoresBySource(corpus: DataFrame, idCol: String,
      sourceCol: String, scoreCol: String): DataFrame = {
    require(!corpus.columns.contains("q_norm"),
      "corpus already has column q_norm — rename it before calling " +
        "calibrateScoresBySource, which adds it")
    corpus.withColumn("q_norm",
      percent_rank().over(Window.partitionBy(col(sourceCol))
        .orderBy(col(scoreCol).asc, col(idCol).asc)))
  }

  /** Encoding-corruption (mojibake) detection + conservative repair —
    * the ftfy-style cleanup every web-crawl pipeline runs before
    * quality scoring (UTF-8 bytes mis-decoded as Latin-1/Windows-1252
    * litter CommonCrawl with 'Ã©'-for-'é' and 'â€œ'-for-'“'). Three
    * per-document integer signals, each a length-difference count
    * (map-side, zero shuffle, identical arithmetic in DuckDB):
    *
    *   - `n_latin1` — occurrences of 'Ã' or 'Â', the two Latin-1
    *     renderings of UTF-8 lead bytes 0xC3/0xC2 that cover the whole
    *     Latin-1-supplement double-encode family;
    *   - `n_win1252` — occurrences of 'â€', the Latin-1 rendering of
    *     UTF-8 0xE2 0x80 (curly quotes / dashes / ellipsis);
    *   - `n_replacement` — U+FFFD replacement characters, i.e. bytes a
    *     lenient upstream decoder already destroyed.
    *
    * Repair is the byte round-trip `decode(encode(text, ISO-8859-1),
    * UTF-8)` — exactly inverts the Latin-1 mis-decode — applied only
    * when it is provably safe: the Latin-1 signal fired, the
    * Windows-1252 signal did NOT (its '€'/'“' characters are outside
    * Latin-1, so the round-trip would mangle them to '?'), no U+FFFD
    * (information already lost — nothing to invert), and the text's
    * Latin-1 byte image is STRUCTURALLY well-formed UTF-8 per the
    * RFC 3629 table ([[Utf8AsLatin1Re]] — every char ≤ U+00FF and the
    * lead/continuation ranges line up, surrogate and overlong ranges
    * excluded). The structural check must come first: Spark 4's ANSI
    * `decode` THROWS on malformed input rather than inserting U+FFFD,
    * so "try and inspect" is not an option — the guard proves the
    * decode total before it runs. Everything else keeps the original
    * text with the signals attached, for the caller's filter
    * threshold. Output: (doc_id, text, n_chars, n_latin1, n_win1252,
    * n_replacement, mojibake_ratio, fixed, text_fixed) — the original
    * text rides along so a caller can diff or fall back. */
  def mojibakeSignals(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col("__t")
    def occurrences(pat: String): Column =
      ((length(t) - length(replace(t, lit(pat), lit(""))))
        / lit(pat.length)).cast(LongType)
    val candidate = decode(encode(t, "ISO-8859-1"), "UTF-8")
    corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("n_chars", length(t).cast(LongType))
      .withColumn("n_latin1", occurrences("Ã") + occurrences("Â"))
      .withColumn("n_win1252", occurrences("â€"))
      .withColumn("n_replacement", occurrences("�"))
      .withColumn("mojibake_ratio",
        when(col("n_chars") > 0,
          (col("n_latin1") + col("n_win1252") + col("n_replacement"))
            .cast(DoubleType) / col("n_chars"))
          .otherwise(lit(0.0)))
      .withColumn("__cand",
        when(col("n_latin1") > 0 && col("n_win1252") === 0 &&
          col("n_replacement") === 0 && t.rlike(Utf8AsLatin1Re), candidate))
      .withColumn("fixed",
        col("__cand").isNotNull && length(col("__cand")) < length(t))
      .withColumn("text_fixed", when(col("fixed"), col("__cand")).otherwise(t))
      .drop("__cand")
      .withColumnRenamed("__t", "text")
  }

  /** RFC 3629 well-formed-UTF-8, expressed over a string whose chars
    * ARE the bytes (the Latin-1 mis-decode view): ASCII, or a C2–DF
    * lead + one continuation, or the three-byte forms with the E0
    * overlong and ED surrogate ranges carved out, or the four-byte
    * forms clamped to U+10FFFF. A match proves `decode(encode(s,
    * ISO-8859-1), UTF-8)` cannot throw. */
  private val Utf8AsLatin1Re: String =
    "^(?:[\\u0000-\\u007F]" +
      "|[\\u00C2-\\u00DF][\\u0080-\\u00BF]" +
      "|\\u00E0[\\u00A0-\\u00BF][\\u0080-\\u00BF]" +
      "|[\\u00E1-\\u00EC][\\u0080-\\u00BF]{2}" +
      "|\\u00ED[\\u0080-\\u009F][\\u0080-\\u00BF]" +
      "|[\\u00EE-\\u00EF][\\u0080-\\u00BF]{2}" +
      "|\\u00F0[\\u0090-\\u00BF][\\u0080-\\u00BF]{2}" +
      "|[\\u00F1-\\u00F3][\\u0080-\\u00BF]{3}" +
      "|\\u00F4[\\u0080-\\u008F][\\u0080-\\u00BF]{2})*$"

  /** Script-mix signals — per-document codepoint-class counts (ASCII
    * letters, digits, CJK, Cyrillic, Arabic, whitespace), the cheap
    * script-distribution profile multilingual curation routes on
    * BEFORE a model-based language ID runs (a "Latin" doc whose chars
    * are 40% CJK is mislabeled or mixed; a digits-dominated doc is a
    * table dump). Classes are EXPLICIT BMP codepoint ranges — not
    * `\\p{Script=…}` classes, whose definitions differ between regex
    * engines — so counts are exact integers both engines agree on
    * (count = length after deleting the class complement; every
    * counted char is BMP, so UTF-16 length ≡ codepoint count). One
    * map-side pass, zero shuffle; NULL text → zero counts. */
  def scriptMixSignals(corpus: DataFrame, textCol: String): DataFrame = {
    def classCount(pattern: String): Column =
      coalesce(length(regexp_replace(col(textCol), s"[^$pattern]", "")),
        lit(0)).cast(LongType)
    corpus
      .withColumn("n_ascii_letter", classCount("A-Za-z"))
      .withColumn("n_digit", classCount("0-9"))
      .withColumn("n_cjk", classCount("\\x{4E00}-\\x{9FFF}"))
      .withColumn("n_cyrillic", classCount("\\x{0400}-\\x{04FF}"))
      .withColumn("n_arabic", classCount("\\x{0600}-\\x{06FF}"))
      .withColumn("n_ws", classCount(" \\t\\n\\r"))
  }

  private[operators] lazy val qualityQueries: Seq[QueryDef] = Seq(
    // ---- p143: script-mix signals — [[scriptMixSignals]] with
    // non-Latin markers injected in-query (the p108 stance: the fixture
    // corpus is Latin-only, so every third doc gains a CJK tail and
    // every third+1 a Cyrillic one — both classification arms execute
    // for real). The oracle replays each class's delete-the-complement
    // count with RE2's global regexp_replace.
    QueryDef(
      "p143_script_mix",
      (s, d) => {
        val marked = T.documents(s, d)
          .select(col("doc_id"), concat(coalesce(col("text"), lit("")),
            when(col("doc_id") % 3 === 0, lit(" 你好世界"))
              .when(col("doc_id") % 3 === 1, lit(" привет"))
              .otherwise(lit(""))).as("text"))
        scriptMixSignals(marked, "text")
          .select(col("doc_id"), col("n_ascii_letter"), col("n_digit"),
            col("n_cjk"), col("n_cyrillic"), col("n_arabic"), col("n_ws"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH m AS (
          SELECT doc_id,
                 COALESCE(text, '') ||
                 CASE WHEN doc_id % 3 = 0 THEN ' 你好世界'
                      WHEN doc_id % 3 = 1 THEN ' привет'
                      ELSE '' END AS text
          FROM documents)
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_ascii_letter,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
               CAST(length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
               CAST(length(regexp_replace(text, '[^\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
               CAST(length(regexp_replace(text, '[^\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
               CAST(length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS BIGINT) AS n_ws
        FROM m ORDER BY doc_id""")),
    // ---- p125: per-source score calibration — percent-rank of a raw
    // score within each source. The gate calibrates n_chars (a real
    // fixture signal) so the oracle is the bare window definition:
    // both engines compute (rank-1)/(n-1) as a double division of
    // exact integers, bit-identical.
    QueryDef(
      "p125_calibrate_by_source",
      (s, d) => calibrateScoresBySource(
        T.documents(s, d).select(col("doc_id"), col("source"),
          col("n_chars")),
        "doc_id", "source", "n_chars")
        .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id, source, n_chars,
               PERCENT_RANK() OVER (PARTITION BY source
                 ORDER BY n_chars ASC, doc_id ASC) AS q_norm
        FROM documents ORDER BY doc_id""")),
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

    // ---- p72: fastText-style language-ID scoring + argmax —
    // [[langIdScore]] over [[hashedChargramFeatures]] (256 buckets,
    // char 1..3-grams) with one deterministic dyadic-rational weight
    // row group PER LANGUAGE (langs derived from the corpus itself,
    // w = ((b·(li+2)) mod 9 − 4)/8, bias (li+1)/8): the gate certifies
    // the whole serving path bit-for-bit — char-gram hashing,
    // per-(doc, lang) decimal-accumulated dot products, bias-only
    // fallback for featureless docs, argmax with the lang tiebreak,
    // and the runner-up margin. Training (one-vs-rest over the same
    // features via the shared trainer) is iterative and spec-gated in
    // TextApiSpec — the p62/bpeTrain stance.
    QueryDef(
      "p72_langid_score",
      (s, d) => {
        import s.implicits._
        val langs = T.documents(s, d)
          .select(col("lang")).distinct()
          .collect().map(_.getString(0)).sorted
        val weights = langs.zipWithIndex.flatMap { case (l, li) =>
          (0 to 256).map(b => (l, b,
            if (b == 256) (li + 1).toDouble / 8
            else ((b * (li + 2)) % 9 - 4).toDouble / 8))
        }.toSeq.toDF("lang", "b", "w")
        langIdScore(T.documents(s, d), "doc_id", "text", weights,
          buckets = 256, kMin = 1, kMax = 3)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH lx AS (
          SELECT lang, CAST(ROW_NUMBER() OVER (ORDER BY lang) - 1 AS INT) AS li
          FROM (SELECT DISTINCT lang FROM documents)),
        g AS MATERIALIZED (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), CAST(k AS INT)) AS gr
          FROM documents, unnest([1, 2, 3]) kt(k),
               unnest(range(1, len(text) - k + 2)) t(i)),
        f AS MATERIALIZED (
          SELECT doc_id,
                 CAST('0x' || substr(md5(gr), 1, 12) AS BIGINT) % 256 AS b,
                 COUNT(*) AS cnt
          FROM g GROUP BY doc_id, b),
        tt AS (SELECT doc_id, SUM(cnt) AS doc_grams FROM f GROUP BY doc_id),
        sc AS (
          SELECT f.doc_id, lx.lang, lx.li,
                 ${graft.QueryDef.dsumSql(
                   "(((b * (li + 2)) % 9) - 4) / 8.0 * (CAST(cnt AS DOUBLE) / doc_grams)")}
                   AS dot
          FROM f JOIN tt ON tt.doc_id = f.doc_id CROSS JOIN lx
          GROUP BY f.doc_id, lx.lang, lx.li),
        al AS (
          SELECT d.doc_id, lx.lang,
                 COALESCE(sc.dot, 0) + (lx.li + 1) / 8.0 AS score
          FROM documents d CROSS JOIN lx
          LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.lang = lx.lang),
        rk AS (
          SELECT doc_id, lang, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, lang ASC) AS rk,
                 score - LEAD(score, 1) OVER (PARTITION BY doc_id
                   ORDER BY score DESC, lang ASC) AS margin
          FROM al)
        SELECT doc_id, lang AS lang_pred, score, margin
        FROM rk WHERE rk = 1 ORDER BY doc_id""")),

    // ---- p73: C4 document-level blocklist + URL dedup —
    // [[badwordsFilter]] (whole-word, case-insensitive, broadcast
    // sorted-hash probe) composed with [[dedupByUrl]]
    // ([[urlNormalize]] → keep min doc_id per canonical URL). The URL
    // is synthesized deterministically from (source, doc_id) with
    // case, trailing-slash and fragment noise so the normalization
    // does real work; the oracle replays the 48-bit word-hash
    // membership and both regexes verbatim.
    QueryDef(
      "p73_c4_blocklist",
      (s, d) => {
        val docs = T.documents(s, d).withColumn("url",
          concat(lit("HTTPS://"), col("source"),
            lit(".Example.com/page"), pmod(col("doc_id"), lit(50)),
            when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
            when(col("doc_id") % 4 === 0, lit("#ref")).otherwise(lit(""))))
        dedupByUrl(
          badwordsFilter(docs, "text", Seq("slow", "dup", "stale")),
          "doc_id", "url")
          .select(col("doc_id"), col("lang"), col("url_norm"),
            col("blocked"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""
        WITH d AS (
          SELECT doc_id, lang, text,
                 concat('HTTPS://', source, '.Example.com/page',
                   CAST(doc_id % 50 AS VARCHAR),
                   CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
                   CASE WHEN doc_id % 4 = 0 THEN '#ref' ELSE '' END) AS url
          FROM documents),
        bw AS (
          SELECT DISTINCT CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) AS h
          FROM unnest(['slow', 'dup', 'stale']) t(w)),
        blk AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                      x -> x <> '')) AS w
            FROM d) z
          JOIN bw ON bw.h = CAST('0x' || substr(md5(z.w), 1, 12) AS BIGINT)),
        n AS (
          SELECT doc_id, lang,
                 regexp_replace(regexp_replace(lower(trim(url)), '#.*$$', ''),
                                '/+$$', '') AS url_norm
          FROM d),
        k AS (
          SELECT doc_id, lang, url_norm,
                 ROW_NUMBER() OVER (PARTITION BY url_norm
                   ORDER BY doc_id) AS rk
          FROM n)
        SELECT doc_id, lang, url_norm,
               (doc_id IN (SELECT doc_id FROM blk)) AS blocked
        FROM k WHERE rk = 1 ORDER BY doc_id""")),

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
        FROM sc ORDER BY doc_id"""))
    ,


    // ---- p90: multi-word phrase blocklist — [[phraseBlocklistFilter]]
    // with a mixed-length fixture list (1-, 3- and 4-token entries) so
    // the gate certifies the per-length probe rows AND the OR across
    // them. The oracle replays the positioned rolling-gram arithmetic
    // (per-word md5 prefixes × spliced B-power literals, summed mod
    // 2⁶¹−1 in HUGEINT — the p47/p56 machinery) for the corpus at
    // every blocklist length and for the phrases themselves.
    QueryDef(
      "p90_phrase_blocklist",
      (s, d) => phraseBlocklistFilter(T.documents(s, d), "text",
        Seq("a row fast merge", "customer query line",
          "slow filter value", "vector"))
        .select(col("doc_id"), col("lang"), col("blocked"))
        .orderBy(col("doc_id")),
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 3)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS ws
          FROM documents),
        w AS (SELECT doc_id, ws, len(ws) AS n FROM d
              WHERE ws IS NOT NULL AND len(ws) >= 1),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT)
                   AS HUGEINT) AS h
          FROM w, unnest(range(1, n + 1)) t(i)),
        pw(e, bp) AS (VALUES $pows),
        pl(p) AS (VALUES ('a row fast merge'), ('customer query line'),
                         ('slow filter value'), ('vector')),
        pt AS (SELECT list_filter(string_split_regex(lower(trim(p)), '\s+'),
                                  x -> x <> '') AS pws FROM pl),
        ph AS (
          SELECT CAST(len(pws) AS INT) AS l,
                 CAST(SUM((CAST(CAST('0x' || substr(md5(pws[i]), 1, 12)
                              AS BIGINT) AS HUGEINT) * pw.bp) % $P) % $P
                   AS BIGINT) AS h
          FROM pt, unnest(range(1, len(pws) + 1)) t(i)
          JOIN pw ON pw.e = len(pws) - CAST(i AS INT)
          GROUP BY pws),
        lens AS (SELECT DISTINCT l FROM ph),
        g AS MATERIALIZED (
          SELECT DISTINCT w0.doc_id, lens.l,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN lens ON w0.i <= w0.n - (lens.l - 1)
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + lens.l - 1
          JOIN pw ON pw.e = lens.l - 1 - (w2.i - w0.i)
          GROUP BY w0.doc_id, lens.l, w0.i),
        hit AS (SELECT DISTINCT g.doc_id FROM g JOIN ph USING (l, h))
        SELECT d.doc_id, d.lang,
               (d.doc_id IN (SELECT doc_id FROM hit)) AS blocked
        FROM d ORDER BY d.doc_id"""
      }),


    // ---- p96: character-entropy quality signal —
    // [[charEntropySignal]] over every document: Shannon entropy of
    // the char distribution in nats, the standard gibberish detector.
    // The oracle replays the exact p = c/n ratios, the 1e-9-quantized
    // ln (the portable recipe — both ROUNDs agree at every magnitude)
    // and the decimal per-doc sum.
    QueryDef(
      "p96_char_entropy",
      (s, d) => charEntropySignal(T.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""
        WITH ch AS (
          SELECT doc_id, unnest(string_split(text, '')) AS ch
          FROM documents WHERE text IS NOT NULL),
        cc AS (
          SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
          FROM ch GROUP BY doc_id, ch),
        nn AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
          FROM cc GROUP BY doc_id),
        t AS (
          SELECT cc.doc_id, nn.n,
                 (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                   * round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 9)
                   AS term
          FROM cc JOIN nn USING (doc_id))
        SELECT doc_id, n AS n_chars,
               -(${graft.QueryDef.dsumSql("term")}) AS entropy
        FROM t GROUP BY doc_id, n ORDER BY doc_id""")),


    // ---- p98: Flesch reading ease — [[fleschSignal]] over every
    // document: exact integer word/sentence/syllable counts (vowel-
    // group heuristic, both floors) and the fixed-order score
    // composition, all replayed bit-for-bit.
    QueryDef(
      "p98_flesch",
      (s, d) => fleschSignal(T.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""
        WITH base AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                   x -> x <> '') AS ws,
                 GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences
          FROM documents WHERE text IS NOT NULL),
        counts AS (
          SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
                 CAST(n_sentences AS BIGINT) AS n_sentences,
                 CAST(list_sum(list_transform(ws, w ->
                   GREATEST(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
                   AS BIGINT) AS n_syllables
          FROM base WHERE len(ws) >= 1)
        SELECT doc_id, n_words, n_sentences, n_syllables,
               CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - CAST(84.6 AS DOUBLE)
                 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                 AS flesch
        FROM counts ORDER BY doc_id""")),

    // ---- p133: mojibake detection + repair — [[mojibakeSignals]] over
    // a corpus with SYNTHESIZED encoding damage (the p113 twin trick:
    // the clean ASCII fixture can't exercise the detector, so the gate
    // plants the damage deterministically and the oracle plants the
    // identical damage). Docs ≡0 mod 5 get the Latin-1 double-encode
    // ('a' → 'Ã¡', the mis-decoded UTF-8 of 'á'); docs ≡0 mod 7 get
    // U+FFFD scars ('e' → chr(65533)). The oracle recomputes the
    // length-difference counts and — where the operator's guards admit
    // repair — the byte round-trip's closed form on this fixture
    // (every 'Ã' here is 'Ã¡', whose round-trip is exactly 'á'), so a
    // repair that fires on the wrong rows, skips the FFFD guard, or
    // mangles a byte hash-mismatches.
    QueryDef(
      "p133_mojibake",
      (s, d) => {
        val base = T.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"),
            when(col("doc_id") % 5 === 0,
              replace(col("text"), lit("a"), lit("Ã¡")))
              .otherwise(col("text")).as("t1"))
          .select(col("doc_id"),
            when(col("doc_id") % 7 === 0,
              replace(col("t1"), lit("e"), lit("�")))
              .otherwise(col("t1")).as("text"))
        mojibakeSignals(base, "doc_id", "text")
          .select(col("doc_id"), col("n_chars"), col("n_latin1"),
            col("n_win1252"), col("n_replacement"), col("mojibake_ratio"),
            col("fixed"), col("text_fixed"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN replace(t1, 'e', chr(65533))
                      ELSE t1 END AS text
          FROM (SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN replace(text, 'a', 'Ã¡')
                            ELSE text END AS t1
                FROM documents WHERE text IS NOT NULL)),
        sig AS (
          SELECT doc_id, text,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(length(text) - length(replace(text, 'Ã', ''))
                      AS BIGINT)
                 + CAST(length(text) - length(replace(text, 'Â', ''))
                      AS BIGINT) AS n_latin1,
                 CAST((length(text) - length(replace(text, 'â€', ''))) / 2
                      AS BIGINT) AS n_win1252,
                 CAST(length(text) - length(replace(text, chr(65533), ''))
                      AS BIGINT) AS n_replacement
          FROM planted)
        SELECT doc_id, n_chars, n_latin1, n_win1252, n_replacement,
               CASE WHEN n_chars > 0
                    THEN CAST(n_latin1 + n_win1252 + n_replacement AS DOUBLE)
                         / n_chars
                    ELSE 0.0 END AS mojibake_ratio,
               (n_latin1 > 0 AND n_win1252 = 0 AND n_replacement = 0)
                 AS fixed,
               CASE WHEN n_latin1 > 0 AND n_win1252 = 0 AND n_replacement = 0
                    THEN replace(text, 'Ã¡', 'á') ELSE text END AS text_fixed
        FROM sig ORDER BY doc_id"""))
  )
}
