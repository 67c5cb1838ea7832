package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Text-granular deduplication: global paragraph and exact-substring
  * dedup (Lee et al. 2022), word-span excision machinery, winnowing
  * fingerprints and the boilerplate reports.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait DedupTextOps { self: Pipeline.type =>

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

  /** WITHIN-document duplicate-line removal (the RefinedWeb/MassiveText
    * "repetition removal" cleanup at line granularity: a page whose
    * nav menu, share bar or footer repeats inside ONE document keeps
    * each content line only at its FIRST occurrence — the intra-doc
    * complement of [[dedupParagraphsGlobal]], which dedups lines
    * ACROSS documents). Whitespace-only lines (the ASCII set: space,
    * tab, LF, CR, FF) are structure, not content, and are never
    * deduplicated — a WIDER exemption than [[dedupParagraphsGlobal]]'s
    * space-only trim, so tab-only separator lines survive here.
    * Scale shape: ZERO shuffle — the whole operator is per-row
    * array expressions (split → indexed filter → join), embarrassingly
    * parallel at any corpus size; cost is O(lines²) PER DOC from the
    * first-occurrence scan, fine at web-page line counts (a pathological
    * million-line doc would prefer the global op's aggregate). NULL
    * text → (0, 0, "") like the global op. Output: (doc_id, n_lines,
    * n_kept_lines, text_deduped), one row per input doc. */
  def dedupLinesWithinDoc(corpus: DataFrame, idCol: String,
      textCol: String, sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    corpus
      .select(col(idCol).as("doc_id"),
        split(col(textCol), sepRe).as("__ls"))
      // keep line i iff whitespace-only OR its first occurrence is at i
      // (array_position is 1-based; the filter index is 0-based).
      // whitespace = the explicit ASCII set via char-set trim, NOT
      // trim(x) — bare trim strips only ' ' in both engines, so a
      // tab-only separator line would be treated as content and
      // deduplicated (r18 review)
      .withColumn("__kept", filter(col("__ls"), (x, i) =>
        trim(x, " \t\n\r\f") === "" ||
          array_position(col("__ls"), x) === i + 1))
      .select(col("doc_id"),
        coalesce(size(col("__ls")).cast(LongType), lit(0L)).as("n_lines"),
        coalesce(size(col("__kept")).cast(LongType), lit(0L))
          .as("n_kept_lines"),
        coalesce(array_join(col("__kept"), sep), lit(""))
          .as("text_deduped"))
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
  private[operators] def cutIntervals(ps0: Column, L: Int): Column = {
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
  private[operators] def cutSpansText(cuts: Column): Column =
    array_join(transform(cuts, c => concat_ws("-",
      c.getField("cs").cast(StringType),
      c.getField("ce").cast(StringType))), ",")

  /** Total words removed by the (disjoint) cut intervals. */
  private[operators] def cutWordCount(cuts: Column): Column =
    coalesce(aggregate(cuts, lit(0L), (acc, c) =>
      acc + (c.getField("ce") - c.getField("cs")).cast(LongType)), lit(0L))

  /** Rebuild a document with the cut word intervals excised: each
    * maximal KEPT run of words becomes one segment sliced from the
    * ORIGINAL text via the [[graft.plans.WordSpans]] char offsets
    * (interior whitespace preserved verbatim), and segments re-join
    * with a single space. Returns the excised text for docs WITH cuts;
    * callers branch the no-cut case themselves so clean documents stay
    * byte-identical. */
  private[operators] def exciseSegments(text: Column, spans: Column, nWords: Column,
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

  /** WINDOWED winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003 §4 — the MOSS algorithm; [[winnowFingerprints]] keeps
    * only the single global minimum, this is the real fingerprint
    * SET): hash every positioned word k-gram, slide a window of `w`
    * consecutive gram hashes, keep each window's minimum, and emit
    * the document's distinct selected hashes. The winnowing guarantee:
    * any shared run of ≥ w + k − 1 words contributes at least one
    * SHARED fingerprint, at expected density 2/(w+1) — detection
    * without hashing every gram into the index. Docs shorter than one
    * full window carry no row. Entirely map-side higher-order array
    * work, zero shuffle. Output: (doc_id, fps array&lt;long&gt;). */
  def winnowFingerprintSet(corpus: DataFrame, idCol: String,
      textCol: String, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k, w >= 1, got ($k, $w)")
    // the [[graft.plans.WinnowFingerprints]] codegen kernel — ONE
    // linear pass; the HOF spelling of the same arithmetic was inlined
    // by Catalyst into the downstream explode's pushed filter, where
    // the window lambda re-evaluated the whole gram transform per
    // position (O(n²) interpreted per row; 186 s at sf0.1)
    corpus
      .select(col(idCol).as("doc_id"),
        call_function("winnow_fps",
          array_remove(words(col(textCol)), ""), lit(k), lit(w))
          .as("fps"))
      .filter(size(col("fps")) > 0)
  }

  /** MOSS-style near-dup candidates from [[winnowFingerprintSet]]:
    * pairs sharing at least `minShared` selected fingerprints, with
    * `n_shared` = |fps_a ∩ fps_b| over fingerprints whose posting
    * bucket passes the [[graft.operators.DedupOps]] LshBucketCap guard
    * (a boilerplate fingerprint in every doc would otherwise explode
    * the pair fan-out — the same mass-duplicate stance as minhash
    * banding). One (fingerprint)-keyed shuffle; pair work bounded by
    * capped bucket sizes. Output: (doc_a, doc_b, n_shared). */
  def winnowNeardupCandidates(corpus: DataFrame, idCol: String,
      textCol: String, k: Int = 3, w: Int = 4,
      minShared: Int = 2): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val posting = winnowFingerprintSet(corpus, idCol, textCol, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    posting
      .groupBy(col("fp"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= LshBucketCap)
      .select(col("fp"), explode(col("docs")).as("da"), col("docs"))
      .select(col("fp"), col("da"), explode(col("docs")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("n_shared"))
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

  /** DedupTextOps QueryDefs — registered through [[Pipeline.queries]];
    * names, plans and oracle SQL unchanged by the r15 module split. */
  /** Content-defined chunking (the FastCDC/rsync boundary idea applied
    * at word granularity — chunk a document wherever a rolling window
    * hash hits a divisor condition, so chunk boundaries SHIFT WITH THE
    * CONTENT: an insertion early in a document moves every byte
    * offset, but re-synchronizes the chunk stream within one window,
    * which is why delta-dedup of re-crawled/lightly-edited pages
    * chunks by content, never by fixed offsets): a k-word window
    * whose rolling hash ≡ 0 (mod `divisor`) closes the chunk at the
    * window's FIRST word; expected chunk length ≈ divisor words. Same
    * rolling kernel as the dedup/decontamination family
    * ([[graft.plans.KgramRollHashesAll]]), so one hash arithmetic
    * serves all of them. ENTIRELY map-side (boundary test is
    * per-window, cut assembly is higher-order array work — zero
    * shuffle, plan-pinnable); chunk-level dedup is then
    * [[DedupOps.exactDedup]] on `chunk_md5`. Output: one row per
    * chunk (doc_id, chunk_no, start_word, n_words, chunk_md5); docs
    * with no words produce no rows. */
  def cdcChunks(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 2, divisor: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(divisor >= 1, s"divisor must be >= 1, got $divisor")
    val withWs = corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        array_remove(words(col(textCol)), "").as("__ws"))
      .filter(size(col("__ws")) >= 1)
      .withColumn("__hs",
        call_function("kgram_roll_hashes_all", col("__ws"), lit(k)))
    // cut AFTER word i whenever the window STARTING at i hits the
    // divisor; windows exist at 1..n-k+1 (a doc shorter than k words
    // is one chunk)
    val n = size(col("__ws"))
    val cuts = filter(
      transform(coalesce(col("__hs"), array().cast(ArrayType(LongType))),
        (h, i) => when(pmod(h, lit(divisor.toLong)) === 0, i + 1)),
      c => c.isNotNull)
    withWs
      .withColumn("__cuts", cuts)
      .withColumn("__starts",
        concat(array(lit(1)), transform(col("__cuts"), c => c + 1)))
      .withColumn("__ends", concat(col("__cuts"), array(n)))
      .select(col("doc_id"), col("__ws"),
        posexplode(filter(zip_with(col("__starts"), col("__ends"),
          (s, e) => when(s <= e, struct(s.as("s"), e.as("e")))),
          x => x.isNotNull)).as(Seq("chunk_no", "se")))
      .select(col("doc_id"), col("chunk_no").cast(LongType).as("chunk_no"),
        col("se.s").cast(LongType).as("start_word"),
        (col("se.e") - col("se.s") + 1).cast(LongType).as("n_words"),
        md5(concat_ws(" ",
          slice(col("__ws"), col("se.s"), col("se.e") - col("se.s") + 1)))
          .as("chunk_md5"))
  }

  /** Chunk-level dedup report over [[cdcChunks]] — how a crawl-delta /
    * storage dedup pass quantifies its savings: group chunks by
    * content hash, report every duplicated chunk (copies, words per
    * copy, words saved keeping one) plus the first holder for lineage.
    * One partial agg over the chunk stream — the [[DedupOps
    * .exactDedup]] shape at sub-document granularity, which is the
    * point: re-crawled pages whose EDITS broke document-level exact
    * dedup still share almost all their chunks. Output per duplicated
    * chunk: (chunk_md5, n_copies, words_per_copy, words_saved,
    * first_doc). */
  def cdcDedupReport(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 2, divisor: Int = 16): DataFrame =
    cdcChunks(corpus, idCol, textCol, k, divisor)
      .groupBy(col("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("n_words")).as("words_per_copy"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_copies") >= 2)
      .select(col("chunk_md5"), col("n_copies"), col("words_per_copy"),
        ((col("n_copies") - 1) * col("words_per_copy")).as("words_saved"),
        col("first_doc"))

  private[operators] lazy val deduptextQueries: Seq[QueryDef] = Seq(
    // ---- p120: MOSS winnowing candidates — [[winnowFingerprintSet]]
    // (positioned k-gram hashes → sliding-window minima → distinct
    // set) composed into [[winnowNeardupCandidates]] (shared-
    // fingerprint pairs under the bucket cap). The oracle replays the
    // positioned md5 grams (the p12 arithmetic kept positioned), the
    // per-window minima via a bounded self-join, the distinct
    // fingerprint set, the capped posting buckets and the per-pair
    // shared count — end to end.
    QueryDef(
      "p120_winnow_candidates",
      (s, d) =>
        winnowNeardupCandidates(T.documents(s, d), "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                   x -> x <> '') AS ws
          FROM documents
          WHERE len(list_filter(string_split_regex(text, '\\s+'),
                  x -> x <> '')) >= 6),
        g AS (
          SELECT doc_id, CAST(i AS BIGINT) AS i,
                 CAST('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')),
                   1, 8) AS BIGINT) AS h
          FROM w, unnest(range(1, len(ws) - 1)) t(i)),
        np AS (SELECT doc_id, MAX(i) AS npos FROM g GROUP BY doc_id),
        mins AS (
          SELECT a.doc_id, a.i AS j, MIN(b.h) AS m
          FROM g a
          JOIN np ON np.doc_id = a.doc_id
          JOIN g b ON b.doc_id = a.doc_id
                  AND b.i >= a.i AND b.i <= a.i + 3
          WHERE a.i + 3 <= np.npos
          GROUP BY a.doc_id, a.i),
        fset AS (SELECT DISTINCT doc_id, m FROM mins),
        buckets AS (
          SELECT m, list_sort(list(DISTINCT doc_id)) AS docs
          FROM fset GROUP BY m
          HAVING COUNT(DISTINCT doc_id) > 1
             AND COUNT(DISTINCT doc_id) <= 1000),
        pp AS (
          SELECT ta.da, tb.db, m
          FROM buckets, unnest(docs) ta(da), unnest(docs) tb(db)
          WHERE ta.da < tb.db)
        SELECT da AS doc_a, db AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM pp GROUP BY da, db
        HAVING COUNT(*) >= 2
        ORDER BY doc_a, doc_b""")),

    // ---- p100: CDC chunk-dedup savings report — [[cdcDedupReport]]
    // over the p99 chunk stream: one content-hash partial agg, the
    // exactDedup shape at sub-document granularity. The oracle reuses
    // the whole p99 replay and aggregates it identically.
    QueryDef(
      "p100_cdc_dedup_report",
      (s, d) => cdcDedupReport(T.documents(s, d), "doc_id", "text",
        k = 2, divisor = 16)
        .orderBy(col("chunk_md5")),
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 1)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d0 AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        w AS (SELECT doc_id, ws, len(ws) AS n FROM d0 WHERE len(ws) >= 1),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT)
                   AS HUGEINT) AS h
          FROM w, unnest(range(1, n + 1)) t(i)),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT w0.doc_id, w0.i,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 1
          JOIN pw ON pw.e = 1 - (w2.i - w0.i)
          WHERE w0.i <= w0.n - 1
          GROUP BY w0.doc_id, w0.i),
        cuts AS (
          SELECT doc_id, list_sort(list(i)) AS cs
          FROM g WHERE h % 16 = 0 GROUP BY doc_id),
        spans AS (
          SELECT w.doc_id, w.ws, w.n,
                 list_concat([1], list_transform(COALESCE(cuts.cs, []),
                   c -> c + 1)) AS starts,
                 list_concat(COALESCE(cuts.cs, []), [w.n]) AS ends
          FROM w LEFT JOIN cuts USING (doc_id)),
        ch AS (
          SELECT doc_id, CAST(ends[i] - starts[i] + 1 AS BIGINT) AS n_words,
                 md5(array_to_string(
                   ws[CAST(starts[i] AS INT):CAST(ends[i] AS INT)], ' '))
                   AS chunk_md5
          FROM spans, unnest(range(1, len(starts) + 1)) t(i)
          WHERE starts[i] <= ends[i]),
        rep AS (
          SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS n_copies,
                 CAST(MIN(n_words) AS BIGINT) AS words_per_copy,
                 MIN(doc_id) AS first_doc
          FROM ch GROUP BY chunk_md5)
        SELECT chunk_md5, n_copies, words_per_copy,
               CAST((n_copies - 1) * words_per_copy AS BIGINT)
                 AS words_saved,
               first_doc
        FROM rep WHERE n_copies >= 2 ORDER BY chunk_md5"""
      }),

    // ---- p99: content-defined chunking — [[cdcChunks]] at k = 2,
    // divisor = 16 (expected chunk ≈ 16 words). The oracle replays
    // the rolling window hashes (the p47/p56 HUGEINT arithmetic), the
    // divisor cuts, the span assembly (1-based inclusive list slices)
    // and the per-chunk md5 verbatim; chunk renumbering after the
    // empty-tail drop is pinned by a row_number mirror.
    QueryDef(
      "p99_cdc_chunks",
      (s, d) => cdcChunks(T.documents(s, d), "doc_id", "text",
        k = 2, divisor = 16)
        .orderBy(col("doc_id"), col("chunk_no")),
      Some {
        val P = graft.plans.TextHashes.MersenneP
        val B = BigInt(graft.plans.TextHashes.RollBase)
        val pows = (0 to 1)
          .map(e => s"($e, ${B.modPow(BigInt(e), BigInt(P))}::HUGEINT)")
          .mkString(", ")
        raw"""
        WITH d0 AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents WHERE text IS NOT NULL),
        w AS (SELECT doc_id, ws, len(ws) AS n FROM d0 WHERE len(ws) >= 1),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT)
                   AS HUGEINT) AS h
          FROM w, unnest(range(1, n + 1)) t(i)),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT w0.doc_id, w0.i,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 1
          JOIN pw ON pw.e = 1 - (w2.i - w0.i)
          WHERE w0.i <= w0.n - 1
          GROUP BY w0.doc_id, w0.i),
        cuts AS (
          SELECT doc_id, list_sort(list(i)) AS cs
          FROM g WHERE h % 16 = 0 GROUP BY doc_id),
        spans AS (
          SELECT w.doc_id, w.ws, w.n,
                 list_concat([1], list_transform(COALESCE(cuts.cs, []),
                   c -> c + 1)) AS starts,
                 list_concat(COALESCE(cuts.cs, []), [w.n]) AS ends
          FROM w LEFT JOIN cuts USING (doc_id)),
        ch AS (
          SELECT doc_id, ws, starts[i] AS s, ends[i] AS e
          FROM spans, unnest(range(1, len(starts) + 1)) t(i)
          WHERE starts[i] <= ends[i])
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s)
                 - 1 AS BIGINT) AS chunk_no,
               CAST(s AS BIGINT) AS start_word,
               CAST(e - s + 1 AS BIGINT) AS n_words,
               md5(array_to_string(ws[CAST(s AS INT):CAST(e AS INT)], ' '))
                 AS chunk_md5
        FROM ch ORDER BY doc_id, chunk_no"""
      }),

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

    // ---- p127: within-document duplicate-line removal. The fixture
    // corpus is single-line (no '\n' in any text), so the gate
    // SYNTHESIZES multi-line docs in both engines (the p113 twin
    // trick): text + a byte-identical duplicate line + an empty
    // (whitespace) line + a distinct upper-cased line. Certifies all
    // three contract clauses on every doc: the duplicate drops, the
    // whitespace line survives untouched, distinct content keeps
    // original order.
    QueryDef(
      "p127_dedup_lines_within_doc",
      (s, d) => dedupLinesWithinDoc(
        T.documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"),
            concat(col("text"), lit("\n"), col("text"), lit("\n\n"),
              upper(col("text"))).as("text")),
        "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""
        WITH nl AS (
          SELECT doc_id,
                 text || chr(10) || text || chr(10) || chr(10) ||
                   upper(text) AS t
          FROM documents WHERE text IS NOT NULL),
        sp AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM nl),
        k AS (SELECT doc_id, ls,
                list_filter(ls, (x, i) ->
                  trim(x, ' ' || chr(9) || chr(10) || chr(13) || chr(12))
                    = '' OR list_position(ls, x) = i) AS kept
              FROM sp)
        SELECT doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept_lines,
               array_to_string(kept, chr(10)) AS text_deduped
        FROM k ORDER BY doc_id"""))
  )
}
