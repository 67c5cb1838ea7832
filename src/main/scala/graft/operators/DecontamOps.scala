package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Benchmark decontamination: shared k-gram counts, boolean n-gram
  * flagging, and span-granular excision against broadcast-sized and
  * data-sized exclusion corpora.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait DecontamOps { self: Pipeline.type =>

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

  /** N-gram novelty score against a reference corpus — the
    * memorization / freshness signal (the per-document twin of
    * [[ngramDecontaminate]]'s boolean flag, and the quantity
    * Gopher-style train–test-overlap and generation-memorization
    * analyses report): for each document, the share of its DISTINCT
    * word n-grams the reference has NEVER seen. novelty 0 = every
    * n-gram already exists in the reference (a verbatim copy or
    * boilerplate); novelty 1 = entirely new text. Same 100 TB shape
    * as the boolean form: the reference collapses to ONE sorted
    * rolling-hash broadcast row, and the corpus side is a single map
    * pass — distinct doc grams via sort_array(array_distinct(...)),
    * shared-count via the [[graft.plans.SortedIntersectCount]] binary
    * merge, novelty as one exact integer ratio. Docs with fewer than
    * n words carry no n-gram: they emit n_grams = 0 and a NULL
    * novelty (undefined, not zero). Output: every corpus column +
    * (n_grams, n_known, novelty). */
  def ngramNoveltyScore(corpus: DataFrame, reference: DataFrame,
      textCol: String, n: Int = 8,
      refTextCol: String = ""): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val refCol = if (refTextCol.isEmpty) textCol else refTextCol
    val refHashes = reference
      .select(explode(call_function("kgram_roll_hashes_all",
        array_remove(words(col(refCol)), ""), lit(n))).as("h"))
      .agg(sort_array(collect_set(col("h"))).as("__ref_hashes"))
    corpus
      .crossJoin(broadcast(refHashes))
      .withColumn("__dg", sort_array(array_distinct(
        coalesce(call_function("kgram_roll_hashes_all",
          array_remove(words(col(textCol)), ""), lit(n)),
          array().cast(ArrayType(LongType))))))
      .withColumn("n_grams", size(col("__dg")).cast(LongType))
      .withColumn("n_known", coalesce(
        call_function("sorted_intersect_count", col("__dg"),
          col("__ref_hashes")), lit(0L)).cast(LongType))
      .withColumn("novelty", when(col("n_grams") > 0,
        (col("n_grams") - col("n_known")).cast(DoubleType) /
          col("n_grams").cast(DoubleType)))
      .drop("__ref_hashes", "__dg")
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
    * can only over-cut one window, never mask a real hit.
    *
    * Guarantee granularity (ADVICE r14): WITHIN each kept segment, no
    * word n-gram of the output matches the eval set — that is the
    * property the seam test pins (TextApiSpec). The single-space
    * re-join can, however, SYNTHESIZE a new n-gram ACROSS a seam
    * (last words of one kept segment + first words of the next) that
    * happens to match; one excision pass does not re-probe those.
    * Callers needing the closed property use
    * [[decontaminateSpansClosed]], which iterates exactly that
    * probe-and-cut to its fixed point. */
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

  /** [[decontaminateSpans]] iterated to a FIXED POINT — the closed
    * guarantee the single-pass docstring disclaims: the seam re-join
    * can synthesize a NEW n-gram across two kept segments that itself
    * matches the eval set; this variant re-probes its own output
    * until a pass flags nothing (each pass only shortens text, so it
    * terminates — `maxPasses` is a safety valve, and hitting it
    * raises rather than silently returning leaky text). Costs one
    * broadcast-probe pass plus one cheap any-flagged action per
    * round; real corpora close in 1–2 passes (a seam match needs the
    * two segment ends to happen to abut into an eval gram). Per-pass
    * outputs are localCheckpoint'd (the loop is iterative — without
    * truncation pass k re-executes passes 1..k-1) and each pass
    * releases its predecessor's blocks; the FINAL pass's blocks back
    * the returned frame and live until the session ends — write the
    * result out and drop the lineage for repeated one-shot runs (the
    * [[Curation.cleanTextManaged]] stance). Output: every caller
    * column + (n_flagged_grams = total across passes, n_passes,
    * `cleanCol`). Per-pass `cut_spans` are not composable across
    * passes (each pass's word positions refer to the previous pass's
    * text) and are not emitted. */
  def decontaminateSpansClosed(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, n: Int = 13, evalTextCol: String = "",
      cleanCol: String = "text_clean", maxPasses: Int = 8): DataFrame = {
    require(maxPasses >= 1, s"maxPasses must be >= 1, got $maxPasses")
    val evCol = if (evalTextCol.isEmpty) textCol else evalTextCol
    val keep = corpus.columns.toSeq
    var cur = corpus.withColumn("__acc", lit(0L))
      .withColumn("__cl", col(textCol))
    var prev: DataFrame = null
    var pass = 0
    var dirty = true
    while (dirty) {
      if (pass >= maxPasses) throw new IllegalStateException(
        s"decontaminateSpansClosed did not close in $maxPasses passes " +
          "(raise maxPasses; each pass strictly shortens flagged docs)")
      val out = decontaminateSpans(cur, evalSet, "__cl", n,
          evalTextCol = evCol, cleanCol = "__cl2")
        .withColumn("__acc", col("__acc") + col("n_flagged_grams"))
        .withColumn("__dirty", col("n_flagged_grams") > 0)
        .drop("n_flagged_grams", "cut_spans", "__cl")
        .withColumnRenamed("__cl2", "__cl")
        .localCheckpoint()
      if (prev != null) releaseLocalCheckpoint(prev)
      prev = out
      pass += 1
      dirty = !out.filter(col("__dirty")).isEmpty
      cur = out
    }
    cur.select(keep.map(col) ++ Seq(
      col("__acc").as("n_flagged_grams"),
      lit(pass).as("n_passes"),
      col("__cl").as(cleanCol)): _*)
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


  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram family (the Phi/FineWeb-Edu eval-similarity scrub:
    * paraphrased benchmark leakage shares no 13-gram, but its
    * embedding sits next to the eval item): score every corpus row by
    * its MAX cosine against the eval set and flag rows at or above
    * `tau`. Scale shape: the eval side is benchmark-suite-sized by
    * contract, so its vectors collapse to ONE broadcast row of
    * (vector, squared-norm) structs; the corpus side is a single
    * map pass — per row, `float_dot` (the codegen'd sequential fold)
    * against each eval vector inside one `transform`, then
    * `array_max` / a `>= tau` count over that array. The corpus never
    * shuffles, joins, or sorts — the same zero-shuffle corpus-arm
    * contract as [[ngramDecontaminate]]. All arithmetic is IEEE-exact
    * (dot ≡ DuckDB list_reduce, sqrt/division exactly rounded, MAX
    * order-free), so a DuckDB oracle matches bit-for-bit with no
    * quantization. An empty eval set raises (riding the output column
    * so pruning cannot elide it) — flagging NOTHING because the eval
    * table was accidentally empty is the silent failure mode a
    * decontamination pass must not have. Output: corpus columns +
    * max_cos + n_over (eval items at/above tau) + flagged. */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      vecCol: String, tau: Double): DataFrame = {
    require(tau > -1.0 && tau <= 1.0, s"tau must be in (-1, 1], got $tau")
    val evRow = evalSet
      .select(col(vecCol).as("__v"))
      .select(struct(col("__v").as("v"),
        dot(col("__v"), col("__v")).as("n2")).as("__e"))
      .agg(collect_list(col("__e")).as("__evals"))
    corpus
      .withColumn("__n2", dot(col(vecCol), col(vecCol)))
      .crossJoin(broadcast(evRow))
      .withColumn("__cos", transform(col("__evals"), e =>
        dot(col(vecCol), e.getField("v"))
          / (sqrt(col("__n2")) * sqrt(e.getField("n2")))))
      // two DISTINCT loud failures (review r18.2 — the first cut's
      // single coalesce blamed the eval set for both): an empty eval
      // set, and a corpus row the pass cannot score (NULL or
      // wrong-dimension embedding → every cos NULL) — silently KEEPING
      // an unscoreable row is the contamination leak this operator
      // exists to prevent
      .withColumn("max_cos",
        when(size(col("__evals")) === 0,
          raise_error(lit("semanticDecontaminate: empty eval set — " +
            "an empty exclusion corpus would silently flag nothing")))
          .when(array_max(col("__cos")).isNull,
            raise_error(lit("semanticDecontaminate: unscoreable corpus " +
              "embedding (NULL or wrong-dimension vs the eval set) — " +
              "filter or repair such rows first")))
          .otherwise(array_max(col("__cos"))))
      .withColumn("n_over",
        size(filter(col("__cos"), c => c >= lit(tau))).cast(LongType))
      .withColumn("flagged", col("max_cos") >= lit(tau))
      .select(corpus.columns.toSeq.map(col)
        ++ Seq(col("max_cos"), col("n_over"), col("flagged")): _*)
  }

  /** DecontamOps QueryDefs — registered through [[Pipeline.queries]];
    * names, plans and oracle SQL unchanged by the r15 module split. */
  private[operators] lazy val decontamQueries: Seq[QueryDef] = Seq(
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

    // ---- p102: n-gram novelty — [[ngramNoveltyScore]] at n = 8,
    // odd-id docs scored against the even-id half as reference. The
    // oracle replays the rolling hashes (the p47 HUGEINT machinery),
    // the per-doc distinct-gram and shared-gram counts, and the exact
    // integer-ratio novelty; sub-n docs carry NULL novelty in both
    // engines.
    QueryDef(
      "p102_ngram_novelty",
      (s, d) => {
        val all = T.documents(s, d)
        ngramNoveltyScore(
          corpus = all.filter(col("doc_id") % 2 =!= 0),
          reference = all.filter(col("doc_id") % 2 === 0),
          textCol = "text", n = 8)
          .select(col("doc_id"), col("lang"), col("n_grams"),
            col("n_known"), col("novelty"))
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
          SELECT doc_id, lang,
                 list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '') AS ws
          FROM documents),
        w AS (SELECT doc_id, ws, len(ws) AS n FROM d
              WHERE ws IS NOT NULL AND len(ws) >= 8),
        wh AS MATERIALIZED (
          SELECT doc_id, CAST(i AS INT) AS i, n,
                 CAST(CAST('0x' || substr(md5(ws[i]), 1, 12) AS BIGINT)
                   AS HUGEINT) AS h
          FROM w, unnest(range(1, n + 1)) t(i)),
        pw(e, bp) AS (VALUES $pows),
        g AS MATERIALIZED (
          SELECT DISTINCT w0.doc_id,
                 CAST(SUM((w2.h * pw.bp) % $P) % $P AS BIGINT) AS h
          FROM wh w0
          JOIN wh w2 ON w2.doc_id = w0.doc_id
                    AND w2.i >= w0.i AND w2.i <= w0.i + 7
          JOIN pw ON pw.e = 7 - (w2.i - w0.i)
          WHERE w0.i <= w0.n - 7
          GROUP BY w0.doc_id, w0.i),
        ref AS (SELECT DISTINCT h FROM g WHERE doc_id % 2 = 0),
        cg AS (SELECT doc_id, h FROM g WHERE doc_id % 2 <> 0),
        stats AS (
          SELECT cg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(SUM(CASE WHEN ref.h IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_known
          FROM cg LEFT JOIN ref USING (h) GROUP BY cg.doc_id)
        SELECT d.doc_id, d.lang,
               COALESCE(s.n_grams, 0) AS n_grams,
               COALESCE(s.n_known, 0) AS n_known,
               CASE WHEN COALESCE(s.n_grams, 0) > 0
                    THEN CAST(s.n_grams - s.n_known AS DOUBLE)
                         / CAST(s.n_grams AS DOUBLE)
               END AS novelty
        FROM d LEFT JOIN stats s USING (doc_id)
        WHERE d.doc_id % 2 <> 0 ORDER BY d.doc_id"""
      }),

    // ---- p138: semantic (embedding-space) decontamination —
    // [[semanticDecontaminate]] with every fifth vec_id as the eval
    // set (the p49 split convention) at tau = 0.4 (the fixture's
    // max-cos p99 sits at ~0.45, so a few corpus rows flag and the
    // rest certify the negative path). The oracle replays the exact
    // cosine (list_reduce sequential fold ≡ float_dot), the MAX, the
    // >= tau count and the flag — nothing quantized.
    QueryDef(
      "p138_semantic_decontam",
      (s, d) => {
        val e = T.embeddings(s, d)
        semanticDecontaminate(
          e.filter(col("vec_id") % 5 =!= 0).select(col("vec_id"), col("label")
            , col("embedding")),
          e.filter(col("vec_id") % 5 === 0),
          "embedding", tau = 0.4)
          .select(col("vec_id"), col("label"), col("max_cos"),
            col("n_over"), col("flagged"))
          .orderBy(col("vec_id"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label, embedding,
                 list_reduce(list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) AS n2
          FROM embeddings),
        ev AS (SELECT * FROM e WHERE vec_id % 5 = 0),
        corp AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
        scored AS (
          SELECT c.vec_id, c.label,
                 list_reduce(list_transform(range(1, len(c.embedding) + 1),
                   i -> CAST(c.embedding[i] AS DOUBLE) * CAST(ev.embedding[i] AS DOUBLE)),
                   (acc, x) -> acc + x) / (sqrt(c.n2) * sqrt(ev.n2)) AS cos
          FROM corp c, ev)
        SELECT vec_id, label, MAX(cos) AS max_cos,
               CAST(SUM(CASE WHEN cos >= CAST(0.4 AS DOUBLE) THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_over,
               MAX(cos) >= CAST(0.4 AS DOUBLE) AS flagged
        FROM scored GROUP BY vec_id, label ORDER BY vec_id"""))
  )
}
