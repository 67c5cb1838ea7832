package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Tokenization and text shaping: token counts, vocabulary, BPE
  * (train / segment / encode), chunking, sequence packing, plus the
  * composed curation / PII / multimodal gates.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait TextOps { self: Pipeline.type =>

  /** Shared m06/m07/m08/m10/p135 oracle CTE list (no leading WITH, so
    * it composes with other chains): regenerates the patterned-PNG
    * pixels from [[Multimodal.renderPatternPng]]'s closed form and
    * replays the integer aHash block grid THROUGH the band pivot —
    * ends at CTE `hashes` (doc_id, w, h, b0..b3), so every consumer
    * mines pairs / probes filters from the one shared spelling
    * (review r18: the pivot was copy-pasted into four oracles). */
  private[operators] val ImagePHashOracleSql: String = """
        spec AS (
          SELECT doc_id, doc_id // 4 AS fam, doc_id % 4 AS delta
          FROM documents),
        par AS (
          SELECT doc_id, 8 + fam % 13 AS w, 8 + fam % 7 AS h,
                 fam % 5 + 1 AS a, fam % 3 + 1 AS b, fam % 11 + 1 AS e,
                 fam % 256 AS c, delta
          FROM spec),
        px AS (
          SELECT doc_id, w, h,
                 ((y * 8) // h) * 8 + ((x * 8) // w) AS blk,
                 3 * ((x * a + y * b + x * y * e + c + delta) % 256) AS gray
          FROM par, unnest(range(0, w)) tx(x), unnest(range(0, h)) ty(y)),
        bs AS (
          SELECT doc_id, w, h, blk, SUM(gray) AS bsum, COUNT(*) AS bn
          FROM px GROUP BY doc_id, w, h, blk),
        tot AS (
          SELECT doc_id, SUM(bsum) AS tsum, SUM(bn) AS tn
          FROM bs GROUP BY doc_id),
        bits AS (
          SELECT b.doc_id, b.w, b.h, b.blk,
                 CASE WHEN b.bsum * t.tn > t.tsum * b.bn THEN 1 ELSE 0 END
                   AS bit
          FROM bs b JOIN tot t USING (doc_id)),
        bands AS (
          SELECT doc_id, w, h, blk // 16 AS band,
                 SUM(bit * (1 << (blk % 16))) AS val
          FROM bits GROUP BY doc_id, w, h, blk // 16),
        hashes AS (
          SELECT doc_id, w, h,
                 CAST(SUM(CASE WHEN band = 0 THEN val ELSE 0 END) AS INT) AS b0,
                 CAST(SUM(CASE WHEN band = 1 THEN val ELSE 0 END) AS INT) AS b1,
                 CAST(SUM(CASE WHEN band = 2 THEN val ELSE 0 END) AS INT) AS b2,
                 CAST(SUM(CASE WHEN band = 3 THEN val ELSE 0 END) AS INT) AS b3
          FROM bands GROUP BY doc_id, w, h)
  """

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


  /** The packers' shard-size advisory (one spelling for
    * [[packSequences]] and [[packTokenIds]]): sequential packing ranks
    * every shard through ONE window task, so an oversized shard is a
    * straggler-then-OOM at 100 TB with no error — this guard rides the
    * broadcast shard-base column (column pruning cannot elide it; the
    * check itself costs one count per shard inside the agg the packers
    * already run) and raises LOUDLY with the sizing math instead.
    * Expects `__n` (the shard's row count) in scope. */
  private def shardRowsGuard(op: String, shard: Column, maxShardRows: Long,
      base: Column): Column =
    when(col("__n") > maxShardRows, raise_error(concat(
      lit(s"$op: shard "), shard.cast(StringType), lit(" holds "),
      col("__n").cast(StringType),
      lit(s" rows > maxShardRows = $maxShardRows — each shard packs " +
        "sequentially in ONE window task; use more shards (aim for " +
        "corpus_rows / |shards| <= maxShardRows) or raise maxShardRows " +
        "explicitly if a bigger task is intended"))).cast(LongType))
      .otherwise(base)

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
    * partition; this shape never does. The per-shard running sum is
    * still ONE window task per shard — inherent to sequential packing
    * (chunk boundaries depend on every preceding document) — so the
    * caller-chosen shard count bounds the parallelism AND the biggest
    * task: [[shardRowsGuard]] raises loudly when any shard exceeds
    * `maxShardRows` rows (the `localDictMax` stance; size shards so
    * corpus_rows / |shards| ≤ maxShardRows — OPERATORS.md has the
    * math). Output: (doc_id, <shardCol>, tok, tok_offset, first_chunk,
    * last_chunk, n_chunks). */
  def packSequences(corpus: DataFrame, idCol: String, shardCol: String,
      tokenCount: Column, contextLen: Int,
      maxShardRows: Long = 8388608L): DataFrame = {
    val toks = corpus.select(col(idCol).as("doc_id"), col(shardCol),
      tokenCount.as("tok"))
    val wIntra = Window.partitionBy(col(shardCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = toks.withColumn("run", sum(col("tok")).over(wIntra))
    val wBase = Window.orderBy(col(shardCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = toks.groupBy(col(shardCol))
      .agg(sum(col("tok")).as("total"), count(lit(1)).as("__n"))
      .withColumn("cum", sum(col("total")).over(wBase))
      .select(col(shardCol).as("b_shard"),
        shardRowsGuard("packSequences", col(shardCol), maxShardRows,
          (col("cum") - col("total"))).as("base"))
    intra.join(broadcast(bases), col(shardCol) === col("b_shard"))
      .select(col("doc_id"), col(shardCol), col("tok"),
        (col("base") + col("run") - col("tok")).as("tok_offset"))
      .withColumn("first_chunk", floor(col("tok_offset") / contextLen))
      .withColumn("last_chunk",
        floor((col("tok_offset") + col("tok") - 1) / contextLen))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  /** TRAINING-READY sequence packing over real token-id arrays — the
    * materializing companion of [[packSequences]] (which only lays out
    * chunk indices): every document's ids (typically [[bpeEncodeIds]]'
    * `bpe_ids`) get a `sepId` appended (the GPT-style end-of-document
    * token), documents concatenate in deterministic (shard, id) order
    * into one global token stream, and the stream slices into
    * `contextLen`-token chunks — the exact layout [[packSequences]]
    * predicts, now carrying the ids themselves. The final chunk may be
    * short (no padding — pad policy belongs to the trainer).
    *
    * Scale shape: the offset machinery is [[packSequences]]' verbatim
    * (one intra-shard running sum + a broadcast shard-base table); the
    * repack itself is ONE token-scale shuffle keyed by chunk — each
    * doc explodes into AT MOST ⌈tok/contextLen⌉+1 slice rows (array
    * slices, never per-token rows), and chunks rebuild with an
    * order-pinned sort_array concat (collect_list order is not
    * deterministic on its own). Nothing is driver-side.
    *
    * Output: (chunk_id, n_segments, ids) — `n_segments` counts the
    * document slices in the chunk (a doc spanning three chunks counts
    * in each); `size(ids) == contextLen` for every chunk but the
    * last. Unpacking: concatenate chunks by chunk_id and split on
    * `sepId` (round-tripped in TextApiSpec). `sepId` should be outside
    * the vocab id range — the ids themselves are opaque here. */
  def packTokenIds(corpus: DataFrame, idCol: String, shardCol: String,
      idsCol: String, contextLen: Int, sepId: Int,
      maxShardRows: Long = 8388608L): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val L = lit(contextLen.toLong)
    val toks = corpus.select(col(idCol).as("doc_id"),
        col(shardCol).as("__shard"),
        concat(col(idsCol), array(lit(sepId))).as("__ids"))
      .withColumn("tok", size(col("__ids")).cast(LongType))
    val wIntra = Window.partitionBy(col("__shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = toks.withColumn("run", sum(col("tok")).over(wIntra))
    // the shard-base table is shard-count-sized: its single-partition
    // window is fine (same stance as packSequences); the per-shard
    // task-size advisory rides the base column like packSequences'
    val wBase = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = toks.groupBy(col("__shard"))
      .agg(sum(col("tok")).as("total"), count(lit(1)).as("__n"))
      .withColumn("cum", sum(col("total")).over(wBase))
      .select(col("__shard").as("b_shard"),
        shardRowsGuard("packTokenIds", col("__shard"), maxShardRows,
          (col("cum") - col("total"))).as("base"))
    val lo = greatest(col("chunk") * L, col("off"))
    val hi = least((col("chunk") + 1) * L, col("off") + col("tok"))
    intra.join(broadcast(bases), col("__shard") === col("b_shard"))
      .select(col("__ids"), col("tok"),
        (col("base") + col("run") - col("tok")).as("off"))
      .withColumn("chunk", explode(sequence(floor(col("off") / L),
        floor((col("off") + col("tok") - 1) / L))))
      .select(col("chunk"), col("off"),
        slice(col("__ids"), (lo - col("off") + 1).cast(IntegerType),
          (hi - lo).cast(IntegerType)).as("piece"))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_segments"),
        flatten(transform(
          sort_array(collect_list(struct(col("off"), col("piece")))),
          s => s.getField("piece"))).as("ids"))
      .select(col("chunk").as("chunk_id"), col("n_segments"), col("ids"))
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
  /** Unigram-LM subword segmentation (Kudo, "Subword Regularization:
    * Improving Neural Network Translation Models with Multiple Subword
    * Candidates", ACL 2018 — the SentencePiece unigram model; with
    * [[bpeSegment]] this completes the two tokenizer families real
    * pipelines ship): every whitespace token of every document Viterbi-
    * segments against a `(piece, score)` table, maximizing the summed
    * scores with the [[graft.plans.UnigramSegment]] kernel's
    * longest-piece tie rule and single-char UNK fallback at `unkScore`.
    * The table is vocab-bounded (the BPE-merge-list contract) so it
    * collects once, bakes into the codegen'd expression, and every row
    * streams MAP-SIDE — zero shuffle, zero join; pieces must be
    * whitespace-free (they come from whitespace-split words — enforced)
    * and scores finite. Output: one row per (doc, word position) —
    * (doc_id, word_no, word, seg "p1+p2+…", n_pieces, score); NULL and
    * empty texts contribute no rows. */
  def unigramSegment(corpus: DataFrame, idCol: String, textCol: String,
      pieces: DataFrame, unkScore: Double = -100000.0): DataFrame = {
    require(!unkScore.isNaN && !unkScore.isInfinite,
      s"unkScore must be finite, got $unkScore")
    val tbl = pieces
      .select(col(pieces.columns(0)).cast(StringType),
        col(pieces.columns(1)).cast(DoubleType))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    require(tbl.nonEmpty, "need a non-empty piece table")
    val bad = tbl.filter(p => p._1 == null || p._1.isEmpty ||
      p._1.exists(_.isWhitespace) || p._2.isNaN || p._2.isInfinite)
    require(bad.isEmpty,
      s"pieces must be non-empty whitespace-free strings with finite " +
        s"scores; offenders: ${bad.take(5).mkString(", ")}")
    val enc = tbl.map(p => p._1 + " " + p._2).mkString("\n")
    corpus
      .select(col(idCol).as("doc_id"),
        posexplode(array_remove(words(col(textCol)), ""))
          .as(Seq("word_no", "word")))
      .withColumn("__sg",
        call_function("unigram_segment", col("word"), lit(enc), lit(unkScore)))
      .select(col("doc_id"), col("word_no").cast(LongType), col("word"),
        array_join(col("__sg.pieces"), "+").as("seg"),
        size(col("__sg.pieces")).cast(LongType).as("n_pieces"),
        col("__sg.score").as("score"))
  }

  /** Hard-EM unigram-LM training (the Viterbi-EM simplification of
    * Kudo 2018 §3.2's EM + pruning loop: the E-step takes the 1-best
    * segmentation instead of the full lattice expectation — the
    * standard cheap variant, deterministic by construction): seed with
    * every substring up to `maxPieceLen` weighted by word frequency,
    * then iterate {Viterbi-segment the word dictionary with current
    * scores via the SAME [[graft.plans.UnigramSegment.segmentLocal]]
    * the serving kernel runs (the two can never diverge) → re-score
    * pieces by usage log-frequency (add-1 smoothed, quantized 1e-9 —
    * the established cross-rerun ln stance) → prune to the top
    * `vocabSize` multi-char pieces by (usage, piece) with every
    * observed single character kept unconditionally (coverage — the
    * UNK fallback should mean "character never seen in training", not
    * "pruned")}. Scale shape: the corpus reduces to its distinct-word
    * dictionary in ONE partial-agg pass (the [[bpeTrain]] argument:
    * natural-language vocabulary grows sublinearly, so the
    * `localDictMax`-gated collect is vocab-bounded, not corpus-bound)
    * and the EM loop runs driver-local over it — no per-iteration
    * Spark jobs. Output: (piece, score), ready for
    * [[unigramSegment]]. */
  def unigramTrain(corpus: DataFrame, textCol: String, vocabSize: Int,
      iters: Int = 2, maxPieceLen: Int = 4,
      localDictMax: Int = 1 << 20): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dictRows = corpus
      .select(explode(array_remove(words(col(textCol)), "")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .limit(localDictMax + 1)
      .collect()
    require(dictRows.length <= localDictMax,
      s"word dictionary exceeds localDictMax=$localDictMax — raise it " +
        "or pre-truncate the corpus")
    val dict = dictRows.map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val round9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val chars = dict.flatMap(_._1.toSeq).distinct.sorted.map(_.toString)
    // seed scores: substring log-frequency over the weighted dictionary
    val seed = new scala.collection.mutable.HashMap[String, Long]()
    dict.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          seed.update(p, seed.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val seedTotal = seed.values.sum.toDouble
    var vocab: Seq[(String, Double)] = seed.toSeq.sortBy(_._1)
      .map { case (p, c) => (p, round9(math.log(c / seedTotal))) }
    var it = 0
    while (it < iters) {
      val table = new java.util.HashMap[String, java.lang.Double]()
      vocab.foreach { case (p, sc) =>
        table.put(p, java.lang.Double.valueOf(sc))
      }
      val maxLen = vocab.map(_._1.length).max
      val usage = new scala.collection.mutable.HashMap[String, Long]()
      dict.foreach { case (w, c) =>
        val (ps, _) = graft.plans.UnigramSegment.segmentLocal(
          w, table, maxLen, -1e12)
        ps.foreach(p => usage.update(p, usage.getOrElse(p, 0L) + c))
      }
      val keptMulti = usage.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, u) => (-u, p) }
        .take(math.max(0, vocabSize - chars.length)).map(_._1)
      val kept = (chars ++ keptMulti).distinct
      val uTotal = (kept.map(p => usage.getOrElse(p, 0L)).sum +
        kept.length).toDouble
      vocab = kept.sorted.map(p =>
        (p, round9(math.log((usage.getOrElse(p, 0L) + 1L) / uTotal))))
      it += 1
    }
    vocab.toDF("piece", "score")
  }

  /** The p79 gate's hand-built unigram piece table: full a–z coverage
    * at distinct low scores (−100 − index, so no two char paths tie)
    * plus multi-char pieces at distinct high scores chosen TIE-FREE
    * over the fixture vocabulary — `BpeSpec` brute-forces every
    * segmentation of every fixture word and asserts the argmax is
    * unique, which is what lets the oracle rank by score alone. Shared
    * between the QueryDef and the spec so the two can't drift. */
  private[graft] val UnigramGatePieces: Seq[(String, Double)] =
    ('a' to 'z').zipWithIndex.map { case (c, i) =>
      (c.toString, -(100.0 + i))
    } ++ Seq(
      "table" -> -40.0, "spark" -> -42.0, "data" -> -43.0, "key" -> -44.0,
      "sort" -> -45.0, "row" -> -47.0, "val" -> -49.0, "ta" -> -50.0,
      "ry" -> -51.0, "str" -> -52.0, "que" -> -53.0, "win" -> -54.0,
      "ble" -> -55.0, "dow" -> -56.0, "ue" -> -57.0, "eam" -> -58.0,
      "an" -> -59.0, "sc" -> -61.0, "ord" -> -62.0, "er" -> -63.0,
      "vec" -> -64.0, "tor" -> -65.0)

  /** WordPiece subword tokenization (Wu et al. 2016 §4.1 — the BERT
    * tokenizer; with [[bpeSegment]] and [[unigramSegment]] this
    * completes all three subword families production tokenizers ship):
    * every whitespace token greedy-longest-matches against a piece
    * vocabulary via the codegen'd [[graft.plans.WordpieceSegment]]
    * kernel — continuation pieces carry the `##` prefix, a word with
    * any unmatchable position (or longer than `maxInputChars` code
    * points) becomes the single `[UNK]` piece, no backtracking. The
    * vocabulary is vocab-bounded so it collects once and bakes into
    * the expression; every row then streams MAP-SIDE — zero shuffle,
    * zero join. Output: one row per (doc, word position) — (doc_id,
    * word_no, word, seg "p1+p2+…", n_pieces, is_unk) plus any
    * `keepCols` riding through (e.g. a language column for
    * [[tokenizerStats]]); NULL and empty texts contribute no rows. */
  def wordpieceSegment(corpus: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxInputChars: Int = 200,
      keepCols: Seq[String] = Seq.empty): DataFrame = {
    require(maxInputChars >= 1,
      s"maxInputChars must be >= 1, got $maxInputChars")
    val pieces = vocab.select(col(vocab.columns(0)).cast(StringType))
      .collect().map(_.getString(0))
    require(pieces.nonEmpty, "need a non-empty piece vocabulary")
    val bad = pieces.filter(p => p == null || p.isEmpty || p == "##" ||
      p.exists(_.isWhitespace))
    require(bad.isEmpty,
      "pieces must be non-empty whitespace-free strings (a bare '##' " +
        s"matches nothing); offenders: ${bad.take(5).mkString(", ")}")
    val enc = pieces.mkString("\n")
    corpus
      .select(Seq(col(idCol).as("doc_id"),
        posexplode(array_remove(words(col(textCol)), ""))
          .as(Seq("word_no", "word"))) ++ keepCols.map(col): _*)
      .withColumn("__ps", call_function("wordpiece_segment", col("word"),
        lit(enc), lit(maxInputChars)))
      .select(Seq(col("doc_id"), col("word_no").cast(LongType), col("word"),
        array_join(col("__ps"), "+").as("seg"),
        size(col("__ps")).cast(LongType).as("n_pieces"),
        (col("__ps") === array(lit(graft.plans.WordpieceSegment.UnkPiece)))
          .as("is_unk")) ++ keepCols.map(col): _*)
  }

  /** WordPiece vocabulary training (Schuster & Nakajima, "Japanese and
    * Korean Voice Search", ICASSP 2012 — the likelihood-gain variant
    * BPE's count objective approximates): identical merge mechanics to
    * [[bpeTrain]] — word-frequency dictionary, adjacent-pair merges,
    * greedy non-overlapping application — but each round merges the
    * pair MAXIMIZING count(xy) / (count(x)·count(y)) (the corpus
    * log-likelihood gain of fusing the pair into one unit) instead of
    * the raw pair count. Scores compare as exact BigInt
    * cross-products — c₁·(a₂·b₂) vs c₂·(a₁·b₁) — so training is
    * reproducible bit-for-bit with zero float ops; ties break (pair
    * count desc, then pair UTF-8-binary asc). Symbols use the serving
    * convention directly: word-initial pieces raw, continuations
    * `##`-prefixed, so merge outputs drop straight into
    * [[wordpieceSegment]]'s vocabulary (no `</w>` marker — WordPiece
    * marks continuation, not end). Scale shape: ONE corpus scan to
    * the vocab-bounded dictionary (the [[bpeTrain]] argument), then a
    * driver-local incremental-stats merge loop — no per-round Spark
    * jobs. Not SQL-expressible (iterative state); BpeSpec gates it
    * against hand-computed likelihood algebra, including the case
    * where the count objective (BPE) and the likelihood objective
    * (WordPiece) pick DIFFERENT pairs. Output: (merge_no, left,
    * right, piece, pair_count). */
  def wordpieceTrain(corpus: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2, localDictMax: Int = 1 << 20): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(minPairCount >= 1,
      s"minPairCount must be >= 1, got $minPairCount")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dictRows = corpus
      .select(explode(array_remove(words(col(textCol)), "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .limit(localDictMax + 1)
      .collect()
    require(dictRows.length <= localDictMax,
      s"word dictionary exceeds localDictMax=$localDictMax — raise it " +
        "or pre-truncate the corpus")
    val dict = dictRows.map { r =>
      val w = r.getString(0)
      val syms = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val c = new String(Character.toChars(cp))
        syms += (if (i == 0) c else "##" + c)
        i += Character.charCount(cp)
      }
      (syms.toArray, r.getLong(1))
    }.sortBy(x => x._1.mkString(" "))
    wordpieceTrainLocal(dict, numMerges, minPairCount)
      .toDF("merge_no", "left", "right", "piece", "pair_count")
  }

  /** The WordPiece symbol concatenation: the right symbol's `##` is
    * absorbed (it marked "continues the left neighbor", which the
    * merge just made true). */
  private def wpConcat(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** Incremental-stats WordPiece merge loop ([[bpeTrainLocal]]'s
    * machinery with the likelihood objective): pair counts AND unit
    * counts are maintained incrementally, so a round costs
    * O(Σ affected word lengths) + one scan of the live pairs for the
    * argmax. */
  private def wordpieceTrainLocal(dict0: Array[(Array[String], Long)],
      numMerges: Int, minPairCount: Long)
      : Seq[(Int, String, String, String, Long)] = {
    val words = dict0.map(w =>
      collection.mutable.ArrayBuffer.from[String](w._1))
    val cnts = dict0.map(_._2)
    val stats = collection.mutable.HashMap.empty[(String, String), Long]
    val unit = collection.mutable.HashMap.empty[String, Long]
    val index = collection.mutable.HashMap
      .empty[(String, String), collection.mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val w = words(wi)
      var i = 0
      while (i < w.length) {
        val u = w(i)
        val nu = unit.getOrElse(u, 0L) + sign * cnts(wi)
        if (nu == 0L) unit.remove(u) else unit(u) = nu
        if (i < w.length - 1) {
          val p = (w(i), w(i + 1))
          val nv = stats.getOrElse(p, 0L) + sign * cnts(wi)
          if (nv == 0L) stats.remove(p) else stats(p) = nv
          if (sign > 0)
            index.getOrElseUpdate(p, collection.mutable.Set.empty) += wi
        }
        i += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))
    val merges =
      collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (!done && round <= numMerges) {
      // argmax of c/(a·b) by exact cross-product; ties (score, then
      // pair count desc, then (l, r) UTF-8-binary asc)
      var bl: String = null
      var br: String = null
      var bc = 0L
      var bDen = BigInt(0)
      stats.foreach { case ((l, r), c) =>
        if (c >= minPairCount) {
          val den = BigInt(unit(l)) * BigInt(unit(r))
          val better =
            if (bl == null) true
            else {
              val cmp = (BigInt(c) * bDen).compare(BigInt(bc) * den)
              if (cmp != 0) cmp > 0
              else if (c != bc) c > bc
              else utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))
            }
          if (better) { bl = l; br = r; bc = c; bDen = den }
        }
      }
      if (bl == null) done = true
      else {
        val piece = wpConcat(bl, br)
        merges += ((round, bl, br, piece, bc))
        val affected = index.remove((bl, br)).map(_.toArray)
          .getOrElse(Array.emptyIntArray)
        affected.foreach { wi =>
          addWord(wi, -1L)
          val w = words(wi)
          val out = collection.mutable.ArrayBuffer.empty[String]
          w.foreach { x =>
            if (out.nonEmpty && out.last == bl && x == br)
              out(out.length - 1) = piece
            else out += x
          }
          words(wi) = out
          addWord(wi, 1L)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** The serving vocabulary of a trained WordPiece model — one (piece)
    * row per base symbol observed in the corpus (word-initial code
    * points raw, continuations `##`-prefixed — the same convention
    * [[wordpieceTrain]] trains in) plus every merge output, ready for
    * [[wordpieceSegment]]. Scale shape: one alphabet-bounded distinct
    * aggregation plus the numMerges-bounded merge table — both
    * parameter-sized ([[bpeVocab]]'s contract). */
  def wordpieceVocab(corpus: DataFrame, textCol: String,
      merges: DataFrame): DataFrame = {
    val base = corpus
      .select(explode(array_remove(words(col(textCol)), "")).as("w"))
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => when(i === 1, col("w").substr(lit(1), lit(1)))
          .otherwise(concat(lit("##"), col("w").substr(i, lit(1))))))
        .as("piece"))
    base.union(merges.select(col("piece"))).distinct()
  }

  /** Tokenizer evaluation report over a segmented corpus (the output
    * shape of [[wordpieceSegment]] / [[unigramSegment]]) — the three
    * numbers every tokenizer comparison publishes, per stratum:
    * FERTILITY (pieces per word — the standard multilingual-coverage
    * metric; a tokenizer trained on English shows fertility 2–4× on
    * unseen scripts), chars per piece (compression), and the UNK rate
    * when the segmentation carries one ([[wordpieceSegment]]'s
    * `is_unk`; pass `unkCol = None` for tokenizers with full coverage
    * — unigram's char fallback, BPE's open alphabet). One partial-agg
    * pass, stratum-cardinality output rows; the ratios divide exact
    * integer sums as doubles, so both engines agree bit-for-bit. */
  def tokenizerStats(segments: DataFrame, byCols: Seq[String],
      wordCol: String = "word", nPiecesCol: String = "n_pieces",
      unkCol: Option[String] = Some("is_unk")): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n_words"),
      sum(col(nPiecesCol)).as("n_pieces"),
      sum(length(col(wordCol)).cast(LongType)).as("n_chars")) ++
      unkCol.map(u => sum(col(u).cast(LongType)).as("n_unk")).toSeq
    val g = segments.groupBy(byCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val ratios = g
      .withColumn("fertility", col("n_pieces").cast(DoubleType) /
        col("n_words").cast(DoubleType))
      .withColumn("chars_per_piece", col("n_chars").cast(DoubleType) /
        col("n_pieces").cast(DoubleType))
    unkCol.fold(ratios)(_ => ratios.withColumn("unk_rate",
      col("n_unk").cast(DoubleType) / col("n_words").cast(DoubleType)))
  }

  /** The p81/p83 gates' hand-built WordPiece vocabulary over the
    * fixture corpus's 31-word lowercase vocabulary: every a–z as a
    * word-initial single and every `##`-continuation single EXCEPT
    * `##k` — so "spark" (non-initial k) exercises the whole-word
    * [[graft.plans.WordpieceSegment.UnkPiece]] rule — plus multi-char
    * pieces chosen to exercise greedy-longest at both initial and
    * continuation positions ("table" beats "tab"; "##eam" beats
    * "##ea"). The p81 gate runs maxInputChars = 7, so "customer"
    * (8 chars) exercises the over-length rule. Shared between the
    * QueryDefs and BpeSpec so the two can't drift. */
  private[graft] val WordpieceGateVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++
      ('a' to 'z').filter(_ != 'k').map("##" + _) ++ Seq(
      "table", "tab", "##le", "val", "va", "##ue", "str", "##eam", "##ea",
      "ord", "##er", "##uery", "sort", "sc", "##an", "da", "##ta", "the",
      "big", "vec", "##tor", "col", "##umn", "fil", "##ter", "part", "merg")

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

  /** Unicode NFC normalization of a text column — the
    * canonical-composition pass to run BEFORE any content-hash stage:
    * precomposed and decomposed spellings of the same visible text
    * hash apart, shingle apart and Bloom-probe apart without it
    * (silent dedup misses on mixed-encoder crawls). `nfc_changed`
    * reports which rows the pass actually rewrote (the cheap audit
    * counter). Map-side codegen kernel with an isNormalized fast path
    * — zero shuffle, certified cross-engine by p108 against DuckDB's
    * nfc_normalize. */
  def nfcNormalizeText(corpus: DataFrame, textCol: String,
      outCol: String = "text_nfc"): DataFrame =
    corpus
      .withColumn(outCol, call_function("nfc_normalize", col(textCol)))
      .withColumn("nfc_changed", !(col(outCol) <=> col(textCol)))

  /** TextOps QueryDefs — registered through [[Pipeline.queries]];
    * names, plans and oracle SQL unchanged by the r15 module split. */
  /** Packing-efficiency report over a [[packTokenIds]] output: ONE row
    * (n_chunks, n_full, total_tokens, n_separators, fill_rate,
    * separator_overhead) — the utilization metrics a training-data
    * team tracks per packed shard (how much of every context window is
    * real signal, how much separator/padding overhead the doc-length
    * distribution costs at this L). `total_tokens` counts every filled
    * slot including separators; only the final chunk can be short, so
    * fill_rate < 1 measures exactly that tail. One partial agg over
    * the chunk table — scale-free. */
  def packingReport(packed: DataFrame, contextLen: Int,
      sepId: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    packed
      .select(size(col("ids")).cast(LongType).as("__fill"),
        size(filter(col("ids"), v => v === sepId)).cast(LongType).as("__seps"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__fill") === contextLen, 1L).otherwise(0L)).as("n_full"),
        sum(col("__fill")).as("total_tokens"),
        sum(col("__seps")).as("n_separators"))
      .select(col("n_chunks"), col("n_full"), col("total_tokens"),
        col("n_separators"),
        (col("total_tokens").cast(DoubleType) /
          (col("n_chunks") * contextLen).cast(DoubleType)).as("fill_rate"),
        (col("n_separators").cast(DoubleType) /
          col("total_tokens").cast(DoubleType)).as("separator_overhead"))
  }

  /** The p74 oracle's packed-chunk CTE chain (deterministic word-id
    * encoding, −1 separators, (source, doc_id) order, L = 256 windows)
    * — shared by the p74 gate and the p116 packing-efficiency report
    * so both certify the SAME chunk stream. Ends at CTE `p`
    * (chunk_id, o2, piece). */
  private val PackTokenIdsCtes: String = raw"""d AS (
          SELECT doc_id, source,
                 list_transform(
                   list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
                   w -> CAST(CAST('0x' || substr(md5(w), 1, 12) AS BIGINT)
                             % 1000 AS INT)) AS ids
          FROM documents),
        t AS (
          SELECT doc_id, source, list_append(ids, -1) AS ids,
                 CAST(len(ids) + 1 AS BIGINT) AS tok
          FROM d),
        r AS (
          SELECT *, SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS run FROM t),
        bb AS (
          SELECT source AS b_source,
                 CAST(SUM(total) OVER (ORDER BY source ROWS UNBOUNDED PRECEDING)
                   - total AS BIGINT) AS base
          FROM (SELECT source, SUM(tok) AS total FROM t GROUP BY source)),
        o AS (
          SELECT doc_id, ids, tok, CAST(base + run - tok AS BIGINT) AS o2
          FROM r JOIN bb ON r.source = bb.b_source),
        p AS (
          SELECT c AS chunk_id, o2,
                 ids[CAST(GREATEST(c * 256, o2) - o2 + 1 AS INT) :
                     CAST(LEAST((c + 1) * 256, o2 + tok) - o2 AS INT)] AS piece
          FROM o, unnest(range(o2 // 256, (o2 + tok - 1) // 256 + 1)) u(c))"""

  private[operators] lazy val textQueries: Seq[QueryDef] = Seq(
    // ---- p116: packing-efficiency report — [[packingReport]] over
    // the exact p74 chunk stream (same word-id encoding, separators,
    // order and L = 256), so the two gates certify one pipeline: p74
    // the chunks themselves, p116 the utilization metrics a team
    // publishes per packed shard. The oracle splices the SHARED p74
    // CTE chain and aggregates the identical fill/separator counts.
    QueryDef(
      "p116_packing_report",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("source"),
          transform(array_remove(words(col("text")), ""), w =>
            pmod(call_function("md5_prefix_long", w, lit(6)), lit(1000L))
              .cast(IntegerType)).as("ids"))
        packingReport(
          packTokenIds(docs, "doc_id", "source", "ids",
            contextLen = 256, sepId = -1),
          contextLen = 256, sepId = -1)
      },
      Some(raw"""
        WITH $PackTokenIdsCtes,
        chunks AS (
          SELECT chunk_id, flatten(list(piece ORDER BY o2)) AS ids
          FROM p GROUP BY chunk_id),
        sizes AS (
          SELECT chunk_id, CAST(len(ids) AS BIGINT) AS fill,
                 CAST(len(list_filter(ids, v -> v = -1)) AS BIGINT) AS seps
          FROM chunks)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN fill = 256 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_full,
               CAST(SUM(fill) AS BIGINT) AS total_tokens,
               CAST(SUM(seps) AS BIGINT) AS n_separators,
               CAST(SUM(fill) AS DOUBLE) / CAST(COUNT(*) * 256 AS DOUBLE)
                 AS fill_rate,
               CAST(SUM(seps) AS DOUBLE) / CAST(SUM(fill) AS DOUBLE)
                 AS separator_overhead
        FROM sizes""")),

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

    // ---- p74: sequence packing on REAL id arrays — [[packTokenIds]]
    // materializes the chunks p22 only lays out: deterministic 48-bit
    // word ids (md5 mod 1000 — oracle-replayable; the true-BPE-id
    // composition with [[bpeEncodeIds]] is round-tripped in
    // TextApiSpec, the p62 stance on non-SQL-expressible training),
    // a −1 separator after each doc, (source, doc_id) concat order,
    // L=256 windows. The oracle replays the two-phase offsets, the
    // per-chunk slice windows and the offset-ordered concat.
    QueryDef(
      "p74_pack_token_ids",
      (s, d) => {
        val docs = T.documents(s, d).select(col("doc_id"), col("source"),
          transform(array_remove(words(col("text")), ""), w =>
            pmod(call_function("md5_prefix_long", w, lit(6)), lit(1000L))
              .cast(IntegerType)).as("ids"))
        packTokenIds(docs, "doc_id", "source", "ids",
          contextLen = 256, sepId = -1)
          .select(col("chunk_id"), col("n_segments"),
            graft.QueryDef.canonArray(col("ids")).as("ids"))
          .orderBy(col("chunk_id"))
      },
      Some(raw"""
        WITH $PackTokenIdsCtes
        SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
               concat('[',
                 array_to_string(flatten(list(piece ORDER BY o2)), ','),
                 ']') AS ids
        FROM p GROUP BY chunk_id ORDER BY chunk_id""")),

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

    // ---- p108: Unicode NFC normalization — the canonical-composition
    // pass content-hash dedup needs (precomposed U+00E9 and decomposed
    // U+0065+U+0301 are the SAME text but different md5s without it).
    // The fixture corpus is ASCII, so composed/decomposed markers are
    // injected deterministically from doc_id (the t21/p20 synthesize
    // trick); DuckDB's nfc_normalize implements the same UAX #15
    // algorithm as java.text.Normalizer, so hashes, lengths and the
    // changed flag certify the engines compose identically.
    QueryDef(
      "p108_nfc_normalize",
      (s, d) => {
        val marker = when(col("doc_id") % 3 === 0, lit(" cafe\u0301"))
          .when(col("doc_id") % 3 === 1, lit(" caf\u00e9"))
          .otherwise(lit(""))
        val marked = T.documents(s, d)
          .select(col("doc_id"), concat(col("text"), marker).as("t"))
        nfcNormalizeText(marked, "t", "t_nfc")
          .select(col("doc_id"),
            md5(col("t_nfc")).as("norm_md5"),
            length(col("t")).cast(LongType).as("n_before"),
            length(col("t_nfc")).cast(LongType).as("n_after"),
            col("nfc_changed"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH m AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
                              WHEN doc_id % 3 = 1 THEN ' caf' || chr(233)
                              ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
               md5(nfc_normalize(t)) AS norm_md5,
               CAST(length(t) AS BIGINT) AS n_before,
               CAST(length(nfc_normalize(t)) AS BIGINT) AS n_after,
               NOT (nfc_normalize(t) IS NOT DISTINCT FROM t) AS nfc_changed
        FROM m ORDER BY doc_id""")),

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
        ORDER BY doc_id, frame_no""")),

    // ---- m04: REAL image decode through pure-JDK javax.imageio — per
    // document a deterministic PNG is actually ENCODED (JDK PNG writer,
    // solid fill + white sentinel pixel at (0,0)), then actually
    // DECODED (ImageIO.read) and its raster measured: dimensions plus
    // exact integer per-channel pixel sums. The oracle recomputes the
    // closed-form expectations, so any decode defect — wrong stride,
    // channel order, color management, dropped sentinel — breaks the
    // sums. This retires the r15 "decode is stubbed" caveat for images
    // (audio/video stay stubbed: no codecs in the JDK).
    QueryDef(
      "m04_image_decode",
      (s, d) =>
        Multimodal.decodeImageStats(Multimodal.imageRecords(s, d))
          .toDF()
          .orderBy(col("doc_id")),
      Some("""
        WITH spec AS (
          SELECT doc_id,
                 8 + doc_id % 13 AS w, 8 + doc_id % 7 AS h,
                 doc_id % 256 AS g
          FROM documents)
        SELECT doc_id,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(w * h AS BIGINT) AS n_px,
               CAST(g * (w * h - 1) + 255 AS BIGINT) AS sum_r,
               CAST(((2 * g + 1) % 256) * (w * h - 1) + 255 AS BIGINT) AS sum_g,
               CAST(((3 * g + 2) % 256) * (w * h - 1) + 255 AS BIGINT) AS sum_b
        FROM spec ORDER BY doc_id""")),

    // ---- m05: REAL audio decode through pure-JDK javax.sound.sampled
    // — per document a deterministic 8-bit PCM WAV is actually ENCODED
    // (JDK RIFF writer, integer sawtooth samples), then actually
    // DECODED (AudioSystem.getAudioInputStream) and its frames
    // measured: container metadata plus exact integer amplitude sums.
    // The oracle recomputes the sawtooth closed-form, so a decode
    // defect (header offset, sign convention, frame count) breaks the
    // sums. With m04 this retires the decode stub for both stills and
    // WAV audio; only video / non-WAV codecs (absent from the JDK)
    // remain stubbed.
    QueryDef(
      "m05_audio_decode",
      (s, d) =>
        Multimodal.decodeAudioStats(Multimodal.audioRecords(s, d))
          .toDF()
          .orderBy(col("doc_id")),
      Some("""
        WITH spec AS (
          SELECT doc_id, 400 + doc_id % 200 AS n,
                 doc_id % 7 + 2 AS a, doc_id % 251 AS b
          FROM documents),
        s AS MATERIALIZED (
          SELECT doc_id, ((t * a + b) % 256) - 128 AS dev
          FROM spec, unnest(range(0, n)) u(t))
        SELECT doc_id,
               CAST(8000 AS INT) AS sample_rate,
               CAST(1 AS INT) AS channels,
               CAST(8 AS INT) AS bits,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(dev) AS BIGINT) AS sum_dev,
               CAST(SUM(dev * dev) AS BIGINT) AS sum_sq_dev
        FROM s GROUP BY doc_id ORDER BY doc_id""")),

    // ---- m06: perceptual average-hash over REAL decoded pixels — per
    // document a patterned PNG (gray gradient (x·a + y·b + c + δ) mod
    // 256, parameters from the doc's 4-member family) is ENCODED by
    // the JDK, DECODED back, and aHashed in pure integer arithmetic
    // (bit = blockSum·nTotal > totalSum·nBlock over gray = r+g+b).
    // The oracle regenerates every pixel from the closed form and
    // replays the block grid and threshold integer-for-integer, so a
    // decode defect OR any hash-arithmetic drift flips bits and
    // hash-mismatches. Hash carried as four 16-bit bands (b0..b3) —
    // the same columns m07's LSH buckets on.
    QueryDef(
      "m06_image_phash",
      (s, d) =>
        Multimodal.imagePerceptualHash(Multimodal.imageRecordsPatterned(s, d))
          .toDF()
          .orderBy(col("doc_id")),
      Some("WITH " + ImagePHashOracleSql + """
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               b0, b1, b2, b3
        FROM hashes ORDER BY doc_id""")),

    // ---- m07: image near-duplicate pairs — banded hamming LSH over
    // the m06 hashes (share-one-16-bit-band candidates, exact for
    // hamming ≤ 3 by pigeonhole, then the full 64-bit hamming filter).
    // The fixture's δ-perturbed families ARE the planted near-dups:
    // within a family only the mod-256 wraparound pixels move, so
    // sibling hashes sit a few bits apart; across families the
    // gradients differ and the hamming filter kills the accidental
    // band collisions. The oracle mines pairs from ITS OWN replayed
    // hashes with the OR-of-bands join + xor/bit_count — candidate
    // generation differs (LSH shuffle vs OR join), the PAIR SET must
    // not.
    QueryDef(
      "m07_image_neardup",
      (s, d) =>
        // persist: the operator fans the hash frame over three arms
        // and its lineage decodes every image (decode-once is the
        // caller's job — the CLI localCheckpoints; gates persist
        // under the bench clearCache contract)
        Multimodal.imageNeardupPairs(
          Multimodal.imagePerceptualHash(Multimodal.imageRecordsPatterned(s, d))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          tau = 3)
          .orderBy(col("doc_a"), col("doc_b")),
      Some("WITH " + ImagePHashOracleSql + """
        SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
               CAST(bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
                  + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3))
                  AS INT) AS hamming
        FROM hashes l JOIN hashes r
          ON l.doc_id < r.doc_id
         AND (l.b0 = r.b0 OR l.b1 = r.b1 OR l.b2 = r.b2 OR l.b3 = r.b3)
        WHERE bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
            + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3)) <= 3
        ORDER BY doc_a, doc_b""")),

    // ---- m08: cross-corpus image scrub — [[imageNeardupAgainstCorpus]]
    // with the fixture split by id parity (the p128 trick): evens are
    // the "new crawl", odds the "reference collection". Each 4-member
    // δ-family straddles the parity line, so the planted near-dups all
    // flow through the cross-side bucket join; the oracle mines pairs
    // from its replayed hashes with the parity predicate + OR-of-bands
    // join — candidate generation differs (per-side bucket shuffle vs
    // join), the PAIR SET must not. New-vs-new and ref-vs-ref pairs
    // never appear by construction (pinned: every output pair crosses
    // parity).
    QueryDef(
      "m08_image_scrub",
      (s, d) => {
        // persisted (r19): both parity sides re-run the opaque
        // render+decode+pHash lineage (the parity filter cannot push
        // below a typed mapPartitions) — one decode instead of two;
        // measured neutral at sf0.1, kept for the decode-once scale
        // shape. clearCache contract as p02.
        val hs = Multimodal.imagePerceptualHash(
          Multimodal.imageRecordsPatterned(s, d))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Multimodal.imageNeardupAgainstCorpus(
          hs.filter(col("doc_id") % 2 === 0),
          hs.filter(col("doc_id") % 2 === 1), tau = 3)
          .orderBy(col("doc_id"), col("ref_id"))
      },
      Some("WITH " + ImagePHashOracleSql + """
        SELECT l.doc_id AS doc_id, r.doc_id AS ref_id,
               CAST(bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
                  + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3))
                  AS INT) AS hamming
        FROM hashes l JOIN hashes r
          ON l.doc_id % 2 = 0 AND r.doc_id % 2 = 1
         AND (l.b0 = r.b0 OR l.b1 = r.b1 OR l.b2 = r.b2 OR l.b3 = r.b3)
        WHERE bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
            + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3)) <= 3
        ORDER BY doc_id, ref_id""")),

    // ---- m10: the image Bloom gate — m06 hashes of the doc_id%3=0
    // reference slice packed into one 4096-bit filter, every image
    // probed map-side ("any band key claimed present" flags). The
    // oracle replays the whole composition — closed-form pixels →
    // integer aHash bands → band-key strings → md5 double-hash
    // positions → set-membership probe — so even the filter's false
    // positives (deterministic at mBits = 4096) must match
    // bit-for-bit. The p129 gate's shape, for images.
    QueryDef(
      "m10_image_bloom_gate",
      (s, d) => {
        // persisted (r19): hs feeds both the Bloom build (ref side)
        // and the probe side — a typed render+decode+pHash lineage
        // with no exchange for reuse to dedup, so each arm re-decoded
        // every image (the m11/m07 fix applied at this gate's level;
        // same clearCache contract as p02)
        val hs = Multimodal.imagePerceptualHash(
          Multimodal.imageRecordsPatterned(s, d))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Multimodal.imageFlagAgainstBloom(hs,
          Multimodal.imageBloomBuild(hs.filter(col("doc_id") % 3 === 0),
            mBits = 4096, k = 3),
          mBits = 4096, k = 3)
          .select(col("doc_id"), col("neardup_in_ref"))
          .orderBy(col("doc_id"))
      },
      Some("WITH " + ImagePHashOracleSql + """,
        keys AS (
          SELECT doc_id,
                 CAST(b AS VARCHAR) || ':' ||
                 CAST(CASE b WHEN 0 THEN b0 WHEN 1 THEN b1
                             WHEN 2 THEN b2 ELSE b3 END AS VARCHAR) AS key
          FROM hashes, unnest(range(0, 4)) t(b)),
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
        SELECT doc_id, neardup_in_ref FROM probe ORDER BY doc_id""")),

    // ---- m11: audio near-dup pairs — [[Multimodal.audioNeardupPairs]]
    // over the δ-family WAV fixture (4 siblings share the sawtooth,
    // only the amplitude offset moves): candidates from exact aligned
    // 8-bit sub-fingerprint matches (the Haitsma-Kalker lookup-table
    // search), verified by full-fingerprint hamming ≤ 2 between
    // same-length fingerprints. The oracle regenerates the family
    // sawtooth, replays the m09 fingerprint chain, the block index,
    // and the per-position hamming — candidate generation differs
    // (bucket shuffle vs self-join), the PAIR SET must not.
    QueryDef(
      "m11_audio_neardup",
      (s, d) =>
        Multimodal.audioNeardupPairs(
          Multimodal.audioFingerprint(Multimodal.audioRecordsFamilies(s, d))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
          tau = 2)
          .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH fspec AS (
          SELECT doc_id, 400 + (doc_id // 4) % 200 AS n,
                 (doc_id // 4) % 7 + 2 AS a, (doc_id // 4) % 251 AS b,
                 (doc_id // 4) % 11 + 1 AS e, (doc_id // 4) % 128 AS fm,
                 doc_id % 4 AS delta
          FROM documents),
        fs AS MATERIALIZED (
          SELECT doc_id, CAST(t // 32 AS INT) AS w_i,
                 ((t * a + b + delta) % (128 + ((t // 32) * e + fm) % 128))
                   - 128 AS dev
          FROM fspec, unnest(range(0, (n // 32) * 32)) u(t)),
        fe AS (
          SELECT doc_id, w_i, SUM(dev * dev) AS en
          FROM fs GROUP BY doc_id, w_i),
        fbits AS (
          SELECT doc_id, w_i,
                 CASE WHEN en > lag(en) OVER (PARTITION BY doc_id
                                              ORDER BY w_i)
                      THEN '1' ELSE '0' END AS bit,
                 lag(en) OVER (PARTITION BY doc_id ORDER BY w_i) AS prev
          FROM fe),
        fps AS (
          SELECT sp.doc_id, CAST(sp.n // 32 AS INT) AS n_windows, f.fp
          FROM fspec sp JOIN (
            SELECT doc_id, string_agg(bit, '' ORDER BY w_i) AS fp
            FROM fbits WHERE prev IS NOT NULL GROUP BY doc_id) f
            USING (doc_id)),
        fblocks AS (
          SELECT doc_id, CAST(i AS INT) AS blk_no,
                 substr(fp, CAST(i * 8 + 1 AS INT), 8) AS bits
          FROM fps, unnest(range(0, len(fp) // 8)) t(i)
          WHERE len(fp) >= 8),
        fcand AS (
          SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM fblocks x JOIN fblocks y
            ON x.blk_no = y.blk_no AND x.bits = y.bits
           AND x.doc_id < y.doc_id),
        fver AS (
          SELECT c.doc_a, c.doc_b, fa.n_windows AS n_windows,
                 CAST(list_sum(list_transform(range(1, len(fa.fp) + 1),
                   i -> CASE WHEN fa.fp[i] <> fb.fp[i] THEN 1 ELSE 0 END))
                   AS INT) AS hamming
          FROM fcand c
          JOIN fps fa ON fa.doc_id = c.doc_a
          JOIN fps fb ON fb.doc_id = c.doc_b
          WHERE fa.n_windows = fb.n_windows)
        SELECT doc_a, doc_b, n_windows, hamming
        FROM fver WHERE hamming <= 2 ORDER BY doc_a, doc_b""")),

    // ---- m09: acoustic fingerprint over REAL decoded PCM —
    // [[Multimodal.audioFingerprint]] on the m05 WAV fixture: windowed
    // exact-integer energies over the actually-decoded sample stream,
    // energy-delta sign bits as the fingerprint. The oracle regenerates
    // the sawtooth samples from the closed form, replays the 32-sample
    // window partition (trailing partial dropped), the Σ dev² energies
    // and the strict-> lag comparison, and string-aggregates the bits
    // in window order — a decode defect (header offset, sign
    // convention, dropped frame) shifts every downstream energy and
    // breaks the string.
    QueryDef(
      "m09_audio_fingerprint",
      (s, d) =>
        Multimodal.audioFingerprint(Multimodal.audioRecords(s, d))
          .toDF()
          .orderBy(col("doc_id")),
      Some("""
        WITH spec AS (
          SELECT doc_id, 400 + doc_id % 200 AS n,
                 doc_id % 7 + 2 AS a, doc_id % 251 AS b
          FROM documents),
        s AS MATERIALIZED (
          SELECT doc_id, CAST(t // 32 AS INT) AS w_i,
                 ((t * a + b) % 256) - 128 AS dev
          FROM spec, unnest(range(0, (n // 32) * 32)) u(t)),
        e AS (
          SELECT doc_id, w_i, SUM(dev * dev) AS en
          FROM s GROUP BY doc_id, w_i),
        bits AS (
          SELECT doc_id, w_i,
                 CASE WHEN en > lag(en) OVER (PARTITION BY doc_id
                                              ORDER BY w_i)
                      THEN '1' ELSE '0' END AS bit,
                 lag(en) OVER (PARTITION BY doc_id ORDER BY w_i) AS prev
          FROM e)
        SELECT sp.doc_id, CAST(sp.n // 32 AS INT) AS n_windows,
               coalesce(fp.fp, '') AS fp
        FROM spec sp LEFT JOIN (
          SELECT doc_id, string_agg(bit, '' ORDER BY w_i) AS fp
          FROM bits WHERE prev IS NOT NULL GROUP BY doc_id) fp
          USING (doc_id)
        ORDER BY sp.doc_id""")),


    // ---- p79: unigram-LM Viterbi segmentation — [[unigramSegment]]
    // with the tie-free [[UnigramGatePieces]] table (integer-valued
    // scores: DP sums are exact in both engines). The oracle cannot
    // run a DP, so it enumerates EVERY segmentation of every distinct
    // word via a recursive CTE (words are ≤ 8 chars with full
    // single-char coverage — path counts are tiny) and keeps the
    // score-argmax, which is unique because the table is tie-free
    // (brute-force-asserted in BpeSpec). Certifies the kernel's
    // maximization, piece boundaries, piece counts and path-sum
    // scores word-for-word across the whole corpus.
    {
      val piecesValues = UnigramGatePieces
        .map { case (p, sc) => s"('$p', CAST($sc AS DOUBLE))" }
        .mkString(", ")
      QueryDef(
        "p79_unigram_segment",
        (s, d) => {
          import s.implicits._
          unigramSegment(T.documents(s, d), "doc_id", "text",
            UnigramGatePieces.toDF("piece", "score"))
            .orderBy(col("doc_id"), col("word_no"))
        },
        Some(s"""
          WITH RECURSIVE w AS (
            SELECT doc_id, CAST(i AS BIGINT) - 1 AS word_no, ws[i] AS word
            FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                    x -> x <> '') AS ws
                  FROM documents WHERE text IS NOT NULL),
                 unnest(range(1, len(ws) + 1)) t(i)),
          p(piece, score) AS (VALUES $piecesValues),
          uw AS (SELECT DISTINCT word FROM w),
          seg AS (
            SELECT word, 0 AS pos, CAST(0 AS DOUBLE) AS score,
                   CAST('' AS VARCHAR) AS path, 0 AS np
            FROM uw
            UNION ALL
            SELECT s.word, s.pos + len(p.piece), s.score + p.score,
                   CASE WHEN s.path = '' THEN p.piece
                        ELSE s.path || '+' || p.piece END,
                   s.np + 1
            FROM seg s JOIN p ON substr(s.word, s.pos + 1, len(p.piece)) = p.piece
            WHERE s.pos < len(s.word)),
          best AS (
            SELECT word, path, np, score,
                   ROW_NUMBER() OVER (PARTITION BY word
                     ORDER BY score DESC) AS rk
            FROM seg WHERE pos = len(word))
          SELECT w.doc_id, w.word_no, w.word, b.path AS seg,
                 CAST(b.np AS BIGINT) AS n_pieces, b.score AS score
          FROM w JOIN best b ON b.word = w.word AND b.rk = 1
          ORDER BY w.doc_id, w.word_no"""))
    },


    // ---- p81: WordPiece segmentation — [[wordpieceSegment]] with the
    // hand-built [[WordpieceGateVocab]] at maxInputChars = 7. The
    // oracle replays the greedy longest-match walk as a recursive CTE:
    // per (word, position) the best (longest) matching piece is a MAX
    // over the vocab join (continuations must carry '##'), the walk
    // follows those bests from position 1, and a word whose walk
    // strands short of the end — or that is over-length — collapses
    // to the single '[UNK]' piece, exactly the kernel's no-backtrack
    // rule. Certifies piece boundaries, the ## convention, both UNK
    // rules and piece counts word-for-word across the corpus.
    {
      val vocabValues = WordpieceGateVocab
        .map(p => s"('$p')").mkString(", ")
      QueryDef(
        "p81_wordpiece_segment",
        (s, d) => {
          import s.implicits._
          wordpieceSegment(T.documents(s, d), "doc_id", "text",
            WordpieceGateVocab.toDF("piece"), maxInputChars = 7)
            .orderBy(col("doc_id"), col("word_no"))
        },
        Some(s"""
          WITH RECURSIVE w AS (
            SELECT doc_id, CAST(i AS BIGINT) - 1 AS word_no, ws[i] AS word
            FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                    x -> x <> '') AS ws
                  FROM documents WHERE text IS NOT NULL),
                 unnest(range(1, len(ws) + 1)) t(i)),
          v(piece) AS (VALUES $vocabValues),
          uw AS (SELECT DISTINCT word FROM w),
          m AS (
            SELECT u.word, t.pos,
                   MAX(CASE WHEN t.pos = 1 THEN len(v.piece)
                            ELSE len(v.piece) - 2 END) AS clen
            FROM uw u, unnest(range(1, len(u.word) + 1)) t(pos), v
            WHERE (t.pos = 1 AND v.piece NOT LIKE '##%'
                   AND substr(u.word, 1, len(v.piece)) = v.piece)
               OR (t.pos > 1 AND v.piece LIKE '##%' AND len(v.piece) > 2
                   AND substr(u.word, CAST(t.pos AS BIGINT),
                         len(v.piece) - 2) = substr(v.piece, 3))
            GROUP BY u.word, t.pos),
          walk AS (
            SELECT word, CAST(1 AS BIGINT) AS pos,
                   CAST('' AS VARCHAR) AS path, CAST(0 AS BIGINT) AS np
            FROM uw
            UNION ALL
            SELECT k.word, k.pos + m.clen,
                   CASE WHEN k.path = '' THEN '' ELSE k.path || '+' END ||
                     CASE WHEN k.pos = 1 THEN substr(k.word, 1, m.clen)
                          ELSE '##' || substr(k.word,
                            CAST(k.pos AS BIGINT), m.clen) END,
                   k.np + 1
            FROM walk k JOIN m ON m.word = k.word AND m.pos = k.pos
            WHERE k.pos <= len(k.word)),
          fin AS (
            SELECT word, pos, path, np,
                   ROW_NUMBER() OVER (PARTITION BY word
                     ORDER BY pos DESC) AS rk
            FROM walk),
          res AS (
            SELECT word,
                   CASE WHEN len(word) > 7 OR pos <> len(word) + 1
                        THEN '[UNK]' ELSE path END AS seg,
                   CASE WHEN len(word) > 7 OR pos <> len(word) + 1
                        THEN CAST(1 AS BIGINT) ELSE np END AS n_pieces
            FROM fin WHERE rk = 1)
          SELECT w.doc_id, w.word_no, w.word, r.seg,
                 r.n_pieces, r.seg = '[UNK]' AS is_unk
          FROM w JOIN res r ON r.word = w.word
          ORDER BY w.doc_id, w.word_no"""))
    },

    // ---- p83: tokenizer evaluation report — [[tokenizerStats]] over
    // the p81 WordPiece segmentation, per language: fertility (pieces
    // per word), chars per piece, UNK rate. The oracle reuses the p81
    // walk CTE, joins it back to every word occurrence with its
    // document's language, and divides exact integer sums as doubles
    // (bit-identical division in both engines).
    {
      val vocabValues = WordpieceGateVocab
        .map(p => s"('$p')").mkString(", ")
      QueryDef(
        "p83_tokenizer_stats",
        (s, d) => {
          import s.implicits._
          val segd = wordpieceSegment(T.documents(s, d), "doc_id", "text",
            WordpieceGateVocab.toDF("piece"), maxInputChars = 7,
            keepCols = Seq("lang"))
          tokenizerStats(segd, byCols = Seq("lang"))
            .orderBy(col("lang"))
        },
        Some(s"""
          WITH RECURSIVE w AS (
            SELECT doc_id, lang, ws[i] AS word
            FROM (SELECT doc_id, lang,
                    list_filter(string_split_regex(text, '\\s+'),
                      x -> x <> '') AS ws
                  FROM documents WHERE text IS NOT NULL),
                 unnest(range(1, len(ws) + 1)) t(i)),
          v(piece) AS (VALUES $vocabValues),
          uw AS (SELECT DISTINCT word FROM w),
          m AS (
            SELECT u.word, t.pos,
                   MAX(CASE WHEN t.pos = 1 THEN len(v.piece)
                            ELSE len(v.piece) - 2 END) AS clen
            FROM uw u, unnest(range(1, len(u.word) + 1)) t(pos), v
            WHERE (t.pos = 1 AND v.piece NOT LIKE '##%'
                   AND substr(u.word, 1, len(v.piece)) = v.piece)
               OR (t.pos > 1 AND v.piece LIKE '##%' AND len(v.piece) > 2
                   AND substr(u.word, CAST(t.pos AS BIGINT),
                         len(v.piece) - 2) = substr(v.piece, 3))
            GROUP BY u.word, t.pos),
          walk AS (
            SELECT word, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np
            FROM uw
            UNION ALL
            SELECT k.word, k.pos + m.clen, k.np + 1
            FROM walk k JOIN m ON m.word = k.word AND m.pos = k.pos
            WHERE k.pos <= len(k.word)),
          fin AS (
            SELECT word, pos, np,
                   ROW_NUMBER() OVER (PARTITION BY word
                     ORDER BY pos DESC) AS rk
            FROM walk),
          res AS (
            SELECT word,
                   CASE WHEN len(word) > 7 OR pos <> len(word) + 1
                        THEN CAST(1 AS BIGINT) ELSE np END AS n_pieces,
                   (len(word) > 7 OR pos <> len(word) + 1) AS is_unk
            FROM fin WHERE rk = 1)
          SELECT w.lang,
                 CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(r.n_pieces) AS BIGINT) AS n_pieces,
                 CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
                 CAST(SUM(CASE WHEN r.is_unk THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unk,
                 CAST(CAST(SUM(r.n_pieces) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS fertility,
                 CAST(CAST(SUM(len(w.word)) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(SUM(r.n_pieces) AS BIGINT) AS DOUBLE)
                   AS chars_per_piece,
                 CAST(CAST(SUM(CASE WHEN r.is_unk THEN 1 ELSE 0 END)
                     AS BIGINT) AS DOUBLE)
                   / CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS unk_rate
          FROM w JOIN res r ON r.word = w.word
          GROUP BY w.lang
          ORDER BY w.lang"""))
    },



  )
}
