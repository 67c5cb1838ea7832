package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ~10× sf0.1 scale-stress harness (r15 verdict: "everything is
  * certified at sf0.01 and benched at sf0.1; the 100 TB arguments are
  * design-by-inspection" — this drives the most expensive operators
  * through a 50k-doc / 20k-vector corpus with plan-shape assertions
  * and a wall-time budget, so the scale claims get an executable
  * check one order of magnitude up).
  *
  * OPT-IN like LivePgSpec: canceled unless `GRAFT_STRESS=1` — the
  * corpus build plus the heavy drives cost minutes, which the default
  * suite must not. Run ONCE PER ROUND as part of the closing
  * certification with:
  * {{{ GRAFT_STRESS=1 sbt "testOnly graft.StressSpec" }}}
  * Each drive's wall time is committed to `tools/stress_history.json`
  * under the bench protocol's min-ratchet (committed keys are monotone
  * non-increasing; the 0-rise gate applies at round close), so scale
  * regressions are as undeniable as the sf0.1 bench ones.
  *
  * The corpus is generated DISTRIBUTED and deterministically (Spark
  * `hash`-derived word salad — no driver loops, no RNG state): 20% of
  * docs are exact-duplicate pairs (dedup work for p04), every doc
  * carries two unique hapax tokens (so the vocabulary GROWS with the
  * corpus — the r15 hazard class the unhinted-AQE joins must absorb),
  * and vectors carry 32-cluster structure (real neighbor sets for
  * semDedup/IVFPQ). Written once under target/stress/ and reused.
  */
class StressSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  private val NDocs = 50000L
  private val NVecs = 20000L
  private val Dir = "target/stress"
  private val captured = scala.collection.mutable.LinkedHashMap.empty[String, Double]

  private def ensureCorpus(): (DataFrame, DataFrame) = {
    val docsPath = s"$Dir/docs.parquet"
    val vecsPath = s"$Dir/vecs.parquet"
    if (!new java.io.File(docsPath).exists()) {
      val vocab = array(Seq("batch", "part", "spark", "line", "column",
        "order", "small", "sort", "fast", "value", "scan", "hash", "slow",
        "group", "agg", "filter", "query", "big", "key", "window", "row",
        "table", "stream", "merge", "data", "plan", "join", "shard",
        "codec", "page", "block", "stripe", "vector", "token", "gram",
        "probe", "build", "spill", "skew", "stage").map(lit): _*)
      // id%5==1 copies id-1's seed → 10k exact-duplicate pairs
      val seed = when(col("id") % 5 === 1, col("id") - 1).otherwise(col("id"))
      val len = (abs(hash(seed)) % 80 + 40).cast("int")
      val body = array_join(transform(sequence(lit(1), len), i =>
        element_at(vocab, (abs(hash(concat_ws("_", seed, i))) % 40 + 1)
          .cast("int"))), " ")
      spark.range(0, NDocs, 1, 32)
        .select(col("id").as("doc_id"),
          // two per-doc hapax tokens: the vocabulary grows 2×|corpus|
          concat(body, lit(" hapa"), seed, lit(" hapb"), col("id"))
            .as("text"),
          element_at(array(Seq("en", "de", "fr", "es", "zh").map(lit): _*),
            (abs(hash(seed)) % 5 + 1).cast("int")).as("lang"))
        .write.mode("overwrite").parquet(docsPath)
      val c = abs(hash(col("id"))) % 32
      val emb = transform(sequence(lit(1), lit(64)), j =>
        ((abs(hash(concat_ws("c", c, j))) % 1000).cast("double") / 500.0
          - 1.0
          + (abs(hash(concat_ws("n", col("id"), j))) % 200).cast("double")
            / 2000.0).cast("float"))
      spark.range(0, NVecs, 1, 32)
        .select(col("id").as("vec_id"), emb.as("embedding"))
        .write.mode("overwrite").parquet(vecsPath)
    }
    (spark.read.parquet(docsPath), spark.read.parquet(vecsPath))
  }

  /** Drive one operator: execute, assert rows, no CartesianProduct in
    * the final (adaptive) plan, and a wall-time budget. Budgets are
    * deliberately loose (ambient-load tolerant — the bench protocol's
    * lesson): they catch complexity blow-ups, not regressions. */
  private def drive(name: String, budgetSec: Int, minRows: Long = 1L)(
      df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val frame = df
    val n = frame.count()
    val secs = (System.nanoTime() - t0) / 1e9
    captured(name) = secs
    info(f"$name: $n rows in $secs%.1f s (budget $budgetSec s)")
    assert(n >= minRows, s"$name returned $n rows, expected >= $minRows")
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"$name plans a CartesianProduct at stress scale:\n$plan")
    assert(secs < budgetSec,
      f"$name took $secs%.1f s — over the $budgetSec s stress budget")
  }

  test("stress: the five most expensive operators hold shape at ~10× sf0.1") {
    assume(sys.env.contains("GRAFT_STRESS"),
      "stress harness is opt-in: set GRAFT_STRESS=1")
    val (docs, vecs) = ensureCorpus()
    import spark.implicits._

    // p04: exact n-gram Jaccard with prefix filtering — the quadratic
    // hazard; 10k exact-dup pairs must surface, candidates must not
    // explode beyond the prefix-filter contract
    drive("ngramJaccardPairs", budgetSec = 600, minRows = 10000L) {
      operators.Pipeline.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.8)
    }

    // p66: SemDeDup — quadratic within clusters only (32 clusters of
    // ~625 vectors)
    drive("semDedup", budgetSec = 600) {
      operators.Pipeline.semDedup(vecs, "vec_id", "embedding",
        k = 32, dim = 64, tau = 0.9)
    }

    // the clusterCap guard under a FORCED-degenerate clustering: k = 1
    // drops all 20k vectors into one mega-cluster, which uncapped
    // would self-join all-pairs (2·10⁸ dim-64 cosines); cap = 2000
    // salts it into ⌈20000/2000⌉ = 10 sub-blocks, ≤ cap² pairs each
    drive("semDedupSkewCap", budgetSec = 600, minRows = 10L) {
      operators.Pipeline.semDedup(vecs, "vec_id", "embedding",
        k = 1, dim = 64, tau = 0.9, clusterCap = 2000)
    }

    // p72: langid serve — the one-broadcast-row shape must survive a
    // corpus whose vocabulary grows with it (hapax tokens)
    drive("langIdScore", budgetSec = 300, minRows = NDocs) {
      val langs = Seq("en", "de", "fr", "es", "zh")
      val weights = langs.zipWithIndex.flatMap { case (l, li) =>
        (0 to 256).map(b => (l, b,
          if (b == 256) (li + 1).toDouble / 8
          else ((b * (li + 2)) % 9 - 4).toDouble / 8))
      }.toDF("lang", "b", "w")
      val scored = operators.Pipeline.langIdScore(docs, "doc_id", "text",
        weights, buckets = 256)
      // the weights must reach the features as ONE broadcast row (a
      // BroadcastNestedLoopJoin under the crossJoin by construction);
      // the doc-keyed left join of corpus ids onto the dots table MAY
      // SortMergeJoin here — two corpus-sized arms on the same key is
      // the correct shape at scale, so it is deliberately not pinned
      assert(scored.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "langIdScore lost its single-broadcast-row weight shape")
      scored
    }

    // p42 chain: residual IVFADC train + serve at k=32 — the full
    // production ladder, persisted like the README example
    drive("ivfpqResidualChain", budgetSec = 600) {
      val (member0, cents0) = operators.Pipeline.ivfIndex(
        vecs, "vec_id", "embedding", k = 32, dim = 64, iters = 1,
        seedRounds = 2)
      val member = member0.localCheckpoint()
      val cents = cents0.localCheckpoint()
      val resid = operators.Pipeline.pqResiduals(
        vecs, "vec_id", "embedding", member, cents).localCheckpoint()
      val books = operators.Pipeline.pqTrain(resid, "vec_id", "residual",
        dim = 64, m = 4, ksub = 16, iters = 1).localCheckpoint()
      val codes = operators.Pipeline.pqEncode(resid, "vec_id", "residual",
        books, dim = 64, m = 4)
      operators.Pipeline.ivfpqSearch(member, codes,
        vecs.filter(col("vec_id") < 8), cents, books, "vec_id",
        "embedding", k = 5, dim = 64, m = 4, ksub = 16, nprobe = 4,
        residual = true)
    }

    // p65: Stupid-Backoff perplexity of the corpus against a 10%
    // reference slice — gram tables shuffle under AQE, never broadcast
    // by force
    drive("lmPerplexity", budgetSec = 600, minRows = NDocs / 2) {
      operators.Pipeline.lmPerplexity(
        docs.filter(col("doc_id") % 10 === 0), docs,
        "doc_id", "text", "lang")
    }

    // the packed Bloom gate at stress scale: the broadcast is the
    // fixed mBits/8-byte filter, never corpus-sized
    drive("bloomDedupPacked", budgetSec = 300, minRows = NDocs) {
      operators.Pipeline.bloomDedupPacked(docs,
        docs.filter(col("doc_id") % 7 === 0), "text",
        mBits = 1 << 22, k = 5)
    }

    // PCA at stress scale: one dim²-bounded partial agg + driver
    // eigensolve + shuffle-free projection
    drive("pcaFitProject", budgetSec = 300, minRows = NVecs) {
      val basis = operators.Pipeline.pcaFit(vecs, "embedding",
        dim = 64, nComponents = 8)
      operators.Pipeline.pcaProject(vecs, "embedding", basis)
    }

    // snapshot diff at stress scale: one id-keyed full-outer join;
    // the union excludes ids in NEITHER snapshot (%15 == 0), so
    // 50000 - ceil(50000/15) = 46666 rows
    drive("corpusDiff", budgetSec = 300, minRows = 46666L) {
      operators.Pipeline.corpusDiff(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
    }

    // NFC normalization: a pure map pass — must stay shuffle-free
    drive("nfcNormalizeText", budgetSec = 300, minRows = NDocs) {
      val df = operators.Pipeline.nfcNormalizeText(docs, "text")
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
        "nfcNormalizeText must stay a shuffle-free map pass")
      df
    }

    // Min-K% Prob at stress scale: the KN gram tables here carry the
    // hapax tail (vocab grows with the corpus) — the joins must run
    // under AQE without a forced broadcast, and the ranking stays one
    // doc-keyed window
    drive("knMinKProb", budgetSec = 600, minRows = NDocs / 2) {
      operators.Pipeline.knMinKProb(
        docs.filter(col("doc_id") % 10 === 0), docs, "doc_id", "text")
    }

    // p02: the minhash-LSH chain — the 10k near-dup pairs (two hapax
    // tokens differ per pair, so shingle Jaccard ≈ 0.9, not 1.0) must
    // surface through the banded shuffle; LSH recall loses at most a
    // handful at J ≈ 0.9 under the 8×4 scheme
    drive("minhashNeardupPairs", budgetSec = 600, minRows = 9500L) {
      operators.Pipeline.minhashNeardupPairs(docs, "doc_id", "text",
        jaccardMin = 0.8)
    }

    // p78: CMS over a vocabulary that grows with the corpus (2 hapax
    // tokens per doc) — the partial agg stays bounded by depth×width
    // cells per mapper, never by vocab
    drive("cmsSketch", budgetSec = 300) {
      operators.Pipeline.cmsSketch(docs, "text", depth = 4, width = 1 << 14)
    }

    // p82: BM25 postings + top-k retrieval with the df table
    // AQE-decided (the r16 de-hinted gate) — at hapax-growing vocab
    // the join must not force a driver-sized broadcast
    drive("bm25Retrieval", budgetSec = 600, minRows = 400L) {
      val postings = operators.Pipeline.bm25Postings(docs, "doc_id", "text")
      operators.Pipeline.sparseTopK(postings,
        postings.filter(col("doc_id") < 50), k = 10)
    }

    // the same retrieval with the documented stop-term mitigation:
    // the stress vocabulary is 40 common words + hapax tail, so the
    // uncapped score shuffle above is dominated by postings of terms
    // in EVERY doc (~zero idf, full scan cost) — capPostingsByDf
    // prunes exactly those; the two keys quantify the cap's effect
    // minRows 10: after the cap only hapax/dup-pair terms carry signal
    // here (every common word is in ~every doc → pruned), so the 50
    // query docs surface just their exact-dup partners — which is the
    // point: the cap removes scan cost that carried ~zero ranking
    // signal
    drive("bm25RetrievalCapped", budgetSec = 600, minRows = 10L) {
      // r18: the drive now goes through the bm25Retrieval FRONT DOOR
      // (cap on by default) — the committed key measures the path a
      // library consumer actually gets; 5000/50000 docs = fraction 0.1,
      // the same threshold the hand-composed r17 drive used. Query
      // terms come from the raw text (the p82/p122 shape) instead of a
      // second postings build.
      val queries = docs.filter(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(array_remove(split(col("text"), "\\s+"), "")).as("term"))
        .distinct()
        .withColumn("weight", lit(1.0))
      operators.Pipeline.bm25Retrieval(docs, "doc_id", "text", queries,
        k = 10, maxDfFraction = Some(0.1))
    }

    // p120: MOSS winnowing candidates at 10× — the WinnowFingerprints
    // kernel must stay a linear map pass (the HOF spelling it replaced
    // went O(n²)-interpreted under Catalyst's filter inlining: 186 s
    // at sf0.1); the 10k near-dup pairs share ≥ w+k−1 runs, so the
    // coverage guarantee must surface them
    drive("winnowNeardupCandidates", budgetSec = 300, minRows = 9000L) {
      operators.Pipeline.winnowNeardupCandidates(docs, "doc_id", "text")
    }

    // p126: feature-hashed embeddings at 10× — one (doc, bucket)
    // partial-agg shuffle bounded at ≤ dim cells per doc; the hapax
    // vocabulary growth must NOT grow the shuffle beyond dim·docs
    drive("hashedEmbedding", budgetSec = 300, minRows = NDocs) {
      operators.Pipeline.hashedEmbedding(docs, "doc_id", "text", dim = 64)
    }

    // p128: cross-corpus scrub at 10× — every exact-dup pair in the
    // stress corpus is (id%5==0, id%5==1), i.e. crosses the even/odd
    // line, so all ~10k matches flow through the cross bucket join
    // (minus LSH recall loss at J ≈ 0.9); per-side buckets capped
    drive("neardupAgainstCorpus", budgetSec = 600, minRows = 9000L) {
      operators.Pipeline.minhashNeardupAgainstCorpus(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", jaccardMin = 0.8)
    }

    // m06+m07: REAL image decode + perceptual-hash near-dup at 50k
    // images — the JDK codec path and the banded hamming LSH at 10×.
    // Families of 4 δ-perturbed siblings ⇒ ≥ 3 of the 6 within-family
    // pairs typically survive hamming ≤ 3; the floor asserts the LSH
    // keeps finding them at scale, the budget that decode+hash stays
    // linear (8 bytes of hash per image regardless of pixels)
    drive("imagePHashNeardup", budgetSec = 600, minRows = 10000L) {
      import spark.implicits._
      val recs = spark.range(0, NDocs, 1, 32)
        .as[Long]
        .mapPartitions(_.map(id => operators.Multimodal.MediaRecord(
          id, "image/png", operators.Multimodal.renderPatternPng(id))))
      operators.Multimodal.imageNeardupPairs(
        operators.Multimodal.imagePerceptualHash(recs), tau = 3)
    }

    // p134: blocked record linkage at 10× — 150k entity records in
    // ~2k hash blocks (≈75 records each), every group of 5 planting
    // four identical names + one one-edit sibling, so ~300k true
    // matches flow through the block-bounded Levenshtein verify
    // (~5.5M distance evaluations). Proves the pair work stays
    // quadratic in BLOCK size, never corpus size
    drive("recordLinkage", budgetSec = 600, minRows = 250000L) {
      val grp = (col("id") / 5).cast("long")
      val recs = spark.range(0, 150000, 1, 32).select(col("id"),
        pmod(hash(grp), lit(2000)).as("blk"),
        concat(lit("name-"), abs(hash(grp)).cast("string"),
          when(col("id") % 5 === 1, lit("x")).otherwise(lit("")))
          .as("nm"))
      operators.Pipeline.blockedRecordLinkage(recs, "id", Seq("blk"),
        "nm", maxDist = 1, blockCap = 1000)
    }

    // p132: simplified silhouette at 10× — the O(n·k) fold must stay
    // one zero-shuffle pass + a k-row groupBy at 20k×64×32 clusters.
    // Rows = SURVIVING clusters: Lloyd's legitimately empties some of
    // the 32 min-id-seeded clusters on this corpus (29 survived on the
    // first drive), so the floor asserts half survive, not all
    drive("silhouetteReport", budgetSec = 300, minRows = 16L) {
      operators.Pipeline.silhouetteReport(vecs, "vec_id", "embedding",
        k = 32, dim = 64, iters = 2)
    }

    // p75: the dedup-ladder report — exact + near (the p02 component
    // graph) + substring layers audited in one aggregation pass
    drive("dedupLadderReport", budgetSec = 600) {
      val comps = operators.Pipeline.connectedComponents(
        operators.Pipeline.minhashNeardupPairs(docs, "doc_id", "text",
          jaccardMin = 0.8).select(col("doc_a"), col("doc_b")))
      operators.Pipeline.dedupLadderReport(docs, "doc_id", "text", comps,
        substringMinLen = 20)
    }

    // p138: semantic decontamination — 19k corpus vectors × 1k eval
    // vectors = 19M dim-64 cosines, ALL map-side against one broadcast
    // row; the corpus arm must stay shuffle-free (the count's single
    // partial agg is the only exchange)
    drive("semanticDecontam", budgetSec = 600, minRows = NVecs - 1000L) {
      operators.Pipeline.semanticDecontaminate(
        vecs.filter(col("vec_id") % 20 =!= 0),
        vecs.filter(col("vec_id") % 20 === 0),
        "embedding", tau = 0.9)
    }

    // p142: cross-corpus embedding scrub — 10k new vs 10k reference
    // vectors through per-side SRP buckets; candidates only from
    // cross-side bucket joins, exact-cosine verify on the candidate
    // subset (the clustered stress vectors make every same-cluster
    // cross pair a real candidate)
    drive("embeddingScrub", budgetSec = 600, minRows = 1000L) {
      operators.Pipeline.embeddingNeardupAgainstCorpus(
        vecs.filter(col("vec_id") % 2 === 1),
        vecs.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", tau = 0.9)
    }

    // p136/p137: the training-layout pair at 5M rows — the two-level
    // (partitioned window + offsets) rank construction must hold where
    // a single-partition global window would serialize the corpus
    val layout = spark.range(0, 5000000L, 1, 32)
      .select(col("id").as("doc_id"),
        (abs(hash(col("id"))) % 4096 + 1).cast("long").as("n_tok"))
    drive("balancedShards", budgetSec = 300, minRows = 5000000L) {
      operators.Pipeline.balancedShards(layout, "doc_id", "n_tok",
        nShards = 1024)
    }
    drive("curriculumOrder", budgetSec = 300, minRows = 5000000L) {
      operators.Pipeline.curriculumOrder(
        layout.withColumn("difficulty",
          (col("n_tok") / 256).cast("int")),
        "doc_id", "difficulty")
    }

    // r19 (r18 verdict #1): the stratified samplers' two-level
    // (stratum, md5-salt) rank at 5M rows over FIVE strata — stratum-
    // only partitioning would put ~1M rows through ONE window task.
    // The arity pin proves the salt reaches the partitioning AT STRESS
    // SCALE: every Window consuming corpus rows (no Aggregate on the
    // path to a leaf) partitions by ≥ 2 expressions.
    drive("stratifiedSplitTwoLevel", budgetSec = 300, minRows = 5000000L) {
      val strat = layout.withColumn("lang",
        element_at(array(Seq("en", "de", "fr", "es", "zh").map(lit): _*),
          (abs(hash(col("doc_id"))) % 5 + 1).cast("int")))
      val df = operators.Pipeline.stratifiedSplit(strat, "doc_id", "lang")
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
        LogicalPlan, Window => LWindow}
      def corpusConsuming(p: LogicalPlan): Boolean = p match {
        case _: Aggregate => false
        case leaf if leaf.children.isEmpty => true
        case other => other.children.exists(corpusConsuming)
      }
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w
      }
      assert(windows.nonEmpty, "stratifiedSplit lost its rank window")
      windows.foreach(w => assert(
        !corpusConsuming(w.child) || w.partitionSpec.size >= 2,
        s"a corpus-consuming Window partitions by only " +
          s"${w.partitionSpec.size} key(s) at stress scale:\n$w"))
      df
    }

    // q40: quiet-gap event dedup at 5M events over 50k keys — ONE
    // key-partitioned window (the sessionize shuffle class); every key
    // sees ~100 events at ~5000 s spacing against a 10 000 s window,
    // so most collapse and each key's first always survives
    drive("eventQuietGap", budgetSec = 300, minRows = 50000L) {
      val ev = spark.range(0, 5000000L, 1, 32)
        .select(col("id").as("event_id"),
          (abs(hash(col("id"))) % 50000).as("user_id"),
          lit("click").as("event_type"),
          timestamp_micros(col("id") * 100000L).as("ts"))
      operators.Relational.dedupEventsQuietGap(ev,
        Seq("user_id", "event_type"), "ts", "event_id",
        windowSec = 10000L)
    }

    // p139: the duplication-profile sweep — four exact gram-keyed
    // (count, count-distinct) aggregations over ~6M words (~24M gram
    // occurrences total), the vocabulary growing with the corpus
    drive("ngramDupProfile", budgetSec = 600, minRows = 4L) {
      operators.Pipeline.ngramDupProfile(docs, "text")
    }

    // p144: the same sweep with the HLL distinct side — NOTHING
    // gram-keyed shuffles (the melt collapses to ≤4096 register cells
    // per mapper, occurrence totals riding the same aggregation —
    // review r19.5), the 100 TB form of the profile: already faster
    // than exact at 10× (~6.7 s vs ~8.4 s), and the gap is the
    // hapax-dominated gram-universe shuffle the exact form cannot shed
    drive("ngramDupProfileHll", budgetSec = 600, minRows = 4L) {
      operators.Pipeline.ngramDupProfile(docs, "text", approx = true)
    }

    // THE COMPOSED USER JOURNEY in ONE session (r17 verdict Next #1):
    // curate → managed dedup chain → component-shared leakage-safe
    // split → BPE tokenize → pack + report — the `graft` CLI chain as
    // a library composition. Every stage is individually proven above;
    // this drive exercises their INTERACTION (CleanTextHandle +
    // DedupChain release lifecycles, a user-managed split checkpoint
    // feeding three consumers, bpeTrain's internal dictionary
    // checkpoint) and then asserts ZERO leaked cache/checkpoint blocks
    // once the handles are released — the assertion is the point.
    {
      val P = operators.Pipeline
      spark.catalog.clearCache()
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      // the stress corpus is single-line unpunctuated word salad, which
      // C4 line-cleaning (terminal punctuation + >=3 sentences) rightly
      // drops wholesale — the composed journey needs curate-able PAGES,
      // so wrap every 12 words into a period-terminated line (one map
      // pass, local to this drive; dup structure is preserved)
      val pages = docs.withColumn("text",
        concat(regexp_replace(col("text"),
          "((?:\\S+ ){11}\\S+) ", "$1.\n"), lit(".")))
      val clean = operators.Curation.cleanTextManaged(pages, "doc_id",
        "text", evalSet = Some(pages.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("text"))))
      val chain = P.dedupChainManaged(
        clean.frame.select(col("doc_id"), col("text_clean")),
        "doc_id", "text_clean", jaccardMin = 0.8)
      // the long-lived-session split shape: build the component graph
      // ONCE, split from it, checkpoint the split table (three
      // consumers below), release both at the end
      val splitComps = P.connectedComponents(
        P.minhashNeardupPairs(chain.deduped, "doc_id", "text_clean",
          jaccardMin = 0.8).select(col("doc_a"), col("doc_b")))
      val split = P.splitByComponents(chain.deduped, "doc_id", splitComps)
        .localCheckpoint()
      val hist = split.groupBy(col("split")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hist.keySet == Set("train", "val", "test"),
        s"split histogram missing a bucket: $hist")
      assert(hist("train") > hist("test") && hist("test") > 0L,
        s"implausible 8/1/1 split histogram: $hist")
      val train = split.filter(col("split") === "train")
      val merges = P.bpeTrain(train, "text_clean", numMerges = 48)
      val vocab = P.bpeVocab(train, "text_clean", merges)
      val ids = P.bpeEncodeIds(train, "text_clean", merges, vocab)
      val packed = P.packTokenIds(
        ids.withColumn("shard", col("doc_id") % 32), "doc_id", "shard",
        "bpe_ids", contextLen = 512, sepId = -2)
      val nChunks = packed.count()
      assert(nChunks > 0L, "end-to-end pipeline packed zero chunks")
      val packedPlan = packed.queryExecution.executedPlan.toString
      assert(!packedPlan.contains("CartesianProduct"),
        s"pipelineEndToEnd plans a CartesianProduct:\n$packedPlan")
      val rep = P.packingReport(packed, contextLen = 512, sepId = -2)
        .collect()(0)
      assert(rep.getLong(0) == nChunks,
        s"packingReport chunk count ${rep.getLong(0)} != packed $nChunks")
      val secs = (System.nanoTime() - t0) / 1e9
      captured("pipelineEndToEnd") = secs
      info(f"pipelineEndToEnd: $nChunks chunks in $secs%.1f s (budget 900 s)")
      assert(secs < 900, f"pipelineEndToEnd took $secs%.1f s — over budget")
      // release every handle, then the zero-leak assertion
      clean.release()
      chain.release()
      P.releaseLocalCheckpoint(splitComps, blocking = true)
      P.releaseLocalCheckpoint(split, blocking = true)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet --
        persistedBefore
      assert(leaked.isEmpty,
        s"pipelineEndToEnd leaked cached/checkpointed blocks: $leaked")
    }

    // p145: fixed-point PageRank at 100k nodes / ~500k edges, 5
    // rounds — the power-iteration shuffle class must stay linear in
    // edges × rounds; 10% of nodes publish nothing (dangling mass
    // broadcast every round)
    drive("pageRankStress", budgetSec = 600, minRows = 90000L) {
      val n = 100000L
      val edges = spark.range(0, n, 1, 32)
        .filter(col("id") % 10 =!= 0)
        .select(col("id").as("src"), explode(array((1 to 5).map(k =>
          abs(hash(concat_ws("_", col("id"), lit(k)))) % n): _*))
          .as("dst"))
      operators.Pipeline.pageRankFixedPoint(edges, "src", "dst",
        iterations = 5)
    }

    // q49: resample + LOCF at 50k keys × ~120-bucket grids (6M grid
    // rows) — the guarded sequence explode and the two window families
    // (rank-1 pick on (key, bucket); per-key fill) must hold shape
    drive("resampleFfillStress", budgetSec = 600, minRows = 5000000L) {
      val ev = spark.range(0, 2000000L, 1, 32).select(
        (col("id") % 50000L).as("k"),
        // xxhash64, not hash: the 32-bit hash caps at ~2.1e9 µs (35
        // minutes) and would collapse every key to ONE 6 h bucket
        timestamp_micros(abs(xxhash64(col("id")))
          % 2592000000000L).as("ts"),
        col("id").as("tie"),
        (col("id") % 97).cast("double").as("v"))
      operators.Relational.resampleFfill(ev, "k", "ts", "tie", "v",
        periodSec = 21600L)
    }

    // q48: the one-pass audit over the stress docs — row-local checks
    // stay a single conditional-sum scan, uniqueness one keyed count,
    // ref-integrity one anti-join
    drive("constraintAuditStress", budgetSec = 300, minRows = 4L) {
      operators.Relational.checkConstraints(docs, Seq(
        operators.Relational.NotNull("text"),
        operators.Relational.Unique(Seq("doc_id")),
        operators.Relational.InSet("lang",
          Seq("en", "de", "fr", "es", "zh")),
        operators.Relational.RefIntegrity(Seq("lang"),
          Seq("en", "de", "fr", "es", "zh").toDF("l"), Seq("l"))))
    }

    // commit the per-drive wall times to the min-ratchet: like the
    // bench history, the committed record is monotone non-increasing
    // per key, so an ambient-load run can never raise it and a
    // complexity regression at 10× scale is as undeniable as an sf0.1
    // one (r16 verdict #1)
    val merged = StressSpec.mergeStressHistory(
      StressSpec.readHistory(StressSpec.HistoryPath), captured.toMap)
    StressSpec.writeHistory(StressSpec.HistoryPath, merged)
    info(s"stress history committed: ${merged.size} keys -> " +
      StressSpec.HistoryPath)
  }

  test("stress history merge: committed keys never rise, absent keys carry forward") {
    // always-run pin of the ratchet rule (the BenchSpec stance)
    val merged = StressSpec.mergeStressHistory(
      Map("a" -> 10.0, "b" -> 5.0, "gone" -> 7.0),
      Map("a" -> 12.0, "b" -> 4.0, "new" -> 3.0))
    assert(merged == Map(
      "a" -> 10.0,   // captured higher -> committed value holds
      "b" -> 4.0,    // captured lower -> ratchet tightens
      "gone" -> 7.0, // failed/removed this run -> carried forward
      "new" -> 3.0)) // new drive enters at its captured value
    // non-positive history values never lock a key at an invalid floor
    assert(StressSpec.mergeStressHistory(Map("a" -> -1.0),
      Map("a" -> 2.0)) == Map("a" -> 2.0))
    // round-trip through the on-disk format
    val tmp = java.nio.file.Files.createTempFile("stress-hist", ".json")
      .toString
    StressSpec.writeHistory(tmp, merged)
    assert(StressSpec.readHistory(tmp) == merged)
    assert(StressSpec.readHistory("/nonexistent/x.json").isEmpty)
  }
}

object StressSpec {
  val HistoryPath = "tools/stress_history.json"

  /** Per-key min-merge, the bench-history ratchet rule: captured keys
    * take min(committed, captured); new keys enter at their captured
    * value; history-only keys carry forward (one transient failure
    * cannot erase a committed record); non-positive committed values
    * are ignored rather than locking an invalid floor. */
  def mergeStressHistory(history: Map[String, Double],
      captured: Map[String, Double]): Map[String, Double] = {
    val keys = history.keySet ++ captured.keySet
    keys.map { k =>
      k -> ((history.get(k).filter(_ > 0), captured.get(k)) match {
        case (Some(h), Some(c)) => math.min(h, c)
        case (Some(h), None) => h
        case (None, Some(c)) => c
        case (None, None) => Double.NaN // unreachable: k is in a map
      })
    }.toMap
  }

  def readHistory(path: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      "\"([^\"]+)\"\\s*:\\s*([-0-9.eE]+)".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Exception => Map.empty }

  def writeHistory(path: String, h: Map[String, Double]): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val line = h.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}\n")
    java.nio.file.Files.write(p, line.getBytes("UTF-8"))
  }
}
