package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Link-graph authority signals for web-corpus curation.
  *
  * Web-scale curation ranks pages by link authority before quality
  * filtering (Common Crawl publishes harmonic-centrality/PageRank-style
  * host ranks; CCNet/RefinedWeb-style pipelines consume them as a
  * quality prior). The reference has no graph surface at all — this is
  * the beyond-reference family next to [[DedupOps.connectedComponents]]
  * (which already does the other classic corpus graph pass).
  *
  * Determinism stance: the power iteration runs in FIXED-POINT int64
  * ("rank units" of `scale`⁻¹), not doubles — float PageRank sums are
  * order-dependent across partitions, so no double spelling could
  * hash-match the single-threaded DuckDB oracle (the Pipeline
  * determinism stance). Every step is integer: floor-div shares, exact
  * integer sums, floor-div damping. Each floor leaks < 1 unit of mass
  * per term (total mass is monotonically ≤ `scale`, spec-bounded), so
  * ranks are comparable to ~12 significant digits at the default scale
  * — far beyond what any downstream quality threshold reads.
  *
  * Scale stance (100 TB): the edge table is deduped, degree-annotated
  * and persisted ONCE, pre-partitioned by source node so each round's
  * rank⋈edge join reuses that layout and only the node-sized rank table
  * shuffles per round (inherent to power iteration — the same
  * round-shuffle class as [[DedupOps.connectedComponents]]). Rounds are
  * eagerly `localCheckpoint`ed with the previous round released, so
  * lineage and executor storage stay O(1) in the iteration count. The
  * dangling-mass total is a ONE-ROW aggregate broadcast back into the
  * plan (never a corpus-sized collect).
  */
private[operators] trait GraphOps { self: Pipeline.type =>

  /** Fixed-point PageRank over a directed edge table.
    *
    * Semantics (all int64, `p` = dampingPct, `S` = scale, `N` = node
    * count over src∪dst after cleanup):
    * {{{
    *   perNode   = S div N
    *   base      = ((100 − p) · perNode) div 100
    *   r₀(v)     = perNode
    *   D_i       = Σ rᵢ₋₁(v) over outdeg(v) = 0        (dangling mass)
    *   inflow(v) = Σ_{(u,v)∈E} rᵢ₋₁(u) div outdeg(u)
    *   rᵢ(v)     = base + (p · (inflow(v) + D_i div N)) div 100
    * }}}
    * Self-loops are dropped and parallel edges collapse to one
    * (standard PageRank cleanup; both documented rather than silent:
    * the dedup happens on the FIRST pass, before degrees are counted,
    * so degrees and shares always agree). A NULL endpoint raises — a
    * null in a link graph is a parse failure upstream, and silently
    * dropping it would undercount the source page's out-degree and
    * inflate every sibling link's share.
    *
    * Output: (node, rank_fp) — rank in `scale`⁻¹ units. Callers
    * wanting probabilities divide by `scale` themselves; the integer
    * form is the deterministic contract.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame =
    pageRankCore(edges, srcCol, dstCol, None, iterations, dampingPct,
      scale, "pageRankFixedPoint")

  /** Personalized PageRank — the seeded-teleport form every
    * whitelist-conditioned authority ranking uses (rank pages by
    * proximity to a trusted seed set — known-good domains, curated
    * hubs — instead of global popularity; TrustRank is exactly this).
    * Identical int64 fixed-point semantics with the teleport vector
    * concentrated on the seeds: r₀ and the (1−p) restart mass go only
    * to seed nodes (scale div |B| each, B = seeds present in the
    * graph), and dangling mass redistributes to the seeds. Uniform
    * [[pageRankFixedPoint]] IS this operator with B = all nodes — both
    * run the ONE shared loop, so the semantics cannot drift. Seed ids
    * absent from the graph are ignored (a whitelist naturally lists
    * pages the crawl never saw); an EMPTY intersection raises — ranks
    * of all-zero would silently claim "nothing is trustworthy". */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      iterations: Int = 10, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame =
    pageRankCore(edges, srcCol, dstCol,
      Some(seeds.select(col(seedCol).cast(LongType).as("node"))
        .filter(col("node").isNotNull).distinct()),
      iterations, dampingPct, scale, "personalizedPageRank")

  private def pageRankCore(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: Option[DataFrame], iterations: Int,
      dampingPct: Int, scale: Long, op: String): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"dampingPct must be in [1, 99], got $dampingPct")
    // upper bound: the damping step computes p·(inflow + share) with
    // inflow ≤ scale, so 99 · 2·1e15 ≈ 2e17 stays far inside int64 —
    // a larger scale would WRAP under Spark's unchecked long multiply
    // (garbage ranks, while DuckDB errors: silent engine divergence)
    require(scale >= 1000000L && scale <= 1000000000000000L,
      s"scale must be in [1e6, 1e15], got $scale")

    // ONE edge shuffle total for all of setup (measured r19: the old
    // distinct → groupBy(src) → join → repartition(node) chain paid
    // THREE edge-sized exchanges before the loop even started):
    // hash-partition the cleaned-but-not-yet-deduped edges by src once;
    // dropDuplicates(src,dst) and the per-src degree window both run on
    // that layout without further exchange (hash(src) satisfies the
    // clustering both require), and the persisted frame IS the layout
    // each round's rank⋈edges join lands on.
    val e = cleanEdges(edges, srcCol, dstCol, op, dedup = false)
    val edgesDeg = e.repartition(col("src"))
      .dropDuplicates("src", "dst")
      .select(col("src").as("node"), col("dst"),
        count(lit(1)).over(Window.partitionBy(col("src"))).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // node set + has-out-edges flag from ONE pass over the persisted
    // edges (the old shape derived the node set with its own
    // union+distinct shuffle and then re-derived "nodes with out-edges"
    // EVERY round as a distinct + anti-join; carrying __out in the rank
    // frame turns the per-round dangling-mass pass into a plain
    // filter+sum over the already-checkpointed ranks — zero joins)
    val nodesBase = edgesDeg.select(col("node"), lit(true).as("__o"))
      .unionAll(edgesDeg.select(col("dst").as("node"), lit(false).as("__o")))
      .groupBy(col("node")).agg(max(col("__o")).as("__out"))
    // nodes materialized ONCE (r19): nTele's count used to evaluate the
    // whole node-derivation plan (edge-table union + groupBy + seed
    // join) and the rank-init checkpoint then evaluated it AGAIN — one
    // full extra edge pass per call. Checkpoint the node table first,
    // count seeds off the materialized blocks, and build r₀ as a lazy
    // map over the same blocks (released with the edge cache below).
    val nodes = (seeds match {
      case None => nodesBase.withColumn("__seed", lit(true))
      case Some(s) => nodesBase
        .join(s.withColumn("__s", lit(true)), Seq("node"), "left")
        .select(col("node"), col("__out"),
          coalesce(col("__s"), lit(false)).as("__seed"))
    }).localCheckpoint()
    val nTele = nodes.filter(col("__seed")).count()
    require(nTele > 0, seeds match {
      case None => s"$op: empty edge table after cleanup (no " +
        "non-self-loop edges) — an authority signal over zero pages " +
        "is a pipeline wiring error"
      case _ => s"$op: no seed id appears in the graph — all-zero " +
        "ranks would silently claim nothing is trustworthy; check the " +
        "seed/node id spaces line up"
    })
    // below this, scale div |B| floors every teleport share to 0 and
    // the whole signal is silently meaningless
    require(nTele <= scale, s"$op: $nTele teleport nodes exceed scale " +
      s"$scale — every rank would floor to 0; raise scale")

    val perSeed = scale / nTele
    val base = ((100L - dampingPct) * perSeed) / 100L

    var prev: DataFrame = null
    // r₀ is a LAZY map over the checkpointed node table (not a second
    // checkpoint): round 1's three consumers each re-run only the
    // cheap projection over materialized blocks, and the usual
    // prev-release after round 1 walks this plan down to the node
    // table's LogicalRDD and frees those blocks exactly when the last
    // consumer is done with them
    var ranks = nodes
      .select(col("node"), col("__seed"), col("__out"),
        when(col("__seed"), lit(perSeed)).otherwise(lit(0L)).as("rank"))
    try {
      (1 to iterations).foreach { _ =>
        // dangling mass: filter+sum over the checkpointed rank frame —
        // no join, no extra shuffle, one scalar broadcast back in
        val dang = ranks.filter(!col("__out"))
          .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
        // only out-nodes contribute inflow; the filter halves the probe
        // side before the edge-layout join (an inner join would drop
        // the others anyway, but later — this prunes before the
        // exchange)
        val inflow = ranks.filter(col("__out"))
          .select(col("node"), col("rank"))
          .join(edgesDeg, Seq("node"))
          .select(col("dst").as("node"),
            expr("rank div deg").as("__c"))
          .groupBy(col("node")).agg(sum(col("__c")).as("__inflow"))
        val next = ranks.select(col("node"), col("__seed"), col("__out"))
          .join(inflow, Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"), col("__seed"), col("__out"),
            (when(col("__seed"), lit(base)).otherwise(lit(0L)) +
              expr(s"($dampingPct * (coalesce(__inflow, 0L)" +
                s" + (case when __seed then __dang div ${nTele}L" +
                s" else 0L end))) div 100")).as("rank"))
          .localCheckpoint()
        if (prev != null) releaseLocalCheckpoint(prev)
        prev = ranks
        ranks = next
      }
      if (prev != null) releaseLocalCheckpoint(prev)
      ranks.select(col("node"), col("rank").as("rank_fp"))
    } finally {
      edgesDeg.unpersist()
    }
  }

  /** The ONE edge-cleanup pass both graph operators share (self-loop
    * drop + parallel-edge collapse + NULL-endpoint raise): two
    * spellings of these rules could silently disagree on corrupt
    * input — a profile that "validated" a graph pageRank then crashes
    * on, or worse trusts rows pageRank would reject. */
  private def cleanEdges(edges: DataFrame, srcCol: String, dstCol: String,
      op: String, dedup: Boolean = true): DataFrame = {
    val nullGuard = when(col(srcCol).isNull.or(col(dstCol).isNull),
      raise_error(lit(s"$op: NULL edge endpoint — a null in " +
        s"($srcCol, $dstCol) is malformed input; filter or repair " +
        "upstream"))).otherwise(col(srcCol).cast(LongType))
    val base = edges
      .select(nullGuard.as("src"), col(dstCol).cast(LongType).as("dst"))
      .filter(col("src") =!= col("dst"))
    // pageRankCore dedups AFTER its src-hash repartition (same rule,
    // one exchange instead of two — the (src,dst)-keyed distinct here
    // would shuffle the edges once just to shuffle them again by src)
    if (dedup) base.distinct() else base
  }

  /** Degree profile of a directed edge table — the cheap companion
    * signal (the SAME cleanup pass as [[pageRankFixedPoint]],
    * including the NULL-endpoint raise): per node, distinct out/in
    * degree after self-loop drop + parallel-edge collapse. Nodes
    * appearing only as a source have in_deg 0 and vice versa — a
    * full-outer merge, never a lossy inner join. */
  def degreeProfile(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = cleanEdges(edges, srcCol, dstCol, "degreeProfile")
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** The p145/p146 fixture: a deterministic synthetic link graph over
    * `documents` — three modular-arithmetic out-links per page, pages
    * ≡ 0 (mod 10) publish none (they rank as pure sinks, exercising
    * the dangling-mass path). Both engines derive it from the same
    * int64 arithmetic, so the edge sets are identical by construction.
    */
  private def docLinkEdges(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val nd = docs.agg(count(lit(1)).as("__nd"))
    docs.select(col("doc_id")).crossJoin(broadcast(nd))
      .filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("src"),
        explode(array(
          expr("(doc_id * 7 + 1) % __nd"),
          expr("(doc_id * 13 + 5) % __nd"),
          expr("(doc_id * 101 + 11) % __nd"))).as("dst"))
  }

  private val DocLinkEdgesSql: String = """
    nd AS (SELECT COUNT(*) AS n FROM documents),
    raw AS (
      SELECT doc_id AS src, d AS dst
      FROM documents CROSS JOIN nd,
           unnest([(doc_id * 7 + 1) % n, (doc_id * 13 + 5) % n,
                   (doc_id * 101 + 11) % n]) t(d)
      WHERE doc_id % 10 <> 0),
    e0 AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)"""

  /** Unrolled DuckDB twin of the fixed-point iteration — one CTE pair
    * (dangling total, inflow) per round, integer `//` throughout
    * (non-negative operands, so DuckDB `//` ≡ Spark `div`). The
    * `seedWhere` form replays the personalized teleport: r₀, restart
    * mass and the dangling share all gated on seed membership —
    * exactly the shared-loop CASE arms. */
  private def pageRankOracleSql(iterations: Int, dampingPct: Int,
      scale: Long, seedWhere: Option[String] = None): String = {
    val seedPred = seedWhere.getOrElse("TRUE")
    val rounds = (1 to iterations).map { i =>
      val p = i - 1
      s"""
    dang$i AS (
      SELECT COALESCE(SUM(r), 0) AS dm FROM r$p
      WHERE node NOT IN (SELECT src FROM e0)),
    inf$i AS (
      SELECT e0.dst AS node, SUM(r$p.r // deg.d) AS f
      FROM r$p JOIN e0 ON r$p.node = e0.src
      JOIN deg ON deg.src = e0.src
      GROUP BY e0.dst),
    r$i AS (
      SELECT sn.node,
             (CASE WHEN sn.seed THEN base.b ELSE 0 END)
               + ($dampingPct * (COALESCE(inf$i.f, 0)
                 + CASE WHEN sn.seed THEN dang$i.dm // nt.n
                   ELSE 0 END)) // 100 AS r
      FROM sn LEFT JOIN inf$i ON sn.node = inf$i.node
      CROSS JOIN dang$i CROSS JOIN nt CROSS JOIN base)"""
    }.mkString(",")
    s"""
    WITH $DocLinkEdgesSql,
    nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
    sn AS (SELECT node, ($seedPred) AS seed FROM nodes),
    nt AS (SELECT COUNT(*) AS n FROM sn WHERE seed),
    deg AS (SELECT src, COUNT(*) AS d FROM e0 GROUP BY src),
    base AS (
      SELECT ((100 - $dampingPct) * ($scale // n)) // 100 AS b FROM nt),
    r0 AS (SELECT node, seed,
             CASE WHEN seed THEN (SELECT $scale // n FROM nt)
             ELSE 0 END AS r
           FROM sn),$rounds
    SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r$iterations
    ORDER BY node"""
  }

  private[operators] lazy val graphQueries: Seq[QueryDef] = Seq(
    // ---- p145: link-graph PageRank — [[pageRankFixedPoint]] over the
    // synthetic doc link graph, 3 rounds at the default damping/scale.
    // The oracle unrolls the identical int64 fixed-point recurrence
    // round by round, so the gate certifies every floor, every dangling
    // redistribution and every damping step — not just the ordering.
    QueryDef(
      "p145_pagerank",
      (s, d) => pageRankFixedPoint(docLinkEdges(s, d), "src", "dst",
        iterations = 3),
      Some(pageRankOracleSql(iterations = 3, dampingPct = 85,
        scale = 1000000000000L))),

    // ---- p147: personalized (seeded) PageRank — [[personalizedPageRank]]
    // with every 7th doc as the trusted seed set (72 of 500 at
    // sf0.01): teleport, restart mass and dangling redistribution all
    // concentrate on the seeds, so the gate certifies every CASE arm
    // of the shared loop against the seed-gated oracle unroll — and
    // that the two operators genuinely diverge (non-seed ranks carry
    // no restart term).
    QueryDef(
      "p147_personalized_pagerank",
      (s, d) => personalizedPageRank(docLinkEdges(s, d), "src", "dst",
        T.documents(s, d).filter(col("doc_id") % 7 === 0),
        "doc_id", iterations = 3),
      Some(pageRankOracleSql(iterations = 3, dampingPct = 85,
        scale = 1000000000000L,
        seedWhere = Some("node % 7 = 0")))),

    // ---- p146: degree profile — [[degreeProfile]] over the same
    // graph; certifies the shared cleanup rules (self-loop drop,
    // parallel-edge collapse) and the full-outer degree merge.
    QueryDef(
      "p146_degree_profile",
      (s, d) => degreeProfile(docLinkEdges(s, d), "src", "dst"),
      Some(s"""
        WITH $DocLinkEdgesSql,
        o AS (SELECT src AS node, COUNT(*) AS od FROM e0 GROUP BY src),
        i AS (SELECT dst AS node, COUNT(*) AS id_ FROM e0 GROUP BY dst)
        SELECT COALESCE(o.node, i.node) AS node,
               CAST(COALESCE(od, 0) AS BIGINT) AS out_deg,
               CAST(COALESCE(id_, 0) AS BIGINT) AS in_deg
        FROM o FULL OUTER JOIN i ON o.node = i.node
        ORDER BY node"""))
  )
}
