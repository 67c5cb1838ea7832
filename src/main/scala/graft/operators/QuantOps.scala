package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Vector quantization and clustering: k-means (fit / ++ / parallel
  * seeding), PQ / SQ codecs, the composed IVF-PQ / IVF-SQ ladders,
  * SemDeDup, and the k-means oracle-SQL builders.
  *
  * Split out of the pre-r15 7.8k-line Pipeline.scala; mixed into
  * [[Pipeline]], which remains the single public entry point — no
  * caller, gate, or oracle changed. */
private[operators] trait QuantOps { self: Pipeline.type =>

  /** The coarse-quantizer + product-quantizer index artifacts the
    * p37/p40/p41 ANN gates share, built ONCE per (app, dataDir) at the
    * fixture parameters and memoized — the [[sharedComponents]]
    * pattern applied to index training. The three gates price the same
    * k-means‖-seeded coarse fit and the same four per-subspace
    * codebook fits; standalone they retrained the overlapping chain
    * per gate (~16 s of the r10 sweep). Memoizing mirrors production:
    * an ANN index is TRAINED once and SERVED many times — the serving
    * queries (probe selection, ADC scan) are what each gate times —
    * since r16 that includes p42 (residual IVFADC), whose residual
    * codebooks/codes joined the memo: the sweep prices serving
    * everywhere, the one-time training chain is amortized into the
    * memo build (the r15 verdict's persist-then-serve stance).
    *
    * Artifacts: `member` (vec_id, cluster — corpus-sized label table),
    * `cents` (k centroid rows), `books` (m×ksub codebook rows), `codes`
    * (vec_id + m codes — corpus-sized). All four are eagerly
    * localCheckpoint'ed: materialized once, lineage truncated, blocks
    * surviving `spark.catalog.clearCache()` (which drops only
    * CacheManager entries). Same cap/eviction/release lifecycle and
    * EVICTION HAZARD contract as [[sharedComponents]] (see there);
    * [[releaseSharedIvfPq]] is the explicit hand. Demo-harness scope:
    * parameters are the fixture suite's (k=3, dim=64, m=4, ksub=4) —
    * library callers own their artifacts via [[ivfIndex]]/[[pqTrain]]/
    * [[pqEncode]] directly. */
  final case class IvfPqArtifacts(member: DataFrame, cents: DataFrame,
      books: DataFrame, codes: DataFrame,
      booksResid: DataFrame, codesResid: DataFrame,
      sqBounds: DataFrame, sqCodes: DataFrame,
      sqBoundsResid: DataFrame, sqCodesResid: DataFrame) {
    private[operators] def frames: Seq[DataFrame] =
      Seq(member, cents, books, codes, booksResid, codesResid,
        sqBounds, sqCodes, sqBoundsResid, sqCodesResid)
  }

  private val IvfPqMemoCap = 2

  private final class IvfPqEntry(val art: IvfPqArtifacts) extends PinnedEntry

  private val ivfPqMemo = new KeyedMemo[IvfPqEntry](IvfPqMemoCap,
    e => e.art.frames.foreach(releaseLocalCheckpoint(_, blocking = true)))

  private def buildIvfPqEntry(s: SparkSession, d: String): IvfPqEntry = {
    val e = T.embeddings(s, d)
    val (member0, cents0) = ivfIndex(e, "vec_id", "embedding",
      k = 3, dim = 64, iters = 1, seedRounds = 2)
    val member = member0.localCheckpoint()
    val cents = cents0.localCheckpoint()
    val books = pqTrain(e, "vec_id", "embedding", dim = 64, m = 4,
      ksub = 4, iters = 1).localCheckpoint()
    val codes = pqEncode(e, "vec_id", "embedding", books, dim = 64, m = 4)
      .localCheckpoint()
    // the SQ rungs of the same index family (p50/p54/p55's layouts):
    // bounds are dim-bounded, codes corpus-sized; the residual pair
    // trains on r(v) = v − c(cluster(v)) against the checkpointed
    // coarse artifacts (FAISS by_residual). The residual frame itself
    // is a build intermediate — checkpointed so bounds + codes don't
    // recompute it, released once both consumers are materialized.
    val sqBounds = sqTrain(e, "vec_id", "embedding", dim = 64)
      .localCheckpoint()
    val sqCodes = sqEncode(e, "vec_id", "embedding", sqBounds, dim = 64)
      .localCheckpoint()
    val resid = pqResiduals(e, "vec_id", "embedding", member, cents)
      .localCheckpoint()
    // residual-PQ rung (p42's by_residual layout, Jégou §V): codebooks
    // fit on r(v), codes encode r(v) against them — trained once here
    // so the gate sweep prices serving, not retraining (r15 verdict)
    val booksResid = pqTrain(resid, "vec_id", "residual", dim = 64, m = 4,
      ksub = 4, iters = 1).localCheckpoint()
    val codesResid = pqEncode(resid, "vec_id", "residual", booksResid,
      dim = 64, m = 4).localCheckpoint()
    val sqBoundsResid = sqTrain(resid, "vec_id", "residual", dim = 64)
      .localCheckpoint()
    val sqCodesResid = sqEncode(resid, "vec_id", "residual", sqBoundsResid,
      dim = 64).localCheckpoint()
    releaseLocalCheckpoint(resid)
    new IvfPqEntry(IvfPqArtifacts(member, cents, books, codes,
      booksResid, codesResid,
      sqBounds, sqCodes, sqBoundsResid, sqCodesResid))
  }

  private[graft] def sharedIvfPq(s: SparkSession, d: String): IvfPqArtifacts =
    ivfPqMemo.getOrBuild(memoKey(s, d), pin = false)(
      buildIvfPqEntry(s, d)).art

  /** A pin on memoized [[sharedIvfPq]] artifacts — the
    * [[SharedComponentsHandle]] contract applied to the index memo:
    * while open, cap eviction skips the entry; `close()` is
    * idempotent and entry-identity-checked (a stale handle never
    * steals a rebuilt entry's pin). */
  final class SharedIvfPqHandle private[operators] (
      private val entry: IvfPqEntry, key: String) extends AutoCloseable {
    def art: IvfPqArtifacts = entry.art
    private val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    override def close(): Unit =
      if (closed.compareAndSet(false, true)) ivfPqMemo.unpin(key, entry)
  }

  /** [[sharedIvfPq]], PINNED: the entry is exempt from cap eviction
    * until `close()` — for lazy or long-lived artifact holders. The
    * pin is taken atomically with the hit/insert. */
  def pinSharedIvfPq(s: SparkSession, d: String): SharedIvfPqHandle = {
    val key = memoKey(s, d)
    new SharedIvfPqHandle(
      ivfPqMemo.getOrBuild(key, pin = true)(buildIvfPqEntry(s, d)), key)
  }

  /** Release the memoized [[sharedIvfPq]] artifacts for (spark,
    * dataDir) — same contract as [[releaseSharedComponents]]: blocks
    * are freed, released frames must not be reused, the next call
    * retrains (the owner's override — it releases even pinned
    * entries). No-op when nothing is memoized. */
  def releaseSharedIvfPq(s: SparkSession, d: String): Unit =
    ivfPqMemo.removeAndRelease(memoKey(s, d))

  /** Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 §II):
    * the vector space splits into `m` contiguous subspaces of dim/m
    * dimensions, each trained as its OWN small k-means codebook of
    * `ksub` centroids — so a vector compresses to m small codes
    * (m bytes at ksub ≤ 256) while distances remain computable from
    * per-subspace lookup tables ([[pqSearch]]). Training reuses
    * [[kmeansFit]] verbatim over the sliced corpus, inheriting its
    * determinism contract (min-id seeds, integer-exact centroid sums,
    * ties to the lowest code) — m bounded passes over the corpus
    * (m is a small parameter, 4–16). Output: (j, code, ce) with
    * |ce| = dim/m. */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int, iters: Int = 1): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    (0 until m).map { j =>
      kmeansFit(
        corpus.select(col(idCol),
          slice(col(vecCol), j * sub + 1, sub).as("__sub")),
        idCol, "__sub", ksub, sub, iters)
        .select(lit(j).as("j"), col("cl").as("code"), col("ce"))
    }.reduce(_ unionByName _)
  }

  /** PQ encoding: each vector's m subspace codes (the compressed
    * representation [[pqSearch]] scans — m ints per vector instead of
    * dim floats). One broadcast of the full codebook, one map pass:
    * per subspace an argmin fold over its ksub centroids, ties to the
    * lowest code — the [[kmeansFit]] assignment contract per
    * subspace. Output: (vec_id, codes array&lt;int&gt; of length m). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    val cb = codebooks
      .groupBy(col("j"))
      .agg(sort_array(collect_list(struct(col("code"), col("ce")))).as("cs"))
      .agg(sort_array(collect_list(struct(col("j"), col("cs")))).as("js"))
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .crossJoin(broadcast(cb))
      .select(col("vec_id"), array((0 until m).map { j =>
        aggregate(element_at(col("js"), j + 1).getField("cs"),
          struct(lit(Double.MaxValue).as("d2"), lit(-1).as("code")),
          (acc, c) => {
            val d = call_function("float_dist_sq",
              slice(col("embedding"), j * sub + 1, sub), c.getField("ce"))
            when(d < acc.getField("d2"),
              struct(d.as("d2"), c.getField("code").as("code")))
              .otherwise(acc)
          }).getField("code")
      }: _*).as("codes"))
  }

  /** PQ asymmetric-distance search (ADC, Jégou TPAMI'11 §III): score
    * the CODES table against each query via per-subspace lookup
    * tables. Per query, ONE m×ksub distance table is built against
    * the broadcast codebook (dim multiplications per cell, parameter-
    * bounded); the corpus scan then costs m array lookups + m−1
    * additions per vector — it never touches the original vectors,
    * which is the PQ scale story: the scanned table is m ints per
    * vector (~m bytes at ksub ≤ 256) instead of dim floats, an
    * (4·dim)/m-fold bandwidth cut, and the approximate distance
    * d̂(q,v) = Σ_j d²(q_j, c_{j,code_j(v)}) needs no sqrt for ranking.
    * Additions run in fixed subspace order (left-associated), so
    * adist is bit-reproducible cross-engine. Output: (q_id, vec_id,
    * adist, rk ≤ k) ranked by ascending adist, ties to the lowest
    * vec_id. `excludeSelf` as in [[knnBruteCosine]].
    *
    * The codebook must be COMPLETE — every (j, code) for code <
    * ksub — because the lookup index is arithmetic (j·ksub + code);
    * validated eagerly (the codebook is parameter-sized), throwing on
    * a codebook whose empty clusters dropped codes (retrain with more
    * iters or smaller ksub). */
  def pqSearch(codes: DataFrame, queries: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, m: Int, ksub: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    val flat = collectCodebookFlat(codebooks, m, ksub)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qe"))
      .crossJoin(broadcast(flat))
      .select(col("q_id"),
        transform(col("fl"), c =>
          call_function("float_dist_sq",
            slice(col("qe"), c.getField("j") * sub + 1, lit(sub)),
            c.getField("ce"))).as("dtab"))
    val adist = (0 until m).map(j =>
      element_at(col("dtab"), lit(j * ksub) + element_at(col("codes"), j + 1) + 1))
      .reduceLeft(_ + _)
    val scanned = codes.crossJoin(broadcast(q))
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col("q_id"))
     else scanned)
      .select(col("q_id"), col("vec_id"), adist.as("adist"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("adist").asc, col("vec_id").asc)))
      .filter(col("rk") <= k)
  }

  /** Residual of each vector against its assigned coarse centroid —
    * the encoding input for IVFADC with residuals (Jégou TPAMI'11
    * §V.A: quantizing r(v) = v − c(cluster(v)) instead of v itself
    * concentrates the PQ codebooks on the WITHIN-cell distribution,
    * which is what the per-cell probe actually scans, and recovers
    * most of the accuracy raw-vector codes lose to coarse cell
    * spread). `member`/`centroids` are [[ivfIndex]] outputs; feed the
    * result to [[pqTrain]]/[[pqEncode]] and search with
    * `ivfpqSearch(..., residual = true)`. Elementwise arithmetic is
    * (double)v_i − c_i cast back to float (correctly-rounded in both
    * engines — the p42 oracle replays it). Output: (vec_id,
    * residual array&lt;float&gt;). */
  def pqResiduals(corpus: DataFrame, idCol: String, vecCol: String,
      member: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col(centroids.columns(0)).as("__cl"),
      transform(col(centroids.columns(1)), x => x.cast(DoubleType)).as("__ce"))
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .join(member.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .join(broadcast(cents), col("cluster") === col("__cl"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("__ce"),
          (a, b) => (a.cast(DoubleType) - b).cast(FloatType)).as("residual"))
  }

  /** Per-dimension [min, max] bounds for 8-bit SCALAR quantization
    * (FAISS's SQ8 / "uniform" scalar quantizer) — the simplest rung of
    * the compression ladder: 4× smaller than floats with far less
    * training than PQ (one bounds pass — no codebooks, no k-means).
    * One posexplode + per-dimension min/max agg: a `dim`-bounded
    * partial-agg shuffle (one row per (mapper, dimension)), any corpus
    * size. Output: (pos, mn, mx), `dim` rows — [[sqEncode]]/
    * [[sqSearch]]'s `bounds` input. */
  def sqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame =
    corpus.select(
        posexplode(dimChecked(col(vecCol), dim, "sq: vector")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Bounds table → one-row (mns, mxs) position-ordered arrays: the
    * broadcastable form the per-row encode/decode lambdas index. The
    * arrays are dimension-CHECKED here (once, on the single row): a
    * bounds table trained at a different dim would otherwise feed
    * out-of-range element_at lookups whose NULLs silently poison every
    * code and distance downstream (review r11). */
  private def sqBoundsRow(bounds: DataFrame, dim: Int): DataFrame = {
    def checked(c: Column) = when(size(c) === dim, c)
      .otherwise(raise_error(concat(
        lit("sq: bounds cover "), size(c).cast(StringType),
        lit(s" dimensions, expected $dim — train and encode/search must" +
          " use the same dim"))))
    bounds.agg(
      checked(transform(sort_array(collect_list(struct(col("pos"), col("mn")))),
        x => x.getField("mn"))).as("__mns"),
      checked(transform(sort_array(collect_list(struct(col("pos"), col("mx")))),
        x => x.getField("mx"))).as("__mxs"))
  }

  /** Per-row vector/codes length guard for the SQ lambdas — same
    * rationale as the bounds check; one size comparison per row. */
  private def dimChecked(c: Column, dim: Int, what: String): Column =
    when(size(c) === dim, c)
      .otherwise(raise_error(concat(
        lit(s"$what has "), size(c).cast(StringType),
        lit(s" dimensions, expected $dim"))))

  /** SQ8 encode: each dimension maps to an 8-bit level
    * round((x − mn)/(mx − mn) · 255), clamped to [0, 255] (new vectors
    * may exceed the training bounds); a degenerate dimension
    * (mx = mn) encodes 0. All arithmetic is explicit-double with one
    * HALF-UP round — both engines replay it bit-exactly. The bounds
    * collapse to one broadcast row, so encoding is a single map pass.
    * Output: (vec_id, codes array<int>). */
  def sqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      bounds: DataFrame, dim: Int): DataFrame =
    corpus.select(col(idCol).as("vec_id"),
        dimChecked(col(vecCol), dim, "sq: vector").as("embedding"))
      .crossJoin(broadcast(sqBoundsRow(bounds, dim)))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(dim)), i => {
          val x = element_at(col("embedding"), i).cast(DoubleType)
          val mn = element_at(col("__mns"), i).cast(DoubleType)
          val mx = element_at(col("__mxs"), i).cast(DoubleType)
          when(mx > mn,
            least(lit(255), greatest(lit(0),
              round((x - mn) / (mx - mn) * 255).cast(IntegerType))))
            .otherwise(0)
        }).as("codes"))

  /** SQ8 asymmetric search: queries keep full floats, the corpus scan
    * reads CODES and reconstructs each dimension INSIDE the distance
    * loop (mn + code/255 · (mx − mn) — the stored-at-rest compression
    * is the point; decode is register arithmetic, exactly FAISS's SQ
    * scan) via the fused [[graft.plans.SqAdist]] kernel: one codegen'd
    * pass per (vector, query), no intermediate decoded array, no
    * interpreted HOF in the hot loop — bit-identical to decode-then-
    * [[graft.plans.FloatDistSq]] (property-pinned in TextApiSpec).
    * Brute over the codes table — compose with an IVF membership
    * filter upstream to prune the scan, as [[ivfpqSearch]] does for
    * PQ. Query side broadcasts (retrieval contract). Output: (q_id,
    * vec_id, adist, rk ≤ k). */
  def sqSearch(codes: DataFrame, queries: DataFrame, bounds: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // query vectors are length-checked too: a wrong-dim query would
    // otherwise NULL every distance, and NULLS FIRST under ascending
    // rank silently returns k arbitrary vectors (review r11)
    val q = queries.select(col(idCol).as("q_id"),
      dimChecked(col(vecCol), dim, "sq: query vector").as("qe"))
    val joined = codes
      .withColumn("codes", dimChecked(col("codes"), dim, "sq: codes row"))
      .crossJoin(broadcast(sqBoundsRow(bounds, dim)))
      .crossJoin(broadcast(q))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    (if (excludeSelf) joined.filter(col("vec_id") =!= col("q_id"))
     else joined)
      .select(col("q_id"), col("vec_id"),
        call_function("sq_adist", col("qe"), col("codes"),
          col("__mns"), col("__mxs")).as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** IVF + SQ8 composed (the FAISS IVF-SQ shape — in practice the most
    * deployed compressed index: probe pruning × 4× scalar compression
    * without PQ's codebook training): each query probes its `nprobe`
    * best coarse cells exactly as [[ivfpqSearch]] does, then scans
    * ONLY those cells' members from the SQ codes table with the fused
    * decode-in-the-loop kernel ([[graft.plans.SqAdist]]) — the scan
    * covers ~nprobe/n_clusters of the corpus at a quarter of the
    * bytes per row. Inputs verbatim from the other operators:
    * `member`/`centroids` from [[ivfIndex]], `codes` from
    * [[sqEncode]], `bounds` from [[sqTrain]]. nprobe = n_clusters
    * degenerates to [[sqSearch]] over the whole corpus.
    * `residual = true` is FAISS's IVF-SQ DEFAULT (by_residual): codes
    * and bounds were trained on r(v) = v − c(cluster(v)) (feed
    * [[pqResiduals]] output to [[sqTrain]]/[[sqEncode]]), and each
    * probe's query side becomes q − c(probe) (same double-subtract →
    * float round-trip as [[ivfpqSearch]]'s residual path) so both ADC
    * sides sit in the probed cell's residual frame. Output:
    * (q_id, probe_label, vec_id, adist, rk ≤ k). */
  def ivfSqSearch(member: DataFrame, codes: DataFrame, queries: DataFrame,
      centroids: DataFrame, bounds: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      nprobe: Int = 1, excludeSelf: Boolean = true,
      residual: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // query vectors length-checked: a wrong-dim query NULLs every
    // distance and NULLS FIRST would silently return arbitrary
    // vectors (review r11)
    val sel = probeCells(queries, centroids, idCol, vecCol, nprobe,
      qe => dimChecked(qe, dim, "sq: query vector"),
      ce => dimChecked(ce, dim, "ivf: centroid vector"))
    val probes =
      (if (residual)
        sel.withColumn("qe", zip_with(col("qe"), col("me"),
          (a, b) => (a.cast(DoubleType) - b).cast(FloatType)))
      else sel)
        .select(col("q_id"), col("qe"), col("m_label").as("probe_label"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val scanned = codes
      .withColumn("codes", dimChecked(col("codes"), dim, "sq: codes row"))
      .join(member.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .join(broadcast(probes), col("cluster") === col("probe_label"))
      // bounds attach AFTER the probe pruning: the 2×dim-float arrays
      // would otherwise ride every corpus row through the member join
      // instead of only the ~nprobe/n_clusters survivors (review r11)
      .crossJoin(broadcast(sqBoundsRow(bounds, dim)))
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col("q_id"))
     else scanned)
      .select(col("q_id"), col("probe_label"), col("vec_id"),
        call_function("sq_adist", col("qe"), col("codes"),
          col("__mns"), col("__mxs")).as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** IVF + PQ composed (the FAISS-style IVFPQ shape, Jégou TPAMI'11
    * §V): each query probes its `nprobe` best coarse clusters against
    * the broadcast TRAINED centroid table ([[ivfIndex]] output), then
    * ADC-scores ONLY those clusters' members from the CODES table —
    * so the scan covers ~nprobe/n_clusters of the corpus AND touches
    * m ints per member instead of dim floats: the two scale levers
    * multiply. Inputs are the other operators' outputs verbatim:
    * `member`/`centroids` from [[ivfIndex]], `codes` from
    * [[pqEncode]], `codebooks` from [[pqTrain]]. Probe selection uses
    * squared euclidean distance to the coarse centroid (ascending —
    * the metric ADC ranks by), ties to the lowest cluster. Output:
    * (q_id, probe_label, vec_id, adist, rk ≤ k), ties to the lowest
    * vec_id. nprobe = n_clusters degenerates to [[pqSearch]] over the
    * whole corpus (property-tested in TextApiSpec). */
  def ivfpqSearch(member: DataFrame, codes: DataFrame, queries: DataFrame,
      centroids: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, m: Int, ksub: Int,
      nprobe: Int = 1, excludeSelf: Boolean = true,
      // true when `codes` came from [[pqResiduals]]-encoded vectors:
      // each probe's lookup table is then built on q − c(probe) so
      // both sides of the ADC sit in the same residual frame
      residual: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(m >= 1 && dim % m == 0,
      s"dim must divide into m subspaces, got dim=$dim m=$m")
    val sub = dim / m
    val flat = collectCodebookFlat(codebooks, m, ksub)
    def dtabOver(qv: Column): Column =
      transform(col("fl"), c =>
        call_function("float_dist_sq",
          slice(qv, c.getField("j") * sub + 1, lit(sub)),
          c.getField("ce")))
    // nprobe best coarse cells per query (parameter-bounded); centroid
    // dims validated like the query side (review r11)
    val sel = probeCells(queries, centroids, idCol, vecCol, nprobe,
      cCheck = ce => dimChecked(ce, dim, "ivf: centroid vector"))
    // the ADC lookup table: per (query, probe) in residual mode (qv =
    // q − c(probe) differs per probe), but ONCE PER QUERY otherwise —
    // the raw-vector table depends only on q, and building it per
    // probe would cost nprobe× the distance computations and carry
    // nprobe identical copies in the broadcast (review r10)
    val probes =
      if (residual)
        sel
          .withColumn("qv", zip_with(col("qe"), col("me"),
            (a, b) => (a.cast(DoubleType) - b).cast(FloatType)))
          .crossJoin(broadcast(flat))
          .select(col("q_id"), col("m_label").as("probe_label"),
            dtabOver(col("qv")).as("dtab"))
      else {
        val qtab = queries.select(col(idCol).as("q_id"), col(vecCol).as("qe"))
          .crossJoin(broadcast(flat))
          .select(col("q_id"), dtabOver(col("qe")).as("dtab"))
        sel.select(col("q_id"), col("m_label").as("probe_label"))
          .join(qtab, Seq("q_id"))
      }
    val adist = (0 until m).map(j =>
      element_at(col("dtab"), lit(j * ksub) + element_at(col("codes"), j + 1) + 1))
      .reduceLeft(_ + _)
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val scanned = codes
      .join(member.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .join(broadcast(probes), col("cluster") === col("probe_label"))
    (if (excludeSelf) scanned.filter(col("vec_id") =!= col("q_id"))
     else scanned)
      .select(col("q_id"), col("probe_label"), col("vec_id"),
        adist.as("adist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** IVF-PQ search with an exact re-rank (refine) stage — the FAISS
    * `IndexRefineFlat` serving shape (Jégou TPAMI'11 §V.C): the
    * compressed-domain ADC scan ([[ivfpqSearch]]) picks a candidate
    * pool of `k × cFactor` per query, then ONLY those candidates'
    * raw vectors are fetched and re-scored with the exact codegen'd
    * squared-euclidean fold, and the final top-k ranks on the exact
    * distance. This recovers most of the recall the lossy PQ codes
    * give up at the cost of `|Q| × k × cFactor` exact distances —
    * per-query constant, never corpus-shaped.
    *
    * Scale shape: the candidate set is parameter-bounded, so the
    * raw-vector fetch is `corpus ⋈ broadcast(candidates)` — ONE
    * map-side pass over the corpus with no shuffle; the re-rank
    * window partitions the tiny candidate frame only. The corpus
    * never shuffles and nothing quadratic exists.
    *
    * `corpus` is the RAW vector table the codes were encoded from
    * (`idCol`/`vecCol` name its columns); the other inputs are
    * [[ivfpqSearch]]'s verbatim. Ties rank to the lowest vec_id at
    * both stages. Output: (q_id, vec_id, adist, edist, rk ≤ k). */
  def ivfPqSearchRefined(member: DataFrame, codes: DataFrame,
      queries: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, m: Int, ksub: Int,
      nprobe: Int = 1, cFactor: Int = 4, excludeSelf: Boolean = true,
      residual: Boolean = false): DataFrame = {
    require(cFactor >= 1, s"cFactor must be >= 1, got $cFactor")
    val cand = ivfpqSearch(member, codes, queries, centroids, codebooks,
      idCol, vecCol, k * cFactor, dim, m, ksub, nprobe, excludeSelf,
      residual)
      .select(col("q_id"), col("vec_id"), col("adist"))
    // attach the query vector to each candidate (both sides are
    // parameter-bounded: |Q| and |Q|·k·cFactor rows)
    val qs = queries.select(col(idCol).as("q_id"),
      dimChecked(col(vecCol), dim, "refine: query vector").as("qe"))
    val cq = cand.join(broadcast(qs), Seq("q_id"))
    // ONE corpus pass: broadcast the candidate set into the raw-vector
    // scan (never the reverse — the corpus side is the 100 TB side)
    val raw = corpus.select(col(idCol).as("vec_id"),
      transform(dimChecked(col(vecCol), dim, "refine: corpus vector"),
        x => x.cast(DoubleType)).as("ve"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("edist").asc, col("vec_id").asc)
    raw.join(broadcast(cq), Seq("vec_id"))
      .select(col("q_id"), col("vec_id"), col("adist"),
        call_function("float_dist_sq", col("qe"), col("ve")).as("edist"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** The nprobe best coarse cells per query — the probe-selection
    * block [[ivfpqSearch]] and [[ivfSqSearch]] share: positional
    * (cluster, vector) centroids cast to double, broadcast against the
    * query side, squared-euclidean ranking with ties to the lowest
    * cluster. `qCheck` lets a caller wrap the query vector in a
    * validation column. Output keeps (q_id, qe, me, m_label) for the
    * residual path. `cCheck` validates the centroid vectors the same
    * way — a wrong-dim centroid table otherwise NULLs every probe
    * distance and the NULLS-FIRST rank silently picks arbitrary cells
    * (review r11). */
  private def probeCells(queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, nprobe: Int,
      qCheck: Column => Column = identity,
      cCheck: Column => Column = identity): DataFrame = {
    val cents = centroids.select(col(centroids.columns(0)).as("m_label"),
      transform(cCheck(col(centroids.columns(1))),
        x => x.cast(DoubleType)).as("me"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("m_d2").asc, col("m_label").asc)
    queries.select(col(idCol).as("q_id"), qCheck(col(vecCol)).as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("m_d2", call_function("float_dist_sq", col("qe"), col("me")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nprobe)
  }

  /** Collect + validate the parameter-sized codebook ONCE and return
    * the one-row `(fl array<struct<j,code,ce>>)` lookup frame as a
    * LOCAL relation — shared by [[pqSearch]]/[[ivfpqSearch]]. The
    * completeness gate exists because the ADC lookup index is
    * arithmetic (j·ksub + code): a dropped empty-cluster code would
    * silently misalign every distance. Building `fl` from the
    * collected rows (not from the codebooks frame) matters when the
    * caller did not persist the codebooks: their lineage is m corpus-
    * pass k-means fits, and the old validate-then-re-aggregate shape
    * evaluated it twice (review r10). */
  private def collectCodebookFlat(codebooks: DataFrame, m: Int, ksub: Int)
      : DataFrame = {
    val rows = codebooks
      .select(col("j").cast(IntegerType), col("code").cast(IntegerType),
        transform(col("ce"), x => x.cast(DoubleType)).as("ce"))
      .collect()
    val present = rows.map(r => (r.getInt(0), r.getInt(1))).toSet
    val missing = (for {
      j <- 0 until m; c <- 0 until ksub
    } yield (j, c)).filterNot(present)
    require(missing.isEmpty,
      s"need a complete m×ksub codebook; missing (j, code): " +
        s"${missing.take(8).mkString(", ")}")
    val schema = StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("ce", ArrayType(DoubleType))))
    codebooks.sparkSession
      .createDataFrame(java.util.Arrays.asList(
        rows.sortBy(r => (r.getInt(0), r.getInt(1))): _*), schema)
      .agg(sort_array(collect_list(struct(col("j"), col("code"), col("ce"))))
        .as("fl"))
  }

  /** Distributed Lloyd's k-means over ANY embedding corpus — the p21
    * plan as a reusable operator. Each iteration is the canonical
    * scalable shape: the k×dim centroid table collapses to ONE
    * broadcast row holding a k-struct array, assignment is a per-row
    * argmin fold inside the scan (zero shuffle; ties to the lowest
    * cluster id), and the update is ONE k-row groupBy carrying `dim`
    * partial-aggregated sums. Cross-engine determinism: elements are
    * scaled to exact integers (round(x·1e7)), summed exactly
    * (order-free), and the mean is one integer/integer double division
    * — centroids are bit-identical in Spark and DuckDB. Long sums hold
    * while cluster_size × 1e7·max|x| < 2^63 (~9e11 members at unit
    * norm); past that, widen the sums to DecimalType(38,0). Default
    * seeds are the k smallest-id vectors (TakeOrdered, no global
    * sort); pass seeding = "kmeans++" for the deterministic
    * D²-weighted spread ([[kmeansPlusPlusSeeds]]) real corpora want.
    * Output: (vec_id, cluster, d2, n_members). */
  def kmeansCluster(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 2,
      seeding: String = "min-id"): DataFrame = {
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    kmeansAssign(e, kmeansFit(corpus, idCol, vecCol, k, dim, iters, seeding))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cl"))))
      .select(col("vec_id"), col("cl").as("cluster"),
        col("d2"), col("n_members"))
  }

  /** Simplified-silhouette clustering quality report — the standard
    * O(n·k) surrogate for the O(n²) silhouette (Hruschka et al. 2004;
    * scikit-learn calls the full version `silhouette_score`): per
    * point, a = distance to its OWN centroid and b = distance to the
    * nearest OTHER centroid, s = (b − a) / max(a, b). Because the
    * assignment IS the argmin, b is simply the second-smallest
    * centroid distance, so one broadcast fold per row tracks (best,
    * best cluster, second-best) — the [[kmeansAssign]] fold with one
    * extra slot, zero extra passes, zero shuffle beyond the final
    * k-row groupBy. That is what makes the metric usable for k sweeps
    * at 100 TB where true silhouette's all-pairs is off the table.
    *
    * Cross-engine determinism: sqrt and the (b−a)/b division are
    * correctly-rounded IEEE ops; the per-point score is quantized to
    * an exact integer (round(s·1e7)) BEFORE the cluster mean, so the
    * sum is order-free and the mean is one integer/integer double
    * division — the same stance as the centroid update. Ties in the
    * two-min fold resolve exactly like `ROW_NUMBER() OVER (ORDER BY
    * d2, cl)` ranks 1 and 2 (strict < keeps the earlier centroid).
    * Output: (cluster, n_members, sum_sil_q7, mean_sil_q7), one row
    * per cluster. */
  def silhouetteReport(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 2,
      seeding: String = "min-id"): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2 (b = nearest OTHER centroid), got $k")
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val cents = kmeansFit(corpus, idCol, vecCol, k, dim, iters, seeding)
    // ≥ 2 SURVIVING centroids, not just ≥ 2 requested: Lloyd's can
    // empty clusters (identical seeds, degenerate data), and with one
    // survivor the fold's second-min slot stays Double.MaxValue — b ≈
    // 1.3e154, s ≈ 1.0 for every point, i.e. a silent PERFECT score
    // for a clustering that never happened (review r18)
    val cArr = cents
      .agg(sort_array(collect_list(struct(col("cl"), col("ce")))).as("cs"))
      .select(when(size(col("cs")) >= 2, col("cs"))
        .otherwise(raise_error(concat(lit(
          "silhouetteReport: needs >= 2 surviving centroids " +
            "(b = nearest OTHER centroid), got "),
          size(col("cs")).cast(StringType))))
        .as("cs"))
    val mins = e.crossJoin(broadcast(cArr))
      .withColumn("m", aggregate(col("cs"),
        struct(lit(Double.MaxValue).as("d1"), lit(-1).as("cl"),
          lit(Double.MaxValue).as("db")),
        (acc, c) => {
          val d = call_function("float_dist_sq", col("embedding"),
            c.getField("ce"))
          when(d < acc.getField("d1"),
            struct(d.as("d1"), c.getField("cl").as("cl"),
              acc.getField("d1").as("db")))
            .when(d < acc.getField("db"),
              struct(acc.getField("d1").as("d1"), acc.getField("cl").as("cl"),
                d.as("db")))
            .otherwise(acc)
        }))
      .select(col("m.cl").as("cl"),
        sqrt(col("m.d1")).as("a"), sqrt(col("m.db")).as("b"))
    mins
      .withColumn("sq",
        round(when(col("b") > 0.0, (col("b") - col("a")) / col("b"))
          .otherwise(lit(0.0)) * IntScale.toDouble).cast(LongType))
      .groupBy(col("cl"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("sq")).as("sum_sil_q7"))
      .select(col("cl").as("cluster"), col("n_members"), col("sum_sil_q7"),
        (col("sum_sil_q7").cast(DoubleType) / col("n_members"))
          .as("mean_sil_q7"))
  }

  /** Default within-cluster pair-work bound for [[semDedup]]: clusters
    * past this size are salted into sub-blocks (see the semDedup doc).
    * 100k members ≈ 5·10⁹ cosine pairs per worst-case block — hours of
    * one executor's work, the loud end of acceptable; the paper's own
    * k ≈ n/5000 sizing keeps honest clusterings far below it. */
  val SemDedupClusterCap: Int = 100000

  /** Deterministic md5-derived sub-block salt in [0, nSub): the
    * RNG-free hash-salt used to subdivide oversized clusters. Exposed
    * package-private so specs can compute expected block membership
    * with the engine's own arithmetic. */
  private[graft] def subClusterSalt(id: Column, nSub: Column): Column =
    pmod(conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType), nSub.cast(LongType)).cast(IntegerType)

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication", arXiv:2303.09540):
    * semantic near-duplicate REMOVAL over an embedding column —
    * cluster with k-means, search for duplicates only WITHIN each
    * cluster (cosine ≥ `tau`), and keep exactly one representative
    * per duplicate group: the member FARTHEST from its centroid (the
    * paper keeps the item with the lowest centroid similarity — for
    * unit-norm embeddings max squared euclidean distance is the same
    * ordering, and `d2` is already computed by the assignment pass),
    * ties to the lowest id.
    *
    * 100 TB stance: the clustering IS the blocking — the only pairing
    * work is a self-join shuffled on the cluster key, quadratic in
    * CLUSTER size, never in corpus size; that is the paper's own
    * contract (choose k ≈ n / desired-cluster-size — they run k=110k
    * over 5B embeddings). Duplicate groups close under transitivity
    * via [[connectedComponents]] (pointer-jumping, O(log d) rounds),
    * and the final prune is one anti-join against the (dup-bounded)
    * non-representative set, the [[collapseByComponents]] shape.
    * Everything downstream of the fit reuses the ONE assignment pass
    * (cluster id, d2 and the squared norm travel together through the
    * self-join — no second scan, no re-assignment).
    *
    * Determinism: centroids are the integer-scaled exact means of
    * [[kmeansFit]] (min-id seeding — the frozen p21 oracle contract),
    * cosines are sequential double folds ([[graft.plans.FloatDotProduct]])
    * over exact IEEE division, so the ≥ `tau` gate and the d2
    * representative ordering are bit-identical across engines.
    * Output: the SURVIVING rows (vec_id, cluster, d2).
    *
    * Degenerate-clustering guard: the only data-dependent quadratic
    * here is the within-cluster self-join, and a skewed fit (one
    * mega-cluster swallowing the corpus) would silently turn it
    * all-pairs. Clusters larger than `clusterCap` are subdivided by a
    * deterministic md5 salt on the id into ⌈n/cap⌉ sub-blocks and
    * pairs form only WITHIN a sub-block, so per-block work is bounded
    * by cap² regardless of how badly the clustering went. Semantics
    * under the cap (documented, the [[graft.operators.DedupOps]]
    * LshBucketCap keep-side stance): duplicates whose members land in
    * different sub-blocks of an OVERSIZED cluster are missed — the
    * survivor set can only grow, never lose a vector that the uncapped
    * run would have kept (the uncapped representative of a group is
    * still its own sub-group's representative). Normal-sized clusters
    * (n ≤ cap) are bit-identical to the uncapped path. */
  /** The trained-clustering artifact half of [[semDedup]]:
    * (vec_id, cl, d2, embedding, n2), localCheckpoint-materialized —
    * the assignment feeds four plan arms (both pair sides, the
    * representative's d2 join, the final anti-join), so without
    * truncation each arm would re-run the whole fit+assign chain
    * (same lineage stance as [[connectedComponents]]; swap for a
    * reliable checkpoint dir on a real cluster). Factored out so
    * train-once/serve-many callers cluster ONCE and dedup per τ —
    * the paper's own lifecycle, and the [[sharedIvfPq]] amortization
    * stance applied to SemDeDup. */
  def semDedupAssign(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 2): DataFrame =
    kmeansAssign(
      vecs.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
      kmeansFit(vecs, idCol, vecCol, k, dim, iters))
      .withColumn("n2", dot(col("embedding"), col("embedding")))
      .localCheckpoint()

  private final class SemAssignEntry(val assigned: DataFrame)
    extends PinnedEntry

  private val semAssignMemo = new KeyedMemo[SemAssignEntry](2,
    e => releaseLocalCheckpoint(e.assigned, blocking = true))

  /** Memoized [[semDedupAssign]] at the p66 fixture parameters
    * (k = 16, dim = 64, min-id 2-iter — the frozen oracle contract):
    * the gate sweep prices the SERVE half (pairing, components,
    * prune), the one-time fit amortizes into the memo build — the p42
    * precedent. Same cap/eviction lifecycle as [[sharedIvfPq]]. */
  private[graft] def sharedSemDedupAssign(s: SparkSession,
      d: String): DataFrame =
    semAssignMemo.getOrBuild(memoKey(s, d), pin = false)(
      new SemAssignEntry(semDedupAssign(T.embeddings(s, d), "vec_id",
        "embedding", k = 16, dim = 64))).assigned

  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, tau: Double, iters: Int = 2,
      clusterCap: Int = SemDedupClusterCap,
      // a PRECOMPUTED [[semDedupAssign]] artifact — pass it to serve
      // many dedup runs (τ sweeps, repeated audits) from one fit; the
      // caller owns its release
      assigned: Option[DataFrame] = None): DataFrame = {
    require(clusterCap >= 2,
      s"semDedup: clusterCap must be >= 2, got $clusterCap")
    val assignedDf = assigned.getOrElse(
      semDedupAssign(vecs, idCol, vecCol, k, dim, iters))
    // the clusterCap guard: cluster sizes are a ≤ k-row broadcast;
    // an oversized cluster's members are salted into ⌈n/cap⌉
    // sub-blocks (md5-derived — deterministic, RNG-free), normal
    // clusters keep sub-block 0 so their plan arm is unchanged
    val sizes = assignedDf.groupBy(col("cl")).agg(count(lit(1)).as("__n"))
    val blocked = assignedDf.join(broadcast(sizes), Seq("cl"))
      .withColumn("__sub",
        when(col("__n") <= clusterCap, lit(0)).otherwise(
          subClusterSalt(col("vec_id"),
            ceil(col("__n") / lit(clusterCap.toDouble)).cast(IntegerType))))
    // the ONLY pairing shuffle: both sides hash-partitioned on the
    // (cluster, sub-block) key; va < vb halves the work and orients
    // every pair. √n2 is hoisted BELOW the join (one sqrt per row,
    // map-side, riding the assign frame's n2) so the per-pair kernel
    // is one dot product + one multiply + one divide — sqrt of the
    // same double per pair gave bit-identical cos_sim, just recomputed
    // pair-many times (r20; guide §1.2 per-task work).
    val a = blocked.select(col("cl"), col("__sub"), col("vec_id").as("va"),
      col("embedding").as("ea"), sqrt(col("n2")).as("__sna"))
    val b = blocked.select(col("cl"), col("__sub"), col("vec_id").as("vb"),
      col("embedding").as("eb"), sqrt(col("n2")).as("__snb"))
    val pairs = a.join(b, Seq("cl", "__sub"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        (dot(col("ea"), col("eb")) / (col("__sna") * col("__snb")))
          .as("cos_sim"))
      .filter(col("cos_sim") >= tau)
    // duplicate groups are transitive closures WITHIN a cluster (pairs
    // never cross clusters, so components cannot either)
    val comps = connectedComponents(pairs.select(col("va"), col("vb")))
    val drop = comps
      .join(assignedDf.select(col("vec_id").as("node"), col("d2")), Seq("node"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("d2").desc, col("node").asc)))
      .filter(col("__rk") > 1)
      .select(col("node").as("vec_id"))
    assignedDf.join(drop, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cl").as("cluster"), col("d2"))
  }

  /** The TRAINED quantizer behind [[kmeansCluster]]: Lloyd's
    * iterations only, returning the final centroid table
    * (cl int, ce array&lt;double&gt;) — the shape [[ivfSearch]] accepts
    * as `centroids` for trained-quantizer probe selection:
    * {{{
    * val cents  = kmeansFit(corpus, "id", "vec", k = 256, dim = 64)
    * val member = kmeansCluster(corpus, "id", "vec", k = 256, dim = 64)
    * val hits   = ivfSearch(corpus.join(member.select("vec_id", "cluster"),
    *   corpus("id") === member("vec_id")), queries, "id", "vec",
    *   "cluster", k = 10, nprobe = 8, centroids = Some(cents))
    * }}}
    * Same determinism contract as [[kmeansCluster]] (integer-scaled
    * exact sums, ties to the lowest cluster id). */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int = 2,
      seeding: String = "min-id",
      // kmeans|| sampling rounds (each is two driver-synchronized
      // corpus passes — ≈5 suffices per the paper; fewer trades seed
      // spread for latency). Ignored by the other seedings.
      seedRounds: Int = 5): DataFrame = {
    val Scale = IntScale
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    val init = seeding match {
      case "min-id" =>
        e.orderBy(col("vec_id")).limit(k)
          .select((row_number().over(Window.orderBy(col("vec_id"))) - 1)
            .cast(IntegerType).as("cl"),
            transform(col("embedding"), x => x.cast(DoubleType)).as("ce"))
      // the spread seeding real corpora want (see [[kmeansPlusPlusSeeds]]):
      // min-id stays the DEFAULT only because it is the frozen contract
      // of the p21 oracle and of any caller relying on reproducible
      // seeds across library versions — new trained-quantizer fits
      // should pass "kmeans++"
      case "kmeans++" =>
        kmeansPlusPlusSeeds(corpus, idCol, vecCol, k, dim)
          .select(col("cl"), col("ce"))
      // the O(rounds)-pass seeding for IVF-scale k — see
      // [[kmeansParallelSeeds]]; k-means++ proper is k−1 passes
      case "kmeans||" =>
        kmeansParallelSeeds(corpus, idCol, vecCol, k, dim, seedRounds)
          .select(col("cl"), col("ce"))
      case other => throw new IllegalArgumentException(
        s"seeding must be 'min-id', 'kmeans++', or 'kmeans||', got '$other'")
    }
    def update(asg: DataFrame): DataFrame = {
      val sums = (0 until dim).map(i =>
        sum(round(element_at(col("embedding"), i + 1).cast(DoubleType)
          * Scale).cast(LongType)).as(s"s$i"))
      asg.groupBy(col("cl"))
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .select(col("cl"), array((0 until dim).map(i =>
          col(s"s$i").cast(DoubleType) /
            (col("cnt") * Scale).cast(DoubleType)): _*).as("ce"))
    }
    var cents = init
    var it = 0
    while (it < iters) { cents = update(kmeansAssign(e, cents)); it += 1 }
    cents
  }

  /** Deterministic k-means++ seed selection (Arthur & Vassilvitskii,
    * SODA'07): after an initial anchor, each next seed is drawn
    * D²-WEIGHTED — probability proportional to the squared distance to
    * the nearest already-chosen seed — which is what gives k-means++
    * its O(log k)-competitive SSE guarantee and, practically, spreads
    * seeds across the data's real clusters where min-id seeding can
    * land every seed in one blob. The draw is RNG-FREE like p15's
    * membership hashing, so fits are reproducible across runs AND
    * engines: d² is integer-scaled EXACTLY like the centroid sums
    * (`round(d2·1e7)` — cross-engine-stable on the same grounds), each
    * point owns the half-open interval `(cum−w, cum]` of the integer
    * prefix-sum over a fixed total order, and round j picks the unique
    * interval containing `md5("kmppt:j") mod total` — exact integer
    * arithmetic end to end, no transcendentals whose libm rounding
    * could flip an argmax between engines.
    *
    * Scale shape (100 TB): the prefix sum is TWO-PHASE — points are
    * hash-bucketed (`buckets` keys; the bucket id is part of the fixed
    * total order (b, id), so any bucket count gives a valid order), a
    * `groupBy(b)` computes per-bucket sums, a window over the
    * `buckets`-row bucket table (the only single-partition step —
    * bounded by the parameter, not the data) turns them into bucket
    * offsets, and the within-bucket cumulative sum runs partitioned by
    * bucket. Each of the k−1 rounds updates d² incrementally against
    * ONLY the newest seed (`d² ← min(d², dist²(x, c_new))` — Lloyd's
    * standard trick, one narrow map per round, localCheckpoint'ed so
    * round j's plan never re-derives rounds 1..j−1) and collects
    * exactly one (id, vector) row to the driver — k·dim doubles total,
    * bounded by parameters like the IVF medoid collect, never by data.
    *
    * Output: (cl int — selection order, vec_id — the seed row's id,
    * ce array&lt;double&gt;) — drop `vec_id` and it is [[kmeansFit]]'s
    * centroid shape. Duplicate points of an already-chosen seed have
    * d² = 0 (an empty interval) and can never be re-picked; if the
    * corpus runs out of distinct points (total mass 0) the seed list
    * is returned SHORT — [[kmeansAssign]] handles any centroid count.
    * Driver-gated by p35 against a DuckDB replay of the same integer
    * selection. */
  def kmeansPlusPlusSeeds(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = corpus.sparkSession
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    def dist2(q: Column, c: Column): Column =
      call_function("float_dist_sq", q, c)
    def seedLit(s: Seq[Double]): Column = array(s.map(lit(_)): _*)
    def collectSeed(df: DataFrame): Array[org.apache.spark.sql.Row] = df
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("ce"))
      .collect()
    // anchor seed = the smallest id: k-means++ leaves the first seed
    // uniform-random; any fixed choice keeps the D² structure of the
    // remaining draws (and min-id matches the legacy seeding's anchor)
    val first = collectSeed(e.orderBy(col("vec_id")).limit(1))
    require(first.nonEmpty, "kmeansPlusPlusSeeds: empty corpus")
    // free superseded rounds as we go: without the release, every
    // round's corpus-sized checkpoint blocks survive until GC — k−1
    // live copies at 100 TB instead of ~2
    var seeds = Vector((first(0).get(0), first(0).getSeq[Double](1)))
    var state = e
      .withColumn("d2", dist2(col("embedding"), seedLit(seeds.head._2)))
      .localCheckpoint()
    var j = 1
    var exhausted = false
    while (j < k && !exhausted) {
      val w = state
        .withColumn("w", round(col("d2") * IntScale).cast(LongType))
        .withColumn("b", call_function("md5_prefix_long",
          concat(lit("kmppb:"), col("vec_id").cast(StringType)), lit(4))
          % buckets)
      val bSums = w.groupBy(col("b")).agg(sum(col("w")).as("bw"))
      val offs = bSums.select(col("b"),
        coalesce(sum(col("bw")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
      // total mass + this round's hashed threshold, in-plan (1 row);
      // the tot > 0 filter runs BEFORE pmod so an exhausted corpus
      // yields an empty frame instead of an ANSI divide-by-zero
      val tRow = bSums.agg(sum(col("bw")).as("tot"))
        .filter(col("tot") > 0)
        .select(pmod(call_function("md5_prefix_long",
          lit(s"kmppt:$j"), lit(7)), col("tot")).as("t"))
      val picked = w.join(offs, Seq("b"))
        .withColumn("cum", col("off") + sum(col("w")).over(
          Window.partitionBy(col("b")).orderBy(col("vec_id"))))
        .crossJoin(broadcast(tRow))
        .filter(col("cum") > col("t") && col("cum") - col("w") <= col("t"))
      val rows = collectSeed(picked)
      if (rows.isEmpty) exhausted = true
      else {
        seeds = seeds :+ ((rows(0).get(0), rows(0).getSeq[Double](1)))
        val next = state.withColumn("d2",
          least(col("d2"), dist2(col("embedding"), seedLit(seeds.last._2))))
          .localCheckpoint()
        releaseLocalCheckpoint(state)
        state = next
      }
      j += 1
    }
    releaseLocalCheckpoint(state) // nothing reads state past the loop
    val idType = e.schema("vec_id").dataType
    val schema = StructType(Seq(
      StructField("cl", IntegerType, nullable = false),
      StructField("vec_id", idType),
      StructField("ce", ArrayType(DoubleType))))
    val out = seeds.zipWithIndex.map { case ((id, ce), i) =>
      org.apache.spark.sql.Row(i, id, ce) }
    spark.createDataFrame(java.util.Arrays.asList(out: _*), schema)
  }

  /** Scalable k-means‖ seeding (Bahmani et al., "Scalable k-means++",
    * VLDB'12) — the 100 TB path [[kmeansPlusPlusSeeds]] is not:
    * k-means++ proper is k−1 SEQUENTIAL corpus passes (each draw
    * depends on the previous seed), which at IVF-scale k (hundreds of
    * centroids) means hundreds of full scans. k-means‖ replaces them
    * with `rounds` passes (≈5 suffices per the paper): each round
    * Bernoulli-samples every point INDEPENDENTLY with probability
    * min(1, l·d²/Σd²) — expected ≤ `oversample` = l candidates per
    * round, in ONE map over the corpus — then the ≤ l·rounds+1
    * collected candidates are weighted by how many corpus points each
    * one is nearest to (one more pass) and reduced to k seeds by
    * weighted k-means++ ON THE DRIVER, where the candidate set is
    * tiny. Total: 2·rounds+2 corpus passes, independent of k.
    *
    * Determinism: RNG-free like [[kmeansPlusPlusSeeds]] — the
    * Bernoulli draw compares a per-(point, round) md5 56-bit uniform
    * against l·w/Σw over the integer-scaled d² weights, candidates are
    * collected in vec_id order, and the driver-side weighted k-means++
    * replays the same integer-interval pick (BigInt-exact mass
    * arithmetic) with md5 round thresholds — the same corpus always
    * yields the same seeds. The anchor seed is the min-id point, as in
    * [[kmeansPlusPlusSeeds]].
    *
    * Output: (cl int — selection order, vec_id, ce array&lt;double&gt;),
    * the [[kmeansFit]] centroid shape with `vec_id` extra; SHORT when
    * the corpus has fewer than k distinct points. Driver memory is
    * bounded by the candidate count (≈ l·rounds vectors), a parameter
    * — never by the data. */
  def kmeansParallelSeeds(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, rounds: Int = 5, oversample: Double = -1)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(oversample == -1 || oversample > 0,
      s"oversample must be positive (or -1 for the 2k default), got $oversample")
    val l = if (oversample > 0) oversample else 2.0 * k
    val spark = corpus.sparkSession
    val e = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
    def dist2(q: Column, c: Column): Column =
      call_function("float_dist_sq", q, c)
    def seedLit(s: Seq[Double]): Column = array(s.map(lit(_)): _*)
    def asCand(df: DataFrame) = df
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("ce"))
    val first = asCand(e.orderBy(col("vec_id")).limit(1)).collect()
    require(first.nonEmpty, "kmeansParallelSeeds: empty corpus")
    var cands = Vector((first(0).get(0), first(0).getSeq[Double](1)))
    var state = e
      .withColumn("d2", dist2(col("embedding"), seedLit(cands.head._2)))
      .localCheckpoint()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val w = state
        .withColumn("w", round(col("d2") * IntScale).cast(LongType))
      val totRow = w.agg(sum(col("w"))).collect()(0)
      val tot = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
      if (tot == 0L) exhausted = true // every point duplicates a candidate
      else {
        // Bernoulli(min(1, l·w/tot)) per point: u56/2^56 < l·w/tot.
        // IEEE double division/multiplication are correctly rounded, so
        // the comparison is reproducible; candidates collect in vec_id
        // order so the driver-side ordering is too.
        val sampled = asCand(w.filter(
            call_function("md5_prefix_long",
              concat(lit(s"kmpar:$r:"), col("vec_id").cast(StringType)),
              lit(7)).cast(DoubleType) / lit(math.pow(2.0, 56)) <
              lit(l) * col("w").cast(DoubleType) / lit(tot.toDouble))
            .orderBy(col("vec_id")))
          .collect()
        if (sampled.nonEmpty) {
          val newC = sampled.map(row =>
            (row.get(0), row.getSeq[Double](1))).toVector
          cands = cands ++ newC
          // incremental d² against ONLY this round's candidates, as a
          // broadcast fold over one collected array column — the
          // expression tree stays O(1) regardless of sample size (a
          // per-candidate least() chain would grow with l and fall out
          // of codegen at IVF-scale oversampling)
          val newLits = array(newC.map(c => seedLit(c._2)): _*)
          val next = state
            .withColumn("d2", aggregate(newLits, col("d2"),
              (acc, c) => least(acc, dist2(col("embedding"), c))))
            .localCheckpoint()
          releaseLocalCheckpoint(state) // free the superseded round
          state = next
        }
        r += 1
      }
    }
    releaseLocalCheckpoint(state) // weighting reads e, not state
    // weight candidates by nearest-point counts (ties → lowest index,
    // [[kmeansAssign]]'s contract), then reduce to k on the driver
    val idType = e.schema("vec_id").dataType
    val candSchema = StructType(Seq(
      StructField("cl", IntegerType, nullable = false),
      StructField("vec_id", idType),
      StructField("ce", ArrayType(DoubleType))))
    val candRows = cands.zipWithIndex.map { case ((id, ce), i) =>
      org.apache.spark.sql.Row(i, id, ce) }
    val candDf = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*), candSchema)
    val wt = kmeansAssign(e, candDf.select(col("cl"), col("ce")))
      .groupBy(col("cl")).agg(count(lit(1)).as("wt"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    // driver-side weighted k-means++ over the candidate set: exact
    // BigInt mass intervals in candidate order, md5 pick per round —
    // the in-memory twin of the distributed draw in
    // [[kmeansPlusPlusSeeds]]
    def d2d(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        val d = a(i) - b(i); s += d * d; i += 1
      }
      s
    }
    def md5Mod(s: String, mod: BigInt): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      BigInt(1, d.take(7)).mod(mod)
    }
    val candVecs = cands.map(_._2)
    val minD2 = Array.tabulate(cands.size)(i => d2d(candVecs(i), candVecs.head))
    var picked = Vector(0)
    var j = 1
    var dry = false
    while (j < k && !dry) {
      val mass = minD2.zipWithIndex.map { case (d2v, i) =>
        BigInt(wt.getOrElse(i, 0L)) *
          BigInt(math.round(d2v * IntScale)) }
      val total = mass.sum
      if (total <= 0) dry = true
      else {
        val t = md5Mod(s"kmfin:$j", total)
        var cum = BigInt(0); var pick = -1; var i = 0
        while (pick < 0 && i < mass.length) {
          cum += mass(i)
          if (cum > t) pick = i
          i += 1
        }
        picked = picked :+ pick
        var m = 0
        while (m < minD2.length) {
          val d = d2d(candVecs(m), candVecs(pick))
          if (d < minD2(m)) minD2(m) = d
          m += 1
        }
      }
      j += 1
    }
    val out = picked.zipWithIndex.map { case (ci, i) =>
      org.apache.spark.sql.Row(i, cands(ci)._1, cands(ci)._2) }
    spark.createDataFrame(java.util.Arrays.asList(out: _*), candSchema)
  }

  /** Assign ANY vectors to a TRAINED centroid table — the SERVING side
    * of [[ivfIndex]]: training assigns the corpus once, but arriving
    * vectors (a notebook batch, a `readStream`) need the same argmin
    * pass without refitting. Pure map-side — the k-row centroid table
    * collapses to one broadcast row and each vector folds an argmin
    * over it (codegen'd distance kernel, ties to the lowest cluster),
    * so the SAME call runs unchanged on a stream (stream-static
    * broadcast; StreamsSpec drives it). `centroids` is positional
    * (cluster, vector) — [[kmeansFit]]/[[ivfIndex]] output. Output:
    * (vec_id, embedding, cl, d2). */
  def assignToCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    kmeansAssign(
      vecs.select(col(idCol).as("vec_id"), col(vecCol).as("embedding")),
      centroids.select(col(centroids.columns(0)).as("cl"),
        col(centroids.columns(1)).as("ce")))

  /** One Lloyd's assignment pass: argmin distance against a broadcast
    * centroid row. `e` = (vec_id, embedding); `cents` = (cl, ce). */
  private[operators] def kmeansAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    // native codegen'd left-to-right fold — bit-identical to the
    // aggregate(zip_with(...)) HOF spelling and the oracle's
    // list_reduce, but inside whole-stage codegen (see FloatDistSq)
    def dist2(q: Column, c: Column): Column =
      call_function("float_dist_sq", q, c)
    // empty-centroid guard on the one broadcast row: an empty table
    // (an upstream filter gone wrong) would otherwise assign EVERY
    // vector the fold's sentinel (cl = -1, d2 = MaxValue) and no error
    // ever surfaces — downstream treats -1 as a real cluster
    // (review r11)
    val cArr = cents
      .agg(sort_array(collect_list(struct(col("cl"), col("ce")))).as("cs"))
      .select(when(size(col("cs")) > 0, col("cs"))
        .otherwise(raise_error(lit(
          "assignToCentroids: empty centroid table — nothing to assign to")))
        .as("cs"))
    e.crossJoin(broadcast(cArr))
      .withColumn("best", aggregate(col("cs"),
        struct(lit(Double.MaxValue).as("d2"), lit(-1).as("cl")),
        (acc, c) => {
          val d = dist2(col("embedding"), c.getField("ce"))
          // strict < keeps the first minimum; cs is sorted by cl,
          // so ties resolve to the lowest cluster id
          when(d < acc.getField("d2"),
            struct(d.as("d2"), c.getField("cl").as("cl")))
            .otherwise(acc)
        }))
      .select(col("vec_id"), col("embedding"),
        col("best.cl").as("cl"), col("best.d2").as("d2"))
  }

  // ---- k-means oracle-SQL builders — ONE copy of each replayed
  // fragment, shared by the seeding gates (p35/p36), the fit gates
  // (p21/p38) and the trained-IVF gate (p37), so the integer selection
  // / exact-sum machinery can never drift between gates. Every builder
  // emits WITH-clause bodies over an `e(vec_id, emb)` opening CTE.
  // State-carrying CTEs are AS MATERIALIZED: DuckDB inlines plain CTEs
  // per reference, so a round chain whose every stage reads its
  // predecessor ~3× would expand to 3^rounds parquet scans — at the
  // p37 depth (5 seeding rounds + Lloyd's + probe replay) that
  // exhausted the process fd limit ("Too many open files").
  // MATERIALIZED pins each stage to one evaluation; results are
  // unchanged (verified bit-exact against the unmaterialized p36).

  /** Sequential squared-distance fold as DuckDB SQL — the oracle twin
    * of [[graft.plans.FloatDistSq]]'s left-to-right double fold. Both
    * sides are cast per element (identity when already DOUBLE). */
  private[operators] def kmD2Sql(dim: Int, q: String, c: String): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
      s"(CAST($q[i] AS DOUBLE) - CAST($c[i] AS DOUBLE)) * " +
      s"(CAST($q[i] AS DOUBLE) - CAST($c[i] AS DOUBLE))), " +
      "(acc, x) -> acc + x)"

  /** Sequential dot-product fold — the [[graft.plans.FloatDotProduct]]
    * twin (per-element double casts, left-to-right accumulation). */
  private[operators] def kmDotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)"

  /** k-means++ D²-weighted seed selection ([[kmeansPlusPlusSeeds]]'
    * integer machinery) as a WITH body: opens `e`, anchors `s0` (min
    * id), and emits pick CTEs `p1..p{k-1}`, each carrying the chosen
    * (vec_id, emb). Replays, per round: d² to the nearest chosen seed,
    * round(d²·scale) integer weights, the two-phase (bucket, id)-
    * ordered prefix sum, and the md5 threshold pick. */
  private[operators] def kmppChainSql(k: Int, dim: Int): String = {
    val Scale = IntScale.toString
    def pick(j: Int): String = {
      val prev = if (j == 1) "d0" else s"d${j - 1}"
      s"""w$j AS MATERIALIZED (
         |  SELECT vec_id, emb, d2, CAST(ROUND(d2 * $Scale) AS BIGINT) AS w,
         |         CAST('0x' || substr(md5('kmppb:' || CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 4096 AS b
         |  FROM $prev),
         |bs$j AS (SELECT b, SUM(w) AS bw FROM w$j GROUP BY b),
         |off$j AS (
         |  SELECT b, COALESCE(SUM(bw) OVER (ORDER BY b
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM bs$j),
         |t$j AS (
         |  SELECT CAST('0x' || substr(md5('kmppt:$j'), 1, 14) AS BIGINT) % SUM(w) AS t
         |  FROM w$j),
         |cum$j AS (
         |  SELECT w$j.vec_id, w$j.emb, w$j.w,
         |         off$j.off + SUM(w$j.w) OVER (PARTITION BY w$j.b ORDER BY w$j.vec_id) AS cum
         |  FROM w$j JOIN off$j ON w$j.b = off$j.b),
         |p$j AS (
         |  SELECT c.vec_id, c.emb FROM cum$j c, t$j
         |  WHERE c.cum > t$j.t AND c.cum - c.w <= t$j.t),
         |d$j AS MATERIALIZED (
         |  SELECT d.vec_id, d.emb, LEAST(d.d2, ${kmD2Sql(dim, "d.emb", "p.emb")}) AS d2
         |  FROM $prev d CROSS JOIN p$j p)""".stripMargin
    }
    s"""e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
       |s0 AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 1),
       |d0 AS (
       |  SELECT e.vec_id, e.emb, ${kmD2Sql(dim, "e.emb", "s.emb")} AS d2
       |  FROM e CROSS JOIN s0 s),
       |${(1 until k).map(pick).mkString(",\n")}""".stripMargin
  }

  /** k-means‖ seeding ([[kmeansParallelSeeds]]) as a WITH body: opens
    * `e`, runs `rounds` Bernoulli sampling rounds (md5 56-bit uniform
    * vs l·w/Σw), weights candidates by nearest-point counts, and
    * replays the driver-side weighted k-means++ reduction — emitting
    * `s0` (the anchor) and pick CTEs `p1..p{k-1}` with (cl, vec_id,
    * emb). Oversample l = 2k, the Spark default. */
  private[operators] def kmparChainSql(k: Int, rounds: Int, dim: Int): String = {
    val Scale = IntScale.toString
    val L = s"${2.0 * k}" // oversample default 2k, exactly representable
    def rnd(r: Int): String =
      s"""w$r AS MATERIALIZED (
         |  SELECT vec_id, emb, d2, CAST(ROUND(d2 * $Scale) AS BIGINT) AS w
         |  FROM dr${r - 1}),
         |s$r AS MATERIALIZED (
         |  SELECT w$r.vec_id, w$r.emb FROM w$r,
         |       (SELECT CAST(SUM(w) AS DOUBLE) AS tot FROM w$r) t
         |  WHERE CAST(CAST('0x' || substr(md5('kmpar:$r:' || CAST(vec_id AS VARCHAR)), 1, 14) AS BIGINT) AS DOUBLE)
         |          / 72057594037927936.0
         |        < $L * CAST(w AS DOUBLE) / t.tot),
         |n$r AS (
         |  SELECT w$r.vec_id, MIN(${kmD2Sql(dim, s"w$r.emb", "s.emb")}) AS nd
         |  FROM w$r, s$r s GROUP BY w$r.vec_id),
         |dr$r AS MATERIALIZED (
         |  SELECT w$r.vec_id, w$r.emb, LEAST(w$r.d2, COALESCE(n$r.nd, w$r.d2)) AS d2
         |  FROM w$r LEFT JOIN n$r ON w$r.vec_id = n$r.vec_id)""".stripMargin
    def fin(j: Int): String = {
      val m = if (j == 1)
        s"""m1 AS (
           |  SELECT c.cl, c.vec_id, c.emb, ${kmD2Sql(dim, "c.emb", "a.emb")} AS md
           |  FROM cands c, (SELECT emb FROM cands WHERE cl = 0) a)""".stripMargin
      else
        s"""m$j AS (
           |  SELECT g${j - 1}.cl, g${j - 1}.vec_id, g${j - 1}.emb,
           |         LEAST(g${j - 1}.md, ${kmD2Sql(dim, s"g${j - 1}.emb", "p.emb")}) AS md
           |  FROM g${j - 1}, p${j - 1} p)""".stripMargin
      s"""$m,
         |g$j AS MATERIALIZED (
         |  SELECT m$j.cl, m$j.vec_id, m$j.emb, m$j.md,
         |         COALESCE(w.wt, 0) * CAST(ROUND(m$j.md * $Scale) AS BIGINT) AS mass
         |  FROM m$j LEFT JOIN wtab w ON m$j.cl = w.cl),
         |c$j AS (
         |  SELECT cl, vec_id, emb, mass, SUM(mass) OVER (ORDER BY cl) AS cum
         |  FROM g$j),
         |t${j}s AS (
         |  SELECT CAST('0x' || substr(md5('kmfin:$j'), 1, 14) AS BIGINT) % SUM(mass) AS t
         |  FROM g$j),
         |p$j AS MATERIALIZED (
         |  SELECT cl, vec_id, emb FROM c$j, t${j}s
         |  WHERE cum > t AND cum - mass <= t)""".stripMargin
    }
    s"""e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
       |s0 AS (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT 1),
       |dr0 AS MATERIALIZED (
       |  SELECT e.vec_id, e.emb, ${kmD2Sql(dim, "e.emb", "s.emb")} AS d2
       |  FROM e CROSS JOIN s0 s),
       |${(1 to rounds).map(rnd).mkString(",\n")},
       |cands AS MATERIALIZED (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rnd, vec_id) - 1 AS INT) AS cl,
       |         vec_id, emb
       |  FROM (SELECT 0 AS rnd, vec_id, emb FROM s0
       |${(1 to rounds).map(r => s"        UNION ALL SELECT $r, vec_id, emb FROM s$r").mkString("\n")}) u),
       |asg AS (
       |  SELECT e.vec_id, c.cl,
       |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${kmD2Sql(dim, "e.emb", "c.emb")}, c.cl) AS rk
       |  FROM e, cands c),
       |wtab AS MATERIALIZED (
       |  SELECT cl, CAST(COUNT(*) AS BIGINT) AS wt
       |  FROM asg WHERE rk = 1 GROUP BY cl),
       |${(1 until k).map(fin).mkString(",\n")}""".stripMargin
  }

  /** Squared distance of `q`'s subspace slice (1-based offset `off`)
    * against a `len`-length centroid — the float_dist_sq-over-a-slice
    * fold the PQ gates replay. */
  private[operators] def pqD2SubSql(len: Int, q: String, off: Int, c: String): String =
    s"list_reduce(list_transform(range(1, ${len + 1}), i -> " +
      s"(CAST($q[$off + i] AS DOUBLE) - CAST($c[i] AS DOUBLE)) * " +
      s"(CAST($q[$off + i] AS DOUBLE) - CAST($c[i] AS DOUBLE))), " +
      "(acc, x) -> acc + x)"

  /** One PQ subspace's full training chain ([[pqTrain]] at iters = 1 +
    * [[pqEncode]]'s assignment, shared by p40/p41): min-id seeds →
    * assign → integer-exact update → final code assignment, emitting
    * `cf_j` (the codebook) and `code_j` (vec_id → code). */
  private[operators] def pqSpaceSql(j: Int, sub: Int, ksub: Int,
      src: String = "e"): String = {
    val off = j * sub
    val Scale = IntScale.toString
    val sumCols = (1 to sub).map(i =>
      s"SUM(CAST(ROUND(CAST(emb[${off + i}] AS DOUBLE) * $Scale) AS BIGINT)) AS s$i")
      .mkString(", ")
    val meanList = (1 to sub).map(i =>
      s"CAST(s$i AS DOUBLE) / CAST(cnt * $Scale AS DOUBLE)").mkString(", ")
    s"""c0_$j AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
       |         list_transform(range(1, ${sub + 1}), i -> CAST(emb[$off + i] AS DOUBLE)) AS ce
       |  FROM $src QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= $ksub),
       |a_$j AS MATERIALIZED (
       |  SELECT s.vec_id, s.emb, c.code
       |  FROM $src s CROSS JOIN c0_$j c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${pqD2SubSql(sub, "s.emb", off, "c.ce")} ASC, c.code ASC) = 1),
       |u_$j AS (
       |  SELECT code, COUNT(*) AS cnt, $sumCols FROM a_$j GROUP BY code),
       |cf_$j AS MATERIALIZED (
       |  SELECT code, [$meanList] AS ce FROM u_$j),
       |code_$j AS MATERIALIZED (
       |  SELECT s.vec_id, c.code
       |  FROM $src s CROSS JOIN cf_$j c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${pqD2SubSql(sub, "s.emb", off, "c.ce")} ASC, c.code ASC) = 1)"""
      .stripMargin
  }

  /** The per-query ADC distance cells for subspace `j` (queries =
    * vec_id ≤ 4, the fixture query slice). */
  private[operators] def pqDtSql(j: Int, sub: Int): String =
    s"""dt_$j AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, c.code, ${pqD2SubSql(sub, "q.emb", j * sub, "c.ce")} AS d2
       |  FROM e q CROSS JOIN cf_$j c WHERE q.vec_id <= 4)""".stripMargin

  /** Seed rows (`s0` + `p1..p{k-1}`) folded into [[kmeansFit]]'s
    * centroid shape `(cl int, ce array<double>)` as CTE `c0`. */
  private[operators] def kmSeedCentroidsSql(k: Int): String =
    s"""c0 AS MATERIALIZED (
       |  SELECT CAST(scl AS INT) AS cl,
       |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM (SELECT 0 AS scl, emb FROM s0
       |${(1 until k).map(j => s"        UNION ALL SELECT $j, emb FROM p$j").mkString("\n")}) seeds)""".stripMargin

  /** One Lloyd's assignment CTE ([[kmeansAssign]]'s twin): argmin of
    * `src`(vec_id, emb) against `cents`(cl, ce), ties to the lowest
    * cl, emitting (vec_id, emb, cl, d2). */
  private[operators] def kmAssignSql(name: String, cents: String, dim: Int,
      src: String = "e"): String =
    s"""$name AS MATERIALIZED (
       |  SELECT s.vec_id, s.emb, c.cl, ${kmD2Sql(dim, "s.emb", "c.ce")} AS d2
       |  FROM $src s CROSS JOIN $cents c
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.vec_id
       |    ORDER BY ${kmD2Sql(dim, "s.emb", "c.ce")} ASC, c.cl ASC) = 1)""".stripMargin

  /** One Lloyd's centroid update ([[kmeansFit]]'s exact integer-sum
    * update): `from`(cl, emb) → `cname`(cl, ce) via `uname`. */
  private[operators] def kmUpdateSql(uname: String, cname: String, from: String,
      dim: Int): String = {
    val Scale = IntScale.toString
    val sumCols = (1 to dim).map(i =>
      s"SUM(CAST(ROUND(CAST(emb[$i] AS DOUBLE) * $Scale) AS BIGINT)) AS s$i")
      .mkString(", ")
    val meanList = (1 to dim).map(i =>
      s"CAST(s$i AS DOUBLE) / CAST(cnt * $Scale AS DOUBLE)").mkString(", ")
    s"""$uname AS (
       |  SELECT cl, COUNT(*) AS cnt, $sumCols FROM $from GROUP BY cl),
       |$cname AS MATERIALIZED (
       |  SELECT cl, [$meanList] AS ce FROM $uname)""".stripMargin
  }


  /** Exact corpus mean + covariance of an embedding column, as
    * upper-triangle (i, j, n, mean_i, mean_j, cov) rows — the moment
    * pass every linear embedding transform (PCA whitening, OPQ-style
    * rotation, mahalanobis outliers) trains on. Arithmetic follows the
    * engine's cross-engine stance: per-element products are IEEE
    * doubles, sums go through [[QueryDef.dsum]]'s decimal quantization,
    * and the derived mean/cov are rounded at 1e-9 — so DuckDB replays
    * every cell bit-for-bit (the p105 gate). Scale shape: the pair
    * fan-out is rows × dim(dim+1)/2 generated map-side by the
    * codegen'd `outer_upper` kernel (ONE generator over the packed
    * upper triangle, products multiplied in a tight double loop —
    * r16 replaced the original two-posexplode dim² fan-out; decimal
    * sums are order-independent so the rewrite changed the plan, not
    * one output bit, p105 re-verified), and the ONE data-sized shuffle
    * is the packed-position partial agg — map-side combine bounds it
    * at dim(dim+1)/2 rows per mapper (2,080 at dim 64) no matter the
    * corpus size, the same cells-per-mapper contract as the CMS/HLL
    * sketches; the (pos → i,j) decode and the per-dim mean sums join
    * back as parameter-sized broadcasts. Vectors that are NULL or off-`dim` are
    * excluded (loudly countable by the caller via a pre-filter). */
  def embeddingMeanCov(vecs: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 1024,
      s"dim must be in [1, 1024] (dim^2 cells must stay agg-state-sized), got $dim")
    val spark = vecs.sparkSession
    val base = vecs
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol).as("__v"))
    // per-dimension sums: one explode (dim rows/vec), dim group keys
    val dimSums = base
      .select(posexplode(col("__v")).as(Seq("d", "__x")))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"),
        graft.QueryDef.dsum(col("__x").cast(DoubleType)).as("__s"))
    // product sums: the codegen'd packed upper triangle — ONE generator
    // emitting dim(dim+1)/2 rows/vec (vs the 2-generator dim² fan-out),
    // products multiplied inside whole-stage codegen
    val prodSums = base
      .select(posexplode(call_function("outer_upper", col("__v")))
        .as(Seq("pos", "__p")))
      .groupBy(col("pos"))
      .agg(graft.QueryDef.dsum(col("__p")).as("__sij"))
    // packed-pos → (i, j): a parameter-sized literal index table,
    // broadcast onto the dim(dim+1)/2 aggregated cells
    import spark.implicits._
    val idx = broadcast(
      (for { i <- 0 until dim; j <- i until dim }
        yield (i * dim - i * (i - 1) / 2 + (j - i), i, j))
        .toDF("pos", "i", "j"))
    prodSums.join(idx, Seq("pos"))
      .join(broadcast(dimSums
        .select(col("d").as("i"), col("n"), col("__s").as("__si"))), Seq("i"))
      .join(broadcast(dimSums
        .select(col("d").as("j"), col("__s").as("__sj"))), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        round(col("__si") / col("n"), 9).as("mean_i"),
        round(col("__sj") / col("n"), 9).as("mean_j"),
        round((col("__sij") - col("__si") * col("__sj") / col("n"))
          / col("n"), 9).as("cov"))
  }

  /** PCA basis by deterministic power iteration with deflation over
    * [[embeddingMeanCov]]'s matrix — the FAISS PCAMatrix pre-transform
    * for the ANN ladder (project 64 -> d' before IVF/PQ; same purpose
    * as [[randomProject]] but data-adapted, capturing variance instead
    * of merely preserving distances). The covariance COLLECT is
    * dim(dim+1)/2 + nothing rows — parameter-bounded by the same hard
    * `dim <= 1024` require as the moment pass (at dim 1024 that is
    * ~525k tiny rows, a few MB); the eigensolve runs on the driver on
    * the dim x dim matrix, which is the correct locality for a
    * parameter-sized model (the kmeans++/vocab-collect stance), and
    * serving is map-side via [[pcaProject]]. Determinism: fixed start
    * vector (1, 2, ..., dim normalized), fixed iteration count, sign
    * fixed so the largest-magnitude entry is positive — two fits on
    * the same corpus are identical arrays. Output: (component,
    * eigenvalue, weights array<double>), components in descending
    * eigenvalue order. */
  def pcaFit(vecs: DataFrame, vecCol: String, dim: Int,
      nComponents: Int, iters: Int = 50): DataFrame = {
    require(nComponents >= 1 && nComponents <= dim,
      s"nComponents must be in [1, $dim], got $nComponents")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = vecs.sparkSession
    val cells = embeddingMeanCov(vecs, vecCol, dim)
      .select(col("i"), col("j"), col("cov")).collect()
    require(cells.nonEmpty, "pcaFit: no vectors of the declared dim")
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    val basis = Array.ofDim[Double](nComponents, dim)
    val eig = new Array[Double](nComponents)
    def dotv(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var d = 0; while (d < dim) { s += a(d) * b(d); d += 1 }; s
    }
    def matv(v: Array[Double]): Array[Double] =
      Array.tabulate(dim)(r => dotv(m(r), v))
    for (c <- 0 until nComponents) {
      var v = Array.tabulate(dim)(d => (d + 1).toDouble)
      var normalized = false
      var it = 0
      while (it < iters) {
        var w = matv(v)
        // deflate: remove the already-found components
        for (k <- 0 until c) {
          val pr = dotv(basis(k), w)
          var d = 0; while (d < dim) { w(d) -= pr * basis(k)(d); d += 1 }
        }
        val nrm = math.sqrt(dotv(w, w))
        if (nrm > 0) {
          var d = 0; while (d < dim) { w(d) /= nrm; d += 1 }
          v = w; normalized = true
        }
        it += 1
      }
      if (!normalized) {
        // rank-deficient tail: the deflated matrix annihilates every
        // iterate (e.g. a constant corpus, or nComponents > rank with
        // the residual cells rounded to exactly 0). The start vector is
        // NOT a usable component (un-normalized, duplicated across the
        // tail) — complete the basis deterministically instead:
        // Gram-Schmidt the standard basis against the found components
        // and take the first surviving direction, with eigenvalue 0.
        var e = 0
        var done = false
        while (e < dim && !done) {
          val cand = Array.tabulate(dim)(d => if (d == e) 1.0 else 0.0)
          for (k <- 0 until c) {
            val pr = dotv(basis(k), cand)
            var d = 0; while (d < dim) { cand(d) -= pr * basis(k)(d); d += 1 }
          }
          val nrm = math.sqrt(dotv(cand, cand))
          if (nrm > 1e-9) {
            var d = 0; while (d < dim) { cand(d) /= nrm; d += 1 }
            v = cand; done = true
          }
          e += 1
        }
        require(done, s"pcaFit: could not complete an orthonormal basis " +
          s"at component $c (dim $dim)")
      }
      // sign convention: largest-|entry| positive
      val am = v.indices.maxBy(d => (math.abs(v(d)), -d))
      if (v(am) < 0) { var d = 0; while (d < dim) { v(d) = -v(d); d += 1 } }
      basis(c) = v
      eig(c) = dotv(v, matv(v))
    }
    import spark.implicits._
    (0 until nComponents)
      .map(c => (c, eig(c), basis(c).toSeq))
      .toDF("component", "eigenvalue", "weights")
  }

  /** Map-side PCA projection through a basis table (trained by
    * [[pcaFit]] or fixed): each component's weights are quantized to
    * FLOAT (the [[randomProject]] precision contract) and baked into
    * the plan as literals — the basis is parameter-bounded, so this is
    * the langid collect-and-broadcast stance, and the scan stays a
    * shuffle-free single pass with one codegen'd `float_dot` per
    * component. Output column: array<float> of component scores, FLOAT
    * rounded like [[randomProject]] so the p106 oracle replays it.
    * `whiten = true` additionally scales each component by
    * 1/sqrt(eigenvalue + eps) — PCA whitening (unit variance per
    * component, the ZCA/OPQ preprocessing step) folded into the same
    * baked weights, so the plan shape is unchanged. */
  def pcaProject(corpus: DataFrame, vecCol: String, basisTab: DataFrame,
      outCol: String = "pca", whiten: Boolean = false,
      eps: Double = 1e-9): DataFrame = {
    val rows = basisTab.select(col("component").cast(IntegerType),
        col("eigenvalue").cast(DoubleType), col("weights")).collect()
      .map { r =>
        val scale =
          if (whiten) 1.0 / math.sqrt(math.max(r.getDouble(1), 0.0) + eps)
          else 1.0
        r.getInt(0) -> r.getSeq[Double](2).map(w => (w * scale).toFloat).toArray
      }
      .sortBy(_._1)
    require(rows.nonEmpty, "pcaProject: empty basis")
    // ONE baked-model kernel call instead of nComponents×dim literal
    // nodes (the jl_project plan-size lesson — a 256×1024 basis as
    // array(lit…) trees is a ~260k-node plan); identical float_dot
    // arithmetic, pinned by the unchanged p106 oracle
    corpus.withColumn(outCol, call_function("mat_vec_affine", col(vecCol),
      lit(graft.plans.MatVecAffine.encode(rows.map(_._2),
        Array.fill(rows.length)(0.0)))))
  }



  /** The baked quadratic form (x−μ)ᵀA(x−μ) as a shuffle-free Column —
    * shared by [[mahalanobisScores]] and the p109 gate (which fixes A
    * and μ so DuckDB can replay it), never duplicated. Expansion:
    * y_i = A_i·x − A_i·μ (one codegen float_dot per matrix row, the
    * μ-term folded into a constant), then s = y·x − y·μ — all
    * sequential double folds, FLOAT-quantized only at the literal
    * boundary, so the oracle's list_reduce twin is bit-identical. */
  private[operators] def quadFormExpr(vecCol: Column, a: Array[Array[Double]],
      mu: Array[Double]): Column = {
    val dim = mu.length
    val wF = a.map(_.map(_.toFloat))
    val bias = wF.map(row => (0 until dim).foldLeft(0.0)((acc, j) =>
      acc + row(j).toDouble * mu(j).toFloat.toDouble))
    // ONE baked-model kernel call instead of dim² literal nodes (the
    // jl_project plan-size lesson): y = A·x − A·μ in a tight loop
    val y = call_function("mat_vec_affine", vecCol,
      lit(graft.plans.MatVecAffine.encode(wF, bias)))
    val muF = array(mu.map(v => lit(v.toFloat)): _*)
    round(call_function("float_dot", y, vecCol) -
      call_function("float_dot", y, muF), 9)
  }

  /** Mahalanobis distance² of every vector from the corpus
    * distribution — the covariance-aware outlier score ((x−μ)ᵀΣ⁻¹(x−μ);
    * the [[centroidOutliers]] family upgraded from spherical to
    * elliptical): train μ/Σ in ONE [[embeddingMeanCov]] pass
    * (dim²-bounded shuffle), collect the parameter-sized moments,
    * invert (Σ + eps·I) on the driver by Gauss-Jordan with partial
    * pivoting (the eigensolve-locality stance of [[pcaFit]] — a dim×dim
    * matrix is a MODEL, not data), and serve through the baked
    * [[quadFormExpr]] — map-side, zero shuffle, plan-pinned. eps
    * regularizes rank-deficient covariances (constant dims score 0 in
    * their direction instead of exploding). Deterministic end-to-end:
    * same corpus → same moments → same inverse → same scores. Output:
    * every caller column + `m2`. */
  def mahalanobisScores(vecs: DataFrame, vecCol: String, dim: Int,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0, s"eps must be > 0, got $eps")
    val cells = embeddingMeanCov(vecs, vecCol, dim)
      .select(col("i"), col("j"), col("mean_i"), col("cov")).collect()
    require(cells.nonEmpty, "mahalanobisScores: no vectors of the declared dim")
    val mu = new Array[Double](dim)
    val m = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      if (i == j) { mu(i) = r.getDouble(2); m(i)(i) = r.getDouble(3) + eps }
      else { m(i)(j) = r.getDouble(3); m(j)(i) = r.getDouble(3) }
    }
    val inv = MahalanobisMath.invert(m)
    vecs.withColumn("m2", quadFormExpr(col(vecCol), inv, mu))
  }

  /** The p106 gate's FIXED projection basis — exact quarter-valued
    * weights (binary-fraction exact in FLOAT, so both engines carry
    * identical literals), derived from one formula on BOTH the Spark
    * and oracle sides so they cannot drift (the p72 weight-table
    * pattern). pcaFit's own training is certified by PcaSpec; the gate
    * certifies the PROJECTION operator end-to-end. */
  private def pcaGateWeight(c: Int, d: Int): Double =
    ((d * (c + 2) + c) % 7 - 3) / 4.0

  /** QuantOps QueryDefs — registered through [[Pipeline.queries]];
    * names, plans and oracle SQL unchanged by the r15 module split. */
  private[operators] lazy val quantQueries: Seq[QueryDef] = Seq(
    // ---- p21: distributed k-means over the embedding corpus — the
    // real Lloyd's iterations p07's IVF stubs out with medoids. Each
    // iteration is the canonical scalable shape: broadcast the k×64
    // centroid table, assign map-side (argmin over k distances, ties to
    // the lowest cluster id), update with ONE k-row groupBy carrying 64
    // partial-aggregated sums — no explode, no per-dimension shuffle.
    // Cross-engine determinism: float sums are order-dependent, so each
    // element is scaled to an exact integer (round(x*1e7) — identical
    // IEEE ops in both engines), summed exactly (order-free), and the
    // mean is a single integer/integer double division. Centroids are
    // therefore bit-identical in Spark and DuckDB, and every distance
    // is a sequential per-row fold like p05-p07. Bound: long sums hold
    // while cluster_size × 1e7·max|x| < 2^63 — ~9e11 members at unit
    // norm; past that, widen the sums to DecimalType(38,0) (exactness
    // and order-freedom carry over; only the agg width changes).
    QueryDef(
      "p21_kmeans_cluster",
      (s, d) =>
        kmeansCluster(T.embeddings(s, d), "vec_id", "embedding",
          k = 4, dim = 64, iters = 2)
          .orderBy(col("vec_id")),
      Some {
        val K = 4; val Dim = 64
        s"""WITH e AS (SELECT vec_id, embedding AS emb FROM embeddings),
           |c0 AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
           |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
           |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= $K),
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "c1", "a1", Dim)},
           |${kmAssignSql("a2", "c1", Dim)},
           |${kmUpdateSql("u2", "c2", "a2", Dim)},
           |${kmAssignSql("a3", "c2", Dim)}
           |SELECT vec_id, cl AS cluster, d2,
           |       COUNT(*) OVER (PARTITION BY cl) AS n_members
           |FROM a3 ORDER BY vec_id""".stripMargin
      },
      headline = true),

    // ---- p35: deterministic k-means++ seeding — the cross-engine gate
    // for [[kmeansPlusPlusSeeds]]' D²-weighted draw. The selection is
    // where determinism is hardest (a single flipped comparison changes
    // every later seed), so the oracle replays the EXACT integer
    // machinery per round: d² to the nearest chosen seed (the proven
    // float-fold), round(d²·1e7) integer weights, the two-phase
    // (bucket, id)-ordered prefix sum, and the md5 threshold pick —
    // four seeds means three sequential picks, generated below as one
    // CTE chain. Output is the selection order and the chosen row ids.
    QueryDef(
      "p35_kmeanspp_seeds",
      (s, d) =>
        kmeansPlusPlusSeeds(T.embeddings(s, d), "vec_id", "embedding",
          k = 4, dim = 64)
          .select(col("cl"), col("vec_id"))
          .orderBy(col("cl")),
      Some {
        val K = 4
        s"""WITH ${kmppChainSql(K, 64)}
           |SELECT CAST(0 AS INT) AS cl, vec_id FROM s0
           |${(1 until K).map(j => s"UNION ALL SELECT $j, vec_id FROM p$j").mkString("\n")}
           |ORDER BY cl""".stripMargin
      }),

    // ---- p36: k-means‖ seeding — the cross-engine gate for
    // [[kmeansParallelSeeds]]. Three independently-failable stages are
    // each replayed exactly: (1) the per-round Bernoulli sample
    // (md5 56-bit uniform vs l·w/Σw — IEEE division/multiplication are
    // correctly rounded, so the comparison is engine-stable), (2) the
    // nearest-candidate weighting (strict-< first-minimum ≡ ORDER BY
    // (d², cl) rank 1), and (3) the driver-side weighted k-means++
    // reduction (BigInt mass intervals ≡ exact BIGINT/HUGEINT window
    // sums, md5 thresholds). k = 3, rounds = 2 keeps the CTE chain
    // readable while touching every stage at least twice.
    QueryDef(
      "p36_kmeanspar_seeds",
      (s, d) =>
        kmeansParallelSeeds(T.embeddings(s, d), "vec_id", "embedding",
          k = 3, dim = 64, rounds = 2)
          .select(col("cl"), col("vec_id"))
          .orderBy(col("cl")),
      Some {
        val K = 3
        s"""WITH ${kmparChainSql(K, rounds = 2, dim = 64)}
           |SELECT CAST(0 AS INT) AS cl, vec_id FROM s0
           |${(1 until K).map(j => s"UNION ALL SELECT $j, vec_id FROM p$j").mkString("\n")}
           |ORDER BY cl""".stripMargin
      }),

    // ---- p38: k-means++-seeded clustering — closes the seam between
    // [[kmeansPlusPlusSeeds]] (p35 gates the seed SELECTION alone) and
    // [[kmeansFit]]'s Lloyd's machinery: one fit at k = 3 with ONE
    // Lloyd's update, then assignment, so the driver certifies the
    // seeding COMPOSED with update/assign — not just the pieces. The
    // oracle chains the shared p35 seed replay into the shared p21
    // Lloyd's replay.
    QueryDef(
      "p38_kmeanspp_fit",
      (s, d) =>
        kmeansCluster(T.embeddings(s, d), "vec_id", "embedding",
          k = 3, dim = 64, iters = 1, seeding = "kmeans++")
          .orderBy(col("vec_id")),
      Some {
        val K = 3; val Dim = 64
        s"""WITH ${kmppChainSql(K, Dim)},
           |${kmSeedCentroidsSql(K)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("a2", "cf", Dim)}
           |SELECT vec_id, cl AS cluster, d2,
           |       COUNT(*) OVER (PARTITION BY cl) AS n_members
           |FROM a2 ORDER BY vec_id""".stripMargin
      }),

    // ---- p40: product quantization end-to-end — [[pqTrain]] (m
    // per-subspace k-means codebooks) → [[pqEncode]] (m codes per
    // vector) → [[pqSearch]] (ADC: per-query lookup tables over the
    // codes scan). The oracle replays every stage: per-subspace min-id
    // seeds + one integer-exact Lloyd's update, argmin code
    // assignment, the m×ksub distance table, and the fixed-order
    // 4-term adist sum (left-associated in both engines, so the
    // doubles are bit-identical).
    QueryDef(
      "p40_pq_adc",
      (s, d) => {
        val e = T.embeddings(s, d)
        // codebooks + codes come from the shared memo (trained once,
        // served — see sharedIvfPq); the ADC scan is what this gate
        // exercises
        val art = sharedIvfPq(s, d)
        pqSearch(
          art.codes,
          e.filter(col("vec_id") <= 4), art.books,
          "vec_id", "embedding", k = 3, dim = 64, m = 4, ksub = 4)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val M = 4; val Sub = 16; val Ksub = 4
        s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
           |${(0 until M).map(pqSpaceSql(_, Sub, Ksub)).mkString(",\n")},
           |${(0 until M).map(pqDtSql(_, Sub)).mkString(",\n")},
           |scored AS (
           |  SELECT d0.q_id, v0.vec_id,
           |         d0.d2 + d1.d2 + d2_.d2 + d3.d2 AS adist
           |  FROM code_0 v0
           |  JOIN code_1 v1 ON v1.vec_id = v0.vec_id
           |  JOIN code_2 v2 ON v2.vec_id = v0.vec_id
           |  JOIN code_3 v3 ON v3.vec_id = v0.vec_id
           |  JOIN dt_0 d0 ON d0.code = v0.code
           |  JOIN dt_1 d1 ON d1.q_id = d0.q_id AND d1.code = v1.code
           |  JOIN dt_2 d2_ ON d2_.q_id = d0.q_id AND d2_.code = v2.code
           |  JOIN dt_3 d3 ON d3.q_id = d0.q_id AND d3.code = v3.code
           |  WHERE v0.vec_id <> d0.q_id)
           |SELECT q_id, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p41: IVF + PQ composed (the FAISS-style IVFPQ shape) — the
    // flagship scale path end-to-end in ONE gated plan: k-means‖-
    // seeded coarse quantizer (p37's chain), per-subspace PQ training
    // + encoding (p40's chains), then the multi-probe ADC scan that
    // touches only the probed clusters' CODES. Both scale levers
    // (cluster pruning × m-byte codes) are live in the gated query.
    QueryDef(
      "p41_ivfpq",
      (s, d) => {
        val e = T.embeddings(s, d)
        // the full artifact set (coarse index + codebooks + codes)
        // comes from the shared memo; this gate times the composed
        // probe-pruned ADC scan
        val art = sharedIvfPq(s, d)
        ivfpqSearch(art.member, art.codes, e.filter(col("vec_id") <= 4),
          art.cents, art.books, "vec_id", "embedding",
          k = 3, dim = 64, m = 4, ksub = 4, nprobe = 2)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val M = 4; val Sub = 16; val Ksub = 4; val Dim = 64
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |${(0 until M).map(pqSpaceSql(_, Sub, Ksub)).mkString(",\n")},
           |${(0 until M).map(pqDtSql(_, Sub)).mkString(",\n")},
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |scored AS (
           |  SELECT p.q_id, p.probe_label, v0.vec_id,
           |         d0.d2 + d1.d2 + d2_.d2 + d3.d2 AS adist
           |  FROM probes p
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN code_0 v0 ON v0.vec_id = mm.vec_id
           |  JOIN code_1 v1 ON v1.vec_id = v0.vec_id
           |  JOIN code_2 v2 ON v2.vec_id = v0.vec_id
           |  JOIN code_3 v3 ON v3.vec_id = v0.vec_id
           |  JOIN dt_0 d0 ON d0.q_id = p.q_id AND d0.code = v0.code
           |  JOIN dt_1 d1 ON d1.q_id = p.q_id AND d1.code = v1.code
           |  JOIN dt_2 d2_ ON d2_.q_id = p.q_id AND d2_.code = v2.code
           |  JOIN dt_3 d3 ON d3.q_id = p.q_id AND d3.code = v3.code
           |  WHERE v0.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p71: IVF-PQ with exact re-rank (FAISS IndexRefineFlat) —
    // the ADC scan picks a 2×k candidate pool per query, the pool's
    // RAW vectors (and only those) are re-scored with the exact
    // squared-euclidean fold, and the final top-k ranks on the exact
    // distance. The oracle replays p41's full ADC chain, widens the
    // pool to crk ≤ 6, then recomputes the exact distances from the
    // raw embeddings — bit-for-bit the same double fold.
    QueryDef(
      "p71_ivfpq_refine",
      (s, d) => {
        val e = T.embeddings(s, d)
        val art = sharedIvfPq(s, d)
        ivfPqSearchRefined(art.member, art.codes,
          e.filter(col("vec_id") <= 4), art.cents, art.books, e,
          "vec_id", "embedding",
          k = 3, dim = 64, m = 4, ksub = 4, nprobe = 2, cFactor = 2)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val M = 4; val Sub = 16; val Ksub = 4; val Dim = 64
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |${(0 until M).map(pqSpaceSql(_, Sub, Ksub)).mkString(",\n")},
           |${(0 until M).map(pqDtSql(_, Sub)).mkString(",\n")},
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |scored AS (
           |  SELECT p.q_id, p.probe_label, v0.vec_id,
           |         d0.d2 + d1.d2 + d2_.d2 + d3.d2 AS adist
           |  FROM probes p
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN code_0 v0 ON v0.vec_id = mm.vec_id
           |  JOIN code_1 v1 ON v1.vec_id = v0.vec_id
           |  JOIN code_2 v2 ON v2.vec_id = v0.vec_id
           |  JOIN code_3 v3 ON v3.vec_id = v0.vec_id
           |  JOIN dt_0 d0 ON d0.q_id = p.q_id AND d0.code = v0.code
           |  JOIN dt_1 d1 ON d1.q_id = p.q_id AND d1.code = v1.code
           |  JOIN dt_2 d2_ ON d2_.q_id = p.q_id AND d2_.code = v2.code
           |  JOIN dt_3 d3 ON d3.q_id = p.q_id AND d3.code = v3.code
           |  WHERE v0.vec_id <> p.q_id),
           |cand AS (
           |  SELECT q_id, vec_id, adist,
           |         ROW_NUMBER() OVER (PARTITION BY q_id
           |           ORDER BY adist ASC, vec_id ASC) AS crk
           |  FROM scored QUALIFY crk <= 6),
           |refined AS (
           |  SELECT cd.q_id, cd.vec_id, cd.adist,
           |         ${kmD2Sql(Dim, "q.emb", "v.emb")} AS edist
           |  FROM cand cd
           |  JOIN e q ON q.vec_id = cd.q_id
           |  JOIN e v ON v.vec_id = cd.vec_id)
           |SELECT q_id, vec_id, adist, edist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY edist ASC, vec_id ASC) AS INT) AS rk
           |FROM refined QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p42: IVFADC with RESIDUAL encoding — the faithful Jégou §V
    // formulation: PQ codebooks train on r(v) = v − c(cluster(v)), so
    // codes describe the within-cell distribution the probe actually
    // scans, and each probe's lookup table is built on q − c(probe).
    // The oracle replays the residual construction (double subtract,
    // float round-trip), the per-subspace training over residuals,
    // and the per-(query, probe) distance tables.
    QueryDef(
      "p42_ivfpq_residual",
      (s, d) => {
        val e = T.embeddings(s, d)
        // serves from the shared memo like p41/p55 (r15 verdict: the
        // production stance is persist-then-serve, so the sweep prices
        // the residual-ADC SERVING path; the one-time training chain is
        // amortized into the memo build the whole ANN family shares)
        val art = sharedIvfPq(s, d)
        ivfpqSearch(art.member, art.codesResid, e.filter(col("vec_id") <= 4),
          art.cents, art.booksResid, "vec_id", "embedding",
          k = 3, dim = 64, m = 4, ksub = 4, nprobe = 2, residual = true)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val M = 4; val Sub = 16; val Ksub = 4; val Dim = 64
        def dtr(j: Int): String =
          s"""dtr_$j AS MATERIALIZED (
             |  SELECT p.q_id, p.probe_label, c.code,
             |         ${pqD2SubSql(Sub, "p.qr", j * Sub, "c.ce")} AS d2
             |  FROM probes p CROSS JOIN cf_$j c)""".stripMargin
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |rs AS MATERIALIZED (
           |  SELECT mm.vec_id, mm.cl,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(mm.emb[i] AS DOUBLE) - c.ce[i] AS FLOAT)) AS emb
           |  FROM mem mm JOIN cf c ON c.cl = mm.cl),
           |${(0 until M).map(pqSpaceSql(_, Sub, Ksub, src = "rs")).mkString(",\n")},
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(qe[i] AS DOUBLE) - pce[i] AS FLOAT)) AS qr
           |  FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label, q.emb AS qe, c.ce AS pce,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |${(0 until M).map(dtr).mkString(",\n")},
           |scored AS (
           |  SELECT p.q_id, p.probe_label, v0.vec_id,
           |         d0.d2 + d1.d2 + d2_.d2 + d3.d2 AS adist
           |  FROM probes p
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN code_0 v0 ON v0.vec_id = mm.vec_id
           |  JOIN code_1 v1 ON v1.vec_id = v0.vec_id
           |  JOIN code_2 v2 ON v2.vec_id = v0.vec_id
           |  JOIN code_3 v3 ON v3.vec_id = v0.vec_id
           |  JOIN dtr_0 d0 ON d0.q_id = p.q_id AND d0.probe_label = p.probe_label AND d0.code = v0.code
           |  JOIN dtr_1 d1 ON d1.q_id = p.q_id AND d1.probe_label = p.probe_label AND d1.code = v1.code
           |  JOIN dtr_2 d2_ ON d2_.q_id = p.q_id AND d2_.probe_label = p.probe_label AND d2_.code = v2.code
           |  JOIN dtr_3 d3 ON d3.q_id = p.q_id AND d3.probe_label = p.probe_label AND d3.code = v3.code
           |  WHERE v0.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p50: SQ8 scalar quantization end-to-end — [[sqTrain]] (per-
    // dimension bounds) → [[sqEncode]] (8-bit levels) → [[sqSearch]]
    // (asymmetric decode-in-the-scan L2): the simplest rung of the
    // compression ladder next to the PQ gates (4× smaller vectors, no
    // codebook training). The oracle replays the bounds agg, the
    // clamped HALF-UP level assignment, the float-rounded decode, and
    // the sequential-fold distance — bit-exact across engines.
    QueryDef(
      "p50_sq8_adc",
      (s, d) => {
        val e = T.embeddings(s, d)
        // bounds feed encode AND search; 64 rows — materialize once
        val bounds = sqTrain(e, "vec_id", "embedding", dim = 64)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sqSearch(
          sqEncode(e, "vec_id", "embedding", bounds, dim = 64),
          e.filter(col("vec_id") <= 4), bounds,
          "vec_id", "embedding", k = 3, dim = 64)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val Dim = 64
        s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding AS emb FROM embeddings),
           |b AS MATERIALIZED (
           |  SELECT i AS pos, min(emb[i]) AS mn, max(emb[i]) AS mx
           |  FROM e, unnest(range(1, ${Dim + 1})) t(i) GROUP BY i),
           |ba AS (SELECT array_agg(mn ORDER BY pos) AS mns,
           |              array_agg(mx ORDER BY pos) AS mxs FROM b),
           |codes AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CASE WHEN CAST(mxs[i] AS DOUBLE) > CAST(mns[i] AS DOUBLE)
           |      THEN least(255, greatest(0, CAST(round(
           |        (CAST(emb[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) /
           |        (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) * 255) AS INT)))
           |      ELSE 0 END) AS codes
           |  FROM e CROSS JOIN ba),
           |dec AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CAST(mns[i] AS DOUBLE) + CAST(codes[i] AS DOUBLE) / 255.0 *
           |      (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE))) AS dv
           |  FROM codes CROSS JOIN ba),
           |scored AS (
           |  SELECT q.vec_id AS q_id, c.vec_id,
           |         ${kmD2Sql(Dim, "q.emb", "c.dv")} AS adist
           |  FROM e q CROSS JOIN dec c
           |  WHERE q.vec_id <= 4 AND c.vec_id <> q.vec_id)
           |SELECT q_id, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p54: IVF + SQ8 composed — [[ivfSqSearch]] entirely over the
    // shared memoized artifacts (coarse index + SQ bounds/codes now
    // both live in [[sharedIvfPq]] — r11 retrained the SQ chain per
    // gate): probe pruning × scalar compression, the most deployed
    // compressed-index layout; the gate times the SERVING scan, p50
    // still prices a standalone SQ train/encode chain. The oracle
    // replays the coarse chain (p37's CTEs), the SQ chain (p50's
    // CTEs), the probe selection, and the decode-distance scan over
    // probed cells only.
    QueryDef(
      "p54_ivfsq",
      (s, d) => {
        val e = T.embeddings(s, d)
        val art = sharedIvfPq(s, d)
        ivfSqSearch(art.member, art.sqCodes,
          e.filter(col("vec_id") <= 4), art.cents, art.sqBounds,
          "vec_id", "embedding", k = 3, dim = 64, nprobe = 2)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val Dim = 64
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |b AS MATERIALIZED (
           |  SELECT i AS pos, min(emb[i]) AS mn, max(emb[i]) AS mx
           |  FROM e, unnest(range(1, ${Dim + 1})) t(i) GROUP BY i),
           |ba AS (SELECT array_agg(mn ORDER BY pos) AS mns,
           |              array_agg(mx ORDER BY pos) AS mxs FROM b),
           |sqc AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CASE WHEN CAST(mxs[i] AS DOUBLE) > CAST(mns[i] AS DOUBLE)
           |      THEN least(255, greatest(0, CAST(round(
           |        (CAST(emb[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) /
           |        (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) * 255) AS INT)))
           |      ELSE 0 END) AS codes
           |  FROM e CROSS JOIN ba),
           |dec AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CAST(mns[i] AS DOUBLE) + CAST(codes[i] AS DOUBLE) / 255.0 *
           |      (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE))) AS dv
           |  FROM sqc CROSS JOIN ba),
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |scored AS (
           |  SELECT p.q_id, p.probe_label, dv.vec_id,
           |         ${kmD2Sql(Dim, "q.emb", "dv.dv")} AS adist
           |  FROM probes p
           |  JOIN e q ON q.vec_id = p.q_id
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN dec dv ON dv.vec_id = mm.vec_id
           |  WHERE dv.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p55: IVF-SQ8 with RESIDUAL encoding — FAISS's by_residual
    // default for IndexIVFScalarQuantizer: bounds and codes train on
    // r(v) = v − c(cluster(v)) (the within-cell distribution the probe
    // actually scans — tighter bounds → finer 8-bit levels), and each
    // probe's query side becomes q − c(probe). The oracle replays the
    // coarse chain, the residual frame (p42's construction), the
    // residual bounds/encode/decode, the per-probe query residuals,
    // and the pruned decode-distance scan.
    QueryDef(
      "p55_ivfsq_residual",
      (s, d) => {
        val e = T.embeddings(s, d)
        val art = sharedIvfPq(s, d)
        ivfSqSearch(art.member, art.sqCodesResid,
          e.filter(col("vec_id") <= 4), art.cents, art.sqBoundsResid,
          "vec_id", "embedding", k = 3, dim = 64, nprobe = 2,
          residual = true)
          .orderBy(col("q_id"), col("rk"))
      },
      Some {
        val Dim = 64
        s"""WITH ${kmparChainSql(3, rounds = 2, dim = Dim)},
           |${kmSeedCentroidsSql(3)},
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "cf", "a1", Dim)},
           |${kmAssignSql("mem", "cf", Dim)},
           |rs AS MATERIALIZED (
           |  SELECT mm.vec_id, mm.cl,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(mm.emb[i] AS DOUBLE) - c.ce[i] AS FLOAT)) AS emb
           |  FROM mem mm JOIN cf c ON c.cl = mm.cl),
           |b AS MATERIALIZED (
           |  SELECT i AS pos, min(emb[i]) AS mn, max(emb[i]) AS mx
           |  FROM rs, unnest(range(1, ${Dim + 1})) t(i) GROUP BY i),
           |ba AS (SELECT array_agg(mn ORDER BY pos) AS mns,
           |              array_agg(mx ORDER BY pos) AS mxs FROM b),
           |sqc AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CASE WHEN CAST(mxs[i] AS DOUBLE) > CAST(mns[i] AS DOUBLE)
           |      THEN least(255, greatest(0, CAST(round(
           |        (CAST(emb[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) /
           |        (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE)) * 255) AS INT)))
           |      ELSE 0 END) AS codes
           |  FROM rs CROSS JOIN ba),
           |dec AS MATERIALIZED (
           |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i ->
           |    CAST(mns[i] AS DOUBLE) + CAST(codes[i] AS DOUBLE) / 255.0 *
           |      (CAST(mxs[i] AS DOUBLE) - CAST(mns[i] AS DOUBLE))) AS dv
           |  FROM sqc CROSS JOIN ba),
           |probes AS MATERIALIZED (
           |  SELECT q_id, m_label AS probe_label,
           |         list_transform(range(1, ${Dim + 1}),
           |           i -> CAST(CAST(qe[i] AS DOUBLE) - pce[i] AS FLOAT)) AS qr
           |  FROM (
           |    SELECT q.vec_id AS q_id, c.cl AS m_label, q.emb AS qe, c.ce AS pce,
           |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |             ORDER BY ${kmD2Sql(Dim, "q.emb", "c.ce")} ASC, c.cl ASC) AS prk
           |    FROM e q CROSS JOIN cf c WHERE q.vec_id <= 4) t
           |  WHERE prk <= 2),
           |scored AS (
           |  SELECT p.q_id, p.probe_label, dv.vec_id,
           |         ${kmD2Sql(Dim, "p.qr", "dv.dv")} AS adist
           |  FROM probes p
           |  JOIN mem mm ON mm.cl = p.probe_label
           |  JOIN dec dv ON dv.vec_id = mm.vec_id
           |  WHERE dv.vec_id <> p.q_id)
           |SELECT q_id, probe_label, vec_id, adist,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |         ORDER BY adist ASC, vec_id ASC) AS INT) AS rk
           |FROM scored QUALIFY rk <= 3 ORDER BY q_id, rk""".stripMargin
      }),

    // ---- p66: SemDeDup — [[semDedup]] over the embeddings table
    // (k = 16 — the paper's own scale lever is MORE clusters, keeping
    // within-cluster pair work linear-ish; min-id/2-iter fit as p21,
    // τ = 0.35: the fixture's
    // random embeddings top out at cos ≈ 0.51, so the production-scale
    // τ ≈ 0.95 would fire on nothing — the gate needs the prune path
    // to actually run). The oracle replays the p21 k-means chain, the
    // within-cluster cosine self-join, the recursive-CTE transitive
    // closure, and the farthest-from-centroid representative rule.
    QueryDef(
      "p66_semdedup",
      (s, d) =>
        semDedup(T.embeddings(s, d), "vec_id", "embedding",
          k = 16, dim = 64, tau = 0.35,
          assigned = Some(sharedSemDedupAssign(s, d)))
          .orderBy(col("vec_id")),
      Some {
        val Dim = 64
        s"""WITH RECURSIVE e AS (SELECT vec_id, embedding AS emb FROM embeddings),
           |c0 AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
           |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
           |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16),
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "c1", "a1", Dim)},
           |${kmAssignSql("a2", "c1", Dim)},
           |${kmUpdateSql("u2", "c2", "a2", Dim)},
           |${kmAssignSql("a3", "c2", Dim)},
           |n AS MATERIALIZED (
           |  SELECT vec_id, emb, cl, d2, ${kmDotSql("emb", "emb")} AS n2
           |  FROM a3),
           |pr AS MATERIALIZED (
           |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
           |  FROM n x JOIN n y ON x.cl = y.cl AND x.vec_id < y.vec_id
           |  WHERE ${kmDotSql("x.emb", "y.emb")} / (sqrt(x.n2) * sqrt(y.n2))
           |        >= CAST(0.35 AS DOUBLE)),
           |verified AS (SELECT doc_a, doc_b FROM pr),
           |$ComponentsSql,
           |reps AS (
           |  SELECT comp.node, ROW_NUMBER() OVER (
           |      PARTITION BY comp.component
           |      ORDER BY n.d2 DESC, comp.node ASC) AS rk
           |  FROM comp JOIN n ON n.vec_id = comp.node)
           |SELECT n.vec_id, n.cl AS cluster, n.d2
           |FROM n
           |WHERE n.vec_id NOT IN (SELECT node FROM reps WHERE rk > 1)
           |ORDER BY n.vec_id""".stripMargin
      }),

    // ---- p105: embedding mean + covariance — [[embeddingMeanCov]]'s
    // full upper triangle, every cell replayed by the oracle through
    // the shared dsum decimal quantization: the moment pass PCA /
    // whitening / mahalanobis outliers train on, certified exactly.
    QueryDef(
      "p105_embedding_covariance",
      (s, d) =>
        embeddingMeanCov(T.embeddings(s, d), "embedding", dim = 64)
          .orderBy(col("i"), col("j")),
      Some(s"""
        WITH p AS MATERIALIZED (
          SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
                 CAST(embedding[i + 1] AS DOUBLE) AS xi,
                 CAST(embedding[j + 1] AS DOUBLE) AS xj
          FROM embeddings, unnest(range(0, 64)) t(i), unnest(range(0, 64)) u(j)
          WHERE j >= i AND embedding IS NOT NULL AND len(embedding) = 64)
        SELECT i, j, COUNT(*) AS n,
               ROUND(${graft.QueryDef.dsumSql("xi")} / COUNT(*), 9) AS mean_i,
               ROUND(${graft.QueryDef.dsumSql("xj")} / COUNT(*), 9) AS mean_j,
               ROUND((${graft.QueryDef.dsumSql("xi * xj")}
                 - ${graft.QueryDef.dsumSql("xi")}
                   * ${graft.QueryDef.dsumSql("xj")} / COUNT(*)) / COUNT(*), 9)
                 AS cov
        FROM p GROUP BY i, j ORDER BY i, j""")),

    // ---- p106: PCA projection — [[pcaProject]] through the FIXED
    // [[pcaGateWeight]] basis (3 components over the 64-dim
    // embeddings), flattened per-component like p69. The oracle
    // replays the identical float-quantized weights and the
    // left-to-right double fold + FLOAT round of `float_dot`.
    QueryDef(
      "p106_pca_project",
      (s, d) => {
        import s.implicits._
        val basis = (0 until 3).map(c => (c, 0.0,
          (0 until 64).map(dd => pcaGateWeight(c, dd)).toSeq))
          .toDF("component", "eigenvalue", "weights")
        pcaProject(T.embeddings(s, d), "embedding", basis)
          .select(col("vec_id") +: (0 until 3).map(c =>
            element_at(col("pca"), c + 1).cast(DoubleType)
              .as(s"pca_$c")): _*)
          .orderBy(col("vec_id"))
      },
      Some {
        def proj(c: Int): String = {
          val w = (0 until 64).map(dd => pcaGateWeight(c, dd).toFloat)
            .mkString("[", ",", "]")
          s"""CAST(CAST(list_reduce(list_transform(range(1, 65),
             |  d -> CAST(embedding[d] AS DOUBLE) * CAST($w[d] AS DOUBLE)),
             |  (acc, x) -> acc + x) AS FLOAT) AS DOUBLE) AS pca_$c""".stripMargin
        }
        s"""
        SELECT vec_id,
               ${(0 until 3).map(proj).mkString(",\n               ")}
        FROM embeddings ORDER BY vec_id"""
      }),

    // ---- p109: the Mahalanobis quadratic form — [[quadFormExpr]]
    // (the serving path of [[mahalanobisScores]]) with a FIXED
    // quarter/eighth-valued matrix and mean over the jl-projected
    // 8-dim embeddings, so the oracle replays every fold: the shared
    // [[jlProjSql]] projection, each matrix row's sequential double
    // fold, the folded-constant subtraction, the FLOAT quantization of
    // y, and the final y·x − y·μ. Training (moment collect + driver
    // inversion) is certified by MahalanobisSpec — the same
    // train-by-spec / serve-by-gate split as pcaFit/p106.
    QueryDef(
      "p109_mahalanobis_form",
      (s, d) => {
        val a = Array.tabulate(8, 8)((i, j) => ((i + 2 * j + 1) % 5 - 2) / 4.0)
        val mu = Array.tabulate(8)(dd => (dd - 3) / 8.0)
        randomProject(T.embeddings(s, d), "embedding", EmbDim, 8, "e8")
          .select(col("vec_id"), quadFormExpr(col("e8"), a, mu).as("m2"))
          .orderBy(col("vec_id"))
      },
      Some {
        val a = Array.tabulate(8, 8)((i, j) => ((i + 2 * j + 1) % 5 - 2) / 4.0)
        val mu = Array.tabulate(8)(dd => (dd - 3) / 8.0)
        def dotSql(xs: String, lits: String): String =
          s"""list_reduce(list_transform(range(1, 9),
             |    d -> CAST($xs[d] AS DOUBLE) * CAST($lits[d] AS DOUBLE)),
             |    (acc, x) -> acc + x)""".stripMargin
        def flist(v: Array[Double]): String =
          v.map(x => x.toFloat.toString).mkString("[", ",", "]")
        val ys = (0 until 8).map { i =>
          val c = (0 until 8).foldLeft(0.0)((acc, j) =>
            acc + a(i)(j).toFloat.toDouble * mu(j).toFloat.toDouble)
          s"CAST(${dotSql("e", flist(a(i)))} - ($c) AS FLOAT)"
        }.mkString(",\n            ")
        s"""WITH e8 AS MATERIALIZED (
           |  SELECT vec_id,
           |         [${(0 until 8).map(j => jlProjSql(j, EmbDim, 8)).mkString(",\n          ")}] AS e
           |  FROM embeddings),
           |y AS MATERIALIZED (
           |  SELECT vec_id, e,
           |         [$ys] AS y
           |  FROM e8)
           |SELECT vec_id,
           |       ROUND(${dotSql("y", "e")} - ${dotSql("y", flist(mu))}, 9) AS m2
           |FROM y ORDER BY vec_id""".stripMargin
      }),

    // ---- p110: clustering in PCA space — [[pcaProject]] (through the
    // p106 fixed basis) feeding [[kmeansCluster]], the composition
    // that IS the PCA rung's production purpose (FAISS PCAMatrix →
    // coarse quantizer: Lloyd's over 3 dims at ~1/21 the distance cost
    // of raw 64-dim space). The p70 pattern with the data-adapted
    // transform in place of JL: the oracle projects inside its first
    // CTE with the identical float-quantized weights and fold, then
    // replays the full min-id-seeded k-means chain at dim 3.
    QueryDef(
      "p110_pca_cluster",
      (s, d) => {
        import s.implicits._
        val basis = (0 until 3).map(c => (c, 0.0,
          (0 until 64).map(dd => pcaGateWeight(c, dd)).toSeq))
          .toDF("component", "eigenvalue", "weights")
        kmeansCluster(
          pcaProject(T.embeddings(s, d), "embedding", basis, "pe"),
          "vec_id", "pe", k = 8, dim = 3, iters = 2)
          .orderBy(col("vec_id"))
      },
      Some {
        val Dim = 3
        def proj(c: Int): String = {
          val w = (0 until 64).map(dd => pcaGateWeight(c, dd).toFloat)
            .mkString("[", ",", "]")
          s"""CAST(list_reduce(list_transform(range(1, 65),
             |  d -> CAST(embedding[d] AS DOUBLE) * CAST($w[d] AS DOUBLE)),
             |  (acc, x) -> acc + x) AS FLOAT)""".stripMargin
        }
        s"""WITH e AS MATERIALIZED (
           |  SELECT vec_id,
           |         [${(0 until Dim).map(proj).mkString(",\n          ")}] AS emb
           |  FROM embeddings),
           |c0 AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
           |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
           |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 8),
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "c1", "a1", Dim)},
           |${kmAssignSql("a2", "c1", Dim)},
           |${kmUpdateSql("u2", "c2", "a2", Dim)},
           |${kmAssignSql("a3", "c2", Dim)}
           |SELECT vec_id, cl AS cluster, d2,
           |       COUNT(*) OVER (PARTITION BY cl) AS n_members
           |FROM a3 ORDER BY vec_id""".stripMargin
      }),

    // ---- p132: simplified-silhouette clustering quality —
    // [[silhouetteReport]] over the p21 fit (k = 4, 2 Lloyd's
    // iterations, min-id seeds). The oracle replays the identical
    // centroid chain (c0→c2), then derives a and b as ranks 1 and 2 of
    // the per-point centroid-distance ordering (d2 ASC, cl ASC) — the
    // exact tie semantics of the Spark side's strict-< two-min fold —
    // and aggregates the round(s·1e7) integer scores. Gates the b =
    // second-minimum extraction, the sqrt/division arithmetic, and the
    // order-free quantized mean in one shot.
    QueryDef(
      "p132_silhouette",
      (s, d) =>
        silhouetteReport(T.embeddings(s, d), "vec_id", "embedding",
          k = 4, dim = 64, iters = 2)
          .orderBy(col("cluster")),
      Some {
        val K = 4; val Dim = 64
        s"""WITH e AS (SELECT vec_id, embedding AS emb FROM embeddings),
           |c0 AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
           |         list_transform(emb, x -> CAST(x AS DOUBLE)) AS ce
           |  FROM e QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= $K),
           |${kmAssignSql("a1", "c0", Dim)},
           |${kmUpdateSql("u1", "c1", "a1", Dim)},
           |${kmAssignSql("a2", "c1", Dim)},
           |${kmUpdateSql("u2", "c2", "a2", Dim)},
           |dists AS (
           |  SELECT s.vec_id, c.cl, ${kmD2Sql(Dim, "s.emb", "c.ce")} AS d2
           |  FROM e s CROSS JOIN c2 c),
           |ranked AS (
           |  SELECT vec_id, cl, d2,
           |         ROW_NUMBER() OVER (PARTITION BY vec_id
           |           ORDER BY d2 ASC, cl ASC) AS rn
           |  FROM dists),
           |ab AS (
           |  SELECT r1.vec_id, r1.cl, sqrt(r1.d2) AS a, sqrt(r2.d2) AS b
           |  FROM ranked r1 JOIN ranked r2 ON r1.vec_id = r2.vec_id
           |  WHERE r1.rn = 1 AND r2.rn = 2),
           |q AS (
           |  SELECT cl, CAST(ROUND((CASE WHEN b > 0 THEN (b - a) / b
           |                              ELSE 0 END) * 10000000.0) AS BIGINT) AS sq
           |  FROM ab)
           |SELECT CAST(cl AS INT) AS cluster, COUNT(*) AS n_members,
           |       CAST(SUM(sq) AS BIGINT) AS sum_sil_q7,
           |       CAST(CAST(SUM(sq) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_sil_q7
           |FROM q GROUP BY cl ORDER BY cluster""".stripMargin
      })
  )
}
