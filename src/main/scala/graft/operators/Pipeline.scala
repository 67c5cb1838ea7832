package graft.operators

import graft.QueryDef

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables (builder brief; beyond the reference's surface).
  *
  * Scale stance (100 TB): every operator is bucketed/blocked — MinHash
  * bands and SimHash chunks turn near-dup search into `groupBy(bucket)`
  * (no all-pairs); candidate verification joins are bounded by bucket
  * collisions; embedding search broadcasts the (small) query side and
  * the IVF variant restricts the scan to one cluster. Nothing here
  * collects to the driver.
  *
  * Determinism stance: every floating-point reduction that must match
  * the DuckDB oracle bit-for-bit is either (a) an exact integer/decimal
  * aggregate, or (b) a *sequential* double fold (`aggregate` over an
  * array — same left-to-right order DuckDB's `list_reduce` uses), never
  * a partitioned float `SUM`.
  */
object Pipeline
    extends PipelineCore
    with DedupOps
    with DedupTextOps
    with DecontamOps
    with AnnOps
    with QuantOps
    with QualityOps
    with WordModelOps
    with TextOps
    with SketchOps
    with SamplingOps
    with GraphOps {

  /** Every pipeline QueryDef across the topic suites (p01..p146 +
    * m01..m11) — same names, plans and oracle SQL as the pre-split
    * single-file registry; SparkEntry fails fast on duplicates. */
  val queries: Seq[QueryDef] =
    dedupQueries ++ deduptextQueries ++ decontamQueries ++ annQueries ++
      quantQueries ++ qualityQueries ++ wordmodelQueries ++ textQueries ++
      sketchQueries ++ samplingQueries ++ graphQueries
}
