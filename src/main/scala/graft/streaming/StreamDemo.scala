package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Operable end-to-end streaming ingest job: tail a JSONL directory,
  * scrub + gate + near-dup-admit each document, and land curated
  * parquet with a checkpointed exactly-once sink — the tested
  * [[Streams]] transforms wired into something you can actually run:
  *
  * {{{
  * sbt "runMain graft.streaming.StreamDemo <inDir> <outDir> <ckptDir> \
  *      [--follow] [--max-files-per-trigger=N] [--max-bytes-per-trigger=SIZE]"
  * }}}
  *
  * Input files are JSONL rows of
  * `{"ts": "2024-01-01T10:00:00Z", "doc_id": 1, "text": "...", "source": "web"}`
  * (new files appearing under `inDir` are picked up automatically —
  * the standard file-source pattern for a landing zone fed by an
  * uploader). By default the job drains everything currently available
  * and exits (`Trigger.AvailableNow` — restartable batch-over-stream,
  * the right default for cron-style incremental ingest: offsets live
  * in the checkpoint, so each invocation processes exactly the new
  * files); `--follow` instead keeps tailing until killed. Either way
  * the chain is the StreamsSpec-verified one:
  * scrubAndGate (stateless PII redaction + length gate) →
  * neardupGate (watermark-bounded LSH-bucket admission) →
  * toParquet (file-sink commit log, exactly-once across restarts).
  */
object StreamDemo {

  /** The input contract: explicit schema (a streaming file source
    * cannot infer one) — extra JSON fields are ignored, missing ones
    * read as null. A null text is length-gated out; a null/unparseable
    * ts is gated out EXPLICITLY below — the event-time dedup gate needs
    * a watermarkable timestamp, and letting nulls reach it would drop
    * (or nondeterministically expire) such rows deep inside Spark's
    * watermark machinery with no trace. */
  val InputSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  /** Build and start the query; separated from main so tests drive it
    * against temp dirs on the shared session.
    *
    * Backpressure: `maxFilesPerTrigger`/`maxBytesPerTrigger` bound each
    * micro-batch on the FILE SOURCE (rate limits are source options,
    * not sink ones). Without a bound, the first run against a full
    * landing zone — at 100 TB, the whole history — drains everything
    * in ONE micro-batch, whose shuffle/state footprint scales with the
    * backlog instead of the arrival rate. `Trigger.AvailableNow`
    * honors these limits: it still drains the full backlog and exits,
    * but as a SEQUENCE of bounded batches, each committed to the
    * checkpoint — so a crash mid-drain resumes from the last bounded
    * batch rather than replaying the entire zone. `maxBytesPerTrigger`
    * is a decimal BYTE count ("10000000", no size suffix — Spark's
    * FileStreamOptions rejects "10m") and a SOFT cap: every batch
    * admits at least one file. */
  def run(spark: SparkSession, inDir: String, outDir: String,
      ckptDir: String, follow: Boolean = false,
      minChars: Int = 50,
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[String] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.col
    val reader0 = spark.readStream.schema(InputSchema)
    val reader1 = maxFilesPerTrigger.fold(reader0)(n =>
      reader0.option("maxFilesPerTrigger", n.toString))
    val reader = maxBytesPerTrigger.fold(reader1)(b =>
      reader1.option("maxBytesPerTrigger", b))
    val raw: DataFrame = reader
      .json(inDir)
      // rows without a parseable event time cannot pass the watermarked
      // near-dup gate; drop them HERE, as a stated contract, instead of
      // silently inside the watermark predicate
      .filter(col("ts").isNotNull)
    val curated = Streams.neardupGate(
      Streams.scrubAndGate(raw, minChars = minChars))
    Streams.toParquet(curated, outDir, ckptDir,
      trigger = if (follow) None else Some(Trigger.AvailableNow()))
  }

  def main(args: Array[String]): Unit = {
    val (flags, dirs) = args.partition(_.startsWith("--"))
    val MaxFiles = "--max-files-per-trigger=(\\d+)".r
    val MaxBytes = "--max-bytes-per-trigger=(\\S+)".r
    val known = flags.forall {
      case "--follow" | MaxFiles(_) | MaxBytes(_) => true
      case _ => false
    }
    if (dirs.length != 3 || !known) {
      System.err.println(
        "usage: StreamDemo <inDir> <outDir> <checkpointDir> [--follow] " +
          "[--max-files-per-trigger=N] [--max-bytes-per-trigger=SIZE]")
      sys.exit(2)
    }
    val follow = flags.contains("--follow")
    val maxFiles = flags.collectFirst { case MaxFiles(n) => n.toInt }
    val maxBytes = flags.collectFirst { case MaxBytes(b) => b }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = run(spark, dirs(0), dirs(1), dirs(2), follow,
      maxFilesPerTrigger = maxFiles, maxBytesPerTrigger = maxBytes)
    q.awaitTermination()
    spark.stop()
  }
}
