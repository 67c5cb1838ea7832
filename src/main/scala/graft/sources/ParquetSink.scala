package graft.sources

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Configured Parquet sink (O16/O19/O18).
  *
  * Mirrors the reference's writer surface: codec map with zstd default
  * (`cli/src/main.rs:228-276`), row-group size control
  * (`cli/src/postgres_cloner.rs:305` — 500 MiB raw), optional
  * single-file output (the reference always writes one file), overwrite
  * semantics, and a live progress meter (rows, MiB, rows/s every
  * ≥300 ms — `cli/src/parquet_writer.rs:107-151`).
  *
  * All knobs map to the Spark/parquet-mr options that implement the
  * same behavior; the Dremel shredding and row-group buffering the
  * reference hand-rolls (~1,700 LoC) are `df.write.parquet` itself
  * (SURVEY §7.1).
  */
object ParquetSink {

  /** Codec names accepted by the reference (main.rs:239-248) → parquet-mr
    * codec. lzo is rejected exactly like parquet-mr would, with a clear
    * message (SURVEY §7.4 documents the deviation). */
  val Codecs: Map[String, String] = Map(
    "none" -> "uncompressed",
    "snappy" -> "snappy",
    "gzip" -> "gzip",
    "brotli" -> "brotli",
    "lz4" -> "lz4",
    "zstd" -> "zstd")

  final case class SinkOptions(
      compression: String = "zstd",          // reference default (main.rs:240)
      compressionLevel: Option[Int] = None,  // zstd/gzip level
      rowGroupBytes: Long = 512L * 1024 * 1024,
      maxRecordsPerFile: Option[Long] = None,
      singleFile: Boolean = true,            // reference writes one file
      partitionBy: Seq[String] = Seq.empty,  // beyond-reference: hive-style layout
      sortBy: Seq[String] = Seq.empty,       // beyond-reference: clustered layout
      sortFiles: Option[Int] = None,         // file count for the sorted layout
      overwrite: Boolean = true,
      quiet: Boolean = true)

  final case class WriteStats(rows: Long, bytes: Long, files: Int)

  def codecFor(name: String): String =
    Codecs.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"unsupported compression '$name' (supported: ${Codecs.keys.toSeq.sorted.mkString(", ")}; lzo is not available in parquet-mr)"))

  /** O18 parity: rows/bytes/rate from executor output metrics, printed
    * at most every 300 ms, plus a final summary line.
    *
    * Scoped to THIS write's jobs (matched by job-group id via
    * onJobStart→stageIds): a context-wide listener would add every
    * concurrent write's tasks to the meter. Failed tasks carry null
    * taskMetrics and non-successful attempts (retries, losers of
    * speculative races) are skipped, so the live numbers track
    * committed work. The meter remains advisory — final WriteStats
    * come from the parquet footers. */
  private[sources] final class Progress(quiet: Boolean, jobGroup: String)
      extends SparkListener {
    val rows = new AtomicLong(0)
    val bytes = new AtomicLong(0)
    private val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    private val lastPrint = new AtomicLong(0)
    private val t0 = System.nanoTime()
    override def onJobStart(js: SparkListenerJobStart): Unit =
      if (js.properties != null &&
          jobGroup == js.properties.getProperty("spark.jobGroup.id"))
        js.stageIds.foreach(id => myStages.add(id))
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val tm = te.taskMetrics // null for failed tasks
      if (tm != null && myStages.contains(te.stageId) &&
          te.taskInfo != null && te.taskInfo.successful) {
        val om = tm.outputMetrics
        if (om != null) {
          val r = rows.addAndGet(om.recordsWritten)
          val b = bytes.addAndGet(om.bytesWritten)
          val now = System.currentTimeMillis()
          val last = lastPrint.get()
          if (!quiet && now - last >= 300 && lastPrint.compareAndSet(last, now)) {
            val secs = (System.nanoTime() - t0) / 1e9
            System.err.println(
          f"[sink] $r rows, ${b / 1048576.0}%.1f MiB, ${r / math.max(secs, 1e-9)}%.0f rows/s")
          }
        }
      }
    }
  }

  def write(df: DataFrame, path: String, opts: SinkOptions = SinkOptions()): WriteStats = {
    val spark = df.sparkSession
    val codec = codecFor(opts.compression)
    val jobGroup = s"graft-sink-${java.util.UUID.randomUUID()}"
    val listener = new Progress(opts.quiet, jobGroup)
    val sc = spark.sparkContext
    // save the caller's thread-local job group so it can be RESTORED
    // after the write — clearing it instead would silently break a
    // caller's own job-group-based cancellation (and drop its
    // interruptOnCancel/description) after any sink write
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.addSparkListener(listener)
    sc.setJobGroup(jobGroup, s"graft sink: $path",
      interruptOnCancel = false)
    try {
      // Clustered layout (beyond-reference): range-partition + sort by
      // the cluster columns so every parquet file (and row group inside
      // it) covers a tight, disjoint key range. At 100 TB this is what
      // makes point/range scans cheap — file-level and row-group min/max
      // stats prune everything outside the predicate's range, which
      // unsorted output cannot do. repartitionByRange samples split
      // points, so files are also size-balanced under skew.
      val out =
        if (opts.sortBy.nonEmpty) {
          val cols = opts.sortBy.map(df.col)
          val n = opts.sortFiles.getOrElse(
            if (opts.singleFile && opts.partitionBy.isEmpty) 1
            else spark.sessionState.conf.numShufflePartitions)
          df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
        }
        else if (opts.singleFile && opts.partitionBy.isEmpty) df.coalesce(1)
        else df
      var w = out.write
        .mode(if (opts.overwrite) "overwrite" else "errorifexists")
        .option("compression", codec)
        .option("parquet.block.size", opts.rowGroupBytes)
      if (opts.partitionBy.nonEmpty) w = w.partitionBy(opts.partitionBy: _*)
      opts.compressionLevel.foreach { lvl =>
        // parquet-mr exposes a level knob for zstd only; the reference
        // sets gzip/brotli levels natively (main.rs:267-276) — warn
        // instead of silently ignoring (documented deviation)
        if (codec == "zstd") w = w.option("parquet.compression.codec.zstd.level", lvl)
        else if (!opts.quiet)
          System.err.println(s"warning: --compression-level is ignored for " +
            s"codec '$codec' (parquet-mr exposes a level option for zstd only)")
      }
      // High-ratio codecs get bigger pages so the codec sees more
      // context — the reference's write-batch heuristic for
      // zstd(level>2)/brotli/gzip (cli/src/main.rs:267-276), expressed
      // through parquet-mr's page size.
      val highRatio = codec == "gzip" || codec == "brotli" ||
        (codec == "zstd" && opts.compressionLevel.exists(_ > 2))
      if (highRatio) w = w.option("parquet.page.size", 4 * 1024 * 1024)
      opts.maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n))
      w.parquet(path)
    } finally {
      // restore the three saved properties individually (null removes):
      // setJobGroup/clearJobGroup set all three as a unit and cannot
      // represent a caller that had, say, a job DESCRIPTION but no group
      // — clearJobGroup would silently wipe it
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      sc.setLocalProperty("spark.job.description", prevDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
      sc.removeSparkListener(listener)
    }
    // final stats from the files themselves (the listener is a live
    // meter; footers are the ground truth) — through the SESSION's
    // hadoop conf so spark.hadoop.* credentials reach remote paths
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = partFiles(path, conf)
    val stats = WriteStats(
      parts.map(rowCount(_, conf)).sum,
      parts.map(fileLength(_, conf)).sum, parts.length)
    if (!opts.quiet)
      System.err.println(
        f"[sink] done: ${stats.rows} rows, ${stats.bytes / 1048576.0}%.2f MiB parquet, ${stats.files} file(s)")
    stats
  }

  /** Default Hadoop conf for the footer utilities when no session conf
    * is passed: the active session's (so `spark.hadoop.*` settings —
    * s3a/hdfs credentials — apply to remote paths), falling back to a
    * bare Configuration only when no session exists at all. */
  private[graft] def hadoopConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** All part files under `path`, recursing into hive-style partition
    * subdirectories (`col=value/part-*.parquet`) — through the Hadoop
    * FileSystem API, so write stats and footer utilities work for
    * remote output paths (`hdfs://`, `s3a://`) as well as local disk
    * (a `java.io.File` listing silently returns nothing for remote
    * schemes and would report `exported 0 rows`). */
  def partFiles(path: String,
      conf: org.apache.hadoop.conf.Configuration = hadoopConf): Seq[org.apache.hadoop.fs.Path] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      fs.listStatus(p).toSeq.flatMap {
        case st if st.isDirectory => walk(st.getPath)
        case st if st.getPath.getName.startsWith("part-") &&
            st.getPath.getName.endsWith(".parquet") => Seq(st.getPath)
        case _ => Seq.empty
      }
    walk(root).sortBy(_.toString)
  }

  /** Replace every part file under `path` with a rewritten copy, safely:
    * rewrite into a `.tmp`, move the ORIGINAL aside as `.bak`, move the
    * `.tmp` into place, then drop the backup — so the committed data
    * survives every failure point (a delete-before-rename protocol
    * loses the only copy when the rename fails). Shared by the
    * annotation and transcode post-write passes. */
  def replacePartFiles(path: String, suffix: String,
      conf: org.apache.hadoop.conf.Configuration)(
      rewriteOne: (org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path) => Unit): Int = {
    recoverReplaceArtifacts(path, suffix, conf)
    val parts = partFiles(path, conf)
    parts.foreach { p =>
      val fs = p.getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.$suffix")
      val bak = new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.bak")
      rewriteOne(p, tmp)
      if (!fs.rename(p, bak))
        throw new java.io.IOException(s"failed to move $p aside for replacement")
      if (!fs.rename(tmp, p)) {
        fs.rename(bak, p) // restore the original before reporting
        throw new java.io.IOException(s"failed to move rewritten copy into $p")
      }
      fs.delete(bak, false)
    }
    parts.length
  }

  /** Crash recovery for [[replacePartFiles]]: a prior run that died
    * mid-protocol leaves artifacts that would otherwise make the NEXT
    * run fail on a healthy directory (rename refuses an existing
    * `.bak` destination; a stale `.tmp` breaks the rewriter's CREATE).
    * A `.bak` whose original is MISSING marks a crash between the two
    * renames — the backup IS the committed data, restore it. A `.bak`
    * whose original exists means the crash was after commit — drop it.
    * Stale `.tmp`/suffix files are always garbage. */
  private def recoverReplaceArtifacts(path: String, suffix: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return
    def walk(d: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(d).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath)
        else if (name.startsWith(".") && name.endsWith(".bak")) {
          val orig = new org.apache.hadoop.fs.Path(
            st.getPath.getParent, name.stripPrefix(".").stripSuffix(".bak"))
          if (!fs.exists(orig)) {
            // the backup IS the committed data here — a failed restore
            // would leave it hidden in a dot-file (invisible to
            // spark.read.parquet) and the replace pass would proceed
            // with the part silently absent; fail loudly instead,
            // matching replacePartFiles' own rename checks
            if (!fs.rename(st.getPath, orig))
              throw new java.io.IOException(
                s"failed to restore committed part ${st.getPath} to $orig")
          }
          else fs.delete(st.getPath, false)
        }
        else if (name.startsWith(".") && name.endsWith(s".$suffix"))
          fs.delete(st.getPath, false)
      }
    walk(root)
  }

  def fileLength(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration = hadoopConf): Long =
    p.getFileSystem(conf).getFileStatus(p).getLen

  private def footer(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  def rowCount(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration = hadoopConf): Long = {
    import scala.jdk.CollectionConverters._
    footer(p, conf).getBlocks.asScala.map(_.getRowCount).sum
  }

  /** (min, max) of a column across a file's row-group statistics — the
    * pruning range a reader's predicate is checked against. None when
    * the column has no stats (all-NULL or stats disabled). */
  def columnRange(p: org.apache.hadoop.fs.Path, column: String,
      conf: org.apache.hadoop.conf.Configuration = hadoopConf): Option[(Any, Any)] = {
    import scala.jdk.CollectionConverters._
    val stats = footer(p, conf).getBlocks.asScala.toSeq
      .flatMap(_.getColumns.asScala.find(_.getPath.toDotString == column))
      .map(_.getStatistics)
      .filter(s => s != null && s.hasNonNullValue)
    if (stats.isEmpty) None
    else {
      val lt = Ordering.fromLessThan[Comparable[Any]]((x, y) => x.compareTo(y) < 0)
      Some((stats.map(_.genericGetMin.asInstanceOf[Comparable[Any]]).min(lt),
        stats.map(_.genericGetMax.asInstanceOf[Comparable[Any]]).max(lt)))
    }
  }

  /** Compression codec of the first column chunk (for option round-trip
    * assertions). */
  def fileCodec(p: org.apache.hadoop.fs.Path,
      conf: org.apache.hadoop.conf.Configuration = hadoopConf): String = {
    val b = footer(p, conf).getBlocks
    // a 0-row file has no row groups, hence no column chunks and no
    // codec to report — fail with the reason, not an index error
    if (b.isEmpty) throw new IllegalArgumentException(
      s"$p has no row groups (empty file) — no codec to report")
    b.get(0).getColumns.get(0).getCodec.toString.toLowerCase
  }
}
