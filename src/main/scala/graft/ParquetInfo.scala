package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** O20 parity: the reference's hidden `parquet-info` diagnostic
  * (`cli/src/parquetinfo.rs:36-70`) — dump file metadata, per-row-group
  * and per-column stats, then the schema and a value sample.
  *
  * Usage: runMain graft.ParquetInfo <file-or-dir> [sampleRows]
  */
object ParquetInfo {

  /** Footer report for one file or a part-file directory, as printable
    * lines (factored out of main so the report is assertable without
    * capturing stdout). Uses the active session's Hadoop conf when one
    * exists, so remote paths see spark.hadoop.* credentials. */
  def describe(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        graft.sources.ParquetSink.hadoopConf): Seq[String] = {
    // single-file detection through the Hadoop FileSystem, NOT
    // java.io.File — a remote URI (s3a://, hdfs://) is never a local
    // file, and the part-* directory filter would then drop a remote
    // single file and report nothing (r06 review)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isFile) Seq(p)
      else {
        // ANY *.parquet under the directory — not just Spark's part-*
        // naming: a lake directory of ordinarily-named files
        // (events.parquet, orders.parquet) must not silently report
        // nothing, indistinguishable from an empty dataset
        def walk(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
          fs.listStatus(d).toSeq.flatMap {
            case st if st.isDirectory => walk(st.getPath)
            case st if st.getPath.getName.endsWith(".parquet") => Seq(st.getPath)
            case _ => Seq.empty
          }
        walk(p).sortBy(_.toString)
      }
    files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val ft = r.getFooter
        Seq(s"file: $f",
          s"  created by: ${ft.getFileMetaData.getCreatedBy}",
          s"  schema:\n${ft.getFileMetaData.getSchema.toString.linesIterator.map("    " + _).mkString("\n")}") ++
          ft.getBlocks.asScala.zipWithIndex.flatMap { case (b, i) =>
            f"  row group $i: ${b.getRowCount} rows, ${b.getTotalByteSize} raw bytes, ${b.getCompressedSize} compressed" +:
              b.getColumns.asScala.toSeq.map { c =>
                s"    ${c.getPath}: ${c.getPrimitiveType.getPrimitiveTypeName} codec=${c.getCodec} " +
                  s"values=${c.getValueCount} encodings=${c.getEncodings.asScala.mkString(",")}"
              }
          }
      } finally r.close()
    }
  }

  /** Full report: footer describe + optional value sample. Shared by
    * this object's main and the `graft parquet-info` CLI subcommand
    * ([[Main]]; reference surface `cli/src/main.rs:330-333`). */
  def run(path: String, sample: Int): Unit = {
    val lines = describe(path)
    lines.foreach(println)
    if (lines.isEmpty)
      System.err.println(s"no parquet files found under $path")

    if (sample > 0 && lines.nonEmpty) {
      // with a pre-existing session: use an ISOLATED child session
      // (newSession shares the context but not the SQL conf), never
      // stopped — getOrCreate would instead apply this tool's runtime
      // confs (UTC zone, nanosAsLong) onto the caller's session and
      // leave them there, and stopping it would kill the caller's
      // context. Standalone: build and stop our own.
      val existing = SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession)
      val spark = existing.map(_.newSession()).getOrElse {
        val s = SparkSession.builder().master("local[2]")
          .appName("graft-parquet-info")
          .config("spark.ui.enabled", "false").getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        s
      }
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) files (the events table) read as Long —
      // same flag every other entrypoint sets (Tables.events)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try {
        val df = spark.read.parquet(path)
        df.printSchema()
        df.show(sample, truncate = false)
      } finally if (existing.isEmpty) spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      sys.error("usage: ParquetInfo <file-or-dir> [sampleRows]"))
    // same contract as the CLI subcommand's parse (Main.parseInfoArgs):
    // a clear message, not a raw NumberFormatException; negatives rejected
    val sample = args.lift(1).map { s =>
      val n = try s.toInt catch { case _: NumberFormatException =>
        sys.error(s"invalid sample row count '$s'") }
      if (n < 0) sys.error(s"invalid sample row count '$s'")
      n
    }.getOrElse(20)
    run(path, sample)
  }
}
