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
      else graft.sources.ParquetSink.partFiles(path, conf)
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
    describe(path).foreach(println)

    if (sample > 0) {
      val spark = SparkSession.builder().master("local[2]")
        .appName("graft-parquet-info")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val df = spark.read.parquet(path)
        df.printSchema()
        df.show(sample, truncate = false)
      } finally spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      sys.error("usage: ParquetInfo <file-or-dir> [sampleRows]"))
    run(path, args.lift(1).map(_.toInt).getOrElse(20))
  }
}
