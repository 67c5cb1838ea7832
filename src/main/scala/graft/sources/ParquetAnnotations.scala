package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import scala.jdk.CollectionConverters._

/** Post-write logical-type annotation (closes part of SURVEY §7.4's
  * "annotations Spark can't emit" deviation).
  *
  * Spark's parquet writer controls its own logical types: json/jsonb
  * text lands as BINARY(STRING) instead of BINARY(JSON), enum text as
  * BINARY(STRING) instead of BINARY(ENUM), time-of-day micros as plain
  * INT64 instead of INT64(TIME(MICROS)) — the reference emits the
  * annotated forms (`cli/src/postgres_cloner.rs:603-607` json,
  * `:560-568` enum, `:590-600` time). The VALUES are identical; only
  * the footer's logical-type metadata differs, because an annotation
  * on the same physical type changes not one data byte. So this
  * utility rewrites the footer: copy every row group VERBATIM
  * (`ParquetFileWriter.appendFile` splices raw column chunks) under a
  * schema whose named columns carry the desired annotation.
  *
  * Only same-physical-type annotations are possible this way — JSON /
  * ENUM on BINARY, TIME(µs) on INT64. UUID (needs FLBA(16), Spark
  * wrote BINARY), INTERVAL (FLBA(12)) and FLOAT16 (FLBA(2)) change the
  * physical type and stay documented deviations.
  */
object ParquetAnnotations {

  /** Named annotations callers (and the CLI) can request. */
  val Annotations: Map[String, LogicalTypeAnnotation] = Map(
    "json" -> LogicalTypeAnnotation.jsonType(),
    "enum" -> LogicalTypeAnnotation.enumType(),
    // pg time is wall-clock time-of-day: not UTC-adjusted
    "time-micros" -> LogicalTypeAnnotation.timeType(false,
      LogicalTypeAnnotation.TimeUnit.MICROS),
    // "char" u8 rides its INT32 physical unchanged (values are 0..255)
    "uint8" -> LogicalTypeAnnotation.intType(8, false))

  private[sources] def annotated(t: Type, ann: Map[String, LogicalTypeAnnotation]): Type =
    t match {
      case p: PrimitiveType if ann.contains(p.getName) =>
        val a = ann(p.getName)
        val ok = (a, p.getPrimitiveTypeName) match {
          case (_: LogicalTypeAnnotation.JsonLogicalTypeAnnotation,
            PrimitiveType.PrimitiveTypeName.BINARY) => true
          case (_: LogicalTypeAnnotation.EnumLogicalTypeAnnotation,
            PrimitiveType.PrimitiveTypeName.BINARY) => true
          case (_: LogicalTypeAnnotation.TimeLogicalTypeAnnotation,
            PrimitiveType.PrimitiveTypeName.INT64) => true
          case (i: LogicalTypeAnnotation.IntLogicalTypeAnnotation,
            PrimitiveType.PrimitiveTypeName.INT32) => i.getBitWidth <= 32
          case _ => false
        }
        if (!ok) throw new IllegalArgumentException(
          s"annotation $a does not apply to ${p.getPrimitiveTypeName} column '${p.getName}'")
        org.apache.parquet.schema.Types
          .primitive(p.getPrimitiveTypeName, p.getRepetition)
          .as(a)
          .named(p.getName)
      case other => other
    }

  /** Rewrite `in` → `out` with `ann` (column name → annotation) applied
    * to matching TOP-LEVEL primitive columns; all row groups are copied
    * byte-for-byte. Key-value metadata (including Spark's schema JSON)
    * is preserved, so Spark reads the file back unchanged while
    * annotation-aware readers see JSON/ENUM/TIME. */
  def rewrite(in: String, out: String, ann: Map[String, LogicalTypeAnnotation],
      conf: Configuration = new Configuration()): Unit = {
    val inFile = HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(in), conf)
    val r = ParquetFileReader.open(inFile)
    val (schema, kv) =
      try (r.getFooter.getFileMetaData.getSchema,
        r.getFooter.getFileMetaData.getKeyValueMetaData)
      finally r.close()
    val missing = ann.keySet -- schema.getFields.asScala.map(_.getName).toSet
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"columns not in schema: ${missing.toSeq.sorted.mkString(", ")}")
    val newSchema = new MessageType(schema.getName,
      schema.getFields.asScala.map(annotated(_, ann)).asJava)
    val outPath = new org.apache.hadoop.fs.Path(out)
    val w = new ParquetFileWriter(
      HadoopOutputFile.fromPath(outPath, conf),
      newSchema, ParquetFileWriter.Mode.OVERWRITE,
      128L * 1024 * 1024 /* row-group size, unused for appended groups */,
      0 /* max padding */)
    try {
      w.start()
      w.appendFile(inFile)
      w.end(kv)
    } catch { case e: Throwable =>
      // a failed splice leaves a half-written temp — remove it so the
      // caller's replace protocol never sees a plausible-looking stub
      try outPath.getFileSystem(conf).delete(outPath, false)
      catch { case _: Throwable => }
      throw e
    }
  }

  /** In-place variant over every part file of a sink output path. */
  def rewritePath(path: String, ann: Map[String, LogicalTypeAnnotation],
      conf: Configuration = new Configuration()): Int =
    ParquetSink.replacePartFiles(path, "annotating", conf) {
      (p, tmp) => rewrite(p.toString, tmp.toString, ann, conf)
    }
}
