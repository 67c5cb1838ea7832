package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, MessageType, PrimitiveType, Type}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import scala.jdk.CollectionConverters._

/** Fixed-width physical-type transcoding (the second half of SURVEY
  * §7.4's annotation deviation, beyond [[ParquetAnnotations]]'
  * footer-only rewrite).
  *
  * The reference stores uuid as FIXED_LEN_BYTE_ARRAY(16) + UUID
  * (`cli/src/postgres_cloner.rs:552-558`) and raw interval as
  * FIXED_LEN_BYTE_ARRAY(12) + INTERVAL (`:570-584`); Spark's writer
  * can only produce variable-length BINARY for those values. Since
  * every value is the same fixed byte width, the conversion is a 1:1
  * value re-encode: this utility rewrites a file through the parquet
  * Group API under a schema whose target columns are FLBA(len) with
  * the right annotation, copying every other column unchanged.
  *
  * Unlike [[ParquetAnnotations.rewrite]] this re-encodes all pages
  * (it must — FLBA pages lay values out without per-value lengths),
  * single-threaded per file like the reference's own writer; at scale
  * it is a per-file map step, so a cluster job parallelizes across
  * files. Value bytes of the wrong width fail loudly rather than
  * corrupt the column.
  */
object ParquetTranscode {

  /** Named transcode targets: (fixed byte length, logical annotation). */
  val Targets: Map[String, (Int, LogicalTypeAnnotation)] = Map(
    "uuid" -> (16, LogicalTypeAnnotation.uuidType()),
    "interval" -> (12,
      LogicalTypeAnnotation.IntervalLogicalTypeAnnotation.getInstance()))

  private def retype(t: Type,
      targets: Map[String, (Int, LogicalTypeAnnotation)]): Type = t match {
    case p: PrimitiveType if targets.contains(p.getName) =>
      val (len, ann) = targets(p.getName)
      if (p.getPrimitiveTypeName != BINARY)
        throw new IllegalArgumentException(
          s"column '${p.getName}' is ${p.getPrimitiveTypeName}, expected BINARY")
      org.apache.parquet.schema.Types
        .primitive(FIXED_LEN_BYTE_ARRAY, p.getRepetition)
        .length(len).as(ann).named(p.getName)
    case other => other
  }

  /** Deep record copy between structurally identical schemas (only
    * physical widths of target leaves differ); Binary values carry
    * over as-is, so FLBA targets receive the exact stored bytes. */
  private def copy(g: Group, from: GroupType, to: GroupType,
      targets: Map[String, (Int, LogicalTypeAnnotation)]): Group = {
    val out = new SimpleGroup(to)
    from.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
      val n = g.getFieldRepetitionCount(i)
      (0 until n).foreach { j =>
        f match {
          case p: PrimitiveType => p.getPrimitiveTypeName match {
            case INT32 => out.add(i, g.getInteger(i, j))
            case INT64 => out.add(i, g.getLong(i, j))
            case FLOAT => out.add(i, g.getFloat(i, j))
            case DOUBLE => out.add(i, g.getDouble(i, j))
            case BOOLEAN => out.add(i, g.getBoolean(i, j))
            case BINARY | FIXED_LEN_BYTE_ARRAY =>
              val b = g.getBinary(i, j)
              targets.get(p.getName).foreach { case (len, _) =>
                if (b.length != len) throw new IllegalArgumentException(
                  s"column '${p.getName}': value of ${b.length} bytes, " +
                    s"expected exactly $len — refusing to transcode")
              }
              out.add(i, b)
            case INT96 => out.add(i, g.getInt96(i, j))
            case other: PrimitiveTypeName => throw new IllegalArgumentException(
              s"unsupported primitive $other in transcode copy")
          }
          case gt: GroupType =>
            out.add(i, copy(g.getGroup(i, j).asInstanceOf[Group], gt,
              to.getType(i).asGroupType(), targets))
        }
      }
    }
    out
  }

  def rewrite(in: String, out: String,
      targets: Map[String, (Int, LogicalTypeAnnotation)],
      conf: Configuration = new Configuration()): Unit = {
    val inPath = new org.apache.hadoop.fs.Path(in)
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(inPath, conf))
    val (schema, kv, codec) =
      try (r.getFooter.getFileMetaData.getSchema,
        r.getFooter.getFileMetaData.getKeyValueMetaData,
        r.getFooter.getBlocks.asScala.headOption
          .map(_.getColumns.get(0).getCodec)
          .getOrElse(CompressionCodecName.ZSTD))
      finally r.close()
    val missing = targets.keySet -- schema.getFields.asScala.map(_.getName).toSet
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"columns not in schema: ${missing.toSeq.sorted.mkString(", ")}")
    val newSchema = new MessageType(schema.getName,
      schema.getFields.asScala.map(retype(_, targets)).asJava)
    val reader = ParquetReader.builder(new GroupReadSupport(), inPath)
      .withConf(conf).build()
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new org.apache.hadoop.fs.Path(out), conf))
      .withType(newSchema)
      .withConf(conf)
      .withCompressionCodec(codec)
      .withExtraMetaData(kv)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .build()
    try {
      var g = reader.read()
      while (g != null) {
        writer.write(copy(g, schema, newSchema, targets))
        g = reader.read()
      }
    } finally { reader.close(); writer.close() }
  }

  /** In-place variant over every part file of a sink output path. */
  def rewritePath(path: String,
      targets: Map[String, (Int, LogicalTypeAnnotation)],
      conf: Configuration = new Configuration()): Int = {
    val parts = ParquetSink.partFiles(path, conf)
    parts.foreach { p =>
      val tmp = new org.apache.hadoop.fs.Path(
        p.getParent, s".${p.getName}.transcoding")
      val fs = p.getFileSystem(conf)
      rewrite(p.toString, tmp.toString, targets, conf)
      if (!fs.delete(p, false) || !fs.rename(tmp, p))
        throw new java.io.IOException(s"failed to replace $p with transcoded copy")
    }
    parts.length
  }
}
