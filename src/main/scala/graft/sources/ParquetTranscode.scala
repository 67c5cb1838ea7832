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
  * (`cli/src/postgres_cloner.rs:552-558`), raw interval as
  * FIXED_LEN_BYTE_ARRAY(12) + INTERVAL (`:570-584`), and halfvec in
  * float16 mode as list<FLBA(2) + FLOAT16> (`:660-666`); Spark's
  * writer can only produce variable-length BINARY / 4-byte FLOAT for
  * those values. Each is a 1:1 value re-encode: this utility rewrites
  * a file through the parquet Group API under a schema whose target
  * columns are FLBA with the right annotation — scalar BINARY columns
  * keep their exact bytes, f16 leaves (addressed by dotted path, e.g.
  * `emb.list.element`) convert FLOAT → half-precision bits — copying
  * every other column unchanged.
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

  private def retype(t: Type, path: String,
      targets: Map[String, (Int, LogicalTypeAnnotation)],
      f16Leaves: Set[String], uint32Cols: Set[String],
      annotations: Map[String, LogicalTypeAnnotation]): Type = t match {
    // footer-only annotations fold into the transcode pass so a file
    // needing both is rewritten ONCE, not re-copied a second time just
    // to change its footer
    case p: PrimitiveType if annotations.contains(path) =>
      ParquetAnnotations.annotated(p, Map(p.getName -> annotations(path)))
    case p: PrimitiveType if targets.contains(path) =>
      val (len, ann) = targets(path)
      if (p.getPrimitiveTypeName != BINARY)
        throw new IllegalArgumentException(
          s"column '$path' is ${p.getPrimitiveTypeName}, expected BINARY")
      org.apache.parquet.schema.Types
        .primitive(FIXED_LEN_BYTE_ARRAY, p.getRepetition)
        .length(len).as(ann).named(p.getName)
    case p: PrimitiveType if f16Leaves.contains(path) =>
      if (p.getPrimitiveTypeName != FLOAT)
        throw new IllegalArgumentException(
          s"float16 leaf '$path' is ${p.getPrimitiveTypeName}, expected FLOAT")
      org.apache.parquet.schema.Types
        .primitive(FIXED_LEN_BYTE_ARRAY, p.getRepetition)
        .length(2).as(LogicalTypeAnnotation.float16Type()).named(p.getName)
    case p: PrimitiveType if uint32Cols.contains(path) =>
      if (p.getPrimitiveTypeName != INT64)
        throw new IllegalArgumentException(
          s"uint32 column '$path' is ${p.getPrimitiveTypeName}, expected INT64")
      org.apache.parquet.schema.Types
        .primitive(INT32, p.getRepetition)
        .as(LogicalTypeAnnotation.intType(32, false)).named(p.getName)
    case g: GroupType =>
      // rebuild preserving repetition + logical annotation (LIST)
      val b = org.apache.parquet.schema.Types.buildGroup(g.getRepetition)
      Option(g.getLogicalTypeAnnotation).foreach(b.as)
      g.getFields.asScala
        .foreach(f => b.addField(
          retype(f, s"$path.${f.getName}", targets, f16Leaves, uint32Cols,
            annotations)))
      b.named(g.getName)
    case other => other
  }

  /** f16 bits of a float as the FLBA(2) little-endian bytes the FLOAT16
    * annotation prescribes. */
  private def f16le(f: Float): org.apache.parquet.io.api.Binary = {
    val bits = graft.functions.PgConversions.f16Bits(f)
    org.apache.parquet.io.api.Binary.fromConstantByteArray(
      Array((bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte))
  }

  /** Deep record copy between structurally identical schemas (only
    * target leaves change width); Binary values carry over as-is, so
    * FLBA targets receive the exact stored bytes, and f16 leaves
    * convert FLOAT → 2-byte half-precision. */
  private def copy(g: Group, from: GroupType, to: GroupType, path: String,
      targets: Map[String, (Int, LogicalTypeAnnotation)],
      f16Leaves: Set[String], uint32Cols: Set[String]): Group = {
    val out = new SimpleGroup(to)
    from.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
      val n = g.getFieldRepetitionCount(i)
      val fPath = s"$path.${f.getName}".stripPrefix(".")
      (0 until n).foreach { j =>
        f match {
          case p: PrimitiveType => p.getPrimitiveTypeName match {
            case INT32 => out.add(i, g.getInteger(i, j))
            case INT64 =>
              if (uint32Cols.contains(fPath)) {
                val v = g.getLong(i, j)
                if (v < 0 || v > 0xffffffffL) throw new IllegalArgumentException(
                  s"column '$fPath': value $v outside the u32 range — refusing to transcode")
                out.add(i, v.toInt) // u32 bit pattern in the int32 slot
              } else out.add(i, g.getLong(i, j))
            case FLOAT =>
              if (f16Leaves.contains(fPath)) out.add(i, f16le(g.getFloat(i, j)))
              else out.add(i, g.getFloat(i, j))
            case DOUBLE => out.add(i, g.getDouble(i, j))
            case BOOLEAN => out.add(i, g.getBoolean(i, j))
            case BINARY | FIXED_LEN_BYTE_ARRAY =>
              val b = g.getBinary(i, j)
              targets.get(fPath).foreach { case (len, _) =>
                if (b.length != len) throw new IllegalArgumentException(
                  s"column '$fPath': value of ${b.length} bytes, " +
                    s"expected exactly $len — refusing to transcode")
              }
              out.add(i, b)
            case INT96 => out.add(i, g.getInt96(i, j))
            case other: PrimitiveTypeName => throw new IllegalArgumentException(
              s"unsupported primitive $other in transcode copy")
          }
          case gt: GroupType =>
            out.add(i, copy(g.getGroup(i, j).asInstanceOf[Group], gt,
              to.getType(i).asGroupType(), fPath, targets, f16Leaves, uint32Cols))
        }
      }
    }
    out
  }

  def rewrite(in: String, out: String,
      targets: Map[String, (Int, LogicalTypeAnnotation)],
      f16Leaves: Set[String] = Set.empty,
      uint32Cols: Set[String] = Set.empty,
      annotations: Map[String, LogicalTypeAnnotation] = Map.empty,
      conf: Configuration = new Configuration(),
      rowGroupBytes: Option[Long] = None,
      compressionLevel: Option[Int] = None): Unit = {
    val inPath = new org.apache.hadoop.fs.Path(in)
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(inPath, conf))
    val (schema, kv, codec) =
      try (r.getFooter.getFileMetaData.getSchema,
        r.getFooter.getFileMetaData.getKeyValueMetaData,
        r.getFooter.getBlocks.asScala.headOption
          .map(_.getColumns.get(0).getCodec)
          .getOrElse(CompressionCodecName.ZSTD))
      finally r.close()
    val allPaths = schema.getPaths.asScala.map(_.mkString(".")).toSet ++
      schema.getFields.asScala.map(_.getName)
    val missing = (targets.keySet ++ f16Leaves ++ uint32Cols ++
      annotations.keySet) -- allPaths
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"columns not in schema: ${missing.toSeq.sorted.mkString(", ")}")
    val newSchema = new MessageType(schema.getName,
      schema.getFields.asScala
        .map(f => retype(f, f.getName, targets, f16Leaves, uint32Cols,
          annotations)).asJava)
    val reader = ParquetReader.builder(new GroupReadSupport(), inPath)
      .withConf(conf).build()
    // re-encoding all pages means the SINK's writer tuning must be
    // re-applied here, or the shipped file silently loses the requested
    // compression ratio and row-group layout: the zstd level rides the
    // writer conf (the same key the sink sets as a DataFrameWriter
    // option), row-group size is a builder knob, and high-ratio codecs
    // get the sink's 4 MiB pages (main.rs:267-276 heuristic)
    val wconf = new Configuration(conf)
    compressionLevel.foreach { lvl =>
      if (codec == CompressionCodecName.ZSTD)
        wconf.setInt("parquet.compression.codec.zstd.level", lvl)
    }
    val highRatio = codec == CompressionCodecName.GZIP ||
      codec == CompressionCodecName.BROTLI ||
      (codec == CompressionCodecName.ZSTD && compressionLevel.exists(_ > 2))
    var wb = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new org.apache.hadoop.fs.Path(out), conf))
      .withType(newSchema)
      .withConf(wconf)
      .withCompressionCodec(codec)
      // FLBA stands in for BINARY transparently and UINT_32 reads into
      // the LongType the embedded Spark schema claims, but an f16 leaf
      // changes the Spark-visible physical — drop Spark's schema JSON
      // then, so readers infer from the parquet FLOAT16 annotation
      // instead of trusting a stale `float` expectation. (Keeping the
      // JSON otherwise matters: schema INFERENCE rejects the legacy
      // INTERVAL annotation outright.)
      .withExtraMetaData(
        if (f16Leaves.isEmpty) kv
        else (kv.asScala - "org.apache.spark.sql.parquet.row.metadata").asJava)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
    rowGroupBytes.foreach(n => wb = wb.withRowGroupSize(n))
    if (highRatio) wb = wb.withPageSize(4 * 1024 * 1024)
    val writer = wb.build()
    // a failed transcode (including a failed writer.close(), which is
    // what writes the footer) must remove the half-written temp so the
    // caller's replace protocol never installs a truncated stub over
    // the good file (same contract as ParquetAnnotations.rewrite)
    def deleteTemp(): Unit = {
      val outPath = new org.apache.hadoop.fs.Path(out)
      try outPath.getFileSystem(conf).delete(outPath, false)
      catch { case _: Throwable => }
    }
    var copyFailed = false
    try {
      var g = reader.read()
      while (g != null) {
        writer.write(copy(g, schema, newSchema, "", targets, f16Leaves, uint32Cols))
        g = reader.read()
      }
    } catch { case e: Throwable =>
      copyFailed = true
      try { reader.close(); writer.close() } catch { case _: Throwable => }
      deleteTemp()
      throw e
    } finally if (!copyFailed) {
      try reader.close() catch { case _: Throwable => }
      // close failures here are NOT swallowed: the footer write is part
      // of success, and silently reporting a truncated file as done
      // would let replacePartFiles overwrite a valid part with garbage
      try writer.close() catch { case e: Throwable => deleteTemp(); throw e }
    }
  }

  /** In-place variant over every part file of a sink output path.
    * `rowGroupBytes`/`compressionLevel` should repeat the sink options
    * the files were written with, so the re-encode preserves them. */
  def rewritePath(path: String,
      targets: Map[String, (Int, LogicalTypeAnnotation)],
      f16Leaves: Set[String] = Set.empty,
      uint32Cols: Set[String] = Set.empty,
      annotations: Map[String, LogicalTypeAnnotation] = Map.empty,
      conf: Configuration = new Configuration(),
      rowGroupBytes: Option[Long] = None,
      compressionLevel: Option[Int] = None): Int =
    ParquetSink.replacePartFiles(path, "transcoding", conf) { (p, tmp) =>
      rewrite(p.toString, tmp.toString, targets, f16Leaves, uint32Cols,
        annotations, conf, rowGroupBytes, compressionLevel)
    }
}
