package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.{ParquetAnnotations, ParquetSink, PostgresDialect}
import java.nio.file.Files

/** Reader seam, writer options round-trip, dialect mappings, CLI parse. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- Reader (O1/O2)
  test("ParquetDirReader: table scan and query scan") {
    val r = Tables.reader(TestSpark.sfDir)
    assert(r.table(spark, "region").count() == 5)
    assert(r.query(spark, "SELECT COUNT(*) AS n FROM region").collect()(0).getLong(0) == 5)
    // a dir holding only SOME tables (or extra ones) still query-scans:
    // absent testdata names must not fail view registration
    val partial = Files.createTempDirectory("pdir").toString
    r.table(spark, "region").write.parquet(s"$partial/only_table.parquet")
    val pr = Tables.reader(partial)
    assert(pr.query(spark, "SELECT COUNT(*) AS n FROM only_table")
      .collect()(0).getLong(0) == 5)
  }

  test("JsonlDirReader: jsonl ingest → table/query scans and export to parquet") {
    val dir = Files.createTempDirectory("jsonl").toString
    val w = new java.io.PrintWriter(s"$dir/docs.jsonl")
    w.println("""{"doc_id": 1, "text": "hello world", "lang": "en"}""")
    w.println("""{"doc_id": 2, "text": "bonjour", "lang": "fr"}""")
    w.close()
    val r = new graft.sources.JsonlDirReader(dir)
    assert(r.table(spark, "docs").count() == 2)
    assert(r.query(spark, "SELECT COUNT(*) AS n FROM docs WHERE lang = 'en'")
      .collect()(0).getLong(0) == 1)
    // gz branch: compressed shards read transparently
    val gz = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/zdocs.jsonl.gz")))
    gz.println("""{"doc_id": 9, "text": "gz row"}""")
    gz.close()
    assert(r.table(spark, "zdocs").count() == 1)
    assert(r.query(spark, "SELECT COUNT(*) AS n FROM zdocs")
      .collect()(0).getLong(0) == 1)
    // full export path over the jsonl: scheme
    val out = Files.createTempDirectory("jexp").toString + "/docs"
    val stats = Main.runExport(spark, Main.Args(
      outputFile = out,
      query = Some("SELECT doc_id, text FROM docs ORDER BY doc_id"),
      connection = Some(s"jsonl:$dir"), quiet = true), Map.empty)
    assert(stats.rows == 2)
    assert(spark.read.parquet(out).columns.toSeq == Seq("doc_id", "text"))
  }

  // ---- PostgresDialect (O4)
  test("CsvDirReader: header csv → table/query scans; gz and ambiguity rules") {
    val dir = Files.createTempDirectory("csvdir").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/people.csv"),
      "id,name\n1,ada\n2,grace\n3,edsger\n".getBytes)
    val gzPath = s"$dir/pets.csv.gz"
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gzPath))
    gz.write("id,animal\n1,cat\n2,dog\n".getBytes); gz.close()
    val r = new graft.sources.CsvDirReader(dir)
    assert(r.table(spark, "people").count() == 3)
    assert(r.table(spark, "pets").count() == 2) // .gz branch
    val joined = r.query(spark,
      "SELECT p.name, q.animal FROM people p JOIN pets q ON p.id = q.id ORDER BY p.id")
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(joined == Seq(("ada", "cat"), ("grace", "dog")))
    // both plain and gz present → ambiguous
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/pets.csv"),
      "id,animal\n9,ant\n".getBytes)
    intercept[IllegalArgumentException](r.table(spark, "pets"))
    intercept[IllegalArgumentException](r.query(spark, "SELECT * FROM pets"))
    // …but a query that never mentions the ambiguous pair is untouched
    // by it (the "tables the query never references" contract)
    assert(r.query(spark, "SELECT count(*) AS c FROM people")
      .collect()(0).getLong(0) == 3)
  }

  test("OrcDirReader: native ORC table/query scans round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orcdir").toString
    Seq((1L, "ada"), (2L, "grace"), (3L, "edsger")).toDF("id", "name")
      .coalesce(1).write.orc(s"$dir/people.orc")
    Seq((1L, "cat"), (2L, "dog")).toDF("id", "animal")
      .coalesce(1).write.orc(s"$dir/pets.orc")
    val r = new graft.sources.OrcDirReader(dir, Seq("people"))
    assert(r.table(spark, "people").count() == 3)
    // discovered extras (pets is not in tableNames) register too, and
    // unmentioned tables are never touched
    val joined = r.query(spark,
      "SELECT p.name, q.animal FROM people p JOIN pets q ON p.id = q.id ORDER BY p.id")
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(joined == Seq(("ada", "cat"), ("grace", "dog")))
  }

  test("dialect maps pg type names per §2.3") {
    def m(tn: String, sqlType: Int = java.sql.Types.OTHER) =
      PostgresDialect.getCatalystType(sqlType, tn, 0, new MetadataBuilder)
    assert(m("int2").contains(ShortType))
    assert(m("oid").contains(LongType))      // T4: u32 widened
    assert(m("money").contains(StringType)) // '$1,234.56' → recipe parses
    assert(m("timestamptz").contains(TimestampType))
    assert(m("timestamp").contains(TimestampNTZType))
    assert(m("uuid").contains(StringType))
    assert(m("vector").contains(StringType)) // decoded by PgConversions
    assert(m("some_enum_type").contains(StringType)) // OTHER → text
    assert(m("_int4", java.sql.Types.ARRAY).contains(StringType)) // arrays → text transfer
    assert(m("_int4range", java.sql.Types.ARRAY).contains(StringType))
    assert(PostgresDialect.canHandle("jdbc:postgresql://h/db"))
    assert(!PostgresDialect.canHandle("jdbc:mysql://h/db"))
  }

  // ---- ParquetSink (O16/O19)
  test("sink: codec + single-file round-trip via footer") {
    val out = Files.createTempDirectory("sink").toString + "/t"
    val df = spark.range(1000).toDF("id")
    val stats = ParquetSink.write(df, out, ParquetSink.SinkOptions(
      compression = "zstd", compressionLevel = Some(3)))
    assert(stats.rows == 1000 && stats.files == 1)
    val f = ParquetSink.partFiles(out).head
    assert(ParquetSink.fileCodec(f) == "zstd")
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("sink: write restores the caller's job group instead of clearing it") {
    // a caller using job-group-based cancellation must keep its group
    // (and description/interruptOnCancel) across a sink write — the
    // sink's own scoped group is transient
    val sc = spark.sparkContext
    sc.setJobGroup("caller-group", "caller-desc", interruptOnCancel = true)
    try {
      val out = Files.createTempDirectory("sinkjg").toString + "/t"
      ParquetSink.write(spark.range(10).toDF("id"), out,
        ParquetSink.SinkOptions(quiet = true))
      assert(sc.getLocalProperty("spark.jobGroup.id") == "caller-group")
      assert(sc.getLocalProperty("spark.job.description") == "caller-desc")
      assert(sc.getLocalProperty("spark.job.interruptOnCancel") == "true")
    } finally sc.clearJobGroup()
    // and with NO caller group, the write leaves none behind
    val out2 = Files.createTempDirectory("sinkjg2").toString + "/t"
    ParquetSink.write(spark.range(10).toDF("id"), out2,
      ParquetSink.SinkOptions(quiet = true))
    assert(sc.getLocalProperty("spark.jobGroup.id") == null)
    // a job DESCRIPTION set without any group must also survive —
    // clearJobGroup would wipe it as a unit with the group
    sc.setJobDescription("desc-only")
    try {
      val out3 = Files.createTempDirectory("sinkjg3").toString + "/t"
      ParquetSink.write(spark.range(10).toDF("id"), out3,
        ParquetSink.SinkOptions(quiet = true))
      assert(sc.getLocalProperty("spark.job.description") == "desc-only")
      assert(sc.getLocalProperty("spark.jobGroup.id") == null)
    } finally sc.setJobDescription(null)
  }

  test("parquet-info: report carries schema, row-group stats, codec, encodings") {
    val out = Files.createTempDirectory("pinfo").toString + "/t"
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    ParquetSink.write(df, out, ParquetSink.SinkOptions(compression = "snappy"))
    val report = ParquetInfo.describe(out)
    assert(report.exists(_.startsWith("file: ")))
    val schemaLine = report.find(_.contains("schema:")).getOrElse("")
    assert(schemaLine.contains("id") && schemaLine.contains("name"))
    assert(report.exists(l => l.contains("row group 0") && l.contains("500 rows")))
    val colLines = report.filter(_.contains("codec=SNAPPY"))
    assert(colLines.size == 2, s"expected 2 column chunks, got:\n${report.mkString("\n")}")
    assert(colLines.forall(_.contains("values=500")))
    assert(colLines.forall(_.contains("encodings=")))
    // a directory of ordinarily-named files (the testdata layout:
    // events.parquet, orders.parquet — not Spark's part-*) must report
    // them all, not silently print nothing
    val lake = Files.createTempDirectory("pinfodir").toString
    Seq((1L, "x")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$lake/events.parquet")
    Seq((2L, "y")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$lake/orders.parquet")
    val lakeReport = ParquetInfo.describe(lake)
    assert(lakeReport.count(_.startsWith("file: ")) == 2,
      s"expected both lake files reported:\n${lakeReport.mkString("\n")}")
  }

  test("parquet-info: CLI subcommand parse + describe on a written file") {
    // the subcommand surface: `graft parquet-info <file> [sampleRows]`
    // (reference: hidden subcommand, cli/src/main.rs:330-333)
    import Main.{parseInfoArgs, InfoArgs}
    assert(parseInfoArgs(Seq("/tmp/f.parquet")) == InfoArgs("/tmp/f.parquet", 20))
    assert(parseInfoArgs(Seq("/tmp/f.parquet", "0")) == InfoArgs("/tmp/f.parquet", 0))
    intercept[IllegalArgumentException](parseInfoArgs(Nil))
    intercept[IllegalArgumentException](parseInfoArgs(Seq("f", "abc")))
    intercept[IllegalArgumentException](parseInfoArgs(Seq("f", "-1")))
    intercept[IllegalArgumentException](parseInfoArgs(Seq("f", "5", "extra")))
    // and the describe it dispatches to, on a real fixture
    val out = Files.createTempDirectory("pcli").toString + "/t"
    import spark.implicits._
    ParquetSink.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), out,
      ParquetSink.SinkOptions(compression = "snappy"))
    val report = ParquetInfo.describe(parseInfoArgs(Seq(out)).path)
    assert(report.exists(_.startsWith("file: ")))
    assert(report.exists(l => l.contains("row group 0") && l.contains("2 rows")))
  }

  test("annotations: JSON/ENUM/TIME logical types stamped without touching data") {
    val dir = Files.createTempDirectory("ann").toString
    import spark.implicits._
    val df = Seq(
      (1L, """{"a":1}""", "ok", 3723000000L),
      (2L, """{"b":[2,3]}""", "bad", 82800000000L))
      .toDF("id", "payload", "status", "t_us")
    ParquetSink.write(df, s"$dir/t", ParquetSink.SinkOptions())
    val n = ParquetAnnotations.rewritePath(s"$dir/t", Map(
      "payload" -> ParquetAnnotations.Annotations("json"),
      "status" -> ParquetAnnotations.Annotations("enum"),
      "t_us" -> ParquetAnnotations.Annotations("time-micros")))
    assert(n == 1)
    // footer carries the annotations…
    val f = ParquetSink.partFiles(s"$dir/t").head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      f, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema = try r.getFooter.getFileMetaData.getSchema finally r.close()
    def annOf(c: String) = Option(schema.getType(Seq(c): _*)
      .asPrimitiveType.getLogicalTypeAnnotation).map(_.toString).getOrElse("none")
    assert(annOf("payload") == "JSON")
    assert(annOf("status") == "ENUM")
    assert(annOf("t_us").startsWith("TIME"))
    assert(annOf("id") == "none")
    // …and the data bytes are untouched: Spark reads identical rows
    val back = spark.read.parquet(s"$dir/t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(back == Seq(
      (1L, """{"a":1}""", "ok", 3723000000L),
      (2L, """{"b":[2,3]}""", "bad", 82800000000L)))
    // unknown column / wrong physical type are rejected loudly
    intercept[IllegalArgumentException](ParquetAnnotations.rewritePath(s"$dir/t",
      Map("nope" -> ParquetAnnotations.Annotations("json"))))
    intercept[IllegalArgumentException](ParquetAnnotations.rewritePath(s"$dir/t",
      Map("id" -> ParquetAnnotations.Annotations("json"))))
  }

  test("transcode: uuid/interval binary → FLBA(16)/FLBA(12) with annotations") {
    val dir = Files.createTempDirectory("txc").toString
    import spark.implicits._
    import graft.sources.ParquetTranscode
    def b(n: Int, seed: Int) = Array.tabulate(n)(i => (seed + i).toByte)
    val df = Seq(
      (1L, b(16, 10), b(12, 40), Seq("x", "y"), "keep", 4294967295L),
      (2L, b(16, 20), b(12, 50), Seq.empty[String], "also", 0L),
      (3L, null.asInstanceOf[Array[Byte]], null.asInstanceOf[Array[Byte]],
        null.asInstanceOf[Seq[String]], null.asInstanceOf[String], 77L))
      .toDF("id", "u", "iv", "tags", "note", "o")
    ParquetSink.write(df, s"$dir/t", ParquetSink.SinkOptions())
    ParquetTranscode.rewritePath(s"$dir/t", Map(
      "u" -> ParquetTranscode.Targets("uuid"),
      "iv" -> ParquetTranscode.Targets("interval")),
      uint32Cols = Set("o"),
      // footer annotations fold into the same single rewrite pass
      annotations = Map("note" -> ParquetAnnotations.Annotations("enum")))
    val f = ParquetSink.partFiles(s"$dir/t").head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      f, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema = try r.getFooter.getFileMetaData.getSchema finally r.close()
    val u = schema.getType(Seq("u"): _*).asPrimitiveType
    assert(u.getPrimitiveTypeName.toString == "FIXED_LEN_BYTE_ARRAY")
    assert(u.getTypeLength == 16 && u.getLogicalTypeAnnotation.toString == "UUID")
    val iv = schema.getType(Seq("iv"): _*).asPrimitiveType
    assert(iv.getTypeLength == 12 &&
      iv.getLogicalTypeAnnotation.toString.startsWith("INTERVAL"))
    val o = schema.getType(Seq("o"): _*).asPrimitiveType
    assert(o.getPrimitiveTypeName.toString == "INT32")
    assert(o.getLogicalTypeAnnotation.toString == "INTEGER(32,false)")
    assert(schema.getType(Seq("note"): _*).asPrimitiveType
      .getLogicalTypeAnnotation.toString == "ENUM")
    // values survive byte-for-byte, nulls and the untouched columns too
    val back = spark.read.parquet(s"$dir/t").orderBy("id").collect()
    assert(back(0).getAs[Array[Byte]]("u").toSeq == b(16, 10).toSeq)
    assert(back(0).getAs[Array[Byte]]("iv").toSeq == b(12, 40).toSeq)
    // Spark reads UINT_32 back as LongType with the full u32 range
    assert(back(0).getAs[Long]("o") == 4294967295L)
    assert(back(1).getAs[Long]("o") == 0L && back(2).getAs[Long]("o") == 77L)
    assert(back(0).getSeq[String](back(0).fieldIndex("tags")).toList == List("x", "y"))
    assert(back(1).getSeq[String](back(1).fieldIndex("tags")).toList == Nil)
    assert(back(2).isNullAt(back(2).fieldIndex("u")))
    assert(back(2).isNullAt(back(2).fieldIndex("tags")))
    // wrong-width values are refused, not corrupted
    val df2 = Seq((1L, b(15, 0))).toDF("id", "u")
    ParquetSink.write(df2, s"$dir/bad", ParquetSink.SinkOptions())
    intercept[IllegalArgumentException](ParquetTranscode.rewritePath(
      s"$dir/bad", Map("u" -> ParquetTranscode.Targets("uuid"))))
    // out-of-u32-range values are refused too
    val df3 = Seq((1L, -5L)).toDF("id", "o")
    ParquetSink.write(df3, s"$dir/bad2", ParquetSink.SinkOptions())
    intercept[IllegalArgumentException](ParquetTranscode.rewritePath(
      s"$dir/bad2", Map.empty, uint32Cols = Set("o")))
  }

  test("transcode: re-encode honors the sink's row-group size and codec") {
    // the rewrite re-encodes every page, so the sink's writer tuning
    // must be threaded through or the shipped file silently reverts to
    // parquet-mr defaults (128 MiB groups, default zstd level)
    val dir = Files.createTempDirectory("txctune").toString
    import graft.sources.ParquetTranscode
    val hconf = spark.sparkContext.hadoopConfiguration
    ParquetSink.write(spark.range(200000).toDF("id"), s"$dir/t",
      ParquetSink.SinkOptions(compression = "zstd", compressionLevel = Some(9)))
    def blocks(p: org.apache.hadoop.fs.Path): Int = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.size finally r.close()
    }
    val f = ParquetSink.partFiles(s"$dir/t").head
    assert(blocks(f) == 1) // fits one default-size group before the rewrite
    ParquetTranscode.rewritePath(s"$dir/t", Map.empty, conf = hconf,
      rowGroupBytes = Some(64 * 1024), compressionLevel = Some(9))
    val f2 = ParquetSink.partFiles(s"$dir/t").head
    assert(blocks(f2) > 1) // the requested (small) group size took effect
    assert(ParquetSink.fileCodec(f2) == "zstd") // codec preserved
    assert(spark.read.parquet(s"$dir/t").count() == 200000)
  }

  test("transcode: halfvec float16 mode — list<float> → list<FLBA(2)+FLOAT16>") {
    val dir = Files.createTempDirectory("f16").toString
    import spark.implicits._
    import graft.sources.ParquetTranscode
    // values already f16-rounded (as halfvecFromText guarantees)
    val df = Seq(
      (1L, Seq(1.0f, -2.5f, 0.0f)),
      (2L, Seq(65504.0f)),            // f16 max finite
      (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "emb")
    ParquetSink.write(df, s"$dir/t", ParquetSink.SinkOptions())
    ParquetTranscode.rewritePath(s"$dir/t", Map.empty,
      f16Leaves = Set("emb.list.element"))
    val f = ParquetSink.partFiles(s"$dir/t").head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      f, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema = try r.getFooter.getFileMetaData.getSchema finally r.close()
    val leaf = schema.getType(Seq("emb", "list", "element"): _*).asPrimitiveType
    assert(leaf.getPrimitiveTypeName.toString == "FIXED_LEN_BYTE_ARRAY")
    assert(leaf.getTypeLength == 2)
    assert(leaf.getLogicalTypeAnnotation.toString == "FLOAT16")
    // Spark itself cannot read FLOAT16 parquet (the very reason this
    // storage mode needs a post-write transcode) — verify the stored
    // half-precision bytes through the parquet Group API instead,
    // exactly as f16-aware readers (pyarrow, duckdb) consume them.
    def f16(f: Float): List[Byte] = {
      val bits = graft.functions.PgConversions.f16Bits(f)
      List((bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte)
    }
    val reader = org.apache.parquet.hadoop.ParquetReader.builder(
      new org.apache.parquet.hadoop.example.GroupReadSupport(), f).build()
    try {
      val rows = Iterator.continually(reader.read()).takeWhile(_ != null).toList
      assert(rows.size == 3)
      def elems(g: org.apache.parquet.example.data.Group): List[List[Byte]] = {
        val lst = g.getGroup("emb", 0)
        (0 until lst.getFieldRepetitionCount(0)).toList.map(i =>
          lst.getGroup(0, i).getBinary(0, 0).getBytes.toList)
      }
      assert(elems(rows(0)) == List(f16(1.0f), f16(-2.5f), f16(0.0f)))
      assert(elems(rows(1)) == List(f16(65504.0f)))
      assert(rows(2).getFieldRepetitionCount("emb") == 0) // NULL list survives
    } finally reader.close()
  }

  test("replacePartFiles: recovers the artifacts of a crashed prior pass") {
    import org.apache.hadoop.fs.Path
    val out = Files.createTempDirectory("replc").toString + "/t"
    import spark.implicits._
    ParquetSink.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), out,
      ParquetSink.SinkOptions(compression = "snappy"))
    val conf = ParquetSink.hadoopConf
    val p = ParquetSink.partFiles(out, conf).head
    val fs = p.getFileSystem(conf)
    // crash shape 1: died between rename(p, bak) and rename(tmp, p) —
    // the .bak IS the committed copy and the part file is gone
    val bak = new Path(p.getParent, s".${p.getName}.bak")
    assert(fs.rename(p, bak))
    // crash shape 2: a stale rewrite temp from the dead pass
    val tmp = new Path(p.getParent, s".${p.getName}.rewr")
    val os = fs.create(tmp); os.write(1); os.close()
    // the next pass must first restore the original, drop the garbage,
    // then replace normally instead of failing on a healthy directory
    val n = ParquetSink.replacePartFiles(out, "rewr", conf) { (src, dst) =>
      val in = fs.open(src)
      val o = fs.create(dst)
      org.apache.hadoop.io.IOUtils.copyBytes(in, o, 65536, true)
    }
    assert(n == 1)
    assert(!fs.exists(bak) && !fs.exists(tmp))
    assert(spark.read.parquet(out).count() == 2)
  }

  test("sink: sort-by layout — files cover disjoint, ordered key ranges") {
    val out = Files.createTempDirectory("sorted").toString + "/t"
    import spark.implicits._
    // write in scrambled order; the layout must still come out clustered
    val df = (0 until 10000).map(i => ((i * 7919) % 10000).toLong).toDF("id")
      .repartition(8)
    val stats = ParquetSink.write(df, out, ParquetSink.SinkOptions(
      singleFile = false, sortBy = Seq("id"), sortFiles = Some(4)))
    assert(stats.rows == 10000)
    val ranges = ParquetSink.partFiles(out)
      .flatMap(f => ParquetSink.columnRange(f, "id"))
      .map { case (lo, hi) => (lo.asInstanceOf[Long], hi.asInstanceOf[Long]) }
      .sortBy(_._1)
    assert(ranges.size >= 2, "expected a multi-file clustered layout")
    // tight + disjoint: each file's max is below the next file's min,
    // so a point predicate prunes to exactly one file via footer stats
    ranges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping file ranges: $ranges")
    }
    assert(ranges.head._1 == 0L && ranges.last._2 == 9999L)
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("sink: multi-file with maxRecordsPerFile; gzip codec") {
    val out = Files.createTempDirectory("sink").toString + "/t"
    val df = spark.range(1000).toDF("id")
    val stats = ParquetSink.write(df, out, ParquetSink.SinkOptions(
      compression = "gzip", singleFile = false, maxRecordsPerFile = Some(300)))
    assert(stats.rows == 1000 && stats.files >= 4)
    assert(ParquetSink.fileCodec(ParquetSink.partFiles(out).head) == "gzip")
  }

  test("sink: lzo and unknown codecs rejected with a clear message") {
    val e = intercept[IllegalArgumentException](ParquetSink.codecFor("lzo"))
    assert(e.getMessage.contains("lzo"))
    intercept[IllegalArgumentException](ParquetSink.codecFor("nope"))
  }

  // ---- end-to-end export: single ordered file (§7.5-4)
  test("export: ordered query → single parquet file, order preserved") {
    val out = java.nio.file.Files.createTempDirectory("exp").toString + "/region"
    val stats = Main.runExport(spark, Main.Args(
      outputFile = out,
      query = Some("SELECT r_regionkey, r_name FROM region ORDER BY r_name DESC"),
      connection = Some(s"dir:${TestSpark.sfDir}"),
      quiet = true), Map.empty)
    assert(stats.rows == 5 && stats.files == 1)
    val names = spark.read.parquet(out).collect().map(_.getString(1)).toSeq
    assert(names == names.sorted.reverse) // file row order = query order
  }

  test("export: --sort-by clustered layout end-to-end through runExport") {
    val out = java.nio.file.Files.createTempDirectory("exp").toString + "/li"
    val stats = Main.runExport(spark, Main.Args(
      outputFile = out,
      table = Some("lineitem"),
      connection = Some(s"dir:${TestSpark.sfDir}"),
      multiFile = true, sortBy = Seq("l_orderkey"), sortFiles = Some(3),
      quiet = true), Map.empty)
    assert(stats.rows > 0 && stats.files >= 2)
    val ranges = ParquetSink.partFiles(out)
      .flatMap(f => ParquetSink.columnRange(f, "l_orderkey"))
      .map { case (lo, hi) => (lo.asInstanceOf[Long], hi.asInstanceOf[Long]) }
      .sortBy(_._1)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping clustered ranges: $ranges")
    }
  }

  // ---- CLI arg surface (O3/O22 error-message parity)
  test("cli: exactly one of table/query; env-var connection resolution") {
    import Main.parseArgs
    val ok = parseArgs(Seq("export", "-o", "/tmp/x", "--table", "t1",
      "--compression", "gzip", "--numeric-handling", "decimal"), Map.empty)
    assert(ok.table.contains("t1") && ok.compression == "gzip")
    assert(ok.settings.numericHandling == "decimal")

    val both = intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a", "--query", "b"), Map.empty))
    assert(both.getMessage.contains("not both"))
    val neither = intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x"), Map.empty))
    assert(neither.getMessage.contains("must be specified"))
    intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a", "--compression", "lzo"), Map.empty))

    val conflict = intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a",
        "--connection", "jdbc:postgresql://h/db", "--host", "h2"), Map.empty))
    assert(conflict.getMessage.contains("cannot be combined"))
    val disc = parseArgs(Seq("export", "-o", "x", "--table", "a",
      "--host", "db.example", "--port", "5544", "--dbname", "mydb"), Map.empty)
    assert(Main.discreteUrl(disc).contains("jdbc:postgresql://db.example:5544/mydb"))

    assert(graft.sources.JdbcReader.resolveUrl(None,
      Map("DATABASE_URL" -> "jdbc:postgresql://a", "POSTGRES_URL" -> "jdbc:postgresql://b"))
      .contains("jdbc:postgresql://a"))
    val dirReader = Main.readerFor(Main.Args(connection = Some(s"dir:${TestSpark.sfDir}")), Map.empty)
    assert(dirReader.table(spark, "nation").count() == 25)
  }

  test("cli: half-specified discrete pair, bad knob values fail at parse time") {
    import Main.parseArgs
    // --dbname (or --port) without --host used to be silently ignored,
    // letting the export fall through to DATABASE_URL and target a
    // different database than the user named
    val half = intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a", "--dbname", "mydb"), Map.empty))
    assert(half.getMessage.contains("--host and --dbname"))
    intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a", "--port", "5433"), Map.empty))
    // Spark reads maxRecordsPerFile 0/negative as NO limit — reject
    intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a",
        "--max-records-per-file", "0"), Map.empty))
    // decimal target must be constructible; fail before Spark startup
    intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a",
        "--decimal-precision", "0"), Map.empty))
    intercept[IllegalArgumentException](
      parseArgs(Seq("export", "-o", "x", "--table", "a",
        "--decimal-precision", "10", "--decimal-scale", "11"), Map.empty))
  }

  test("cli: libpq-form postgres:// URLs translate to the pgjdbc form") {
    import Main.libpqToJdbc
    // the standard DATABASE_URL shape the reference connects with
    assert(libpqToJdbc("postgres://u:p@h:5433/db?sslmode=require") ==
      "jdbc:postgresql://h:5433/db?user=u&password=p&sslmode=require")
    assert(libpqToJdbc("postgresql://h/db") == "jdbc:postgresql://h/db")
    // path-less: pgjdbc's parseURL requires the trailing '/'
    assert(libpqToJdbc("postgres://u@h") == "jdbc:postgresql://h/?user=u")
    // percent-encoding carries through raw (both sides URL-decode)
    assert(libpqToJdbc("postgres://u:p%40ss@h/db") ==
      "jdbc:postgresql://h/db?user=u&password=p%40ss")
    // query-active characters legal raw in userinfo are encoded — a
    // password with '&' must not shear into a stray parameter, and a
    // raw '+' must not URL-decode to a space on the pgjdbc side
    assert(libpqToJdbc("postgres://u:p&w@h/db") ==
      "jdbc:postgresql://h/db?user=u&password=p%26w")
    assert(libpqToJdbc("postgres://u:a+b@h/db") ==
      "jdbc:postgresql://h/db?user=u&password=a%2Bb")
    // unparseable URLs fail in the one-line-error class, not with a
    // raw URISyntaxException stack trace
    val badUri = intercept[IllegalArgumentException](
      libpqToJdbc("postgres://h/my db"))
    assert(badUri.getMessage.contains("cannot parse"))
    // readerFor accepts the env fallback in libpq form (the reference's
    // own DATABASE_URL shape) instead of rejecting it as unsupported
    val r = Main.readerFor(
      Main.Args(outputFile = "x", table = Some("t")),
      Map("DATABASE_URL" -> "postgres://u:p@h/db"))
    assert(r.isInstanceOf[graft.sources.JdbcReader])
  }

  // ---- O3 TLS/password surface (cli/src/main.rs:104-120,
  // postgres_cloner.rs:136-292)
  test("cli: sslmode/cert args → pgjdbc property map") {
    import graft.sources.JdbcReader.tlsProperties
    // defaults: prefer without certs; root cert implies require, which
    // maps to pgjdbc verify-ca so the chain is actually checked
    assert(tlsProperties(None) == Map("sslmode" -> "prefer"))
    assert(tlsProperties(Some("disable")) == Map("sslmode" -> "disable"))
    assert(tlsProperties(Some("require")) == Map("sslmode" -> "require"))
    assert(tlsProperties(None, Seq("/ca.crt")) ==
      Map("sslmode" -> "verify-ca", "sslrootcert" -> "/ca.crt"))
    assert(tlsProperties(Some("require"), Seq("/ca.crt"),
      Some("/c.pem"), Some("/k.pem")) ==
      Map("sslmode" -> "verify-ca", "sslrootcert" -> "/ca.crt",
        "sslcert" -> "/c.pem", "sslkey" -> "/k.pem"))
    // client cert and key must come together (reference error wording)
    val pair = intercept[IllegalArgumentException](
      tlsProperties(None, Nil, Some("/c.pem"), None))
    assert(pair.getMessage.contains("must both be specified"))
    intercept[IllegalArgumentException](tlsProperties(Some("verify-full")))
    intercept[IllegalArgumentException](
      tlsProperties(None, Seq("/a.crt", "/b.crt")))
  }

  test("cli: TLS/password args parse with aliases; --connection conflicts") {
    import Main.parseArgs
    val a = parseArgs(Seq("export", "-o", "x", "--table", "t",
      "--host", "h", "--dbname", "db", "--password", "pw",
      "--tls-mode", "require", "--ssl-root-cert", "/ca.crt",
      "--tls-client-cert", "/c.pem", "--ssl-client-key", "/k.pem"), Map.empty)
    assert(a.password.contains("pw") && a.sslmode.contains("require"))
    assert(a.sslRootCerts == Seq("/ca.crt"))
    assert(a.sslClientCert.contains("/c.pem") && a.sslClientKey.contains("/k.pem"))

    // the reference's full conflict list: user/password/sslmode too
    for (extra <- Seq(Seq("--user", "u"), Seq("--password", "p"),
        Seq("--sslmode", "require"))) {
      val e = intercept[IllegalArgumentException](parseArgs(
        Seq("export", "-o", "x", "--table", "t",
          "--connection", "jdbc:postgresql://h/db") ++ extra, Map.empty))
      assert(e.getMessage.contains("cannot be combined"))
    }
    // bad TLS combinations fail at parse time
    intercept[IllegalArgumentException](parseArgs(
      Seq("export", "-o", "x", "--table", "t", "--sslmode", "bogus"), Map.empty))
    intercept[IllegalArgumentException](parseArgs(
      Seq("export", "-o", "x", "--table", "t", "--ssl-client-cert", "/c.pem"),
      Map.empty))
    // discrete path needs BOTH host and dbname (reference validate())
    val e2 = intercept[IllegalArgumentException](Main.readerFor(
      parseArgs(Seq("export", "-o", "x", "--table", "t", "--host", "h"),
        Map.empty), Map.empty))
    assert(e2.getMessage.contains("--dbname"))
  }

  test("cli: password resolution order — arg, then PGPASSWORD") {
    val a = Main.Args(password = Some("argpw"))
    assert(Main.resolvePassword(a, Map("PGPASSWORD" -> "envpw")).contains("argpw"))
    assert(Main.resolvePassword(Main.Args(), Map("PGPASSWORD" -> "envpw"))
      .contains("envpw"))
    // no console under sbt → no prompt, no password
    assert(Main.resolvePassword(Main.Args(), Map.empty).isEmpty)
  }

  test("cli: handling values validated at parse time, aliases normalized") {
    import Main.parseArgs
    def p(extra: String*) =
      parseArgs(Seq("export", "-o", "x", "--table", "t") ++ extra, Map.empty)
    // reference clap aliases (postgres_cloner.rs:94-112) → canonical
    assert(p("--numeric-handling", "float64").settings.numericHandling == "double")
    assert(p("--array-handling", "dimensions+lowerbound").settings.arrayHandling == "dims+lb")
    assert(p("--json-handling", "text-marked-as-json").settings.jsonHandling == "text-marked-json")
    // a bad spelling fails the parse — not only when the type appears
    val e = intercept[IllegalArgumentException](p("--json-handling", "bogus"))
    assert(e.getMessage.contains("--json-handling") && e.getMessage.contains("bogus"))
    intercept[IllegalArgumentException](p("--enum-handling", "integer"))
    intercept[IllegalArgumentException](p("--interval-handling", "text"))
  }

  test("cli: -h as an option value is consumed, not hijacked into help") {
    import Main.parseArgs
    val a = parseArgs(Seq("export", "-o", "x", "--table", "t",
      "--host", "h", "--dbname", "db", "--password", "-h"), Map.empty)
    assert(a.password.contains("-h"))
    // -h in flag position still prints export help
    intercept[Main.CliExit](parseArgs(
      Seq("export", "-o", "x", "--table", "t", "-h"), Map.empty))
  }

  test("dialect: numeric transfers as text so NaN reaches the recipe layer") {
    // pgjdbc's getBigDecimal throws on PG 'NaN' before any conversion
    // could run (r05 review #1); text keeps full precision for p>38 too
    assert(PostgresDialect.getCatalystType(
      java.sql.Types.NUMERIC, "numeric", 0, new MetadataBuilder)
      .contains(StringType))
  }

  test("cli: parallel scan/sink flags parse; partition pair enforced") {
    import Main.parseArgs
    val a = parseArgs(Seq("export", "-o", "x", "--table", "t",
      "--partition-column", "id", "--partitions", "8",
      "--partition-by", "lang", "--partition-by", "source",
      "--max-records-per-file", "1000"), Map.empty)
    assert(a.partitionColumn.contains("id") && a.partitions.contains(8))
    assert(a.partitionBy == Seq("lang", "source") && a.multiFile)
    assert(a.maxRecordsPerFile.contains(1000L))
    val s = Main.parseArgs(Seq("export", "-o", "x", "--table", "t",
      "--sort-by", "ts", "--sort-by", "id", "--sort-files", "16"), Map.empty)
    assert(s.sortBy == Seq("ts", "id") && s.sortFiles.contains(16) && s.multiFile)
    // pair rule, like ssl cert+key
    val e = intercept[IllegalArgumentException](parseArgs(
      Seq("export", "-o", "x", "--table", "t", "--partitions", "8"), Map.empty))
    assert(e.getMessage.contains("must both be specified"))
    intercept[IllegalArgumentException](parseArgs(
      Seq("export", "-o", "x", "--table", "t",
        "--partition-column", "id", "--partitions", "0"), Map.empty))
  }

  test("export: hive-partitioned multi-file output; recursive stats") {
    val out = java.nio.file.Files.createTempDirectory("exp").toString + "/nation"
    val stats = Main.runExport(spark, Main.Args(
      outputFile = out,
      table = Some("nation"),
      connection = Some(s"dir:${TestSpark.sfDir}"),
      multiFile = true,
      partitionBy = Seq("n_regionkey"),
      quiet = true), Map.empty)
    assert(stats.rows == 25 && stats.files >= 5) // one dir per region
    val back = spark.read.parquet(out)
    assert(back.count() == 25)
    assert(back.select("n_regionkey").distinct().count() == 5)
  }

  test("cli: connection-string credentials beat PGPASSWORD/PGUSER env") {
    // reference parity (test_cli.py:179): a wrong PGPASSWORD must not
    // override the password carried in the connection string itself
    assert(Main.urlParam("jdbc:postgresql://h/db?user=u&password=pw", "password"))
    assert(Main.urlParam("jdbc:postgresql://h/db?password=pw", "user") == false)
    assert(!Main.urlParam("jdbc:postgresql://h/db", "password"))
    // case-SENSITIVE like pgjdbc: a ?Password= the driver ignores must
    // not suppress the PGPASSWORD fallback
    assert(!Main.urlParam("jdbc:postgresql://h/db?Password=pw", "password"))
    intercept[IllegalArgumentException](Main.parseArgs(
      Seq("export", "-o", "x", "--table", "t", "--fetch-size", "0"), Map.empty))
    // and --fetch-size parses
    val a = Main.parseArgs(Seq("export", "-o", "x", "--table", "t",
      "--fetch-size", "500"), Map.empty)
    assert(a.fetchSize == 500)
  }

  test("cli: --version and --help exit successfully with the expected shapes") {
    val v = intercept[Main.CliExit](Main.parseArgs(Seq("--version"), Map.empty))
    assert(v.text.startsWith("graft 0.") && v.text.linesIterator.size == 1)
    val h = intercept[Main.CliExit](Main.parseArgs(Seq("--help"), Map.empty))
    assert(h.text.contains("export") && h.text.contains("--version") &&
      h.text.contains("Exports a PostgreSQL table or query to a Parquet file"))
    val eh = intercept[Main.CliExit](Main.parseArgs(Seq("export", "-h"), Map.empty))
    assert(eh.text.contains("--output-file") && eh.text.contains("--table"))
    assert(eh.text.linesIterator.size < 40) // short help fits on a screen
  }
}
