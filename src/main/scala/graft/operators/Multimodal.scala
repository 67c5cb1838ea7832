package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed by per-partition batch
  * decoders (builder brief).
  *
  * IMAGE decode is REAL: the JDK ships PNG/JPEG codecs in
  * `javax.imageio`, so [[decodeImageStats]] parses actual image bytes
  * and measures actual pixels — no external library needed (the m04
  * gate round-trips encode→decode and checks pixel sums against a
  * closed-form oracle). WAV AUDIO decode is REAL too:
  * `javax.sound.sampled` parses the RIFF container and streams the
  * PCM frames ([[decodeAudioStats]], the m05 gate). Only video and
  * non-WAV audio codecs — absent from the JDK — remain STUBBED, with
  * a deterministic byte-level fake behind the same plumbing: typed `Dataset[MediaRecord]` with
  * case-class encoders, `mapPartitions` so the codec initializes once
  * per partition (not per row), and schema-stable outputs that
  * downstream DataFrame ops consume. Swapping the audio stub for a
  * JNI/FFmpeg call changes no plumbing.
  *
  * Scale: decode is embarrassingly parallel; partition count is
  * inherited from the source scan, so 100 TB of payloads spread over
  * the cluster with no shuffle. Only `mapPartitions` is used — never a
  * driver-side collect. `ImageIO.setUseCache(false)` keeps executor
  * threads off the shared temp-file cache.
  */
object Multimodal {

  /** One media object: opaque payload + the metadata a real ingest
    * carries. */
  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoder output: fixed-width features a training pipeline joins on.
    * `decoded` separates the two provenance classes that share this
    * shape: true = a real JDK codec measured the payload (width/height
    * are actual pixels), false = the deterministic byte-derived stub
    * (video / non-WAV codecs the JDK lacks) — a consumer mixing mimes
    * filters on it instead of maintaining a mime allowlist. */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      head_hex: String,
      width: Int,      // real when decoded; stub-derived otherwise
      height: Int,
      n_frames: Int,   // 1 for still images; stub-derived otherwise
      decoded: Boolean)

  /** Null-safe payload view: a NULL binary cell (e.g. a null-text
    * document through [[fromDocuments]]) decodes like an empty payload
    * instead of NPE-ing inside an executor task — the same null-text
    * tolerance contract the scrub/dedup stages state explicitly. */
  private def bytes(r: MediaRecord): Array[Byte] =
    if (r.payload == null) Array.emptyByteArray else r.payload

  /** Deterministic fake decode: derives "dimensions" and a "frame
    * count" from the payload bytes. A real implementation would parse
    * the container format here; the signature and batch shape are what
    * matter. n_frames uses the same `n_bytes / 100` rule as the m01
    * QueryDef twin and as [[sampleFrames]] at the default stride, so
    * joining features against frame rows never sees a count mismatch. */
  private[operators] def decodeStub(r: MediaRecord): MediaFeatures = {
    val p = bytes(r)
    val n = p.length
    val head = p.take(8).map(b => f"${b & 0xff}%02X").mkString
    MediaFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      n_bytes = n.toLong,
      head_hex = head,
      width = 16 + (if (n == 0) 0 else (p(0) & 0x7f)),
      height = 16 + (if (n < 2) 0 else (p(1) & 0x7f)),
      n_frames = n / 100,
      decoded = false)
  }

  /** Real image decode into the [[MediaFeatures]] shape: actual
    * dimensions from `javax.imageio`, n_frames = 1 (a still image). */
  private[operators] def decodeImageFeatures(r: MediaRecord): MediaFeatures = {
    val p = bytes(r)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
    require(img != null,
      s"doc_id=${r.doc_id}: payload (${p.length} bytes, mime=${r.mime}) " +
        "is not a decodable image")
    MediaFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      n_bytes = p.length.toLong,
      head_hex = p.take(8).map(b => f"${b & 0xff}%02X").mkString,
      width = img.getWidth,
      height = img.getHeight,
      n_frames = 1,
      decoded = true)
  }

  /** The decode/feature-extract stage: one decoder "session" per
    * partition, streamed over the iterator (no materialization).
    * image-mime records get REAL JDK decode; audio/video/other mimes
    * fall to the deterministic stub (those codecs aren't shipped). */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      imageIoInit() // codec init, once per partition
      it.map { r =>
        if (r.mime != null && r.mime.startsWith("image/")) decodeImageFeatures(r)
        else decodeStub(r)
      }
    }
  }

  /** Keep only REAL-decode features (`decoded = true`) — the consumer
    * guard for pipelines that must not mix stub-derived width/height/
    * n_frames (video and non-WAV codecs the JDK lacks) into training
    * signals. With `strict = true` (the default) a stub row in the
    * input is an ERROR, not a silent filter: a pipeline that believed
    * its corpus was all-decodable should hear otherwise loudly; pass
    * strict = false to knowingly drop the stub rows instead. */
  def requireDecoded(features: Dataset[MediaFeatures],
      strict: Boolean = true): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    if (!strict) features.filter(_.decoded)
    else features.map { f =>
      if (!f.decoded) throw new IllegalArgumentException(
        s"requireDecoded: doc ${f.doc_id} (mime '${f.mime}') carries " +
          "STUB features (decoded=false) — filter on `decoded`, call " +
          "with strict = false to drop stubs, or keep image/WAV mimes " +
          "out of this pipeline")
      f
    }
  }

  /** Frame sampling stage: every `stride`-th byte offset stands in for
    * a frame timestamp; returns (doc_id, frame_no, offset) rows. */
  final case class FrameSample(doc_id: Long, frame_no: Int, offset: Long)

  def sampleFrames(records: Dataset[MediaRecord], stride: Int): Dataset[FrameSample] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        (0 until (bytes(r).length / stride)).iterator
          .map(i => FrameSample(r.doc_id, i, i.toLong * stride))
      }
    }
  }

  /** Overlapping analysis windows (audio-style): fixed `width`-byte
    * windows every `hop` bytes — hop < width means consecutive windows
    * overlap, the standard STFT/feature-extraction layout. The final
    * partial window is emitted iff at least `width/2` bytes remain
    * (half-window rule), so short tails are neither dropped entirely
    * nor padded silently. Same mapPartitions shape as [[sampleFrames]]:
    * a real windowed decoder initializes per partition and streams. */
  final case class WindowSample(
      doc_id: Long, window_no: Int, offset: Long, length: Long)

  def sampleWindows(records: Dataset[MediaRecord], width: Int,
      hop: Int): Dataset[WindowSample] = {
    require(width >= 1 && hop >= 1, s"width/hop must be >= 1, got $width/$hop")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val n = bytes(r).length
        Iterator.from(0)
          .map(i => (i, i.toLong * hop))
          .takeWhile { case (_, off) => off < n && n - off >= width / 2 }
          .map { case (i, off) =>
            WindowSample(r.doc_id, i, off, math.min(width.toLong, n - off))
          }
      }
    }
  }

  // ---------------------------------------------------------------- images

  /** Real decoded-image statistics: dimensions plus exact per-channel
    * pixel sums (integer-exact, so cross-engine comparison is
    * bit-identical — the established no-float-accumulation stance). */
  final case class ImageStats(
      doc_id: Long,
      width: Int,
      height: Int,
      n_px: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Executor-side ImageIO hygiene: by default ImageIO spills decode
    * buffers to a shared temp-file cache — 32 executor threads
    * hammering one tmpdir is an IO hotspot and a cleanup hazard, so
    * decode in-memory. Idempotent; called once per partition. */
  private def imageIoInit(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic PNG render for a document: a `w×h` image filled
    * with RGB (g, (2g+1) mod 256, (3g+2) mod 256) where
    * w = 8 + doc_id mod 13, h = 8 + doc_id mod 7, g = doc_id mod 256,
    * with pixel (0,0) forced to white as a position sentinel (a decode
    * that mislays pixels — wrong stride, channel order, premultiply —
    * changes the sums). These are REAL PNG bytes from the JDK encoder;
    * the closed-form pixel sums are what the m04 oracle recomputes. */
  private[graft] def renderPng(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 13).toInt
    val h = 8 + (docId % 7).toInt
    val g = (docId % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (((2 * g + 1) % 256) << 8) | ((3 * g + 2) % 256)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img.setRGB(0, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Documents → real PNG MediaRecords (the m04 ingest): renders
    * per-partition with the codec-init-once shape. */
  def imageRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long]
      .mapPartitions { it =>
        imageIoInit()
        it.map(id => MediaRecord(id, "image/png", renderPng(id)))
      }
  }

  /** REAL image decode via pure-JDK `javax.imageio`: parses the
    * payload bytes (PNG/JPEG/GIF/BMP — whatever the JDK registry
    * handles), walks the raster, and returns exact integer channel
    * sums. Throws on undecodable payloads — an image-typed record
    * whose bytes don't parse is a data error the pipeline must
    * surface, not average away (same loud-failure stance as the
    * unsupported-PG-type policy). */
  def decodeImageStats(records: Dataset[MediaRecord]): Dataset[ImageStats] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      imageIoInit()
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes(r)))
        require(img != null,
          s"doc_id=${r.doc_id}: payload (${bytes(r).length} bytes, " +
            s"mime=${r.mime}) is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(r.doc_id, w, h, w.toLong * h, sr, sg, sb)
      }
    }
  }

  // ------------------------------------------------------- perceptual hash

  /** 64-bit average-hash of a decoded image, carried as four 16-bit
    * bands so the near-dup join and the cross-engine compare never
    * touch the sign bit of a packed BIGINT. bit index = by·8+bx,
    * band k = bits [16k, 16k+16). */
  final case class ImagePHash(
      doc_id: Long,
      width: Int,
      height: Int,
      b0: Int, b1: Int, b2: Int, b3: Int)

  /** Deterministic patterned PNG for a document — the near-dup image
    * fixture (m06/m07). Unlike [[renderPng]]'s solid fill (whose aHash
    * degenerates to one sentinel bit), the gray gradient
    * v(x,y) = (x·a + y·b + c + δ) mod 256 gives every image a
    * distinctive 64-bit hash. Pattern parameters derive from the
    * FAMILY fam = doc_id / 4 (so 4 consecutive docs share geometry and
    * gradient) and only the brightness offset δ = doc_id mod 4 varies
    * within a family — the within-family hashes differ in exactly the
    * blocks where the mod-256 wraparound moves, i.e. REAL near
    * duplicates with small hamming distance, which is what m07 mines. */
  private[graft] def renderPatternPng(docId: Long): Array[Byte] = {
    val fam = docId / 4
    val w = 8 + (fam % 13).toInt
    val h = 8 + (fam % 7).toInt
    val a = (fam % 5).toInt + 1
    val b = (fam % 3).toInt + 1
    val e = (fam % 11).toInt + 1
    val c = (fam % 256).toInt
    val delta = (docId % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // the x·y·e cross-term keys the pattern to the family: without
        // it the aHash is invariant to the constant c (same-gradient
        // families collide at hamming 0 and the pair set degenerates
        // to a fixture artifact, 37k pairs over 500 docs); with it the
        // (a, b, e, w, h) class period is lcm(5,3,11,13,7) = 15015
        // families — every family distinct up to 60k docs
        val v = (x * a + y * b + x * y * e + c + delta) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Documents → patterned real-PNG MediaRecords (the m06/m07 ingest). */
  def imageRecordsPatterned(spark: SparkSession, sfDir: String)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long]
      .mapPartitions { it =>
        imageIoInit()
        it.map(id => MediaRecord(id, "image/png", renderPatternPng(id)))
      }
  }

  /** Perceptual average-hash (aHash) over REAL decoded pixels — the
    * classic image near-dup fingerprint (same family as pHash/dHash;
    * e.g. the photo-dedup passes in LAION-style image-corpus
    * curation): partition the raster into an 8×8 block grid, set bit
    * (by·8+bx) iff the block's mean brightness exceeds the image mean.
    * Resize-invariant by construction (blocks, not pixels) and robust
    * to small brightness edits — the properties that make hamming
    * distance on the 64 bits a near-duplicate metric.
    *
    * Exactness contract: "mean exceeds mean" is evaluated in pure
    * integer arithmetic — blockSum·nTotal > totalSum·nBlock over
    * gray = r+g+b sums — so the hash is bit-identical across engines
    * and platforms (no float downscale, no rounding mode). Images
    * smaller than 8×8 are rejected loudly (an empty block would make
    * the grid partial). Scale: embarrassingly parallel map over the
    * payloads, no shuffle; the hash is 8 bytes/image no matter the
    * resolution, so 100 TB of pixels reduce to GB-scale hash tables. */
  def imagePerceptualHash(records: Dataset[MediaRecord]): Dataset[ImagePHash] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      imageIoInit()
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes(r)))
        require(img != null,
          s"doc_id=${r.doc_id}: payload (${bytes(r).length} bytes, " +
            s"mime=${r.mime}) is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        require(w >= 8 && h >= 8,
          s"doc_id=${r.doc_id}: aHash needs >= 8x8 pixels, got ${w}x$h")
        val bSum = new Array[Long](64)
        val bN = new Array[Long](64)
        var tot = 0L
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            val blk = by * 8 + x * 8 / w
            bSum(blk) += gray; bN(blk) += 1; tot += gray
            x += 1
          }
          y += 1
        }
        val nTot = w.toLong * h
        val bands = new Array[Int](4)
        // the threshold products in BigInt: at gigapixel resolutions
        // (w·h ≳ 8.8e8) bSum·nTot exceeds Long and a silent wrap would
        // flip hash bits against the documented bit-exactness contract
        // (review r18) — 64 BigInt comparisons per image is noise next
        // to the decode
        val nTotB = BigInt(nTot)
        val totB = BigInt(tot)
        var blk = 0
        while (blk < 64) {
          if (BigInt(bSum(blk)) * nTotB > totB * BigInt(bN(blk)))
            bands(blk / 16) |= 1 << (blk % 16)
          blk += 1
        }
        ImagePHash(r.doc_id, w, h, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** Image near-duplicate pairs by banded hamming LSH over
    * [[imagePerceptualHash]] bands: pairs sharing at least one 16-bit
    * band become candidates (by pigeonhole this catches EVERY pair at
    * hamming ≤ 3 — four bands, three differing bits — so `tau` ≤ 3 is
    * exact, not approximate), then the full 64-bit hamming distance
    * filters candidates to `tau`. The 100 TB shape is the MinHash-LSH
    * contract exactly: one (band, value) shuffle, buckets past
    * [[PipelineCore.LshBucketCap]]-style `bucketCap` dropped loudly
    * (a degenerate constant-image flood would otherwise go quadratic),
    * pair work bounded by bucket collisions — never all-pairs over the
    * corpus. Output: (doc_a, doc_b, hamming). */
  def imageNeardupPairs(hashes: Dataset[ImagePHash], tau: Int = 3,
      bucketCap: Int = 1000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(tau >= 0 && tau <= 3,
      s"tau must be in [0, 3] (one shared 16-bit band is guaranteed " +
        s"only up to hamming 3), got $tau")
    // NOT persisted here — see audioNeardupPairs: callers own
    // decode-once (CLI localCheckpoint / gate persist).
    val df = hashes.toDF()
    val bucketed = df.select(col("doc_id"), explode(array(
      (0 until 4).map(k =>
        struct(lit(k).as("band"), col(s"b$k").as("v"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.v"))
    val cand = bucketed
      .groupBy(col("band"), col("v"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= bucketCap)
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val l = df.select(col("doc_id").as("doc_a"),
      col("b0").as("l0"), col("b1").as("l1"),
      col("b2").as("l2"), col("b3").as("l3"))
    val r = df.select(col("doc_id").as("doc_b"),
      col("b0").as("r0"), col("b1").as("r1"),
      col("b2").as("r2"), col("b3").as("r3"))
    def pc(k: Int): org.apache.spark.sql.Column =
      call_function("bit_count",
        col(s"l$k").bitwiseXOR(col(s"r$k")))
    cand.join(l, Seq("doc_a")).join(r, Seq("doc_b"))
      .withColumn("hamming", (pc(0) + pc(1) + pc(2) + pc(3)).cast("int"))
      .filter(col("hamming") <= tau)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** CROSS-corpus image near-duplicate scrub — the [[imageNeardupPairs]]
    * chain with band buckets built PER SIDE and candidates taken only
    * from the cross join of same-(band, value) buckets (the text
    * family's `minhashNeardupAgainstCorpus` deployment shape, for
    * images: match a NEW photo crawl against a REFERENCE collection —
    * yesterday's training set, a licensed archive — without ever
    * pairing new-vs-new or ref-vs-ref). Same hash, same bands, same
    * pigeonhole-exact `tau` ≤ 3 guarantee as the within-corpus
    * operator, so thresholds tune once. Scale shape: one (band, value)
    * shuffle per side, key-equality bucket join (no cartesian), each
    * side's buckets independently capped — the reference's 8-byte
    * hashes are the ONLY thing that travels, never its pixels.
    * Output: (doc_id, ref_id, hamming). */
  def imageNeardupAgainstCorpus(newHashes: Dataset[ImagePHash],
      refHashes: Dataset[ImagePHash], tau: Int = 3,
      bucketCap: Int = 1000): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(tau >= 0 && tau <= 3,
      s"tau must be in [0, 3] (one shared 16-bit band is guaranteed " +
        s"only up to hamming 3), got $tau")
    def bands(df: org.apache.spark.sql.DataFrame, idAs: String)
        : org.apache.spark.sql.DataFrame =
      df.select(col("doc_id").as(idAs), explode(array(
        (0 until 4).map(k =>
          struct(lit(k).as("band"), col(s"b$k").as("v"))): _*)).as("bk"))
        .select(col(idAs), col("bk.band"), col("bk.v"))
        .groupBy(col("band"), col("v"))
        .agg(sort_array(collect_set(col(idAs))).as(s"${idAs}s"))
        .filter(size(col(s"${idAs}s")) <= bucketCap)
    val cand = bands(newHashes.toDF(), "doc_id")
      .join(bands(refHashes.toDF(), "ref_id"), Seq("band", "v"))
      .select(explode(col("doc_ids")).as("doc_id"), col("ref_ids"))
      .select(col("doc_id"), explode(col("ref_ids")).as("ref_id"))
      .distinct()
    val l = newHashes.toDF().select(col("doc_id"),
      col("b0").as("l0"), col("b1").as("l1"),
      col("b2").as("l2"), col("b3").as("l3"))
    val r = refHashes.toDF().select(col("doc_id").as("ref_id"),
      col("b0").as("r0"), col("b1").as("r1"),
      col("b2").as("r2"), col("b3").as("r3"))
    def pc(k: Int): org.apache.spark.sql.Column =
      call_function("bit_count",
        col(s"l$k").bitwiseXOR(col(s"r$k")))
    cand.join(l, Seq("doc_id")).join(r, Seq("ref_id"))
      .withColumn("hamming", (pc(0) + pc(1) + pc(2) + pc(3)).cast("int"))
      .filter(col("hamming") <= tau)
      .select(col("doc_id"), col("ref_id"), col("hamming"))
  }

  // ----------------------------------------------------------------- audio

  /** Real decoded-audio statistics: container metadata plus exact
    * integer amplitude sums (deviation from the 8-bit midpoint 128),
    * so cross-engine comparison is bit-identical like [[ImageStats]]. */
  final case class AudioStats(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Long,
      sum_dev: Long,
      sum_sq_dev: Long)

  /** Deterministic WAV render for a document — a REAL RIFF/WAVE
    * container from the JDK encoder (`javax.sound.sampled
    * .AudioSystem.write`), 8-bit unsigned PCM mono at 8 kHz with
    * n = 400 + doc_id mod 200 samples of the integer sawtooth
    * sample_t = (t·a + b) mod 256, a = doc_id mod 7 + 2,
    * b = doc_id mod 251 — closed-form amplitude sums the m05 oracle
    * recomputes. */
  private[graft] def renderWav(docId: Long): Array[Byte] = {
    val n = (400 + docId % 200).toInt
    val a = (docId % 7 + 2).toInt
    val b = (docId % 251).toInt
    val samples = Array.tabulate[Byte](n)(t => ((t * a + b) % 256).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
      /* signed = */ false, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Documents → real WAV MediaRecords (the m05 ingest). */
  def audioRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long]
      .mapPartitions(_.map(id => MediaRecord(id, "audio/wav", renderWav(id))))
  }

  /** Deterministic FAMILY WAV render — the audio near-dup fixture
    * (m11), the [[renderPatternPng]] idea for sound: 4 consecutive
    * docs share the sawtooth (n, a, b from fam = doc_id / 4) and only
    * the amplitude offset δ = doc_id mod 4 varies within a family, so
    * siblings' window energies — and hence their [[audioFingerprint]]
    * delta-sign bits — differ only where the mod-256 wraparound moves:
    * REAL near duplicates a fingerprint match must find. */
  private[graft] def renderWavFamily(docId: Long): Array[Byte] = {
    val fam = docId / 4
    val n = (400 + fam % 200).toInt
    val a = (fam % 7 + 2).toInt
    val b = (fam % 251).toInt
    val e = (fam % 11).toInt + 1
    val fm = (fam % 128).toInt
    val delta = (docId % 4).toInt
    // window-keyed modulus = a per-window amplitude envelope: a plain
    // full-range sawtooth has near-constant window energy, which makes
    // every fingerprint collapse toward the same bit string (the m11
    // fixture's first draft paired 2.4k cross-family docs at hamming
    // 0) — the (e, fm)-keyed envelope makes the energy SEQUENCE the
    // family's signature, which is exactly what the fingerprint
    // encodes
    def m(t: Int): Int = 128 + ((t / 32) * e + fm) % 128
    val samples = Array.tabulate[Byte](n)(t =>
      ((t * a + b + delta) % m(t)).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
      /* signed = */ false, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Documents → family WAV MediaRecords (the m11 ingest). */
  def audioRecordsFamilies(spark: SparkSession, sfDir: String)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long]
      .mapPartitions(_.map(id =>
        MediaRecord(id, "audio/wav", renderWavFamily(id))))
  }

  /** Audio near-duplicate pairs over [[audioFingerprint]] bit strings —
    * the Haitsma-Kalker search shape: candidates come from an EXACT
    * match of any aligned `blockLen`-bit sub-fingerprint (their §III
    * lookup-table trick: a near-duplicate burst of bit errors rarely
    * hits every block, so some block survives verbatim and indexes the
    * pair), then the full fingerprint hamming distance — between
    * same-length fingerprints only; different window counts mean
    * different material — filters candidates to `tau`. Recall caveat
    * (the LSH trade, stated honestly): a pair whose every block
    * carries at least one flipped bit never becomes a candidate; what
    * IS reported is exact, and the m11 oracle replays the identical
    * block index. Scale shape: ONE (block_no, bits) shuffle, buckets
    * past `bucketCap` dropped loudly (digital silence floods a bucket),
    * pair work bounded by bucket collisions. Output: (doc_a, doc_b,
    * n_windows, hamming). */
  def audioNeardupPairs(fps: Dataset[AudioFingerprint], tau: Int = 2,
      blockLen: Int = 8, bucketCap: Int = 1000)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(tau >= 0, s"tau must be >= 0, got $tau")
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    // NOT persisted here: the frame feeds three plan arms, but the
    // operator must leave no cached blocks behind (the no-leak spec
    // contract); callers own decode-once — the phash/audio CLIs
    // localCheckpoint their fingerprint frame with managed release,
    // and the m11/m07/p135 gates persist under the bench clearCache
    // contract.
    val df = fps.toDF()
    val blocks = df
      .filter(length(col("fp")) >= blockLen)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), (length(col("fp")) / blockLen).cast("int") - 1),
        i => struct(i.as("blk_no"),
          col("fp").substr(i * blockLen + 1, lit(blockLen)).as("bits"))))
        .as("b"))
      .select(col("doc_id"), col("b.blk_no"), col("b.bits"))
    val cand = blocks
      .groupBy(col("blk_no"), col("bits"))
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) > 1 && size(col("docs")) <= bucketCap)
      .select(explode(col("docs")).as("doc_a"), col("docs"))
      .select(col("doc_a"), explode(col("docs")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val l = df.select(col("doc_id").as("doc_a"),
      col("n_windows").as("nw_a"), col("fp").as("fp_a"))
    val r = df.select(col("doc_id").as("doc_b"),
      col("n_windows").as("nw_b"), col("fp").as("fp_b"))
    cand.join(l, Seq("doc_a")).join(r, Seq("doc_b"))
      .filter(col("nw_a") === col("nw_b"))
      .withColumn("hamming",
        aggregate(zip_with(split(col("fp_a"), ""), split(col("fp_b"), ""),
          (x, y) => when(x =!= y, 1).otherwise(0)), lit(0), _ + _)
          .cast("int"))
      .filter(col("hamming") <= tau)
      .select(col("doc_a"), col("doc_b"),
        col("nw_a").as("n_windows"), col("hamming"))
  }

  /** REAL audio decode via pure-JDK `javax.sound.sampled`: parses the
    * WAV container (format, rate, channels), streams the PCM frames,
    * and returns exact integer amplitude sums. Currently 8-bit PCM
    * (what [[renderWav]] emits and the JDK reads without a converter);
    * other depths fail loudly with the format named — the same
    * loud-failure stance as [[decodeImageStats]]. Video and non-WAV
    * audio remain with the stub: those codecs the JDK does not ship. */
  def decodeAudioStats(records: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes(r)))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"doc_id=${r.doc_id}: payload (${bytes(r).length} bytes, " +
                  s"mime=${r.mime}) is not a decodable audio container", e)
          }
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
          s"doc_id=${r.doc_id}: unsupported PCM layout " +
            s"(${fmt.getSampleSizeInBits}-bit, ${fmt.getChannels}ch, " +
            s"encoding=${fmt.getEncoding}) — only 8-bit mono PCM_UNSIGNED is " +
            "decoded here (the (b & 0xff) - 128 midpoint below assumes it)")
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var read = ais.read(chunk)
        while (read > 0) { buf.write(chunk, 0, read); read = ais.read(chunk) }
        val pcm = buf.toByteArray
        var (sd, sq) = (0L, 0L)
        var i = 0
        while (i < pcm.length) {
          val d = (pcm(i) & 0xff) - 128
          sd += d; sq += d.toLong * d
          i += 1
        }
        AudioStats(r.doc_id, fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, pcm.length.toLong, sd, sq)
      }
    }
  }

  /** The (band, value) key strings of one hash row — shared by the
    * Bloom build and the probe so the two sides can never drift. */
  private def imageBandKeys: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    array((0 until 4).map(k =>
      concat_ws(":", lit(k), col(s"b$k"))): _*)
  }

  /** Pack a reference image collection's perceptual-hash band keys
    * into ONE fixed-size Bloom bitset (`mBits/8` bytes regardless of
    * reference size) — the image twin of the text family's
    * `neardupBloomBuild`: how a live feed scrubs near-dups of a
    * 100 TB photo snapshot without the snapshot ever shuffling or
    * even shipping its hash table. Same double-hash positions and
    * packed-bitset kernel as the text gate. */
  def imageBloomBuild(refHashes: Dataset[ImagePHash], mBits: Int,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    refHashes.toDF()
      .select(explode(imageBandKeys).as("__key"))
      .select(explode(Pipeline.doubleHashPositions(col("__key"), k, mBits))
        .as("__pos"))
      .distinct()
      .agg(sort_array(collect_list(col("__pos"))).as("__bloom"))
      .select(call_function("bitset_pack", col("__bloom"), lit(mBits))
        .as("__bloomBits"))
  }

  /** Flag every hash whose image the reference Bloom filter CLAIMS to
    * near-duplicate: any of the four band keys fully present → flag.
    * Candidate-level gate semantics (the text `neardupFlagAgainstBloom`
    * contract): true band collisions always flag — the pigeonhole
    * hamming ≤ 3 guarantee carries over — and a clean image can flag
    * with the filter's documented false-positive probability. Works
    * unchanged on a STREAMING hash frame (map-side probe against one
    * broadcast row, no state). Output: input columns +
    * `neardup_in_ref`. */
  def imageFlagAgainstBloom(hashes: Dataset[ImagePHash],
      bloom: org.apache.spark.sql.DataFrame, mBits: Int,
      k: Int = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    hashes.toDF()
      .crossJoin(broadcast(bloom))
      .withColumn("neardup_in_ref",
        exists(imageBandKeys, key => {
          val pp = sort_array(array_distinct(
            Pipeline.doubleHashPositions(key, k, mBits)))
          call_function("bitset_count_set", pp, col("__bloomBits"))
            .cast(LongType) === size(pp).cast(LongType)
        }))
      .drop("__bloomBits")
  }

  /** One audio fingerprint row: surviving full windows and the
    * energy-delta bit string ('1' = this window is louder than the
    * previous; length = n_windows − 1). */
  final case class AudioFingerprint(
      doc_id: Long,
      n_windows: Int,
      fp: String)

  /** Acoustic fingerprint over REAL decoded PCM — the energy-delta
    * sign bits of the Haitsma-Kalker (2002) "robust audio
    * fingerprinting" family, reduced to the time domain (their bit is
    * the sign of a band-energy difference; without an FFT in the JDK
    * the honest equivalent is the full-band energy difference, which
    * keeps the property that matters: bits survive volume scaling and
    * requantization because they encode energy ORDER, not energy):
    * the PCM stream splits into fixed `window`-sample frames (trailing
    * partial frame dropped), each frame's energy is the exact integer
    * Σ dev² (dev = sample − 128, the 8-bit midpoint), and bit i says
    * whether frame i+1 is louder than frame i (strict >, so equal
    * energies — digital silence — read 0). Same loud-failure format
    * contract as [[decodeAudioStats]]. The fingerprint is a '0'/'1'
    * string (variable frame counts per doc make a packed integer
    * column awkward across engines; the string compares exactly).
    * Scale: map-side decode, no shuffle; ~2 bits per millisecond of
    * audio regardless of sample width — the image-hash story again.
    * Output: (doc_id, n_windows, fp). */
  def audioFingerprint(records: Dataset[MediaRecord],
      window: Int = 32): Dataset[AudioFingerprint] = {
    require(window >= 2, s"window must be >= 2 samples, got $window")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes(r)))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"doc_id=${r.doc_id}: payload (${bytes(r).length} bytes, " +
                  s"mime=${r.mime}) is not a decodable audio container", e)
          }
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
          s"doc_id=${r.doc_id}: unsupported PCM layout " +
            s"(${fmt.getSampleSizeInBits}-bit, ${fmt.getChannels}ch, " +
            s"encoding=${fmt.getEncoding}) — only 8-bit mono PCM_UNSIGNED is " +
            "decoded here (the (b & 0xff) - 128 midpoint below assumes it)")
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var read = ais.read(chunk)
        while (read > 0) { buf.write(chunk, 0, read); read = ais.read(chunk) }
        val pcm = buf.toByteArray
        val nw = pcm.length / window
        val e = new Array[Long](nw)
        var i = 0
        while (i < nw * window) {
          val d = (pcm(i) & 0xff) - 128
          e(i / window) += d.toLong * d
          i += 1
        }
        val sb = new java.lang.StringBuilder(math.max(nw - 1, 0))
        var w = 1
        while (w < nw) {
          sb.append(if (e(w) > e(w - 1)) '1' else '0')
          w += 1
        }
        AudioFingerprint(r.doc_id, nw, sb.toString)
      }
    }
  }

  /** Documents → MediaRecords (text bytes standing in for payloads). */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "'text/plain' AS mime", "encode(text, 'UTF-8') AS payload")
      .as[MediaRecord]
  }

  /** Raw media-DIRECTORY ingest — how 100 TB of crawled images/audio
    * actually arrives (a bucket of files, not a parquet table): Spark's
    * built-in `binaryFile` source lists and reads every file under
    * `dir` (optionally filtered by `glob`, e.g. `*.png`), and each file
    * becomes one row of (path, mod_time, length, doc_id, mime,
    * payload):
    *   - `doc_id` is the md5-prefix long of the PATH (deterministic
    *     across reruns and listing orders — the library's RNG-free id
    *     stance; 48 bits, so birthday collisions need ~2²⁴ files per
    *     corpus — pass ids from a manifest join when that matters);
    *   - `mime` is sniffed from the MAGIC BYTES (PNG / JPEG / GIF /
    *     RIFF-WAVE), not the extension — exactly the formats the decode
    *     stages dispatch on; anything else is
    *     `application/octet-stream` and flows down the stub path with
    *     `decoded = false`.
    * `toMediaRecords` adapts the frame to the typed [[MediaRecord]]
    * every decode/fingerprint/scrub stage consumes. Scale: binaryFile
    * assigns files to partitions up to
    * `spark.sql.files.maxPartitionBytes` with NO shuffle, and decode
    * stays embarrassingly parallel from there; the path/length/mod_time
    * columns carry lineage for free. */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = ""): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val reader = spark.read.format("binaryFile")
    val r = (if (glob.nonEmpty) reader.option("pathGlobFilter", glob)
             else reader).load(dir)
    def magic(fromByte: Int, hexPrefix: String) =
      hex(substring(col("content"), fromByte,
        hexPrefix.length / 2)) === lit(hexPrefix)
    val mime = when(magic(1, "89504E47"), "image/png")       // \x89PNG
      .when(magic(1, "FFD8FF"), "image/jpeg")                // JPEG SOI
      .when(magic(1, "47494638"), "image/gif")               // GIF8
      .when(magic(1, "52494646") && magic(9, "57415645"),    // RIFF..WAVE
        "audio/wav")
      .otherwise("application/octet-stream")
    r.select(col("path"), col("modificationTime").as("mod_time"),
      col("length"),
      call_function("md5_prefix_long", col("path"), lit(6)).as("doc_id"),
      mime.as("mime"), col("content").as("payload"))
  }

  /** The typed adapter from [[readMediaDir]]'s frame (or any frame
    * carrying doc_id/mime/payload) to the [[MediaRecord]] stream the
    * decode stages consume. */
  def toMediaRecords(df: org.apache.spark.sql.DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(df("doc_id"), df("mime"), df("payload")).as[MediaRecord]
  }
}
