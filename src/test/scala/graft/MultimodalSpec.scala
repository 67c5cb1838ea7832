package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Typed mapPartitions plumbing for multimodal payloads. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("extractFeatures: schema-stable typed output, deterministic stub") {
    import spark.implicits._
    // non-image mimes take the stub path (image mimes get REAL decode
    // since r16 — covered by the imageio tests below)
    val ds = Seq(
      MediaRecord(1L, "video/mp4", Array.tabulate(250)(_.toByte)),
      MediaRecord(2L, "audio/wav", Array.empty[Byte]),
      MediaRecord(3L, "audio/wav", null)).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    // n_frames = n_bytes/100, the SAME rule as m01 and sampleFrames'
    // default stride (a +1 here once disagreed with both twins)
    assert(out(0).n_bytes == 250 && out(0).n_frames == 2)
    assert(out(0).head_hex == "0001020304050607")
    assert(out(0).width == 16 + 0 && out(0).height == 16 + 1)
    // stub features are flagged as such — a consumer filters on
    // `decoded` instead of keeping a mime allowlist
    assert(out.forall(!_.decoded))
    assert(out(1).n_bytes == 0 && out(1).n_frames == 0 && out(1).head_hex == "")
    // a NULL payload (null-text document) decodes like an empty one
    assert(out(2).n_bytes == 0 && out(2).n_frames == 0 && out(2).head_hex == "")
  }

  test("requireDecoded: strict errors on a stub row, non-strict drops it, " +
      "all-decoded passes through") {
    import spark.implicits._
    val mixed = Multimodal.extractFeatures(Seq(
      MediaRecord(1L, "image/png", Multimodal.renderPng(1L)),
      MediaRecord(2L, "video/mp4", Array.tabulate(250)(_.toByte))).toDS())
    // strict (the default): the stub row is an ERROR, not a filter
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.requireDecoded(mixed).collect()
    }
    assert(e.getMessage.contains("requireDecoded") ||
      Option(e.getCause).exists(_.getMessage.contains("requireDecoded")))
    // non-strict: stub rows knowingly dropped
    val kept = Multimodal.requireDecoded(mixed, strict = false).collect()
    assert(kept.map(_.doc_id).toSeq == Seq(1L) && kept.head.decoded)
    // an all-decoded input passes strict unchanged
    val clean = Multimodal.extractFeatures(Seq(
      MediaRecord(3L, "image/png", Multimodal.renderPng(3L))).toDS())
    assert(Multimodal.requireDecoded(clean).collect().map(_.doc_id)
      .toSeq == Seq(3L))
  }

  test("sampleFrames/sampleWindows: null payloads yield no rows; bad stride rejected") {
    import spark.implicits._
    val ds = Seq(MediaRecord(1L, "video/mp4", null)).toDS()
    assert(Multimodal.sampleFrames(ds, 100).collect().isEmpty)
    assert(Multimodal.sampleWindows(ds, 200, 100).collect().isEmpty)
    intercept[IllegalArgumentException](Multimodal.sampleFrames(ds, 0))
  }

  test("sampleFrames: one row per stride") {
    import spark.implicits._
    val ds = Seq(MediaRecord(7L, "video/mp4", Array.fill(1000)(1.toByte))).toDS()
    val frames = Multimodal.sampleFrames(ds, 256).collect().sortBy(_.frame_no)
    assert(frames.length == 3)
    assert(frames.map(_.offset).toSeq == Seq(0L, 256L, 512L))
  }

  test("sampleWindows: overlap layout and the half-window tail rule") {
    import spark.implicits._
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio/raw", Array.fill[Byte](450)(7)),
      Multimodal.MediaRecord(2L, "audio/raw", Array.fill[Byte](99)(7)),
      Multimodal.MediaRecord(3L, "audio/raw", Array.empty[Byte])).toDS()
    val w = Multimodal.sampleWindows(recs, width = 200, hop = 100)
      .collect().groupBy(_.doc_id)
    // 450 bytes: offsets 0,100,200 full; 300 → 150 left (≥100, kept);
    // 400 → 50 left (<100, dropped by the half-window rule)
    assert(w(1L).map(s => (s.offset, s.length)).sortBy(_._1).toSeq ==
      Seq((0L, 200L), (100L, 200L), (200L, 200L), (300L, 150L)))
    // 99 bytes: single partial window would be 99 < 100 → nothing
    assert(!w.contains(2L) && !w.contains(3L))
  }

  test("fromDocuments: real table → typed records, features match m01") {
    val feats = Multimodal.extractFeatures(
      Multimodal.fromDocuments(spark, TestSpark.sfDir))
    val viaSql = SparkEntry.queries("m01_multimodal_meta")(spark, TestSpark.sfDir)
    val a = feats.collect()
      .map(f => f.doc_id -> (f.n_bytes, f.head_hex, f.n_frames.toLong)).toMap
    val b = viaSql.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3), r.getLong(4)))
      .toMap
    assert(a == b)
  }

  test("imageio: PNG encode→decode round-trips real dimensions and pixel sums") {
    import spark.implicits._
    // renderPng spec: w=8+id%13, h=8+id%7, fill g=id%256, white (0,0)
    val ids = Seq(0L, 1L, 12L, 255L, 256L, 1000L)
    val recs = ids
      .map(id => MediaRecord(id, "image/png", Multimodal.renderPng(id))).toDS()
    val stats = Multimodal.decodeImageStats(recs).collect()
      .map(s => s.doc_id -> s).toMap
    ids.foreach { id =>
      val (w, h, g) = (8 + (id % 13).toInt, 8 + (id % 7).toInt, (id % 256).toInt)
      val s = stats(id)
      assert(s.width == w && s.height == h && s.n_px == w.toLong * h)
      assert(s.sum_r == g.toLong * (w * h - 1) + 255)
      assert(s.sum_g == ((2 * g + 1) % 256).toLong * (w * h - 1) + 255)
      assert(s.sum_b == ((3 * g + 2) % 256).toLong * (w * h - 1) + 255)
    }
    // the bytes are a REAL PNG container, not a fake
    val head = Multimodal.renderPng(7L).take(8).map(_ & 0xff)
    assert(head.toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
  }

  test("imageio: extractFeatures routes image mimes to the real decoder") {
    import spark.implicits._
    val ds = Seq(MediaRecord(42L, "image/png", Multimodal.renderPng(42L))).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.width == 8 + 42 % 13 && f.height == 8 + 42 % 7 && f.n_frames == 1)
    assert(f.head_hex == "89504E470D0A1A0A")
    assert(f.decoded) // real codec measured it
  }

  test("audio: WAV encode→decode round-trips real metadata and amplitude sums") {
    import spark.implicits._
    val ids = Seq(0L, 6L, 199L, 250L, 1234L)
    val recs = ids
      .map(id => MediaRecord(id, "audio/wav", Multimodal.renderWav(id))).toDS()
    val stats = Multimodal.decodeAudioStats(recs).collect()
      .map(s => s.doc_id -> s).toMap
    ids.foreach { id =>
      val n = (400 + id % 200).toInt
      val a = (id % 7 + 2).toInt
      val b = (id % 251).toInt
      val devs = (0 until n).map(t => (t * a + b) % 256 - 128)
      val s = stats(id)
      assert(s.sample_rate == 8000 && s.channels == 1 && s.bits == 8)
      assert(s.n_samples == n.toLong)
      assert(s.sum_dev == devs.map(_.toLong).sum)
      assert(s.sum_sq_dev == devs.map(d => d.toLong * d).sum)
    }
    // the bytes are a REAL RIFF/WAVE container, not a fake
    val head = Multimodal.renderWav(7L).take(4).map(_.toChar).mkString
    assert(head == "RIFF")
  }

  test("audio: undecodable payload fails loudly with the doc_id") {
    import spark.implicits._
    val ds = Seq(MediaRecord(5L, "audio/wav", Array.tabulate(64)(_.toByte))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioStats(ds).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("doc_id=5")))
  }

  test("audio: 8-bit PCM_SIGNED is rejected loudly, never mis-midpointed") {
    import spark.implicits._
    // AU stores 8-bit linear PCM SIGNED — the JDK parses it as
    // PCM_SIGNED, which the (b & 0xff) - 128 unsigned midpoint would
    // silently decode wrong; the require must name the encoding
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val pcm = Array.tabulate(100)(i => i.toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AU, buf)
    val ds = Seq(MediaRecord(11L, "audio/basic", buf.toByteArray)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioStats(ds).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("doc_id=11") && m.contains("PCM_SIGNED")))
  }

  test("imageio: undecodable image payload fails loudly, not silently") {
    import spark.implicits._
    val ds = Seq(MediaRecord(9L, "image/png", Array.tabulate(64)(_.toByte))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageStats(ds).collect()
    }
    assert(e.getMessage.contains("doc_id=9") ||
      Option(e.getCause).exists(_.getMessage.contains("doc_id=9")))
  }

  test("aHash: solid fill + sentinel → exactly the sentinel-block bit; " +
    "all-equal image → zero hash; sub-8x8 rejected") {
    import spark.implicits._
    // renderPng is solid g with a white (0,0) sentinel: every block's
    // mean equals the image mean EXCEPT block 0 (raised by the
    // sentinel), and strict > keeps the equal blocks at 0 — so the
    // hash is exactly bit 0 of band 0
    val solid = Seq(MediaRecord(7L, "image/png", Multimodal.renderPng(7L))).toDS()
    val hs = Multimodal.imagePerceptualHash(solid).collect().head
    assert((hs.b0, hs.b1, hs.b2, hs.b3) == (1, 0, 0, 0))
    // g = 255 makes the sentinel invisible: a truly constant image has
    // no block above the mean — the all-zero hash
    val const = Seq(MediaRecord(255L, "image/png",
      Multimodal.renderPng(255L))).toDS()
    val hc = Multimodal.imagePerceptualHash(const).collect().head
    assert((hc.b0, hc.b1, hc.b2, hc.b3) == (0, 0, 0, 0))
    // smaller than the 8×8 block grid → loud failure, not a partial hash
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val tiny = Seq(MediaRecord(3L, "image/png", bos.toByteArray)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.imagePerceptualHash(tiny).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("doc_id=3") && m.contains("8x8")))
  }

  test("aHash: exact-resize invariance — 2x nearest-neighbor upscale " +
    "keeps every bit (the property that makes it perceptual)") {
    import spark.implicits._
    def png(w: Int, h: Int, scale: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w * scale, h * scale,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h * scale; x <- 0 until w * scale) {
        val v = ((x / scale) * 7 + (y / scale) * 13 + (x / scale) * (y / scale)) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // grid-aligned dimensions (multiples of 8): floor((s·x+d)·8/(s·w))
    // = floor(x·8/w) exactly, so each upscaled pixel group lands whole
    // in its source pixel's block — every block comparison, hence
    // every bit, is unchanged. (Non-aligned sizes redistribute the
    // boundary pixels and the hash may drift a bit or two — which is
    // hamming-near, the metric's whole point.)
    val ds = Seq(
      MediaRecord(1L, "image/png", png(16, 8, 1)),
      MediaRecord(2L, "image/png", png(16, 8, 2)),
      MediaRecord(3L, "image/png", png(16, 8, 3))).toDS()
    val out = Multimodal.imagePerceptualHash(ds).collect()
      .map(p => p.doc_id -> p).toMap
    assert((out(1L).b0, out(1L).b1, out(1L).b2, out(1L).b3) ==
      (out(3L).b0, out(3L).b1, out(3L).b2, out(3L).b3))
    assert((out(1L).b0, out(1L).b1, out(1L).b2, out(1L).b3) ==
      (out(2L).b0, out(2L).b1, out(2L).b2, out(2L).b3))
    assert(Seq(out(1L).b0, out(1L).b1, out(1L).b2, out(1L).b3)
      .exists(_ != 0)) // and the pattern is not degenerate
  }

  test("imageNeardupPairs: banded candidates + hamming filter; " +
    "bucketCap drops floods; tau bounds enforced") {
    import spark.implicits._
    import Multimodal.ImagePHash
    // planted geometry: 1-2 at hamming 1 (b0 differs by one bit),
    // 3 differs from 1 in one bit PER band (hamming 4: candidate via
    // no shared band? — it shares none, correctly unreachable),
    // 4 shares band values with nobody
    val hs = Seq(
      ImagePHash(1L, 16, 16, 0x00ff, 0x0f0f, 0x3333, 0x5555),
      ImagePHash(2L, 16, 16, 0x00fe, 0x0f0f, 0x3333, 0x5555),
      ImagePHash(3L, 16, 16, 0x00fd, 0x0f0e, 0x3332, 0x5554),
      ImagePHash(4L, 16, 16, 0x1111, 0x2222, 0x4444, 0x0101)).toDS()
    val pairs = Multimodal.imageNeardupPairs(hs, tau = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    // (1,2) at hamming 1; (2,3) shares NO band (b0 fe vs fd, others
    // differ) → not a candidate even at hamming 5; (1,3) ditto
    assert(pairs.toSeq == Seq((1L, 2L, 1)))
    // a flood of identical hashes past bucketCap is dropped, not
    // exploded into cap² pairs
    val flood = (1L to 5L).map(i =>
      ImagePHash(i, 8, 8, 7, 7, 7, 7)).toDS()
    assert(Multimodal.imageNeardupPairs(flood, tau = 0, bucketCap = 4)
      .count() == 0)
    assert(intercept[IllegalArgumentException] {
      Multimodal.imageNeardupPairs(hs, tau = 4)
    }.getMessage.contains("tau"))
  }

  test("audioFingerprint: hand-checked energy-delta bits on a real WAV; " +
    "trailing partial window dropped; window bound") {
    import spark.implicits._
    // 7 samples at window=2: devs (0,0)(2,-2)(0,1) + one dropped tail
    // sample → energies 0, 8, 1 → bits: 8>0 = '1', 1>8 = '0'
    def wav(samples: Array[Int]): Array[Byte] = {
      val bytesArr = samples.map(s => (s + 128).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
        /* signed = */ false, /* bigEndian = */ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytesArr), fmt, bytesArr.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val ds = Seq(MediaRecord(1L, "audio/wav",
      wav(Array(0, 0, 2, -2, 0, 1, 9)))).toDS()
    val got = Multimodal.audioFingerprint(ds, window = 2).collect().head
    assert(got.n_windows == 3 && got.fp == "10")
    // equal energies (silence) read 0 — strict >
    val silent = Seq(MediaRecord(2L, "audio/wav",
      wav(Array(5, -5, -5, 5)))).toDS()
    assert(Multimodal.audioFingerprint(silent, window = 2)
      .collect().head.fp == "0")
    assert(intercept[IllegalArgumentException] {
      Multimodal.audioFingerprint(ds, window = 1)
    }.getMessage.contains("window"))
  }

  test("aHash property: PNG round-trip hash ≡ independent direct " +
    "computation on the source pixels (100 random images)") {
    import spark.implicits._
    // deterministic LCG so the property replays; images up to 23×19
    var seed = 0x2545F4914F6CDD1DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val cases = (0 until 100).map { i =>
      val w = 8 + nextInt(16); val h = 8 + nextInt(12)
      val px = Array.tabulate(h, w)((_, _) =>
        (nextInt(256), nextInt(256), nextInt(256)))
      (i.toLong, w, h, px)
    }
    // independent implementation: BigInt arithmetic, no shared code
    def direct(w: Int, h: Int, px: Array[Array[(Int, Int, Int)]]): Seq[Int] = {
      val bSum = Array.fill(64)(BigInt(0)); val bN = Array.fill(64)(BigInt(0))
      var tot = BigInt(0)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(y)(x); val gray = BigInt(r + g + b)
        val blk = (y * 8 / h) * 8 + (x * 8 / w)
        bSum(blk) += gray; bN(blk) += 1; tot += gray
      }
      val bands = Array.fill(4)(0)
      for (blk <- 0 until 64)
        if (bSum(blk) * (BigInt(w) * h) > tot * bN(blk))
          bands(blk / 16) |= 1 << (blk % 16)
      bands.toSeq
    }
    def png(w: Int, h: Int, px: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(y)(x)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val recs = cases.map { case (id, w, h, px) =>
      MediaRecord(id, "image/png", png(w, h, px)) }.toDS()
    val got = Multimodal.imagePerceptualHash(recs).collect()
      .map(p => p.doc_id -> Seq(p.b0, p.b1, p.b2, p.b3)).toMap
    cases.foreach { case (id, w, h, px) =>
      assert(got(id) == direct(w, h, px),
        s"aHash mismatch at image $id (${w}x$h)")
    }
  }

  test("audioFingerprint property: WAV round-trip fingerprint ≡ " +
    "independent direct computation (100 random streams)") {
    import spark.implicits._
    var seed = 0x9E3779B97F4A7C15L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val cases = (0 until 100).map { i =>
      val n = 40 + nextInt(400)
      (i.toLong, Array.fill(n)(nextInt(256)))
    }
    def direct(samples: Array[Int], window: Int): (Int, String) = {
      val nw = samples.length / window
      val e = (0 until nw).map(w =>
        (0 until window).map { j =>
          val d = BigInt(samples(w * window + j) - 128); d * d
        }.sum)
      (nw, (1 until nw).map(w => if (e(w) > e(w - 1)) '1' else '0').mkString)
    }
    def wav(samples: Array[Int]): Array[Byte] = {
      val bytesArr = samples.map(_.toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytesArr), fmt, bytesArr.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val recs = cases.map { case (id, s) =>
      MediaRecord(id, "audio/wav", wav(s)) }.toDS()
    val got = Multimodal.audioFingerprint(recs, window = 16).collect()
      .map(f => f.doc_id -> ((f.n_windows, f.fp))).toMap
    cases.foreach { case (id, s) =>
      assert(got(id) == direct(s, 16), s"fingerprint mismatch at stream $id")
    }
  }

  test("imageNeardupAgainstCorpus: cross-side pairs only; same-side " +
    "twins never pair; per-side bucket cap") {
    import spark.implicits._
    import Multimodal.ImagePHash
    // new side: 1 and 5 are IDENTICAL twins (must never pair with each
    // other — no new-vs-new candidates by construction); ref side: 2
    // matches them at hamming 0, 4 shares no band with anything
    val newSide = Seq(
      ImagePHash(1L, 16, 16, 0x00ff, 0x0f0f, 0x3333, 0x5555),
      ImagePHash(5L, 16, 16, 0x00ff, 0x0f0f, 0x3333, 0x5555)).toDS()
    val refSide = Seq(
      ImagePHash(2L, 16, 16, 0x00ff, 0x0f0f, 0x3333, 0x5554),
      ImagePHash(4L, 16, 16, 0x1111, 0x2222, 0x4444, 0x0101)).toDS()
    val got = Multimodal.imageNeardupAgainstCorpus(newSide, refSide, tau = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.toSeq == Seq((1L, 2L, 1), (5L, 2L, 1)))
    // per-side cap: a flooded REF bucket (11 exact twins of the new
    // side — WOULD pair at hamming 0 uncapped) drops wholesale
    val refFlood = (10L to 20L).map(i =>
      ImagePHash(i, 16, 16, 0x00ff, 0x0f0f, 0x3333, 0x5555)).toDS()
    assert(Multimodal.imageNeardupAgainstCorpus(
      newSide, refFlood, tau = 3).count() == 22) // uncapped: 2×11 pairs
    assert(Multimodal.imageNeardupAgainstCorpus(
      newSide, refFlood, tau = 3, bucketCap = 5).count() == 0)
  }

  test("readMediaDir: binaryFile directory ingest — magic-byte mime " +
      "sniffing, deterministic path-derived ids, payloads decode " +
      "identically to direct records, glob filter") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("media-in").toString
    def write(name: String, bytes: Array[Byte]): Unit =
      Files.write(Paths.get(dir, name), bytes)
    write("a.png", Multimodal.renderPng(1L))
    write("b.wav", Multimodal.renderWav(2L))
    // extension LIES: magic bytes must win over the name
    write("liar.png", Multimodal.renderWav(3L))
    write("junk.bin", Array.tabulate(64)(_.toByte))
    val got = Multimodal.readMediaDir(spark, dir)
      .collect().map(r => (r.getAs[String]("path").split('/').last,
        r.getAs[String]("mime"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("length"))).sortBy(_._1)
    assert(got.map(t => t._1 -> t._2).toSeq == Seq(
      "a.png" -> "image/png", "b.wav" -> "audio/wav",
      "junk.bin" -> "application/octet-stream",
      "liar.png" -> "audio/wav"), s"got ${got.toSeq}")
    // ids are deterministic across reads and distinct per path
    val again = Multimodal.readMediaDir(spark, dir)
      .collect().map(r => (r.getAs[String]("path").split('/').last,
        r.getAs[Long]("doc_id"))).sortBy(_._1)
    assert(again.map(_._2).toSeq == got.map(_._3).toSeq)
    assert(got.map(_._3).distinct.length == 4)
    // the payloads are byte-faithful: the PNG decodes to the SAME
    // features as a direct MediaRecord of the same bytes
    val viaDir = Multimodal.decodeImageStats(Multimodal.toMediaRecords(
      Multimodal.readMediaDir(spark, dir, glob = "a.png")))
      .collect().map(s => (s.width, s.height, s.sum_r, s.sum_g, s.sum_b))
    val direct = Multimodal.decodeImageStats({
      import spark.implicits._
      Seq(MediaRecord(9L, "image/png", Multimodal.renderPng(1L))).toDS()
    }).collect().map(s => (s.width, s.height, s.sum_r, s.sum_g, s.sum_b))
    assert(viaDir.toSeq == direct.toSeq, s"$viaDir vs $direct")
    // glob filters by NAME (mime still sniffed from bytes)
    assert(Multimodal.readMediaDir(spark, dir, glob = "*.png")
      .count() == 2)
  }
}
