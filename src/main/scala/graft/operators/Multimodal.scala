package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed by per-partition batch
  * decoders (builder brief).
  *
  * The decode step itself is STUBBED — media codecs are not in this
  * container — with a deterministic byte-level fake. Everything around
  * it is the real Spark shape: typed `Dataset[MediaRecord]` with
  * case-class encoders, `mapPartitions` so a real decoder would
  * initialize its codec once per partition (not per row), and a
  * schema-stable `MediaFeatures` output that downstream DataFrame ops
  * consume. Swapping `decodeStub` for a JNI/FFmpeg call changes no
  * plumbing.
  *
  * Scale: decode is embarrassingly parallel; partition count is
  * inherited from the source scan, so 100 TB of payloads spread over
  * the cluster with no shuffle. Only `mapPartitions` is used — never a
  * driver-side collect.
  */
object Multimodal {

  /** One media object: opaque payload + the metadata a real ingest
    * carries. */
  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoder output: fixed-width features a training pipeline joins on. */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      head_hex: String,
      width: Int,      // stubbed "decoded" dimensions
      height: Int,
      n_frames: Int)   // stubbed frame-sample count

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
      n_frames = n / 100)
  }

  /** The decode/feature-extract stage: one decoder "session" per
    * partition, streamed over the iterator (no materialization). */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real codec init would happen here, once per partition
      it.map(decodeStub)
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

  /** Documents → MediaRecords (text bytes standing in for payloads). */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "'text/plain' AS mime", "encode(text, 'UTF-8') AS payload")
      .as[MediaRecord]
  }
}
