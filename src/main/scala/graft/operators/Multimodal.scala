package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The media codecs themselves are NOT available in this environment, so
  * the byte-level decode is a clearly-marked DETERMINISTIC STUB
  * (`StubCodec`) — but everything Spark-side is real and is the part
  * that matters at 100 TB: the schema (binary payload + metadata
  * struct), the batched `mapPartitions` execution shape (one codec
  * init per partition, streaming iterator, no per-row setup), the
  * partitioning story (payloads stay where they were read; only
  * extracted features — a few floats per asset — ever shuffle), and the
  * column pruning (feature queries never deserialize the payload
  * column thanks to parquet column pruning).
  */
object Multimodal {

  /** One media asset: payload + typed metadata. Mirrors how a LAION-like
    * crawl table stores media inline or as object-store pointers. */
  final case class MediaAsset(
      assetId: Long,
      mediaType: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, // pre-extracted container metadata (0 = unknown)
      height: Int,
      durationMs: Long)

  final case class MediaFeatures(
      assetId: Long,
      mediaType: String,
      byteLen: Int,
      checksum: Long,
      brightness: Double, // stub: mean byte value / 255
      features: Array[Float]) // stub: 8-dim byte-histogram sketch

  implicit val assetEnc: Encoder[MediaAsset] = Encoders.product[MediaAsset]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** ======= STUB CODEC =======
    * Stands in for libjpeg/ffmpeg/etc., which this container lacks.
    * Deterministic pure functions of the bytes so tests are exact.
    * The real implementation would swap these bodies only — the
    * partitioning / batching / schema around them is production-shaped.
    */
  object StubCodec {
    /** "Decode" → brightness: mean byte / 255. */
    def brightness(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length / 255.0

    /** "Feature-extract" → 8-bin byte histogram, L1-normalized. */
    def histogram8(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Long](8)
      bytes.foreach(b => h((b & 0xff) >> 5) += 1)
      val n = math.max(1L, bytes.length.toLong)
      h.map(v => (v.toDouble / n).toFloat)
    }

    /** Fowler–Noll–Vo 64-bit checksum (pure-JVM, deterministic). */
    def fnv64(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }

    /** "Resize": deterministic downsample of the byte stream to `k`
      * bytes (every len/k-th byte) — stands in for pixel resampling. */
    def resample(bytes: Array[Byte], k: Int): Array[Byte] =
      if (bytes.length <= k) bytes
      else Array.tabulate(k)(i => bytes((i.toLong * bytes.length / k).toInt))

    /** "Frame-sample": split payload into `frameSize` chunks and keep
      * every `stride`-th chunk — stands in for video frame extraction. */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }
        .toSeq
  }

  /** Batched decode/feature-extract over the payload column.
    *
    * `mapPartitions`, not `map`: codec state (here none; in production a
    * native decoder handle) initializes once per partition, and the
    * iterator streams — constant memory regardless of partition size.
    * Input partitioning is preserved: no shuffle is introduced, so this
    * pipelines directly after the parquet scan. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] =
    assets.mapPartitions { it =>
      // per-partition codec init would go here (native lib handle, etc.)
      it.map { a =>
        MediaFeatures(
          assetId = a.assetId,
          mediaType = a.mediaType,
          byteLen = a.payload.length,
          checksum = StubCodec.fnv64(a.payload),
          brightness = StubCodec.brightness(a.payload),
          features = StubCodec.histogram8(a.payload))
      }
    }(featEnc)

  /** "Resize" stage: payload → bounded payload. Runs in-place on the
    * scan partitions; output rows are strictly smaller (the point of
    * running resize BEFORE any shuffle/exchange at scale). */
  def resizeAll(assets: Dataset[MediaAsset], targetBytes: Int): Dataset[MediaAsset] =
    assets.mapPartitions(_.map(a =>
      a.copy(payload = StubCodec.resample(a.payload, targetBytes))))(assetEnc)

  /** Frame-sampling stage: one asset → N frame rows. The per-frame rows
    * carry (assetId, frameIdx) so downstream grouping is keyed, and the
    * explode happens AFTER resize so the fan-out is on bounded bytes. */
  def sampleFrames(assets: Dataset[MediaAsset], frameSize: Int, stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.flatMap { a =>
      StubCodec.sampleFrames(a.payload, frameSize, stride).zipWithIndex.map {
        case (frame, idx) => (a.assetId, idx, frame, frame.length)
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes", "frame_len")
  }

  /** Deterministic synthetic asset table derived from the `documents`
    * fixture (no binary fixture ships with the driver): payload = UTF-8
    * bytes of the text, mediaType round-robins image/audio/video. Lets
    * every stage above run against driver data with exact expectations. */
  def assetsFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("assetId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 1920).cast("int").as("width"),
        (col("n_chars") % 1080).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("durationMs"))
      .as[MediaAsset]
  }
}
