package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` content + typed metadata,
  * with decode / feature-extraction as batched per-partition transforms.
  *
  * Pattern (what a 100 TB media pipeline needs from the engine):
  *  - media payloads are opaque BinaryType columns scanned from parquet —
  *    never parsed by Catalyst, never part of a shuffle key; metadata
  *    travels in narrow typed columns next to them;
  *  - decoding runs via `mapPartitions` so a real codec/model is
  *    initialized ONCE per partition (per executor task), then streams
  *    through the partition's rows — the Scala analog of batched
  *    `mapInPandas`;
  *  - partitioning is controlled upstream (`repartition(n)`) so decode
  *    parallelism is independent of file layout.
  *
  * The actual decoder is a STUB: the container has no image/audio codecs,
  * so `decodeStub` computes a deterministic fake "feature vector" (byte
  * histogram) with the exact shape, signature, and batching a real decoder
  * would use. Swap `decodeStub` for a codec call; nothing else changes.
  */
object Multimodal {

  /** Typed media row: opaque bytes + structured metadata. */
  case class MediaItem(media_id: Long, kind: String, content: Array[Byte],
                       mime: String, n_bytes: Long)

  /** Decoded features: fixed-width vector + dimensions "parsed" from content. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           features: Array[Double])

  val FeatureDim = 16

  /** Synthesize a media table from the documents corpus: text bytes stand in
    * for an opaque payload (the plumbing neither knows nor cares). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        when(col("lang") === "zh", lit("audio")).otherwise(lit("image")).as("kind"),
        col("text").cast("binary").as("content"),
        concat(lit("application/x-fake-"), col("lang")).as("mime"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .as[MediaItem]
  }

  /** STUB decoder: deterministic 16-bucket byte histogram, normalized.
    * A real implementation would decode image pixels / audio frames here;
    * per-partition init cost is amortized exactly like a codec's would be. */
  def decodeStub(items: Iterator[MediaItem]): Iterator[MediaFeatures] = {
    // (real pipeline: val codec = HeavyCodec.init() — once per partition)
    items.map { m =>
      val hist = new Array[Double](FeatureDim)
      m.content.foreach(b => hist((b & 0xff) % FeatureDim) += 1.0)
      val n = math.max(1.0, m.content.length.toDouble)
      MediaFeatures(m.media_id, m.kind, m.n_bytes, hist.map(_ / n))
    }
  }

  /** The full decode stage: controlled parallelism + batched decode. */
  def extractFeatures(media: Dataset[MediaItem], partitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions).mapPartitions(decodeStub)
  }

  /** A sampled "video" frame: byte slice + its position metadata. */
  case class MediaFrame(media_id: Long, frame_idx: Long, frame_bytes: Long)

  val FrameSize = 16

  /** Frame sampling for video-like payloads: treat the opaque payload as a
    * sequence of FrameSize-byte frames and keep every `stride`-th one —
    * the deterministic stand-in for "decode container, keep 1 fps". Runs
    * in the same batched mapPartitions shape as the decoder (a real
    * demuxer initializes once per partition); the payload is sliced
    * per-row, never shuffled — only the narrow (id, idx, len) rows leave
    * the stage. */
  def sampleFrames(media: Dataset[MediaItem], stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { items =>
      // (real pipeline: val demuxer = Demuxer.init() — once per partition)
      items.flatMap { m =>
        val frames = m.content.grouped(FrameSize).zipWithIndex
        frames.collect {
          case (bytes, idx) if idx % stride == 0 =>
            MediaFrame(m.media_id, idx.toLong, bytes.length.toLong)
        }
      }
    }
  }

  /** A "resized" payload's stats: output size + byte checksum. */
  case class ResizedMedia(media_id: Long, n_bytes_out: Long, checksum: Long)

  /** STUB resize: nearest-neighbor byte downsample — keep every
    * `stride`-th byte of the opaque payload (a real implementation decodes
    * and rescales pixels here; the batching, signature, and per-partition
    * init shape are identical). Emits the downsampled length and an exact
    * byte checksum so the slicing is oracle-checkable: an off-by-one in
    * the stride positions changes the checksum. */
  def resizeStub(items: Iterator[MediaItem], stride: Int): Iterator[ResizedMedia] = {
    // (real pipeline: val scaler = Scaler.init(targetDims) — once per partition)
    items.map { m =>
      var i = 0; var n = 0L; var sum = 0L
      while (i < m.content.length) {
        n += 1; sum += (m.content(i) & 0xff).toLong; i += stride
      }
      ResizedMedia(m.media_id, n, sum)
    }
  }

  /** Declared face of the resize stage. Empty payloads are excluded (no
    * bytes to resize), matching the frames query's convention. The oracle
    * replays the stride positions with character indexing — valid because
    * the fixture corpus is pure ASCII (char position == byte position;
    * asserted by the octet_length/length parity in q_multimodal_bytes). */
  def resizeStats(spark: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter(col("n_bytes") > 0)
      .mapPartitions(items => resizeStub(items, stride))
      .toDF()
  }

  /** Per-item stats of the sampled frames — the declared, oracle-checkable
    * face of sampleFrames (the oracle recomputes the same counts from
    * n_bytes arithmetic, so a slicing bug shows up as a value mismatch).
    * Items with an EMPTY payload have no frames and therefore no row —
    * the oracle filters `n_bytes > 0` to match. */
  def frameStats(spark: SparkSession, dir: String, stride: Int = 4): DataFrame =
    sampleFrames(mediaFromDocuments(spark, dir), stride)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled"),
           sum(col("frame_bytes")).as("sampled_bytes"),
           max(col("frame_idx")).as("last_frame_idx"))

  /** Oracle-checkable byte-level metadata over the media table. */
  def byteStats(spark: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(spark, dir)
      .groupBy("kind")
      .agg(count(lit(1)).as("n_items"),
           sum(col("n_bytes")).as("total_bytes"),
           max(col("n_bytes")).as("max_bytes"))
}
