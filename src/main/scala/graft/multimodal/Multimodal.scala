package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode / feature-extraction runs partition-local.
  *
  * The actual codecs (image/audio libs) are NOT in this container, so
  * [[decodeStub]] is a clearly-marked deterministic fake — the Spark
  * side (schema, batching, partition-local execution, output shape) is
  * real and tested. In production the stub body is replaced by the
  * codec call; nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      histogram: Array[Long], checksum: Long)

  /** Wrap the documents table as a media table: payload = utf-8 bytes
    * standing in for an encoded image; metadata struct alongside. */
  def asMediaTable(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)
      .select(col("doc_id"),
        (when(col("doc_id") % 2 === 0, "image/png").otherwise("audio/wav")).as("media_type"),
        encode(col("text"), "UTF-8").cast("binary").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))

  /** Pluggable codec seam: the Spark plumbing (schema, mapPartitions
    * batch shape, no shuffle) is fixed; the per-payload decode is the
    * ONLY thing a production deployment swaps (ImageIO/ffmpeg/soundfile
    * — not in this container). Serializable: instances ship to
    * executors inside the mapPartitions closure. */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRow): MediaFeatures
  }

  /** STUB codec: byte-histogram (16 bins) + additive checksum instead
    * of a real image decode. Deterministic, partition-local. */
  object ByteHistogramDecoder extends MediaDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      // STUB: replace with real codec (e.g. ImageIO/ffmpeg) in prod.
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < r.payload.length) {
        hist((r.payload(i) & 0xff) >> 4) += 1
        sum = sum * 31 + (r.payload(i) & 0xff)
        i += 1
      }
      MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, hist, sum)
    }
  }

  /** Decode every payload partition-locally with the given codec — the
    * execution shape a real decoder needs (batched per partition, no
    * shuffle, columnar in/out). */
  def decodeWith(media: Dataset[MediaRow], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decoder.decode))
  }

  /** The registered d21 path: [[decodeWith]] + the stub codec. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    decodeWith(media, ByteHistogramDecoder)

  /** Per-frame feature pipeline: explode sampled frames, fingerprint
    * each (stub for a per-frame embedding), aggregate back per doc —
    * the full video-processing shape (sample → per-frame model →
    * per-asset rollup) with the model stubbed.
    */
  def frameFeatures(framed: DataFrame): DataFrame =
    framed
      .select(col("doc_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .withColumn("frame_fp", xxhash64(col("frame"))) // STUB: per-frame model
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("frame_fp")).as("n_distinct_frames"),
        min(col("frame_fp")).as("min_fp"))

  /** Frame-sample stub: pick every k-th byte-block as a "frame" — the
    * partitioning/batch shape of video frame sampling. */
  def frameSample(media: DataFrame, k: Int): DataFrame =
    media.select(col("doc_id"),
      // sequence(1,0) would run DESCENDING in Spark, so guard the <k case
      expr(s"if(length(payload) < $k, array(), " +
           s"transform(sequence(1, cast(length(payload) div $k as int)), " +
           s"i -> substring(payload, (i - 1) * $k + 1, 4)))").as("frames"))
      .withColumn("n_frames", size(col("frames")))
}
