package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode / feature-extraction runs partition-local.
  *
  * IMAGE decode is REAL: [[ImageIoDecoder]] runs javax.imageio (ships
  * in the JDK — PNG/JPEG/BMP/GIF, zero external deps, offline) and
  * extracts true pixel dimensions + luminance stats. AUDIO decode is
  * REAL: [[WavDecoder]] runs javax.sound.sampled (also in the JDK —
  * WAV/AIFF/AU PCM) and extracts true frame/channel counts + amplitude
  * stats. FRAME SAMPLING is real for animated GIFs ([[decodeFrames]] —
  * ImageIO's gif reader exposes every frame of a multi-frame payload).
  * Payloads none of those handle (the demo corpus carries text bytes
  * standing in for media; genuine video codecs aren't in this
  * container) fall back per row to the deterministic
  * [[ByteHistogramDecoder]] stub. The Spark side (schema, batching,
  * partition-local execution, output shape) is identical either way;
  * a production deployment swaps in ffmpeg/soundfile behind the same
  * [[MediaDecoder]] seam and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int)
  /** width/height are the DECODED dimensions for a real image decode
    * (the metadata's claim, passed through, for the byte stub). */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, histogram: Array[Long], checksum: Long,
      decoder: String)

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

  /** STUB codec: byte-histogram (16 bins) + additive checksum over the
    * RAW payload bytes (no decode). Deterministic, partition-local —
    * the per-row fallback for payloads no real codec handles. */
  object ByteHistogramDecoder extends MediaDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      // STUB: stands in for codecs not in this container (audio/video).
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < r.payload.length) {
        hist((r.payload(i) & 0xff) >> 4) += 1
        sum = sum * 31 + (r.payload(i) & 0xff)
        i += 1
      }
      MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
        r.width, r.height, hist, sum, "byte_stub")
    }
  }

  /** REAL image codec: javax.imageio (in the JDK — no external deps,
    * no network). Decodes the payload and extracts TRUE pixel
    * dimensions (not the metadata's claim), a 16-bin luminance
    * histogram, and a rolling luminance checksum — deterministic
    * per-pixel arithmetic over the decoded ARGB raster. Throws on a
    * payload ImageIO cannot decode (pair with [[WithFallback]] for
    * mixed corpora). */
  object ImageIoDecoder extends MediaDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"payload of doc ${r.doc_id} is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Long](16)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          hist(lum >> 4) += 1
          sum = sum * 31 + lum
          x += 1
        }
        y += 1
      }
      MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
        w, h, hist, sum, "imageio")
    }
  }

  /** REAL audio codec: javax.sound.sampled (in the JDK — no external
    * deps, offline). Parses the payload's audio container (WAV/AIFF/AU),
    * converts to 16-bit signed PCM, and extracts true per-channel frame
    * count + channel count + a 16-bin amplitude histogram + a rolling
    * sample checksum. The generic [[MediaFeatures]] fields are
    * modality-mapped: `width` = frames per channel, `height` = channels
    * (documented here, asserted in MultimodalSpec). Throws on a payload
    * the JDK audio stack cannot parse (pair with [[WithFallback]]). */
  object WavDecoder extends MediaDecoder {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    def decode(r: MediaRow): MediaFeatures = {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      // close `raw` even when the PCM conversion below throws
      // (unsupported encoding): harmless on today's byte-array payloads
      // but a real leak if a file/stream-backed source is swapped in
      try decodePcm(r, raw) finally raw.close()
    }
    private def decodePcm(r: MediaRow,
        raw: javax.sound.sampled.AudioInputStream): MediaFeatures = {
      val src = raw.getFormat
      // normalize to 16-bit signed little-endian PCM so the feature
      // arithmetic is one fixed loop regardless of source encoding
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        src.getChannels * 2, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, raw)
      try {
        val bytes = pcm.readAllBytes()
        val channels = target.getChannels
        val nSamples = bytes.length / 2
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < nSamples) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
          hist((s + 32768) >> 12) += 1
          sum = sum * 31 + s
          i += 1
        }
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          nSamples / channels, channels, hist, sum, "wav_pcm")
      } finally pcm.close()
    }
  }

  /** Per-row codec fallback: try `primary`, take `fallback` on any
    * decode failure. The `decoder` output column records which ran. */
  case class WithFallback(primary: MediaDecoder, fallback: MediaDecoder)
      extends MediaDecoder {
    def decode(r: MediaRow): MediaFeatures =
      try primary.decode(r)
      catch { case scala.util.control.NonFatal(_) => fallback.decode(r) }
  }

  /** Decode every payload partition-locally with the given codec — the
    * execution shape a real decoder needs (batched per partition, no
    * shuffle, columnar in/out). */
  def decodeWith(media: Dataset[MediaRow], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decoder.decode))
  }

  /** Container sniff + dispatch: route each payload by its magic bytes
    * (PNG/JPEG/GIF/BMP → ImageIO, RIFF-WAVE/AIFF/AU → PCM decode,
    * anything else → byte stub) so non-media payloads never enter a
    * codec. Exception-driven probing instead of this O(1) sniff
    * measured 0.34 → 9.8 s on the 10× bench's 500 k text-byte payloads
    * (ImageIO reader scan + audio provider scan, two thrown-and-caught
    * fallbacks per row). A payload whose magic LIES (valid header,
    * corrupt body) still falls back per row via [[WithFallback]]. */
  object AutoDecoder extends MediaDecoder {
    private def m(p: Array[Byte], i: Int, c: Char): Boolean = p(i) == c.toByte
    private def looksImage(p: Array[Byte]): Boolean = p.length >= 4 && (
      (p(0) == 0x89.toByte && m(p, 1, 'P') && m(p, 2, 'N') && m(p, 3, 'G')) ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||
      (m(p, 0, 'G') && m(p, 1, 'I') && m(p, 2, 'F')) ||
      (m(p, 0, 'B') && m(p, 1, 'M')))
    private def looksAudio(p: Array[Byte]): Boolean = p.length >= 12 && (
      (m(p, 0, 'R') && m(p, 1, 'I') && m(p, 2, 'F') && m(p, 3, 'F') &&
        m(p, 8, 'W') && m(p, 9, 'A') && m(p, 10, 'V') && m(p, 11, 'E')) ||
      (m(p, 0, 'F') && m(p, 1, 'O') && m(p, 2, 'R') && m(p, 3, 'M')) ||
      (m(p, 0, '.') && m(p, 1, 's') && m(p, 2, 'n') && m(p, 3, 'd')))
    private val image = WithFallback(ImageIoDecoder, ByteHistogramDecoder)
    private val audio = WithFallback(WavDecoder, ByteHistogramDecoder)
    def decode(r: MediaRow): MediaFeatures =
      if (looksImage(r.payload)) image.decode(r)
      else if (looksAudio(r.payload)) audio.decode(r)
      else ByteHistogramDecoder.decode(r)
  }

  /** The registered d21 path: magic-byte dispatch to the real ImageIO /
    * JDK-audio codecs, byte stub for everything else. */
  def decodeAuto(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    decodeWith(media, AutoDecoder)

  /** [[decodeWith]] + the stub codec only (spec baseline). */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    decodeWith(media, ByteHistogramDecoder)

  case class FrameRow(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, lum_mean: Double, frame_fp: Long)

  /** REAL frame sampling: decode every frame of a multi-frame payload
    * (animated GIF — the one multi-frame container the JDK decodes
    * offline; the execution shape is identical for a video codec) and
    * emit one row per sampled frame with true dimensions, mean
    * luminance, and a deterministic per-frame luminance fingerprint
    * (the stand-in for a per-frame embedding). `stride` keeps every
    * stride-th frame — the frame-rate decimation knob of a video
    * pipeline. Partition-local, one reader per payload, no shuffle. */
  def decodeFrames(media: Dataset[MediaRow], stride: Int = 1): Dataset[FrameRow] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        reader.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload)))
        val n = reader.getNumImages(true)
        (0 until n by stride).iterator.map { i =>
          val img = reader.read(i)
          val w = img.getWidth
          val h = img.getHeight
          var lumSum = 0L
          var fp = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              lumSum += lum
              fp = fp * 31 + lum
              x += 1
            }
            y += 1
          }
          FrameRow(r.doc_id, i, w, h, lumSum.toDouble / (w.toLong * h), fp)
        }.toArray.iterator
      } finally reader.dispose()
    })
  }

  /** Per-asset rollup of [[decodeFrames]] output — the "per-frame
    * model → per-asset aggregate" tail of a video pipeline, over REAL
    * decoded frames. */
  def frameReport(frames: Dataset[FrameRow]): DataFrame =
    frames.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("frame_fp")).as("n_distinct_frames"),
        max(col("width")).as("width"), max(col("height")).as("height"),
        avg(col("lum_mean")).as("lum_mean"))

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
