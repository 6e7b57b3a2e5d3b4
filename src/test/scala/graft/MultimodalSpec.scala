package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  test("media table carries an opaque binary payload + typed metadata") {
    val m = Multimodal.asMediaTable(spark, sf)
    assert(m.schema("payload").dataType == BinaryType)
    assert(m.count() > 0)
    assert(m.filter(col("media_type").isin("image/png", "audio/wav")).count() == m.count())
  }

  test("decode stub is partition-local, deterministic, and shape-preserving") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(spark, sf).as[MediaRow]
    val feats = Multimodal.decodeStub(media).cache()
    val n = Tables.documents(spark, sf).count()
    assert(feats.count() == n)
    // histogram mass equals payload length
    val bad = feats.toDF()
      .withColumn("mass", expr("aggregate(histogram, cast(0 as bigint), (a, x) -> a + x)"))
      .filter(col("mass") =!= col("n_bytes")).count()
    assert(bad == 0)
    // deterministic
    val again = Multimodal.decodeStub(media)
    assert(feats.toDF().exceptAll(again.toDF()).count() == 0)
    feats.unpersist()
  }

  test("ImageIO decoder: real PNG decode gives exact dims + pixel stats; non-image falls back per row") {
    import spark.implicits._
    // deterministic 8×5 grayscale gradient, PNG-encoded in memory
    // (PNG is lossless, so the decoded raster is bit-identical)
    val (w, h) = (8, 5)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 36 + y * 7) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // expected stats straight from the generator arithmetic (luminance
    // of a gray pixel (v,v,v) is v), same y-outer/x-inner order
    val expHist = new Array[Long](16)
    var expSum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 36 + y * 7) % 256
      expHist(v >> 4) += 1
      expSum = expSum * 31 + v
    }
    val rows = Seq(
      // metadata CLAIMS 999×999 — the decoder must report the true 8×5
      MediaRow(1L, "image/png", png, 999, 999),
      MediaRow(2L, "audio/wav", "definitely not an image".getBytes("UTF-8"), 3, 4))
    val feats = Multimodal.decodeAuto(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    val f1 = feats(0)
    assert(f1.decoder == "imageio", s"PNG payload did not take the ImageIO path: $f1")
    assert(f1.width == w && f1.height == h,
      s"decoded dims (${f1.width}×${f1.height}) != true dims ($w×$h)")
    assert(f1.histogram.toSeq == expHist.toSeq, "luminance histogram mismatch")
    assert(f1.checksum == expSum, "pixel checksum mismatch")
    assert(f1.n_bytes == png.length.toLong)
    val f2 = feats(1)
    assert(f2.decoder == "byte_stub" && f2.width == 3 && f2.height == 4,
      s"non-image payload must fall back to the byte stub with metadata dims: $f2")
  }

  test("WAV decoder: real PCM decode gives exact frames/channels + amplitude stats") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import spark.implicits._
    // deterministic 16-bit signed little-endian PCM covering the full
    // amplitude range, WAV-encoded in memory (WAV PCM is lossless)
    def wavBytes(samples: Array[Short], channels: Int): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        raw(2 * i) = (s & 0xff).toByte
        raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, channels, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw),
        fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mono = Array.tabulate(100)(i => ((i * 1103 + 7) * 599 % 65536 - 32768).toShort)
    val stereo = Array.tabulate(120)(i => ((i * 271 - 60 * 271) % 32768).toShort)
    val expHist = new Array[Long](16)
    var expSum = 0L
    mono.foreach { s => expHist((s + 32768) >> 12) += 1; expSum = expSum * 31 + s }
    val rows = Seq(
      MediaRow(1L, "audio/wav", wavBytes(mono, 1), 0, 0),
      MediaRow(2L, "audio/wav", wavBytes(stereo, 2), 0, 0),
      MediaRow(3L, "audio/wav", "not audio either".getBytes("UTF-8"), 5, 6))
    val feats = Multimodal.decodeAuto(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    val f1 = feats(0)
    assert(f1.decoder == "wav_pcm", s"WAV payload did not take the PCM path: $f1")
    // width = frames per channel, height = channels (the documented mapping)
    assert(f1.width == 100 && f1.height == 1,
      s"mono frames/channels (${f1.width}/${f1.height}) != (100/1)")
    assert(f1.histogram.toSeq == expHist.toSeq, "amplitude histogram mismatch")
    assert(f1.checksum == expSum, "sample checksum mismatch")
    val f2 = feats(1)
    assert(f2.decoder == "wav_pcm" && f2.width == 60 && f2.height == 2,
      s"stereo frames/channels must be (60/2): $f2")
    assert(f2.histogram.sum == 120L, "stereo histogram must count every sample")
    val f3 = feats(2)
    assert(f3.decoder == "byte_stub" && f3.width == 5 && f3.height == 6,
      s"non-audio payload must fall back to the byte stub: $f3")
  }

  test("GIF frame decode: real multi-frame decode with exact per-frame stats and stride") {
    import spark.implicits._
    // 4 flat-gray frames (tiny palette → the JDK gif writer is lossless)
    val grays = Seq(0, 51, 102, 153)
    val (w, h) = (6, 4)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { v =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    val gif = bos.toByteArray
    val media = spark.createDataset(Seq(MediaRow(9L, "video/gif", gif, 0, 0)))
    val frames = Multimodal.decodeFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.length == grays.length, s"expected ${grays.length} frames, got ${frames.length}")
    frames.zip(grays).foreach { case (f, v) =>
      assert(f.width == w && f.height == h, s"frame dims (${f.width}×${f.height}) != ($w×$h)")
      assert(f.lum_mean == v.toDouble, s"flat-gray frame mean ${f.lum_mean} != $v")
      var fp = 0L
      (0 until w * h).foreach(_ => fp = fp * 31 + v)
      assert(f.frame_fp == fp, s"frame fingerprint mismatch for gray $v")
    }
    // stride decimation keeps frames 0 and 2
    val strided = Multimodal.decodeFrames(media, stride = 2).collect().map(_.frame_idx).sorted
    assert(strided.toSeq == Seq(0, 2), s"stride=2 kept ${strided.toSeq}")
    // per-asset rollup over real frames
    val rep = Multimodal.frameReport(Multimodal.decodeFrames(media)).collect()
    assert(rep.length == 1)
    val r = rep(0)
    assert(r.getAs[Long]("n_frames") == 4L && r.getAs[Long]("n_distinct_frames") == 4L)
    assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
  }

  test("per-frame features aggregate back to one row per doc") {
    val media = Multimodal.asMediaTable(spark, sf)
    val framed = Multimodal.frameSample(media, 64).filter(col("n_frames") > 0)
    val feats = Multimodal.frameFeatures(framed)
    assert(feats.count() == framed.count())
    assert(feats.filter(col("n_distinct_frames") > col("n_frames")).count() == 0)
    assert(feats.filter(col("n_frames") <= 0).count() == 0)
  }

  test("frame sampling produces ceil(len/k) frames") {
    val media = Multimodal.asMediaTable(spark, sf)
    val framed = Multimodal.frameSample(media, 64)
    val bad = framed.join(Multimodal.asMediaTable(spark, sf), "doc_id")
      .withColumn("expect", expr("cast(length(payload) div 64 as int)"))
      .filter(col("n_frames") =!= col("expect")).count()
    assert(bad == 0)
  }
}
