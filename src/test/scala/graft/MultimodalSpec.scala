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
