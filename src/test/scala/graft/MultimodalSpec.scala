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
