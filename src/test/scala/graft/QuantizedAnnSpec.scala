package graft

import org.apache.spark.sql.functions._

class QuantizedAnnSpec extends SparkSpec {

  test("int8-quantized top-k keeps high recall vs full precision") {
    val full = SparkEntry.queries("d5_embed_topk")(spark, sf)
      .select(col("q_id"), col("neighbor_id"))
    val quant = SparkEntry.queries("d16_quantized_ann")(spark, sf)
      .select(col("q_id"), col("neighbor_id"))
    val overlap = full.intersect(quant).count()
    val total = full.count()
    assert(total == 50)
    assert(overlap >= (total * 0.7).toLong, s"recall ${overlap.toDouble / total} < 0.7")
  }

  test("hamming search returns valid distances and full result sets") {
    val hm = SparkEntry.queries("d17_hamming_ann")(spark, sf).cache()
    assert(hm.count() == 50)
    assert(hm.filter(col("hd") < 0 || col("hd") > 64).count() == 0)
    // hamming neighbors at least loosely agree with cosine neighbors:
    // the best cosine neighbor should sit in the hamming top-20 usually;
    // just assert structural sanity + determinism here
    val hm2 = SparkEntry.queries("d17_hamming_ann")(spark, sf)
    assert(hm.exceptAll(hm2).count() == 0)
    hm.unpersist()
  }
}
