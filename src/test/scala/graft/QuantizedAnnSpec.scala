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

  test("PQ ANN: high recall vs full precision after re-rank; codes are M bytes; deterministic") {
    val full = SparkEntry.queries("d5_embed_topk")(spark, sf)
      .select(col("q_id"), col("neighbor_id"))
    val pq = SparkEntry.queries("d32_pq_ann")(spark, sf).cache()
    assert(pq.count() == 50)
    val overlap = full.intersect(pq.select(col("q_id"), col("neighbor_id"))).count()
    // refine=50 exact-re-ranked candidates out of a few hundred vectors
    // at test SF: near-exact is the expectation, 0.8 the gate
    assert(overlap >= 40, s"PQ recall ${overlap / 50.0} < 0.8")
    val pq2 = SparkEntry.queries("d32_pq_ann")(spark, sf)
    assert(pq.exceptAll(pq2).count() == 0, "PQ search is nondeterministic")
    pq.unpersist()
    // the code column really is M tinyints
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cb = graft.operators.Similarity.trainPqCodebook(emb, m = 4, k = 16, iters = 2)
    assert(cb.length == 4 && cb.forall(_.forall(_.length == 16)))
    val codes = emb.select(
      graft.functions.VectorExprs.pqEncode(col("embedding"), cb).as("codes"))
    assert(codes.filter(size(col("codes")) =!= 4).count() == 0)
  }

  test("PQ ADC score approximates the true dot product within quantization error") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cb = graft.operators.Similarity.trainPqCodebook(emb, m = 4, k = 16, iters = 4)
    import graft.functions.VectorExprs
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_vec"),
        VectorExprs.pqQueryTable(col("embedding"), cb).as("tbl"))
    val scored = emb.crossJoin(broadcast(q))
      .select(
        VectorExprs.pqAdc(VectorExprs.pqEncode(col("embedding"), cb), col("tbl"), 16)
          .as("approx"),
        VectorExprs.dotF(col("embedding"), col("q_vec")).as("exact"))
    // mean absolute ADC error well under the mean |dot| magnitude:
    // the approximation must carry signal, not noise
    val row = scored.agg(avg(abs(col("approx") - col("exact"))).as("mae"),
      avg(abs(col("exact"))).as("mag")).head()
    val (mae, mag) = (row.getDouble(0), row.getDouble(1))
    assert(mae < mag, s"ADC error $mae exceeds signal magnitude $mag")
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
