package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorAgg

class VectorAggSpec extends SparkSpec {

  test("vector_sum equals the per-dimension explode formulation") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .withColumn("grp", col("vec_id") % 7)
      .repartition(8) // force partial-aggregate merges across partitions
    val viaAgg = emb.groupBy("grp")
      .agg(VectorAgg.vectorSum(col("embedding")).as("vsum"))
      .select(col("grp"), posexplode(col("vsum")).as(Seq("dim", "s")))
    val viaExplode = emb
      .select(col("grp"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("grp", "dim").agg(sum(col("v").cast("double")).as("s2"))
    val j = viaAgg.join(viaExplode, Seq("grp", "dim"))
    assert(j.count() == viaExplode.count())
    assert(j.filter(abs(col("s") - col("s2")) > 1e-6).count() == 0)
  }

  test("vector_sum ignores null vectors and returns null for all-null groups") {
    import spark.implicits._
    val df = Seq(
      (0, Some(Seq(1.0f, 2.0f))),
      (0, None),
      (1, None)).toDF("g", "v")
    val r = df.groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s"))
      .orderBy("g").collect()
    assert(r(0).getSeq[Double](1) == Seq(1.0, 2.0))
    assert(r(1).isNullAt(1))
  }
}
