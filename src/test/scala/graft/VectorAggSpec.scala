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
    // the unit-quantized accumulator is within 0.5e-6 per ROW of the
    // true sum (Math.round(x·1e6) grid)
    val maxRows = emb.groupBy("grp").count().agg(max("count")).head.getLong(0)
    assert(j.filter(abs(col("s") - col("s2")) > 0.5e-6 * maxRows).count() == 0)
    // ...and in exchange it is ORDER-FREE: any partitioning yields the
    // bit-identical sum (the reproducible-centroid-build property)
    val alt = emb.repartition(3).groupBy("grp")
      .agg(VectorAgg.vectorSum(col("embedding")).as("vsum"))
      .select(col("grp"), posexplode(col("vsum")).as(Seq("dim", "s3")))
    assert(viaAgg.join(alt, Seq("grp", "dim"))
      .filter(col("s") =!= col("s3")).count() == 0,
      "vector_sum must be bit-identical under any partitioning")
  }

  test("pre-quantized long input is bit-identical to the float path") {
    // the hoisted grid (QuantizeUnits projected once) must match the
    // in-update quantization exactly — k-means replay oracles assume
    // ONE grid. Exercise negatives, halfway points, and merges.
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .withColumn("grp", col("vec_id") % 7)
      .repartition(8)
    val viaFloat = emb.groupBy("grp")
      .agg(VectorAgg.vectorSum(col("embedding")).as("vs"))
    val viaLong = emb
      .withColumn("q", graft.functions.VectorExprs.quantizeUnits(col("embedding")))
      .groupBy("grp")
      .agg(VectorAgg.vectorSum(col("q")).as("vl"))
    val j = viaFloat.join(viaLong, "grp")
      .select(col("grp"), posexplode(arrays_zip(col("vs"), col("vl"))).as(Seq("dim", "z")))
    assert(j.count() > 0)
    assert(j.filter(col("z.vs") =!= col("z.vl")).count() == 0,
      "hoisted quantization must be bit-identical to the update-path grid")
    // and the double grid agrees with the float grid after the same
    // float→double widening (the double path is what DuckDB replays)
    import spark.implicits._
    val vals = Seq(Seq(0.0000005f, -0.0000005f, 1.5e-6f, -2.5e-6f, 0.123456789f))
    val viaF = vals.map((0, _)).toDF("g", "v")
      .groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s")).head.getSeq[Double](1)
    val viaQ = vals.map((0, _)).toDF("g", "v")
      .withColumn("q", graft.functions.VectorExprs.quantizeUnits(col("v")))
      .groupBy("g").agg(VectorAgg.vectorSum(col("q")).as("s")).head.getSeq[Double](1)
    assert(viaF == viaQ)
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

  test("vector_sum empty-vector semantics are order-independent") {
    import spark.implicits._
    // a group of only empty vectors is a REAL zero-dimension sum, not null
    val onlyEmpty = Seq((0, Seq.empty[Float]), (0, Seq.empty[Float])).toDF("g", "v")
      .coalesce(1)
      .groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s")).collect()
    assert(!onlyEmpty(0).isNullAt(1) && onlyEmpty(0).getSeq[Double](1).isEmpty)
    // empty mixed with d-dimensional throws in EITHER arrival order
    // (pre-fix, empty-first was silently ignored)
    def run(rows: Seq[Seq[Float]]): Unit =
      rows.map((0, _)).toDF("g", "v").coalesce(1)
        .groupBy("g").agg(VectorAgg.vectorSum(col("v")).as("s")).collect()
    intercept[Exception](run(Seq(Seq.empty, Seq(1.0f, 2.0f))))
    intercept[Exception](run(Seq(Seq(1.0f, 2.0f), Seq.empty)))
  }
}
