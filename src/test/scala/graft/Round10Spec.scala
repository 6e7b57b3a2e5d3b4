package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CentroidSet, VectorExprs}
import graft.operators.Similarity

/** Round 10: the NearestBuckets expression — the in-projection
  * replacement for the crossJoin(broadcast(cents)) + rank-window
  * centroid assignment. The contract is BIT-identity: same FP
  * sequence, same (score, c_id asc) ordering, so every k-means
  * trajectory / recall / drift number downstream is unchanged.
  */
class Round10Spec extends SparkSpec {

  private lazy val emb =
    Tables.embeddings(spark, sf).select("vec_id", "embedding")

  private def centArr(k: Int): Array[(Int, Array[Float])] =
    emb.orderBy(hash(col("vec_id")), col("vec_id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

  /** The formulation NearestBuckets replaced, verbatim. */
  private def windowAssign(cents: Array[(Int, Array[Float])], p: Int,
      cosine: Boolean): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val cdf = cents.toSeq.toDF("c_id", "c_vec")
    val score =
      if (cosine) Similarity.cosine(col("embedding"), col("c_vec"))
      else Similarity.dot(col("embedding"), col("embedding")) -
        lit(2.0) * Similarity.dot(col("embedding"), col("c_vec")) +
        Similarity.dot(col("c_vec"), col("c_vec"))
    val ord = if (cosine) col("score").desc else col("score").asc
    emb.crossJoin(broadcast(cdf))
      .withColumn("score", score)
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(ord, col("c_id").asc)))
      .filter(col("rk") <= p)
      .select(col("vec_id"), col("c_id").as("bucket"), col("score"), col("rk"))
  }

  private def exprAssign(cents: Array[(Int, Array[Float])], p: Int,
      cosine: Boolean): DataFrame =
    emb.select(col("vec_id"),
        posexplode(VectorExprs.nearestBuckets(col("embedding"),
          CentroidSet(cents), p, cosine)).as(Seq("pos", "nb")))
      .select(col("vec_id"), col("nb.bucket").as("bucket"),
        col("nb.score").as("score"), (col("pos") + 1).cast("int").as("rk"))

  private def rows(df: DataFrame): Set[(Long, Int, Double, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3))).toSet

  test("L2 top-3 assignment is bit-identical to the window formulation") {
    val cents = centArr(7)
    assert(rows(exprAssign(cents, 3, cosine = false)) ==
      rows(windowAssign(cents, 3, cosine = false)))
  }

  test("cosine top-2 assignment is bit-identical to the window formulation") {
    val cents = centArr(5)
    assert(rows(exprAssign(cents, 2, cosine = true)) ==
      rows(windowAssign(cents, 2, cosine = true)))
  }

  test("p = 1 argmin matches, and p > k returns exactly k entries") {
    val cents = centArr(4)
    assert(rows(exprAssign(cents, 1, cosine = false)) ==
      rows(windowAssign(cents, 1, cosine = false)))
    val wide = exprAssign(cents, 9, cosine = false)
    assert(rows(wide) == rows(windowAssign(cents, 9, cosine = false)))
    assert(wide.groupBy("vec_id").count().select(max("count")).head.getLong(0) == 4L)
  }

  test("duplicate centroids tie-break to the lowest id, like the window ordering") {
    val v = emb.limit(1).collect()(0).getSeq[Float](1).toArray
    // ids deliberately unsorted on input; 9 and 2 are the SAME vector
    val cents = Array(9 -> v, 5 -> v.map(x => x + 1.0f), 2 -> v)
    val got = exprAssign(cents, 2, cosine = false)
      .filter(col("rk") === 1).select("bucket").distinct().collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(2))
    assert(rows(exprAssign(cents, 3, cosine = false)) ==
      rows(windowAssign(cents, 3, cosine = false)))
  }

  test("null embedding row yields a null result, not a crash") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Some(Seq(1.0f, 0.0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val cents = Array(0 -> Array(1.0f, 0.0f), 1 -> Array(0.0f, 1.0f))
    val out = df.select(col("vec_id"),
      VectorExprs.nearestBuckets(col("embedding"), CentroidSet(cents), 1,
        cosine = false).as("nb")).collect()
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
    assert(!out.find(_.getLong(0) == 1L).get.isNullAt(1))
  }

  test("mixed-dim centroid table fails fast at construction") {
    val e = intercept[IllegalArgumentException] {
      CentroidSet(Array(0 -> Array(1.0f, 2.0f), 1 -> Array(1.0f)))
    }
    assert(e.getMessage.contains("dim"))
  }
}
