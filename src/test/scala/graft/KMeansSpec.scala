package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class KMeansSpec extends SparkSpec {

  test("lloyd iterations do not increase total inertia") {
    val emb = Tables.embeddings(spark, sf)
    def inertia(iters: Int): Double = {
      val cents = Similarity.kmeans(emb, 8, iters)
      Similarity.assign(emb, cents).agg(sum("d2")).collect()(0).getDouble(0)
    }
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1 + 1e-6, s"inertia rose: $i1 -> $i3")
  }

  test("assignment covers every vector exactly once") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.kmeans(emb, 8, 2)
    val a = Similarity.assign(emb, cents)
    assert(a.count() == emb.count())
    assert(a.select("vec_id").distinct().count() == emb.count())
    assert(a.select("bucket").distinct().count() <= 8)
  }

  test("kmeans is deterministic (fixed init, fixed data)") {
    val emb = Tables.embeddings(spark, sf)
    val c1 = Similarity.kmeans(emb, 4, 2).collect().map(_.toString).sorted
    val c2 = Similarity.kmeans(emb, 4, 2).collect().map(_.toString).sorted
    assert(c1.sameElements(c2))
  }
}
