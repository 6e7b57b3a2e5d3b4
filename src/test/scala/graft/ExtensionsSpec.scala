package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("RewriteIntersectCount rewrites size(array_intersect) on string arrays") {
    Graft.install(spark)
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
    val a = df.select(col("doc_id").as("id_a"), col("ws").as("wa"))
    val b = df.select(col("doc_id").as("id_b"), col("ws").as("wb"))
    val q = a.crossJoin(b.limit(5))
      .select(size(array_intersect(col("wa"), col("wb"))).as("n"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("intersectcount"),
      s"rewrite did not fire:\n$optimized")
    // numerically identical to the builtin
    val builtin = a.crossJoin(b.limit(5))
      .select(size(array_intersect(col("wa"), col("wb"))).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val rewritten = q.agg(sum("n")).collect()(0).getLong(0)
    assert(builtin == rewritten)
  }

  test("SQL functions registered: dot_f, simhash64, minhash_sig usable from SQL") {
    Graft.install(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext")
    val r = spark.sql(
      """SELECT vec_id, dot_f(embedding, embedding) AS sq_norm FROM emb_ext LIMIT 5""")
      .collect()
    assert(r.nonEmpty && r.forall(_.getDouble(1) >= 0))
    Tables.documents(spark, sf).createOrReplaceTempView("docs_ext")
    val s = spark.sql(
      """SELECT simhash64(split(lower(text), ' ')) AS fp FROM docs_ext LIMIT 5""").collect()
    assert(s.length == 5)
    // int8 quantize + dot round trip from SQL: self-dot of a quantized
    // vector is non-negative and bounded by 127^2 * dims
    val q = spark.sql(
      """SELECT dot_i8(quantize8(embedding).q, quantize8(embedding).q) AS d
        |FROM emb_ext LIMIT 5""".stripMargin).collect()
    assert(q.nonEmpty && q.forall { r =>
      val d = r.getLong(0); d >= 0 && d <= 127L * 127L * 64L })
    // aggregate sketches from SQL: top-k heavy hitters per lang, a
    // theta sketch per lang, a top-k-by-score aggregate
    val hh = spark.sql(
      """SELECT lang, heavy_hitters(w, 8) AS hh
        |FROM (SELECT lang, explode(split(text, ' ')) AS w FROM docs_ext)
        |GROUP BY lang""".stripMargin).collect()
    assert(hh.nonEmpty && hh.forall(_.getSeq[Any](1).nonEmpty))
    val th = spark.sql(
      """SELECT lang, size(theta_sketch(text, 64)) AS n FROM docs_ext GROUP BY lang""")
      .collect()
    assert(th.nonEmpty && th.forall(r => r.getInt(1) > 0 && r.getInt(1) <= 64))
    val tk = spark.sql(
      """SELECT topk_by_score(named_struct('score', CAST(n_chars AS DOUBLE), 'id', doc_id), 3) AS t
        |FROM docs_ext""".stripMargin).collect()
    assert(tk.length == 1 && tk.head.getSeq[Any](0).size == 3)
  }

  test("GraftExtensions class is constructible and wires a builder") {
    // smoke: the extensions object applies without error on a builder
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // would throw if injection signatures drifted
  }
}
