package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Relational, Retrieval}

/** Round 12, fourth pass: the range-aggregation join (q56), hashed doc
  * embeddings (d59), and hybrid RRF retrieval (d60). */
class Round12dSpec extends SparkSpec {

  // ---- q56 ----------------------------------------------------------

  private def naiveRangeAgg(camp: org.apache.spark.sql.DataFrame,
      facts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    facts.join(camp,
        facts("l_shipdate") >= camp("c_start") && facts("l_shipdate") < camp("c_end"))
      .groupBy("campaign_id", "c_start")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        Relational.dsum(col("l_extendedprice")).as("sum_rev"))
      .orderBy("campaign_id")

  test("q56 range join: no nested loop / cartesian, hash join on the day bucket; rows == naive range-predicate join") {
    val df = Relational.rangeJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop strategy:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), s"no hash join in the plan:\n$plan")
    val camp = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > lit(495000))
      .select(col("o_orderkey").as("campaign_id"),
        col("o_orderdate").as("c_start"),
        (col("o_orderdate") + expr("interval 15 days")).as("c_end"))
    val got = df.collect().map(_.toSeq).toSeq
    val exp = naiveRangeAgg(camp, Tables.lineitem(spark, sf)
      .select("l_quantity", "l_extendedprice", "l_shipdate"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == exp,
      "aggregate-pushdown range join diverged from the naive join")
  }

  test("q56 core: sub-day interval endpoints engage the partial-bucket path; rows == naive join") {
    import spark.implicits._
    // endpoints cut buckets mid-day; campaign 2 lives inside ONE day
    val camp = Seq(
      (1L, "2024-03-01 10:30:00", "2024-03-04 06:00:00"),
      (2L, "2024-03-02 00:00:00", "2024-03-02 18:00:00"),
      (3L, "2024-03-03 23:00:00", "2024-03-05 01:30:00"))
      .toDF("campaign_id", "s", "e")
      .select(col("campaign_id"), col("s").cast("timestamp").as("c_start"),
        col("e").cast("timestamp").as("c_end"))
    // hourly facts across six days (at :15 so no boundary coincidences)
    val facts = (0 until 24 * 6).map { h =>
      (1.0 + (h % 5), 10.5 + h, f"2024-03-0${1 + h / 24}%d ${h % 24}%02d:15:00")
    }.toDF("l_quantity", "l_extendedprice", "s")
      .select(col("l_quantity"), col("l_extendedprice"),
        col("s").cast("timestamp").as("l_shipdate"))
    val got = Relational.rangeAggJoinOf(camp, facts)
      .collect().map(_.toSeq).toSeq
    val exp = naiveRangeAgg(camp, facts).collect().map(_.toSeq).toSeq
    assert(exp.length == 3, s"fixture rot: expected all 3 campaigns to match, got $exp")
    assert(got == exp, s"partial-bucket path diverged:\n got=$got\n exp=$exp")
  }

  // ---- d59 ----------------------------------------------------------

  test("d59 hashed embed: matches an independent pure-JVM reference (md5 → bucket/sign → L2)") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "Alpha beta GAMMA alpha  zzz"),
      (2L, "one two three two one one"),
      (3L, "solo"))
    val got = Retrieval.hashedEmbedOf(fixture.toDF("doc_id", "text"))
      .orderBy("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

    val dims = Retrieval.EmbedDims
    def h32(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val exp = fixture.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val raw = ws.groupBy(w => (h32(w) % dims).toInt)
        .map { case (b, grp) =>
          b -> grp.map(w => if ((h32(w) & dims) == 0L) 1L else -1L).sum
        }
        .filter(_._2 != 0L)
      val nrm = math.sqrt(raw.values.map(v => (v * v).toDouble).sum)
      raw.toSeq.sortBy(_._1).map { case (b, v) =>
        // Spark's round(double, 9) goes through BigDecimal.valueOf
        val wn = java.math.BigDecimal.valueOf(v / nrm)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        (id, b, v, wn)
      }
    }
    assert(got == exp, s"hashed embedding diverged from the JVM reference:\n got=$got\n exp=$exp")
  }

  test("d59: every doc embedding is unit-norm (within the 9dp round)") {
    val emb = Retrieval.hashedEmbed(spark, sf)
    val norms = emb.groupBy("doc_id")
      .agg(sum(col("w_norm") * col("w_norm")).as("n2"))
      .collect().map(_.getDouble(1))
    assert(norms.nonEmpty && norms.forall(n => math.abs(n - 1.0) < 1e-6),
      s"non-unit norms: ${norms.filter(n => math.abs(n - 1.0) >= 1e-6).take(5).mkString(",")}")
  }

  // ---- d60 ----------------------------------------------------------

  test("d60 hybrid rrf: equals a window-rank recomputation of BM25 ⊕ cosine fusion") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = Retrieval.hybridRrfOf(docs).collect().map(_.toSeq).toSeq

    // independent recompute: window ranks instead of TopKByScore
    val k = Retrieval.TopK
    val lex = Retrieval.bm25SearchOf(docs)
      .select(col("query_id"), col("doc_id"), col("rnk").as("lex_rnk"))
    val qdocs = Retrieval.BmQueries
      .map { case (qid, ws) => (qid.toLong, ws.mkString(" ")) }
    import spark.implicits._
    val qemb = Retrieval.hashedEmbedOf(qdocs.toDF("doc_id", "text"))
      .select(col("doc_id").cast("int").as("query_id"),
        col("bucket"), col("w_norm").as("qw"))
    val demb = Retrieval.hashedEmbedOf(docs)
      .select(col("doc_id"), col("bucket"), col("w_norm").as("dw"))
    val cos = demb.join(qemb, "bucket")
      .withColumn("term", round(col("qw") * col("dw"), 9).cast("decimal(18,9)"))
      .groupBy("query_id", "doc_id").agg(sum(col("term")).as("cos"))
    val sem = cos.withColumn("sem_rnk",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("doc_id"))).cast("int"))
      .filter(col("sem_rnk") <= k)
      .select("query_id", "doc_id", "sem_rnk")
    val rrfK = Retrieval.RrfK
    val fused = lex.filter(col("lex_rnk") <= k)
      .join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        when(col("lex_rnk").isNotNull,
          round(lit(1.0) / (lit(rrfK) + col("lex_rnk")), 9)).otherwise(lit(0.0)) +
        when(col("sem_rnk").isNotNull,
          round(lit(1.0) / (lit(rrfK) + col("sem_rnk")), 9)).otherwise(lit(0.0)))
    val exp = fused.withColumn("rnk",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "doc_id", "rrf")
      .orderBy("query_id", "rnk")
      .collect().map(_.toSeq).toSeq
    assert(got == exp, "hybrid fusion diverged from the window-rank twin")

    // the fusion is genuinely hybrid on this corpus: some output docs
    // were retrieved by both rankers, some by exactly one
    val lexSet = lex.filter(col("lex_rnk") <= k)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val semSet = sem.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val outPairs = got.map(r => (r(0).asInstanceOf[Int], r(2).asInstanceOf[Long]))
    assert(outPairs.exists(p => lexSet(p) && semSet(p)),
      "fixture rot: no doc retrieved by both rankers")
    assert(outPairs.exists(p => lexSet(p) ^ semSet(p)),
      "fixture rot: no doc retrieved by exactly one ranker")
  }

  test("d59 dense bridge: self-embedded vectors feed the ANN ladder; planted near-dup retrieves its source top-1") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).select("doc_id", "text")
    val srcRow = base.orderBy("doc_id").limit(1).collect()(0)
    val (srcId, srcText) = (srcRow.getLong(0), srcRow.getString(1))
    // near-duplicate: same text with one word appended, fresh id
    val plantedId = 999999L
    val planted = Seq((plantedId, srcText + " extraword")).toDF("doc_id", "text")
    val dense = Retrieval.denseEmbedOf(base.unionByName(planted))
    // unit norm survives the float cast
    val selfDot = dense.select(
      graft.operators.Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .agg(min("d").as("lo"), max("d").as("hi")).collect()(0)
    assert(math.abs(selfDot.getDouble(0) - 1.0) < 1e-3 &&
      math.abs(selfDot.getDouble(1) - 1.0) < 1e-3,
      s"dense self-dot left the unit sphere: $selfDot")
    // the planted vector's nearest neighbor is its source doc
    val q = dense.filter(col("vec_id") === plantedId)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = graft.operators.Similarity
      .embedTopKAggOf(dense, q, topK = 3)
      .collect()
    assert(top.nonEmpty && top.head.getLong(1) == srcId,
      s"expected source doc $srcId as top-1 neighbor, got ${top.toSeq}")
    assert(top.head.getDouble(2) > 0.9,
      s"near-dup cosine unexpectedly low: ${top.head.getDouble(2)}")
  }

  // ---- d61 ----------------------------------------------------------

  test("d61 topic clusters: sizes conserve the corpus, exemplars are true per-cluster argmins, assignment is optimal, rerun-deterministic") {
    import graft.operators.Similarity
    val emb = graft.operators.Retrieval.denseEmbedOf(
      Tables.documents(spark, sf).select("doc_id", "text"))
      .localCheckpoint(true)
    val k = 8
    val out = Similarity.topicClustersOf(emb, k = k, iters = 3).collect()
    val n = emb.count()
    assert(out.map(_.getLong(1)).sum == n, "cluster sizes do not conserve the corpus")
    assert(out.length <= k && out.nonEmpty)

    // recompute the assignment independently (crossJoin argmin) and
    // check (a) every vector's cluster is its true nearest centroid,
    // (b) each exemplar is that cluster's (d2, vec_id)-argmin
    val cents = Similarity.kmeans(emb, k, 3)
    val dist = emb.crossJoin(cents.withColumnRenamed("c_id", "cand"))
      .select(col("vec_id"), col("cand"),
        Similarity.dot(col("embedding"), col("embedding")) +
          Similarity.dot(col("c_vec"), col("c_vec")) -
          lit(2.0) * Similarity.dot(col("embedding"), col("c_vec")) as "d2")
    val best = dist.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("d2"), col("cand"))))
      .filter(col("rk") === 1).select("vec_id", "cand", "d2")
    val sizes = best.groupBy("cand").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val gotSizes = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotSizes == sizes, s"cluster assignment diverged: $gotSizes vs $sizes")
    val ex = best.withColumn("rk2",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("cand").orderBy(col("d2"), col("vec_id"))))
      .filter(col("rk2") === 1).collect()
      .map(r => r.getInt(1) -> r.getLong(0)).toMap
    val gotEx = out.map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(gotEx == ex, s"exemplars diverged: $gotEx vs $ex")

    // same-session determinism
    val again = Similarity.topicClustersOf(emb, k = k, iters = 3).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "topic clustering is not rerun-deterministic")
  }

  // ---- d62 containment ----------------------------------------------

  test("d62 containment: prefix-filter miner equals the brute-force blocked all-pairs") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val got = Dedup.containmentOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // brute force: full blocked ordered-pair join, no candidate pruning
    val toks = docs.select(col("doc_id"), col("lang"), col("source"),
        array_distinct(array_remove(split(lower(col("text")), " "), "")).as("ws"))
      .withColumn("sz", size(col("ws")).cast("long"))
    val a = toks.select(col("lang"), col("source"), col("doc_id").as("id_a"),
      col("sz").as("sz_a"), col("ws").as("ws_a"))
    val b = toks.select(col("lang"), col("source"), col("doc_id").as("id_b"),
      col("ws").as("ws_b"))
    val want = a.join(b, Seq("lang", "source"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("n_inter",
        graft.functions.VectorExprs.intersectCount(col("ws_a"), col("ws_b")))
      .filter(col("n_inter") * 10 >= col("sz_a") * 9)
      .withColumn("containment", col("n_inter").cast("double") / col("sz_a"))
      .select("id_a", "id_b", "n_inter", "containment")
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq,
      s"prefix-filtered pairs diverge from brute force: got ${got.length}, want ${want.length}")
    assert(got.nonEmpty, "no containment pairs at all — fixture too weak to prove anything")
  }

  test("d62 containment: a planted quote is found in its host (directed), jaccard misses it") {
    import spark.implicits._
    val host = (1 to 200).map(i => s"tok$i").mkString(" ")
    val quote = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, "en", "s", host),
      (2L, "en", "s", quote),
      (3L, "en", "s", (300 to 520).map(i => s"tok$i").mkString(" "))
    ).toDF("doc_id", "lang", "source", "text")
    val pairs = graft.operators.Dedup.containmentOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(pairs == Seq((2L, 1L, 1.0)),
      s"expected exactly quote→host at containment 1.0, got $pairs")
    // the symmetric jaccard of the same pair is 20/200 = 0.1 — invisible to d4
    val jac = graft.operators.Dedup.ngramJaccardOf(docs).count()
    assert(jac == 0, "jaccard miner unexpectedly caught the quote pair")
  }

  test("d62 containment: candidate plan is pure equi-join (no cartesian/BNLJ)") {
    val plan = graft.operators.Dedup.containment(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "containment plan fell back to a non-equi join strategy")
  }

  // ---- streaming self-embedding index --------------------------------

  test("textEmbedIndexStream: raw-text stream lands in the IVF store identically to the batch embed+append; replay adds nothing") {
    import graft.operators.{Retrieval, Similarity}
    import graft.streaming.EventStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 3 === 0)
    val arriving = docs.filter(col("doc_id") % 3 =!= 0)
    val path = java.nio.file.Files.createTempDirectory("graft_txtivf").toString + "/idx"
    val cents = Similarity.buildIvfIndex(Retrieval.denseEmbedOf(base), k = 8, iters = 2, path)

    val rows = arriving.select("doc_id", "text").as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    var lastDrift: Option[Similarity.IvfDrift] = None
    val q = EventStream.textEmbedIndexStream(
      input.toDF().toDF("doc_id", "text"), cents, path,
      java.nio.file.Files.createTempDirectory("graft_txtivf_ck").toString,
      onDrift = d => lastDrift = Some(d))
    input.addData(rows.take(rows.length / 2))
    q.processAllAvailable()
    input.addData(rows.drop(rows.length / 2))
    q.processAllAvailable()
    val afterStream = spark.read.parquet(path).count()
    // restart-replay: the same rows again must land ZERO new vectors
    input.addData(rows.take(10))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(path).count() == afterStream,
      "replayed batch duplicated vectors in the self-embedding store")
    assert(lastDrift.exists(_.n == 10), s"drift gauge missing/stale: $lastDrift")

    // the streamed store equals the batch-side embed + append
    val batchPath = java.nio.file.Files.createTempDirectory("graft_txtivf_b").toString + "/idx"
    Similarity.buildIvfIndex(Retrieval.denseEmbedOf(base), k = 8, iters = 2, batchPath)
    Similarity.appendToIvfIndex(Retrieval.denseEmbedOf(arriving), cents, batchPath)
    def contents(p: String) = spark.read.parquet(p)
      .select("vec_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(contents(path) == contents(batchPath) && contents(path).size == docs.count(),
      "streamed self-embedding store diverged from the batch path")
  }
}
