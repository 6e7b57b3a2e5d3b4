package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round 20: the scaladoc-drift gate (a "rows-only" claim outside the
  * two genuinely non-replayable entries is a test failure, not a
  * judge finding), the d72 candAssign recall knob's exactness bounds,
  * and the streaming mutual-kNN corollary.
  */
class Round20Spec extends SparkSpec {

  import spark.implicits._

  // ---- scaladoc drift gate ----------------------------------------------

  test("no 'rows-only' claim in src/main outside the d13/d21 contexts") {
    // Only d13 (Spark-internal HLL++/GK sketches) and d21 (media byte
    // features) are rows-only by declared design; every other entry is
    // oracle-exact, and three rounds in a row a stale comment claimed
    // otherwise. Gate: each match must sit in Sketches.scala (d13's
    // home) or within 4 lines of a d13/d21 registration.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
    assert(files.nonEmpty, "spec must run from the repo root")
    val offending = files.flatMap { p =>
      val lines = java.nio.file.Files.readAllLines(p).asScala.toVector
      lines.zipWithIndex.collect {
        case (l, i) if l.contains("rows-only") &&
            !p.getFileName.toString.equals("Sketches.scala") &&
            !lines.slice(math.max(0, i - 4), math.min(lines.size, i + 5))
              .exists(n => n.contains("d21_media") || n.contains("d13_sketch")) =>
          s"$p:${i + 1}: ${l.trim}"
      }
    }
    assert(offending.isEmpty,
      "stale rows-only claims (these entries are oracle-exact):\n" +
        offending.mkString("\n"))
  }

  // ---- d72 candAssign exactness bounds ----------------------------------

  test("d72 candAssign: full candidate coverage (ca = k) is exact kNN, " +
      "and candAssign=2 output ⊇-scores candAssign=1 per anchor") {
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.01f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val vecs = (0 until 14).map(i =>
      (i.toLong, v(i % 5 -> 1.0f, 7 -> 0.15f * (i / 5))))
    val df = vecs.toDF("vec_id", "embedding")
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (j <- a.indices) { d += a(j).toDouble * b(j); na += a(j).toDouble * a(j); nb += b(j).toDouble * b(j) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // candidates in ALL k buckets → blocking prunes nothing → exact
    val got = Similarity.knnGraphOf(df, kNeighbors = 3, k = Some(3),
        iters = 2, multiAssign = 1, candAssign = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = vecs.flatMap { case (aid, av) =>
      vecs.filter(_._1 != aid)
        .map { case (cid, cv) => (cid, cosine(cv, av)) }
        .sortBy(c => (-c._2, c._1)).take(3).zipWithIndex
        .map { case ((cid, _), i) => (aid, cid, i + 1) }
    }.toSet
    assert(got == want, s"got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")

    // monotonicity: every (anchor, rank) score under candAssign=2 is
    // >= the candAssign=1 score (a superset of candidates can only
    // improve a per-anchor top-k)
    def scores(ca: Int): Map[(Long, Int), Double] =
      Similarity.knnGraphOf(df, kNeighbors = 3, k = Some(3), iters = 2,
          multiAssign = 1, candAssign = ca)
        .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getDouble(2)).toMap
    val s1 = scores(1); val s2 = scores(2)
    s1.foreach { case (key, c1) =>
      val c2 = s2.getOrElse(key,
        fail(s"candAssign=2 lost a filled slot $key"))
      assert(c2 >= c1 - 1e-12, s"$key: ca=2 score $c2 < ca=1 score $c1")
    }
  }

  // ---- streaming mutual-kNN + compaction cadence ------------------------

  test("streaming d73: mutualKnnFromLog over the live log == batch " +
      "mutualKnnOf, with in-stream compaction every 2 batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cents = Similarity.kmeans(emb, 8, 2).localCheckpoint(true)
    val minCos = 0.05 // near-random synthetic vectors rarely clear 0.30
    val twin = Similarity
      .mutualKnnOf(Similarity.knnGraphAgainst(emb, cents), minCos)
      .collect().map(_.toSeq).toSeq

    val dir = java.nio.file.Files.createTempDirectory("graft_mknn_s").toString
    val rows = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EventStream.knnMaintainStream(
      in.toDF().toDF("vec_id", "embedding"), cents,
      dir + "/idx", dir + "/subs", dir + "/log", dir + "/ck",
      compactEvery = 2)
    val batches = Seq(
      rows.filter(_._1 % 3 == 2).toSeq,
      rows.filter(_._1 % 3 == 0).toSeq,
      rows.filter(_._1 % 3 == 1).toSeq,
      rows.filter(_._1 % 3 == 1).toSeq) // batch 4 = a replayed slice
    batches.foreach { bt => in.addData(bt); q.processAllAvailable() }
    q.stop()

    val got = Similarity
      .mutualKnnFromLog(spark.read.parquet(dir + "/log"), 5, minCos)
      .collect().map(_.toSeq).toSeq
    assert(got == twin, "streaming mutual-kNN != batch twin")

    // cadence check: batch 4 ((3+1) % 2 == 0) compacted AFTER its
    // append, so the log holds exactly the view's top-k rows
    val logRows = spark.read.parquet(dir + "/log").count()
    val viewRows = Similarity.knnFromLog(spark.read.parquet(dir + "/log"))
      .count()
    assert(logRows == viewRows,
      s"in-stream compaction left $logRows log rows for a $viewRows-row view")
  }

  test("knnMaintainStream: an all-null-embedding batch against an " +
      "existing store is absorbed, not an NPE") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cents = Similarity.kmeans(emb, 8, 2).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_mknn_n").toString
    val rows = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EventStream.knnMaintainStream(
      in.toDF().toDF("vec_id", "embedding"), cents,
      dir + "/idx", dir + "/subs", dir + "/log", dir + "/ck")
    in.addData(rows.toSeq)
    q.processAllAvailable()
    val before = Similarity.knnFromLog(spark.read.parquet(dir + "/log"))
      .collect().map(_.toSeq).toSeq
    // all probes drop in the nearestBuckets explode → empty probe frame
    // against the now-existing subscription store (the r19 NPE path)
    in.addData(Seq((999999L, null.asInstanceOf[Array[Float]])))
    q.processAllAvailable()
    q.stop()
    assert(q.exception.isEmpty, s"stream died: ${q.exception}")
    val after = Similarity.knnFromLog(spark.read.parquet(dir + "/log"))
      .collect().map(_.toSeq).toSeq
    assert(after == before, "a null-embedding batch changed the view")
  }

  test("d76: retrieval_metrics TVF parity, metric bounds, determinism") {
    Graft.install(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.createOrReplaceTempView("g_docs20")
    val direct = graft.operators.Retrieval.retrievalMetricsOf(docs)
      .collect()
    val viaTvf = spark.sql("SELECT * FROM retrieval_metrics('g_docs20')")
      .collect()
    assert(viaTvf.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
    assert(direct.nonEmpty && direct.length % 2 == 0,
      "one row per (query, system)")
    direct.foreach { r =>
      val (rr, dcg, idcg, ndcg) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(rr >= 0.0 && rr <= 1.0, r.toString)
      assert(dcg >= 0.0 && idcg >= 0.0 && dcg <= idcg + 1e-9, r.toString)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, r.toString)
    }
    val again = graft.operators.Retrieval.retrievalMetricsOf(docs).collect()
    assert(again.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  test("d76: planted term-coverage corpus — BM25 finds a relevant doc " +
      "first (rr 1.0) and near-ideal order (ndcg > 0.9)") {
    // 3-doc corpus, one query's terms planted so relevance is 2/1/0
    val docs = Seq(
      (1L, "hash join merge filler filler"),
      (2L, "hash filler filler filler filler"),
      (3L, "filler filler filler filler filler"),
      (4L, "hash join hash join hash"))
      .toDF("doc_id", "text")
    val m = graft.operators.Retrieval
      .retrievalMetricsOf(docs, queries = Seq(1 -> Seq("hash", "join")),
        topK = 3)
      .collect().map(r => r.getString(1) ->
        (r.getDouble(2), r.getDouble(5))).toMap
    // BM25's top hits are the term-bearing docs → first hit relevant
    val (rrB, ndcgB) = m("bm25")
    assert(rrB == 1.0 && ndcgB > 0.9, m.toString)
  }

  test("compactAppendOnly: single file per partition after, rows exact, " +
      "every crash point of append-then-delete is a duplicates-only superset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cao").toString
    val path = dir + "/store"
    // 6 appends × 4 partitions, including byte-identical replay rows
    val base = (0 until 200).map(i => (i.toLong, i % 4, s"v$i"))
    base.grouped(40).foreach { g =>
      g.toDF("id", "pb", "payload").repartition(col("pb"))
        .write.mode("append").partitionBy("pb").parquet(path)
    }
    base.take(40).toDF("id", "pb", "payload").repartition(col("pb"))
      .write.mode("append").partitionBy("pb").parquet(path) // replayed batch
    def rows() = spark.read.parquet(path)
      .select("id", "pb", "payload").distinct()
      .collect().map(_.toSeq).toSet
    def fileCount() = new java.io.File(path).listFiles()
      .filter(_.isDirectory)
      .map(_.listFiles().count(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))).sum
    val before = rows()
    val nFiles = fileCount()
    assert(nFiles > 8, s"fixture should be fragmented, got $nFiles files")
    val (was, now) = graft.sources.Sinks.compactAppendOnly(spark, path, "pb")
    assert(was == nFiles && now == 4, s"($was, $now)")
    assert(rows() == before, "compaction changed the store's row set")
    assert(spark.read.parquet(path).count() == 200L,
      "replayed duplicates must collapse in the consolidated store")

    // crash point: consolidated appended but only HALF the snapshot
    // deleted — the distinct row set must be unchanged
    (0 until 200).map(i => (i.toLong, i % 4, s"v$i")).grouped(40)
      .foreach { g =>
        g.toDF("id", "pb", "payload").repartition(col("pb"))
          .write.mode("append").partitionBy("pb").parquet(path)
      }
    val pre = rows()
    val snapshot = new java.io.File(path).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles().filter(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")))
    val consolidated = spark.read.option("basePath", path)
      .parquet(snapshot.map(_.toString): _*)
      .dropDuplicates().repartition(col("pb")).localCheckpoint(true)
    consolidated.write.mode("append").partitionBy("pb").parquet(path)
    snapshot.sortBy(_.getName).take(snapshot.length / 2).foreach(_.delete())
    assert(rows() == pre, "crash-point store diverged")
    // a completed re-run converges to the exact single-copy store
    graft.sources.Sinks.compactAppendOnly(spark, path, "pb", minFiles = 1): Unit
    assert(rows() == pre && spark.read.parquet(path).count() == 200L)
  }

  test("compactKnnLog: refuses a partitioned (non-flat) log directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_part").toString
    Seq((1L, 2L, 0.5)).toDF("q_id", "vec_id", "cos")
      .withColumn("pb", lit(0))
      .write.partitionBy("pb").parquet(dir + "/log")
    val e = intercept[IllegalArgumentException] {
      Similarity.compactKnnLog(spark, dir + "/log")
    }
    assert(e.getMessage.contains("FLAT"), e.getMessage)
  }

  test("tripletMineStream: legacy un-partitioned manifest (no abucket " +
      "column) degrades to a plain guard scan on huge ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_leg").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val idxPath = dir + "/idx"
    val outPath = dir + "/trips"
    val cents = Similarity.buildIvfIndex(
      emb.filter(col("vec_id") >= 100), k = 8, iters = 2, idxPath)
    // a LEGACY manifest: flat files, no abucket partition dirs — one
    // already-processed huge-id anchor
    val huge = (1L << 53) + 7
    Seq((huge, Some(1L), Some(0.9), Some(2L), Some(0.1)))
      .toDF("anchor_id", "pos_id", "cos_pos", "neg_id", "cos_neg")
      .write.parquet(outPath)
    val vec = emb.filter(col("vec_id") === 0).as[(Long, Array[Float])]
      .head()._2
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EventStream.tripletMineStream(
      in.toDF().toDF("vec_id", "embedding"), cents, idxPath, outPath,
      dir + "/ck")
    // replay of the huge-id anchor + one novel huge-id anchor: the
    // guard must read the legacy store without an abucket filter,
    // drop the seen anchor, and process only the novel one
    in.addData(Seq((huge, vec), (huge + 1, vec)))
    q.processAllAvailable()
    q.stop()
    assert(q.exception.isEmpty, s"stream died: ${q.exception}")
    val manifest = spark.read.parquet(outPath)
    assert(manifest.filter(col("anchor_id") === huge).count() == 1,
      "replayed anchor must not re-manifest")
    assert(manifest.filter(col("anchor_id") === huge + 1).count() == 1,
      "novel anchor must manifest exactly once")
  }
}
