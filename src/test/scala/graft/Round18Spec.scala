package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Similarity}

/** Round 18: d69 weighted PageRank — jaccard-weighted contributions in
  * exact integer 1e-6-unit weights plus the per-node convergence delta
  * of the final round. Reference checks beyond the DuckDB oracle:
  * planted weighted graphs whose expected unit ranks come from a
  * driver-side replay of the same integer arithmetic, the
  * uniform-weight degeneration to d65, and the weight-asymmetry signal
  * the unweighted variant cannot see.
  */
class Round18Spec extends SparkSpec {

  import spark.implicits._

  /** Driver-side reference: integer 1e-9-unit weighted power iteration
    * with 1e-6-unit edge weights; returns node -> (r, rPrev). */
  private def refWeighted(pairsW: Seq[(Long, Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val edges = pairsW.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wout = edges.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val n = wout.size.toLong
    var r = wout.keys.map(_ -> 1000000000L / n).toMap
    var prev = r
    for (_ <- 1 to iters) {
      prev = r
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => r(src) * w / wout(src) }.sum
      }
      r = in.map { case (node, sc) => node -> (150000000L / n + 85L * sc / 100L) }
    }
    r.map { case (k, v) => k -> (v, prev(k)) }
  }

  test("d69: pageRankWeightedOf matches the driver reference exactly") {
    // star with one heavy spoke + a light triangle; weights span the
    // jaccard-unit range the registered entry produces (8e5..1e6)
    val pairsW = Seq((1L, 2L, 1000000L), (1L, 3L, 800000L), (1L, 4L, 800000L),
      (10L, 11L, 900000L), (11L, 12L, 850000L), (10L, 12L, 800000L))
    val got = Dedup.pageRankWeightedOf(pairsW.toDF("id_a", "id_b", "w_units"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val want = refWeighted(pairsW, 8)
    assert(got.length == want.size)
    got.foreach { case (node, _, _, units, pr, delta) =>
      val (wr, wprev) = want(node)
      assert(units == wr, s"node $node: $units != $wr")
      assert(delta == math.abs(wr - wprev), s"node $node delta")
      assert(pr == units.toDouble * 1e-9)
    }
    // the heavy spoke out-ranks the light spokes of the same hub
    val byNode = got.map(g => g._1 -> g._4).toMap
    assert(byNode(2L) > byNode(3L), byNode.toString)
    // equal-weight spokes tie exactly
    assert(byNode(3L) == byNode(4L), byNode.toString)
  }

  test("d69: uniform weights degenerate exactly to the unweighted d65") {
    // (r·w) DIV (deg·w) = r DIV deg for any constant w ≥ 1, so the two
    // variants must agree node-for-node in unit longs
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    val unweighted = Dedup.pageRankOf(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val weighted = Dedup.pageRankWeightedOf(
      pairs.map { case (a, b) => (a, b, 777L) }.toDF("id_a", "id_b", "w_units"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(weighted == unweighted)
  }

  test("d69: weight asymmetry re-ranks where the unweighted variant ties") {
    // two 2-chains: {1,2} tied strongly, {3,4} tied weakly, then both
    // pairs share a common hub 5. Unweighted sees identical structure;
    // weighted must rank the strong pair above the weak one.
    val pairsW = Seq((1L, 2L, 1000000L), (3L, 4L, 100000L),
      (1L, 5L, 500000L), (3L, 5L, 500000L))
    val w = Dedup.pageRankWeightedOf(pairsW.toDF("id_a", "id_b", "w_units"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val u = Dedup.pageRankOf(pairsW.map(p => (p._1, p._2)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(u(2L) == u(4L), "unweighted must tie the symmetric spokes")
    assert(w(2L) > w(4L), s"weighted must prefer the strong tie: $w")
  }

  test("d69: zero/negative-weight rows are dropped, not divided by") {
    val pairsW = Seq((1L, 2L, 1000000L), (3L, 4L, 0L))
    val nodes = Dedup.pageRankWeightedOf(pairsW.toDF("id_a", "id_b", "w_units"))
      .collect().map(_.getLong(0)).toSet
    assert(nodes == Set(1L, 2L))
  }

  test("d69: registered entry runs on testdata with sane shape") {
    val rows = Dedup.pageRankWeighted(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(3) > 0L)          // r_units positive
      assert(r.getLong(2) >= r.getLong(1) * 800000L) // W_u ≥ deg·0.8e6 (j ≥ 0.8)
      assert(r.getLong(5) >= 0L)         // delta non-negative
    }
  }

  // ---- streaming Bloom-gated intake (d68's gate in the curated sink) --

  private def streamCorpusIds(root: String): Set[Long] =
    graft.operators.IncrementalDedup.corpus(spark, root).collect()
      .map(_.getLong(0)).toSet

  test("curatedInsertStream bloomGate: superset-of-exact drops, batch parity, replay-stable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bloom_ckpt").toString

    def doc(i: Int, words: Seq[String]) = (i.toLong, words.mkString(" "), "en", "src0")
    val benchWords = (1 to 20).map(i => s"ev$i")
    val bench = Seq((100L, benchWords.mkString(" "))).toDF("doc_id", "text")
    val cleanA = doc(1, (1 to 30).map(i => s"aw$i"))
    val cleanB = doc(2, (1 to 30).map(i => s"bw$i"))
    val contam = doc(5, benchWords.take(12) ++ (1 to 18).map(i => s"cw$i"))
    val all = Seq(cleanA, cleanB, contam)

    val in1 = MemoryStream[(Long, String, String, String)]
    val q1 = graft.streaming.EventStream.curatedInsertStream(
      in1.toDF().toDF("doc_id", "text", "lang", "source"), root, ckpt,
      benchmark = Some(bench), minWords = 5, bloomGate = true)
    in1.addData(Seq(cleanA, contam))
    q1.processAllAvailable()
    in1.addData(Seq(cleanB))
    q1.processAllAvailable()
    q1.stop()
    val streamed = streamCorpusIds(root)
    // no false negatives: the truly contaminated doc is gone
    assert(!streamed.contains(5L), s"bloom gate missed the contaminated doc: $streamed")
    // subset of the exact gate's keep set (FPs only ever REMOVE more)
    val exactKept = graft.operators.CorpusPipeline.curateBatch(
      all.toDF("doc_id", "text", "lang", "source"),
      benchGrams = Some(graft.operators.CorpusPipeline.benchmarkGrams(bench)),
      minWords = 5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed.subsetOf(exactKept), s"$streamed not a subset of $exactKept")
    // batch parity: the streamed corpus equals the one-shot Bloom-gated batch
    val batchKept = graft.operators.CorpusPipeline.curateBatch(
      all.toDF("doc_id", "text", "lang", "source"),
      minWords = 5,
      bloomBits = Some(graft.operators.CorpusPipeline.benchmarkBloom(bench)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batchKept, s"stream $streamed != batch $batchKept")
    // on THIS fixture the filter is far under fill: no FPs, clean docs kept
    assert(streamed == Set(1L, 2L), streamed.toString)

    // replay: a fresh query re-delivers everything; the deterministic
    // gate + store-authority guard must land zero new rows
    val in2 = MemoryStream[(Long, String, String, String)]
    val q2 = graft.streaming.EventStream.curatedInsertStream(
      in2.toDF().toDF("doc_id", "text", "lang", "source"), root,
      java.nio.file.Files.createTempDirectory("graft_bloom_ckpt2").toString,
      benchmark = Some(bench), minWords = 5, bloomGate = true)
    in2.addData(all)
    q2.processAllAvailable()
    q2.stop()
    assert(streamCorpusIds(root) == streamed, "replay changed the corpus")
  }

  // ---- d70 contrastive triplets ---------------------------------------

  /** Driver-side reference of the whole construction: md5-indexed
    * candidates, validity (not self/pos/direct near-dup), min salt. */
  private def refTriplets(pairs: Seq[(Long, Long, Double)], docIds: Seq[Long],
      salts: Int = 3): Seq[(Long, Long, Long, Double)] = {
    val sorted = docIds.sorted
    val n = sorted.length.toLong
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    def md5idx(a: Long, p: Long, s: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$a#$p#$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % n).toInt
    }
    val ori = pairs.flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
    ori.flatMap { case (anchor, pos, j) =>
      (0 until salts).iterator.map { s =>
        sorted(md5idx(anchor, pos, s))
      }.find { neg =>
        neg != anchor && neg != pos &&
          !pairSet.contains((math.min(anchor, neg), math.max(anchor, neg)))
      }.map(neg => (anchor, pos, neg, j))
    }.sortBy(t => (t._1, t._2))
  }

  test("d70: contrastiveTripletsOf matches the driver reference exactly") {
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.85), (10L, 40L, 0.82))
    val docIds = (1L to 100L)
    val got = Curation.contrastiveTripletsOf(
      pairs.toDF("id_a", "id_b", "jaccard"), docIds.toDF("doc_id"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = refTriplets(pairs, docIds)
    assert(got == want, s"got $got\nwant $want")
    // both orientations of every pair survived on this roomy corpus
    assert(got.length == 6)
    got.foreach { case (a, p, neg, _) =>
      assert(neg != a && neg != p, s"invalid negative in ($a,$p,$neg)")
      assert(!pairs.exists(q => Set(q._1, q._2) == Set(a, neg)),
        s"negative $neg is a near-dup of anchor $a")
    }
  }

  test("d70: triplets with no valid negative drop deterministically") {
    // a 2-doc corpus: every candidate lands on the anchor or the
    // positive, so the whole pair produces zero triplets
    val out = Curation.contrastiveTripletsOf(
      Seq((1L, 2L, 0.9)).toDF("id_a", "id_b", "jaccard"),
      Seq(1L, 2L).toDF("doc_id"))
    assert(out.count() == 0L)
    // replay-stable on a real corpus slice
    val a = Curation.contrastiveTriplets(spark, sf).collect().toSeq
    val b = Curation.contrastiveTriplets(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("d70: contrastive_triplets TVF parity") {
    Graft.install(spark)
    val pairs = Seq((1L, 2L, 0.9), (5L, 6L, 0.88)).toDF("id_a", "id_b", "jaccard")
    val docs = (1L to 50L).toDF("doc_id")
    pairs.createOrReplaceTempView("g_trip_pairs")
    docs.createOrReplaceTempView("g_trip_docs")
    val viaTvf = spark.sql(
      "SELECT * FROM contrastive_triplets('g_trip_pairs', 'g_trip_docs')")
      .collect().map(_.toSeq).toSet
    val direct = Curation.contrastiveTripletsOf(pairs, docs)
      .collect().map(_.toSeq).toSet
    assert(viaTvf == direct)
  }

  // ---- d71 hard-negative triplets -------------------------------------

  private def cosine(x: Array[Float], y: Array[Float]): Double = {
    var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < x.length) {
      d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
      ny += y(i).toDouble * y(i); i += 1
    }
    d / (math.sqrt(nx) * math.sqrt(ny))
  }

  test("d71: single-bucket hardTriplets match a brute-force reference") {
    // axis-anchored vectors with a known cosine ladder: ids 1,2 are
    // near-twins (cos≈1), ids 3..6 fan out at decreasing cosine to 1,
    // id 7 is near-orthogonal. k=1 ⇒ one bucket ⇒ candidates = all.
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val vecs = Seq(
      1L -> v(0 -> 1.0f),
      2L -> v(0 -> 1.0f, 1 -> 0.05f),
      3L -> v(0 -> 1.0f, 1 -> 1.0f),          // cos to 1 ≈ 0.707
      4L -> v(0 -> 0.4f, 1 -> 1.0f),          // cos to 1 ≈ 0.37
      5L -> v(0 -> 0.28f, 1 -> 1.0f),         // cos to 1 ≈ 0.27 (< 0.3)
      6L -> v(0 -> 0.1f, 1 -> 1.0f),          // cos to 1 ≈ 0.10
      7L -> v(2 -> 1.0f))                     // cos to 1 = 0
    val got = Similarity.hardTripletsOf(
      vecs.toDF("vec_id", "embedding"), k = Some(1))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // brute-force reference per anchor
    vecs.foreach { case (aid, av) =>
      val cands = vecs.filter(_._1 != aid)
        .map { case (cid, cv) => (cid, cosine(cv, av)) }
      val pos = cands.filter(_._2 >= 0.30)
      val neg = cands.filter(_._2 < 0.30)
      if (pos.nonEmpty && neg.nonEmpty) {
        val bp = pos.minBy(c => (-c._2, c._1))
        val bn = neg.minBy(c => (-c._2, c._1))
        val (gp, gpc, gn, gnc) = got(aid)
        assert(gp == bp._1 && gn == bn._1,
          s"anchor $aid: got ($gp,$gn) want (${bp._1},${bn._1})")
        assert(math.abs(gpc - bp._2) < 1e-9 && math.abs(gnc - bn._2) < 1e-9)
      } else assert(!got.contains(aid), s"anchor $aid should drop")
    }
    // margins are real: pos strictly above threshold side of neg
    got.values.foreach { case (_, cp, _, cn) => assert(cp >= 0.30 && cn < 0.30) }
  }

  test("d71: all-twin corpus (no sub-threshold candidate) emits nothing") {
    val twins = (1L to 4L).map { i =>
      val a = Array.fill(64)(1.0f); a(0) = 1.0f + 0.001f * i; (i, a)
    }
    assert(Similarity.hardTripletsOf(twins.toDF("vec_id", "embedding"),
      k = Some(1)).count() == 0L)
  }

  test("d71: registered entry — deterministic, thresholds respected") {
    val a = Similarity.hardTriplets(spark, sf).collect()
    val b = Similarity.hardTriplets(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    a.foreach { r =>
      assert(r.getDouble(2) >= 0.30 && r.getDouble(4) < 0.30)
      assert(r.getLong(1) != r.getLong(3))
    }
  }

  // ---- d72 k-NN graph --------------------------------------------------

  test("d72: k=2 + multiAssign=2 probes cover everything — exact brute-force kNN") {
    // anchors probe BOTH buckets, so the bucket blocking prunes
    // nothing and the graph must equal the exact kNN
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.01f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val vecs = (0 until 12).map(i => (i.toLong, v(i % 4 -> 1.0f, 5 -> 0.1f * (i / 4))))
    val got = Similarity.knnGraphOf(vecs.toDF("vec_id", "embedding"),
      kNeighbors = 3, k = Some(2), iters = 2, multiAssign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = vecs.flatMap { case (aid, av) =>
      vecs.filter(_._1 != aid)
        .map { case (cid, cv) => (cid, cosine(cv, av)) }
        .sortBy(c => (-c._2, c._1)).take(3).zipWithIndex
        .map { case ((cid, _), i) => (aid, cid, i + 1) }
    }.toSet
    assert(got == want, s"got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
  }

  test("d72: registered entry — no self edges, ranks contiguous, deterministic") {
    val a = Similarity.knnGraph(spark, sf).collect()
    val b = Similarity.knnGraph(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    val byQ = a.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.forall(_.getLong(1) != q), s"self edge at $q")
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length).toSeq)
      assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    }
  }

  // ---- streaming hard-triplet mining ----------------------------------

  test("tripletMineStream: one-batch == batch twin, insertion-time semantics, replay-stable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_stream").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val initial = emb.filter(col("vec_id") >= 100)
    val idxPath = dir + "/idx"
    val outPath = dir + "/trips"
    val cents = Similarity.buildIvfIndex(initial, k = 8, iters = 2, idxPath)
    val rows = emb.filter(col("vec_id") < 100)
      .as[(Long, Array[Float])].collect()
    val (batch1, batch2) = rows.splitAt(rows.length / 2)

    def snapshot(): Map[Long, (Option[Long], Option[Double], Option[Long], Option[Double])] =
      spark.read.parquet(outPath).collect().map { r =>
        def l(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getLong(0) -> (l(1), d(2), l(3), d(4))
      }.toMap

    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.EventStream.tripletMineStream(
      input.toDF().toDF("vec_id", "embedding"), cents, idxPath, outPath,
      java.nio.file.Files.createTempDirectory("graft_trip_ck").toString)
    input.addData(batch1.toSeq)
    q.processAllAvailable()
    // snapshot after batch 1: batch-1 anchors vs (initial ∪ batch1)
    val after1 = snapshot()
    input.addData(batch2.toSeq)
    q.processAllAvailable()
    q.stop()
    val after2 = snapshot()

    // the store is a MANIFEST: every streamed anchor has exactly one row
    assert(after1.keySet == batch1.map(_._1).toSet)
    assert(after2.keySet == rows.map(_._1).toSet)
    // insertion-time semantics: batch-1 rows (incl. recorded "no
    // triplet" decisions) are UNCHANGED by batch 2
    after1.foreach { case (a, t) => assert(after2(a) == t, s"anchor $a retro-updated") }
    // one-batch parity: batch-1 TRIPLET rows equal the frozen-centroid
    // twin mined against the same post-append pool
    val pool1 = initial
      .join(Similarity.assign(initial, cents).select("vec_id", "bucket"), "vec_id")
      .unionByName(
        batch1.toSeq.toDF("vec_id", "embedding")
          .join(Similarity.assign(batch1.toSeq.toDF("vec_id", "embedding"), cents)
            .select("vec_id", "bucket"), "vec_id"))
    val twin = Similarity.hardTripletsAgainst(
      batch1.toSeq.toDF("vec_id", "embedding"), pool1, cents)
      .collect().map(r => r.getLong(0) ->
        (Some(r.getLong(1)), Some(r.getDouble(2)), Some(r.getLong(3)), Some(r.getDouble(4)))).toMap
    assert(after1.filter(t => t._2._1.isDefined && t._2._3.isDefined) == twin,
      "stream triplets != frozen-centroid batch twin")
    // validity of full triplets
    after2.values.foreach {
      case (Some(p), Some(cp), Some(n), Some(cn)) =>
        assert(cp >= 0.30 && cn < 0.30 && p != n)
      case _ => ()
    }

    // replay: a fresh query re-delivers everything; index guard +
    // manifest anti-join must land nothing new — INCLUDING anchors
    // whose future positive has since arrived (the recorded-decision
    // property the manifest exists for)
    val in2 = MemoryStream[(Long, Array[Float])]
    val q2 = graft.streaming.EventStream.tripletMineStream(
      in2.toDF().toDF("vec_id", "embedding"), cents, idxPath, outPath,
      java.nio.file.Files.createTempDirectory("graft_trip_ck2").toString)
    in2.addData(rows.toSeq)
    q2.processAllAvailable()
    q2.stop()
    assert(snapshot() == after2, "replay changed the triplet store")
  }

  test("d69: graph_pagerank_weighted TVF hash parity + iters plumbing") {
    Graft.install(spark)
    val pairsW = Seq((1L, 2L, 1000000L), (1L, 3L, 800000L), (2L, 3L, 900000L))
      .toDF("id_a", "id_b", "w_units")
    pairsW.createOrReplaceTempView("g_pairs_w18")
    val viaTvf = spark.sql("SELECT * FROM graph_pagerank_weighted('g_pairs_w18')")
      .collect().map(_.toSeq).toSet
    val direct = Dedup.pageRankWeightedOf(pairsW)
      .collect().map(_.toSeq).toSet
    assert(viaTvf == direct)
    assert(spark.sql("SELECT * FROM graph_pagerank_weighted('g_pairs_w18', 2)")
      .count() == 3L)
  }
}
