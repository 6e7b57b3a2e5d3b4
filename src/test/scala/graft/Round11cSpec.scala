package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Curation, Retrieval}

/** Round 11 (cont. 2): BM25 retrieval (d48), greedy sequence packing
  * (d49), and per-source unigram KL drift (d50) — each checked against
  * an independent Scala re-derivation, plus the plan shapes that keep
  * them 100 TB-safe. */
class Round11cSpec extends SparkSpec {

  /** Independent BM25 with the engines' exact rounding discipline. */
  private def bruteBm25(docs: Seq[(Long, String)],
      queries: Seq[(Int, Seq[String])], topK: Int): Seq[(Int, Int, Long, Double)] = {
    val split = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = docs.size
    val avgdl = split.map(_._2.size).sum.toDouble / n
    val dfm = split.flatMap(_._2.distinct).groupBy(identity).map { case (w, o) => w -> o.size }
    queries.flatMap { case (qid, qws) =>
      val scored = split.flatMap { case (id, ws) =>
        val dl = ws.size
        val terms = qws.flatMap { w =>
          val tf = ws.count(_ == w)
          if (tf == 0) None
          else {
            val df = dfm(w)
            val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
            val t = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
            Some(BigDecimal(t).setScale(9, BigDecimal.RoundingMode.HALF_UP))
          }
        }
        if (terms.isEmpty) None else Some((id, terms.sum))
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(topK).zipWithIndex.map {
        case ((id, s), i) =>
          (qid, i + 1, id,
            BigDecimal(s.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  test("d48 bm25: equal to the independent reference on a planted corpus; rare terms dominate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join merge hash hash"),        // tf-heavy on q1 terms
      (2L, "hash join merge sort window"),
      (3L, "dup dup dup table row"),            // the only dup-heavy doc
      (4L, "table row table row table row"),
      (5L, "fast vector query fast"),
      (6L, "slow scan filter slow scan"),
      (7L, "filler words only here nothing"),
      (8L, "join hash " + (1 to 30).map(_ => "pad").mkString(" "))) // long doc, dampened
    val got = Retrieval.bm25SearchOf(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = bruteBm25(docs, Retrieval.BmQueries, Retrieval.TopK)
    assert(got == want, s"got\n${got.mkString("\n")}\nwant\n${want.mkString("\n")}")
    // the rare term "dup" makes doc 3 the top hit for query 3
    assert(got.filter(_._1 == 3).head._3 == 3L)
    // doc 8 has the same q1 tf as doc 2-ish but 8x the length — ranks below doc 1
    assert(got.filter(_._1 == 1).head._3 == 1L)
  }

  test("d48 plan: no rank window; dictionary/scalar joins broadcast") {
    // audit the builder the DirMemo cut materializes (r20): the
    // registered entry returns the memoized frame, whose plan is a
    // LogicalRDD scan after the lazy checkpoint swap
    val plan = Retrieval.bm25SearchOf(
        Tables.documents(spark, sf).select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window crept in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"dictionary join didn't broadcast:\n$plan")
  }

  /** Independent greedy packer. */
  private def brutePack(items: Seq[(Long, Int)], cap: Int): Seq[(Long, Int, Int, Int)] = {
    var seq = 0; var acc = 0
    items.sortBy(_._1).zipWithIndex.map { case ((id, nt), i) =>
      if (i == 0 || acc + nt > cap) { seq += 1; acc = 0 }
      val off = acc
      acc += nt
      (id, nt, seq, off)
    }
  }

  test("d49 packSeqs: greedy fill, exact-boundary fit, oversized isolation, shard/source independence") {
    import spark.implicits._
    // capacity 10: docs of sizes 4,4,2 fill one sequence EXACTLY; a
    // 15-token doc must sit alone; groups pack independently
    val docs = Seq(
      (0L, 4, "srcA"), (1L, 4, "srcA"), (2L, 2, "srcA"), (3L, 5, "srcA"),
      (4L, 15, "srcA"), (5L, 3, "srcA"),
      (600L, 9, "srcA"),               // different shard (shardSize 512)
      (6L, 9, "srcB"), (7L, 2, "srcB") // different source, same shard
    ).map { case (id, nt, src) => (id, (1 to nt).map(_ => "w").mkString(" "), src) }
      .toDF("doc_id", "text", "source")
    val got = Curation.sequencePackOf(docs, capacity = 10, shardSize = 512)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))
    val wantA0 = brutePack(Seq((0L, 4), (1L, 4), (2L, 2), (3L, 5), (4L, 15), (5L, 3)), 10)
      .map { case (id, nt, sq, off) => ("srcA", 0L, id, nt, sq, off) }
    val wantA1 = Seq(("srcA", 1L, 600L, 9, 1, 0))
    val wantB = brutePack(Seq((6L, 9), (7L, 2)), 10)
      .map { case (id, nt, sq, off) => ("srcB", 0L, id, nt, sq, off) }
    assert(got.toSeq == (wantA0 ++ wantA1 ++ wantB))
    // the exact-boundary triple landed in ONE sequence, offsets 0/4/8
    val a = got.filter(r => r._1 == "srcA" && r._2 == 0L)
    assert(a.take(3).map(r => (r._5, r._6)).toSeq == Seq((1, 0), (1, 4), (1, 8)))
    // the oversized doc sits alone in its own sequence at offset 0
    val over = a.find(_._3 == 4L).get
    assert(over._5 != a.find(_._3 == 3L).get._5 && over._6 == 0)
  }

  test("d49 plan: one shuffle to (source, shard) groups, no window") {
    val plan = SparkEntry.queries("d49_sequence_pack")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    // aggregation to bounded groups + the presentation sort = 2 exchanges max
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"unexpected exchange count $exchanges:\n$plan")
  }

  /** Independent KL with the engines' rounding discipline. */
  private def bruteDrift(docs: Seq[(String, String)]): Map[String, (Long, Long, Double)] = {
    val words = docs.map { case (s, t) => s -> t.split(" ", -1).toSeq }
    val cs = words.flatMap { case (s, ws) => ws.map(s -> _) }
      .groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val cc = cs.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val v = cc.size
    val tc = cc.values.sum
    docs.map(_._1).distinct.map { s =>
      val ts = cs.collect { case ((`s`, _), c) => c }.sum
      val nd = cs.keys.count(_._1 == s).toLong
      val terms = cc.map { case (w, ccnt) =>
        val c = cs.getOrElse((s, w), 0L)
        val psv = (c + 1).toDouble / (ts + v)
        val pcv = (ccnt + 1).toDouble / (tc + v)
        BigDecimal(psv * math.log(psv / pcv))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      s -> (ts, nd,
        BigDecimal(terms.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  test("d50 unigramDrift: equal to the independent reference; drifted source scores above a typical one") {
    import spark.implicits._
    val typical = (1 to 8).map(i => ("common", s"alpha beta gamma delta word$i"))
    val drifted = Seq(("weird", "zzz zzz zzz qqq qqq xxx"))
    val docs = (typical ++ drifted ++ Seq(("common2", "alpha beta gamma delta epsilon")))
      .toDF("source", "text")
    val got = CorpusStats.unigramDriftOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val want = bruteDrift(typical ++ drifted ++ Seq(("common2", "alpha beta gamma delta epsilon")))
    assert(got == want, s"got $got\nwant $want")
    assert(got("weird")._3 > got("common")._3 && got("weird")._3 > got("common2")._3)
  }

  test("d51 snapshotDiff: added/removed/changed/unchanged on planted snapshots") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a", "t1"), (2L, "a", "t2"), (3L, "b", "t3"))
      .toDF("doc_id", "source", "text")
    val newSnap = Seq((2L, "a", "t2x"), (3L, "b", "t3"), (4L, "b", "t4"))
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.snapshotDiffOf(oldSnap, newSnap).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got("a") == ((2L, 1L, 0L, 1L, 1L, 0L)))  // doc1 removed, doc2 changed
    assert(got("b") == ((1L, 2L, 1L, 0L, 0L, 1L)))  // doc4 added, doc3 unchanged
  }

  test("d52 ccnetBuckets: rank-thirds are exact, repeated fluent text lands in head, singleton word salad in tail; keep rule deterministic") {
    import spark.implicits._
    // 9 rankable docs → thirds of exactly 3. Docs built from a SHARED
    // repeated phrase rank fluent (high bigram counts → low NLL); docs
    // of unique-word salad rank tail.
    val fluent = (1L to 3L).map(i => (i, "the market opened higher today and " +
      "the market opened higher today"))
    val mid = (4L to 6L).map(i => (i, s"the market w${i}a w${i}b opened w${i}c higher w${i}d"))
    val salad = (7L to 9L).map(i => (i, (1 to 8).map(j => s"z${i}_$j").mkString(" ")))
    val docs = (fluent ++ mid ++ salad).toDF("doc_id", "text")
    val got = Curation.ccnetBucketsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(got.size == 9)
    (1L to 3L).foreach(i => assert(got(i)._2 == "head", s"doc $i: ${got(i)}"))
    (4L to 6L).foreach(i => assert(got(i)._2 == "middle", s"doc $i: ${got(i)}"))
    (7L to 9L).foreach(i => assert(got(i)._2 == "tail", s"doc $i: ${got(i)}"))
    // head+middle always kept; tail keep is the deterministic md5 rule
    (1L to 6L).foreach(i => assert(got(i)._3))
    val again = Curation.ccnetBucketsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    (7L to 9L).foreach(i => assert(got(i)._3 == again(i), "tail sample must replay"))
  }

  test("d53 lmScore: self-scoring reduces to d44; artifact round-trips; unseen text gets the smoothing floor") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // scored against its own training corpus every LEFT join hits →
    // exactly the d44 numbers (modulo the output column name)
    val self = Curation.lmScoreOf(docs, Curation.trainBigramLmOf(docs))
      .collect().map(_.toSeq)
    val d44 = Curation.bigramNllOf(docs).collect().map(_.toSeq)
    assert(self.toSeq == d44.toSeq)
    // artifact round-trip: save → load → identical scores
    val lmPath = java.nio.file.Files.createTempDirectory("graft_lm").toString
    Curation.saveBigramLm(Curation.trainBigramLmOf(docs), lmPath)
    val loaded = Curation.lmScoreOf(docs, Curation.loadBigramLm(spark, lmPath))
      .collect().map(_.toSeq)
    assert(loaded.toSeq == self.toSeq)
    // a completely unseen doc is scoreable (floor, not a dropped row)
    // and ranks above text the LM was trained on — planted fixture:
    // the testdata corpus's own docs are near-random over a tiny
    // vocab, so the separation needs a genuinely repetitive reference
    val refDocs = (1L to 20L)
      .map(i => (i, "the market opened higher and the market closed lower"))
      .toDF("doc_id", "text")
    val planted = Curation.trainBigramLmOf(refDocs)
    val novel = Seq((900001L, "qqq www eee rrr"),
      (900002L, "the market opened higher")).toDF("doc_id", "text")
    val n = Curation.lmScoreOf(novel, planted)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(n.size == 2 && n(900001L) > n(900002L),
      s"unseen word salad must out-NLL in-distribution text: $n")
    // loading a non-store fails loudly
    intercept[IllegalArgumentException] {
      Curation.loadBigramLm(spark,
        java.nio.file.Files.createTempDirectory("graft_lm_empty").toString)
    }
  }

  test("d4 bitset fast paths: vocab-bitset AND hashed-bitset row-identical to the string-array formulation (incl. jaccard doubles)") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    // (vocabCap 0, hashedBits 0) forces the string-array reference path;
    // vocabCap 0 alone forces the open-vocabulary HASHED prune+verify
    // path; the default picks the bitset dictionary on this 31-word
    // corpus. All three must be row-identical.
    val arrPath = Dedup.ngramJaccardOf(docs, vocabCap = 0, hashedBits = 0)
      .collect().map(_.toSeq)
    val hashPath = Dedup.ngramJaccardOf(docs, vocabCap = 0).collect().map(_.toSeq)
    val bitPath = Dedup.ngramJaccardOf(docs).collect().map(_.toSeq)
    assert(bitPath.nonEmpty, "fixture mined no pairs — fixture rot")
    assert(bitPath.toSeq == arrPath.toSeq)
    assert(hashPath.toSeq == arrPath.toSeq,
      "hashed prune+verify path must lose no pair vs the exact reference")
    // narrow hashed space (64 bits over a 31-word vocab → dense
    // collisions): the prune must STAY sound — exact verify only ever
    // removes false positives, never true pairs
    val tiny = Dedup.ngramJaccardOf(docs, vocabCap = 0, hashedBits = 64)
      .collect().map(_.toSeq)
    assert(tiny.toSeq == arrPath.toSeq,
      "collision-dense hashed path dropped true pairs — prune bound is unsound")
  }

  test("d4 bitset: unknown token fails loudly (a silent miss would undercount n_inter)") {
    val vocab = new graft.functions.TokenVocab(Array("a", "b"))
    import spark.implicits._
    val df = Seq(Seq("a", "zzz")).toDF("ws")
      .select(graft.functions.VectorExprs.tokenBitset(col("ws"), vocab))
    val e = intercept[Exception] { df.collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("not in vocabulary")),
      s"unexpected error: $e")
  }

  test("corpusHealthStream: per-batch d47 report lands partitioned by batch_id; replay overwrites, never duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_health").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_health_ck").toString
    val in = MemoryStream[(Long, String, String, String)]
    val stream = in.toDF().toDF("doc_id", "text", "lang", "source")
    val q = EventStream.corpusHealthStream(stream, s"$dir/stats", ckpt)
    in.addData((1L, "a b c a b c", "en", "s1"), (2L, "x y z", "en", "s1"),
      (3L, "p q r s t", "fr", "s2"))
    q.processAllAvailable()
    in.addData((4L, "m n o", "en", "s1"))
    q.processAllAvailable()
    q.stop()
    val stats = spark.read.parquet(s"$dir/stats")
    val b0 = stats.filter(col("batch_id") === 0).collect()
    assert(b0.map(_.getAs[String]("source")).toSet == Set("s1", "s2"))
    assert(stats.filter(col("batch_id") === 1).count() == 1)
    // replay batch 1 from a FRESH checkpoint (same data): the stats
    // partition is overwritten in place — same row count after
    val before = stats.count()
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_health_ck2").toString
    val in2 = MemoryStream[(Long, String, String, String)]
    val q2 = EventStream.corpusHealthStream(
      in2.toDF().toDF("doc_id", "text", "lang", "source"), s"$dir/stats", ckpt2)
    in2.addData((1L, "a b c a b c", "en", "s1"), (2L, "x y z", "en", "s1"),
      (3L, "p q r s t", "fr", "s2"))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$dir/stats").count() == before,
      "replayed batch duplicated stats rows")
  }

  test("bm25 persisted index: indexed query equals the corpus-scan path; streamed appends compose; replay overwrites in place") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25idx_ck").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // base = ids % 3 == 0; two streamed batches carry the rest
    val base = docs.filter(col("doc_id") % 3 === 0)
    Retrieval.buildTermIndex(base, root)
    val in = MemoryStream[(Long, String)]
    val q = Retrieval.termIndexAppendStream(
      in.toDF().toDF("doc_id", "text"), root, ckpt)
    val rest = docs.filter(col("doc_id") % 3 =!= 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = rest.partition(_._1 % 3 == 1)
    in.addData(b1.toSeq: _*); q.processAllAvailable()
    in.addData(b2.toSeq: _*); q.processAllAvailable()
    q.stop()
    val fromIndex = Retrieval.bm25SearchIndexed(spark, root).collect().map(_.toSeq)
    val fromScan = Retrieval.bm25SearchOf(docs).collect().map(_.toSeq)
    assert(fromIndex.nonEmpty && fromIndex.toSeq == fromScan.toSeq)
    // replay batch 0 (same docs, same id): pure overwrite, same answer
    Retrieval.writeIndexBatch(b1.toSeq.toDF("doc_id", "text"), root, 0L, 64)
    val replayed = Retrieval.bm25SearchIndexed(spark, root).collect().map(_.toSeq)
    assert(replayed.toSeq == fromScan.toSeq, "replayed batch changed the index")
    // layout marker: a mismatched bucket count fails loudly
    intercept[IllegalArgumentException] {
      Retrieval.bm25SearchIndexed(spark, root, buckets = 32)
    }
  }

  test("packStream: arrival-order packing with O(1) per-source state; open sequences continue across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    import EventStream.{DocIn, PackedDoc}
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[DocIn]
      val q = EventStream.packStream(in.toDS(), capacity = 10)
        .writeStream.outputMode("append").format("memory")
        .queryName("packed11c").start()
      in.addData(DocIn(1, "a", 4), DocIn(2, "a", 4), DocIn(3, "a", 5),
        DocIn(10, "b", 9))
      q.processAllAvailable()
      in.addData(DocIn(4, "a", 2), DocIn(11, "b", 2), DocIn(12, "b", 15))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("packed11c").as[PackedDoc].collect()
        .map(p => (p.source, p.doc_id) -> ((p.n_tok, p.seq_id, p.tok_offset))).toMap
      assert(got(("a", 1L)) == ((4, 1, 0)))
      assert(got(("a", 2L)) == ((4, 1, 4)))
      assert(got(("a", 3L)) == ((5, 2, 0)))   // 4+4+5 > 10 → new sequence
      // the open seq 2 (fill 5) absorbs batch 2's 2-token doc: no
      // capacity wasted at the micro-batch seam
      assert(got(("a", 4L)) == ((2, 2, 5)))
      assert(got(("b", 10L)) == ((9, 1, 0)))
      assert(got(("b", 11L)) == ((2, 2, 0)))  // 9+2 > 10 → new sequence
      assert(got(("b", 12L)) == ((15, 3, 0))) // oversized doc isolates
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
