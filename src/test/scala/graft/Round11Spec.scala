package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round 11: C4-style duplicate-span removal (d40) and exact substring
  * dedup (d41) semantics, on planted corpora where the right answer is
  * known by construction.
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // ten-word spans A/B/C/D; distinct words so spans can't collide
  private def span(tag: String): String =
    (1 to 10).map(i => s"$tag$i").mkString(" ")

  test("d40 spanDedup: keep-first removal, within-doc dups, tail exemption, full-removal drop") {
    val a = span("a"); val b = span("b"); val c = span("c")
    val docs = Seq(
      // doc 0: A + B — first occurrences, kept whole
      (0L, s"$a $b"),
      // doc 1: A (dup of doc0 span) + C + A again (within-doc dup of a
      // span first seen in doc 0) — only C survives
      (1L, s"$a $c $a"),
      // doc 2: B then a 3-word tail — B removed, tail kept even though
      // an identical tail exists in doc 3 (sub-size spans are exempt)
      (2L, s"$b tail1 tail2 tail3"),
      // doc 3: same tail text as doc 2 — kept (exemption), plus C dup
      (3L, s"$c tail1 tail2 tail3"),
      // doc 4: ONLY duplicated full spans — drops out entirely
      (4L, s"$a $b")
    ).toDF("doc_id", "text")

    val got = TextFns.spanDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L), s"doc 4 must drop out, got ${got.keySet}")
    assert(got(0L) == ((s"$a $b", 2L, 2L)))
    assert(got(1L) == ((c, 3L, 1L)), "doc 1 keeps only its first-occurrence C")
    assert(got(2L) == (("tail1 tail2 tail3", 2L, 1L)))
    assert(got(3L) == (("tail1 tail2 tail3", 2L, 1L)), "identical tails both kept")
  }

  test("d40 spanDedup: a unique corpus round-trips unchanged") {
    val docs = Seq(
      (10L, (1 to 25).map(i => s"u$i").mkString(" ")),
      (11L, (1 to 7).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextFns.spanDedupOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq.sortBy(_._1) == Seq(
      (10L, (1 to 25).map(i => s"u$i").mkString(" "), 3L, 3L),
      (11L, (1 to 7).map(i => s"v$i").mkString(" "), 1L, 1L)))
  }

  test("d40 in-pipeline: span_dedup stage strips boilerplate from kept docs, counters ride") {
    val boiler = span("bp")
    val docs = (0L to 19L).map { i =>
      // every doc shares the same leading boilerplate span; unique body
      (i, s"$boiler " + (1 to 15).map(j => s"w${i}_$j").mkString(" "),
        "en", s"src${i % 2}")
    }.toDF("doc_id", "text", "lang", "source")
    val (chunks, stats) = operators.CorpusPipeline.buildTrainingCorpus(
      docs, minWords = 3, spanDedup = true)
    try {
      val m = stats.toMap
      assert(m.contains("span_dedup"), s"stage counter missing: $stats")
      assert(m("span_dedup") == 20L, "all docs keep a non-boilerplate remainder")
      // the boilerplate span survives in exactly one doc's chunks
      val withBp = chunks.filter(col("chunk_text").contains("bp1 bp2"))
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSeq
      assert(withBp == Seq(0L), s"boilerplate must survive only in doc 0, got $withBp")
    } finally chunks.unpersist()
  }

  /** Independent brute-force reference for d41: gram occurrence counts
    * by STRING (no hashing), shared positions, maximal runs by a
    * per-doc linear scan. */
  private def bruteRuns(docs: Seq[(Long, String)], n: Int): Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, t) =>
      val ws = t.split(" ")
      (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).map { case (g, os) => g -> os.size }
    val runs = Set.newBuilder[(Long, Long, Long)]
    docs.foreach { case (id, t) =>
      val ws = t.split(" ")
      val shared = (0 to ws.length - n).filter(p =>
        counts(ws.slice(p, p + n).mkString(" ")) >= 2)
      var i = 0
      while (i < shared.length) {
        var j = i
        while (j + 1 < shared.length && shared(j + 1) == shared(j) + 1) j += 1
        runs += ((id, shared(i).toLong, (shared(j) - shared(i) + n).toLong))
        i = j + 1
      }
    }
    runs.result()
  }

  test("d41 exactSubstrRuns: run-for-run equal to a brute-force suffix scan on a planted corpus") {
    val shared25 = (1 to 25).map(i => s"s$i").mkString(" ")
    val rep5 = (1 to 5).map(i => s"r$i").mkString(" ")
    def noise(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      // cross-doc: the same 25-token run at different offsets
      (0L, s"${noise("a", 7)} $shared25 ${noise("b", 4)}"),
      (1L, s"$shared25 ${noise("c", 9)}"),
      // within-doc: a 5-gram repeated at two offsets in ONE doc
      (2L, s"$rep5 ${noise("d", 6)} $rep5"),
      // chaining: doc 3 holds t1..t8; doc 4 covers its grams at pos
      // 0-1 (t1..t6), doc 5 covers pos 2-3 (t3..t8) — every one of
      // doc 3's grams is shared with SOME partner, so the whole 8
      // tokens merge into one run no single partner contains
      (3L, s"${noise("t", 8)} ${noise("e", 3)}"),
      (4L, (1 to 6).map(i => s"t$i").mkString(" ")),
      (5L, (3 to 8).map(i => s"t$i").mkString(" ")),
      // too short for any 5-gram
      (6L, "one two three four")
    )
    val got = operators.Dedup.exactSubstrRunsOf(docs.toDF("doc_id", "text"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = bruteRuns(docs, 5)
    assert(got == want, s"got $got\nwant $want")
    // sanity on the planted shapes: doc 2 reports BOTH repeat offsets,
    // doc 3 merges the chained partner coverage into ONE 8-token run
    assert(want.count(_._1 == 2L) == 2)
    assert(want((3L, 0L, 8L)))
  }

  /** Independent brute-force reference for d42: gram-string counts,
    * keep-first by (doc order, pos), coverage removal, splice. */
  private def bruteClip(docs: Seq[(Long, String)], n: Int): Map[Long, (String, Long, Long)] = {
    val occs = docs.flatMap { case (id, t) =>
      val ws = t.split(" ")
      (0 to ws.length - n).map(p => (ws.slice(p, p + n).mkString(" "), id, p))
    }
    val byGram = occs.groupBy(_._1)
    val firstKey = byGram.collect { case (g, os) if os.size >= 2 =>
      g -> os.map { case (_, id, p) => id * 1048576L + p }.min }
    val out = docs.flatMap { case (id, t) =>
      val ws = t.split(" ")
      val removed = Array.fill(ws.length)(false)
      (0 to ws.length - n).foreach { p =>
        val g = ws.slice(p, p + n).mkString(" ")
        firstKey.get(g).foreach { fk =>
          if (id * 1048576L + p != fk)
            (p until p + n).foreach(removed(_) = true)
        }
      }
      val kept = ws.indices.filterNot(removed).map(ws)
      if (kept.isEmpty) None
      else Some(id -> ((kept.mkString(" "), ws.length.toLong,
        removed.count(identity).toLong)))
    }
    out.toMap
  }

  test("d42 exactSubstrClip: splice-for-splice equal to a brute-force reference; first occurrence survives") {
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    def noise(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (0L, s"${noise("a", 4)} $shared ${noise("b", 3)}"),     // first occurrence: kept whole
      (1L, s"${noise("c", 6)} $shared ${noise("d", 5)}"),     // run cut, noise spliced
      (2L, shared),                                           // nothing left -> drops out
      (3L, noise("e", 40))                                    // untouched
    )
    val got = operators.Dedup.exactSubstrClipOf(docs.toDF("doc_id", "text"), 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val want = bruteClip(docs, 5)
    assert(got == want, s"got $got\nwant $want")
    assert(got(0L)._3 == 0L, "first occurrence must survive uncut")
    assert(got(1L)._1 == s"${noise("c", 6)} ${noise("d", 5)}", "doc 1 splices around the cut")
    assert(!got.contains(2L), "fully-duplicated doc must drop out")
    assert(got(3L) == ((noise("e", 40), 40L, 0L)))
  }

  test("d41 plan: no Window on the Spark side") {
    val plan = operators.Dedup.exactSubstrRuns(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "substring dedup must stay window-free")
  }

  test("ANN registered entries plan no Window (bounded TopKByScore states instead)") {
    for (name <- Seq("d5_embed_topk", "d6_ivf_ann", "d16_quantized_ann",
        "d17_hamming_ann", "d32_pq_ann")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name still plans a window")
    }
  }

  test("d16/d17 aggregate top-k is row-equal to the rank-window formulation") {
    import org.apache.spark.sql.expressions.Window
    // windowed reference for d16 (score desc) and d17 (hd asc),
    // re-derived here exactly as the pre-round-11 entries planned it
    val emb16 = Tables.embeddings(spark, sf)
      .withColumn("qv", operators.Similarity.quantize8(col("embedding")))
      .select(col("vec_id"), col("qv.q").as("q"), col("qv.scale").as("qscale"))
    val qs16 = emb16.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("q").as("q_q"), col("qscale").as("q_scale"))
    val w16 = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id").asc)
    val want16 = emb16.join(broadcast(qs16), col("vec_id") =!= col("q_id"))
      .withColumn("score", graft.functions.VectorExprs.dotI8(col("q"), col("q_q"))
        .cast("double") * col("qscale") * col("q_scale") / (127.0 * 127.0))
      .withColumn("rk", row_number().over(w16)).filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("score"), col("rk"))
      .orderBy("q_id", "rk").collect().toSeq
    assert(operators.Similarity.quantizedTopK(spark, sf).collect().toSeq == want16)

    val emb17 = Tables.embeddings(spark, sf)
      .withColumn("bits", operators.Similarity.packSigns("embedding"))
      .select("vec_id", "bits")
    val qs17 = emb17.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("bits").as("q_bits"))
    val w17 = Window.partitionBy("q_id").orderBy(col("hd").asc, col("vec_id").asc)
    val want17 = emb17.join(broadcast(qs17), col("vec_id") =!= col("q_id"))
      .withColumn("hd", bit_count(col("bits").bitwiseXOR(col("q_bits"))))
      .withColumn("rk", row_number().over(w17)).filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("hd"), col("rk"))
      .orderBy("q_id", "rk").collect().toSeq
    val got17 = operators.Similarity.hammingTopK(spark, sf).collect().toSeq
    assert(got17 == want17)
    assert(operators.Similarity.hammingTopK(spark, sf).schema("hd").dataType ==
      org.apache.spark.sql.types.IntegerType, "hd dtype must survive the negate round-trip")
  }

  test("BPE vocab artifact: train → persist → load → byte-identical encodes; foreign/torn artifacts fail fast") {
    import graft.functions.Bpe
    val docs = Seq(
      (0L, "lower lower lowest low low low slower slow"),
      (1L, "newer new newest news lower slowest slows"),
      (2L, "window windows widen wide wider widest")
    ).toDF("doc_id", "text")
    val v = Bpe.trainFromCorpus(docs, numMerges = 60)
    assert(v.merges.nonEmpty, "corpus must earn merges for the round-trip to mean anything")
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_rt").toString
    Bpe.saveVocab(spark, v, s"$dir/vocab")
    val loaded = Bpe.loadVocab(spark, s"$dir/vocab")
    assert(loaded.merges == v.merges, "persisted merge table must reload in order")
    for (w <- Seq("lower", "slowest", "windowing", "unseen", "w"))
      assert(loaded.encodeWord(w).toSeq == v.encodeWord(w).toSeq,
        s"encode of '$w' must be byte-identical through the artifact")
    // un-committed artifact (no _layout marker) must not load
    intercept[IllegalArgumentException] {
      Bpe.loadVocab(spark, s"$dir/nothere")
    }
    // foreign layout version must not load
    val p = new org.apache.hadoop.fs.Path(s"$dir/vocab/_layout")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("bpe-v999\nmerges=1\n".getBytes("UTF-8")) finally out.close()
    intercept[IllegalArgumentException] {
      Bpe.loadVocab(spark, s"$dir/vocab")
    }
  }

  test("d40 spanDedup plan: no Window, keep-first min is a HashAggregate") {
    val plan = TextFns.spanDedup(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "span dedup must not plan a window")
    assert(!plan.contains("SortAggregate"),
      "packed-key min must hash-aggregate (primitive buffer), not sort-aggregate")
  }
}
