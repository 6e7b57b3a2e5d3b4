package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Curation}

/** Corpus-curation operators (d24-d26): planted-fixture semantics plus
  * the plan shapes that make them 100 TB-safe (broadcast gram join, no
  * corpus-side shuffle before the sample filter). */
class CurationSpec extends SparkSpec {

  test("decontaminate: only docs sharing an 8-gram with the benchmark are flagged, scored by distinct overlap") {
    import spark.implicits._
    val w = (1 to 20).map(i => s"w$i").mkString(" ")          // w1..w20
    val bench = Seq((100L, w)).toDF("doc_id", "text")
    val training = Seq(
      // contains w3..w10 and w4..w11 → two distinct benchmark 8-grams
      (1L, (3 to 11).map(i => s"w$i").mkString(" ")),
      // same words, order scrambled → no 8-gram survives
      (2L, Seq(4, 3, 6, 5, 8, 7, 10, 9, 11).map(i => s"w$i").mkString(" ")),
      // disjoint vocabulary
      (3L, (30 to 45).map(i => s"x$i").mkString(" ")),
      // shorter than 8 words: contributes no grams at all
      (4L, (1 to 7).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Curation.decontaminateOf(training, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L), s"unexpected contamination map: $got")
  }

  test("decontaminate: the benchmark gram set joins by BROADCAST (eval sets are tiny; the corpus side must not shuffle)") {
    val plan = SparkEntry.queries("d24_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"gram join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join crept in:\n$plan")
  }

  test("repetitionScore: duplicate-3-gram fraction on planted repetitive vs all-distinct docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),      // grams: aba, bab, aba, bab → 4 total, 2 distinct
      (2L, "a b c d e"),        // all distinct → 0.0
      (3L, "x y")               // < 3 words → filtered out
    ).toDF("doc_id", "text")
    val got = Curation.repetitionScoreOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 4L, 0.5), (2L, 3L, 0.0)))
  }

  test("domainMixSample: deterministic replay, skewed sources downsampled toward the uniform budget") {
    import spark.implicits._
    // skewed sources: big=400 docs, mid=100, small=25; targetFrac 0.5
    // → per-source budget 0.5 × 525 / 3 = 87.5: big keeps ~22%, mid
    // ~88%, small is under budget and keeps everything (rate capped)
    val docs = ((0 until 400).map(i => (i.toLong, "big")) ++
      (0 until 100).map(i => (1000L + i, "mid")) ++
      (0 until 25).map(i => (2000L + i, "small"))).toDF("doc_id", "source")
    val kept = Curation.domainMixSampleOf(docs)
    val a = kept.collect().map(r => (r.getLong(0), r.getString(1)))
    val b = kept.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq, "hash-based sample is not replay-deterministic")
    val bySrc = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("small") == 25, s"under-budget source was subsampled: $bySrc")
    // binomial around the 87.5 budget — generous ±4σ slack
    assert(bySrc("big") >= 55 && bySrc("big") <= 120, s"big source off budget: $bySrc")
    assert(bySrc("mid") >= 70 && bySrc("mid") <= 100, s"mid source off budget: $bySrc")
    // sample is a subset of the input, no duplicates introduced
    assert(a.distinct.length == a.length)
  }

  test("redactPii: masks and counts e-mail / SSN / phone spans, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to alice.smith@corp.example.org for details"),
      (2L, "ssn 123-45-6789 and backup 987-65-4321 on file"),
      (3L, "call (415) 555-0199 today"),
      (4L, "no pii here at all"),
      (5L, "mixed bob@x.io and 222-33-4444 and (800) 555-1234")
    ).toDF("doc_id", "text")
    val got = Curation.redactPiiOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, "write to <PII> for details"),
      (2L, 2L, "ssn <PII> and backup <PII> on file"),
      (3L, 1L, "call <PII> today"),
      (4L, 0L, "no pii here at all"),
      (5L, 3L, "mixed <PII> and <PII> and <PII>")))
  }

  test("dirtyDocs plants PII on the mod-3/5/7 schedule and redactPii recovers the counts") {
    val dirty = Curation.dirtyDocs(
      Tables.documents(spark, sf).select("doc_id", "text"))
    val got = Curation.redactPiiOf(dirty)
      .withColumn("expected",
        (col("doc_id") % 3 === 0).cast("long") +
        (col("doc_id") % 5 === 0).cast("long") +
        (col("doc_id") % 7 === 0).cast("long"))
    assert(got.filter(col("n_pii") =!= col("expected")).count() == 0,
      "redaction count diverged from the planting schedule")
    assert(got.filter(col("n_pii") > 0).count() > 0, "no PII planted at all")
  }

  test("stratifiedSplit: deterministic, complete, and near the 90/5/5 cut") {
    val a = Curation.stratifiedSplit(spark, sf)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet == Set("train", "val", "test"), s"splits: $counts")
    // binomial slack around 90/5/5 (500 docs at sf0.001+)
    assert(counts("train").toDouble / total > 0.8, s"train share off: $counts")
    assert(counts("val").toDouble / total < 0.15 &&
      counts("test").toDouble / total < 0.15, s"val/test share off: $counts")
    // same doc always lands in the same split (replay determinism)
    val rows = a.collect().map(r => (r.getLong(0), r.getString(2)))
    val again = Curation.stratifiedSplit(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(rows.toSeq == again.toSeq, "hash split is not replay-deterministic")
  }

  test("ngramTopK: exact counts with deterministic tie-break on the gram") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"), // "a b c"×3, "b c a"×2, "c a b"×2
      (2L, "a b c d"),           // "a b c", "b c d"
      (3L, "x y")                // too short: no grams
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramTopKOf(docs, n = 3, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a b c", 4L), ("b c a", 2L), ("c a b", 2L)), got.toSeq)
  }

  test("vocabCoverage: cumulative fraction is monotone, ends at top-k coverage of the true total") {
    import spark.implicits._
    val docs = Seq("a a a b b c", "a b d").toDF("text")
    // counts: a=4, b=3, c=1, d=1; total=9
    val got = CorpusStats.vocabCoverageOf(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "a", 4L, 4.0 / 9), (2L, "b", 3L, 7.0 / 9), (3L, "c", 1L, 8.0 / 9)))
  }

  test("tokenBudgetMix: two-level prefix sum equals the naive global window; budgets hold per source") {
    import org.apache.spark.sql.expressions.Window
    // skewed fixture: big source carries ~16x the small one's tokens
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
    val got = Curation.tokenBudgetMixOf(docs, targetFrac = 0.5, partitions = 7)
    // naive single-window reference (fine at test scale)
    val toks = docs.select(col("doc_id"), col("source"),
      size(array_remove(split(col("text"), " "), "")).cast("long").as("n_tokens"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        / lit(4294967296.0)).as("u"))
    val counts = toks.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val Seq(total, nGroups) = counts.agg(sum("src_tokens"), count(lit(1)))
      .collect().head.toSeq.map(_.toString.toLong)
    val budget = 0.5 * total / nGroups
    val naive = toks.withColumn("cum", sum("n_tokens").over(
        Window.partitionBy("source").orderBy("u", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
      .select("doc_id", "source", "n_tokens").orderBy("doc_id")
    val a = got.collect().map(_.toSeq).toSeq
    val b = naive.collect().map(_.toSeq).toSeq
    assert(a == b, s"two-level cut diverged from the global window: ${a.size} vs ${b.size} rows")
    // every source's kept token mass stays within budget
    val masses = got.groupBy("source").agg(sum("n_tokens").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    masses.foreach { case (src, m) =>
      assert(m <= budget, s"source $src kept $m tokens over budget $budget") }
    assert(got.count() > 0 && got.count() < docs.count(),
      "token-budget mix kept everything (or nothing) — fixture does not bite")
  }

  test("WordNgrams/NgramStats: byte-parity with the interpreted HOF cascade over the real corpus") {
    import graft.functions.VectorExprs
    val ws = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val fast8 = ws.filter(size(col("ws")) >= 8)
      .select(col("doc_id"), explode(VectorExprs.wordNgrams(col("ws"), 8)).as("ng"))
    val hof8 = ws.filter(size(col("ws")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 7), i -> array_join(slice(ws, i, 8), ' '))")).as("ng"))
    assert(fast8.exceptAll(hof8).count() == 0 && hof8.exceptAll(fast8).count() == 0,
      "8-gram strings diverge from the HOF formulation")
    val stats = ws.filter(size(col("ws")) >= 3)
      .select(VectorExprs.ngramStats(col("ws"), 3).as("st"),
        expr("transform(sequence(1, size(ws) - 2), i -> array_join(slice(ws, i, 3), ' '))").as("ngs"))
      .filter(col("st.n_ngrams") =!= size(col("ngs")).cast("long") ||
        col("st.n_distinct") =!= size(array_distinct(col("ngs"))).cast("long"))
    assert(stats.count() == 0, "NgramStats diverges from size/array_distinct")
  }

  test("WordNgrams/NgramStats edges: short arrays empty/zero, k=1 is the word list itself") {
    import spark.implicits._
    import graft.functions.VectorExprs
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("a")), (3L, Seq[String]()))
      .toDF("id", "ws")
    val g3 = df.select(VectorExprs.wordNgrams(col("ws"), 3).as("ng"),
      VectorExprs.ngramStats(col("ws"), 3).as("st")).collect()
    g3.foreach { r =>
      assert(r.getSeq[String](0).isEmpty)
      assert(r.getStruct(1).getLong(0) == 0L && r.getStruct(1).getLong(1) == 0L)
    }
    val g1 = df.filter(col("id") === 1L)
      .select(VectorExprs.wordNgrams(col("ws"), 1).as("ng")).head()
    assert(g1.getSeq[String](0) == Seq("a", "b"))
  }

  test("unigramNll: common-word docs score lower than rare/OOV docs; OOV capped vocab bites") {
    import spark.implicits._
    val docs = (
      (1 to 50).map(i => (i.toLong, "the quick fox")) ++       // frequent words
      Seq((100L, "the quick fox"), (101L, "zyx wvu tsr"))      // same vs all-rare
    ).toDF("doc_id", "text")
    val got = CorpusStats.unigramNllOf(docs, vocabCap = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(100L) < got(101L),
      s"frequent-word doc must score lower NLL: ${got(100L)} vs ${got(101L)}")
    // rare words fell outside the top-3 vocab → OOV probability applied
    assert(got(101L) > -math.log(0.5 / (51 * 3.0 + 3)) - 1.0)
    assert(got.values.forall(v => v > 0 && !v.isNaN))
  }

  test("templateChunks: shared window-aligned boilerplate detected, reorders and tails are not") {
    import spark.implicits._
    val boiler = (1 to 20).map(i => s"b$i")                       // one full window
    val docs = Seq(
      (1L, (boiler ++ Seq("x1", "x2")).mkString(" ")),            // boilerplate + tail
      (2L, (boiler ++ Seq("y1", "y2", "y3")).mkString(" ")),      // same aligned window
      (3L, (boiler.reverse ++ Seq("z1")).mkString(" ")),          // same words reordered
      (4L, (41 to 65).map(i => s"u$i").mkString(" "))             // unrelated
    ).toDF("doc_id", "text")
    // the PRODUCTION function over the in-memory frame
    val got = graft.functions.TextFns.templateChunksOf(docs)
      .select("chunk_text", "n_docs")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq((boiler.mkString(" "), 2L)), got.toSeq)
    // and the registered query bites on the real corpus (planted
    // near-dups share aligned windows)
    assert(SparkEntry.queries("d34_template_chunks")(spark, sf).count() > 0)
  }

  test("splitLeakage: exactly the d4 pairs whose endpoints straddle the d28 split") {
    val leak = SparkEntry.queries("d35_split_leakage")(spark, sf).cache()
    assert(leak.filter(col("split_a") === col("split_b")).count() == 0)
    // inline-computed labels equal the assignment-table join
    val splits = graft.operators.Curation.stratifiedSplit(spark, sf)
      .select("doc_id", "split")
    val expected = SparkEntry.queries("d4_ngram_jaccard")(spark, sf)
      .select("id_a", "id_b")
      .join(splits.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(splits.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leak.count() == expected, s"${leak.count()} vs $expected")
    assert(leak.count() > 0, "leakage report is a no-op demo at this SF")
    leak.unpersist()
  }

  test("boilerplateScrub: frequent blocks dropped EVERYWHERE incl. first occurrence, tails exempt") {
    import spark.implicits._
    val boiler = "click here now"                // the planted template
    val docs = Seq(
      // 5 docs carry the boiler block at block offset 0 (>= minDocs=3)
      (1L, s"$boiler a b c"),
      (2L, s"$boiler d e f"),
      (3L, s"$boiler g h i"),
      // doc 4 is ONLY the boiler block → rebuilt text must be empty
      (4L, boiler),
      // doc 5 carries it at a LATER aligned offset
      (5L, s"j k l $boiler"),
      // doc 6: same words but straddling a block boundary → NOT aligned,
      // so its blocks are unique and survive
      (6L, s"m click here now n o"),
      // doc 7: 2-word tail equal to a frequent prefix pair would still
      // be exempt (tails are never boilerplate)
      (7L, s"p q r click here")
    ).toDF("doc_id", "text")
    val got = Curation.boilerplateScrubOf(docs, minDocs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 1L, "a b c")), s"doc1: ${got(1L)}")
    assert(got(4L) == ((1L, 1L, "")), s"all-boiler doc must rebuild to '': ${got(4L)}")
    assert(got(5L) == ((2L, 1L, "j k l")), s"late-offset occurrence must drop too: ${got(5L)}")
    assert(got(6L) == ((2L, 0L, "m click here now n o")),
      s"unaligned lookalike must survive: ${got(6L)}")
    assert(got(7L) == ((2L, 0L, "p q r click here")), s"tail exempt: ${got(7L)}")
    // contrast with d40 keep-first: EVERY occurrence is gone, including
    // the corpus-wide first (doc 1's)
    assert(got.values.count(_._3.contains(boiler)) == 0 ||
      got(6L)._3.contains(boiler), "only the unaligned doc may still contain the words")
  }

  test("urlFilter: normalization collapses case/www/default-port/utm/slash variants; blocklist and keep-min dedup") {
    import spark.implicits._
    val docs = Seq(
      // all five normalize to http://foo.com/a → one group, doc 1 kept
      (1L, "HTTP://WWW.Foo.COM:80/a/"),
      (2L, "http://foo.com/a"),
      (3L, "http://www.foo.com/a?utm_source=x"),
      (4L, "http://FOO.com/a/?utm_id=7"),
      (5L, "http://foo.com:80/a"),
      // https default port stripped; NON-default port kept distinct
      (6L, "HTTPS://bar.com:443/b"),
      (7L, "https://bar.com:8443/b"),
      // utm strip re-anchors a surviving query; param order irrelevant
      (8L, "https://baz.com/c?utm_x=1&id=2"),
      (9L, "https://baz.com/c?id=2&utm_x=1"),
      // blocklisted domain: dropped even though unique
      (10L, "https://spam.example/z")
    ).toDF("doc_id", "url")
    val got = Curation.urlFilterOf(docs, Seq("spam.example")).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    (1L to 5L).foreach { i =>
      assert(got(i)._1 == "http://foo.com/a", s"doc $i: ${got(i)}")
      assert(got(i)._3 == 5L, s"doc $i dup count: ${got(i)}")
      assert(got(i)._4 == (i == 1L), s"only the min doc keeps the URL: $i ${got(i)}")
    }
    assert(got(6L)._1 == "https://bar.com/b" && got(6L)._4)
    assert(got(7L)._1 == "https://bar.com:8443/b" && got(7L)._4,
      s"non-default port must stay distinct: ${got(7L)}")
    assert(got(8L)._1 == "https://baz.com/c?id=2", s"re-anchored query: ${got(8L)}")
    assert(got(9L)._1 == "https://baz.com/c?id=2" && !got(9L)._4)
    assert(got(10L)._2 == "spam.example" && !got(10L)._4,
      s"blocklisted domain must be dropped: ${got(10L)}")
  }

  test("weightedSample: matches the rank-window reference; heavy weights dominate the sample") {
    import spark.implicits._
    val out = Curation.weightedSample(spark, sf).cache()
    // reference: the same keys through an explicit per-source window
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("bigint")
    val skey = round(-log((u + lit(1L)).cast("double") / lit(4294967296.0)) /
      greatest(col("n_chars"), lit(1L)), 9)
    val ref = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
      .withColumn("skey", skey)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("skey"), col("doc_id"))))
      .filter(col("rn") <= 50)
      .select(col("source"), col("rn").cast("long").as("rn"), col("doc_id"), col("skey"))
    assert(out.exceptAll(ref).count() == 0 && ref.exceptAll(out).count() == 0,
      "TopKByScore sample != rank-window reference")
    // replayable: second run identical
    val again = Curation.weightedSample(spark, sf)
    assert(out.exceptAll(again).count() == 0, "sample not replayable")
    out.unpersist()
    // weight bias: 10 heavy docs (w=5000) among 190 light (w=1) must
    // essentially always make a k=20 sample
    val docs = (0L until 200L).map(i =>
      (i, "s0", if (i < 10) 5000L else 1L)).toDF("doc_id", "source", "n_chars")
    val skey2 = round(-log((conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") + lit(1L)).cast("double") / lit(4294967296.0)) /
      greatest(col("n_chars"), lit(1L)), 9)
    val picked = docs.withColumn("skey", skey2)
      .groupBy("source")
      .agg(graft.functions.TopKAgg.topKByScore(
        struct((-col("skey")).as("score"), col("doc_id").as("id")), 20).as("topk"))
      .select(explode(col("topk")).as("t")).select(col("t.id").as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val heavyIn = (0L until 10L).count(picked.contains)
    assert(heavyIn >= 9, s"only $heavyIn/10 heavy docs sampled — weighting is not biting")
  }

  test("curation entries: registered queries run and the oracle dialect stays aligned") {
    // rows>0 over the real corpus at test SF; the exact-parity gate is
    // the driver selfcheck (run at sf0.01/sf0.1/amplified this round)
    Seq("d24_decontaminate", "d25_repetition_score", "d26_domain_mix",
        "d27_pii_redact", "d28_stratified_split", "d29_ngram_topk",
        "d30_vocab_coverage", "d31_token_budget_mix",
        "d33_unigram_nll", "d34_template_chunks",
        "d35_split_leakage", "d54_boilerplate", "d55_url_filter",
        "d57_weighted_sample").foreach { k =>
      assert(SparkEntry.queries(k)(spark, sf).count() > 0, s"$k returned no rows")
      assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle SQL")
    }
  }
}
