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

  test("d40 spanDedup plan: no Window, keep-first min is a HashAggregate") {
    val plan = TextFns.spanDedup(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "span dedup must not plan a window")
    assert(!plan.contains("SortAggregate"),
      "packed-key min must hash-aggregate (primitive buffer), not sort-aggregate")
  }
}
