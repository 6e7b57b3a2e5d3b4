package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round 12: capacity/vocabulary edges — d15's auto-sized SpaceSaving
  * capacity must keep the sketch in its exact regime on corpora whose
  * vocabulary breaks any fixed constant. */
class Round12Spec extends SparkSpec {

  test("d15 auto-capacity: exact vs plain GROUP BY on a >1024-word per-lang vocabulary") {
    import spark.implicits._
    // 3000 distinct words in one lang — far past the old 1024 constant
    // (which silently left the exact regime on exactly this shape at a
    // 40× synthesized corpus); repetition pattern makes counts non-flat
    val docs = (0 until 3000).map { i =>
      val reps = 1 + (i % 7)
      ("en", (Seq.fill(reps)(s"w$i") :+ s"w${i % 50}").mkString(" "))
    } ++ Seq(("es", "uno dos dos tres tres tres"))
    val df = docs.toDF("lang", "text")
    val got = TextFns.heavyTokensOf(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val exact = df
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
      .orderBy("lang", "w")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(exact.exists(_._1 == "en") && exact.count(_._1 == "en") == 3000,
      "fixture rot: expected 3000 distinct en tokens")
    assert(got == exact,
      "auto-sized SpaceSaving left the exact regime — capacity probe under-sized")
  }
}
