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

  test("q55 skew join: salt stays in the shuffle-join keys, no broadcast; rows == plain unsalted join") {
    import graft.operators.SkewOps
    val df = SkewOps.skewJoinDemo(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim side got broadcast — the salted-shuffle demo never engaged:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled join strategy:\n$plan")
    assert(plan.contains("_salt"),
      s"salt column missing from the executed plan's join keys:\n$plan")

    // row parity vs the plain unsalted join (salt draw is nondeterministic
    // per row; the joined row SET must not depend on it)
    val li = Tables.lineitem(spark, sf).select(
      when(pmod(col("l_orderkey"), lit(10)) < 7, lit(0L))
        .otherwise(col("l_orderkey")).as("jk"),
      col("l_orderkey"), col("l_linenumber"))
    val co = Tables.orders(spark, sf).select(
      when(pmod(col("o_orderkey"), lit(10)) < 7, lit(0L))
        .otherwise(col("o_orderkey")).as("jk"),
      col("o_totalprice"))
      .groupBy("jk")
      .agg(count(lit(1)).as("cohort_orders"),
        graft.operators.Relational.dsum(col("o_totalprice")).as("cohort_value"))
    val plain = li.join(co, "jk")
      .select("jk", "l_orderkey", "l_linenumber", "cohort_orders", "cohort_value")
      .orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq)
    val salted = df.collect().map(_.toSeq)
    assert(salted.nonEmpty && salted.toSeq == plain.toSeq,
      "salted join row set diverged from the plain join")
    // the hot key really is hot: ~70% of fact rows on jk = 0
    val hotFrac = salted.count(_.head == 0L).toDouble / salted.length
    assert(hotFrac > 0.6 && hotFrac < 0.8, s"hot fraction $hotFrac out of band")
  }
}
