package graft

import org.apache.spark.sql.functions._

/** The custom AsOfJoin plan node must agree with the union+window
  * formulation (q16) row for row. */
class AsOfJoinSpec extends SparkSpec {

  test("custom as-of join matches union+window as-of on value") {
    val custom = SparkEntry.queries("q26_asof_custom")(spark, sf)
      .select(col("event_id"), col("q_value"))
    val window = SparkEntry.queries("q16_asof_join")(spark, sf)
      .select(col("event_id"), col("last_view_value").as("q_value"))
    assert(custom.count() == window.count())
    assert(custom.exceptAll(window).count() == 0)
    assert(window.exceptAll(custom).count() == 0)
  }

  test("as-of join output keeps nulls for trades before any quote") {
    val df = SparkEntry.queries("q26_asof_custom")(spark, sf).cache()
    // every non-null match must be at or before the trade time
    assert(df.filter(col("q_ts") > col("ts")).count() == 0)
    df.unpersist()
  }

  test("randomized parity: custom exec vs window formulation on generated ticks") {
    // 3 shapes: uniform keys, heavy skew, tiny right side
    for ((hot, rows, seed) <- Seq((0.0, 50000, 1), (0.6, 50000, 2), (0.0, 5000, 3))) {
      val gen = spark.read.format("graft-ticks")
        .option("rows", rows.toString).option("partitions", "8")
        .option("hotfraction", hot.toString).option("seed", seed.toString).load()
      val trades = gen.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val quotes = gen.filter(col("event_type") === "view")
        .select(col("user_id").as("user_id_r"), col("ts").as("q_ts"),
          col("value").as("q_value"))
      val custom = graft.plans.AsOf.join(trades, quotes, "user_id", "ts", "q_ts")
        .select(col("event_id"), col("q_value"))
      // window formulation over the union
      val tagged = gen.filter(col("event_type").isin("view", "purchase"))
        .withColumn("qv", when(col("event_type") === "view", col("value")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val window = tagged
        .withColumn("lv", last(col("qv"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("lv").as("q_value"))
      assert(custom.count() == trades.count(), s"row count off (hot=$hot rows=$rows)")
      assert(custom.exceptAll(window).count() == 0 &&
             window.exceptAll(custom).count() == 0,
        s"custom vs window mismatch (hot=$hot rows=$rows seed=$seed)")
    }
  }

  test("equal-timestamp ties resolve by seq: only smaller-seq quotes match") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    // user 1: quote BEFORE the trade in (ts, id) order at the SAME ts →
    // matches; a quote AFTER the trade at the same ts must NOT.
    // user 2: only a later-seq quote at the tied ts → no match at t0.
    val trades = Seq((10L, 1L, t0, 1.0), (20L, 2L, t0, 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val quotes = Seq(
      (5L, 1L, t0, 100.0),  // same ts, smaller id → visible to trade 10
      (15L, 1L, t0, 200.0), // same ts, LARGER id → not visible
      (25L, 2L, t0, 300.0), // same ts, larger id than trade 20 → not visible
      (30L, 2L, t1, 400.0)) // later ts → never visible at t0
      .toDF("q_event_id", "user_id_r", "q_ts", "q_value")
      .select(col("user_id_r"), col("q_ts"), col("q_value"), col("q_event_id"))
    val got = graft.plans.AsOf.join(trades, quotes, "user_id", "ts", "q_ts",
        leftSeqCol = Some("event_id"), rightSeqCol = Some("q_event_id"))
      .select("event_id", "q_value", "q_event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getLong(2))))).toMap
    assert(got(10L).contains((100.0, 5L)),
      s"trade 10 must see the smaller-seq tied quote, got ${got(10L)}")
    assert(got(20L).isEmpty,
      s"trade 20 must see NO quote (only larger-seq tie / later ts), got ${got(20L)}")
    // and the window/oracle formulation agrees on the same data
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("t", "i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val union = trades.select(col("event_id").as("i"), col("user_id").as("u"),
        col("ts").as("t"), lit(null).cast("double").as("qv"), lit(true).as("isTrade"))
      .unionByName(quotes.select(col("q_event_id").as("i"), col("user_id_r").as("u"),
        col("q_ts").as("t"), col("q_value").as("qv"), lit(false).as("isTrade")))
    val oracle = union.withColumn("lv", last(col("qv"), ignoreNulls = true).over(w))
      .filter(col("isTrade"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(oracle(10L) == got(10L).map(_._1) || (oracle(10L).isEmpty && got(10L).isEmpty))
    assert(oracle(20L) == got(20L).map(_._1) || (oracle(20L).isEmpty && got(20L).isEmpty))
  }

  test("nullable seq columns do not NPE: nulls order first at a tied timestamp") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // trade seq null: only null-seq quotes at the tied ts are visible
    val trades = Seq((1L, Option.empty[Long], t0, 1.0))
      .toDF("user_id", "seq", "ts", "value")
    val quotes = Seq(
      (1L, Option.empty[Long], t0, 100.0), // null seq → ties-or-precedes → visible
      (1L, Some(5L), t0, 200.0))           // non-null seq > null left → not visible
      .toDF("user_id_r", "q_seq", "q_ts", "q_value")
    val got = graft.plans.AsOf.join(trades, quotes, "user_id", "ts", "q_ts",
        leftSeqCol = Some("seq"), rightSeqCol = Some("q_seq"))
      .select("value", "q_value").collect()
    assert(got.length == 1 && got(0).getDouble(1) == 100.0,
      s"null-seq trade must match only the null-seq quote, got ${got.mkString(",")}")
  }

  test("as-of join with an empty right side yields all-null matches") {
    val gen = spark.read.format("graft-ticks").option("rows", "1000").load()
    val trades = gen.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val quotes = gen.filter(col("event_type") === "never_matches")
      .select(col("user_id").as("user_id_r"), col("ts").as("q_ts"),
        col("value").as("q_value"))
    val j = graft.plans.AsOf.join(trades, quotes, "user_id", "ts", "q_ts")
    assert(j.count() == trades.count())
    assert(j.filter(col("q_value").isNotNull).count() == 0)
  }

  test("physical plan is the custom exec with one exchange per side") {
    val df = SparkEntry.queries("q26_asof_custom")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin"), s"custom exec missing in:\n$plan")
    // exactly one hash exchange per side feeding the merge
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }
}
