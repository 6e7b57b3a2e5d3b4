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
