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

  test("physical plan is the custom exec with one exchange per side") {
    val df = SparkEntry.queries("q26_asof_custom")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin"), s"custom exec missing in:\n$plan")
    // exactly one hash exchange per side feeding the merge
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }
}
