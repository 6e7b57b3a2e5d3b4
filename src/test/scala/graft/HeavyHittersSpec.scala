package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters.heavyHitters

class HeavyHittersSpec extends SparkSpec {

  test("capacity >= distinct items: sketch is exact and matches groupBy") {
    val ev = Tables.events(spark, sf)
    val sketch = ev.agg(heavyHitters(col("event_type"), 16).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("event_type"), col("h.est_count").as("n"))
    val exact = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    assert(sketch.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(sketch).count() == 0)
    // and errors are zero in the exact regime
    val errs = ev.agg(heavyHitters(col("event_type"), 16).as("hh"))
      .select(explode(col("hh")).as("h")).filter(col("h.max_err") > 0).count()
    assert(errs == 0)
  }

  test("under-capacity sketch still surfaces the true heavy hitter") {
    // skewed stream: 50% of rows on user 0
    val skewed = spark.read.format("graft-ticks")
      .option("rows", "200000").option("partitions", "16")
      .option("hotfraction", "0.5").load()
      .select(col("user_id").cast("string").as("u"))
    val hh = skewed.agg(heavyHitters(col("u"), 8).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est_count"), col("h.max_err"))
      .collect()
    assert(hh.head.getString(0) == "0", s"hot key not ranked first: ${hh.toSeq}")
    // estimate bounds the true count: est >= true >= est - err
    val trueHot = skewed.filter(col("u") === "0").count()
    val est = hh.head.getLong(1)
    val err = hh.head.getLong(2)
    assert(est >= trueHot && est - err <= trueHot,
      s"true=$trueHot not in [${est - err}, $est]")
  }

  test("works per group (heavy tokens per lang)") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val perLang = docs.groupBy("lang").agg(heavyHitters(col("w"), 5).as("hh"))
    assert(perLang.count() == 5)
    assert(perLang.filter(size(col("hh")) =!= 5).count() == 0)
  }
}
