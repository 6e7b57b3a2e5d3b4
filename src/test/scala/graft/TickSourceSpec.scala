package graft

import org.apache.spark.sql.functions._

class TickSourceSpec extends SparkSpec {

  private def ticks(rows: Long, parts: Int) =
    spark.read.format("graft-ticks")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("DSv2 tick source generates exactly N rows across P partitions") {
    val df = ticks(10000, 8)
    assert(df.count() == 10000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select("event_id").distinct().count() == 10000)
  }

  test("deterministic: same seed → identical data; partition-count-invariant") {
    val a = ticks(5000, 4)
    val b = ticks(5000, 16)
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("source composes with graft operators (bars over generated ticks)") {
    val df = ticks(20000, 8).withColumn("props", lit("{}"))
    df.createOrReplaceTempView("gen_ticks")
    // hourly bars per user over the generated stream
    val bars = df.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bar"))
      .agg(count(lit(1)).as("n"), max("value").as("high_v"), min("value").as("low_v"))
    assert(bars.count() > 0)
    assert(bars.filter(col("low_v") > col("high_v")).count() == 0)
  }
}
