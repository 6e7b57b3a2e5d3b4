package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The testdata has no nulls; real pipelines do. Inject nulls into the
  * events shape and check the core operator families stay well-defined.
  */
class NullHandlingSpec extends SparkSpec {

  private def dirty = Tables.events(spark, sf)
    .withColumn("value", when(pmod(col("event_id"), lit(97)) === 0, lit(null)).otherwise(col("value")))
    .withColumn("event_type", when(pmod(col("event_id"), lit(101)) === 0, lit(null)).otherwise(col("event_type")))

  test("aggregation ignores null measures, counts stay total") {
    val agg = dirty.groupBy("user_id")
      .agg(count(lit(1)).as("n_all"), count(col("value")).as("n_val"),
        sum("value").as("s"))
    assert(agg.filter(col("n_val") > col("n_all")).count() == 0)
    assert(agg.filter(col("n_all") =!= col("n_val")).count() > 0, "no nulls injected?")
    assert(agg.filter(col("s").isNull && col("n_val") > 0).count() == 0)
  }

  test("rolling window over null values carries count of non-nulls") {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-10, 0)
    val r = dirty.withColumn("ra", avg("value").over(w))
    // avg is null only while ALL values in the window are null
    assert(r.filter(col("ra").isNull && col("value").isNotNull).count() == 0)
  }

  test("null group keys form their own group in groupBy and dedup") {
    val g = dirty.groupBy("event_type").count()
    assert(g.filter(col("event_type").isNull).count() == 1)
    val dd = dirty.select("event_type").distinct()
    assert(dd.count() == 6) // 5 types + null
  }

  test("null keys drop out of inner joins, survive left joins") {
    val dim = Tables.events(spark, sf).select(col("event_type")).distinct()
      .withColumn("flag", lit(1))
    val inner = dirty.join(dim, Seq("event_type")).count()
    val left = dirty.join(dim, Seq("event_type"), "left").count()
    assert(left == dirty.count())
    assert(inner < left)
  }

  test("latest-per-key tolerates null values in the payload") {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val latest = dirty.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(latest.count() == dirty.select("user_id").distinct().count())
  }
}
