package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends SparkSpec {

  test("clean testdata passes its contract; violations counted exactly") {
    val ev = Tables.events(spark, sf)
    val clean = Quality.check(ev, Seq(
      NotNull("event_id"), NotNull("ts"),
      InRange("value", 0.0, 1000.0),
      OneOf("event_type", Seq("click", "view", "purchase", "signup", "error")),
      Matches("props", "^\\{.*\\}$"))).collect()(0)
    assert(clean.getLong(0) == ev.count())
    (1 to 5).foreach(i => assert(clean.getLong(i) == 0, s"constraint $i violated"))

    // dirty it deterministically and expect exact counts
    val dirty = ev
      .withColumn("value", when(pmod(col("event_id"), lit(100)) === 0, lit(-1.0)).otherwise(col("value")))
      .withColumn("event_type", when(pmod(col("event_id"), lit(200)) === 0, lit("bogus")).otherwise(col("event_type")))
    val r = Quality.check(dirty, Seq(InRange("value", 0.0, 1000.0),
      OneOf("event_type", Seq("click", "view", "purchase", "signup", "error")))).collect()(0)
    assert(r.getLong(1) == ev.filter(pmod(col("event_id"), lit(100)) === 0).count())
    assert(r.getLong(2) == ev.filter(pmod(col("event_id"), lit(200)) === 0).count())
  }

  test("uniqueness and referential integrity") {
    val ev = Tables.events(spark, sf)
    assert(Quality.uniqueViolations(ev, Seq("event_id")) == 0)
    assert(Quality.uniqueViolations(ev.union(ev.limit(10)), Seq("event_id")) == 10)
    val orphans = Quality.orphans(
      Tables.orders(spark, sf), "o_custkey", Tables.customer(spark, sf), "c_custkey")
    assert(orphans.count() == 0) // testdata is referentially intact
  }
}
