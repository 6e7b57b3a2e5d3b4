package graft

import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {

  test("typed Dataset round-trip and typed aggregation match untyped") {
    import spark.implicits._
    import org.apache.spark.sql.{Encoder, Encoders}
    val ds = Schema.lineitemDs(spark, sf)
    val sumQty = new org.apache.spark.sql.expressions.Aggregator[Schema.Lineitem, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: Schema.Lineitem): Long = b + a.l_quantity.toLong
      def merge(x: Long, y: Long): Long = x + y
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }.toColumn
    val typedAgg = ds.groupByKey(_.l_returnflag)
      .agg(sumQty)
      .toDF("l_returnflag", "qty")
    val untyped = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(sum(col("l_quantity").cast("long")).as("qty"))
    assert(typedAgg.exceptAll(untyped).count() == 0)
    assert(untyped.exceptAll(typedAgg).count() == 0)
  }

  test("typed filter + map keeps schema") {
    import spark.implicits._
    val big = Schema.ordersDs(spark, sf)
      .filter(_.o_totalprice > 100000.0)
      .map(o => (o.o_orderkey, o.o_totalprice))
      .toDF("k", "v")
    assert(big.count() ==
      Tables.orders(spark, sf).filter(col("o_totalprice") > 100000.0).count())
  }
}
