package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.Tick

/** Streaming twins: windowed agg parity with the batch q21, and
  * stateful latest-per-key parity with batch q11. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedAgg over a bounded stream matches the batch q21 on the same data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val batch = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Tick].collect().toSeq
    val input = MemoryStream[Tick]
    input.addData(batch)
    val streamDf = input.toDF().withColumn("props", lit("{}"))
    EventStream.runToMemory(EventStream.windowedAgg(streamDf), "win_out", OutputMode.Complete)
    val got = spark.table("win_out")
      .withColumnRenamed("n_events", "s_n").withColumnRenamed("total_value", "s_tv")
    val want = SparkEntry.queries("q21_window_agg_time")(spark, sf)
    val joined = got.join(want, Seq("ws", "event_type"), "full_outer")
    assert(joined.filter(col("s_n").isNull || col("n_events").isNull).count() == 0,
      "stream and batch window sets differ")
    // counts must agree exactly; sums agree to double tolerance
    assert(joined.filter(col("s_n") =!= col("n_events")).count() == 0)
    assert(joined.filter(abs(col("s_tv") - col("total_value")) > 1e-6).count() == 0)
  }

  test("file-source streaming: readStream over a parquet dir drains through windowedAgg") {
    // stage events as a parquet "landing zone" the stream tails
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(graft.streaming.EventStream.schema)
      .parquet(dir)
    EventStream.runToMemory(EventStream.windowedAgg(stream), "file_win_out", OutputMode.Complete)
    val got = spark.table("file_win_out")
    val wantRows = SparkEntry.queries("q21_window_agg_time")(spark, sf).count()
    assert(got.count() == wantRows)
  }

  test("stream-stream interval join matches the batch range join on the same data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val ticks = ev.as[Tick].collect().toSeq
    val tIn = MemoryStream[Tick]; tIn.addData(ticks.filter(_.event_type == "purchase"))
    val qIn = MemoryStream[Tick]; qIn.addData(ticks.filter(_.event_type == "view"))
    val joined = EventStream.tradesWithRecentQuotes(tIn.toDF(), qIn.toDF())
    EventStream.runToMemory(joined, "ss_join_out", OutputMode.Append)
    val got = spark.table("ss_join_out")
    // batch equivalent
    val t = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("t_id"), $"user_id", $"ts".as("t_ts"))
    val q = ev.filter($"event_type" === "view")
      .select($"user_id".as("q_user"), $"ts".as("q_ts"))
    val want = t.join(q, $"user_id" === $"q_user" &&
      $"q_ts" <= $"t_ts" && $"q_ts" >= $"t_ts" - expr("interval 30 minutes")).count()
    assert(got.count() == want && want > 0)
  }

  test("stream lands into daily-partitioned parquet identical to batch landing") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ticks = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Tick].collect().toSeq
    val input = MemoryStream[Tick]
    input.addData(ticks)
    val base = java.nio.file.Files.createTempDirectory("graft_land").toString
    val q = EventStream.landToDailyParquet(input.toDF(), s"$base/data", s"$base/ckpt")
    q.processAllAvailable(); q.stop()
    val landed = spark.read.parquet(s"$base/data")
    assert(landed.count() == ticks.size)
    // day partition column exists and matches ts
    assert(landed.filter(to_date(col("ts")) =!= col("day")).count() == 0)
  }

  test("streaming dedup drops duplicate deliveries within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ticks = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Tick].collect().toSeq
    val input = MemoryStream[Tick]
    input.addData(ticks ++ ticks.take(500)) // re-deliver 500 events
    EventStream.runToMemory(
      EventStream.dedupStream(input.toDF().withColumn("props", lit("{}"))),
      "dedup_out", OutputMode.Append)
    assert(spark.table("dedup_out").count() == ticks.size)
  }

  test("streaming OHLC bars match batch q17 on the same ticks") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ticks = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Tick].collect().toSeq
    val input = MemoryStream[Tick]
    input.addData(ticks)
    // Complete mode so bars still inside the watermark horizon are
    // visible too — Append would rightly hold them open
    EventStream.runToMemory(
      EventStream.ohlcBars(input.toDF()), "ohlc_out", OutputMode.Complete)
    val got = spark.table("ohlc_out")
      .withColumnRenamed("open_v", "s_o").withColumnRenamed("high_v", "s_h")
      .withColumnRenamed("low_v", "s_l").withColumnRenamed("close_v", "s_c")
      .withColumnRenamed("n_ticks", "s_n")
    val want = SparkEntry.queries("q17_ohlc_bars")(spark, sf)
    val j = got.join(want, Seq("user_id", "bar"), "full_outer")
    assert(j.filter(col("s_n").isNull || col("n_ticks").isNull).count() == 0,
      "stream and batch bar sets differ")
    assert(j.filter(col("s_o") =!= col("open_v") || col("s_h") =!= col("high_v") ||
      col("s_l") =!= col("low_v") || col("s_c") =!= col("close_v") ||
      col("s_n") =!= col("n_ticks")).count() == 0)
  }

  test("latestPerKey state matches batch latest-per-key") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val batch = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Tick].collect().toSeq
    val input = MemoryStream[Tick]
    input.addData(batch)
    EventStream.runToMemory(
      EventStream.latestPerKey(input.toDS()).toDF(), "latest_out", OutputMode.Update)
    val got = spark.table("latest_out")
      .groupBy("user_id").agg(max(struct(col("ts"), col("value"))).as("s"))
      .select(col("user_id"), col("s.ts").as("ts"), col("s.value").as("value"))
    val want = SparkEntry.queries("q11_latest_per_key")(spark, sf)
      .select(col("user_id"), col("ts"), col("value").as("w_value"))
    val j = got.join(want, Seq("user_id", "ts"), "full_outer")
    assert(j.filter(col("value").isNull || col("w_value").isNull).count() == 0)
    assert(j.filter(col("value") =!= col("w_value")).count() == 0)
  }
}
