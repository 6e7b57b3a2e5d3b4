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

  test("transformWithState latestPerKeyTtl (no TTL) matches the batch latest-per-key and settles") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Tick].collect().toSeq
      def run(ttl: Option[java.time.Duration], name: String) = {
        val input = MemoryStream[Tick]
        input.addData(batch)
        EventStream.runToMemory(
          EventStream.latestPerKeyTtl(input.toDS(), ttl).toDF(), name, OutputMode.Update)
        spark.table(name)
          .groupBy("user_id").agg(max(struct(col("ts"), col("value"))).as("s"))
          .select(col("user_id"), col("s.ts").as("ts"), col("s.value").as("value"))
      }
      val want = SparkEntry.queries("q11_latest_per_key")(spark, sf)
        .select(col("user_id"), col("ts"), col("value").as("w_value"))
      // no TTL (TimeMode.None): exact parity with the batch
      // latest-per-key, and processAllAvailable settles
      val got = run(None, "tws_latest_out")
      val j = got.join(want, Seq("user_id", "ts"), "full_outer")
      assert(j.filter(col("value").isNull || col("w_value").isNull).count() == 0)
      assert(j.filter(col("value") =!= col("w_value")).count() == 0)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState TTL: an idle key's state ages out of the store (poll-and-stop — PT mode never settles)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Tick]
      val q = EventStream.latestPerKeyTtl(input.toDS(),
          Some(java.time.Duration.ofMillis(500))).toDF()
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .format("memory").queryName("tws_ttl_out").start()
      def lastSeen(ts: java.sql.Timestamp): Option[Long] = {
        val r = spark.table("tws_ttl_out").filter(col("user_id") === 7 && col("ts") === ts)
          .select("n_seen").collect()
        r.lastOption.map(_.getLong(0))
      }
      def await(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(cond, "condition not reached within 30s")
      }
      input.addData(Tick(1L, ts("2024-01-10 10:00:00"), 7L, "view", 1.0))
      await(lastSeen(ts("2024-01-10 10:00:00")).contains(1L))
      Thread.sleep(2000) // >> 500ms TTL: the value ages out of the store
      input.addData(Tick(2L, ts("2024-01-10 10:05:00"), 7L, "view", 2.0))
      // state was absent again, so n_seen restarted at 1 (not 2) — the
      // store-native expiry, no timers, no eviction re-emission
      await(lastSeen(ts("2024-01-10 10:05:00")).contains(1L))
      q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming funnel under fully reversed arrival matches batch q42 step counts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // reversed event time = the adversarial arrival order: every
      // earlier click arrives AFTER the views it must re-qualify
      val ticks = Tables.events(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[Tick].collect().toSeq.sortBy(t => (t.ts.getTime, t.event_id)).reverse
      val input = MemoryStream[Tick]
      val q = EventStream.funnelStream(input.toDS()).toDF()
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .format("memory").queryName("funnel_out").start()
      val third = ticks.size / 3
      Seq(ticks.take(third), ticks.slice(third, 2 * third), ticks.drop(2 * third))
        .foreach { c => input.addData(c); q.processAllAvailable() }
      q.stop()
      // refinement is monotone ↓ per component, so the final state per
      // user is the componentwise min over its emitted rows (min skips
      // nulls; a component never reverts to null once set)
      val fin = spark.table("funnel_out").groupBy("user_id")
        .agg(min("tc").as("tc"), min("tv").as("tv"), min("tp").as("tp"))
      val got = fin.agg(
        count(col("tc")).as("n_step1"),
        count(col("tv")).as("n_step2"),
        count(col("tp")).as("n_step3")).head()
      val want = SparkEntry.queries("q42_funnel")(spark, sf).head()
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
             (want.getLong(0), want.getLong(1), want.getLong(2)),
        s"streaming funnel $got != batch $want")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup-insert: re-delivered micro-batches + restart land exactly the batch q2 rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val ev = Tables.events(spark, sf)
    // q2's staging input (pre-guard) and its static old-historic guard
    val staged = ev.filter(col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp"))
      .select(cols.map(col): _*)
      .as[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .collect().toSeq.sortBy(_._1)
    val oldHistoric = ev.filter(col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
      .select("user_id", "event_type")
    val base = java.nio.file.Files.createTempDirectory("graft_hist").toString
    val n = staged.size
    def runChunks(chunks: Seq[Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]],
        ckpt: String): Unit = {
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
      // stream-static anti join = q2's NOT EXISTS vs the old historic
      val guarded = input.toDF().toDF(cols: _*)
        .join(oldHistoric, Seq("user_id", "event_type"), "left_anti")
      val q = EventStream.dedupInsertStream(guarded, s"$base/data", ckpt, Seq("event_id"))
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      q.stop()
    }
    // run 1: two micro-batches with heavy re-delivery overlap
    runChunks(Seq(staged.take(n / 2), staged.slice(n / 4, 3 * n / 4)), s"$base/ckpt1")
    // "restart": a NEW query (fresh checkpoint, fresh source) over the
    // SAME historic table — replays already-landed rows plus the tail.
    // The table, not the checkpoint, must be the dedup authority.
    runChunks(Seq(staged.slice(n / 2, n), staged), s"$base/ckpt2")
    val got = spark.read.parquet(s"$base/data").select(cols.map(col): _*)
    val want = SparkEntry.queries("q2_dedup_insert")(spark, sf)
    assert(got.count() == want.count(), s"rows ${got.count()} vs batch ${want.count()}")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "streamed historic content must equal the batch q2 result exactly")
  }

  test("silverSeries: a mark arriving behind the watermark is dropped; its window finalizes once without it") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val sym = "SPX   240119C00125000" // valid fixed-width OCC symbol
    def t(s: String) = ts(s"2024-01-10 $s")
    val input = MemoryStream[(String, String, Double, java.sql.Timestamp)]
    val streamDf = input.toDF().toDF("symbol", "source", "mark", "ts")
    // Append mode: a (contract, minute) window emits exactly once, when
    // the watermark passes its end — the documented finalize-then-drop
    // semantics under late data.
    val q = EventStream.silverSeries(streamDf)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("silver_late_out").start()
    // on-time marks in the 18:00 minute (10:00 PST — inside the gate)
    input.addData(Seq((sym, "purchase", 10.0, t("18:00:10")),
      (sym, "view", 99.0, t("18:00:20"))))
    q.processAllAvailable()
    // advance event time: watermark (10 min delay) moves to 18:20 after
    // this batch, putting the 18:00 window past its horizon
    input.addData(Seq((sym, "purchase", 5.0, t("18:30:00"))))
    q.processAllAvailable()
    // LATE: 18:00-minute mark behind the watermark — must be dropped,
    // in the same batch the finalized 18:00 window is emitted
    input.addData(Seq((sym, "purchase", 500.0, t("18:00:30"))))
    q.processAllAvailable()
    // push the watermark further: no re-emission of the 18:00 window
    input.addData(Seq((sym, "view", 1.0, t("18:40:00"))))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("silver_late_out").filter(col("t") === t("18:00:00"))
    assert(out.count() == 1, "finalized window must emit exactly once")
    val r = out.select("best_rank", "mark", "n_obs").head()
    assert(r.getInt(0) == 1 && r.getDouble(1) == 10.0 && r.getLong(2) == 2L,
      s"late mark leaked into the finalized window: $r")
  }
}
