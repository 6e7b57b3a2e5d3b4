package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Round 12: capacity/vocabulary edges — d15's auto-sized SpaceSaving
  * capacity must keep the sketch in its exact regime on corpora whose
  * vocabulary breaks any fixed constant. */
class Round12Spec extends SparkSpec {

  test("d15 auto-capacity: exact vs plain GROUP BY on a >1024-word per-lang vocabulary") {
    import spark.implicits._
    // 3000 distinct words in one lang — far past the old 1024 constant
    // (which silently left the exact regime on exactly this shape at a
    // 40× synthesized corpus); repetition pattern makes counts non-flat
    val docs = (0 until 3000).map { i =>
      val reps = 1 + (i % 7)
      ("en", (Seq.fill(reps)(s"w$i") :+ s"w${i % 50}").mkString(" "))
    } ++ Seq(("es", "uno dos dos tres tres tres"))
    val df = docs.toDF("lang", "text")
    val got = TextFns.heavyTokensOf(df)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val exact = df
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang", "w").agg(count(lit(1)).as("n"))
      .orderBy("lang", "w")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(exact.exists(_._1 == "en") && exact.count(_._1 == "en") == 3000,
      "fixture rot: expected 3000 distinct en tokens")
    assert(got == exact,
      "auto-sized SpaceSaving left the exact regime — capacity probe under-sized")
  }

  test("q55 skew join: salt stays in the shuffle-join keys, no broadcast; rows == plain unsalted join") {
    import graft.operators.SkewOps
    val df = SkewOps.skewJoinDemo(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim side got broadcast — the salted-shuffle demo never engaged:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled join strategy:\n$plan")
    assert(plan.contains("_salt"),
      s"salt column missing from the executed plan's join keys:\n$plan")

    // row parity vs the plain unsalted join (salt draw is nondeterministic
    // per row; the joined row SET must not depend on it)
    val li = Tables.lineitem(spark, sf).select(
      when(pmod(col("l_orderkey"), lit(10)) < 7, lit(0L))
        .otherwise(col("l_orderkey")).as("jk"),
      col("l_orderkey"), col("l_linenumber"))
    val co = Tables.orders(spark, sf).select(
      when(pmod(col("o_orderkey"), lit(10)) < 7, lit(0L))
        .otherwise(col("o_orderkey")).as("jk"),
      col("o_totalprice"))
      .groupBy("jk")
      .agg(count(lit(1)).as("cohort_orders"),
        graft.operators.Relational.dsum(col("o_totalprice")).as("cohort_value"))
    val plain = li.join(co, "jk")
      .select("jk", "l_orderkey", "l_linenumber", "cohort_orders", "cohort_value")
      .orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.toSeq)
    val salted = df.collect().map(_.toSeq)
    assert(salted.nonEmpty && salted.toSeq == plain.toSeq,
      "salted join row set diverged from the plain join")
    // the hot key really is hot: ~70% of fact rows on jk = 0
    val hotFrac = salted.count(_.head == 0L).toDouble / salted.length
    assert(hotFrac > 0.6 && hotFrac < 0.8, s"hot fraction $hotFrac out of band")
  }

  // ---- q28 streaming twin -------------------------------------------------

  private def batchVerts(): Seq[(Long, Long, java.sql.Timestamp, Double, Double, Double)] =
    graft.operators.TimeSeries.verticalsOf(Tables.events(spark, sf))
      .select("event_id", "user_id", "ts", "net", "o", "avg_r")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1).toSeq

  private def runVertStream(
      chunks: Seq[Seq[graft.streaming.EventStream.Tick]],
      lateness: java.time.Duration, queryName: String): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[EventStream.Tick]
    val q = EventStream.verticalsStream(input.toDS(), lateness).toDF()
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName(queryName).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
  }

  private def collectVerts(queryName: String): Seq[(Long, Long, java.sql.Timestamp, Double, Double, Double)] =
    spark.table(queryName)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1).toSeq

  private def withRocksDb(body: => Unit): Unit = {
    val k = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  private def vertTicks(): Seq[graft.streaming.EventStream.Tick] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.EventStream.Tick].collect().toSeq
  }

  private def flushTicks(ticks: Seq[graft.streaming.EventStream.Tick]) =
    ticks.map(_.user_id).distinct.map(u =>
      graft.streaming.EventStream.Tick(-1L,
        new java.sql.Timestamp(4102444800000L), u, "flush", 0.0))

  private def urlStreamFinal(table: String): Map[Long, (String, String, String, Long, Boolean)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getBoolean(5)))
      .groupBy(_._1)
      // n_dups is strictly monotone per key, so the max-n row IS the
      // latest emission for the doc (the documented consumer contract)
      .map { case (id, rows) =>
        val last = rows.maxBy(_._5)
        id -> ((last._2, last._3, last._4, last._5, last._6))
      }

  test("urlFilterStream: shuffled micro-batch replay == batch urlFilterOf; canonical handoff corrects") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sc = spark.sqlContext
      val batchIn = graft.operators.Curation.withUrls(
        Tables.documents(spark, sf).select("doc_id", "source"))
      val want = graft.operators.Curation.urlFilterOf(batchIn,
          graft.operators.Curation.UrlBlocklist).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4), r.getBoolean(5)))).toMap
      // deterministic shuffle: min-doc canonicals arrive in arbitrary
      // positions, so later batches must demote earlier winners
      val rows = batchIn.collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy { case (id, _) => graft.sources.TickSource.mix(7L, id) }.toSeq
      val third = rows.size / 3
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.UrlStream.urlFilterStream(
          input.toDS().toDF("doc_id", "url"),
          graft.operators.Curation.UrlBlocklist).toDF()
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .format("memory").queryName("url_stream").start()
      input.addData(rows.take(third)); q.processAllAvailable()
      input.addData(rows.slice(third, 2 * third)); q.processAllAvailable()
      input.addData(rows.drop(2 * third)); q.processAllAvailable()
      q.stop()
      val got = urlStreamFinal("url_stream")
      assert(want.nonEmpty && got.size == want.size,
        s"row count: got ${got.size}, want ${want.size}")
      assert(got == want, "streamed final state != batch urlFilterOf")
      // the correction actually happened: some doc was emitted keep=true
      // in an early batch and is keep=false in the final state
      val all = spark.table("url_stream").collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5)))
      val demoted = all.exists { case (id, n, keep) =>
        keep && !got(id)._5 && n < got(id)._4
      }
      assert(demoted,
        "shuffle never exercised a canonical handoff — fixture too weak")
    }
  }

  test("verticalsStream: ARBITRARY arrival order + flush == batch q28 rows byte-exact") {
    withRocksDb {
      // deterministic full shuffle — every per-key ordering violated;
      // a huge lateness buffers everything until the flush settles it
      val ticks = vertTicks().sortBy(t => graft.sources.TickSource.mix(42L, t.event_id))
      runVertStream(
        Seq(ticks.take(ticks.size / 2), ticks.drop(ticks.size / 2), flushTicks(ticks)),
        java.time.Duration.ofDays(3650), "verts_shuffled")
      val got = collectVerts("verts_shuffled")
      val want = batchVerts()
      assert(want.nonEmpty, "batch fixture produced no rows — fixture rot")
      assert(got == want, s"streamed rows != batch rows (got ${got.size}, want ${want.size})")
    }
  }

  test("verticalsStream: in-order chunks settle INCREMENTALLY (rows emit before the flush), final parity holds") {
    withRocksDb {
      import graft.streaming.EventStream
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sc = spark.sqlContext
      val ticks = vertTicks().sortBy(t => (t.ts.getTime, t.event_id))
      val third = ticks.size / 3
      val input = MemoryStream[EventStream.Tick]
      val q = EventStream.verticalsStream(input.toDS(),
        java.time.Duration.ofMinutes(10)).toDF()
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .format("memory").queryName("verts_inorder").start()
      input.addData(ticks.take(third)); q.processAllAvailable()
      input.addData(ticks.slice(third, 2 * third)); q.processAllAvailable()
      val beforeFlush = spark.table("verts_inorder").count()
      input.addData(ticks.drop(2 * third)); q.processAllAvailable()
      input.addData(flushTicks(ticks)); q.processAllAvailable()
      q.stop()
      assert(beforeFlush > 0,
        "no rows settled before the flush — the frontier never advanced")
      assert(collectVerts("verts_inorder") == batchVerts())
    }
  }
}
