package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability mirroring the reference's monitor/controller services
  * (services/schwab_stream_monitor.py: tick-count watchdog;
  * schwab_stream_controller.py: reconnect with backoff).
  */
object Monitoring {

  case class QueryMetric(name: String, durationMs: Long, outputRows: Long,
      failed: Boolean, error: String)

  /** QueryExecutionListener collecting per-action metrics in memory
    * (in prod: emit to the metrics sink). Register once per session. */
  class MetricsListener extends QueryExecutionListener {
    val metrics = new ConcurrentLinkedQueue[QueryMetric]()
    private def rows(qe: QueryExecution): Long =
      try qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      catch { case _: Throwable => -1L }
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      metrics.add(QueryMetric(funcName, durationNs / 1000000L, rows(qe), failed = false, ""))
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      metrics.add(QueryMetric(funcName, -1L, -1L, failed = true, String.valueOf(e.getMessage)))
    def drain(): Seq[QueryMetric] = {
      val out = Vector.newBuilder[QueryMetric]
      var m = metrics.poll()
      while (m != null) { out += m; m = metrics.poll() }
      out.result()
    }
  }

  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }

  /** Metrics sink for the streaming IVF maintenance loop: records each
    * micro-batch's drift gauge (EventStream.ivfAppendStream's `onDrift`
    * hook) against the index generation's BASELINE and latches
    * [[graft.operators.Similarity.shouldRecluster]] — the stream-side
    * face of the evidence-driven re-cluster trigger. The maintenance
    * loop polls `tripped` and, when set, runs reclusterIvfIndex into a
    * new generation and swaps readers (then starts a fresh tracker
    * against the new baseline). Thread-safe: `record` runs on the
    * stream execution thread, readers on the maintenance thread.
    */
  class IvfDriftTracker(baseline: graft.operators.Similarity.IvfDrift,
      maxDistRatio: Double = 1.5, maxSkew: Double = 4.0) {
    private val history = new ConcurrentLinkedQueue[graft.operators.Similarity.IvfDrift]()
    @volatile private var trippedFlag = false
    def record(d: graft.operators.Similarity.IvfDrift): Unit = {
      history.add(d)
      if (graft.operators.Similarity.shouldRecluster(baseline, d, maxDistRatio, maxSkew))
        trippedFlag = true
    }
    /** Latched: once any batch's gauge crosses the threshold, stays set
      * until a new tracker (= new index generation) replaces this one. */
    def tripped: Boolean = trippedFlag
    def drain(): Seq[graft.operators.Similarity.IvfDrift] = {
      val out = Vector.newBuilder[graft.operators.Similarity.IvfDrift]
      var d = history.poll()
      while (d != null) { out += d; d = history.poll() }
      out.result()
    }
  }

  /** One sink's freshness gauge at poll time.
    * @param lastCommitAgeMs wall-clock since the sink last committed a
    *   micro-batch into its store (-1: never committed)
    * @param eventLagMs wall-clock minus the max committed event time
    *   (-1: the sink's rows carry no event-time column)
    * @param stale this poll's verdict against the thresholds
    */
  case class SinkFreshness(sink: String, lastCommitAgeMs: Long,
      eventLagMs: Long, stale: Boolean)

  /** Per-sink staleness monitor for the graft streaming sinks — the
    * reference's data-freshness watchdog re-expressed for Structured
    * Streaming (services/schwab_stream_monitor.py:52 check_redis /
    * :101 check_parquet: "data updated within N seconds?" per store,
    * alert only on TWO consecutive violating polls, clear on fresh).
    *
    * Sinks `record` at the end of each successful foreachBatch commit
    * — the gauge tracks the persisted STORE's freshness (the authority
    * all graft sinks anti-join against), not raw input arrival, exactly
    * like the reference monitors the landed parquet/redis rows rather
    * than the feed. A monitor thread calls `poll()` on its interval:
    * a sink is stale when its last commit is older than
    * `maxCommitAgeMs` OR its max committed event time lags wall clock
    * by more than `maxEventLagMs` (sinks without an event-time column
    * gauge commit age only). `poll()` returns true — trip the alert —
    * only when a violation repeats on consecutive polls (the
    * reference's two-in-a-row email debounce), then re-arms; a fresh
    * poll clears the pending violation.
    *
    * Like the reference watchdog, the gauges assume a CONTINUOUSLY
    * FLOWING feed: commit age and event lag are both measured against
    * wall clock, so a healthy-but-idle source is indistinguishable
    * from a wedged stream once the quiet stretch outlasts the bounds.
    * Size `maxCommitAgeMs` / `maxEventLagMs` above the feed's longest
    * expected quiet gap (market-closed windows etc.), or gate the
    * monitor off outside trading sessions the way the reference's cron
    * does. The StreamController stamps [[reset]] on every restart so a
    * quiet feed at least gets a full grace window per attempt instead
    * of hot-looping the restart budget away.
    *
    * Thread-safe: `record` runs on stream execution threads, `poll` on
    * the monitor thread. `clock` is injectable for tests.
    */
  class FreshnessMonitor(maxCommitAgeMs: Long, maxEventLagMs: Long = Long.MaxValue,
      clock: () => Long = () => System.currentTimeMillis()) {
    private case class SinkState(lastCommitMs: Long, maxEventMs: Option[Long])
    private val sinks = scala.collection.mutable.LinkedHashMap.empty[String, SinkState]
    private var pendingViolation = false

    /** Register a sink so it gauges (as never-committed → stale) from
      * stream start, not from its first commit. */
    def register(sink: String): Unit = synchronized {
      if (!sinks.contains(sink)) sinks += sink -> SinkState(-1L, None)
    }

    /** Record a committed micro-batch. `batchMaxEventMs`: max event
      * time (epoch ms) among the batch's committed rows, None for
      * event-timeless sinks or empty batches (an empty batch still
      * proves the sink ALIVE — commit age resets, event lag doesn't). */
    def record(sink: String, batchMaxEventMs: Option[Long] = None): Unit = synchronized {
      recordCommit(sink, batchMaxEventMs)
    }

    /** Synthetic commit — the StreamController stamps this when it
      * restarts a stream, granting the restarted run a full
      * `maxCommitAgeMs` grace window before it can gauge stale again
      * (without it a quiet feed restarts every other poll: the restart
      * itself never resets the store's gauge because no data flowed). */
    def reset(sink: String): Unit = synchronized { recordCommit(sink, None) }

    private def recordCommit(sink: String, batchMaxEventMs: Option[Long]): Unit = {
      val prev = sinks.get(sink)
      val maxEv = (prev.flatMap(_.maxEventMs).toSeq ++ batchMaxEventMs.toSeq)
        .reduceOption(_ max _)
      sinks += sink -> SinkState(clock(), maxEv)
    }

    /** Per-sink gauges at this instant (no debounce state touched). */
    def gauges(): Seq[SinkFreshness] = synchronized {
      val now = clock()
      sinks.map { case (name, st) =>
        val commitAge = if (st.lastCommitMs < 0) -1L else now - st.lastCommitMs
        val evLag = st.maxEventMs.map(now - _).getOrElse(-1L)
        val stale = commitAge < 0 || commitAge > maxCommitAgeMs ||
          (evLag >= 0 && evLag > maxEventLagMs)
        SinkFreshness(name, commitAge, evLag, stale)
      }.toSeq
    }

    /** One monitor tick. Returns true when the alert should fire:
      * any-sink staleness on two CONSECUTIVE polls (then re-arms). */
    def poll(): Boolean = synchronized {
      val violation = gauges().exists(_.stale)
      val fire = violation && pendingViolation
      pendingViolation = violation && !fire
      fire
    }

    /** The reference's single-line report, one entry per sink. */
    def report(): String = gauges().map { g =>
      s"${g.sink} -> commit_age=${g.lastCommitAgeMs}ms event_lag=${g.eventLagMs}ms " +
        s"${if (g.stale) "STALE" else "fresh"}"
    }.mkString(" | ")
  }

  /** The reference controller's service loop for Structured Streaming
    * sinks (services/schwab_stream_controller.py:248-262: per check
    * interval, restart a service that CRASHED; the freshness monitor
    * rides alongside and flags WEDGED-but-alive services). Each stream
    * is registered with a FACTORY — how to (re)start it against the
    * SAME checkpoint location, so a restart resumes exactly where the
    * dead query stopped, and the graft sinks' replay idempotence
    * absorbs any at-least-once re-delivery across the restart.
    *
    * `tick()` (call it on the controller's poll interval) restarts a
    * stream when its query is no longer active (crash/wedge-kill) or
    * when the freshness monitor fires its two-poll staleness alert and
    * the stream's sink gauges stale — stop-then-factory, the
    * controller's systemctl stop/start pair. A stream that exhausts
    * `maxRestarts` is left down and reported on every subsequent tick
    * (the reference pages the operator rather than hot-looping a
    * broken service). Single-threaded by design: call tick from ONE
    * monitor thread.
    */
  class StreamController(monitor: Option[FreshnessMonitor] = None,
      maxRestarts: Int = 3) {
    import org.apache.spark.sql.streaming.StreamingQuery
    private case class Entry(name: String, sink: Option[String],
        factory: () => StreamingQuery, var q: StreamingQuery,
        var restarts: Int, var givenUp: Boolean)
    private val entries = scala.collection.mutable.LinkedHashMap.empty[String, Entry]

    /** Start (via the factory) and manage a stream. `sinkKey` links the
      * stream to its FreshnessMonitor sink (the store path the sink
      * registered) so a staleness alert restarts the right stream. */
    def register(name: String, factory: () => StreamingQuery,
        sinkKey: Option[String] = None): StreamingQuery = synchronized {
      val q = factory()
      entries += name -> Entry(name, sinkKey, factory, q, 0, givenUp = false)
      q
    }

    def query(name: String): Option[org.apache.spark.sql.streaming.StreamingQuery] =
      synchronized(entries.get(name).map(_.q))

    /** One controller pass; returns the actions taken (for the log). */
    def tick(): Seq[String] = synchronized {
      val fired = monitor.exists(_.poll())
      val staleSinks: Set[String] =
        if (fired) monitor.get.gauges().filter(_.stale).map(_.sink).toSet
        else Set.empty
      entries.values.toSeq.flatMap { e =>
        val crashed = !e.q.isActive
        val stale = fired && e.sink.exists(staleSinks.contains)
        if (e.givenUp) Seq(s"down ${e.name} (gave up after ${e.restarts} restarts)")
        else if (crashed || stale) {
          val why = if (crashed) "crashed" else "stale"
          try e.q.stop() catch { case _: Throwable => () }
          if (e.restarts < maxRestarts) {
            e.q = e.factory()
            e.restarts += 1
            // full grace window for the restarted run — else a quiet
            // feed's gauge is still stale next poll and the controller
            // hot-loops restarts into the give-up budget
            for (m <- monitor; s <- e.sink) m.reset(s)
            Seq(s"restarted ${e.name} ($why, attempt ${e.restarts})")
          } else {
            e.givenUp = true
            Seq(s"gave up ${e.name} ($why after $maxRestarts restarts)")
          }
        } else Nil
      }
    }

    def stopAll(): Unit = synchronized {
      entries.values.foreach(e => try e.q.stop() catch { case _: Throwable => () })
    }
  }

  /** Run a (streaming or batch) body with restart-on-failure + linear
    * backoff — the stream controller's reconnect loop. Returns the
    * number of attempts used; rethrows after maxRestarts failures.
    */
  def runWithRestarts[T](maxRestarts: Int, backoffMs: Long)(body: => T): (T, Int) = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= maxRestarts) {
      try {
        return (body, attempt + 1)
      } catch {
        case e: Throwable =>
          last = e
          attempt += 1
          if (attempt <= maxRestarts) Thread.sleep(backoffMs * attempt)
      }
    }
    throw last
  }
}
