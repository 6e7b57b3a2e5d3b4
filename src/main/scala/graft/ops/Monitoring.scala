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
