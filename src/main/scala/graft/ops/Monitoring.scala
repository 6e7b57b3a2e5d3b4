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
