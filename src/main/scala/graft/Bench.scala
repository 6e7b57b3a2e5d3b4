package graft
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at the target scale
  * factor and prints one JSON line.
  *
  * Queries run with modest concurrency (8 in flight, override with
  * SPARK_GRAFT_BENCH_CONC): Spark's scheduler is built for concurrent
  * jobs, and the suite wall-clock is the honest single-node throughput
  * number — serial execution mostly measures 71× per-query
  * planning/codegen latency, not engine throughput. `value` =
  * wall-clock seconds for the whole suite; per-query numbers are
  * individual latencies as observed under that concurrency (they
  * inflate with queueing — compare plan shapes, not these, across
  * concurrency settings).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // FAIR task scheduling: concurrent queries' small stages would
      // otherwise queue FIFO behind any core-saturating stage,
      // serializing the suite (head-of-line blocking dominated the wall
      // once iterative entries joined the roster).
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup: executor threads, codegen compiler, parquet
    // footer reads — so init cost isn't billed to the first query.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    val pool = Executors.newFixedThreadPool(sys.env.getOrElse("SPARK_GRAFT_BENCH_CONC", "8").toInt)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val wall0 = System.nanoTime()
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      Future {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf)
    val wall = (System.nanoTime() - wall0) / 1e9
    pool.shutdown()
    // A failed query reports -1, never a wall-clock that looks like a pass.
    val qs = results.map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // The wall is repeated as the LAST field: the driver captures the tail
    // of long lines, and the headline number must survive truncation.
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","wall":$wall}""")
    spark.stop()
  }
}
