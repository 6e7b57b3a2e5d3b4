package graft

import org.apache.spark.sql.SparkSession

/** Warm per-operator probe: runs every query serially TWICE and prints
  * the second-pass time — parquet footers, codegen classes, and JIT are
  * warm, so the number is the per-operator engine cost rather than
  * first-touch latency (the per-query floor that dominates Bench at
  * 100k-row scale). Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.WarmBench"
  */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // A crashing query must not masquerade as a fast warm pass: report
      // -1 (like Bench's errors contract) and print the failure.
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable => println(s"[warm] $name FAILED: ${e.getMessage}"); false
        }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val cold = once()
      val warm = once()
      println(f"[warm] $name%-24s cold=$cold%6.2f s warm=$warm%6.2f s")
      name -> warm
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val okSum = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    println(s"""{"metric":"warm_serial_sum","value":$okSum,"unit":"sec","queries":$qs,"errors":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
