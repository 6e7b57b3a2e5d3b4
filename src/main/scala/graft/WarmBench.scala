package graft

import org.apache.spark.sql.SparkSession

/** Warm per-operator probe: runs each query serially — one cold pass,
  * then [[WarmReps]] warm passes — and reports the MIN warm time:
  * parquet footers, codegen classes, and JIT are warm, so the number is
  * the per-operator engine cost rather than first-touch latency (the
  * per-query floor that dominates Bench at 100k-row scale), and min-of-3
  * sheds one-off scheduling noise the way QProbe's cal probe does.
  * Optional first arg: comma-separated query-name filter (the 10×
  * per-entry probe list rides this). Run:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.WarmBench [q1,q2,...]"
  */
object WarmBench {
  val WarmReps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown query names: $unknown")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val roster = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = roster.map { case (name, fn) =>
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
      val warms = Seq.fill(WarmReps)(once())
      val warm = if (warms.exists(_ < 0)) -1.0 else warms.min
      println(f"[warm] $name%-24s cold=$cold%6.2f s warm(min of $WarmReps)=$warm%6.2f s")
      name -> warm
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val okSum = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }.mkString("[", ",", "]")
    println(s"""{"metric":"warm_serial_sum","value":$okSum,"unit":"sec","queries":$qs,"errors":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
