package graft

import org.apache.spark.sql.SparkSession

/** Single-query probe: runs ONE registered query twice (cold + warm),
  * prints both times, the row count, and the executed plan's join/
  * exchange skeleton. The per-operator iteration tool — Bench measures
  * the suite, WarmBench the whole roster; this is for drilling into one
  * hotspot. Run:
  *   sbt "runMain graft.QProbe d19_jaccard_lsh [sfDir]"
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_MAX_PART_BYTES: shrink scan splits below the single-file
    // size so a bounded-row-group dir (Amplify arg 4) actually fans a
    // scan across tasks — row group = the split atom, but Spark also
    // needs maxPartitionBytes under the file size to cut ranges
    sys.env.get("GRAFT_MAX_PART_BYTES").foreach(v =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", v))
    // parse-only probe names (q49_parse/q53_parse) resolve through
    // ParseProbes: scaffold payloads are materialized OUTSIDE the
    // timed section, so the probe measures parse, not generation
    val fn0: () => org.apache.spark.sql.DataFrame =
      if (ParseProbes.names.contains(name)) ParseProbes.prepare(spark, d, Seq(name))(name)
      else () => SparkEntry.queries(name)(spark, d)
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = fn0().count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, rows) = once()
    val (warm, _) = once()
    println(f"[probe] $name cold=$cold%.2f s warm=$warm%.2f s rows=$rows")
    val plan = fn0().queryExecution.executedPlan.toString
    plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Aggregate") || l.contains("Sort ") || l.contains("Window"))
      .foreach(l => println("[plan] " + l.trim.take(160)))
    spark.stop()
  }
}
