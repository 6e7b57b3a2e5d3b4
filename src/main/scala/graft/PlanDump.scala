package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` of one registered query to a file —
  * the before/after plan evidence for optimization rounds.
  * Run: sbt "runMain graft.PlanDump <query> <outFile> [sfDir]".
  * Pass a comma-separated list of queries with outFile as a directory
  * to dump several in one JVM (out = dir/<query>.txt).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <query[,query...]> <outFileOrDir> [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val out = args(1)
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val multi = names.size > 1
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val txt = fn(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val path = if (multi) s"$out/$name.txt" else out
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"[plandump] $name -> $path")
    }
    spark.stop()
  }
}
