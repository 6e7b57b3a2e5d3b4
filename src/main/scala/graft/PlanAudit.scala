package graft

import org.apache.spark.sql.SparkSession

/** Prints a red-flag audit of every registered query's physical plan:
  * cartesian/nested-loop joins, exchange counts, parquet pushdown.
  * Run: sbt "runMain graft.PlanAudit [sfDir]" — review before a round.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BcastNLJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "NoPushedFilters" -> (plan.contains("PushedFilters: []") &&
            plan.contains("Filter (")),
        ).collect { case (f, true) => f }
        val nEx = "Exchange".r.findAllIn(plan).size
        val nBr = "BroadcastExchange".r.findAllIn(plan).size
        println(f"[audit] $name%-22s exchanges=${nEx - nBr}%2d broadcasts=$nBr%2d " +
          (if (flags.isEmpty) "ok" else "FLAGS: " + flags.mkString(",")))
      } catch { case e: Throwable =>
        println(s"[audit] $name ERROR ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
