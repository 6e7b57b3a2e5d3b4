package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level frequency statistics a training-data pipeline reads
  * before (and after) curation: the dominant n-grams and the
  * vocabulary's coverage curve. Both are exact aggregations with SQL
  * twins, so they get the strong oracle gate.
  *
  * Reference analog: the profiling/summary queries of the reporting
  * layer (/root/reference/sql/opt.sql aggregate views) generalized to
  * corpus token statistics.
  */
object CorpusStats {

  /** d29: top-k word 3-grams corpus-wide. Scale shape: the gram
    * explode feeds a hash aggregation with map-side partial combine
    * (count per gram), and the top-k is a TakeOrdered over the partial
    * results — no global sort of the gram universe materializes.
    * Tie-break on the gram string keeps the cut deterministic. */
  def ngramTopK(s: SparkSession, d: String): DataFrame =
    ngramTopKOf(Tables.documents(s, d).select("doc_id", "text"), n = 3, k = 50)

  /** Core of [[ngramTopK]] over an explicit (doc_id, text) frame. */
  def ngramTopKOf(docs: DataFrame, n: Int, k: Int): DataFrame =
    Curation.explodedNgrams(docs, n)
      .groupBy("ng").agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("ng"))
      .limit(k)

  /** d30: vocabulary coverage (Zipf audit) — the top-k words with the
    * cumulative fraction of all corpus tokens they cover. Scale shape:
    * word counts partial-aggregate map-side; only the k surviving rows
    * enter the (single-partition, k-row) running-sum window, so the
    * global window never sees the full vocabulary. The total is one
    * scalar agg broadcast onto the k rows. */
  def vocabCoverage(s: SparkSession, d: String): DataFrame =
    vocabCoverageOf(Tables.documents(s, d).select("text"), k = 100)

  /** Core of [[vocabCoverage]] over any frame with a text column. */
  def vocabCoverageOf(docs: DataFrame, k: Int): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val counts = words.groupBy("w").agg(count(lit(1)).as("n_occ"))
    // token total as a narrow per-row map + scalar agg — NOT a second
    // pass through the explode+groupBy lineage (the two consumers of
    // `counts` would each re-run the full vocabulary aggregation; this
    // pass reads the same column but shuffles nothing)
    val total = docs.agg(
      sum(size(array_remove(split(col("text"), " "), "")).cast("long"))
        .as("total"))
    val top = counts.orderBy(col("n_occ").desc, col("w")).limit(k)
    // explicit ROWS frame: order keys are unique so RANGE would behave
    // identically, but ROWS pins the frame the DuckDB twin writes
    val ord = Window.orderBy(col("n_occ").desc, col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .select(
        row_number().over(Window.orderBy(col("n_occ").desc, col("w")))
          .cast("long").as("rnk"),
        col("w"), col("n_occ"),
        (sum(col("n_occ")).over(ord) / col("total")).as("cum_frac"))
      .orderBy("rnk")
  }
}
