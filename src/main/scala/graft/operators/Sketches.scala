package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-based profiling — the mergeable-summary operators a 100 TB
  * pipeline uses where exact answers would need a full shuffle of raw
  * values: HyperLogLog++ distinct counts and approximate quantiles.
  * Both are map-side mergeable: each partition emits a constant-size
  * sketch, the exchange moves sketches not rows. rows-only oracle
  * (approx results are engine-specific by design; the spec checks
  * error bounds against exact answers instead).
  */
object Sketches {

  /** d13: per-event-type profile: exact count, HLL distinct users
    * (rsd 1%), p50/p90/p99 of value. Quantiles projected to scalar
    * columns (not an array) so downstream row-comparison tooling can
    * sort on them. */
  def sketchProfile(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(10000)).as("vq"))
      .select(col("event_type"), col("n_events"), col("approx_users"),
        col("vq").getItem(0).as("p50"),
        col("vq").getItem(1).as("p90"),
        col("vq").getItem(2).as("p99"))
      .orderBy("event_type")
}
