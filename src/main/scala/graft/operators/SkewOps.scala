package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §5). AQE's skew-join handles most
  * runtime skew; these are the explicit-salting forms for the cases AQE
  * can't re-plan: skewed AGGREGATION keys and broadcast-ineligible
  * skewed joins with a known hot-key set.
  */
object SkewOps {

  /** Two-phase salted aggregation: partial agg on (key, salt) spreads a
    * hot key over `buckets` reducers, final agg merges the partials.
    * sumCols/countCols name the measures; result = groupBy(key).agg(
    * sum(sumCols), sum of counts).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id()
      + pmod(hash(col(key), monotonically_increasing_id()), lit(buckets)), lit(buckets)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("cnt"))
  }

  /** Hot-key replicated join: rows of `facts` whose key is in `hotKeys`
    * get a random salt in [0, buckets); the dim side is exploded
    * `buckets`× for those keys so every salted fact partition finds its
    * match. Non-hot keys join 1:1 (salt 0). Correct for inner joins on
    * distinct dim keys.
    */
  def skewJoin(facts: DataFrame, dim: DataFrame, key: String,
      hotKeys: Seq[Long], buckets: Int): DataFrame = {
    val hot = hotKeys.toArray
    val isHotF = col(key).isin(hot: _*)
    val saltedFacts = facts.withColumn("_salt",
      when(isHotF, pmod(hash(monotonically_increasing_id()), lit(buckets))).otherwise(lit(0)))
    val isHotD = col(key).isin(hot: _*)
    val saltedDim = dim
      .withColumn("_salts",
        when(isHotD, sequence(lit(0), lit(buckets - 1))).otherwise(array(lit(0))))
      .withColumn("_salt", explode(col("_salts"))).drop("_salts")
    saltedFacts.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
