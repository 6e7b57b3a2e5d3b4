package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources/sinks mirroring the reference's landing zones.
  *
  * Reference analogs: tools/parquet_writer.py (daily-rolled snappy
  * parquet: `quotes_YYYY-MM-DD.parquet`), SPX.SP_IMPORT_PARQUET (bulk
  * parquet → staging), and the CSV/JSON payload dumps. Re-expressed
  * Spark-native: hive-style date partitions instead of per-day files,
  * so at 100 TB the partition column prunes scans (`WHERE day = X`
  * never touches other days) and writers append atomically per
  * partition.
  */
object Sinks {

  /** Append a timestamped DataFrame into a date-partitioned parquet
    * dataset (the daily-rollover writer). Dynamic partition overwrite
    * keeps re-runs idempotent per day (the reference re-imports a day
    * by dropping its staging table). */
  def writeDaily(df: DataFrame, tsCol: String, path: String,
      overwriteDays: Boolean = false, filesPerDay: Int = 8): Unit = {
    val mode = if (overwriteDays) SaveMode.Overwrite else SaveMode.Append
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // Repartition on (day, salt), not day alone: hashing only the day
    // would funnel an entire day — at 100 TB, terabytes — through ONE
    // writer task. The salt fans each day out to `filesPerDay` writers
    // (and output files), bounding both task size and file count.
    df.withColumn("day", to_date(col(tsCol)))
      .withColumn("_w", pmod(hash(col(tsCol)), lit(filesPerDay)))
      .repartition(col("day"), col("_w"))
      .drop("_w")
      .write.mode(mode)
      .partitionBy("day")
      .option("compression", "snappy")
      .parquet(path)
  }

  /** Read back with partition pruning (the SP_IMPORT_PARQUET single-day
    * import): predicate on `day` prunes at the file index. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("day") === lit(day))

  /** CSV and JSON landing (config/API payload dumps in the reference). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, schemaDdl: String, path: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Permissive JSONL read: malformed lines land in a corrupt-record
    * column instead of failing the job (the API-payload audit-trail
    * discipline of SCHWAB.JSON_TRANSACTIONS: keep the raw bad record,
    * don't drop it). */
  def readJsonlPermissive(spark: SparkSession, schemaDdl: String, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schemaDdl + ", _corrupt STRING")
      .json(path)

  /** Schema-evolution read: union the schemas of parquet written at
    * different times (new columns appear as nulls on old data). */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC round-trip (columnar alternative landing format). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def readJsonl(spark: SparkSession, schemaDdl: String, path: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)
}
