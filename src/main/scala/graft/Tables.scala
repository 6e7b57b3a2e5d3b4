package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema'd readers for the driver-generated parquet tables.
  *
  * All operators read through here so that column pruning / predicate
  * pushdown land on the parquet scan (verify with
  * `.explain("formatted")` → `ReadSchema` / `PushedFilters`). At cluster
  * scale these would be external tables (partitioned by date); in this
  * harness each table is a single parquet file under the sf dir.
  *
  * Reference analog: the collection services land data in staging tables
  * (/root/reference/sql/opt.sql — PYTHON.DAY, PYTHON.MINUTE,
  * SCHWAB.JSON_TRANSACTIONS); here the parquet tables play that role.
  */
object Tables {
  private def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = rd(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = rd(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = rd(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = rd(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = rd(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = rd(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = rd(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and truncate to
    * a µs TimestampType — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS → TIMESTAMP, keeping the oracle bit-identical.
    * Integer `div` (not `/`) : epoch-nanos exceed 2^53, double math
    * would lose precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = rd(s, d, "events")
    // the driver's table is TIMESTAMP(NANOS) (read as long under the
    // legacy conf); the amplified beyond-sf0.1 probe dir (Amplify) and
    // any user-supplied table carry ordinary µs timestamps — accept both
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      // a µs table written WITHOUT isAdjustedToUTC reads as
      // TIMESTAMP_NTZ; with the session tz pinned to UTC this cast is
      // the same instant DuckDB's naive TIMESTAMP sees
      case org.apache.spark.sql.types.TimestampNTZType => col("ts").cast("timestamp")
      case _ => col("ts")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = rd(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = rd(s, d, "embeddings")

  /** Shared corpus token slice: ONE raw split+explode of `documents`
    * per (session, dir) — (doc_id, lang, source, w) with EMPTIES KEPT —
    * lazily localCheckpointed under the [[graft.ops.DirMemo]]
    * content-fingerprint discipline. The count-shaped entries
    * (d14/d15/d30/d33/d46/d50) each used to pay their own
    * tokenize+explode pass over the corpus; they now consume this cut
    * and apply their OWN empty-filter / lower() so each oracle's exact
    * semantics are preserved (lowercasing commutes with the space
    * split: no lowercase mapping produces or consumes U+0020). Cores
    * stay pure — they accept an optional pre-tokenized stream and
    * default to tokenizing their input frame. */
  def tokLong(s: SparkSession, d: String): DataFrame =
    graft.ops.DirMemo.cached(s, d, "tokLong") {
      documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .localCheckpoint(false)
    }
}
