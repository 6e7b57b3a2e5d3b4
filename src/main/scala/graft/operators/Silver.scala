package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** q54: the silver-import composite — the reference's
  * SP_IMPORT_PARQUET_OPT_DATA (/root/reference/docs/sql_server.md:182-330)
  * as ONE fused pipeline: staged rows → symbol parse
  * (ParseSPXSymbol_ITVF) → index-symbol exclusion → option-dim dedup
  * (OPT master, surrogate ids) → PST 06:30–13:00 market-hours gate
  * (EpochMsToPST_ITVF) → per-(option, timestamp) best-quality mark
  * (the MAX(Mark)-per-T upsert into OPTM, extended with the
  * multi-source quality ranking the reference's final MERGE exists
  * for) — where q50/q39/q24/q17/q52 each prove one stage standalone,
  * this entry proves they fuse.
  *
  * Scale shape: every per-row stage (symbol build, parse, tz gate,
  * quality rank) is narrow — no exchange. The series aggregation is
  * the ONE corpus-sized shuffle, on (strike, cp, expiry, t); the
  * option dim is aggregated small (distinct contracts ≪ rows), gets
  * its surrogate ids from a window over that already-small frame, and
  * joins back as a BROADCAST — no second corpus shuffle. At 100 TB the
  * staging scan partitions by arrival date and the same plan holds:
  * one wide exchange, dim broadcast, everything else pipelined.
  *
  * The narrow prefix ([[parseStaged]] → [[gateAndRank]]) is shared
  * with the streaming twin (graft.streaming.EventStream.silverSeries):
  * identical per-row semantics on the wire and in batch backfill.
  */
object Silver {

  /** Staging synth: fixed-width OCC symbols from event fields (the
    * parquet-stage rows carry symbol + mark([37]) + epoch ts([38]);
    * every 97th row plays the $SPX index the procedure excludes).
    * The encoded strike is clamped non-negative: a negative value would
    * lpad to '00-15000' and the downstream ANSI substring-cast parse
    * would throw (while the DuckDB oracle's TRY_CAST silently nulls) —
    * the batch side must never EMIT a symbol the parse stage can't
    * read. The 8-digit width assumes value < 20000 (test data tops out
    * far below; a real feed would validate at ingest). */
  def stagedFromEvents(ev: DataFrame): DataFrame = ev.select(
    col("event_id"),
    col("event_type").as("source"),
    col("value").as("mark"),
    col("ts"),
    when(col("event_id") % 97 === 0, "$SPX").otherwise(concat(
      rpad(when(col("event_id") % 3 === 0, "SPXW").otherwise("SPX"), 6, " "),
      date_format(date_add(to_date(col("ts")), (col("event_id") % 21).cast("int")), "yyMMdd"),
      when(col("event_id") % 2 === 0, "C").otherwise("P"),
      lpad((greatest(floor(col("value")).cast("long"), lit(0L)) * 5000L).cast("string"), 8, "0")))
      .as("symbol"))

  /** ParseSPXSymbol_ITVF: index exclusion + fixed-width decode (root is
    * ignored downstream — the dim key is (strike, cp, expiry), as in
    * the reference's OPT). Narrow, no exchange.
    *
    * Every parse expression carries the SAME `$SPX` guard as the row
    * filter: a downstream predicate on a parsed column (e.g. the dim's
    * `strike <> 0`) can be pushed below this projection by alias
    * substitution and reordered ahead of the filter — under ANSI an
    * unguarded cast of the index row's empty substring would throw
    * (DuckDB's optimizer does exactly this reorder at sf0.1).
    */
  def parseStaged(staged: DataFrame): DataFrame = {
    val isOpt = col("symbol") =!= "$SPX"
    staged
      .filter(isOpt)
      .withColumn("cp", when(isOpt,
        when(substring(col("symbol"), 13, 1) === "C", 1).otherwise(-1)))
      .withColumn("expiry", when(isOpt,
        to_date(substring(col("symbol"), 7, 6), "yyMMdd")))
      .withColumn("strike", when(isOpt,
        substring(col("symbol"), 14, 8).cast("long") / 1000.0))
  }

  /** Quality rules + PST market-hours gate + source quality rank (the
    * multi-brokerage precedence the reference's MERGE serves). Narrow,
    * no exchange; preserves the event-time column for streaming use. */
  def gateAndRank(parsed: DataFrame): DataFrame = {
    val pac = from_utc_timestamp(col("ts"), "America/Los_Angeles")
    val minuteOfDay = hour(pac) * 60 + minute(pac)
    parsed
      .filter(col("mark").isNotNull && col("ts").isNotNull)
      .filter(minuteOfDay >= 390 && minuteOfDay <= 780)
      .withColumn("q_rank",
        when(col("source") === "purchase", 1).when(col("source") === "click", 2)
          .when(col("source") === "view", 3).when(col("source") === "signup", 4)
          .otherwise(5))
  }

  /** Scalable deterministic surrogate ids: global dense-rank semantics
    * over a DISTINCT-keyed frame WITHOUT a single-partition window.
    * Two-level scheme: range-partition on the sort key (so partition i
    * holds strictly smaller keys than partition i+1), rank locally per
    * partition, then add each partition's running-count offset (a
    * window over ≤ `partitions` tiny rows, broadcast back). The result
    * equals `dense_rank() OVER (ORDER BY keys)` for distinct keys —
    * boundary placement cancels out — so oracle parity is preserved,
    * but no task ever holds more than its range slice: the id
    * assignment survives a dim that ISN'T small (the single-partition
    * dense_rank was the one silent scale assumption left in q54).
    */
  /** @param checkpointDir when set (or when the SESSION already has a
    *   checkpoint dir installed — see graft.ops.Checkpoints), the
    *   pinned range layout uses a RELIABLE `checkpoint(eager = false)`
    *   into it (the bounded-CC pattern): an executor loss replays from
    *   checkpoint files instead of failing the query, and no
    *   executor-memory blocks outlive the job — a long-lived driver
    *   (Bench installs a dir at startup) accumulates nothing in the
    *   block manager across repeated calls. With neither set →
    *   `localCheckpoint`: fine for dim-scale frames in tests/
    *   single-JVM; the MEMORY_AND_DISK blocks are reclaimed by the
    *   ContextCleaner once the result frame is unreferenced (an
    *   in-flight lazy consumer is why they cannot be unpersisted
    *   eagerly here). The checkpoint dir itself is SHARED session
    *   state — install it through graft.ops.Checkpoints, not ad-hoc
    *   setCheckpointDir calls. */
  def surrogateIds(dim: DataFrame, keyCols: Seq[String], idCol: String,
      partitions: Int = 32, checkpointDir: Option[String] = None): DataFrame = {
    val ks = keyCols.map(col)
    val sc = dim.sparkSession.sparkContext
    checkpointDir.foreach(graft.ops.Checkpoints.install(sc, _))
    val reliable = checkpointDir.isDefined || graft.ops.Checkpoints.installed(sc).isDefined
    // Materialize the ranged layout ONCE (lazy, no driver barrier):
    // both consumers below — the local ranks and the per-_pid offset
    // counts — must see the SAME partition boundaries, but
    // RangePartitioner samples nondeterministically per execution, so
    // relying on exchange reuse to unify them is fragile (AQE can
    // defeat it). Checkpointing pins one sampled layout by
    // construction; the frame is dim-scale, so the executor-local
    // blocks are cheap.
    val ranged0 = dim.repartitionByRange(partitions, ks: _*)
      .withColumn("_pid", spark_partition_id())
    val ranged =
      if (reliable) ranged0.checkpoint(eager = false)
      else ranged0.localCheckpoint(false)
    val local = ranged.withColumn("_rk",
      row_number().over(Window.partitionBy("_pid").orderBy(ks: _*)))
    val offs = local.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum("_cnt").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    local.join(broadcast(offs), "_pid")
      .withColumn(idCol, (col("_off") + col("_rk")).cast("long"))
      .drop("_pid", "_rk", "_off")
  }

  // Per-(contract, minute) merge: best rank wins, MAX(mark) within it,
  // in ONE aggregation — shared by the batch import and the streaming
  // silverSeries twin. Formulated with ALL-PRIMITIVE aggregation
  // buffers: q_rank's domain is {1..5}, so "the winning rank's mark" is
  // five conditional min(-mark) slots + element_at by best_rank. The
  // obvious min(struct(q_rank, -mark)) computes the same values but a
  // struct-buffered min falls back to SortAggregate — TWO full sorts of
  // the fact table around the exchange (measured at 10× sf0.1: q54 warm
  // 15.3 s → the sorts dominate); primitive buffers keep HashAggregate.
  // The negate ROUND TRIP (min of -mark, then negate back) is kept
  // deliberately: -(-0.0) = +0.0 in both engines, exactly like the
  // struct formulation and the DuckDB oracle's MIN({'r':…,'m':-mark}).
  private val QRanks = 1 to 5

  private[graft] def bestMarkAggs: Seq[org.apache.spark.sql.Column] =
    (min(col("q_rank")).as("best_rank") +:
      QRanks.map(r => min(when(col("q_rank") === r, negate(col("mark")))).as(s"_m$r"))) :+
      count(lit(1)).as("n_obs")

  /** Post-aggregation extraction of the winning rank's mark. */
  private[graft] def bestMark: org.apache.spark.sql.Column =
    negate(element_at(array(QRanks.map(r => col(s"_m$r")): _*), col("best_rank")))

  def silverImport(s: SparkSession, d: String): DataFrame =
    silverImportFrom(stagedFromEvents(Tables.events(s, d)))

  /** The engine side of q54 over an already-staged (symbol, source,
    * mark, ts) frame — what actually runs at 100 TB, where staged rows
    * arrive from the landing tables instead of the entry's synth
    * scaffold (ParseProbes exposes this as q54_parse). */
  def silverImportFrom(staged: DataFrame): DataFrame = {
    val parsed = parseStaged(staged)

    // OPT master: distinct valid contracts with two-level surrogate ids
    // (dense_rank semantics, no single-partition exchange).
    val dim = surrogateIds(parsed
      .filter(col("strike") =!= 0.0 && col("cp").isNotNull && col("expiry").isNotNull)
      .select("strike", "cp", "expiry").distinct(),
      Seq("expiry", "cp", "strike"), "opt_id")

    val aggs = bestMarkAggs
    val series = gateAndRank(parsed)
      .groupBy(col("strike"), col("cp"), col("expiry"),
        date_trunc("minute", col("ts")).as("t"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("strike"), col("cp"), col("expiry"), col("t"),
        col("best_rank"), bestMark.as("mark"), col("n_obs"))

    series.join(broadcast(dim), Seq("strike", "cp", "expiry"))
      .select("opt_id", "strike", "cp", "expiry", "t", "best_rank", "mark", "n_obs")
      .orderBy("opt_id", "t")
  }
}
