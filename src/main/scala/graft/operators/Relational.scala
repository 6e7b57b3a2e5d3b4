package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators mirroring the reference's batch ETL SQL.
  *
  * Oracle-determinism rule used throughout graft: any SUM/AVG over
  * non-integral doubles is computed in DECIMAL (exact, order-independent
  * under any partitioning / AQE re-plan) and cast to double only at the
  * final projection. Single binary double ops (a-b, a*b) are IEEE-exact
  * per-row and stay double. This keeps results bit-identical across
  * Spark partition orders AND across engines (DuckDB oracle), while the
  * hot path stays inside whole-stage codegen.
  */
object Relational {

  /** Money-safe sum: exact decimal accumulation, double at the edge. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** q1: grouped aggregation with derived measures (TPC-H Q1 shape).
    * Reference analog: chains snapshot rollups over SPX_CHAIN
    * (/root/reference/sql/chains.sql) — per (CP, Expiry) aggregates of
    * price/volume. Scale: map-side partial agg → 6-group exchange; no
    * join; pushdown of the shipdate filter to parquet.
    */
  def pricingAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        // scale-8 decimal sums must pass through DECIMAL(18,4) (exact:
        // products have <=4 decimals) before double — DuckDB's wide-
        // decimal→double cast double-rounds above 2^53 unscaled
        sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
            (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
          .cast(DecimalType(18, 4)).cast("double").as("sum_disc_price"),
        (sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast(DecimalType(18, 4))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q2: staging→historic dedup-insert (distinct + left-anti join).
    * Reference analog: PYTHON.SP_PY_PROCESS_OHLC
    * (/root/reference/sql/opt.sql:320-391): GROUP BY all columns on the
    * staging table, then LEFT JOIN target ... WHERE target.key IS NULL.
    * Scale: anti-join shuffles both sides on the key; at 100 TB the
    * historic side would be bucketed on (user_id, event_type) so the
    * staging probe co-locates without a full historic reshuffle.
    */
  def dedupInsert(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val staging = ev.filter(col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp")).dropDuplicates()
    val historic = ev.filter(col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"))
      .select("user_id", "event_type")
    staging.join(historic, Seq("user_id", "event_type"), "left_anti")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id")
  }

  /** q3: fact⋈dim join + rollup (transactions per-account rollup analog,
    * OPT.PYTHON.ORDERS join in SP_PY_PARSE_TRANSACTIONS). customer is a
    * dimension → explicit broadcast; no shuffle of the orders fact.
    */
  def joinAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        (dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      .orderBy("c_mktsegment")
  }

  /** q4: signed conditional aggregation.
    * Reference analog: SP_PY_PARSE_TRANSACTIONS
    * (/root/reference/sql/opt.sql:260-270):
    * `AVG(IIF(LEFT(instruction,3)='BUY', -price, price))` — purchases
    * count negative, everything else positive, rolled up per order.
    */
  def conditionalAgg(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val signed = when(col("event_type") === "purchase", -col("value")).otherwise(col("value"))
    ev.groupBy(col("user_id"))
      .agg(
        dsum(signed).as("net_value"),
        (dsum(signed) / count(lit(1))).as("avg_signed"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_buys"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q5: star join with broadcast dimensions (TPC-H Q5 shape).
    * Reference analog: chains × contract-dimension × account joins.
    * supplier/nation/region are dims → broadcast, so the lineitem fact
    * streams through without a shuffle; only the final 25-group agg
    * exchanges.
    */
  def starJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice", "l_discount")
    val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val na = Tables.nation(s, d).select("n_nationkey", "n_regionkey", "n_name")
    val re = Tables.region(s, d).select("r_regionkey", "r_name")
    li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
      .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
            (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
          .cast(DecimalType(18, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** q6: tight-range filter + scalar agg (TPC-H Q6 shape). All three
    * predicates reach the parquet scan as PushedFilters; single partial →
    * final agg, no join, no wide shuffle.
    */
  def filterAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
            col("l_discount").cast(DecimalType(18, 4)))
          .cast(DecimalType(18, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** q7: top-k by measure with deterministic tie-break (largest fills).
    * Scale: Spark plans orderBy+limit as TakeOrderedAndProject — per
    * partition top-k then a k-row merge on the driver; no global sort.
    */
  def topK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** q13: MERGE upsert, target-wins (WHEN NOT MATCHED THEN INSERT).
    * Reference analog: OPTM MERGE in SP_IMPORT_PARQUET_OPT_DATA
    * (/root/reference/docs/sql_server.md): existing (OPT_ID,T) rows kept,
    * only unmatched source rows inserted. Expressed as target ∪
    * (staging left-anti target) — both sides aggregate first so the
    * anti-join moves only group-level rows.
    */
  def upsertMerge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    def rollup(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total"))
        .withColumn("src", lit(tag))
    val target = rollup(ev.filter(col("ts") < cut), "T")
    val stage  = rollup(ev.filter(col("ts") >= cut), "S")
    val newRows = stage.join(target.select("user_id", "event_type"),
      Seq("user_id", "event_type"), "left_anti")
    target.unionByName(newRows).orderBy("user_id", "event_type")
  }

  /** q52: multi-source quality-precedence merge — the OPTM MERGE's real
    * motivation: "several brokerages, with varying quality assignments"
    * (/root/reference/docs/sql_server.md:178). Per (key, day), rows
    * arrive from multiple sources; the survivor is the row from the
    * HIGHEST-quality source present, tie-broken by recency then id —
    * a source-priority upsert, not q13's new-wins coalesce.
    *
    * Scale shape: ONE window over (user_id, day) — single shuffle; the
    * quality rank is a compile-time map folded into the sort key, so no
    * dimension join is needed for a fixed source roster.
    */
  def qualityMerge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // event_type stands in for the feed source; lower rank = better feed
    val quality = when(col("event_type") === "purchase", 1)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "view", 3)
      .when(col("event_type") === "signup", 4)
      .otherwise(5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "day")
      .orderBy(col("q_rank").asc, col("ts").desc, col("event_id").desc)
    ev.withColumn("day", to_date(col("ts")))
      .withColumn("q_rank", quality)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("event_type").as("best_source"),
        col("q_rank"), col("value").as("best_value"), col("ts"))
      .orderBy("user_id", "day")
  }

  /** q14: pivot a categorical into measure columns.
    * Reference analog: CALL/PUT sides (CP=±1) widened into columns for
    * vertical construction. Fixed pivot values → single shuffle, no
    * distinct-values pre-pass (which would be a second job at scale).
    */
  def pivotTypes(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def m(t: String): Column = dsum(when(col("event_type") === t, col("value"))).as(s"${t}_total")
    ev.groupBy(col("user_id"))
      .agg(m("click"), m("view"), m("purchase"), m("signup"), m("error"))
      .orderBy("user_id")
  }

  /** q23: semi + anti join existence checks.
    * Reference analog: the `LEFT JOIN ... WHERE x IS NULL` insert guards
    * throughout opt.sql. Customers that have orders (semi) but no
    * urgent-priority order (anti). Both probes broadcast the reduced
    * orders projection when small; at scale they shuffle on custkey once.
    */
  def antiSemi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey", "c_name", "c_mktsegment")
    val o = Tables.orders(s, d).select("o_custkey", "o_orderpriority")
    // semi (has orders) + anti (none urgent) folded into ONE per-key
    // aggregate + ONE join: the orders fact aggregates map-side to a
    // boolean flag per custkey, instead of two distinct+join passes.
    val flags = o.groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("has_urgent"))
    c.join(flags, c("c_custkey") === flags("o_custkey"))
      .filter(col("has_urgent") === 0)
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q24: full-row distinct on a projection (staging GROUP BY all cols,
    * SP_PY_PROCESS_OHLC). Map-side partial dedup keeps the exchange
    * small. */
  def dedupAllCols(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_suppkey", "l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_suppkey", "l_returnflag", "l_linestatus")

  /** q29: grouped top-k — top 3 orders per market segment, rank window
    * with full tie-break. Reference analog: "largest fills per account"
    * style reports. Scale: rank window partitions on the segment after
    * a broadcast dim join; no global sort.
    */
  def groupedTopK(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rk", row_number().over(w).cast("long")) // BIGINT like the oracle
      .filter(col("rk") <= 3)
      .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
      .orderBy("c_mktsegment", "rk")
  }

  /** q30: hierarchical rollup (subtotals + grand total) — the reference
    * reports daily→symbol→total aggregates. ROLLUP computes all levels
    * in one pass with grouping-set expansion; map-side partials still
    * apply.
    */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** q40: winsorization — clip values to exact per-group [p05, p95]
    * percentiles (outlier capping, the data-cleaning sibling of the
    * reference's moving-average outlier filter). Exact interpolated
    * percentiles (both engines use the (n-1)·p linear rule); clipped
    * sums via decimal.
    */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // bounds rounded to 6 dp in BOTH dialects: the engines interpolate
    // the percentile with mathematically-equal but FP-different
    // formulas (lo + f·(hi−lo) vs lo·(1−f) + hi·f), so the raw bound
    // can differ by an ulp — and when the data is dense around it
    // (first seen at the 10× amplified probe, never at sf≤0.1) the
    // strict n_clipped comparison flips rows. Rounding collapses the
    // ulp gap; clipping at a 6-dp bound is the same discipline dsum's
    // DECIMAL(·,6) already imposes on the sums.
    val bounds = ev.groupBy(col("event_type").as("et"))
      .agg(round(expr("percentile(value, 0.05)"), 6).as("p05"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"))
    ev.join(broadcast(bounds), ev("event_type") === col("et"))
      .withColumn("clipped", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("clipped")).as("clipped_sum"),
        sum(when(col("value") < col("p05") || col("value") > col("p95"), 1L)
          .otherwise(0L)).as("n_clipped"))
      .orderBy("event_type")
  }

  /** q27: the full SP_PY_PARSE_TRANSACTIONS shape end-to-end
    * (/root/reference/sql/opt.sql:252-310): orders joined to their
    * execution legs (lineitem), per-order signed-price rollup
    * (BUY→negative via returnflag), leg-count and avg, then status
    * filter and join back to order attributes. One shuffle on the
    * shared orderkey; order dims broadcast-merged at the end.
    */
  def transactionsRollup(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .filter(col("o_orderstatus").isin("F", "O"))
    val legs = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"))
    val signed = when(col("l_returnflag") === "R", -col("l_extendedprice"))
      .otherwise(col("l_extendedprice"))
    val sub = legs.groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_quantity")).cast("double").as("total_qty"),
        (dsum(signed) / count(lit(1))).as("avg_signed_price"),
        count(lit(1)).as("n_legs"))
    o.join(sub, o("o_orderkey") === sub("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"), col("total_qty"), col("avg_signed_price"), col("n_legs"))
      .orderBy("o_orderkey")
  }

  /** q32: map-column build + explode round trip: per-user map of
    * event_type → count built distributively, then exploded back.
    * Reference analog: the chains exp-date map (expiry → strikes →
    * contracts) flattened by process_options
    * (services/schwab_chains_service.py). Oracle is the equivalent
    * flat GROUP BY — the map is an internal representation.
    */
  def mapExplode(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("type_counts"))
      .select(col("user_id"), explode(col("type_counts")).as(Seq("event_type", "n")))
      .orderBy("user_id", "event_type")
  }

  /** q33: distribution windows — quartile bucket (ntile) and
    * percent_rank of order value within each segment (reference: fill
    * size distribution per account tier). */
  def distribution(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"), // BIGINT like the oracle
        percent_rank().over(w).as("pct_rank"))
      .orderBy("c_mktsegment", "o_orderkey")
  }

  /** q34: orders above their customer's own average (the correlated-
    * scalar-subquery pattern, decorrelated into an agg + join — the
    * form that scales). */
  def aboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val avgs = o.groupBy(col("o_custkey").as("k"))
      .agg((dsum(col("o_totalprice")) / count(lit(1))).as("cust_avg"))
    o.join(avgs, o("o_custkey") === avgs("k"))
      .filter(col("o_totalprice") > col("cust_avg"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
      .orderBy("o_orderkey")
  }

  /** q35: set operations — users who clicked INTERSECT purchased,
    * minus users who errored (distinct-set semantics both engines). */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def users(t: String) = ev.filter(col("event_type") === t).select("user_id").distinct()
    val heavyErrorUsers = ev.filter(col("event_type") === "error")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 15).select("user_id")
    users("click").intersect(users("purchase")).except(heavyErrorUsers)
      .orderBy("user_id")
  }

  /** q43: unpivot (wide→long), the inverse of q14: per-user pivoted
    * totals stacked back into (user_id, event_type, total) rows. */
  def unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = pivotTypes(s, d) // user_id, click_total .. error_total
    wide.select(col("user_id"),
        expr("""stack(5,
               |  'click', click_total, 'view', view_total,
               |  'purchase', purchase_total, 'signup', signup_total,
               |  'error', error_total)""".stripMargin).as(Seq("event_type", "total")))
      .filter(col("total").isNotNull)
      .orderBy("user_id", "event_type")
  }

  /** q44: events since the last purchase per user — conditional
    * cumulative window (group id = running count of purchases, offset
    * within the group). The "bars since signal" analytics shape.
    */
  def sinceLastPurchase(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "purchase_grp").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("purchase_grp",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w))
      .withColumn("since_purchase", row_number().over(wg).cast("long") - 1L)
      .filter(col("purchase_grp") > 0) // rows before any purchase: undefined
      .select("event_id", "user_id", "ts", "event_type", "purchase_grp", "since_purchase")
      .orderBy("event_id")
  }

  /** q45: fuzzy matching via Levenshtein edit distance — near-duplicate
    * detection for short strings (names/symbols).
    *
    * Scale design, two layers:
    *  1. DICTIONARY: edit distance is computed on DISTINCT name pairs,
    *     not row pairs. String-key columns are categorical-ish (64
    *     distinct names across 20k rows here; symbols/tickers at 100 TB
    *     behave the same), so the O(len²) levenshtein runs |dict|²
    *     times instead of |rows|² — the row-level result is recovered
    *     with two equi-joins against the broadcast dictionary-pair
    *     table.
    *  2. LENGTH BANDS bound the dictionary self-join itself:
    *     levenshtein ≤ 4 implies |len(a)−len(b)| ≤ 4, so dictionary
    *     pairs join on floor(len/5) with the a-side exploded to
    *     {band−1, band, band+1} (constant 3×). Each qualifying pair
    *     lands in exactly one band (the b-side's own), so no dupes; a
    *     cheap |len diff| ≤ 4 guard prunes band-edge pairs before the
    *     distance call.
    */
  def fuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_name")
    val names = p.select("p_name").distinct()
      .withColumn("band", floor(length(col("p_name")) / 5))
    val na = names.select(col("p_name").as("name_a"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    val nb = names.select(col("p_name").as("name_b"), col("band"))
    val nameDists = na.join(nb, Seq("band"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 4)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 4)
      .select("name_a", "name_b", "dist")
    val a = p.select(col("p_brand"), col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.join(broadcast(nameDists), Seq("name_a"))
      .join(b, Seq("p_brand", "name_b"))
      .filter(col("id_a") < col("id_b"))
      .select("p_brand", "id_a", "id_b", "name_a", "name_b", "dist")
      .orderBy("id_a", "id_b")
  }

  /** q46: share-of-total window — each nation's revenue share within
    * its region (partition-sum ratio, the ratio_to_report analytic). */
  def revenueShare(s: SparkSession, d: String): DataFrame = {
    val base = starJoin(s, d) // r_name, n_name, revenue, n_items
    val w = org.apache.spark.sql.expressions.Window.partitionBy("r_name")
    base.withColumn("region_revenue", sum(col("revenue").cast(DecimalType(18, 4))).over(w)
        .cast(DecimalType(18, 4)).cast("double"))
      .withColumn("share", col("revenue") / col("region_revenue"))
      .select("r_name", "n_name", "revenue", "region_revenue", "share")
      .orderBy("r_name", "n_name")
  }

  /** q47: calendar-month rollup — monthly order revenue (the DAY→month
    * reporting rollup on HISTORIC tables). */
  def monthlyRevenue(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("month")

  /** q56: range (interval-overlap) AGGREGATION join with NO equi key —
    * "campaign" windows derived from high-value orders, aggregating
    * every lineitem whose shipdate falls inside each window. Catalyst's
    * native plan for a pure range predicate is BroadcastNestedLoopJoin —
    * O(n·m) probe work that melts at 100 TB. Bucketizing the range to a
    * day-key equi join fixes the STRATEGY but not the CARDINALITY: with
    * w-day windows every fact row still matches ~(campaigns·w/days)
    * intervals, a pair stream that grows with BOTH sides (measured:
    * 62 s warm at the 10× dir — ~540M pairs — for a 14.7k-campaign ×
    * 6M-row join). Because the aggregates are ADDITIVE, the scale
    * formulation pushes them below the join: facts roll up to one
    * partial per calendar day (map-side combined, days-sized output),
    * intervals take whole-day partials for every FULLY-covered bucket
    * via an equi join on day against that rollup (campaigns·w rows ×
    * days-sized broadcast), and only the ≤2 boundary buckets per
    * interval — where sub-day endpoints can cut a bucket — join facts
    * row-level (bounded by 2/w of the naive pair stream; exactly empty
    * here since midnight-aligned endpoints cover whole days). Decimal
    * partials keep the two-level sum bit-identical to the one-level
    * oracle sum. 10× warm: 62 s → 0.6 s, same 14,680-row result. No
    * nested loop, no cartesian anywhere (Round12dSpec plan-asserts);
    * the oracle runs the NAIVE range-predicate join.
    * Reference analog: interval gating of quotes against session
    * calendars (/root/reference/sql/opt.sql OHLC session windows).
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val windowDays = 15
    val camp = Tables.orders(s, d)
      .filter(col("o_totalprice") > lit(495000))
      .select(col("o_orderkey").as("campaign_id"),
        col("o_orderdate").as("c_start"),
        (col("o_orderdate") + expr(s"interval $windowDays days")).as("c_end"))
    rangeAggJoinOf(camp, Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_shipdate"))
  }

  /** Core of [[rangeJoin]] over explicit interval
    * (campaign_id, c_start, c_end) and fact
    * (l_quantity, l_extendedprice, l_shipdate) frames — endpoints may
    * carry sub-day times; boundary buckets then take the row-level
    * path (Round12dSpec proves parity vs the naive non-equi join on
    * exactly such a fixture). Contract: c_end ≥ c_start per row
    * (sequence() DESCENDS, not errors, on a negative span). */
  def rangeAggJoinOf(camp: DataFrame, facts: DataFrame): DataFrame = {
    // day buckets covered by [c_start, c_end): a bucket is "full" when
    // the interval covers the whole day — those take the day rollup;
    // the rest (≤2 per interval) join facts row-level with the exact
    // range predicate as residual
    val campDays = camp.select(col("campaign_id"), col("c_start"), col("c_end"),
      explode(sequence(to_date(col("c_start")), to_date(col("c_end")),
        expr("interval 1 day"))).as("day"))
      .withColumn("full_day",
        col("day").cast("timestamp") >= col("c_start") &&
          date_add(col("day"), 1).cast("timestamp") <= col("c_end"))
    val li = facts.withColumn("day", to_date(col("l_shipdate")))
    val dayAgg = li.groupBy("day")
      .agg(count(lit(1)).as("p_n"),
        sum(col("l_quantity")).as("p_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("p_rev"))
    // SIZE-GATED broadcasts via AQE, not unconditional hints: dayAgg is
    // days-sized and the boundary set is ≤2 rows per interval BY
    // CONSTRUCTION, but an adversarial campaign cardinality (or a
    // decades-long fact span) can push either past executor memory.
    // Both joins are plain equi joins on `day`; AQE measures the REAL
    // post-aggregation sizes at runtime and converts to broadcast-hash
    // below the adaptive threshold (with a local shuffle read on the
    // probe side), staying a shuffle join above it — correct at any
    // cardinality. Measured at the 10× dir: 3.06 s warm vs 3.14 s for
    // the old unconditional hints (the fact scan dominates; the map
    // stage AQE adds is noise). A driver-side count-gate variant was
    // measured 2× WORSE (6.8 s): its materialize-then-count passes
    // serialize ahead of the main query. Round13Spec plan-asserts both
    // regimes at identical rows.
    val full = campDays.filter(col("full_day"))
      .join(dayAgg, Seq("day"))
      .select("campaign_id", "c_start", "p_n", "p_qty", "p_rev")
    val partial = li.join(campDays.filter(!col("full_day")), Seq("day"))
      .filter(col("l_shipdate") >= col("c_start") && col("l_shipdate") < col("c_end"))
      .groupBy("campaign_id", "c_start")
      .agg(count(lit(1)).as("p_n"),
        sum(col("l_quantity")).as("p_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("p_rev"))
    full.unionByName(partial)
      .groupBy("campaign_id", "c_start")
      .agg(sum(col("p_n")).as("n_items"),
        sum(col("p_qty")).cast("double").as("sum_qty"),
        sum(col("p_rev")).cast(DecimalType(18, 4)).cast("double").as("sum_rev"))
      .orderBy("campaign_id")
  }

  /** q25: flatten-nested round trip: build the nested form the reference
    * ingests (chains JSON: expiry → strikes → contract list,
    * services/schwab_chains_service.py process_options), then flatten it
    * back with explode + struct field projection. Oracle-exact: the
    * build + flatten round trip replays in the DuckDB twin.
    */
  def flattenNested(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val nested = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"), col("value")))).as("entries"))
    nested
      .select(col("user_id"), explode(col("entries")).as("e"))
      .select(col("user_id"), col("e.ts").as("ts"),
        col("e.event_type").as("event_type"), col("e.value").as("value"))
      .orderBy("user_id", "ts")
  }
}
