package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chains, Dedup}

/** Specs for the chains-semantics queries (q49–q51) and the round-2
  * dedup additions (d3 pair recall, d4-via-LSH precision/recall). */
class ChainsAndDedupSpec extends SparkSpec {

  test("q49 chain flatten is a lossless round trip: one row per event, derived cols correct") {
    val flat = Chains.chainFlatten(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    assert(flat.count() == nEvents, "flatten must reproduce every contract")
    // DTE embedded in the expiry map key must equal datediff(expiry, quote day)
    val base = Tables.events(spark, sf)
      .select(col("event_id").as("contract_id"), to_date(col("ts")).as("qday"))
    val badDte = flat.join(base, "contract_id")
      .filter(col("dte") =!= datediff(col("expiry"), col("qday"))).count()
    assert(badDte == 0, "DTE must equal datediff(expiry, quote date)")
    // CP is ±1 only; weekly is 0/1 and matches the SPXW root rule (id % 3)
    assert(flat.filter(!col("cp").isin(1, -1)).count() == 0)
    assert(flat.filter(col("weekly") =!=
      when(col("contract_id") % 3 === 0, 1).otherwise(0)).count() == 0)
    // bid/ask survive the JSON round trip bit-exactly
    val ev = Tables.events(spark, sf).select(col("event_id").as("contract_id"), col("value"))
    val badPx = flat.join(ev, "contract_id")
      .filter(col("bid") =!= col("value") - 0.05 || col("ask") =!= col("value") + 0.05)
      .count()
    assert(badPx == 0, "prices must round-trip through JSON exactly")
    flat.unpersist()
  }

  test("q50 symbol parse decodes every fixed-width field back to its source") {
    val parsed = Chains.parseSymbols(spark, sf).cache()
    val p = Tables.part(spark, sf).select("p_partkey", "p_size", "p_retailprice")
    val j = parsed.join(p, "p_partkey")
    assert(j.filter(col("cp") =!=
      when(col("p_size") % 2 === 0, 1).otherwise(-1)).count() == 0)
    assert(j.filter(col("root") =!=
      when(col("p_partkey") % 3 === 0, "SPXW").otherwise("SPX")).count() == 0)
    assert(j.filter(col("strike") =!= floor(col("p_retailprice"))).count() == 0,
      "strike/1000 must undo the ×1000 encoding")
    assert(j.filter(col("expiry") =!=
      date_add(to_date(lit("2024-01-01")), (col("p_partkey") % 365).cast("int"))).count() == 0)
    // symbols are fixed-width: root(6) + date(6) + cp(1) + strike(8)
    assert(parsed.filter(length(col("symbol")) =!= 21).count() == 0)
    parsed.unpersist()
  }

  test("q51 strike-grid backfill: dense bounded lattice, LOCF fills forward only") {
    val bf = Chains.strikeGridBackfill(spark, sf).cache()
    // every (day, strike) series has exactly the 5 session hours
    val badSeries = bf.groupBy("day", "strike").count().filter(col("count") =!= 5).count()
    assert(badSeries == 0, "each lattice series must span hours 9..13")
    // filled_mark equals the running last observation: never null after
    // the first obs, equal to mark wherever mark is present
    assert(bf.filter(col("mark").isNotNull && col("filled_mark") =!= col("mark")).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day", "strike").orderBy("hr")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val recomputed = bf.withColumn("expect", last(col("mark"), ignoreNulls = true).over(w))
    assert(recomputed.filter(
      (col("filled_mark").isNotNull || col("expect").isNotNull) &&
      !(col("filled_mark") <=> col("expect"))).count() == 0)
    bf.unpersist()
  }

  test("q53 order-legs normalization preserves referential integrity") {
    val flat = Chains.orderLegsNormalize(spark, sf).cache()
    val li = Tables.lineitem(spark, sf)
    // execution grain: one output row per lineitem (1:1 legId join, no fanout)
    assert(flat.count() == li.count())
    // legId unique within each order
    assert(flat.groupBy("order_id", "leg_id").count().filter(col("count") > 1).count() == 0)
    // signed price: BUY negative, SELL positive (for positive prices)
    assert(flat.filter(col("instruction") === "BUY" &&
      col("exec_price") > 0 && col("signed_price") >= 0).count() == 0)
    assert(flat.filter(col("instruction") === "SELL" &&
      col("signed_price") =!= col("exec_price")).count() == 0)
    flat.unpersist()
  }

  test("d3 simhash banding is recall-lossless for hamming <= 3 (matches brute force)") {
    val fps = Dedup.simhashFingerprints(spark, sf).cache()
    val banded = Dedup.simhashPairs(fps).select("id_a", "id_b", "hd")
    val a = fps.select(col("doc_id").as("id_a"), col("simhash").as("h_a"))
    val b = fps.select(col("doc_id").as("id_b"), col("simhash").as("h_b"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hd", Dedup.hamming(col("h_a"), col("h_b")))
      .filter(col("hd") <= 3)
      .select("id_a", "id_b", "hd")
    assert(banded.exceptAll(brute).count() == 0, "banded pairs must all be true pairs")
    assert(brute.exceptAll(banded).count() == 0,
      "4x16-bit banding must capture EVERY pair with hamming <= 3 (pigeonhole)")
    fps.unpersist()
  }

  test("d4 via LSH: every emitted pair is exact-verified; recall vs blocked-exact is high") {
    val exact = Dedup.ngramJaccard(spark, sf)
      .select("id_a", "id_b", "jaccard").cache()
    // same blocking as the registered d19 entry: the result must be a
    // STRICT subset of d4's exact blocked pairs (precision = 1 by
    // construction — exact verify — and blocking enforced in the band
    // join, so no cross-block extras)
    val viaLsh = Dedup.ngramJaccardViaLsh(Tables.documents(spark, sf),
        blockCols = Seq("lang", "source"))
      .select("id_a", "id_b", "jaccard").cache()
    assert(viaLsh.exceptAll(exact).count() == 0,
      "LSH-path pairs must be a subset of the exact blocked result")
    // recall: banding captures ~88% of j=0.8 pairs in expectation;
    // near-dup corpora sit well above the threshold, so demand >= 60%
    val captured = viaLsh.join(exact, Seq("id_a", "id_b")).count()
    assert(captured >= (exact.count() * 0.6).toLong,
      s"LSH recall too low: $captured of ${exact.count()}")
    exact.unpersist(); viaLsh.unpersist()
  }
}
