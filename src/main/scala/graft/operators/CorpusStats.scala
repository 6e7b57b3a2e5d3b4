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
    vocabCoverageOf(Tables.documents(s, d).select("text"), k = 100,
      wordsIn = Some(Tables.tokLong(s, d).select("w")))

  /** d33: unigram NLL quality score — the perplexity proxy every LLM
    * data pipeline filters on, as an exact aggregation: train a
    * top-V unigram model from the corpus itself (count / total, OOV at
    * 0.5 / total), score each doc by its mean per-token negative log
    * likelihood. Scale shape: ONE vocab count shuffle (map-side
    * combined); the top-V model broadcasts (V bounded, the standard
    * cap-plus-OOV trick — never a corpus-side join against an unbounded
    * vocab); one groupBy(doc) agg.
    *
    * Cross-engine determinism: floating sums are order-dependent, and
    * Spark's partial aggregation adds in partition order while DuckDB
    * adds sequentially — so per-word NLL is rounded to 9 dp and summed
    * as DECIMAL(18,9) (exact, order-independent; bounded well inside
    * 2^53 so the final double cast is exact), then averaged and rounded
    * to 6 dp. The 9 dp round also absorbs the ≤1-ulp ln() divergence
    * between JVM and C libm.
    */
  def unigramNll(s: SparkSession, d: String): DataFrame =
    // DirMemo shared cut (r20): d33 itself AND d56's teacher labels
    // consume this identical frame — one NLL pass per (session, dir
    // content) instead of two, same labels bit-for-bit by construction
    graft.ops.DirMemo.cached(s, d, "unigramNll") {
      unigramNllOf(Tables.documents(s, d).select("doc_id", "text"), vocabCap = 1000,
        wordsIn = Some(Tables.tokLong(s, d).select("doc_id", "w")))
        .localCheckpoint(eager = false)
    }

  /** Core of [[unigramNll]] over an explicit (doc_id, text) frame;
    * `wordsIn` (a (doc_id, w) raw word stream, empties tolerated)
    * substitutes the tokenize pass — the registered entry feeds the
    * shared [[Tables.tokLong]] cut. */
  def unigramNllOf(docs: DataFrame, vocabCap: Int,
      wordsIn: Option[DataFrame] = None): DataFrame = {
    val words = wordsIn.getOrElse(
        docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w")))
      .filter(col("w") =!= "")
    val counts = words.groupBy("w").agg(count(lit(1)).as("c"))
    // token total as a narrow map pass (same discipline as
    // vocabCoverageOf): totalling through `counts` would re-run the
    // full explode+groupBy vocabulary aggregation a second time
    val total = docs.agg(
      sum(size(array_remove(split(col("text"), " "), "")).cast("long"))
        .as("total"))
    val top = counts.orderBy(col("c").desc, col("w")).limit(vocabCap)
    words
      .join(broadcast(top), Seq("w"), "left")
      .crossJoin(broadcast(total))
      .withColumn("nll", round(-log(
        when(col("c").isNotNull, col("c") / col("total"))
          .otherwise(lit(0.5) / col("total"))), 9).cast("decimal(18,9)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round((sum(col("nll")).cast("double") / count(lit(1))), 6).as("nll"))
      .orderBy("doc_id")
  }

  /** Core of [[vocabCoverage]] over any frame with a text column;
    * `wordsIn` as in [[unigramNllOf]] (single `w` column). */
  def vocabCoverageOf(docs: DataFrame, k: Int,
      wordsIn: Option[DataFrame] = None): DataFrame = {
    val words = wordsIn.getOrElse(
        docs.select(explode(split(col("text"), " ")).as("w")))
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

  /** d50: per-source unigram distribution drift vs the whole corpus —
    * KL(P_source ‖ P_corpus) with add-one smoothing over the corpus
    * vocabulary. The contrast gauge data-mixing work reads to spot a
    * source whose token distribution has drifted from the pool (a new
    * crawl snapshot, a broken extractor, an injected spam burst);
    * pairs with [[corpusReport]] as the between-runs observability
    * readout. Absent words carry the smoothed floor mass, so the sum
    * runs over the FULL vocab × source grid.
    *
    * Scale shape: one (source, word) count shuffle; corpus counts are
    * its second-level rollup (no second corpus pass); the grid is
    * vocab × sources via a broadcast of the per-source totals (source
    * cardinality is inherently low); totals ride one broadcast scalar.
    * At 100 TB the published trick bounds the vocab axis by hashing
    * words into 2^20 buckets — the plan is unchanged, only the key
    * becomes a hash. Float parity: d33 discipline (9 dp per-term round,
    * DECIMAL(18,9) sum, 6 dp final).
    */
  def unigramDrift(s: SparkSession, d: String): DataFrame =
    unigramDriftOf(Tables.documents(s, d).select("source", "text"),
      wordsIn = Some(Tables.tokLong(s, d).select("source", "w")))

  /** Core of [[unigramDrift]] over an explicit (source, text) frame;
    * `wordsIn` as in [[unigramNllOf]] ((source, w); NO empty filter —
    * d50 counts the raw split, matching its oracle). */
  def unigramDriftOf(docs: DataFrame,
      wordsIn: Option[DataFrame] = None): DataFrame = {
    val words = wordsIn.getOrElse(
      docs.select(col("source"), explode(split(col("text"), " ")).as("w")))
    val cs = words.groupBy("source", "w").agg(count(lit(1)).as("c"))
    val cc = cs.groupBy("w").agg(sum(col("c")).as("ccnt"))
    val st = cs.groupBy("source").agg(sum(col("c")).as("ts"),
      count(lit(1)).as("nd"))
    val tot = cc.agg(sum(col("ccnt")).as("tc"), count(lit(1)).as("v"))
    val ps = (coalesce(col("c"), lit(0L)) + lit(1)).cast("double") /
      (col("ts") + col("v"))
    val pc = (col("ccnt") + lit(1)).cast("double") / (col("tc") + col("v"))
    cc.crossJoin(broadcast(st))
      .join(cs, Seq("source", "w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("term", round(ps * log(ps / pc), 9).cast("decimal(18,9)"))
      .groupBy("source")
      .agg(max(col("ts")).as("n_tokens"), max(col("nd")).as("n_distinct"),
        round(sum(col("term")).cast("double"), 6).as("kl"))
      .orderBy("source")
  }

  /** d51: corpus snapshot diff — the reconciliation readout between
    * two crawl/ingest snapshots: per source, how many docs were added,
    * removed, changed (same doc_id, different content) or unchanged.
    * The ops tool an incremental corpus pipeline reads after every
    * refresh (and the precondition check before re-running dedup on a
    * delta). The registered entry derives the two snapshots
    * deterministically from the documents table (old = doc_id%10 < 9,
    * new = doc_id%10 > 0 with %10==5 docs edited) so both engines see
    * the same inputs; production calls [[snapshotDiffOf]] with two real
    * snapshot frames.
    *
    * Scale shape: one full-outer shuffle join on doc_id (AQE-splittable,
    * no skew — doc_id is the PK both sides) into a hash agg on the
    * low-cardinality source key. Content comparison is raw text
    * equality here; at 100 TB both sides carry a precomputed content
    * hash column and the same plan compares hashes — semantics
    * unchanged, bytes moved per row bounded.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "source", "text")
    snapshotDiffOf(
      docs.filter(pmod(col("doc_id"), lit(10)) < 9),
      docs.filter(pmod(col("doc_id"), lit(10)) > 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 5,
          concat(col("text"), lit(" EDITED"))).otherwise(col("text"))))
  }

  /** Core of [[snapshotDiff]] over explicit (doc_id, source, text)
    * old/new snapshot frames. */
  def snapshotDiffOf(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id").as("o_id"), col("source").as("o_src"),
      col("text").as("o_text"))
    val n = newSnap.select(col("doc_id").as("n_id"), col("source").as("n_src"),
      col("text").as("n_text"))
    o.join(n, col("o_id") === col("n_id"), "full_outer")
      .select(coalesce(col("o_src"), col("n_src")).as("source"),
        col("o_id"), col("n_id"), col("o_text"), col("n_text"))
      .groupBy("source")
      .agg(
        count(col("o_id")).as("n_old"),
        count(col("n_id")).as("n_new"),
        sum(when(col("o_id").isNull, lit(1L)).otherwise(lit(0L))).as("added"),
        sum(when(col("n_id").isNull, lit(1L)).otherwise(lit(0L))).as("removed"),
        sum(when(col("o_id").isNotNull && col("n_id").isNotNull &&
          col("o_text") =!= col("n_text"), lit(1L)).otherwise(lit(0L))).as("changed"),
        sum(when(col("o_id").isNotNull && col("n_id").isNotNull &&
          col("o_text") === col("n_text"), lit(1L)).otherwise(lit(0L))).as("unchanged"))
      .orderBy("source")
  }

  /** d47: per-(lang, source) corpus health report — the observability
    * aggregate a pipeline owner reads between curation runs: volume
    * (docs, whitespace tokens), mean document size, exact-duplicate
    * rate, short-doc fraction, and the corpus-level duplicate-3-gram
    * fraction (the d25 numerators summed before dividing, so big docs
    * weigh proportionally). Scale shape: per-row narrow stats into ONE
    * hash aggregation keyed by the inherently low-cardinality
    * (lang, source) — no join, no window; countDistinct adds the usual
    * Expand double-pass, still map-side combined. All ratios are
    * exact-integer double divisions (cross-engine bit parity).
    */
  def corpusReport(s: SparkSession, d: String): DataFrame =
    corpusReportOf(Tables.documents(s, d).select("lang", "source", "text"))

  /** Core of [[corpusReport]] over an explicit (lang, source, text)
    * frame. Docs under 3 words contribute zero 3-gram mass, mirroring
    * the oracle's CASE guard. */
  def corpusReportOf(docs: DataFrame): DataFrame = {
    val st = graft.functions.VectorExprs.ngramStats(col("ws"), 3)
    docs
      .withColumn("ws", split(col("text"), " "))
      .withColumn("nw", size(col("ws")).cast("long"))
      .withColumn("nc", length(col("text")).cast("long"))
      .withColumn("n_ng",
        when(col("nw") >= 3, st.getField("n_ngrams")).otherwise(lit(0L)))
      .withColumn("dup_ng",
        when(col("nw") >= 3, st.getField("n_ngrams") - st.getField("n_distinct"))
          .otherwise(lit(0L)))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_tokens"),
        countDistinct(col("text")).as("n_unique"),
        sum(col("nc")).as("sum_chars"),
        sum(when(col("nw") < lit(20), lit(1L)).otherwise(lit(0L))).as("n_short"),
        sum(col("n_ng")).as("sum_ng"),
        sum(col("dup_ng")).as("sum_dup_ng"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        round(col("sum_chars").cast("double") / col("n_docs"), 6).as("avg_chars"),
        ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs"))
          .as("dup_rate"),
        (col("n_short").cast("double") / col("n_docs")).as("short_frac"),
        when(col("sum_ng") === 0, lit(0.0))
          .otherwise(col("sum_dup_ng").cast("double") / col("sum_ng"))
          .as("rep3_frac"))
      .orderBy("lang", "source")
  }

  /** d58: cross-source set-overlap estimation via theta sketches — the
    * sketch-family member the HLL profile (d13) cannot provide:
    * per-source word-3-gram SET sketches (one map-side-combined
    * aggregate, O(k) state per group), then pairwise union /
    * intersection / jaccard ESTIMATES combined driver-side from the
    * collected sketches (bounded: n_sources × k longs). The
    * cross-corpus overlap readout a pipeline wants before merging two
    * crawls — at 100 TB the exact answer is a full shuffle of both
    * gram streams; the sketches ride out of the same pass that
    * computes any other per-source stat. Deterministic (k-min-of-
    * distinct is order-free) — and since every estimator step is
    * integer or reproducible IEEE double arithmetic (toUnit's
    * add-then-divide order is part of the contract), the whole entry
    * replays HASH-EXACT in DuckDB (see SparkEntry's KmvSketchSql);
    * error bounds vs exact set ops stay spec-gated. est_jaccard is the
    * RAW estimator double (no decimal rounding) so the oracle compare
    * is bit-exact, not a knife edge. */
  def setOverlap(s: SparkSession, d: String, k: Int = 512,
      maxSources: Int = 6): DataFrame =
    setOverlapOf(Tables.documents(s, d).select("source", "text"), k, maxSources)

  /** Core of [[setOverlap]] over an explicit (source, text) frame —
    * the TVF delegation point. */
  def setOverlapOf(docs: DataFrame, k: Int = 512,
      maxSources: Int = 6): DataFrame = {
    import graft.functions.ThetaSketch
    val s = docs.sparkSession
    val grams = docs
      .select(col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("source"),
        explode(graft.functions.VectorExprs.wordNgrams(col("ws"), 3)).as("g"))
    val sketches = grams.groupBy("source")
      .agg(ThetaSketch.sketch(col("g"), k).as("sk"))
      .orderBy("source").limit(maxSources)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toArray))
    val rows = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (sa, ska) = sketches(i)
      val (sb, skb) = sketches(j)
      (sa, sb,
        math.round(ThetaSketch.estimateDistinct(ska, k)),
        math.round(ThetaSketch.estimateDistinct(skb, k)),
        math.round(ThetaSketch.estimateIntersection(ska, skb, k)),
        ThetaSketch.estimateJaccard(ska, skb, k))
    }
    import s.implicits._
    rows.toSeq
      .toDF("src_a", "src_b", "est_a", "est_b", "est_inter", "est_jaccard")
      .orderBy("src_a", "src_b")
  }
}
