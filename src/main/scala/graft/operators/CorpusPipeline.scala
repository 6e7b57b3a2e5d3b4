package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed end-to-end training-corpus build — the pipeline an LLM
  * data team actually ships, assembled from the individual operators:
  *
  *   raw docs → scrub → quality gate → exact dedup → near-dup dedup
  *            → chunked training examples
  *
  * Each stage is the same declarative transform its standalone query
  * uses (d12 scrub, d8-style gates, d1 exact dedup, d2 LSH + connected
  * components, d18 chunking), so the composition inherits their scale
  * properties: no stage is O(rows²), every pairwise step goes through
  * bounded candidate generation.
  */
object CorpusPipeline {

  /** @param docs (doc_id: long, text: string) + any carry-through cols
    * @param minWords quality gate: minimum whitespace words post-scrub
    * @param checkpointDir reliable checkpointing for the component loop
    *   (pass on a real cluster; None → localCheckpoint for tests)
    * @return (chunks, per-stage row counts in pipeline order) — stats
    *   force evaluation stage by stage. Each stage is cached only while
    *   its consumer materializes: once stage N+1's count lands, stage
    *   N's cache is released (only the returned chunks frame stays
    *   cached — the caller unpersists it when done), so executor memory
    *   holds at most two stages at a time instead of the whole lineage.
    */
  def buildTrainingCorpus(docs: DataFrame, minWords: Int = 5,
      checkpointDir: Option[String] = None): (DataFrame, Seq[(String, Long)]) = {
    val stats = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var prevStage: DataFrame = null
    def stage(name: String, df: DataFrame): DataFrame = {
      val c = df.cache()
      stats += name -> c.count()
      // the new stage is materialized; its input cache has been consumed
      if (prevStage != null) prevStage.unpersist()
      prevStage = c
      c
    }

    // 1. scrub: URL/email strip, whitespace collapse, lowercase (d12)
    val scrubbed = stage("scrubbed", docs.withColumn("text",
      trim(regexp_replace(regexp_replace(regexp_replace(
        lower(col("text")),
        "https?://[^ ]+", " "),
        "[^ ]+@[^ ]+", " "),
        "\\s+", " ")))
      .filter(col("text") =!= ""))

    // 2. quality gate: length floor (cheap heuristics first — drop
    //    before any shuffle touches the rows)
    val quality = stage("quality_gate",
      scrubbed.filter(size(split(col("text"), " ")) >= minWords))

    // 3. exact dedup on the normalized fingerprint, keep smallest id (d1)
    val keepIds = quality
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exact = stage("exact_dedup", quality.join(keepIds, Seq("doc_id"), "left_semi"))

    // 4. near-dup dedup: MinHash-LSH candidate pairs (bounded by
    //    banding) → connected components → keep one doc per cluster (d2)
    val words = exact.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val pairs = Dedup.minhashLshPairs(words)
    // barrier-free bounded CC; with a checkpointDir the per-round cuts
    // are reliable (executor-loss-safe) yet still lazy — no per-round
    // driver barriers in the middle of the pipeline
    val cc = Dedup.connectedComponentsBounded(pairs.select("id_a", "id_b"),
      checkpointDir = checkpointDir)
    val drop = cc.filter(col("node") =!= col("cluster_id"))
      .select(col("node").as("doc_id"))
    val nearDeduped = stage("near_dedup", exact.join(drop, Seq("doc_id"), "left_anti"))

    // 5. chunk to training examples: overlapping word windows (d18)
    val chunkSize = 20
    val stride = 10
    val chunks = stage("chunks", nearDeduped
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, cast(floor((size(ws) - 1) / $stride) as int)),
             |  k -> concat_ws(' ', slice(ws, k * $stride + 1, $chunkSize)))""".stripMargin))
          .as(Seq("chunk_idx", "chunk_text"))))

    (chunks, stats.toSeq)
  }
}
