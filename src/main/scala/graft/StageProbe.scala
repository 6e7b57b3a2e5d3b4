package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, CorpusPipeline, CorpusStats, Curation, Dedup, Silver}

/** Per-stage cost breakdown of the two 10× bench heavies (d36's
  * composed pipeline, d56's iterative GD) — the diagnostic behind the
  * SURVEY per-stage table. Each stage mirrors the registered entry's
  * exact config and is materialized through an eager localCheckpoint so
  * the next stage starts from cached partitions: the printed numbers
  * are SERIAL per-stage costs, so their sum exceeds the fused pipeline
  * wall (the real pipeline fuses the narrow gates into neighboring
  * stages and runs lazy cuts) — use them for attribution, not as a
  * wall prediction.
  *
  * Run: sbt "runMain graft.StageProbe [sfDir] [d36|d56]"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // see QProbe: pairs with Amplify's bounded-row-group dirs
    sys.env.get("GRAFT_MAX_PART_BYTES").foreach(v =>
      spark.conf.set("spark.sql.files.maxPartitionBytes", v))

    def timed(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val cut = f.localCheckpoint(eager = true)
      val n = cut.count()
      println(f"[stage] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      cut
    }

    if (only.forall(_ == "d36")) {
      println(s"[stageprobe] d36_corpus_pipeline stages at $d")
      val docs = Tables.documents(spark, d).select("doc_id", "text", "lang", "source")
      val bench = docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text")
      // warm the session (parquet footers, codegen, executor pools) so
      // stage 1 doesn't carry the JVM cold start
      docs.count(); docs.agg(sum(length(col("text")))).collect()
      // GRAFT_STAGE_REPART=1: measure the scrub with a pre-repartition
      // (the scan-fused regex chain otherwise runs as ONE task on the
      // harness's single-row-group parquet)
      val base = if (sys.env.contains("GRAFT_STAGE_REPART"))
        docs.repartition(cpus.toInt) else docs
      val quality = timed("scrub+quality_gate") {
        CorpusPipeline.scrubText(base)
          .filter(size(split(col("text"), " ")) >= 3)
      }
      val exact = timed("exact_dedup") {
        val keep = quality.groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
        quality.join(keep, Seq("doc_id"), "left_semi")
      }
      val pairs = timed("lsh_pair_mine") {
        Dedup.ngramJaccardViaLsh(
          exact.select("doc_id", "text", "lang", "source"),
          blockCols = Seq("lang", "source"))
      }
      val nd = timed("cc+near_dedup") {
        val drop = Dedup.connectedComponentsAuto(pairs.select("id_a", "id_b"))
          .filter(col("node") =!= col("cluster_id"))
          .select(col("node").as("doc_id"))
        exact.join(drop, Seq("doc_id"), "left_anti")
      }
      val dc = timed("decontaminate") {
        nd.join(
          Curation.contaminatedIds(nd.select("doc_id", "text"),
            CorpusPipeline.benchmarkGrams(bench)),
          Seq("doc_id"), "left_anti")
      }
      val rg = timed("repetition_gate") {
        dc.withColumn("ws", split(col("text"), " "))
          .filter(CorpusPipeline.repetitionKeep(col("ws"), 0.9))
          .drop("ws")
      }
      val dm = timed("domain_mix") { Curation.mixKeepFilter(rg, 0.5) }
      timed("chunks") {
        dm.select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"),
            posexplode(graft.functions.TextFns.chunkWindows("ws"))
              .as(Seq("chunk_idx", "chunk_text")))
      }.unpersist()
    }

    if (only.contains("scrub")) {
      // decompose the scrub stage: where do the seconds actually go?
      val docs = Tables.documents(spark, d).select("doc_id", "text", "lang", "source")
      docs.count()
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[scrub] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s n=$n")
      }
      t("plain count")(docs.count())
      t("lower only")(docs.select(lower(col("text")).as("text"))
        .agg(sum(length(col("text")))).head.getLong(0))
      t("regex url only")(docs.select(regexp_replace(lower(col("text")),
        "https?://[^ ]+", " ").as("text"))
        .agg(sum(length(col("text")))).head.getLong(0))
      t("regex email only")(docs.select(regexp_replace(lower(col("text")),
        "[^ ]+@[^ ]+", " ").as("text"))
        .agg(sum(length(col("text")))).head.getLong(0))
      t("regex ws only")(docs.select(regexp_replace(lower(col("text")),
        "\\s+", " ").as("text"))
        .agg(sum(length(col("text")))).head.getLong(0))
      t("full scrub no cut")(CorpusPipeline.scrubText(docs)
        .agg(sum(length(col("text")))).head.getLong(0))
      t("full scrub + quality, no cut")(CorpusPipeline.scrubText(docs)
        .filter(size(split(col("text"), " ")) >= 3).count())
      t("scrub+quality localCheckpoint")(CorpusPipeline.scrubText(docs)
        .filter(size(split(col("text"), " ")) >= 3)
        .localCheckpoint(eager = true).count())
      t("repart scrub+quality no cut")(CorpusPipeline.scrubText(
        docs.repartition(cpus.toInt))
        .filter(size(split(col("text"), " ")) >= 3).count())
    }

    if (only.contains("decon")) {
      // decompose the decontaminate stage: bench gram build vs corpus
      // gram explode vs the contaminated-id join vs the final anti-join
      val docs = Tables.documents(spark, d).select("doc_id", "text", "lang", "source")
      val bench = docs.filter(col("doc_id") % 7 === 0).select("doc_id", "text")
      docs.count()
      val nd = CorpusPipeline.scrubText(docs)
        .filter(size(split(col("text"), " ")) >= 3)
        .localCheckpoint(eager = true)
      nd.count()
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"[decon] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s n=$n")
      }
      t("benchmarkGrams count")(CorpusPipeline.benchmarkGrams(bench).count())
      val bg = CorpusPipeline.benchmarkGrams(bench).localCheckpoint(eager = true)
      t("benchmarkGrams cut (again)")(bg.count())
      t("corpus gram explode only")(nd
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 8)
        .select(explode(graft.functions.VectorExprs.ngramHashes(col("ws"), 8)).as("ngh"))
        .count())
      t("contaminatedIds (bench pre-cut)")(
        Curation.contaminatedIds(nd.select("doc_id", "text"), bg).count())
      t("contaminatedIds (fused bench)")(
        Curation.contaminatedIds(nd.select("doc_id", "text"),
          CorpusPipeline.benchmarkGrams(bench)).count())
      t("full decon anti-join")(nd.join(
        Curation.contaminatedIds(nd.select("doc_id", "text"),
          CorpusPipeline.benchmarkGrams(bench)),
        Seq("doc_id"), "left_anti").count())
    }

    if (only.forall(_ == "d56")) {
      println(s"[stageprobe] d56_quality_classifier stages at $d")
      val docs = Tables.documents(spark, d).select("doc_id", "text")
      val labels = timed("teacher_labels") {
        val nll = CorpusStats.unigramNllOf(docs, vocabCap = 1000,
            wordsIn = Some(Tables.tokLong(spark, d).select("doc_id", "w")))
          .select("doc_id", "nll")
        val ranked = Silver.surrogateIds(nll, Seq("nll", "doc_id"), "rnk")
        val tot = ranked.agg(count(lit(1)).as("n"))
        ranked.crossJoin(broadcast(tot))
          .select(col("doc_id"),
            when(col("rnk") * 2 <= col("n"), 1.0).otherwise(0.0).as("y"))
      }
      // GD cost ≈ linear in iters: time 1 iter and 8 iters, report both
      // and the per-iter slope (8 = the registered entry's setting)
      Seq(1, 8).foreach { it =>
        val t0 = System.nanoTime()
        Classifier.trainLogistic(docs, labels, 4096, iters = it, lr = 10.0)
        println(f"[stage] gd_train_iters=$it%-17d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      val model = Classifier.trainLogistic(docs, labels, 4096, iters = 8, lr = 10.0)
      timed("score+join") {
        Classifier.scoreOf(docs, model)
          .join(labels, "doc_id")
          .select(col("doc_id"), col("y").cast("int").as("label"),
            col("margin"), col("pred"))
      }.unpersist()
    }
    spark.stop()
  }
}
