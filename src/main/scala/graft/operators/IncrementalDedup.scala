package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming/incremental NEAR-dup dedup — the per-cycle twin of the
  * batch [[Dedup.dedupPipeline]] (d22), mirroring the reference's
  * production dedup-insert loop (/root/reference/sql/opt.sql:347-391,
  * run on a timer by services/schwab_ohlc_service.py) but for
  * probabilistic near-duplicates instead of exact keys: each incoming
  * micro-batch is MinHash-banded against a PERSISTED historic band
  * index, collisions are verified with the exact word-set jaccard, and
  * only novel content joins the corpus. Re-running batch d22 over the
  * full corpus per cycle would re-scan everything ever ingested; this
  * upsert touches the new docs, the band-index buckets they collide
  * with, and nothing else.
  *
  * == Persisted layout under `root` ==
  *  - `root/bands/bucket=N/` — the LSH band index: one row per
  *    (doc, band) with its band hash and blocking attributes,
  *    partitioned by `bucket = pmod(band_hash, buckets)` so a batch's
  *    band join prunes to the buckets its own hashes land in (the
  *    d6 persisted-IVF-index trick applied to LSH). With
  *    `bucketedIndex = true` the same directory doubles as an external
  *    BUCKETED table clustered on the full band-join key — see
  *    [[ensureBandTable]] — which removes the index-side shuffle from
  *    the steady-state cycle entirely.
  *  - `root/docs/bucket=N/` — per-doc state: word set (for exact
  *    verification of future collisions), block attrs, and the doc's
  *    cluster label at insert time; partitioned by
  *    `bucket = pmod(hash(doc_id), buckets)` for pruned id lookups.
  *  - `root/merges/` — tiny append-only log of cluster-label merges
  *    (old_label → new_label). A later doc can CONNECT two existing
  *    clusters; relabeling the losing cluster's rows in `docs/` would
  *    rewrite unbounded history, so the merge is recorded here and
  *    resolved at read time (union-find over a driver-scale log,
  *    broadcast back). Entries always map to a strictly smaller live
  *    label, so chains are acyclic and path-compress to one hop.
  *    A periodic [[compact]] folds resolved labels into `docs/` and
  *    truncates the log, crash-safely, so neither the log nor the
  *    read-time resolution grows without bound.
  *
  * == Exact parity with batch d22 ==
  * Band collision is a deterministic pairwise predicate (fixed MinHash
  * permutations), so splitting the corpus into micro-batches does not
  * change WHICH pairs are captured: a pair lands together in a batch
  * (self-join) or across the index (band join) with identical hashes
  * either way. Incremental connected components over (new verified
  * pairs ∪ star edges to historic cluster labels) therefore equals the
  * one-shot CC over all verified pairs, in ANY arrival order — the
  * spec feeds arbitrary splits and asserts the corpus is identical to
  * [[Dedup.dedupPipeline]]'s, including after simulated crash/replay.
  *
  * == Crash/retry safety (single writer, like Sinks.upsertHistoric) ==
  * Write order per batch: bands → merges → docs. The `docs/` store is
  * the membership authority (the restart guard anti-joins it), so a
  * crash before the docs append re-processes the batch; duplicate band
  * rows from the retry are harmless (candidates are `.distinct()`ed)
  * and re-derived merge entries are identical (the log dedupes in the
  * driver map). The merge log is written `coalesce(1)` — one task, one
  * file, driver-scale data — so it cannot land partially.
  *
  * == Scale shape ==
  * Per batch: one narrow scan of the pruned band-index buckets joined
  * on (band, band_hash, blockCols) — never the corpus text; candidate
  * verification reads only the `docs/` buckets holding colliding ids;
  * CC runs over the batch's edge set (bounded by true near-dup
  * density), not the historic graph — historic clusters participate as
  * single star nodes. State that grows with corpus size is only ever
  * equi-joined or partition-pruned, never rewritten.
  *
  * The bucket prune pays off for TRICKLE batches (few distinct band
  * hashes); a batch large enough to hit every bucket pays one narrow
  * pass over the whole band index per cycle (measured: 10k novel docs
  * vs a 1M-doc store = 8.8 s, vs 38 s to re-bootstrap — ScaleSmoke's
  * steady-state stage). That is the same cost profile as the
  * reference's per-cycle anti-join against HISTORIC, and it amortizes
  * the same way: batch the cycles (daily, not per-second). The known
  * next step if the index-side pass itself becomes the bottleneck is a
  * TABLE layout bucketed on the full join key
  * (band, band_hash, blockCols): Round6Spec proves that exact band
  * join then plans with NO exchange on the historic side — only the
  * micro-batch moves.
  */
object IncrementalDedup {

  /** Test-only crash injection between the bands and docs writes (the
    * ordering the crash-safety contract hinges on). Never set outside
    * specs. */
  private[graft] var failAfterBands: Boolean = false

  private def bandsPath(root: String) = s"$root/bands"
  private def docsPath(root: String) = s"$root/docs"
  private def mergesPath(root: String) = s"$root/merges"

  private def exists(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Catalog name for the bucketed band-index table of a store root —
    * content-addressed on the root path so distinct stores never
    * collide in one session's catalog. */
  private[graft] def bandTable(root: String): String =
    "graft_band_idx_" + java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** Register (idempotently) the external bucketed band-index table at
    * `bandsPath(root)`. The table is CLUSTERED BY the FULL band-join
    * key, so the per-cycle historic join plans with NO exchange on the
    * index side — only the micro-batch shuffles (proven by the plan
    * assertion in Round6/Round7 specs). The directory-partition column
    * `bucket` is the table bucket id itself (pmod(hash(joinKey),
    * buckets) — the exact expression HashPartitioning uses), which
    * keeps the trickle-batch partition prune AND means an append's
    * repartition(bucket) lands one file per touched bucket.
    *
    * Catalog registration is session-scoped; the FILES under root are
    * the durable state. A fresh session re-registers from the banded
    * schema and recovers the partition listing. */
  private def ensureBandTable(s: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType, joinKey: Seq[String],
      buckets: Int): String = {
    val tbl = bandTable(root)
    if (!s.catalog.tableExists(tbl)) {
      // pre-create the location: CREATE TABLE resolves it and logs a
      // full FileNotFoundException stack (benign but alarming) when
      // the directory doesn't exist yet
      val p = new org.apache.hadoop.fs.Path(bandsPath(root))
      p.getFileSystem(s.sparkContext.hadoopConfiguration).mkdirs(p)
      val keyDdl = joinKey.map(c => s"`$c`").mkString(", ")
      s.sql(
        s"""CREATE TABLE `$tbl` (${schema.toDDL}, `bucket` INT)
           |USING parquet
           |PARTITIONED BY (bucket)
           |CLUSTERED BY ($keyDdl) SORTED BY ($keyDdl) INTO $buckets BUCKETS
           |LOCATION '${bandsPath(root)}'""".stripMargin)
      if (exists(s, bandsPath(root)))
        s.sql(s"ALTER TABLE `$tbl` RECOVER PARTITIONS")
    }
    tbl
  }

  /** The tokenize / band / verify stages are SHARED with the batch
    * pipeline (Dedup.lshTokens/lshBands/verifyJaccard): the exact-parity
    * guarantee requires expression-identical stages, so they live in one
    * place by construction. */
  private def verify(cands: DataFrame, aToks: DataFrame, bToks: DataFrame,
      threshold: Double): DataFrame =
    Dedup.verifyJaccard(cands, aToks, bToks, threshold).select("id_a", "id_b")

  /** Path-compressed merge map from the append-only log. Driver-side by
    * design: one row per merge EVENT ever (two clusters connected by a
    * later doc), a population that grows with near-dup graph mergers,
    * not corpus size — and every entry maps to a strictly smaller id,
    * so the walk terminates. Replayed duplicate entries collapse in
    * the Map. */
  private def mergeMap(s: SparkSession, root: String): Map[Long, Long] = {
    if (!exists(s, mergesPath(root))) return Map.empty
    val raw = s.read.parquet(mergesPath(root))
      .select("old_label", "new_label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iterative chain walk (labels strictly decrease, so it terminates;
    // a recursive walk would grow the stack with merge-chain length)
    def find(x: Long): Long = {
      var r = x
      while (raw.contains(r)) r = raw(r)
      r
    }
    raw.keys.map(k => k -> find(k)).toMap
  }

  /** Resolve the label column `inCol` through the merge map into
    * `outCol`. Small maps inline as one literal expression; past
    * `LITERAL_MAX` entries the map rides a broadcast join instead — an
    * unboundedly growing plan literal would bloat plan serialization
    * long before the driver map itself hurt. */
  private val LITERAL_MAX = 10000
  private def withResolved(df: DataFrame, inCol: String, outCol: String,
      m: Map[Long, Long]): DataFrame =
    if (m.isEmpty) df.withColumn(outCol, col(inCol))
    else if (m.size <= LITERAL_MAX)
      df.withColumn(outCol, coalesce(element_at(typedlit(m), col(inCol)), col(inCol)))
    else {
      val s = df.sparkSession
      import s.implicits._
      df.join(broadcast(m.toSeq.toDF("_old", "_new")),
          col(inCol) === col("_old"), "left")
        .withColumn(outCol, coalesce(col("_new"), col(inCol)))
        .drop("_old", "_new")
    }

  /** Upsert one batch of documents (doc_id, text, blockCols...) into
    * the incremental dedup state at `root`. Idempotent per batch: a
    * replay (streaming restart, retried foreachBatch) re-derives the
    * same labels and the docs-store guard drops already-landed rows.
    *
    * @param buckets  partition-count for both stores — must be the
    *   same value across every batch written to one `root` (it is the
    *   pruning contract of the layout)
    * @param checkpointDir reliable checkpoint dir for the per-batch CC
    *   rounds (executor-loss safety on long pipelines; tests omit it)
    * @param bucketedIndex store the band index as an external BUCKETED
    *   table (CLUSTERED BY the full join key) instead of plain
    *   band_hash-partitioned parquet. The steady-state historic join
    *   then plans with zero exchange on the index side — only the
    *   micro-batch moves — which is the production layout once the
    *   index-side pass dominates the cycle. Like `buckets`, the choice
    *   is per-root and permanent: never flip it on an existing store
    *   (the two layouts' bucket dirs mean different things).
    * @param driverMaxEdges size gate for the per-batch component
    *   labeling. A micro-batch's verified edge set is bounded by the
    *   BATCH near-dup density, not corpus size, so it is usually tiny —
    *   and an 8-round distributed label propagation on a tiny graph is
    *   pure scheduling overhead (measured: it tripled the per-batch
    *   cost). At or below the gate the exact labels come from one
    *   collect + driver union-find (same keep-min semantics); above it
    *   — a giant batch or a pathologically dense one — the barrier-free
    *   distributed loop takes over. See connectedComponentsAuto's notes
    *   on driver-heap sizing at the gate.
    */
  def upsertBatch(batch: DataFrame, root: String, threshold: Double = 0.8,
      blockCols: Seq[String] = Seq("lang", "source"), buckets: Int = 64,
      checkpointDir: Option[String] = None,
      driverMaxEdges: Long = 2000000L,
      bucketedIndex: Boolean = false): Unit = {
    val s = batch.sparkSession
    heal(s, root) // finish any interrupted compaction first
    val joinKey = Seq("band", "band_hash") ++ blockCols
    // dir-partition id of a band row. Bucketed mode uses the table
    // bucket id itself (same murmur3+pmod HashPartitioning computes),
    // path mode the plain band_hash residue.
    def bandBucket: org.apache.spark.sql.Column =
      if (bucketedIndex) pmod(hash(joinKey.map(col): _*), lit(buckets))
      else pmod(col("band_hash"), lit(buckets))
    val dbg = sys.env.contains("GRAFT_INC_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (dbg) {
      val t = System.nanoTime()
      println(f"[inc] $tag%-14s ${(t - t0) / 1e9}%6.2f s")
      t0 = t
    }

    // ---- restart guard: docs/ is the membership authority ----------
    val fresh0 = batch.dropDuplicates("doc_id")
    val fresh =
      if (!exists(s, docsPath(root))) fresh0
      else {
        // bounded driver pull: ≤ `buckets` ints, prunes the id lookup
        val bks = fresh0.select(pmod(hash(col("doc_id")), lit(buckets)).as("bucket"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val seen = s.read.parquet(docsPath(root))
          .filter(col("bucket").isin(bks: _*)).select("doc_id")
        fresh0.join(seen, Seq("doc_id"), "left_anti")
      }

    lap("guard")
    val toks = Dedup.lshTokens(fresh, blockCols).localCheckpoint(eager = true)
    if (toks.isEmpty) { toks.unpersist(); return }
    lap("toks")
    val banded = Dedup.lshBands(toks, blockCols).localCheckpoint(eager = true)
    lap("banded")

    // ---- candidates: within-batch self-join + batch-vs-index join --
    val candsNew = banded.withColumnRenamed("doc_id", "id_a")
      .join(banded.withColumnRenamed("doc_id", "id_b"), joinKey)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val edgesNew = verify(candsNew, toks, toks, threshold)

    def noEdges = s.emptyDataFrame
      .select(lit(0L).as("id_a"), lit(0L).as("id_b")).limit(0)
    val mm = mergeMap(s, root)
    // The docs/ check also covers the crashed-FIRST-batch retry: bands/
    // can exist while docs/ does not (write order is bands → merges →
    // docs), and those stale band rows belong to docs that never landed
    // — there is no historic counterpart to verify against, and reading
    // the absent docs/ path would throw on every retry (wedged store).
    val edgesHist =
      if (!exists(s, bandsPath(root)) || !exists(s, docsPath(root))) noEdges
      else {
        val bks = banded.select(bandBucket.as("bucket"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val hist0 =
          if (bucketedIndex)
            s.table(ensureBandTable(s, root, banded.schema, joinKey, buckets))
          else s.read.parquet(bandsPath(root))
        val hist = hist0.filter(col("bucket").isin(bks: _*))
        // checkpoint: the candidate set feeds BOTH the bucket collect
        // below and the verification join — un-cut, the band join
        // against the historic index would execute twice
        val cands = banded.withColumnRenamed("doc_id", "id_a")
          .join(hist.withColumnRenamed("doc_id", "id_b"), joinKey)
          // a retried batch may find its own prior band rows — never
          // pair a doc with itself
          .filter(col("id_a") =!= col("id_b"))
          .select("id_a", "id_b").distinct()
          .localCheckpoint(eager = true)
        // verification ws for colliding historic docs: pruned id fetch
        val dbks = cands.select(pmod(hash(col("id_b")), lit(buckets)).as("bucket"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val res =
          if (dbks.isEmpty) noEdges
          else {
            val hdocs = withResolved(
              s.read.parquet(docsPath(root))
                .filter(col("bucket").isin(dbks: _*))
                .select(col("doc_id"), col("ws"), col("sz"), col("cluster_id")),
              "cluster_id", "h_label", mm).drop("cluster_id")
            // star edge: new doc → the historic doc's LIVE cluster label
            verify(cands, toks, hdocs.drop("h_label"), threshold)
              .join(hdocs.select(col("doc_id").as("id_b"), col("h_label")), "id_b")
              .select(col("id_a"), col("h_label").as("id_b")).distinct()
              .localCheckpoint(eager = true)
          }
        cands.unpersist()
        res
      }
    lap("edgesHist")

    // ---- incremental CC: batch pairs + star edges ------------------
    // size-gated: driver union-find for micro-batch-sized edge sets
    // (the overwhelmingly common case), distributed bounded CC above
    // the gate — shared with the batch pipeline (dedupedCorpus)
    val allEdges = edgesNew.union(edgesHist).localCheckpoint(eager = true)
    lap("allEdges")
    val labels = Dedup.connectedComponentsAuto(allEdges,
      maxDriverEdges = driverMaxEdges, checkpointDir = checkpointDir)
    lap("labels")
    val batchLabels = toks.select("doc_id")
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))

    // historic cluster labels whose component found a smaller minimum:
    // record the merge instead of rewriting the losing cluster's rows
    val newMerges = edgesHist.select(col("id_b").as("node")).distinct()
      .join(labels, "node")
      .filter(col("cluster_id") =!= col("node"))
      .select(col("node").as("old_label"), col("cluster_id").as("new_label"))

    // ---- persist: bands → merges → docs (see crash-safety note) ----
    // zero-row guards: a 0-row partitioned append on a nonexistent
    // path creates a schemaless directory that poisons later reads.
    // repartition ON the partition column first: without it every
    // writer task opens a file in every bucket dir (tasks × buckets
    // tiny files per batch — measured, file creation dominated the
    // write AND the next batch's footer reads)
    if (!banded.isEmpty) {
      val rows = banded.withColumn("bucket", bandBucket).repartition(col("bucket"))
      if (bucketedIndex) {
        // the table pre-registers (empty) before the first append, so
        // the append never needs to carry the LOCATION itself
        val tbl = ensureBandTable(s, root, banded.schema, joinKey, buckets)
        rows.write.mode("append").format("parquet")
          .partitionBy("bucket")
          .bucketBy(buckets, joinKey.head, joinKey.tail: _*)
          .sortBy(joinKey.head, joinKey.tail: _*)
          .saveAsTable(tbl)
      } else
        rows.write.mode("append").partitionBy("bucket").parquet(bandsPath(root))
    }
    lap("writeBands")
    // test-only failpoint: proves the crash-ordering contract (bands
    // landed, docs not → the retry re-processes the batch and its own
    // stale band rows are harmless)
    if (failAfterBands) throw new RuntimeException("failpoint: after bands write")
    if (!newMerges.isEmpty)
      newMerges.coalesce(1).write.mode("append").parquet(mergesPath(root))
    lap("writeMerges")
    toks.join(batchLabels.select("doc_id", "cluster_id"), "doc_id")
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(buckets)))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(docsPath(root))
    lap("writeDocs")
    Seq(toks, banded, edgesHist, allEdges, labels).foreach(_.unpersist())
  }

  // ---- compaction: fold resolved labels into docs/, truncate merges/
  //
  // The append-only merge log grows with merge events forever, and
  // every corpus()/clusters() read pays the driver union-find +
  // resolution expression. The reference's own discipline is a
  // periodic MERGE/compact (docs/sql_server.md OPTM MERGE); this is
  // its analog under the store's single-writer contract.
  //
  // Protocol (each rename is atomic; no step needs multi-dir
  // atomicity because FOLDING IS IDEMPOTENT: a folded label is a live
  // root, never a merge-map key, so re-applying the frozen map to
  // already-folded rows is a no-op — every crash window below reads
  // correctly through the normal corpus()/clusters() path):
  //   a. write docs_new = ONLY the merge-affected buckets, labels
  //      folded (the old docs/ is never touched), then drop the
  //      `_compacting` marker file
  //   b. rename docs     -> docs_old
  //   c. rename docs_new -> docs        (affected buckets, folded)
  //   d. move each UNAFFECTED bucket dir docs_old -> docs (atomic
  //      per-dir renames; a bucket lives in exactly one of the two,
  //      so an interrupted sequence resumes deterministically)
  //   e. delete merges/
  //   f. delete docs_old + marker
  // heal() (called on every entry) classifies the crash window by
  // which artifacts exist: marker + docs + docs_new  = pre-swap, old
  // state intact, discard the attempt; marker + no docs = roll (c)
  // forward; marker + docs = resume the (d) moves and finish
  // (e)/(f). Without the marker a stale docs_new is inert garbage
  // (readers never look at it; the next compact clears it).

  private def docsNewPath(root: String) = s"$root/docs_new"
  private def docsOldPath(root: String) = s"$root/docs_old"
  private def markerPath(root: String) = s"$root/_compacting"

  /** Test-only crash injection after compaction step `n` (1 = docs_new
    * + marker written, 2 = docs renamed away — the no-docs window,
    * 3 = docs_new renamed in, merges not yet deleted). */
  private[graft] var failDuringCompact: Int = 0

  private def fs(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Move every bucket dir present in `from` but absent in `to` into
    * `to` — the resumable step (d): a bucket dir lives in exactly one
    * of the two places, so re-running after any interruption converges
    * on the same final layout. */
  private def moveMissingBuckets(f: org.apache.hadoop.fs.FileSystem,
      from: String, to: String): Unit = {
    import org.apache.hadoop.fs.Path
    if (!f.exists(new Path(from))) return
    f.listStatus(new Path(from)).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("bucket=") && !f.exists(new Path(s"$to/$name")))
        f.rename(st.getPath, new Path(s"$to/$name"))
    }
  }

  /** Roll an interrupted compaction forward (or discard an unfinished
    * attempt) so the store is always readable. Cheap when idle: one
    * existence probe on the marker. */
  private[graft] def heal(s: SparkSession, root: String): Unit = {
    val f = fs(s, root)
    import org.apache.hadoop.fs.Path
    if (!f.exists(new Path(markerPath(root)))) return
    val docs = new Path(docsPath(root))
    val dNew = new Path(docsNewPath(root))
    if (f.exists(docs) && f.exists(dNew)) {
      // crashed before (b): old state intact — discard the attempt
      f.delete(dNew, true)
    } else {
      if (!f.exists(docs) && f.exists(dNew)) f.rename(dNew, docs)  // (c)
      if (f.exists(docs)) {
        moveMissingBuckets(f, docsOldPath(root), docsPath(root))   // (d)
        f.delete(new Path(mergesPath(root)), true)                 // (e)
        f.delete(new Path(docsOldPath(root)), true)                // (f)
      } else if (f.exists(new Path(docsOldPath(root)))) {
        // degenerate (unreachable by the protocol order): roll back
        f.rename(new Path(docsOldPath(root)), docs)
      }
    }
    f.delete(new Path(markerPath(root)), false)
  }

  /** Fold the merge log into `docs/` and truncate it. Runs under the
    * store's single-writer contract (no concurrent upsertBatch).
    * Scale shape: only buckets CONTAINING merge-affected rows are
    * decoded and rewritten; every other bucket directory crosses the
    * generation as one atomic rename (metadata-only, no data IO) — so
    * both compute and IO scale with the merge-touched slice, not the
    * store. After compaction the merge map is empty and every
    * corpus()/clusters() read plans as a plain scan + filter. */
  def compact(s: SparkSession, root: String, buckets: Int = 64): Unit = {
    heal(s, root)
    if (!exists(s, docsPath(root))) return
    val mm = mergeMap(s, root)
    if (mm.isEmpty) return
    val f = fs(s, root)
    import org.apache.hadoop.fs.Path
    f.delete(new Path(docsNewPath(root)), true) // stale attempt, if any

    // (a) affected buckets = those holding a row labeled by a DEAD id;
    // docs_new gets ONLY those, folded — the live store is not touched
    val deadLabels = mm.keys.toSeq
    val affected = s.read.parquet(docsPath(root))
      .filter(col("cluster_id").isin(deadLabels: _*))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    if (affected.isEmpty) { // log entries no row carries (already folded)
      f.delete(new Path(mergesPath(root)), true)
      return
    }
    withResolved(
        s.read.parquet(docsPath(root)).filter(col("bucket").isin(affected.toSeq: _*)),
        "cluster_id", "_live", mm)
      .drop("cluster_id").withColumnRenamed("_live", "cluster_id")
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(docsNewPath(root))
    f.create(new Path(markerPath(root)), true).close()
    if (failDuringCompact == 1) throw new RuntimeException("failpoint: compact after docs_new")
    // (b)..(f): the swap — each step atomic, heal() finishes any tail
    f.rename(new Path(docsPath(root)), new Path(docsOldPath(root)))
    if (failDuringCompact == 2) throw new RuntimeException("failpoint: compact no-docs window")
    f.rename(new Path(docsNewPath(root)), new Path(docsPath(root)))
    if (failDuringCompact == 3) throw new RuntimeException("failpoint: compact before bucket moves")
    moveMissingBuckets(f, docsOldPath(root), docsPath(root))
    f.delete(new Path(mergesPath(root)), true)
    f.delete(new Path(docsOldPath(root)), true)
    f.delete(new Path(markerPath(root)), false)
  }

  /** The deduplicated corpus at `root`: docs whose id IS their live
    * cluster label (keep-min policy, exactly [[Dedup.dedupedCorpus]]).
    * Merge resolution is one broadcast expression over the tiny log —
    * the historic store is never rewritten. */
  def corpus(s: SparkSession, root: String, blockCols: Seq[String] = Seq("lang", "source")): DataFrame = {
    heal(s, root)
    val mm = mergeMap(s, root)
    withResolved(s.read.parquet(docsPath(root)), "cluster_id", "_live", mm)
      .filter(col("doc_id") === col("_live"))
      .select(col("doc_id") +: blockCols.map(col): _*)
  }

  /** Current (doc_id → live cluster label) assignment — d20's streaming
    * counterpart, derived from the store plus merge resolution. */
  def clusters(s: SparkSession, root: String): DataFrame = {
    heal(s, root)
    val mm = mergeMap(s, root)
    withResolved(s.read.parquet(docsPath(root)).select("doc_id", "cluster_id"),
      "cluster_id", "_live", mm)
      .select(col("doc_id"), col("_live").as("cluster_id"))
  }
}
