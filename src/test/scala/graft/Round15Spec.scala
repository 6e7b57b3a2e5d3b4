package graft

/** Round-15 fixes: DirMemo reentrancy (build forced OUTSIDE the
  * ConcurrentHashMap bin lock), concurrent build-once. */
class Round15Spec extends SparkSpec {

  test("DirMemo: a build may itself call DirMemo.cached (reentrant), any key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_re").toFile
    java.nio.file.Files.write(new java.io.File(dir, "t.bin").toPath, "v".getBytes)
    // nested cached calls from inside a build used to run INSIDE
    // ConcurrentHashMap.compute — a same-bin nested compute throws
    // IllegalStateException("Recursive update"). Exercise many tags so
    // same-bin collisions actually occur.
    (0 until 64).foreach { i =>
      val v = graft.ops.DirMemo.cached(spark, dir.getPath, s"outer$i") {
        val inner = graft.ops.DirMemo.cached(spark, dir.getPath, s"inner$i") { s"in$i" }
        s"out$i:" + inner
      }
      assert(v == s"out$i:in$i")
    }
  }

  test("d2_sigs: signatures are exactly the longs the d2 LSH pipeline bands") {
    import org.apache.spark.sql.functions._
    // the registered signature entry must agree with what minhashLsh
    // actually computes (same expression, same params) — pin the wiring
    // so the oracle keeps gating the real d2 arithmetic
    val sigs = graft.operators.Dedup.minhashSigs(spark, sf)
    assert(sigs.columns.toSeq == Seq("doc_id", "perm", "sig_val"))
    val perDoc = sigs.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSeq == Seq(16L), "16 perms per doc")
    // rebuild one doc's signature through the expression directly
    val one = Tables.documents(spark, sf)
      .select(col("doc_id"),
        split(regexp_replace(lower(col("text")), "\\s+", " "), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .withColumn("sig",
        graft.functions.VectorExprs.minhashShingleSig(col("ws"), 3, 16))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("perm", "sig_val")))
    assert(sigs.exceptAll(one).count() == 0 && one.exceptAll(sigs).count() == 0)
  }

  test("DirMemo: concurrent first callers build exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_cc").toFile
    java.nio.file.Files.write(new java.io.File(dir, "t.bin").toPath, "v".getBytes)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            graft.ops.DirMemo.cached(spark, dir.getPath, "cc") {
              Thread.sleep(50); s"b${builds.incrementAndGet()}"
            }
        })
      }
      val got = futs.map(_.get()).toSet
      assert(got == Set("b1"), s"built ${builds.get()} times: $got")
    } finally pool.shutdown()
  }
}
