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
