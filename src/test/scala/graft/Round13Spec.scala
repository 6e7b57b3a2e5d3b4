package graft

/** Round-13 first-pass additions: DirMemo content fingerprinting. */
class Round13Spec extends SparkSpec {

  test("DirMemo: rebuilds on content change, reuses on identical content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo").toFile
    val f = new java.io.File(dir, "t.parquet")
    java.nio.file.Files.write(f.toPath, "v1".getBytes)
    f.setLastModified(1000000L)

    var builds = 0
    def get(): String =
      graft.ops.DirMemo.cached(spark, dir.getPath, "spec") { builds += 1; s"b$builds" }

    assert(get() == "b1" && get() == "b1", "identical content must reuse")

    // same size, different mtime -> rebuild
    f.setLastModified(2000000L)
    assert(get() == "b2", "mtime change must invalidate")

    // different size, same mtime -> rebuild
    java.nio.file.Files.write(f.toPath, "longer".getBytes)
    f.setLastModified(2000000L)
    assert(get() == "b3", "size change must invalidate")

    // a NEW file in the dir -> rebuild
    java.nio.file.Files.write(new java.io.File(dir, "u.parquet").toPath, "x".getBytes)
    assert(get() == "b4", "added file must invalidate")
    assert(get() == "b4", "steady state reuses again")

    // distinct tags are independent entries
    val other = graft.ops.DirMemo.cached(spark, dir.getPath, "spec2") { "other" }
    assert(other == "other" && get() == "b4")
  }

  test("DirMemo: fingerprint walks dir-style datasets one level deep") {
    val root = java.nio.file.Files.createTempDirectory("graft_memo2").toFile
    val sub = new java.io.File(root, "part.parquet")
    sub.mkdir()
    java.nio.file.Files.write(new java.io.File(sub, "part-0").toPath, "a".getBytes)
    val fp1 = graft.ops.DirMemo.fingerprint(root.getPath)
    java.nio.file.Files.write(new java.io.File(sub, "part-1").toPath, "b".getBytes)
    val fp2 = graft.ops.DirMemo.fingerprint(root.getPath)
    assert(fp1 != fp2, "nested part file must change the fingerprint")
    assert(graft.ops.DirMemo.fingerprint(root.getPath) == fp2)
  }
}
