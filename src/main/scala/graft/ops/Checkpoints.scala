package graft.ops

import org.apache.spark.SparkContext

/** Single owner for the SESSION-GLOBAL reliable-checkpoint directory.
  *
  * `SparkContext.setCheckpointDir` is shared mutable state: every
  * in-flight query's pending `checkpoint()` calls resolve the dir at
  * materialization time, so one operator flipping it mid-run silently
  * redirects another's checkpoint files (measured hazard under the
  * concurrent Bench, where several checkpoint-capable operators run at
  * once). All graft operators install through here: last-setter-wins
  * semantics are unchanged, but an actual FLIP of an already-installed
  * dir is logged loudly so an accidental mid-run redirect surfaces in
  * the driver log instead of as scattered checkpoint files. Deployments
  * should install ONE dir at session start (Bench does) and leave
  * per-operator overrides to tests.
  */
object Checkpoints {

  /** Install `dir` as the session's checkpoint directory. */
  def install(sc: SparkContext, dir: String): Unit = synchronized {
    val prev = sc.getCheckpointDir
    // setCheckpointDir stores a qualified RANDOM CHILD of the given
    // dir, so "same dir?" = the stored child's parent path equals the
    // qualified new dir. (Raw substring containment would both miss
    // flips — '/tmp/a' is a substring of a child of '/tmp/ab' — and
    // fire spuriously on a differently-qualified but identical dir.)
    val p = new org.apache.hadoop.fs.Path(dir)
    val qualified = p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
    val flipped = prev.exists { pv =>
      val parent = new org.apache.hadoop.fs.Path(pv).getParent
      parent == null || parent != qualified
    }
    if (flipped)
      System.err.println(s"[graft] WARNING: checkpoint dir flip ${prev.get} -> $dir " +
        "(shared session state; in-flight lazy checkpoints will follow the new dir)")
    sc.setCheckpointDir(dir)
  }

  /** The session's installed checkpoint dir, if any — operators use
    * this as their default reliable-checkpoint location so a session
    * that installed one at startup gets executor-loss-safe, off-heap
    * checkpoints everywhere without per-call plumbing. */
  def installed(sc: SparkContext): Option[String] = sc.getCheckpointDir
}
