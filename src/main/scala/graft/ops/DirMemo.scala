package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-(session, data-dir) memo with CONTENT fingerprinting — the one
  * cache discipline behind every "whichever registered entry runs
  * first pays the shuffles once" memo (d44/d52 LM counts, d59/d60
  * embeddings, d62/d63 containment pairs, the shared token table).
  *
  * Why not a bare ConcurrentHashMap keyed on (session, dir): the
  * harness driver regenerates a dir's parquet in place between rounds,
  * and a long-lived session would then serve stale lazily-checkpointed
  * frames forever. Every lookup here re-fingerprints the dir (name,
  * size, mtime of each file, one directory level deep — parquet
  * "files" in this harness are single files, but dir-style datasets
  * fingerprint their part files) and rebuilds on any change. Lookups
  * also sweep entries owned by stopped sessions so a bounced session
  * does not pin its frames.
  *
  * Cost: one directory listing per lookup (≤ a dozen stat calls on an
  * sf dir) — noise next to the query it guards. Values are small
  * driver-side handles (DataFrames / count-table structs), never data.
  */
object DirMemo {
  /** One-shot build cell: installed atomically under the map's bin lock,
    * FORCED outside it (lazy val's own monitor gives build-once for
    * concurrent first callers). Keeps a build that itself calls
    * [[cached]] for another key — tokLong consumed by memoized entries —
    * from running inside ConcurrentHashMap.compute, where a nested
    * compute on the same bin throws IllegalStateException. */
  private final class Holder(build: () => AnyRef) { lazy val value: AnyRef = build() }
  private final case class Entry(session: SparkSession, fp: String, holder: Holder)
  private val cache = new ConcurrentHashMap[(String, String), Entry]()

  /** Content fingerprint of `dir`: every file's (relative name, size,
    * mtime), one level of directory recursion, order-pinned. A missing
    * dir fingerprints distinctly (so its appearance invalidates). */
  def fingerprint(dir: String): String = {
    def stat(f: java.io.File, prefix: String): Seq[String] =
      if (f.isDirectory)
        f.listFiles() match {
          case null => Seq(s"$prefix/:unreadable")
          case kids => kids.sortBy(_.getName).toSeq
            .flatMap(k => stat(k, s"$prefix/${k.getName}"))
        }
      else Seq(s"$prefix:${f.length}:${f.lastModified}")
    val root = new java.io.File(dir)
    val items = if (root.exists) stat(root, "") else Seq("<missing>")
    val md = java.security.MessageDigest.getInstance("MD5")
    java.util.Base64.getEncoder.encodeToString(
      md.digest(items.mkString("\n").getBytes("UTF-8")))
  }

  /** Memoized `build`, keyed on (dir, tag), valid while the owning
    * session is this one (and alive) and the dir's content fingerprint
    * is unchanged. Atomic per key: concurrent first callers (the bench
    * runs 8 entries in flight) build once. */
  def cached[T <: AnyRef](s: SparkSession, dir: String, tag: String)(build: => T): T = {
    sweepStopped()
    val fp = fingerprint(dir)
    val thunk = () => (build: AnyRef)
    cache.compute((dir, tag), { (_, cur) =>
      if (cur != null && (cur.session eq s) && cur.fp == fp) cur
      else Entry(s, fp, new Holder(thunk))
    }).holder.value.asInstanceOf[T]
  }

  private def sweepStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getValue.session.sparkContext.isStopped) it.remove()
    }
  }
}
