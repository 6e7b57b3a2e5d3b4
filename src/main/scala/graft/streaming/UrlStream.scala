package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TTLConfig, ValueState}

/** Streaming twin of the d55 URL curation
  * ([[graft.operators.Curation.urlFilterOf]]): the crawl-intake shape,
  * where pages arrive continuously and the keep-one-per-URL decision
  * must hold across micro-batches. Normalization is the SAME narrow
  * per-row chain as batch (shared via Curation.normalizeUrlCols), so
  * the two paths cannot drift; the stateful part is keep-min per
  * normalized URL.
  *
  * Emission contract (Update mode): whenever a key receives new
  * members, EVERY member of that key is re-emitted with the updated
  * duplicate count and keep flag — the count changed for all of them,
  * and a smaller doc_id may have demoted the previous canonical (the
  * correction a keep-first streaming dedup fundamentally needs).
  * Consumers take the latest row per doc_id; n_dups is strictly
  * monotone per key, so "latest" is simply the row with the max
  * n_dups. State per key = one (min_id, n) value + the member list
  * (bounded by the key's duplicate count — the same bound the batch
  * groupBy carries).
  *
  * Reference analog: stream.py's continuous intake loop, applied to
  * the corpus-curation layer instead of tick quotes.
  */
object UrlStream {

  case class UrlIn(doc_id: Long, url: String, url_norm: String, domain: String)
  case class UrlOut(doc_id: Long, url: String, url_norm: String, domain: String,
      n_dups: Long, keep: Boolean)
  case class UrlAgg(min_id: Long, n: Long)
  case class Member(doc_id: Long, url: String)

  class UrlDedupProcessor(blocklist: Set[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, UrlIn, UrlOut] {
    @transient private var agg: ValueState[UrlAgg] = _
    @transient private var members: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[UrlAgg]("agg",
        Encoders.product[UrlAgg], TTLConfig.NONE)
      members = getHandle.getListState[Member]("members",
        Encoders.product[Member], TTLConfig.NONE)
    }

    override def handleInputRows(urlNorm: String, rows: Iterator[UrlIn],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UrlOut] = {
      val fresh = rows.toArray
      if (fresh.isEmpty) return Iterator.empty
      val domain = fresh.head.domain
      var minId = if (agg.exists()) agg.get().min_id else Long.MaxValue
      var n = if (agg.exists()) agg.get().n else 0L
      fresh.foreach { r => n += 1; if (r.doc_id < minId) minId = r.doc_id }
      agg.update(UrlAgg(minId, n))
      members.appendList(fresh.map(r => Member(r.doc_id, r.url)))
      val blocked = blocklist.contains(domain)
      // materialize the re-emission BEFORE returning: a lazy iterator
      // over the state handle would read outside the key's context
      // (the packStream lesson, on the output side)
      val out = members.get()
        .map(m => UrlOut(m.doc_id, m.url, urlNorm, domain, n,
          !blocked && m.doc_id == minId))
        .toArray
      out.iterator
    }
  }

  /** Build the streaming URL filter over a streaming (doc_id, url)
    * frame. TimeMode.None: URL dedup has no event-time semantics —
    * arrival order is irrelevant to the final keep set (min is
    * order-free), which the parity spec proves under shuffled replay. */
  def urlFilterStream(stream: DataFrame, blocklist: Seq[String]): Dataset[UrlOut] = {
    import stream.sparkSession.implicits._
    graft.operators.Curation.normalizeUrlCols(stream)
      .select("doc_id", "url", "url_norm", "domain").as[UrlIn]
      .groupByKey(_.url_norm)
      .transformWithState(new UrlDedupProcessor(blocklist.toSet),
        TimeMode.None(), OutputMode.Update())
  }
}
