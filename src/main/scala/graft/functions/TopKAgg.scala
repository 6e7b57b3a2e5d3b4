package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{toCol, toExpr}
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a TypedImperativeAggregate — the
  * TakeOrdered shape for per-query nearest-neighbor merges: each
  * map-side partial holds AT MOST k (score, id) entries per group, so
  * the exchange moves k rows per (group, partition) instead of the
  * group's full candidate set, and no sort of the full candidate set
  * ever runs. The rank-window formulation this complements keeps the
  * whole partition's candidates through an Exchange + Sort (Spark's
  * WindowGroupLimit prunes partials to k first, but still exchanges
  * row-shaped data and sorts per partition); at large query sets the
  * aggregate's fixed-size partial state is the plan that survives —
  * same discipline as VectorSumAgg replacing the posexplode groupBy.
  *
  * Input: struct(score double, id long). Output: array<struct<score,
  * id>> ordered best-first by (score desc, id asc) — java.lang.Double
  * total order (NaN greatest, so NaN scores rank FIRST like a DESC
  * sort in Spark), matching the (score desc, id asc) rank window it
  * replaces row for row. Null structs and null fields are skipped.
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.offer(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = { a.absorb(b); a }

  override def eval(buf: TopKBuf): Any = {
    val (scores, ids, n) = buf.sorted()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = new GenericInternalRow(Array[Any](scores(i), ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val (scores, ids, n) = buf.sorted()
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) { buf.offer(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
    copy(child = cs.head)
}

/** k-bounded insertion buffer ordered by (score desc, id asc) — the
  * same strict-improvement insertion scan as ExprHelpers.nearestBuckets
  * (O(k) per offer, k is single digits in every caller), no heap
  * allocation churn. */
final class TopKBuf(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var filled = 0

  private def beats(s: Double, id: Long, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && id < ids(i))
  }

  def offer(s: Double, id: Long): Unit = {
    if (filled == k && !beats(s, id, k - 1)) return
    var pos = if (filled < k) filled else k - 1
    while (pos > 0 && beats(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (filled < k) filled += 1
  }

  def absorb(other: TopKBuf): Unit = {
    var i = 0
    while (i < other.filled) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (scores, ids, n) best-first — the buffer is insertion-sorted. */
  def sorted(): (Array[Double], Array[Long], Int) = (scores, ids, filled)
}

object TopKAgg {
  /** `topk_by_score(struct(score, id), k)` → array<struct<score, id>>
    * best-first by (score desc, id asc), at most k entries. */
  def topKByScore(c: Column, k: Int): Column =
    toCol(TopKByScore(toExpr(c), k).toAggregateExpression())
}
