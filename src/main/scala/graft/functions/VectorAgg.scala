package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toCol, toExpr}
import org.apache.spark.sql.types._

/** Element-wise sum of float/double vectors as a
  * TypedImperativeAggregate — the centroid/mean primitive of every
  * embedding pipeline (k-means update step, cluster centroids, mean
  * pooling). O(dim) state per group, map-side partial aggregation, so
  * the shuffle moves one vector per (partition, group) instead of one
  * row per (vector, dimension) — replaces the posexplode +
  * per-dimension groupBy formulation (2 shuffles + dim× row blowup)
  * with a single agg.
  *
  * Null vectors are ignored; mismatched lengths throw (corrupt input
  * should fail loudly, not mis-sum). A null buffer is the
  * "uninitialized" sentinel, so a zero-length input vector is a REAL
  * dimension: a group of only empty vectors sums to an empty array, and
  * an empty vector mixed with d-dimensional ones throws the mismatch
  * error regardless of arrival order.
  *
  * ORDER-FREE by construction (the d56 margin discipline): each element
  * quantizes once to an integer 1e-6-unit long (Math.round(x·1e6)) and
  * the accumulation is exact long addition, so ANY partitioning, merge
  * order, or AQE re-plan yields the bit-identical sum — k-means
  * centroids and PQ codebooks become reproducible builds instead of
  * partition-order accidents, and a cross-engine replay is two IEEE
  * ops (su·1e-6). The 1e-6 grid loses ~1e-7 relative precision on
  * unit-scale embeddings — far below centroid noise — and overflows
  * only past ~1e11 rows·unit-scale per group (require-guarded).
  *
  * array<long> input is treated as ALREADY-quantized units
  * (VectorExprs.QuantizeUnits) — update() becomes a pure checked long
  * add. Measured r17: routing the internal k-means/PQ loops through a
  * pre-quantized column is perf-neutral-to-worse (see QuantizeUnits),
  * so this path serves callers whose vectors already live as units.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // lazy: the first construction wraps an UNRESOLVED column; by the
  // time update() runs we are the resolved/bound copy
  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"vector_sum expects array<float|double>, got $other")
  }

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType)

  override def createAggregationBuffer(): Array[Long] = null

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf == null) new Array[Long](n) else buf
    if (acc.length != n)
      throw new IllegalStateException(
        s"vector_sum: mismatched vector lengths ${acc.length} vs $n")
    var i = 0
    elemType match {
      case FloatType =>
        while (i < n) { acc(i) = addExact(acc(i), Math.round(arr.getFloat(i).toDouble * 1e6)); i += 1 }
      case DoubleType =>
        while (i < n) { acc(i) = addExact(acc(i), Math.round(arr.getDouble(i) * 1e6)); i += 1 }
      case LongType =>
        // PRE-quantized 1e-6 units (VectorExprs.QuantizeUnits):
        // a pure checked long add — same grid, bit-identical sums
        while (i < n) { acc(i) = addExact(acc(i), arr.getLong(i)); i += 1 }
      case other => throw new IllegalStateException(s"vector_sum: unsupported element $other")
    }
    acc
  }

  // the overflow guard must live on update() too: a single-task group
  // (one file, one partition) never merges, so a merge-only check
  // would let the dominant accumulation path wrap silently
  private def addExact(a: Long, b: Long): Long = {
    val s = a + b
    if ((a >= 0) == (b >= 0) && (s >= 0) != (a >= 0))
      throw new IllegalStateException(
        "vector_sum: unit accumulator overflow (group > ~1e11 unit-scale rows)")
    s
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a == null) return b
    if (b == null) return a
    if (a.length != b.length)
      throw new IllegalStateException(
        s"vector_sum: mismatched vector lengths ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) = addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null
    else new GenericArrayData(buf.map(u => u.toDouble * 1e-6))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // -1 length = the uninitialized (null-buffer) sentinel
    if (buf == null) out.writeInt(-1)
    else { out.writeInt(buf.length); buf.foreach(out.writeLong) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) null else Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = cs.head)
}

object VectorAgg {
  /** `vector_sum(vec)` → array<double>: element-wise sum per group. */
  def vectorSum(c: Column): Column =
    toCol(VectorSumAgg(toExpr(c)).toAggregateExpression())
}
