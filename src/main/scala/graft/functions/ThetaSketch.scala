package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{toCol, toExpr}
import org.apache.spark.sql.types._

/** KMV/theta sketch (Beyer et al. 2007 / the Apache DataSketches theta
  * family, public) as a TypedImperativeAggregate: per group, retain the
  * k smallest DISTINCT 64-bit hashes of the values. The sketch supports
  * the SET OPERATIONS the HLL (d13) cannot: union, intersection, and
  * difference cardinality estimates between independently-built
  * sketches — the cross-corpus / cross-snapshot overlap estimator a
  * 100 TB pipeline uses where exact set intersection would shuffle both
  * corpora.
  *
  * Properties:
  *  - k-min-of-distinct is ORDER-FREE: any partitioning/merge order
  *    yields the identical sketch (spec'd), so partial aggregation and
  *    AQE re-planning are safe and results are deterministic.
  *  - Exact below k: a group with ≤ k distinct values keeps every hash
  *    and all estimates are exact (64-bit collisions ≈ 0).
  *  - Above k: distinct ≈ (k−1)/θ with rsd ≈ 1/√(k−2); intersection
  *    via the common-θ rule (count shared hashes below min θ).
  *  - O(k) state per (group, partition); merge = union + retrim.
  */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, s"theta sketch needs k >= 16, got $k")

  type Buf = java.util.TreeSet[java.lang.Long]

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // CLAUDE.md: ctor must not touch child.dataType (first construction
  // wraps an unresolved column) — resolve it lazily at eval time
  @transient private lazy val childType: DataType = child.dataType

  override def createAggregationBuffer(): Buf =
    new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(a, b))

  private def add(buf: Buf, h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.remove(buf.last()) // evict the largest (unsigned)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, XxHash64Function.hash(v, childType, 42L))
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  /** The retained hashes in ascending UNSIGNED order — the sketch
    * itself; [[ThetaSketch]]'s estimators consume it. */
  override def eval(buf: Buf): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (1 to n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = cs.head)
}

object ThetaSketch {

  /** Column function: `theta_sketch(col, k)` → array<long> of the k
    * smallest distinct hashes in unsigned order. */
  def sketch(c: Column, k: Int): Column =
    toCol(ThetaSketchAgg(toExpr(c), k).toAggregateExpression())

  private def toUnit(h: Long): Double =
    if (h >= 0) h.toDouble / 1.8446744073709552e19
    else (h.toDouble + 1.8446744073709552e19) / 1.8446744073709552e19

  /** θ of a materialized sketch: 1.0 while exact (unsaturated), else
    * the unit position of the k-th smallest hash. */
  def theta(sk: Array[Long], k: Int): Double =
    if (sk.length < k) 1.0 else toUnit(sk.last)

  /** Distinct-count estimate: exact below k, (k−1)/θ above. */
  def estimateDistinct(sk: Array[Long], k: Int): Double =
    if (sk.length < k) sk.length.toDouble else (k - 1).toDouble / theta(sk, k)

  /** Union sketch of two sketches built with the same k (k smallest
    * distinct of the merged stream — exactly the sketch a single pass
    * over both inputs would build). */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val set = new java.util.TreeSet[java.lang.Long](
      (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compareUnsigned(x, y))
    a.foreach(set.add(_))
    b.foreach(set.add(_))
    while (set.size > k) set.remove(set.last())
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    out
  }

  /** Intersection-cardinality estimate (common-θ rule): count hashes
    * present in BOTH sketches below θ = min(θa, θb), scale by 1/θ.
    * Exact when both sides are unsaturated. */
  def estimateIntersection(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val bs = b.toSet
    // th = 1.0 (both exact) admits every hash; below, the strict `<`
    // excludes the boundary k-th value, matching the (k−1)/θ estimator
    val common = a.count(h => (th >= 1.0 || toUnit(h) < th) && bs.contains(h))
    common / th
  }

  /** Jaccard estimate from the sketch pair: |∩| / |∪| under the same
    * common-θ rule. */
  def estimateJaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
    val u = estimateDistinct(union(a, b, k), k)
    if (u == 0.0) 0.0 else estimateIntersection(a, b, k) / u
  }
}
