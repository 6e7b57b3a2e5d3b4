package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic tick generator —
  * `spark.read.format("graft-ticks").option("rows", n)
  * .option("partitions", p).load()`.
  *
  * Reference analog: the streaming collector's tick feed
  * (services/schwab_stream.py) as a load-testable source. Each input
  * partition generates its row range independently (no driver
  * materialization), so the source scales linearly with partitions —
  * the DSv2 contract a real connector (market-data API, message bus)
  * would implement, with the network read swapped in for the splitmix
  * generator.
  *
  * Implements the two pushdowns that matter at 100 TB:
  *  - range pushdown on `event_id` (SupportsPushDownFilters): =, <, <=,
  *    >, >= conjuncts narrow the generated [lo, hi) range, so a probe
  *    query GENERATES only its slice instead of filtering a full scan —
  *    the analog of a time-range predicate reaching a market-data API.
  *    Every other predicate is returned as a residual for Spark to
  *    evaluate. CONTRACT: a filter this source accepts (i.e. does NOT
  *    return from pushFilters) is trusted by Spark as exactly applied
  *    and is NOT re-evaluated post-scan — so accepted filters must be
  *    (and here are) applied exactly: the [lo, hi) range generation is
  *    precise by construction. Any future approximate pushdown (e.g. a
  *    bloom-filter probe) MUST keep its filter in the residual list.
  *  - column pruning (SupportsPushDownRequiredColumns): the reader
  *    fills only the projected fields — `ReadSchema` in `.explain`
  *    shows exactly what a 2-column projection costs.
  */
class TickSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ticks"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TickSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TickTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("seed", "42").toLong,
      properties.getOrDefault("hotfraction", "0.0").toDouble,
      properties.getOrDefault("rowsperbatch", "1000").toLong)
}

object TickSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val types: Array[UTF8String] =
    Array("click", "view", "purchase", "signup", "error").map(UTF8String.fromString)

  def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

class TickTable(rows: Long, partitions: Int, seed: Long, hotFraction: Double,
    rowsPerBatch: Long = 1000L)
    extends Table with SupportsRead {
  override def name(): String = s"graft-ticks($rows)"
  override def schema(): StructType = TickSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TickScanBuilder(rows, partitions, seed, hotFraction, rowsPerBatch)
}

class TickScanBuilder(rows: Long, partitions: Int, seed: Long,
    hotFraction: Double, rowsPerBatch: Long = 1000L)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var accepted = Array.empty[Filter]
  private var required: StructType = TickSource.schema

  private def asLong(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue())
    case i: java.lang.Integer => Some(i.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // The +1 adjustments for GreaterThan / LessThanOrEqual / EqualTo
    // overflow at v == Long.MaxValue; since ids live in [0, rows) and
    // rows <= Long.MaxValue, the id Long.MaxValue is never generated, so
    // `> MaxValue` and `= MaxValue` are exactly-empty (lo := MaxValue >=
    // hi) and `<= MaxValue` is exactly a no-op — all still exact, never
    // approximate, so they may stay accepted.
    val residual = filters.filter {
      case EqualTo("event_id", v) if asLong(v).isDefined =>
        val x = asLong(v).get
        lo = math.max(lo, x)
        if (x != Long.MaxValue) hi = math.min(hi, x + 1)
        false
      case GreaterThan("event_id", v) if asLong(v).isDefined =>
        val x = asLong(v).get
        lo = if (x == Long.MaxValue) Long.MaxValue else math.max(lo, x + 1)
        false
      case GreaterThanOrEqual("event_id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); false
      case LessThan("event_id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get); false
      case LessThanOrEqual("event_id", v) if asLong(v).isDefined =>
        val x = asLong(v).get
        if (x != Long.MaxValue) hi = math.min(hi, x + 1)
        false
      case _ => true
    }
    accepted = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(s: StructType): Unit = required = s
  override def build(): Scan =
    new TickScan(math.max(lo, 0L), math.max(hi, math.max(lo, 0L)), partitions,
      seed, hotFraction, required, rowsPerBatch)
}

object TickScan {
  /** Split [lo, hi) into ≤ `partitions` contiguous generator ranges. */
  def ranges(lo: Long, hi: Long, partitions: Int, seed: Long,
      hotFraction: Double, ords: Array[Int]): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0) return Array.empty
    val per = (n + partitions - 1) / partitions
    (0 until partitions).flatMap { p =>
      val s = lo + p * per
      val e = math.min(lo + (p + 1) * per, hi)
      if (s < e) Some(TickRange(s, e, seed, hotFraction, ords): InputPartition)
      else None
    }.toArray
  }
}

class TickScan(lo: Long, hi: Long, partitions: Int, seed: Long,
    hotFraction: Double, required: StructType, rowsPerBatch: Long = 1000L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-ticks range=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    // ordinals of the required columns in the full schema — the reader
    // computes only these
    TickScan.ranges(lo, hi, partitions, seed, hotFraction,
      required.fieldNames.map(TickSource.schema.fieldIndex))
  override def createReaderFactory(): PartitionReaderFactory = new TickReaderFactory
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TickMicroBatchStream(lo, hi, partitions, seed, hotFraction,
      required, rowsPerBatch)
}

/** Micro-batch replay of the same deterministic tick range: offsets are
  * plain row indexes, each trigger admits `rowsPerBatch` more rows
  * until `hi`. The offset log gives exactly-once replay across
  * restarts — the harness shape of a real feed connector (message-bus
  * cursor / websocket sequence number in place of the row index).
  * Restart-safe by construction: the engine hands the checkpointed
  * start offset to [[latestOffset(Offset, ReadLimit)]]
  * (SupportsAdmissionControl), so progress never depends on this
  * object's in-memory state. */
class TickMicroBatchStream(lo: Long, hi: Long, partitions: Int, seed: Long,
    hotFraction: Double, required: StructType, rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  require(rowsPerBatch > 0, s"rowsperbatch must be positive, got $rowsPerBatch")
  private case class TickOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }
  override def initialOffset(): Offset = TickOffset(lo)
  override def deserializeOffset(json: String): Offset = TickOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    TickOffset(math.min(hi, start.asInstanceOf[TickOffset].n + rowsPerBatch))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    TickScan.ranges(start.asInstanceOf[TickOffset].n, end.asInstanceOf[TickOffset].n,
      partitions, seed, hotFraction,
      required.fieldNames.map(TickSource.schema.fieldIndex))
  override def createReaderFactory(): PartitionReaderFactory = new TickReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class TickRange(start: Long, end: Long, seed: Long,
    hotFraction: Double, ordinals: Array[Int]) extends InputPartition

class TickReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[TickRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        r.ordinals.length)
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = {
        val h = TickSource.mix(r.seed, i)
        var o = 0
        while (o < r.ordinals.length) {
          row.update(o, r.ordinals(o) match {
            case 0 => i
            // µs timestamps starting 2024-01-01, one tick per ~250ms
            case 1 => 1704067200000000L + i * 250000L
            // hotFraction of rows hammer key 0 (skew-testing knob)
            case 2 =>
              if (r.hotFraction > 0 &&
                  java.lang.Math.floorMod(h >>> 32, 1000L) < (r.hotFraction * 1000).toLong) 0L
              else java.lang.Math.floorMod(h, 150L)
            case 3 => TickSource.types(java.lang.Math.floorMod(h >>> 8, 5L).toInt)
            case 4 => java.lang.Math.floorMod(h >>> 16, 50000L) / 100.0
          })
          o += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
