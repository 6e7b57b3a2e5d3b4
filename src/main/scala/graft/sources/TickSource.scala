package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
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
      properties.getOrDefault("hotfraction", "0.0").toDouble)
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

class TickTable(rows: Long, partitions: Int, seed: Long, hotFraction: Double)
    extends Table with SupportsRead {
  override def name(): String = s"graft-ticks($rows)"
  override def schema(): StructType = TickSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new TickScan(rows, partitions, seed, hotFraction)
}

class TickScan(rows: Long, partitions: Int, seed: Long, hotFraction: Double)
    extends Scan with Batch {
  override def readSchema(): StructType = TickSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      TickRange(p * per, math.min((p + 1) * per, rows), seed, hotFraction): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new TickReaderFactory
}

case class TickRange(start: Long, end: Long, seed: Long,
    hotFraction: Double) extends InputPartition

class TickReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[TickRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = {
        val h = TickSource.mix(r.seed, i)
        row.update(0, i)
        // µs timestamps starting 2024-01-01, one tick per ~250ms
        row.update(1, 1704067200000000L + i * 250000L)
        // hotFraction of rows hammer key 0 (skew-testing knob)
        row.update(2,
          if (r.hotFraction > 0 &&
              java.lang.Math.floorMod(h >>> 32, 1000L) < (r.hotFraction * 1000).toLong) 0L
          else java.lang.Math.floorMod(h, 150L))
        row.update(3, TickSource.types(java.lang.Math.floorMod(h >>> 8, 5L).toInt))
        row.update(4, java.lang.Math.floorMod(h >>> 16, 50000L) / 100.0)
        row
      }
      override def close(): Unit = ()
    }
  }
}
