package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftseq` — a full DataSourceV2 read connector (SURVEY §2.11 X213x):
  * the TableProvider → Table → ScanBuilder → Batch → PartitionReader
  * surface a library must implement to expose a NEW storage system to
  * Spark, demonstrated on a deterministic synthetic table so every row is
  * hash-checkable against a closed-form DuckDB formula. Three columns:
  * `id` (0 ≤ id < n), `val` = Knuth-hash bucket (id·2654435761) mod 1000
  * computed in exact 64-bit arithmetic, `grp` = 'g' ∥ (id mod 10).
  *
  * The connector implements BOTH optimizer hooks a real source needs:
  *  - [[SupportsPushDownFilters]]: id-range predicates (>, >=, <, <=, =)
  *    are consumed into the scan's [lo, hi) bounds — rows outside are
  *    NEVER GENERATED, the DSv2 analogue of parquet row-group pruning.
  *    Accepted filters are reported back so `.explain` shows
  *    PushedFilters and the planner drops the residual Filter node.
  *  - [[SupportsPushDownRequiredColumns]]: the reader materializes only
  *    the pruned schema (a `val`-only projection never builds `grp`
  *    strings — column pruning reaching the row generator).
  *
  * Partition planning splits the post-pushdown range into `slices` equal
  * chunks, so parallelism tracks the PRUNED volume — a filter to 1 % of
  * the id space plans 1 % of the work. SourcesSpec asserts both hooks
  * fire in the physical plan; q26 hash-checks an aggregate over a pushed
  * range against the closed-form oracle.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqTable(properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object SeqSource {
  val schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("val", LongType, nullable = false)
    .add("grp", StringType, nullable = false)

  /** Knuth multiplicative hash bucket — exact in Long arithmetic (the
    * product wraps mod 2⁶⁴; floorMod re-centers the sign), so the DuckDB
    * twin states it in HUGEINT mod 2⁶⁴ and matches bit-for-bit.
    */
  def valOf(id: Long): Long = Math.floorMod(id * 2654435761L, 1000L)
}

private class SeqTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graftseq($n)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices)
}

private class SeqScanBuilder(n: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = n
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), slices, required)
}

private class SeqScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftseq range [$lo, $hi) cols ${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val total = hi - lo
    val per = math.max(1L, (total + slices - 1) / slices)
    Iterator.iterate(lo)(_ + per).takeWhile(_ < hi)
      .map(s => SeqSlice(s, math.min(hi, s + per)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

private case class SeqSlice(lo: Long, hi: Long) extends InputPartition

private class SeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[SeqSlice]
    new PartitionReader[InternalRow] {
      private var id = s.lo - 1
      override def next(): Boolean = { id += 1; id < s.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => id
          case "val" => SeqSource.valOf(id)
          case "grp" => UTF8String.fromString("g" + (id % 10))
        })
      override def close(): Unit = ()
    }
  }
}
