package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Runtime-registered custom table provider (reference:
  * `CustomTableScanNode`, datafusion.proto:126-132; registration path
  * `register_table`, client/src/context.rs:254-262) re-expressed as a Spark
  * DataSource V2 `TableProvider`.
  *
  * The table is a deterministic integer sequence `[start, end)` with derived
  * columns, so correctness is oracle-checkable (DuckDB `range()`), and it
  * demonstrates the two contracts that matter at 100 TB:
  *
  *   - `SupportsPushDownFilters`: comparisons on `id` narrow the generated
  *     range at *planning* time — the source never materializes pruned rows
  *     (the DSv2 analog of DataFusion's `TableProvider::scan` filters).
  *   - `SupportsPushDownRequiredColumns`: only requested columns are
  *     generated — a projection never pays for unused columns.
  *
  * Each slice of the range is an `InputPartition`, so the scan parallelizes
  * across executors like any file scan; no driver-side materialization.
  * Loadable both by class name (`spark.read.format(classOf[...].getName)`)
  * and by `DataSourceRegister` short name `graft-seq` (ServiceLoader entry in
  * META-INF/services).
  */
class GraftSeqSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-seq"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSeqSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftSeqTable(
      start = properties.getOrDefault("start", "0").toLong,
      end = properties.getOrDefault("end", "1000").toLong,
      slices = properties.getOrDefault("slices", "4").toInt)
}

object GraftSeqSource {
  /** `pad` exists to prove column pruning: no query reads it, and PlanSpec
    * asserts it never appears in the scan's read schema. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("pad", StringType, nullable = false)))

  /** Row derivations, shared by every reader so specs/oracles can restate
    * them: val = id * 0.25 (exact in binary and in DECIMAL(18,2)),
    * tag = 'g' || id % 10, pad = 'pad-' || id. */
  def value(id: Long): Double = id * 0.25
  def tag(id: Long): String = "g" + (id % 10)
  def pad(id: Long): String = "pad-" + id
}

class GraftSeqTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {

  override def name(): String = s"graft_seq[$start,$end)"

  override def schema(): StructType = GraftSeqSource.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSeqScanBuilder(start, end, slices)
}

/** Accumulates pushed state: `[lo, hi)` from id comparisons, the pruned
  * read schema from the projection. Unsupported predicates are returned as
  * residuals for Spark to evaluate post-scan — pushdown is best-effort,
  * never semantics-changing. */
class GraftSeqScanBuilder(start: Long, end: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftSeqSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1); true
      case GreaterThan("id", v: Number) =>
        lo = math.max(lo, v.longValue + 1); true
      case GreaterThanOrEqual("id", v: Number) =>
        lo = math.max(lo, v.longValue); true
      case LessThan("id", v: Number) =>
        hi = math.min(hi, v.longValue); true
      case LessThanOrEqual("id", v: Number) =>
        hi = math.min(hi, v.longValue + 1); true
      // every column is non-nullable, so IS NOT NULL is vacuously true
      case IsNotNull(_) => true
      case _ => false
    }
    accepted = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftSeqScan(lo, hi, slices, required)
}

class GraftSeqScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  /** Surfaces the narrowed range + pruned columns in the plan string so
    * plan-shape tests (and humans reading .explain) can verify pushdown. */
  override def description(): String =
    s"GraftSeq lo=$lo hi=$hi cols=[${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val total = math.max(0L, hi - lo)
    (0 until n).iterator
      .map(i => GraftSeqPartition(lo + i * total / n, lo + (i + 1) * total / n))
      .filter(p => p.lo < p.hi)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftSeqReaderFactory(required)
}

case class GraftSeqPartition(lo: Long, hi: Long) extends InputPartition

case class GraftSeqReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftSeqPartition]
    new GraftSeqReader(p.lo, p.hi, required)
  }
}

class GraftSeqReader(lo: Long, hi: Long, required: StructType)
    extends PartitionReader[InternalRow] {

  // one generator per *required* field — pruned columns are never computed
  private val gens: Array[Long => Any] = required.fieldNames.map {
    case "id" => (i: Long) => java.lang.Long.valueOf(i)
    case "val" => (i: Long) => java.lang.Double.valueOf(GraftSeqSource.value(i))
    case "tag" => (i: Long) => UTF8String.fromString(GraftSeqSource.tag(i))
    case "pad" => (i: Long) => UTF8String.fromString(GraftSeqSource.pad(i))
    case other => throw new IllegalArgumentException(s"unknown column: $other")
  }

  private var cur = lo - 1

  override def next(): Boolean = { cur += 1; cur < hi }

  override def get(): InternalRow =
    new GenericInternalRow(gens.map(g => g(cur)).asInstanceOf[Array[Any]])

  override def close(): Unit = ()
}
