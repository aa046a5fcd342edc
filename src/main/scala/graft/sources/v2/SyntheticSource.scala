package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic table as a full DataSource V2 connector
  * (SURVEY.md §2.1 source-tier extension): the TPC-dbgen pattern — data
  * generated at the executors from a row-id range, never materialized —
  * exposed through the modern connector API with BOTH optimizer
  * integrations a production connector needs:
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): the
  *    reader synthesizes only the projected columns;
  *  - **filter pushdown** (`SupportsPushDownFilters`): id-range
  *    predicates SHRINK the generated range before partition planning,
  *    so `WHERE id >= N` reads (hi-N)/hi of the table — source-level
  *    partition pruning, visible in `Scan.description()` and asserted
  *    in SyntheticSourceSpec. Pushed filters are also left in the
  *    residual (non-exhaustive pushdown), so Spark re-applies them —
  *    the connector can only over-read, never drop rows.
  *
  * Row content is a pure function of the row id (val = (id·37 mod
  * 1000)/100, label = 'L' ++ id mod 7), so the source is exactly
  * reproducible in any engine from a `range()` — which is how the
  * DuckDB oracle checks a query through this connector end-to-end
  * (`synth_source_agg`).
  *
  * Scale posture: |parts| input partitions of contiguous id ranges,
  * one lazy row generator per partition — no driver materialization,
  * no shuffle; generation cost is proportional to the PRUNED range.
  */
class SyntheticProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(4))
}

object SyntheticTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("label", StringType, nullable = false)))

  /** The deterministic row function — shared by the reader and the
    * spec's reference implementation. */
  def valOf(id: Long): Double = (id * 37 % 1000) / 100.0
  def labelOf(id: Long): String = "L" + (id % 7)
}

class SyntheticTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows rows)"
  override def schema(): StructType = SyntheticTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts)
}

class SyntheticScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = SyntheticTable.schema

  /** Accept id-range filters by shrinking [lo, hi); everything is also
    * returned as residual so Spark re-evaluates (over-read-only
    * contract). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect {
      case f @ GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); f
      case f @ GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); f
      case f @ LessThan("id", v: Long) => hi = math.min(hi, v); f
      case f @ LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); f
      case f @ EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); f
    }
    filters // non-exhaustive pushdown: Spark re-applies all of them
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SyntheticScan(lo, hi, parts, required)
}

case class SyntheticRange(lo: Long, hi: Long) extends InputPartition

class SyntheticScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticScan[range=[$lo,$hi), cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val per = math.max(1L, (span + parts - 1) / parts)
    (lo until hi by per).map(s =>
      SyntheticRange(s, math.min(s + per, hi)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

class SyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SyntheticRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      // column generators bound once per partition, in pruned order
      private val gens: Array[Long => Any] = required.fieldNames.map {
        case "id" => (i: Long) => i
        case "val" => (i: Long) => SyntheticTable.valOf(i)
        case "label" => (i: Long) => UTF8String.fromString(SyntheticTable.labelOf(i))
      }
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(id)))
      override def close(): Unit = ()
    }
  }
}
