package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc,
  Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
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
      Option(properties.get("parts")).map(_.toInt).getOrElse(4),
      Option(properties.get("batchRows")).map(_.toLong).getOrElse(100L))
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

class SyntheticTable(rows: Long, parts: Int, batchRows: Long = 100L)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows rows)"
  override def schema(): StructType = SyntheticTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts, batchRows)
}

class SyntheticScanBuilder(rows: Long, parts: Int, batchRows: Long = 100L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = SyntheticTable.schema
  private var aggs = Array.empty[AggregateFunc]

  /** Consume id-range filters EXHAUSTIVELY by shrinking [lo, hi) — the
    * shrink is provably exact (generation emits precisely [lo, hi)), so
    * these filters need no re-application, which in turn lets Spark
    * push aggregates below them (V2 pushes aggregates only when no
    * post-scan filter remains). Anything else stays residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown: ungrouped COUNT(*) / MIN(id) / MAX(id) are
    * answered ANALYTICALLY from the (filter-shrunk) range — O(1), zero
    * rows generated. Complete pushdown: the single returned row IS the
    * final answer, no partial re-aggregation above the scan. */
  private def idRef(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case r: NamedReference => r.fieldNames.sameElements(Array("id"))
    case _ => false
  }
  private def supportedAgg(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case m: Min => idRef(m.column)
    case m: Max => idRef(m.column)
    case _ => false
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.forall(supportedAgg)

  override def pushAggregation(agg: Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      aggs = agg.aggregateExpressions; true
    }

  /** Limit pushdown: generation is the ordered range [lo, hi), so a
    * LIMIT after exhaustively-consumed filters shrinks the range
    * EXACTLY — n rows generated instead of n scanned-and-dropped. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit); true
  }
  override def isPartiallyPushed: Boolean = false

  /** Top-N pushdown for `ORDER BY id ASC LIMIT n`: the reader already
    * emits ids ascending, so the shrunk prefix IS the answer in order —
    * full pushdown, Spark drops its sort entirely. Any other ordering
    * declines (a descending emission would need a reversed reader;
    * correctness first). */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean =
    orders.length == 1 && idRef(orders.head.expression()) &&
      orders.head.direction() ==
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING && {
      hi = math.min(hi, lo + limit); true
    }

  override def build(): Scan =
    if (aggs.nonEmpty) new SyntheticAggScan(lo, hi, aggs)
    else new SyntheticScan(lo, hi, parts, required, batchRows)
}

/** O(1) scan for completely-pushed ungrouped aggregates: one partition,
  * one row, values computed from range arithmetic — no row generation
  * at all. */
class SyntheticAggScan(lo: Long, hi: Long, aggs: Array[AggregateFunc])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticAggScan[range=[$lo,$hi), aggs=${aggs.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticRange(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = aggs.map {
      case _: CountStar => math.max(0L, hi - lo)
      case _: Min => if (hi > lo) lo else null
      case _: Max => if (hi > lo) hi - 1 else null
      case f => throw new IllegalStateException(s"unpushable agg $f")
    }
    new SyntheticAggReaderFactory(values)
  }
}

class SyntheticAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(values.clone())
      override def close(): Unit = ()
    }
}

case class SyntheticRange(lo: Long, hi: Long) extends InputPartition

class SyntheticScan(lo: Long, hi: Long, parts: Int, required: StructType,
    batchRows: Long = 100L) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticScan[range=[$lo,$hi), cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    SyntheticScan.splitRange(lo, hi, parts)

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new SyntheticMicroBatchStream(lo, hi, parts, batchRows, required)
}

object SyntheticScan {
  def splitRange(lo: Long, hi: Long, parts: Int): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val per = math.max(1L, (span + parts - 1) / parts)
    (lo until hi by per).map(s =>
      SyntheticRange(s, math.min(s + per, hi)): InputPartition).toArray
  }
}

/** Streaming offset: the next row id to emit. */
case class SynthOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** The WRITE-side of the source tier already proves the V2 batch
  * write half (LineSink); this is the STREAMING READ half: the
  * synthetic range served as a rate-limited micro-batch stream with
  * real offset tracking. Offsets are row positions; admission control
  * caps each trigger at `batchRows` (ReadMaxRows — the engine can
  * override per trigger), `reportLatestOffset` exposes the true end so
  * `processAllAvailable`/AvailableNow know when the range is drained,
  * and partition planning reuses the batch splitter over
  * [start, end). Exactly-once falls out of the V2 contract: the engine
  * checkpoints committed offsets, a restarted query resumes from the
  * checkpoint, and `planInputPartitions(start, end)` regenerates any
  * uncommitted batch IDENTICALLY (generation is a pure function of the
  * id range) — asserted across a mid-stream kill in
  * SyntheticStreamSpec. */
class SyntheticMicroBatchStream(lo: Long, hi: Long, parts: Int,
    batchRows: Long, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = SynthOffset(lo)
  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].pos
    val step = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => batchRows
    }
    SynthOffset(math.min(hi, s + math.max(1L, step)))
  }

  override def reportLatestOffset(): Offset = SynthOffset(hi)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    SyntheticScan.splitRange(start.asInstanceOf[SynthOffset].pos,
      end.asInstanceOf[SynthOffset].pos, parts)

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
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
