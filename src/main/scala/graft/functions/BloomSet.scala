package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership test against a serialized `org.apache.spark.util.sketch
  * .BloomFilter` (Spark's PUBLIC sketch API — the same filter
  * `df.stat.bloomFilter` builds and the engine's own runtime join
  * filters ship around): `bloom_contains(bloomBytes, str)`.
  *
  * The bloom argument must be FOLDABLE (a literal): the filter is then
  * deserialized ONCE per task into a transient lazy val and every row
  * pays only the murmur3 probes — the expression is usable inside
  * higher-order-function lambdas (`filter(shingles, s ->
  * bloom_contains(...))`), which is exactly where the streaming
  * decontamination gate runs it, map-only with zero state. At cluster
  * scale the literal rides into each task with the serialized plan
  * (~100s of KB — the same order as a broadcast variable's per-executor
  * copy, paid per stage rather than once; acceptable for gate-sized
  * blooms, and the Literal keeps the whole gate a pure column
  * expression).
  *
  * Determinism: `mightContainString` hashes UTF-8 bytes with
  * Murmur3_x86_128 — a pure function of (filter bytes, value) on any
  * JVM. No false negatives by Bloom construction; false positives only
  * ever INFLATE a contamination score (the conservative direction for
  * a data-quality gate). */
// CodegenFallback, deliberately: the gate evaluates this inside HOF
// lambdas, which Spark runs interpreted regardless — per-row cost is
// the murmur probe, not the eval dispatch.
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects BINARY bloom, got ${left.dataType.sql}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_contains expects a FOLDABLE (literal) bloom — build it " +
          "batch-side and inline it, so tasks deserialize once")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects STRING value, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) null
    else bloom.mightContainString(v.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomSet {

  /** Build the serialized Bloom of a string column's distinct values
    * via the public `stat.bloomFilter` API, sized exactly (one distinct
    * count + one sketch aggregation — both distributed; only the
    * ~100 KB filter ever reaches the driver). */
  def build(df: DataFrame, column: String, fpp: Double = 1e-6): Array[Byte] = {
    val n = math.max(1L, df.select(column).distinct().count())
    val bf = df.stat.bloomFilter(column, n, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Register `bloom_contains` as a SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (children: Seq[Expression]) =>
        BloomContains(children.head, children(1)))
}
