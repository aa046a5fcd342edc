package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string — the compression-ratio
  * quality signal big text-curation pipelines use (a document that
  * compresses far below the corpus norm is boilerplate/repetition; one
  * that barely compresses is noise or binary junk — the Gopher-class
  * repetition rules approximate exactly this). `java.util.zip.Deflater`
  * is JDK-built-in, so the expression needs no external codec, and at
  * a fixed level (6) with the default strategy the output length is a
  * deterministic pure function of the bytes on any JVM this library
  * targets.
  *
  * No DuckDB oracle EXISTS for this one (no SQL zlib) — the registry
  * entry is rows-only by design, like the sketch estimators, and the
  * semantic guarantees (monotone under repetition, deterministic,
  * null-safe) are pinned in DeflateLenSpec instead.
  *
  * Scale posture: map-only scalar; one Deflater per evaluation kept
  * small (docs are KB-scale); a hot 100 TB pass would pool the
  * Deflater per task via a mapPartitions stage — same numbers.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(v: Any): Any =
    DeflateLen.length(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateLen.length($c.getBytes())")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLen = copy(child = newChild)
}

object DeflateLen {

  /** Compressed byte count at level 6 (zlib default), default strategy,
    * raw deflate stream. Static so generated code calls it directly. */
  def length(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](256)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Register as a SQL function (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (children: Seq[Expression]) => DeflateLen(children.head))
}
