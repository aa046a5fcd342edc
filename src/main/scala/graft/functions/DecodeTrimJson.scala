package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst port of the reference's single UDF
  * (`decode_and_trim_bytes`, `ETL/flight-silver-transformation
  * (1).ipynb:1193-1206`): decode capture bytes as UTF-8 with
  * replacement, then repair capture-truncated JSON by cutting at the
  * last `'}'` (empty string when none — the downstream `from_json`
  * yields a null struct and the row is dropped, ipynb:1229).
  *
  * The reference implements this as a row-at-a-time Python UDF — the
  * biggest scale anti-pattern in the pipeline (breaks whole-stage
  * codegen and forces executor<->Python IPC per row; SURVEY.md §2.10).
  * Here it is a codegen'd unary expression: the generated code calls a
  * static JVM helper inline, so the silver pipeline stays inside one
  * WholeStageCodegen span and column pruning/pushdown pass through it.
  */
case class DecodeTrimJson(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_trim_json expects BINARY input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "decode_trim_json"

  override protected def nullSafeEval(input: Any): Any =
    DecodeTrimJson.repair(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DecodeTrimJson.repair($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodeTrimJson {
  /** Static helper referenced from generated code (and nullSafeEval). */
  def repair(bytes: Array[Byte]): UTF8String = {
    // java.lang.String(byte[], UTF_8) substitutes U+FFFD for malformed
    // sequences == Python bytes.decode(errors='replace') (ipynb:1199)
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val i = s.lastIndexOf('}') // rfind (ipynb:1203)
    UTF8String.fromString(if (i < 0) "" else s.substring(0, i + 1))
  }

  /** Register as a SQL function so call sites can use
    * `expr("decode_trim_json(body)")` without touching private Column
    * constructors. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("decode_trim_json"),
      new ExpressionInfo(classOf[DecodeTrimJson].getName, "decode_trim_json"),
      (children: Seq[Expression]) => DecodeTrimJson(children.head))
}
