package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native positional n-gram shingle generator:
  * `pos_shingles(tokens, n, sep) AS (pos, shingle)` emits one row per
  * window start — the row-generation primitive under every shingle-
  * based operator (span coverage, contamination, winnowing, Jaccard).
  *
  * Why a custom `Generator` and not the built-in chain
  * `explode(transform(sequence(0, size(t)-n), i -> struct(i,
  * concat_ws(sep, slice(t, i+1, n)))))`: the chain materializes the
  * ENTIRE per-document shingle array (struct per window, string per
  * window) as one heap object before explode streams it out — peak
  * memory O(doc tokens × n) per row with three interpreted
  * higher-order hops. The generator yields rows lazily through
  * `GenerateExec`'s iterator: one shingle string live at a time,
  * straight-line per-row work, no intermediate array. Semantics are
  * identical (PosShinglesSpec proves equality against the chain; the
  * unchanged DuckDB oracle proves it cross-engine). Under-n inputs
  * emit zero rows — the `sequence()` descending-range hazard
  * (ADVICE r2) cannot arise by construction.
  *
  * Completes the custom-expression taxonomy alongside scalar
  * expressions (DecimalDot/DecodeTrimJson), Aggregators
  * (WeightedRate/HeavyHitters), a physical operator (AsOfJoin), an
  * optimizer rule (BandedRangeJoin), and a DSv2 connector. */
case class PosShingles(tokens: Expression, nExpr: Expression,
                       sepExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, nExpr, sepExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = tokens.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!arrOk)
      TypeCheckResult.TypeCheckFailure(
        s"pos_shingles expects ARRAY<STRING>, got ${tokens.dataType.sql}")
    else if (!(nExpr.foldable && nExpr.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure("n must be an INT literal")
    else if (!(sepExpr.foldable && sepExpr.dataType == StringType))
      TypeCheckResult.TypeCheckFailure("sep must be a STRING literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]
  private lazy val sep: UTF8String =
    sepExpr.eval(null).asInstanceOf[UTF8String]

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null || n <= 0 || arr.numElements() < n) Iterator.empty
    else {
      val len = arr.numElements()
      val toks = new Array[UTF8String](len)
      var i = 0
      while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
      val window = new Array[UTF8String](n)
      (0 to len - n).iterator.map { start =>
        System.arraycopy(toks, start, window, 0, n)
        new GenericInternalRow(Array[Any](
          start, UTF8String.concatWs(sep, window: _*)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PosShingles =
    copy(tokens = newChildren(0), nExpr = newChildren(1),
      sepExpr = newChildren(2))

  override def prettyName: String = "pos_shingles"
}

object PosShingles {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pos_shingles"),
      new ExpressionInfo(classOf[PosShingles].getName, "pos_shingles"),
      (children: Seq[Expression]) =>
        PosShingles(children.head, children(1), children(2)))
}
