package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler string similarity — the entity-resolution
  * scorer Spark's function library lacks (it ships only
  * `levenshtein`), implemented as a codegen'd `BinaryExpression` so
  * fuzzy-matching stays inside whole-stage codegen instead of a Scala
  * UDF (SURVEY §2.10 preference order).
  *
  * Semantics follow the textbook algorithm as DuckDB implements it
  * (`jaro_winkler_similarity`, RapidFuzz lineage), which makes DuckDB
  * a true independent oracle for a CUSTOM expression:
  *  - match window = max(len)/2 − 1 (floor, min 0);
  *  - transpositions counted as half-swaps;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3;
  *  - Winkler prefix boost (common prefix capped at 4, scale 0.1)
  *    applied ONLY when jaro exceeds the 0.7 boost threshold.
  * Both engines run the identical IEEE sequence; call sites that feed
  * the hash gate quantize to 1e-6 (an integer), so even a last-ulp
  * divergence in some future engine build cannot flip a comparison.
  *
  * Scale posture: per-row scalar, map-only, no state — the cost model
  * is O(l1·l2) per pair in the worst case on the match scan, constant
  * memory (two small bitsets).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects STRING inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    left.nullable || right.nullable
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.score($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  private final val PrefixScale = 0.1
  private final val BoostThreshold = 0.7
  private final val MaxPrefix = 4

  /** Static scorer referenced from generated code and nullSafeEval. */
  def score(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true; matched2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, counted as half-swaps
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro <= BoostThreshold) return jaro
    var p = 0
    val maxP = math.min(MaxPrefix, math.min(l1, l2))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * PrefixScale * (1.0 - jaro)
  }

  /** Register as a SQL function (idempotent) — call sites use
    * `expr("jaro_winkler(a, b)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children.head, children(1)))
}
