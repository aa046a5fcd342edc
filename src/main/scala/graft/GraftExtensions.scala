package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DecimalDot, DecodeTrimJson}

/** SparkSessionExtensions entry point: installs the engine's custom
  * Catalyst surface into any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * deployment-grade alternative to per-session
  * `DecodeTrimJson.register(spark)` (which call sites still use so the
  * library works on unconfigured sessions too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("decode_trim_json"),
      new ExpressionInfo(classOf[DecodeTrimJson].getName, "decode_trim_json"),
      (children: Seq[Expression]) => DecodeTrimJson(children.head)))
    ext.injectFunction((
      FunctionIdentifier("decimal_dot"),
      new ExpressionInfo(classOf[DecimalDot].getName, "decimal_dot"),
      (children: Seq[Expression]) => DecimalDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[functions.DoubleDot].getName, "double_dot"),
      (children: Seq[Expression]) => functions.DoubleDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[functions.JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => functions.JaroWinkler(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[functions.DeflateLen].getName, "deflate_len"),
      (children: Seq[Expression]) => functions.DeflateLen(children.head)))
    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[functions.DamerauLevenshtein].getName,
        "damerau_levenshtein"),
      (children: Seq[Expression]) =>
        functions.DamerauLevenshtein(children.head, children(1))))
    // auto-rewrite symmetric band range joins (nested loop -> hash join)
    ext.injectOptimizerRule(_ => plans.BandedRangeJoinRule)
    // plan the custom AsOfJoin logical operator (call sites also
    // self-register via experimental.extraStrategies for unconfigured
    // sessions; injection here makes a configured session complete)
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
  }
}
