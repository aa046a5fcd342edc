package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JaroWinkler semantics: literature vectors, edge cases, boost gate,
  * and codegen/interpreted agreement. The cross-engine contract (equals
  * DuckDB's built-in on real data) is held by the `func_jaro_pairs`
  * oracle row; this spec pins the algorithm itself. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinkler.score(a, b)

  test("classic literature vectors") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
  }

  test("edge cases: empty, identical, disjoint") {
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("Winkler boost applies only above the 0.7 jaro threshold") {
    // shared prefix but low jaro: boost must NOT fire. 'abcqq'/'abzzz'
    // -> m=2 (window 1: a,b), jaro = (2/5 + 2/5 + 2/2)/3 = 0.6 exactly
    assert(jw("abcqq", "abzzz") == 0.6)
    // prefix capped at 4 even for longer shared prefixes
    val boosted = jw("prefixes", "prefixed")
    val jaro = (7.0 / 8 + 7.0 / 8 + 7.0 / 7) / 3
    assert(math.abs(boosted - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("symmetry") {
    for ((a, b) <- Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("red widget", "red gadget"))) assert(jw(a, b) == jw(b, a))
  }

  test("codegen path equals the static scorer (and handles nulls)") {
    JaroWinkler.register(spark)
    val rows = Seq(("martha", "marhta"), ("red widget", "red gadget"),
      ("small ring", "small ring"), ("a", "b"))
      .toDF("a", "b")
      .selectExpr("a", "b", "jaro_winkler(a, b) AS j")
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == JaroWinkler.score(r.getString(0), r.getString(1)))
    }
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .selectExpr("jaro_winkler(a, b) AS j").collect()
    assert(n.head.isNullAt(0))
  }
}
