package graft.functions

import graft.SparkSpec

/** Unrestricted Damerau-Levenshtein semantics — in particular the case
  * that SEPARATES the true algorithm from the common OSA shortcut
  * (edits inside transposed blocks allowed). Cross-engine parity with
  * DuckDB's built-in is held by the `func_damerau_pairs` oracle row. */
class DamerauLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(a, b)

  test("unrestricted, not OSA: CA -> ABC is 2") {
    // OSA answers 3 here; true DL transposes CA->AC then inserts B
    assert(dl("CA", "ABC") == 2)
    assert(dl("ABC", "CA") == 2)
  }

  test("plain edits match levenshtein when no transpositions help") {
    assert(dl("kitten", "sitting") == 3)
    assert(dl("", "abc") == 3)
    assert(dl("abc", "") == 3)
    assert(dl("same", "same") == 0)
  }

  test("adjacent transposition costs one edit") {
    assert(dl("ab", "ba") == 1)
    assert(dl("red widget", "red widgte") == 1)
  }

  test("codegen path equals the static scorer; null propagates") {
    DamerauLevenshtein.register(spark)
    val r = Seq(("CA", "ABC"), ("ab", "ba"), ("x", "x"))
      .toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b) AS d").collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(2, 1, 0))
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .selectExpr("damerau_levenshtein(a, b) AS d").collect()
    assert(n.head.isNullAt(0))
  }
}
