package graft.functions

import graft.SparkSpec

/** deflate_len semantics — no SQL oracle can exist (no zlib in DuckDB),
  * so the contract is pinned here: deterministic, monotone under
  * repetition, null-safe, and the codegen path equals the static
  * helper. */
class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below unique text") {
    val rep = DeflateLen.length(("spark " * 200).getBytes("UTF-8"))
    val uniq = DeflateLen.length(
      (0 until 200).map(i => s"w${i * 7919 % 997}x$i").mkString(" ")
        .getBytes("UTF-8"))
    assert(rep < uniq / 3, s"rep=$rep uniq=$uniq")
  }

  test("deterministic and sane bounds") {
    val b = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val l1 = DeflateLen.length(b)
    assert(l1 == DeflateLen.length(b.clone()))
    assert(l1 > 0 && l1 <= b.length + 16)
    assert(DeflateLen.length(Array.emptyByteArray) >= 0)
  }

  test("codegen path equals the static helper; null propagates") {
    DeflateLen.register(spark)
    val rows = Seq("alpha beta gamma", "aaaaaaaaaaaaaaaaaaaa", "")
      .toDF("s").selectExpr("s", "deflate_len(s) AS dl").collect()
    rows.foreach { r =>
      assert(r.getInt(1) ==
        DeflateLen.length(r.getString(0).getBytes("UTF-8")))
    }
    val n = Seq(Option.empty[String]).toDF("s")
      .selectExpr("deflate_len(s) AS dl").collect()
    assert(n.head.isNullAt(0))
  }

  test("the corpus signal separates languages' repetitiveness sanely") {
    DeflateLen.register(spark)
    val ratios = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("deflate_len(text) AS c", "length(text) AS r")
      .selectExpr("CAST(c AS DOUBLE) / r AS ratio").collect()
      .map(_.getDouble(0))
    assert(ratios.forall(x => x > 0.0 && x < 1.5))
  }
}
