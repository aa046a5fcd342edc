package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** F1 decode-trim semantics (ipynb:1193-1204): UTF-8 replace-decode then
  * cut at the last '}' — checked at the static-helper level, through the
  * codegen'd expression in a real plan, and property-based (total, never
  * throws, output is empty or ends at '}'). */
class DecodeTrimJsonSpec extends SparkSpec {

  /** Minimal forAll (no scalatest-scalacheck bridge in the offline
    * cache): deterministic seeds, 300 samples. */
  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit =
    (0 until 300).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private def repair(s: String): String =
    DecodeTrimJson.repair(s.getBytes(UTF_8)).toString

  test("valid json passes through unchanged") {
    assert(repair("""{"a":"1"}""") == """{"a":"1"}""")
  }

  test("trailing capture noise after last '}' is trimmed") {
    assert(repair("""{"a":"1"}<<<noise""") == """{"a":"1"}""")
  }

  test("no '}' anywhere yields empty string") {
    assert(repair("""{"a":"1""") == "")
    assert(repair("") == "")
  }

  test("cut happens at the LAST '}' (rfind, not find)") {
    assert(repair("""{"a":{"b":"1"}}tail""") == """{"a":{"b":"1"}}""")
  }

  test("malformed UTF-8 bytes are replaced, not thrown") {
    val bytes = Array[Byte]('{', '"', 'a', '"', ':', 0xFF.toByte, '}', 'x')
    val out = DecodeTrimJson.repair(bytes).toString
    assert(out.endsWith("}"))
    assert(out.contains("�"))
  }

  test("expression in a real plan: codegen path, null-safe") {
    import spark.implicits._
    DecodeTrimJson.register(spark)
    val df = Seq(
      Some("""{"a":"1"}garbage"""), Some("no brace"), None)
      .toDF("s")
      .select(expr("decode_trim_json(cast(s as binary))").as("r"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("""{"a":"1"}"""), Some(""), None))
  }

  test("property: total function; output empty or ends with '}'") {
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes: Array[Byte] =>
        val out = DecodeTrimJson.repair(bytes).toString
        assert(out.isEmpty || out.endsWith("}"))
    }
  }

  test("property: for clean ascii payloads, repair(s) == s up to last brace") {
    forAll(Gen.asciiPrintableStr) { s: String =>
      val out = repair(s)
      val i = s.lastIndexOf('}')
      assert(out == (if (i < 0) "" else s.substring(0, i + 1)))
    }
  }
}
