package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the two native dot-product kernels over
  * seeded random vectors (no SparkSession needed — the static kernels
  * are exactly what generated code calls). */
class DotPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private def vec(): Array[Double] =
    Array.fill(64)(rng.nextDouble() * 2 - 1)
  private val cases = Seq.fill(200)((vec(), vec()))

  private def dd(x: Array[Double], y: Array[Double]): Double =
    DecimalDot.dot(ArrayData.toArrayData(x), ArrayData.toArrayData(y),
      xFloat = false, yFloat = false)

  private def pd(x: Array[Double], y: Array[Double]): Double =
    DoubleDot.dot(ArrayData.toArrayData(x), ArrayData.toArrayData(y),
      xFloat = false, yFloat = false)

  test("decimal_dot is symmetric (order-independent term sum)") {
    cases.foreach { case (x, y) => assert(dd(x, y) == dd(y, x)) }
  }

  test("decimal_dot(x, x) is non-negative") {
    cases.foreach { case (x, _) => assert(dd(x, x) >= 0.0) }
  }

  test("decimal_dot within 64 quantization steps of the double dot") {
    // each term is rounded once to 1e-14; 64 terms bound the gap —
    // this is the margin analysis the two-phase pair scoring relies on
    cases.foreach { case (x, y) =>
      assert(math.abs(dd(x, y) - pd(x, y)) <= 64 * 1e-14 + 1e-12,
        s"gap ${math.abs(dd(x, y) - pd(x, y))}")
    }
  }

  test("both kernels null out on length mismatch") {
    val a = ArrayData.toArrayData(Array(1.0, 2.0))
    val b = ArrayData.toArrayData(Array(1.0))
    assert(DecimalDot.dot(a, b, xFloat = false, yFloat = false) == null)
    assert(DoubleDot.dot(a, b, xFloat = false, yFloat = false) == null)
  }
}
