package graft.functions

import org.apache.spark.sql.functions.expr
import graft.SparkSpec

/** Native fixed-point dot product: bit-parity with the unrolled
  * floor-scaled-BIGINT SQL form (the arithmetic the DuckDB oracle
  * states verbatim), and defined null behavior. */
class DecimalDotSpec extends SparkSpec {

  private def unrolled(x: String, y: String): String = {
    val terms = (1 to 64).map(i =>
      s"CAST(floor(CAST(element_at($x, $i) AS DOUBLE) * CAST(element_at($y, $i) AS DOUBLE) * 1e14 + 0.5) AS BIGINT)")
    s"(CAST(${terms.mkString(" + ")} AS DOUBLE) / 1e14)"
  }

  test("bit-identical to the unrolled floor-scaled sum on real vectors") {
    DecimalDot.register(spark)
    import spark.implicits._
    val emb = graft.Tables(spark, sf0001, "embeddings").limit(50)
      .select($"vec_id", $"embedding".as("e1"),
        expr("reverse(embedding)").as("e2"))
    val rows = emb.selectExpr(
      "decimal_dot(e1, e2) AS native",
      s"${unrolled("e1", "e2")} AS sql_form",
      "decimal_dot(e1, e1) AS nrm_native",
      s"${unrolled("e1", "e1")} AS nrm_sql").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), r)
    }
  }

  test("double_dot is bit-identical to the unrolled element_at chain") {
    DoubleDot.register(spark)
    import spark.implicits._
    val chain = (1 to 64).map(i =>
      s"(CAST(element_at(e1, $i) AS DOUBLE) * CAST(element_at(e2, $i) AS DOUBLE))")
      .mkString(" + ")
    val rows = graft.Tables(spark, sf0001, "embeddings").limit(50)
      .select($"embedding".as("e1"), expr("reverse(embedding)").as("e2"))
      .selectExpr("double_dot(e1, e2) AS native", s"($chain) AS sql_form")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r)
    }
  }

  test("mixed float/double element types and literal arrays") {
    DecimalDot.register(spark)
    // double literal array x double literal array: 1*4 + 2*5 + 3*6 = 32
    val r = spark.sql(
      "SELECT decimal_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
    // float column side against double side
    import spark.implicits._
    val f = Seq((Array(0.5f, 0.25f), Array(2.0, 4.0))).toDF("a", "b")
      .selectExpr("decimal_dot(a, b) AS d").head.getDouble(0)
    assert(f == 2.0)
  }

  test("null semantics: null array, length mismatch, null element") {
    DecimalDot.register(spark)
    val r = spark.sql(
      """SELECT
        |  decimal_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS null_arr,
        |  decimal_dot(array(1.0D, 2.0D), array(1.0D)) AS len_mismatch,
        |  decimal_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS null_elem
        |""".stripMargin).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("out-of-range terms yield NULL, never a saturated sum") {
    DecimalDot.register(spark)
    // 1e3 * 1e3 * 1e14 = 1e20 > 2^63: toLong would saturate silently
    // where the oracle's CAST raises; the enforced contract is NULL
    val r = spark.sql(
      """SELECT
        |  decimal_dot(array(1e3D), array(1e3D)) AS overflow,
        |  decimal_dot(array(1e0D), array(1e0D)) AS boundary_ok,
        |  decimal_dot(array(CAST('NaN' AS DOUBLE)), array(1.0D)) AS nan_term,
        |  decimal_dot(array(CAST('Infinity' AS DOUBLE)), array(1.0D)) AS inf_term
        |""".stripMargin).head
    assert(r.isNullAt(0), "overflow must be NULL")
    assert(r.getDouble(1) == 1.0)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }
}
