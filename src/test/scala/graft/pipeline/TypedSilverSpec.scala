package graft.pipeline

import graft.SparkSpec

/** Typed Dataset boundary (SURVEY.md §1.3): encoder round-trip and
  * compile-time field access. */
class TypedSilverSpec extends SparkSpec {

  test("silver rows encode into FlightDelay with exact field values") {
    val ds = FlightPipeline.typedSilver(spark, sf0001)
    val row = ds.head()
    assert(row.year >= 1995 && row.year <= 2001)
    assert(row.carrier.matches("[A-Z]-[A-Z]"))
    // typed filter + map run through the product encoder
    val delayed = ds.filter(_.arr_del15 > 0).map(_.carrier)(
      org.apache.spark.sql.Encoders.STRING).distinct().count()
    assert(delayed > 0)
  }
}
