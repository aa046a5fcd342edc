package graft.star

import graft.SparkSpec

/** Deterministic acceptance bound for the no-oracle HLL query: the
  * sketch is engine-specific (so no DuckDB hash compare is possible),
  * but for a FIXED input the estimate is deterministic — assert it
  * lands within tolerance of the exact distinct counts. The default
  * `approx_count_distinct` rsd is 0.05; 3 sigma = 15% is a stable
  * acceptance band that survives re-generation of the test data. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 15% of exact per group") {
    val exact = Aggs.countDistinct2(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    val approx = Aggs.approxDistinct(spark, sf0001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (nParts, nOrders) = exact(r.getString(0))
      val (aParts, aOrders) = (r.getLong(1), r.getLong(2))
      assert(math.abs(aParts - nParts).toDouble / nParts <= 0.15,
        s"${r.getString(0)}: approx_parts=$aParts exact=$nParts")
      assert(math.abs(aOrders - nOrders).toDouble / nOrders <= 0.15,
        s"${r.getString(0)}: approx_orders=$aOrders exact=$nOrders")
    }
  }
}
