package graft.star

import graft.SparkSpec

/** The data-skipping property z-order exists for: fixing the z-value's
  * high bits (range key = z >> 18) fixes every dimension bit above
  * position 9, so each z-range's extent in EACH dimension is < 2^9 —
  * a scan with a predicate on either dimension prunes most ranges via
  * their min/max stats. */
class ZOrderSpec extends SparkSpec {

  test("each z-range bounds both dimensions' extents below 2^9") {
    val rows = ZOrder.locality(spark, sf0001).collect()
    assert(rows.length > 1, "fixture produced a single z-range")
    rows.foreach { r =>
      val (zr, ckMin, ckMax) = (r.getInt(0), r.getLong(2), r.getLong(3))
      val (dyMin, dyMax) = (r.getLong(4), r.getLong(5))
      assert(ckMax - ckMin < 512, s"range $zr ck extent ${ckMax - ckMin}")
      assert(dyMax - dyMin < 512, s"range $zr dy extent ${dyMax - dyMin}")
    }
  }
}
