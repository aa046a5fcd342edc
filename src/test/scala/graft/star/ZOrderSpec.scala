package graft.star

import graft.SparkSpec

/** The data-skipping property z-order exists for: fixing the z-value's
  * high bits (range key = z >> 18) fixes every dimension bit above
  * position 9, so each z-range's extent in EACH dimension is < 2^9 —
  * a scan with a predicate on either dimension prunes most ranges via
  * their min/max stats. */
class ZOrderSpec extends SparkSpec {

  test("a z-sorted parquet write prunes files on EITHER dimension") {
    // the end-to-end layout claim: repartitionByRange(z) + write yields
    // files whose per-file min/max (what a stats-based planner consults)
    // exclude most files for a narrow predicate on ck AND for one on dy
    // — a single-dimension sort can only deliver this for its own key
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("zwrite").toFile.getAbsolutePath
    // quantize both dimensions onto comparable grids first (the step a
    // real OPTIMIZE ZORDER does): 150 customers stretch x16 to match
    // the ~2400-day span, else the interleave degenerates to a dy sort
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr(
        "cast((o_custkey * 16) & 65535 as bigint) AS ck",
        "cast(datediff(o_orderdate, DATE '1992-01-01') & 65535 as bigint) AS dy")
    // reuse the engine's z expression via the registered locality path:
    // recompute z inline with the same unrolled interleave
    val z = (0 until 16).map { i =>
      s"(shiftleft((shiftright(ck, $i) & 1), ${2 * i}) + " +
        s"shiftleft((shiftright(dy, $i) & 1), ${2 * i + 1}))"
    }.mkString("(", " + ", ")")
    def layoutStats(sortCol: String, sub: String) = {
      val d = s"$dir/$sub"
      base.selectExpr("ck", "dy", s"$z AS z")
        .repartitionByRange(16, col(sortCol)).sortWithinPartitions(col(sortCol))
        .write.mode("overwrite").parquet(d)
      new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
        .map { f =>
          val r = spark.read.parquet(f)
            .agg(min($"ck"), max($"ck"), min($"dy"), max($"dy")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    }
    val zStats = layoutStats("z", "zsort")
    val dyStats = layoutStats("dy", "dysort")
    assert(zStats.length >= 8 && dyStats.length >= 8)
    def overlap(lo: Long, hi: Long, fMin: Long, fMax: Long) =
      fMax >= lo && fMin <= hi
    def ckHits(st: Array[(Long, Long, Long, Long)]) =
      st.count { case (a, b, _, _) => overlap(1024, 1151, a, b) }
    def boxHits(st: Array[(Long, Long, Long, Long)]) =
      st.count { case (a, b, c, d) =>
        overlap(1024, 1151, a, b) && overlap(1600, 1855, c, d) }
    // the dy-sorted layout cannot prune a ck window at all; the
    // z-sorted one must prune strictly better, and a 2-D box must
    // prune to a small minority of its files
    assert(ckHits(dyStats) == dyStats.length,
      s"dy-sorted layout unexpectedly pruned ck: ${dyStats.toSeq}")
    assert(ckHits(zStats) < zStats.length * 3 / 4,
      s"z layout ck hits ${ckHits(zStats)} of ${zStats.length}: ${zStats.toSeq}")
    assert(boxHits(zStats) <= zStats.length / 4,
      s"z layout box hits ${boxHits(zStats)} of ${zStats.length}: ${zStats.toSeq}")
  }

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
