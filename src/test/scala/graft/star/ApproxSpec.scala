package graft.star

import graft.SparkSpec

/** Deterministic acceptance bound for the no-oracle HLL query: the
  * sketch is engine-specific (so no DuckDB hash compare is possible),
  * but for a FIXED input the estimate is deterministic — assert it
  * lands within tolerance of the exact distinct counts. The default
  * `approx_count_distinct` rsd is 0.05; 3 sigma = 15% is a stable
  * acceptance band that survives re-generation of the test data. */
class ApproxSpec extends SparkSpec {

  test("percentile_approx within 2% of exact discrete percentiles") {
    // accuracy 10000 bounds rank error at n/10000; on a heavy-enough
    // group the VALUE error stays well inside 2% for this price data —
    // a deterministic bound for the no-oracle sketch query
    val exact = Aggs.percentileDisc(spark, sf0001).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Aggs.approxPercentile(spark, sf0001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      val a = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      e.zip(a).zip(Seq("p50", "p90", "p99")).foreach { case ((ev, av), p) =>
        assert(math.abs(av - ev) / ev <= 0.02,
          s"${r.getString(0)} $p: approx=$av exact=$ev")
      }
    }
  }

  test("moment-form stddev/corr agree with Spark's built-ins to 1e-9") {
    import org.apache.spark.sql.functions._
    val builtin = graft.Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(stddev(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val moments = Aggs.statsMoments(spark, sf0001).collect()
    assert(moments.nonEmpty)
    moments.foreach { r =>
      val (sd, cr) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(3) - sd) < 1e-9 * math.max(1, sd.abs))
      assert(math.abs(r.getDouble(4) - cr) < 1e-9 * math.max(1, cr.abs))
    }
  }

  test("hll sketch merge: quarterly estimate within 5% of exact") {
    import org.apache.spark.sql.functions._
    val spark2 = spark; import spark2.implicits._
    // DataSketches HLL at default lgConfigK=12 has rsd ~1.04/sqrt(2^12)
    // ~1.6%; 3 sigma ~5%. The union-merged estimate must bound the
    // EXACT quarterly distinct count computed from raw keys.
    val exact = graft.Tables(spark, sf0001, "orders")
      .groupBy(expr("CAST((month(o_orderdate) - 1) DIV 3 AS INT)").as("quarter"))
      .agg(countDistinct($"o_custkey").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val est = Aggs.hllMerge(spark, sf0001).collect()
    assert(est.length == exact.size)
    est.foreach { r =>
      val (q, e) = (r.getInt(0), exact(r.getInt(0)))
      val a = r.getLong(1)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"quarter $q: hll=$a exact=$e")
    }
  }

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
