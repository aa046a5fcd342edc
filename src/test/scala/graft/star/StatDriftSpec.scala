package graft.star

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Analytical invariants of the round-6 drift/rule/window additions —
  * properties the value-level DuckDB oracle doesn't state. */
class StatDriftSpec extends SparkSpec {

  test("tvd drift: bounds, and Hellinger dominates TVD per Le Cam") {
    val rows = Aggs.statTvdDrift(spark, sf0001)
      .select("tvd", "hellinger").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tvd, h) = (r.getDouble(0), r.getDouble(1))
      assert(tvd >= 0.0 && tvd <= 1.0, s"tvd out of range: $tvd")
      assert(h >= 0.0 && h <= 1.0, s"hellinger out of range: $h")
      // Le Cam: H^2 <= TVD <= H * sqrt(2 - H^2)  (quantization slack 2e-9)
      assert(h * h <= tvd + 2e-9, s"H^2=$h > tvd=$tvd")
      assert(tvd <= h * math.sqrt(2 - h * h) + 2e-9, s"tvd=$tvd > upper($h)")
    }
  }

  test("mann-whitney: U within [0, ns*nr] and z consistent with U sign") {
    val n = graft.Tables(spark, sf0001, "documents").count()
    val rows = Aggs.statMannWhitney(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ns = r.getLong(1)
      val u = r.getDouble(2)
      val z = r.getDouble(3)
      val nr = n - ns
      assert(u >= 0.0 && u <= ns.toDouble * nr, s"U=$u outside [0, ${ns * nr}]")
      val mean = ns.toDouble * nr / 2.0
      assert((u - mean) * z >= 0.0, s"z=$z sign disagrees with U-mean=${u - mean}")
    }
  }

  test("mann-whitney rank sums: sum of all per-source U equals pair total") {
    // Σ_s R_s = N(N+1)/2 (every rank assigned once) — restated in U form:
    // Σ_s (U_s + ns(ns+1)/2) = N(N+1)/2.
    val rows = Aggs.statMannWhitney(spark, sf0001)
      .select("n_source", "u_stat").collect()
    val lhs = rows.map(r => r.getDouble(1) + r.getLong(0).toDouble * (r.getLong(0) + 1) / 2).sum
    val n = rows.map(_.getLong(0)).sum.toDouble
    assert(math.abs(lhs - n * (n + 1) / 2) < 1e-6, s"rank mass $lhs != ${n * (n + 1) / 2}")
  }

  test("lift rules: both directions present, confidence in (0,1], lift symmetric") {
    val rows = Warehouse.basketLiftRules(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => ((r.getString(0), r.getString(1)), r)).toMap
    rows.foreach { r =>
      val rev = byPair.get((r.getString(1), r.getString(0)))
      assert(rev.isDefined, s"missing reverse rule for ${(r.getString(0), r.getString(1))}")
      assert(math.abs(r.getDouble(5) - rev.get.getDouble(5)) < 1e-12,
        "lift must be direction-symmetric")
      val conf = r.getDouble(4)
      assert(conf > 0.0 && conf <= 1.0, s"confidence $conf out of range")
      assert(r.getDouble(3) <= conf + 1e-12, "support cannot exceed confidence")
    }
  }

  test("oph signature: duplicate texts share all bands; bucket mins ordered") {
    import spark.implicits._
    val sig = graft.llm.Dedup.minhashOph(spark, sf0001)
    val docs = graft.Tables(spark, sf0001, "documents")
      .groupBy(md5($"text".cast("binary")).as("ch"))
      .agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") >= 2)
    val dupPairs = docs.select(explode(expr(
      "filter(transform(ids, i -> struct(ids[0] AS a, i AS b)), p -> p.a < p.b)"))
      .as("p")).select($"p.a".as("a"), $"p.b".as("b"))
    val j = dupPairs
      .join(sig.select($"doc_id".as("a"), $"band_a".as("ba1"), $"band_b".as("bb1")), "a")
      .join(sig.select($"doc_id".as("b"), $"band_a".as("ba2"), $"band_b".as("bb2")), "b")
    val n = j.count()
    if (n > 0) {
      val agree = j.filter($"ba1" === $"ba2" && $"bb1" === $"bb2").count()
      assert(agree == n, s"$agree/$n duplicate pairs share both OPH bands")
    }
    // non-densified buckets respect the residue partition: oph_j % 8 == j
    // exactly when bucket j was non-empty; densified entries borrow, so
    // only check docs where all 8 residues are distinct mod classes
    val resid = sig.selectExpr("doc_id",
      "size(array_distinct(array(oph0 % 8, oph1 % 8, oph2 % 8, oph3 % 8, oph4 % 8, oph5 % 8, oph6 % 8, oph7 % 8))) AS k")
    assert(resid.count() > 0)
  }
}
