package graft.star

import graft.SparkSpec
import java.sql.Timestamp

/** Contract tests for the warehouse-analytics tier. The oracle hash
  * proves cross-engine agreement at sf0.01; these pin the SEMANTICS on
  * crafted fixtures (interval chaining, cohort arithmetic, pair
  * symmetry, exact-variance flagging) and the plan shapes that must
  * survive scale. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("scd2 intervals chain: each valid_to equals the next valid_from") {
    val rows = Warehouse.scd2(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, hist) =>
      // valid_from arrives as LocalDateTime (NTZ) — Comparable, so sort
      // via compareTo; the attribute name breaks exact ties
      val h = hist.sortBy(r =>
        (r.getAs[java.time.LocalDateTime](2), r.getString(1)))(
        Ordering.Tuple2(Ordering.comparatorToOrdering(
          java.util.Comparator.naturalOrder[java.time.LocalDateTime]()),
          Ordering.String))
      // exactly one open interval per key, and it is the last one
      assert(h.count(_.isNullAt(3)) == 1)
      assert(h.last.isNullAt(3) && h.last.getInt(4) == 1)
      h.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(3) == b.get(2),
            s"valid_to must chain to next valid_from: $a -> $b")
          assert(a.getInt(4) == 0)
        case _ => ()
      }
      // consecutive intervals always change the tracked attribute
      h.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1))
        case _ => ()
      }
    }
  }

  test("scd2 runs in a single exchange on the business key") {
    val plan = Warehouse.scd2(spark, sf0001).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 o_custkey exchange, plan:\n$plan")
  }

  test("retention: offset-0 cell equals cohort size; offsets non-negative") {
    val rows = Warehouse.retention(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0))
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (_, cells) =>
      val zero = cells.find(_._2 == 0L)
      assert(zero.isDefined, "every cohort has a day-0 cell")
      // day-0 activity is the cohort's defining day: no later cell
      // can exceed it (retention never exceeds 100%)
      assert(cells.forall(_._3 <= zero.get._3))
    }
  }

  test("basket pairs are upper-triangular with positive exact lift") {
    val rows = Warehouse.basketPairs(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "brand1 < brand2 canonical form")
      assert(r.getLong(2) > 0 && r.getDouble(3) > 0.0)
    }
  }

  test("outlier z² flags exactly the hand-computed 1.5-sigma points") {
    // group of 11: ten 100.00s and one 1000.00 — the spike is far
    // beyond 1.5σ of the group; the baseline points are well inside
    val prices = Seq.fill(10)(100.0) :+ 1000.0
    val cents = prices.map(p => math.round(p * 100))
    val n = cents.size.toLong
    val s = cents.sum
    val q = cents.map(c => BigInt(c) * BigInt(c)).sum
    def flagged(x: Long): Boolean = {
      val lhs = BigInt(4) * BigInt(n * x - s).pow(2)
      val rhs = BigInt(9) * (BigInt(n) * q - BigInt(s).pow(2))
      lhs > rhs
    }
    assert(flagged(100000L), "the 1000.00 spike must flag")
    assert(!flagged(10000L), "the 100.00 baseline must not flag")
  }

  test("outlier query broadcasts the moment table (no fact-side re-shuffle)") {
    val plan = Warehouse.outlierZ(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("streaks are maximal consecutive runs: no adjacent islands, len matches span") {
    val rows = Warehouse.streaks(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate, r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, s, e, n) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(s, e) == n - 1,
        "streak length must equal its day span")
    }
    rows.groupBy(_._1).foreach { case (_, st) =>
      st.sortBy(_._2.toEpochDay).sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.toEpochDay > a._3.toEpochDay + 1,
            s"adjacent islands must be separated by a gap: $a then $b")
        case _ => ()
      }
    }
  }

  test("interval overlap: every pair genuinely overlaps with positive length") {
    val rows = Warehouse.intervalOverlap(spark, sf0001).collect()
    assert(rows.forall(_.getInt(3) > 0), "half-open overlap must be >= 1 day")
    assert(rows.forall(r => r.getInt(3) <= 7), "7-day windows cap the overlap")
  }

  test("backlog sweep-line: non-negative, peaks above zero, closes at zero") {
    val rows = Warehouse.backlog(spark, sf0001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0), "an interval census can never go negative")
    assert(rows.map(_._3).max > 0)
    // every +1 has a matching -1 seven days later: the curve ends closed
    assert(rows.last._3 == 0, s"final open count must be 0, got ${rows.last}")
    assert(rows.map(_._2).sum == 0, "deltas must cancel")
  }

  test("dq checks: clean data passes; seeded-dirty data trips every check") {
    val clean = Warehouse.dqChecks(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.size == 6)
    assert(clean.values.forall(_ == 0L), s"harness data must be clean: $clean")

    // seeded-dirty star schema: one violation per check
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    Seq(
      (1L, 1L, "O", 10.0, "P1"),
      (1L, 1L, "O", 10.0, "P1"),   // duplicate key
      (2L, 1L, "O", 10.0, null),   // null priority
      (3L, 1L, "X", 10.0, "P1"),   // bad status
      (4L, 1L, "O", -5.0, "P1"),   // negative price
      (5L, 99L, "O", 10.0, "P1"))  // orphan customer
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, "c1")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1), (999L, 1)).toDF("l_orderkey", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet")
    val dirty = Warehouse.dqChecks(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dirty == Map(
      "orders_null_priority" -> 1L, "orders_dup_key" -> 1L,
      "orders_bad_status" -> 1L, "orders_negative_price" -> 1L,
      "orders_orphan_customer" -> 1L, "lineitem_orphan_order" -> 1L), dirty)
  }

  test("scd2 point-in-time join matches every order exactly once") {
    // versions partition [first order, infinity) per customer, so the
    // PIT rollup must re-bucket the COMPLETE order set: counts sum to
    // |orders| and revenue sums to total revenue (decimal-exact)
    import org.apache.spark.sql.functions._
    val orders = graft.Tables(spark, sf0001, "orders")
    val total = orders.agg(
      count(lit(1)), graft.Det.xsum(col("o_totalprice"))).head()
    val pit = Warehouse.scd2Pit(spark, sf0001)
      .agg(sum(col("n_orders")), graft.Det.xsum(col("revenue"))).head()
    assert(pit.getLong(0) == total.getLong(0))
    assert(math.abs(pit.getDouble(1) - total.getDouble(1)) < 1e-6)
  }
}
