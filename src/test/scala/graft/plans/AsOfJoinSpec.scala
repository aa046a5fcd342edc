package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom as-of operator: semantics vs the compositional form,
  * plan shape, and boundary behavior. */
class AsOfJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("agrees with the union+window formulation on real data") {
    import spark.implicits._
    val native = graft.star.Joins.asofNative(spark, sf0001)
    val windowed = graft.star.Joins.asof(spark, sf0001)
    assert(native.exceptAll(windowed).count() == 0)
    assert(windowed.exceptAll(native).count() == 0)
  }

  test("plan: AsOfJoinExec with exactly one exchange per side") {
    val df = graft.star.Joins.asofNative(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan) // SparkPlan nodeName drops "Exec"
    val joinRegion = plan.substring(plan.indexOf("AsOfJoin "))
    // two hash exchanges feed the join (plus the harness fan-out below)
    assert("Exchange hashpartitioning".r.findAllIn(joinRegion).length == 2, plan)
  }

  test("boundary semantics: inclusive ts, no-match nulls, latest wins") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 10L, t("2024-01-01 00:10:00")),  // exact-ts purchase -> match
      (2L, 10L, t("2024-01-01 00:05:00")),  // before any purchase -> null
      (3L, 10L, t("2024-01-01 00:30:00")),  // two earlier -> latest wins
      (4L, 99L, t("2024-01-01 00:30:00")))  // user w/o purchases -> null
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, t("2024-01-01 00:10:00"), 1.0),
      (10L, t("2024-01-01 00:20:00"), 2.0))
      .toDF("user_id", "ts", "value")
    val out = AsOf.join(clicks, purchases, "user_id", "ts")
      .select($"event_id", $"value_r").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      1L -> Some(1.0), 2L -> None, 3L -> Some(2.0), 4L -> None))
  }

  test("forward direction: earliest at-or-after wins, inclusive at ties") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 10L, t("2024-01-01 00:10:00")),  // exact-ts purchase -> match it
      (2L, 10L, t("2024-01-01 00:15:00")),  // between purchases -> next one
      (3L, 10L, t("2024-01-01 00:25:00")),  // after the last -> null
      (4L, 99L, t("2024-01-01 00:01:00")))  // user w/o purchases -> null
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, t("2024-01-01 00:10:00"), 1.0),
      (10L, t("2024-01-01 00:20:00"), 2.0))
      .toDF("user_id", "ts", "value")
    val out = AsOf.join(clicks, purchases, "user_id", "ts", forward = true)
      .select($"event_id", $"value_r").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> None))
  }

  test("tolerance filters the pick, never falls back to a farther row") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 10L, t("2024-01-01 00:10:00")),  // pick at 00:09 -> within 5 min
      (2L, 10L, t("2024-01-01 00:20:00")))  // pick at 00:09, 11 min -> null
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, t("2024-01-01 00:05:00"), 1.0), // even though THIS one is older
      (10L, t("2024-01-01 00:09:00"), 2.0)) // the pick is always the latest
      .toDF("user_id", "ts", "value")
    val out = AsOf.join(clicks, purchases, "user_id", "ts",
      toleranceMicros = Some(5L * 60 * 1000000))
      .select($"event_id", $"value_r").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(1L -> Some(2.0), 2L -> None))
  }

  test("as-of is a left join: row counts preserved") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf0001, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    assert(AsOf.join(clicks, purchases, "user_id", "ts").count() ==
      clicks.count())
  }
}
