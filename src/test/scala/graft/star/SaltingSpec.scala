package graft.star

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salted join: results must be invariant to salting. */
class SaltingSpec extends SparkSpec {

  test("salted equi-join equals plain equi-join") {
    import spark.implicits._
    val li = graft.Tables(spark, sf0001, "lineitem")
    val part = graft.Tables(spark, sf0001, "part")
    val plain = li.join(part, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"),
        sum($"l_quantity").as("q"))
    val salted = Salting.saltedEquiJoin(li, part, "l_partkey", "p_partkey", 8)
      .groupBy($"p_brand").agg(count(lit(1)).as("n"),
        sum($"l_quantity").as("q"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salt spreads a hot key across partitions of the join") {
    import spark.implicits._
    val joined = Salting.saltedEquiJoin(
      graft.Tables(spark, sf0001, "lineitem"),
      graft.Tables(spark, sf0001, "part"),
      "l_partkey", "p_partkey", 8)
    // the physical join key must include the salt column
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), plan)
  }
}
