package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV sketch guarantees: exactness when unsaturated, bounded error
  * when saturated, bit-stability under repartitioning, and the
  * acceptance bound for the registered overlap query. */
class KmvSpec extends SparkSpec {

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int,
      parts: Int): Array[Long] = {
    import spark.implicits._
    val agg = new KmvSketchAggregator(k).toColumn
    df.repartition(parts).select(expr("xxhash64(value)").as("h")).as[Long]
      .select(agg.name("sketch")).head()
  }

  test("unsaturated sketch is the exact distinct hash set") {
    import spark.implicits._
    val df = Seq("a", "b", "c", "b", "a").toDF("value")
    val sk = sketchOf(df, k = 16, parts = 3)
    assert(sk.length == 3) // 3 distinct values
    assert(KmvSketchAggregator.estimate(sk, 16) == 3.0)
    assert(sk.sorted.sameElements(sk), "sketch must be sorted")
  }

  test("sketch is bit-stable under repartitioning (merge-order free)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => s"user_$i").toDF("value")
    val s1 = sketchOf(df, k = 64, parts = 1)
    val s7 = sketchOf(df, k = 64, parts = 7)
    assert(s1.sameElements(s7))
    assert(s1.length == 64)
  }

  test("saturated estimate lands within the 1/sqrt(k) error envelope") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => s"user_$i").toDF("value")
    val k = 256
    val est = KmvSketchAggregator.estimate(sketchOf(df, k, parts = 4), k)
    // sigma ~ n/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs exact $n")
  }

  test("registered overlap query tracks exact distinct overlaps") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val est = graft.star.Aggs.segmentOverlapKmv(spark, dir)
      .as[(String, String, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    val ev = graft.Tables(spark, dir, "events")
      .select($"event_type", $"user_id").distinct()
    val exact = ev.select($"event_type".as("seg_a"), $"user_id")
      .join(ev.select($"event_type".as("seg_b"), $"user_id"), Seq("user_id"))
      .filter($"seg_a" < $"seg_b")
      .groupBy($"seg_a", $"seg_b").count()
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(est.keySet == exact.keySet)
    for (((pair, e), x) <- est.toSeq.sortBy(_._1).map(kv => (kv, exact(kv._1)))) {
      assert(math.abs(e - x) / x < 0.25,
        s"$pair estimate $e vs exact $x")
    }
  }
}
