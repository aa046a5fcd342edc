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

  test("setops: registered query matches the exact twin when unsaturated") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val est = graft.star.Aggs.segmentSetopsKmv(spark, dir)
      .as[(String, String, Double, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    val exact = graft.star.Aggs.segmentSetopsExact(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(est.keySet == exact.keySet)
    for ((pair, (u, i, ao, bo)) <- est) {
      val (xu, xi, xao, xbo) = exact(pair)
      if (xu < 256) { // unsaturated: sketch algebra must be EXACT
        assert(u == xu.toDouble && i == xi.toDouble &&
          ao == xao.toDouble && bo == xbo.toDouble,
          s"$pair ($u,$i,$ao,$bo) vs exact ($xu,$xi,$xao,$xbo)")
      } else { // saturated: 4-sigma envelope on the union
        assert(math.abs(u - xu) / xu < 0.25, s"$pair union $u vs $xu")
      }
    }
  }

  test("setops: class estimates partition the union estimate exactly") {
    import spark.implicits._
    // synthetic segments large enough to SATURATE k=256: A = 1..4000,
    // B = 2001..6000 (overlap 2000), C = disjoint 10001..12000
    val rows =
      (1 to 4000).map(i => ("A", s"u$i")) ++
      (2001 to 6000).map(i => ("B", s"u$i")) ++
      (10001 to 12000).map(i => ("C", s"u$i"))
    val df = rows.toDF("event_type", "user_id")
    val k = 256
    val agg = new KmvSketchAggregator(k).toColumn
    val sk = df.select($"event_type", expr("xxhash64(user_id)").as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2).agg(agg.name("sketch"))
      .toDF("event_type", "sketch")
    val a = sk.select($"event_type".as("seg_a"), $"sketch".as("sa"))
    val b = sk.select($"event_type".as("seg_b"), $"sketch".as("sb"))
    val out = a.join(b, $"seg_a" < $"seg_b")
      .withColumn("u", expr(s"slice(array_sort(array_union(sa, sb)), 1, $k)"))
      .withColumn("theta", expr("element_at(u, size(u))").cast("double")
        / lit(Long.MaxValue.toDouble))
      .withColumn("sample", expr("slice(u, 1, size(u) - 1)"))
      .select($"seg_a", $"seg_b", size($"u").as("su"),
        (expr("size(array_intersect(sample, array_intersect(sa, sb)))") +
          expr("size(array_intersect(sample, array_except(sa, sb)))") +
          expr("size(array_intersect(sample, array_except(sb, sa)))"))
          .as("class_sum"),
        (lit((k - 1).toDouble) / $"theta").as("est_u"),
        $"theta")
      .as[(String, String, Int, Int, Double, Double)].collect()
    assert(out.length == 3)
    for ((sa2, sb2, su, classSum, estU, _) <- out) {
      assert(su == k, s"$sa2/$sb2 not saturated (|u|=$su) — test data too small")
      // the union sample partitions into in-both / a-only / b-only:
      // class counts sum to k-1, so class estimates sum to (k-1)/theta
      assert(classSum == k - 1,
        s"$sa2/$sb2 classes sum to $classSum, want ${k - 1}")
      assert(estU > 0)
    }
    // disjoint pair A/C: the in-both class of the union sample is empty
    val acInBoth = a.join(b, $"seg_a" === "A" && $"seg_b" === "C")
      .withColumn("u", expr(s"slice(array_sort(array_union(sa, sb)), 1, $k)"))
      .withColumn("sample", expr("slice(u, 1, size(u) - 1)"))
      .select(expr("size(array_intersect(sample, array_intersect(sa, sb)))"))
      .as[Int].head()
    assert(acInBoth == 0, s"disjoint A/C in-both class = $acInBoth, want 0")
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
