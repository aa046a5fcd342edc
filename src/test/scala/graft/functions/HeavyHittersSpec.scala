package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Space-saving sketch guarantees, tested against exact counts. */
class HeavyHittersSpec extends SparkSpec {

  test("capacity >= distinct items: sketch equals exact ranking") {
    import spark.implicits._
    val words = graft.Tables(spark, sf0001, "documents")
      .select(explode(split($"text", " ")).as("word")).as[String]
    val sketch = udaf(new HeavyHittersAggregator(1024))
    val got = words.toDF("word").agg(sketch($"word")).head
      .getSeq[String](0).take(10)
    val exact = words.groupBy($"word").count()
      .orderBy($"count".desc, $"word").limit(10)
      .collect().map(_.getString(0)).toSeq
    assert(got == exact)
  }

  test("capacity < distinct: true heavy hitters survive eviction") {
    import spark.implicits._
    // zipf-ish: item i appears ~ 2000/i times, plus 500 singletons
    val data = (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"hot$i")) ++
      (1 to 500).map(i => s"rare$i")
    val sketch = udaf(new HeavyHittersAggregator(64))
    val got = data.toDF("word").repartition(8).agg(sketch($"word")).head
      .getSeq[String](0)
    // guarantee: any item with count > n/capacity must be present
    val n = data.size
    val mustSurvive = (1 to 20).map(i => s"hot$i" -> 2000 / i)
      .filter(_._2 > n / 64).map(_._1)
    assert(mustSurvive.nonEmpty)
    mustSurvive.foreach(h => assert(got.contains(h), s"$h missing"))
    // and the single hottest item ranks first
    assert(got.head == "hot1")
  }
}
