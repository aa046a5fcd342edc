package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min Aggregator: equals the oracle-checked SQL formulation
  * cell-for-cell, is partition-invariant (additive counters), and
  * never underestimates. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val d = 4
  private val w = 64

  private def toks = spark.read
    .parquet(s"$sf0001/documents.parquet")
    .select(explode(split($"text", " ")).as("tok"))
    .as[String]

  private def sketch(parts: Int): Array[Long] = {
    val agg = new CountMinAggregator(d, w)
    toks.repartition(parts).select(udaf(agg).apply($"tok"))
      .collect().head.getSeq[Long](0).toArray
  }

  test("aggregator cells equal the SQL GROUP BY formulation") {
    val cells = sketch(4)
    // the query-side matrix: same salted md5 bucketing as TextStats
    val sql = toks.toDF("tok")
      .select(explode(expr(
        s"array(${(0 until d).map(j => s"struct($j AS r, " +
          s"cast(conv(substr(md5(cast(concat('$j:', tok) as binary)), 1, 8)," +
          s" 16, 10) as bigint) % $w AS b)").mkString(", ")})")).as("c"))
      .groupBy($"c.r", $"c.b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    for (j <- 0 until d; b <- 0 until w)
      assert(cells(j * w + b) == sql.getOrElse((j, b), 0L),
        s"cell ($j, $b) differs")
  }

  test("additive counters: bit-identical at any partition count") {
    assert(sketch(1).toSeq == sketch(7).toSeq)
  }

  test("estimates never underestimate; exact for collision-free cells") {
    val cells = sketch(4)
    val exact = toks.toDF("tok").groupBy($"tok").count()
      .orderBy($"count".desc, $"tok").limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (tok, n) =>
      val est = CountMinAggregator.estimate(cells, d, w, tok)
      assert(est >= n, s"$tok: est $est < exact $n")
    }
  }

  test("merge is plain elementwise addition") {
    val agg = new CountMinAggregator(d, w)
    val a = agg.reduce(agg.zero, "alpha")
    val b = agg.reduce(agg.zero, "beta")
    val m = agg.merge(a.clone(), b)
    val direct = agg.reduce(agg.reduce(agg.zero, "alpha"), "beta")
    assert(m.toSeq == direct.toSeq)
  }
}
