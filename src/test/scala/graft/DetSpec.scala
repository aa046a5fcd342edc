package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The determinism contract behind the oracle gate: Det.xsum must be
  * bit-identical across partitionings and equal to an exact reference
  * computed with BigDecimal on the driver. */
class DetSpec extends SparkSpec {

  private def moneyGen: Gen[Double] =
    Gen.chooseNum(-99999999L, 99999999L).map(_ / 100.0) // 2dp grid

  test("xsum is invariant to partitioning and matches exact BigDecimal") {
    import spark.implicits._
    (0 until 5).foreach { seed =>
      val values = (0 until 2000).flatMap { i =>
        moneyGen(Gen.Parameters.default, Seed(seed * 10000L + i))
      }
      val expected = values
        .map(new JBigDecimal(_).setScale(5, RoundingMode.HALF_UP))
        .reduce(_ add _).doubleValue()
      for (parts <- Seq(1, 3, 32)) {
        val got = values.toDF("x").repartition(parts)
          .agg(Det.xsum($"x")).head.getDouble(0)
        assert(got == expected,
          s"seed=$seed parts=$parts: $got != $expected")
      }
    }
  }

  test("plain double sum is NOT order-stable (why xsum exists)") {
    import spark.implicits._
    // adversarial magnitudes: (1e16 + 1) + 1 absorbs both units,
    // (1 + 1) + 1e16 keeps them — plain fold is order-dependent
    val fwd = Seq(1e16, 1.0, 1.0).foldLeft(0.0)(_ + _)
    val rev = Seq(1.0, 1.0, 1e16).foldLeft(0.0)(_ + _)
    assert(fwd != rev, "expected order sensitivity in the naive sum")
    // while xsum over the same values is partition-order invariant
    val df1 = Seq(1e16, 1.0, 1.0).toDF("x")
    val a = df1.repartition(1).agg(Det.xsum($"x")).head.getDouble(0)
    val b = df1.repartition(3).agg(Det.xsum($"x")).head.getDouble(0)
    assert(a == b)
  }

  test("whole queries are bit-identical across parallelism (cluster-resize proof)") {
    // the end-to-end claim behind every Det decision: re-running a
    // representative slice of the registry at a different shuffle
    // partition count must produce byte-identical results — the same
    // property a 32->1000 executor resize needs. Queries chosen to
    // cover the seams: decimal aggregation, window frames, fixed-point
    // quantization, and the as-of union+window.
    val names = Seq("gold_carrier", "window_running_total",
      "gold_cause_corr", "join_asof", "customer_spend_gini")
    def run(parts: String): Map[String, Seq[String]] = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try names.map { n =>
        n -> graft.SparkEntry.queries(n)(spark, sf0001)
          .collect().map(_.toString).toSeq
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    val a = run("2")
    val b = run("13")
    names.foreach { n =>
      assert(a(n) == b(n), s"$n differs across partition counts")
      assert(a(n).nonEmpty, s"$n returned no rows")
    }
  }

  test("zeroRatio / nullRatio guard semantics") {
    import spark.implicits._
    val df = Seq((1.0, 0.0), (3.0, 2.0), (5.0, 0.0)).toDF("n", "d")
    val z = df.select(Det.zeroRatio($"n", $"d")).collect().map(_.getDouble(0))
    assert(z.toSeq == Seq(0.0, 1.5, 0.0))
    val nn = df.select(Det.nullRatio($"n", $"d")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(nn.toSeq == Seq(None, Some(1.5), None))
  }
}
