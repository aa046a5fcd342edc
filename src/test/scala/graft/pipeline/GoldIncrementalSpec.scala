package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Incremental

/** Round-14: the flight pipeline's OWN gold tier is partition-
  * incremental (r13 verdict item 4). The reference's use case is
  * monthly-grain gold rebuilt by full overwrite (nb:1297-1303); here a
  * late-arriving correction to one month must recompute exactly that
  * month's partition of each gold table — through the PRODUCTION build
  * lambdas the registered gold queries serve from. */
class GoldIncrementalSpec extends SparkSpec {

  test("a late month refreshes one partition per gold table; served rows equal a direct build") {
    import spark.implicits._
    // mutable copy of the lake (master is derived from lineitem only)
    val work = Files.createTempDirectory("gold_inc").toFile.getAbsolutePath
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .write.parquet(s"$work/lineitem.parquet")
    def master = FlightPipeline.master(spark, work)

    val builds = Seq(
      "carrier" -> (Gold.goldCarrierBuild _),
      "monthly" -> (Gold.goldMonthlyBuild _),
      "causes" -> (Gold.goldCausesBuild _),
      "master" -> identity[org.apache.spark.sql.DataFrame] _)

    // initial build covers every month of the fixture
    val nMonths = master.select($"year_month").distinct().count()
    for ((name, build) <- builds) {
      val first = Incremental.refresh(spark, master, "year_month",
        build, s"$work/gold/$name")
      assert(first.size == nMonths, s"$name initial build: ${first.size}")
      assert(Incremental.refresh(spark, master, "year_month",
        build, s"$work/gold/$name").isEmpty, s"$name not idempotent")
    }

    // ONE late-arriving correction lands in 1995-03
    val late = spark.read.parquet(s"$work/lineitem.parquet")
      .filter(year($"l_shipdate") === 1995 && month($"l_shipdate") === 3)
      .limit(1).withColumn("l_orderkey", lit(987654321L))
    late.write.mode("append").parquet(s"$work/lineitem.parquet")

    for ((name, build) <- builds) {
      val stale = Incremental.refresh(spark, master, "year_month",
        build, s"$work/gold/$name")
      assert(stale == Seq("1995-03"),
        s"$name: late month must cost one partition, got $stale")
      // served state == a from-scratch build over the corrected lake
      val served = Incremental.read(spark, s"$work/gold/$name")
      val direct = build(master)
      assert(served.count() == direct.count(), name)
      assert(served.exceptAll(direct).count() == 0 &&
        direct.exceptAll(served).count() == 0,
        s"$name served rows diverge from direct build")
    }
  }
}
