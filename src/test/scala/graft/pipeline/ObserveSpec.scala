package graft.pipeline

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `Dataset.observe`: DQ metrics collected during the producing job —
  * no second scan — on both a batch write and a running stream. */
class ObserveSpec extends SparkSpec {

  test("batch job surfaces row/null/domain metrics without a second scan") {
    import spark.implicits._
    val obs = Observation("ingest_dq")
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), -1.0), (None, 3.0), (Some(4L), 0.5))
      .toDF("k", "v")
    val out = Observe.withIngestMetrics(df, obs, "k", col("v") >= 0)
    out.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("n_null_key") == 1L)
    assert(m("n_domain_bad") == 1L)
  }

  test("streaming micro-batches carry observed metrics in progress events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.lang.Long, Double)]
    val observed = mem.toDF().toDF("k", "v")
      .observe("stream_dq",
        count(lit(1)).as("n_rows"),
        sum(col("k").isNull.cast("long")).as("n_null_key"))
    val q = observed.writeStream.format("noop").start()
    try {
      mem.addData((1L: java.lang.Long) -> 1.0, (null: java.lang.Long) -> 2.0)
      q.processAllAvailable()
      val metrics = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("stream_dq")))
      assert(metrics.nonEmpty, "no observed metrics in progress")
      val last = metrics.last
      assert(last.getAs[Long]("n_rows") == 2L)
      assert(last.getAs[Long]("n_null_key") == 1L)
    } finally q.stop()
  }
}
