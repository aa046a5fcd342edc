package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Ingestion-time conformal anomaly gate: broadcast band probe with
  * zero streaming state; streamed verdicts bit-identical to batch;
  * unseen types surface as "uncalibrated", never dropped. */
class ConformalGateStreamSpec extends SparkSpec {

  test("gate verdicts match the batch scorecard's counts; coverage ~ 1-alpha") {
    import spark.implicits._
    val model = graft.star.Inference.eventsConformalModel(spark, sf0001)
    val fold2 = graft.Tables(spark, sf0001, "events")
      .filter($"event_id" % 3 === 2)
      .select($"event_id", $"event_type", $"value")
    val gated = ConformalGateStream.gate(fold2, model)
    val byType = gated.groupBy($"event_type")
      .agg(count_if($"verdict" === "anomalous").as("n_anom"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toMap2
    val card = graft.star.Inference.eventsConformalGate(spark, sf0001)
      .select($"event_type", $"n_scored", $"n_anomalous")
      .as[(String, Long, Long)].collect().toSeq
    assert(card.nonEmpty)
    card.foreach { case (t, nScored, nAnom) =>
      assert(byType(t) == ((nAnom, nScored)))
      // conformal marginal guarantee (small-sample slack at sf0.001)
      assert(nAnom.toDouble / nScored < 0.25)
    }
  }

  test("the gate streams in append mode with zero state stores, bit-equal to batch; unseen types pass as uncalibrated") {
    import spark.implicits._
    val model = graft.star.Inference.eventsConformalModel(spark, sf0001)
      .localCheckpoint() // pin the band: both sides probe ONE artifact
    val inDir = Files.createTempDirectory("conf_in").toFile.getAbsolutePath
    graft.Tables(spark, sf0001, "events")
      .filter($"event_id" % 3 === 2)
      .select($"event_id", $"event_type", $"value")
      .unionByName(Seq((9999999L, "never_seen_type", 42.0))
        .toDF("event_id", "event_type", "value"))
      .write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("event_id LONG, event_type STRING, value DOUBLE")
      .parquet(inDir)
    val q = ConformalGateStream.gate(stream, model)
      .writeStream.format("memory").queryName("conformal_gate")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    assert(q.lastProgress.stateOperators.isEmpty,
      "gate must hold zero streaming state")

    val streamed = spark.table("conformal_gate")
      .select($"event_id", $"verdict").as[(Long, String)].collect().toMap
    val batch = ConformalGateStream.gate(spark.read.parquet(inDir), model)
      .select($"event_id", $"verdict").as[(Long, String)].collect().toMap
    assert(streamed == batch, "streamed gate diverges from batch")
    assert(streamed(9999999L) == "uncalibrated")
    assert(streamed.values.count(_ == "anomalous") > 0)
    assert(streamed.values.count(_ == "in_band") > 0)
  }

  private implicit class ToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
