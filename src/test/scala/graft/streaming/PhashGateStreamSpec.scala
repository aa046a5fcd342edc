package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.multimodal.Media

/** Ingestion-time image near-dup gate: map-only decode+phash per
  * micro-batch, stream-static band probes, popcount verification —
  * zero streaming state, verdicts bit-identical to batch, every
  * re-ingested image flags its lake twin at Hamming 0. */
class PhashGateStreamSpec extends SparkSpec {

  test("streamed image verdicts are bit-equal to batch; re-ingested twins flag at Hamming 0; zero state") {
    import spark.implicits._
    val lake = Media.imageTable(spark, sf0001)
    val index = PhashGateStream.buildIndex(lake).localCheckpoint()

    val inDir = Files.createTempDirectory("phg_in").toFile.getAbsolutePath
    lake.withColumn("doc_id", $"doc_id" + 1000000000L)
      .write.mode("overwrite").parquet(inDir)
    val nImages = lake.count()

    val stream = spark.readStream
      .schema("doc_id LONG, media_type STRING, content BINARY")
      .parquet(inDir)
      .as[Media.MediaFile]
    val q = PhashGateStream.detect(stream, index)
      .writeStream.format("memory").queryName("phash_gate")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream did not drain")
    assert(q.lastProgress.stateOperators.isEmpty,
      "phash gate must hold zero streaming state")

    val streamed = spark.table("phash_gate")
      .select($"doc_id", $"dup_of", $"hamming", $"band")
      .as[(Long, Long, Int, String)].collect().toSet
    val batch = PhashGateStream.detect(
      spark.read.parquet(inDir).as[Media.MediaFile], index)
      .select($"doc_id", $"dup_of", $"hamming", $"band")
      .as[(Long, Long, Int, String)].collect().toSet
    assert(streamed == batch, "streamed gate diverges from batch")

    // every re-keyed image must flag its lake twin at Hamming 0
    val twinHits = streamed.collect {
      case (d, dup, 0, _) if d - 1000000000L == dup => d
    }
    assert(twinHits.size == nImages,
      s"expected $nImages twin hits, got ${twinHits.size}")
    // and the gate also surfaces the fixture's cross-image families
    assert(streamed.exists { case (d, dup, hm, _) =>
      d - 1000000000L != dup && hm > 0 })
  }
}
