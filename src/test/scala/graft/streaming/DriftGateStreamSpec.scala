package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Ingestion-time TVD drift gate: per-micro-batch verdicts with zero
  * streaming state, bit-identical to scoring the same rows batch-side;
  * a shifted feed trips the drift flag, an in-distribution feed does
  * not; epoch output is replay-idempotent (batch=<epochId> overwrite). */
class DriftGateStreamSpec extends SparkSpec {

  test("streamed per-batch verdicts are bit-equal to batch scoring; drift trips on a shifted feed only") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars")
    val ref = DriftGateStream.referenceHist(docs).localCheckpoint()

    // chunk A: in-distribution (the corpus itself)
    // chunk B: shifted feed (every page truncated to a tenth)
    val inDir = Files.createTempDirectory("drift_in").toFile.getAbsolutePath
    val outDir = Files.createTempDirectory("drift_out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("drift_ck").toFile.getAbsolutePath
    val chunkA = docs
    val chunkB = docs.select($"doc_id", ($"n_chars" / 10).cast("long").as("n_chars"))
    chunkA.coalesce(1).write.parquet(s"$inDir/f=a")

    val mkStream = () => spark.readStream
      .schema("doc_id LONG, n_chars LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/f=*")

    val q1 = DriftGateStream.serve(mkStream(), ref, outDir, ckpt)
    assert(q1.awaitTermination(120000), "first drain timed out")
    chunkB.coalesce(1).write.parquet(s"$inDir/f=b")
    val q2 = DriftGateStream.serve(mkStream(), ref, outDir, ckpt)
    assert(q2.awaitTermination(120000), "second drain timed out")
    assert(q2.lastProgress == null ||
      q2.lastProgress.stateOperators.isEmpty,
      "drift gate must hold zero streaming state")

    val verdicts = spark.read.parquet(s"$outDir/batch=*")
      .select($"n_docs", $"tvd_num", $"tvd", $"drifted")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    val batchA = DriftGateStream.scoreBatch(chunkA, ref)
      .select($"n_docs", $"tvd_num", $"tvd", $"drifted")
      .as[(Long, Long, Double, Boolean)].head()
    val batchB = DriftGateStream.scoreBatch(chunkB, ref)
      .select($"n_docs", $"tvd_num", $"tvd", $"drifted")
      .as[(Long, Long, Double, Boolean)].head()
    assert(verdicts == Set(batchA, batchB),
      s"streamed verdicts $verdicts != batch {$batchA, $batchB}")
    assert(!batchA._4, "in-distribution chunk must not trip the gate")
    assert(batchB._4, "shifted chunk must trip the gate")
    assert(batchA._3 == 0.0, "corpus vs itself has exact TVD 0")
  }

  test("replaying an epoch overwrites, never duplicates (idempotent sink)") {
    import spark.implicits._
    val docs = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars")
    val ref = DriftGateStream.referenceHist(docs).localCheckpoint()
    val outDir = Files.createTempDirectory("drift_o2").toFile.getAbsolutePath
    // simulate a replay: the same epoch body runs twice
    (1 to 2).foreach { _ =>
      DriftGateStream.scoreBatch(docs, ref)
        .withColumn("batch_id", lit(7L))
        .write.mode("overwrite").parquet(s"$outDir/batch=7")
    }
    assert(spark.read.parquet(s"$outDir/batch=7").count() == 1L)
  }
}
