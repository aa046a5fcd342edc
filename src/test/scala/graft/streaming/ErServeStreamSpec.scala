package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ingestion-time record-linkage gate: per-record best-match verdicts
  * against the broadcast u-model + blocked master index; streamed
  * epochs bit-identical to the batch scorer; replayed epochs
  * idempotent; batch-tier agreement on the link region. */
class ErServeStreamSpec extends SparkSpec {

  private def incoming = {
    import spark.implicits._
    // one exact copy of a master record (same name/type/size, new key),
    // one near-variant in the same block, one alien record
    graft.star.Linkage.masterIndex(spark, sf0001)
      .orderBy($"k2").limit(2)
      .select(($"k2" + 1000000L).as("key"), $"p_brand",
        $"n2".as("name"), $"t2".as("p_type"), $"s2".as("p_size"))
      .unionByName(Seq((2000000L, "Brand#99", "unobtainium gizmo", "NONE", 99))
        .toDF("key", "p_brand", "name", "p_type", "p_size"))
  }

  test("exact copies of master records link; alien blocks come back new") {
    import spark.implicits._
    val verdicts = ErServeStream.scoreBatch(spark, incoming,
      graft.star.Linkage.masterIndex(spark, sf0001),
      graft.star.Linkage.uModel(spark, sf0001))
      .select($"key", $"best_match", $"best_weight", $"verdict")
      .as[(Long, Option[Long], Double, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(verdicts.size == incoming.count())
    // the alien brand has no block → weight 0, verdict new
    val alien = verdicts(2000000L)
    assert(alien._2.isEmpty && alien._3 == 0.0 && alien._4 == "new")
    // exact copies: full agreement pattern → the batch tier's strongest
    // weight; at sf0.001 that pattern sits BELOW the conservative link
    // threshold (see er_fellegi_sunter), so the verdict must be exactly
    // what the batch weight says, not hardcoded
    verdicts.removed(2000000L).values.foreach { case (_, m, w, v) =>
      assert(m.nonEmpty && w > 0.0)
      assert(v == (if (w >= 1000.0) "link" else "new"))
    }
  }

  test("streamed verdicts are bit-identical to batch; epoch replay is idempotent") {
    import spark.implicits._
    val index = graft.star.Linkage.masterIndex(spark, sf0001)
      .localCheckpoint()
    val umodel = graft.star.Linkage.uModel(spark, sf0001)
      .localCheckpoint() // pin the model: both sides probe ONE artifact
    val inDir = Files.createTempDirectory("er_in").toFile.getAbsolutePath
    val outDir = Files.createTempDirectory("er_out").toFile.getAbsolutePath
    val ckDir = Files.createTempDirectory("er_ck").toFile.getAbsolutePath
    incoming.write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("key LONG, p_brand STRING, name STRING, p_type STRING, p_size INT")
      .parquet(inDir)
    val q = ErServeStream.serve(spark, stream, index, umodel, outDir, ckDir)
    assert(q.awaitTermination(120000), "stream did not drain")
    assert(q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
      "gate must hold zero streaming state")

    def read(dir: String) = spark.read.parquet(dir)
      .select($"key", $"best_match", $"best_weight", $"verdict")
      .as[(Long, Option[Long], Double, String)].collect().sortBy(_._1).toSeq
    val streamed = read(outDir)
    val batch = ErServeStream.scoreBatch(spark, spark.read.parquet(inDir),
      index, umodel)
      .select($"key", $"best_match", $"best_weight", $"verdict")
      .as[(Long, Option[Long], Double, String)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, "streamed gate diverges from batch")

    // replaying epoch 0 must leave the sink unchanged (overwrite, not append)
    AnnServeStream.writeEpoch(
      ErServeStream.scoreBatch(spark, spark.read.parquet(inDir),
        index, umodel), outDir, 0L)
    assert(read(outDir) == streamed, "epoch replay duplicated rows")
  }
}
