package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Online ANN serving: streamed micro-batch answers from the
  * Incremental-materialized IVF index must be bit-identical to the
  * one-shot batch probe over the same queries. */
class AnnServeStreamSpec extends SparkSpec {

  test("streamed top-k from the materialized index equals the batch probe") {
    import spark.implicits._
    val work = Files.createTempDirectory("ann_serve").toFile.getAbsolutePath
    val vecs = graft.Tables(spark, sf0001, "embeddings").cache()

    // frozen model + index materialized through the incremental lake
    // (the IvfIncrementalSpec maintenance path — serving reads the
    // same artifact maintenance writes)
    graft.llm.Similarity.autoKCentroids(spark, sf0001)
      .write.parquet(s"$work/model")
    val model = spark.read.parquet(s"$work/model").cache()
    def derive(src: DataFrame): DataFrame =
      graft.llm.Similarity.assignToCells(spark, src, model)
        .join(src.select(col("vec_id"), col("label")), "vec_id")
    graft.sources.Incremental.refresh(spark, vecs, "label", derive,
      s"$work/index")
    val members = graft.sources.Incremental.read(spark, s"$work/index")
      .select($"vec_id", $"cell")
      .join(vecs.select($"vec_id", $"embedding"), "vec_id")
      .cache()

    // 6 query vectors across 2 files -> 2 micro-batches
    val queries = vecs.orderBy($"vec_id").limit(6)
      .select(($"vec_id" + 5000000L).as("q_id"), $"embedding".as("q_emb"))
      .cache()
    val inDir = s"$work/queries"
    queries.filter($"q_id" % 2 === 0).coalesce(1).write.parquet(inDir)
    queries.filter($"q_id" % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(inDir)

    val stream = spark.readStream
      .schema(queries.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = AnnServeStream.serve(spark, stream, model, members,
      s"$work/out", s"$work/ckpt")
    assert(q.awaitTermination(180000), "stream did not drain")

    val streamed = spark.read.parquet(s"$work/out").drop("batch")
    val batch = AnnServeStream.probeBatch(spark, queries, model, members)
    assert(streamed.count() == batch.count() && batch.count() >= 6)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // every query got answers, ranked dense from 1
    val perQ = streamed.groupBy($"q_id")
      .agg(count(lit(1)).as("n"), min($"rank").as("lo"), max($"rank").as("hi"))
      .as[(Long, Long, Int, Int)].collect()
    assert(perQ.length == 6)
    perQ.foreach { case (qid, n, lo, hi) =>
      assert(lo == 1 && hi == n, s"query $qid ranks not dense")
    }

    // replay idempotence: re-writing an already-committed epoch (the
    // crash-between-write-and-commit case) must not change the sink
    val before = spark.read.parquet(s"$work/out").count()
    val epochs = spark.read.parquet(s"$work/out")
      .select($"batch".cast("long")).distinct()
      .as[Long].collect().sorted
    val qidsInEpoch = spark.read.parquet(s"$work/out")
      .filter($"batch".cast("long") === epochs.head)
      .select($"q_id").distinct().as[Long].collect().toSeq
    val replayed = queries.filter($"q_id".isin(qidsInEpoch: _*))
    AnnServeStream.writeEpoch(
      AnnServeStream.probeBatch(spark, replayed, model, members),
      s"$work/out", epochs.head)
    val after = spark.read.parquet(s"$work/out")
    assert(after.count() == before, "replayed epoch appended duplicates")
    assert(after.drop("batch").exceptAll(batch).count() == 0)
  }
}
