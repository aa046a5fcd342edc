package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Composition gate promised by `knnGraphAutoK`'s doc comment: "at
  * 100 TB the assignment is the materialized IVF index, maintained
  * partition-incrementally". The LSH signature index has this proof
  * (IncrementalIndexSpec); this is the IVF twin. The centroid MODEL is
  * frozen once (`Similarity.autoKCentroids` — re-clustering is the
  * separate scheduled rebuild); with the model fixed, a vector's cell
  * depends on that vector alone, so `Similarity.assignToCells` is a
  * valid partition-incremental derivation: mutating one label
  * partition of the embeddings recomputes exactly that partition's
  * (vec_id, cell) rows, and a cell probe served FROM the index equals
  * the self-contained recompute. */
class IvfIncrementalSpec extends SparkSpec {

  test("IVF index refreshes only the changed partition; probe matches") {
    val work = Files.createTempDirectory("ivf_idx").toFile.getAbsolutePath
    val srcPath = s"$work/embeddings.parquet"
    val modelPath = s"$work/centroids"
    val idxPath = s"$work/ivf_index"
    graft.Tables(spark, sf0001, "embeddings").write.parquet(srcPath)
    def vecs = spark.read.parquet(srcPath)

    // freeze the model from the initial snapshot (the re-cluster step)
    Similarity.autoKCentroids(spark, sf0001).write.parquet(modelPath)
    def model = spark.read.parquet(modelPath)
    def derive(src: DataFrame): DataFrame =
      Similarity.assignToCells(spark, src, model)
        .join(src.select(col("vec_id"), col("label")), "vec_id")

    // initial build covers every label partition
    val first = graft.sources.Incremental.refresh(
      spark, vecs, "label", derive, idxPath)
    val labels = vecs.select("label").distinct().count()
    assert(first.size == labels && labels > 1)

    // unchanged corpus: nothing recomputes
    assert(graft.sources.Incremental.refresh(
      spark, vecs, "label", derive, idxPath).isEmpty)

    // one new vector in ONE label -> exactly that partition refreshes
    val target = vecs.select(col("label")).orderBy("label").head.getInt(0)
    vecs.filter(col("label") === target).limit(1)
      .withColumn("vec_id", lit(99999999L))
      .write.mode("append").parquet(srcPath)
    val third = graft.sources.Incremental.refresh(
      spark, vecs, "label", derive, idxPath)
    assert(third == Seq(target.toString), s"stale set was $third")

    // incremental index == batch rebuild against the same frozen model
    val batch = derive(vecs)
    val index = graft.sources.Incremental.read(spark, idxPath)
      .select(batch.columns.map(col): _*)
    assert(index.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(index).count() == 0)
    assert(index.filter(col("vec_id") === 99999999L).count() == 1)

    // probe: nearest cell of a query vector, candidates drawn FROM the
    // materialized index, exact top-3 — equals the self-contained form
    // (same frozen model, assignment recomputed from scratch)
    def probeTop3(assignment: DataFrame): Seq[(Long, Double)] = {
      import spark.implicits._
      graft.functions.DecimalDot.register(spark)
      val q = vecs.orderBy("vec_id").limit(1)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"))
      val qCell = Similarity.assignToCells(
        spark, q.select($"q_id".as("vec_id"), $"qe".as("embedding")), model)
        .select($"cell".as("q_cell"))
      val cand = assignment.join(broadcast(qCell), col("cell") === col("q_cell"))
        .join(vecs.select($"vec_id", $"embedding"), "vec_id")
      cand.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"q_id")
        .selectExpr("vec_id",
          s"(${Similarity.dotSpark("embedding", "qe")} / " +
            s"sqrt(${Similarity.dotSpark("embedding", "embedding")} * " +
            s"${Similarity.dotSpark("qe", "qe")})) AS cosine")
        .orderBy(desc("cosine"), col("vec_id"))
        .limit(3)
        .as[(Long, Double)].collect().toSeq
    }
    val fromIndex = probeTop3(index)
    val selfContained = probeTop3(derive(vecs))
    assert(fromIndex.nonEmpty && fromIndex == selfContained,
      s"index probe $fromIndex != self-contained $selfContained")
  }
}
