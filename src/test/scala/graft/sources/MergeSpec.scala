package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Keyed upsert semantics: replace, insert, carry-over, idempotence. */
class MergeSpec extends SparkSpec {

  test("upsert replaces matched, inserts new, keeps untouched; idempotent") {
    import spark.implicits._
    val path = Files.createTempDirectory("merge").toFile.getAbsolutePath + "/t"
    Merge.upsert(spark,
      path,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "name", "v"),
      Seq("id"))
    assert(spark.read.parquet(path).count() == 3)

    val updates = Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    Merge.upsert(spark, path, updates, Seq("id"))
    def state() = spark.read.parquet(path).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(state() == Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))

    // idempotence: re-applying the same batch converges to the same state
    Merge.upsert(spark, path, updates, Seq("id"))
    assert(state() == Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("composite merge keys") {
    import spark.implicits._
    val path = Files.createTempDirectory("merge2").toFile.getAbsolutePath + "/t"
    Merge.upsert(spark, path,
      Seq(("R", 1996, 5.0), ("N", 1996, 7.0)).toDF("carrier", "year", "v"),
      Seq("carrier", "year"))
    Merge.upsert(spark, path,
      Seq(("R", 1996, 9.0), ("R", 1997, 1.0)).toDF("carrier", "year", "v"),
      Seq("carrier", "year"))
    import org.apache.spark.sql.functions._
    val out = spark.read.parquet(path)
    assert(out.count() == 3)
    assert(out.where($"carrier" === "R" && $"year" === 1996)
      .head.getDouble(2) == 9.0)
  }
}
