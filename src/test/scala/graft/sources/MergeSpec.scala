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
    assert(Merge.read(spark, path).count() == 3)

    val updates = Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    Merge.upsert(spark, path, updates, Seq("id"))
    def state() = Merge.read(spark, path).as[(Long, String, Double)]
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
    val out = Merge.read(spark, path)
    assert(out.count() == 3)
    assert(out.where($"carrier" === "R" && $"year" === 1996)
      .head.getDouble(2) == 9.0)
  }

  test("deleteKeys rewrites only hit partitions, drops emptied ones") {
    import spark.implicits._
    import java.nio.file.Files
    val path = Files.createTempDirectory("erase").toFile.getAbsolutePath + "/t"
    // partition A: keys 1,2; B: key 3 only; C: key 4 (untouched)
    Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "C", 40.0))
      .toDF("user_id", "part", "v")
      .write.partitionBy("part").parquet(path)
    def files(p: String) = Option(new java.io.File(s"$path/part=$p")
      .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap
    val cBefore = files("C")
    Thread.sleep(1100) // mtime granularity guard
    // erase subjects 1 (partial A) and 3 (all of B)
    val hit = Merge.deleteKeys(spark, path, "part", "user_id", Seq(1L, 3L))
    assert(hit.toSet == Set("A", "B"))
    val left = spark.read.parquet(path)
      .select($"user_id").as[Long].collect().toSet
    assert(left == Set(2L, 4L))
    // B's directory is gone entirely (dynamic overwrite can't empty it)
    assert(!new java.io.File(s"$path/part=B").exists())
    // C's files are byte-for-byte untouched (same names, same mtimes)
    assert(files("C") == cBefore, "untouched partition was rewritten")
    // idempotent: erasing the same subjects again is a no-op
    assert(Merge.deleteKeys(spark, path, "part", "user_id", Seq(1L, 3L)).isEmpty)
  }
}
