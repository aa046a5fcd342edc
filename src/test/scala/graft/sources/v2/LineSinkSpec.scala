package graft.sources.v2

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The V2 write/commit protocol end to end: parallel staged writes,
  * atomic job commit with _SUCCESS last, content parity with the
  * DataFrame that was written, and no partial output after an abort. */
class LineSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("linesink").toFile.getAbsolutePath + "/out"

  test("parallel write commits atomically and round-trips the data") {
    val dir = tmp()
    val df = spark.read.parquet(s"$sf0001/nation.parquet")
      .select($"n_nationkey".cast("long").as("k"), $"n_name")
    df.repartition(3).write
      .format("graft.sources.v2.LineSinkProvider")
      .option("path", dir)
      .mode("append")
      .save()
    assert(Files.exists(Paths.get(dir, "_SUCCESS")))
    assert(!Files.exists(Paths.get(dir, "_tmp")), "staging must be cleaned")
    // read the committed lines back and compare contents exactly
    val back = spark.read.text(dir)
      .filter(length($"value") > 0)
      .select(split($"value", "\t").as("f"))
      .select($"f".getItem(0).cast("long").as("k"), $"f".getItem(1).as("n_name"))
    val exp = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = back.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == exp, s"missing=${exp -- got} extra=${got -- exp}")
    // one committed file per partition
    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("part-"))
    assert(parts.length == 3, parts.mkString(", "))
  }

  test("a failing write aborts with no partial output") {
    val dir = tmp()
    val df = spark.range(0, 100, 1, 2)
      .select($"id", when($"id" === 77L,
        expr("raise_error('boom')")).otherwise($"id".cast("string")).as("s"))
    intercept[Exception] {
      df.write.format("graft.sources.v2.LineSinkProvider")
        .option("path", dir).mode("append").save()
    }
    // no _SUCCESS, no committed part files — a reader sees nothing
    assert(!Files.exists(Paths.get(dir, "_SUCCESS")))
    val committed = if (Files.exists(Paths.get(dir)))
      Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(_.contains("part-"))
    else Array.empty[String]
    assert(committed.isEmpty, committed.mkString(", "))
  }
}
