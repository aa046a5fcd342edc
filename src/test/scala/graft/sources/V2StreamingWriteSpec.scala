package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.v2.LineSink

/** The V2 connector's STREAMING WRITE half (round-10 verdict item):
  * StreamCrashCommitSpec proves exactly-once for a foreachBatch sink
  * driven by hand; this drives the same kill points through Spark's
  * OWN V2 streaming commit protocol (`StreamingWrite.commit(epochId)`
  * on the LineSink provider). The query is killed inside the epoch
  * commit at both steps — before the epoch directory replace and
  * between the data move and the `_COMMITTED` marker — restarted from
  * its checkpoint, and must prove: (1) readers saw only complete
  * committed epochs while the writer lay dead (a marker-less torn
  * epoch is invisible); (2) the replayed epoch — re-run by Spark with
  * the SAME epoch id from the WAL — lands exactly once (the
  * epoch-replace commit can't double rows); (3) processing continues
  * past the crash window; (4) the final content equals the input
  * exactly (no loss, no dup, lossless line codec). */
class V2StreamingWriteSpec extends SparkSpec {

  private def parse(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.filter(length($"value") > 0)
      .select(split($"value", "\t").as("f"))
      .select($"f".getItem(0).cast("long").as("id"),
        $"f".getItem(1).cast("double").as("v"))
  }

  test("V2 streaming write killed mid-epoch-commit: old-or-new, exactly-once resume") {
    import spark.implicits._
    val work = Files.createTempDirectory("v2sw").toFile.getAbsolutePath
    val in = s"$work/in"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"

    def envFile(name: String, rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "v").repartition(1).write.parquet(s"$in/$name")

    def start() = spark.readStream
      .schema("id BIGINT, v DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
      .writeStream
      .format("graft.sources.v2.LineSinkProvider")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    def state() = parse(LineSink.readCommitted(spark, out))
      .as[(Long, Double)].collect().toSet

    // seed: two clean epochs commit through the V2 protocol
    envFile("f1", Seq((1L, 1.5), (2L, 2.5)))
    envFile("f2", Seq((3L, 3.5)))
    val q0 = start()
    try q0.processAllAvailable() finally q0.stop()
    var committed = state()
    assert(committed == Set((1L, 1.5), (2L, 2.5), (3L, 3.5)))

    // kill the driver-side epoch commit at each protocol step
    var next = 10L
    for (step <- Seq("before-epoch-commit", "before-epoch-marker")) {
      envFile(s"f_$step", Seq((next, next + 0.5)))
      LineSink.streamCrashHook = (s, _) => if (s == step)
        throw new RuntimeException(s"injected epoch-commit death at $step")
      val qDead = start()
      try {
        intercept[Exception](qDead.processAllAvailable())
        assert(qDead.exception.isDefined, "query should have died")
      } finally {
        LineSink.streamCrashHook = (_, _) => ()
        qDead.stop()
      }
      // dead writer, live readers: complete old snapshot, never torn —
      // in the before-epoch-marker case the epoch DIRECTORY exists
      // with data files, but without its marker it must be invisible
      assert(state() == committed, s"reader saw a torn epoch after $step")

      // restart from the checkpoint: Spark replays the epoch (same id)
      val qAlive = start()
      try qAlive.processAllAvailable() finally qAlive.stop()
      committed = state()
      assert(committed.contains((next, next + 0.5)),
        s"replayed epoch lost after $step")
      next += 10
    }

    // every input row exactly once — set equality AND multiset count
    assert(committed == Set((1L, 1.5), (2L, 2.5), (3L, 3.5),
      (10L, 10.5), (20L, 20.5)))
    assert(parse(LineSink.readCommitted(spark, out)).count() == 5L,
      "a replayed epoch double-appended")

    // the stream keeps going after the crash window
    envFile("f_post", Seq((99L, 0.25)))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(state().contains((99L, 0.25)))
    assert(parse(LineSink.readCommitted(spark, out)).count() == 6L)
  }
}
