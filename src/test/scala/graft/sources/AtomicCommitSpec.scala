package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The transactional contract of the commit protocols (round 6): a
  * writer killed at ANY point before the single atomic commit step
  * leaves readers on the complete OLD snapshot — never a mixed or
  * missing table — and the debris of the dead writer is reclaimable
  * without touching live data. This is the Delta-log property the
  * reference inherits from its sink format (ipynb:1297-1303), proven
  * here by fault injection rather than claimed by doc-comment. */
class AtomicCommitSpec extends SparkSpec {

  private def boom = new RuntimeException("injected writer death")

  test("Incremental: writer death mid-refresh leaves the old snapshot") {
    import spark.implicits._
    val work = Files.createTempDirectory("atomic_inc").toFile.getAbsolutePath
    val srcPath = s"$work/src"
    val outPath = s"$work/gold"
    def derive(src: DataFrame): DataFrame =
      src.groupBy(col("ym"))
        .agg(count(lit(1)).as("n"), graft.Det.xsum(col("v")).as("rev"))
    Seq((1L, 10.0, "2024-01"), (2L, 5.0, "2024-02"))
      .toDF("id", "v", "ym").write.parquet(srcPath)
    def src = spark.read.parquet(srcPath)

    Incremental.refresh(spark, src, "ym", derive, outPath)
    def state() = Incremental.read(spark, outPath)
      .select("ym", "n", "rev").as[(String, Long, Double)].collect().toSet
    val old = state()
    assert(old == Set(("2024-01", 1L, 10.0), ("2024-02", 1L, 5.0)))

    // dirty one partition, then kill the writer at each commit step
    Seq((3L, 2.5, "2024-02")).toDF("id", "v", "ym")
      .write.mode("append").parquet(srcPath)
    for (step <- Seq("after-data", "before-swap")) {
      Incremental.crashHook = s => if (s == step) throw boom
      try intercept[RuntimeException](
        Incremental.refresh(spark, src, "ym", derive, outPath))
      finally Incremental.crashHook = _ => ()
      // reader sees the complete old snapshot: not the new 2024-02 row,
      // not a missing partition, not a doubled one
      assert(state() == old, s"reader saw a torn commit after $step")
    }

    // the re-run commits; reader flips to the complete new snapshot
    assert(Incremental.refresh(spark, src, "ym", derive, outPath) ==
      Seq("2024-02"))
    val now = state()
    assert(now == Set(("2024-01", 1L, 10.0), ("2024-02", 2L, 7.5)))

    // vacuum reclaims the dead writers' generations and the superseded
    // partition data without disturbing the live snapshot
    val swept = Incremental.vacuum(outPath)
    assert(swept.nonEmpty)
    assert(state() == now)
    assert(Incremental.vacuum(outPath).isEmpty) // idempotent
  }

  test("Incremental.compact: coalesces fat partitions atomically, content unchanged") {
    import spark.implicits._
    val work = Files.createTempDirectory("atomic_cmp").toFile.getAbsolutePath
    val srcPath = s"$work/src"
    val outPath = s"$work/t"
    // micro-batch-shaped derive: many shuffle partitions → many files
    // per partition dir (the small-file problem compaction exists for)
    def derive(src: DataFrame): DataFrame = src.repartition(8)
    (1 to 64).map(i => (i.toLong, i * 1.5, s"2024-0${1 + i % 3}"))
      .toDF("id", "v", "ym").write.parquet(srcPath)
    def src = spark.read.parquet(srcPath)
    Incremental.refresh(spark, src, "ym", derive, outPath)

    def fileCount(e: Incremental.ManifestEntry) =
      new java.io.File(s"$outPath/gen=${e.gen}/${e.dir}")
        .listFiles().count(_.getName.endsWith(".parquet"))
    assert(Incremental.currentEntries(outPath).exists(fileCount(_) > 2),
      "fixture failed to produce a fat partition")
    def state() = Incremental.read(spark, outPath)
      .as[(Long, Double, String)].collect().toSet
    val old = state()

    // writer death mid-compaction: reader keeps the old snapshot
    Incremental.crashHook = s => if (s == "after-data") throw boom
    try intercept[RuntimeException](
      Incremental.compact(spark, outPath, "ym", maxFiles = 2))
    finally Incremental.crashHook = _ => ()
    assert(state() == old, "torn compaction visible")

    // real run: every compacted partition is one file, content identical,
    // fingerprints carried (so the next refresh sees nothing stale)
    val compacted = Incremental.compact(spark, outPath, "ym", maxFiles = 2)
    assert(compacted.nonEmpty)
    assert(Incremental.currentEntries(outPath).forall(fileCount(_) == 1))
    assert(state() == old)
    assert(Incremental.refresh(spark, src, "ym", derive, outPath).isEmpty,
      "compaction must not re-stale partitions")
    // superseded many-file dirs + the dead writer's gen are sweepable
    assert(Incremental.vacuum(outPath).nonEmpty)
    assert(state() == old)
    // idempotent: nothing fat remains
    assert(Incremental.compact(spark, outPath, "ym", maxFiles = 2).isEmpty)
  }

  test("Merge.upsert: writer death mid-commit leaves the old table") {
    import spark.implicits._
    val path = Files.createTempDirectory("atomic_merge")
      .toFile.getAbsolutePath + "/t"
    Merge.upsert(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), Seq("id"))
    def state() = Merge.read(spark, path)
      .as[(Long, String)].collect().toSet

    Versioned.beforeCommitHook = () => throw boom
    try intercept[RuntimeException](Merge.upsert(spark, path,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "tag"), Seq("id")))
    finally Versioned.beforeCommitHook = () => ()
    assert(state() == Set((1L, "a"), (2L, "b")), "torn upsert visible")

    // re-run converges; vacuum clears the dead writer's data dir
    Merge.upsert(spark, path,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "tag"), Seq("id"))
    assert(state() == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(Versioned.vacuum(path).nonEmpty)
    assert(state() == Set((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("Versioned OCC: interleaved writers cannot both claim a version") {
    import spark.implicits._
    val root = Files.createTempDirectory("atomic_occ")
      .toFile.getAbsolutePath
    val df = Seq((1L, "x")).toDF("id", "tag")
    assert(Versioned.write(df, root) == 0L)

    // writer A passes the expectedVersion PRECHECK, then writer B's
    // full commit lands in A's check→commit window — the exact
    // interleaving a check-then-act OCC misses. A must lose at the
    // atomic marker put, not silently share version 1 with B.
    var fired = false
    Versioned.beforeCommitHook = () => if (!fired) {
      fired = true // B's own write passes through the hook once
      Versioned.write(df, root, expectedVersion = Some(0L))
    }
    val e = try intercept[Versioned.VersionConflictException](
      Versioned.write(df, root, expectedVersion = Some(0L)))
    finally Versioned.beforeCommitHook = () => ()
    assert(e.getMessage.contains("conflict"))
    // B's commit is version 1 and intact; A left only an orphan dir
    assert(Versioned.latestVersion(root).contains(1L))
    assert(Versioned.read(spark, root).count() == 1)
    assert(Versioned.vacuum(root).size == 1)

    // a BLIND publisher (no expectedVersion) bumps past the loss
    var fired2 = false
    Versioned.beforeCommitHook = () => if (!fired2) {
      fired2 = true
      Versioned.write(df, root, expectedVersion = Some(1L))
    }
    try assert(Versioned.write(df, root) == 3L) // B took 2, blind A lands 3
    finally Versioned.beforeCommitHook = () => ()
  }
}
