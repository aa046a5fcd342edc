package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Versioned snapshots: monotone commits, time travel to any retained
  * version, and metadata-only rollback. */
class VersionedSpec extends SparkSpec {

  test("write/commit, time travel, and rollback semantics") {
    import spark.implicits._
    val root = Files.createTempDirectory("versioned").toFile.getAbsolutePath
    def snap(n: Int) = (1 to n).map(i => (i.toLong, s"gen$n")).toDF("id", "tag")

    assert(Versioned.latestVersion(root).isEmpty)
    assert(Versioned.write(snap(2), root) == 0L)
    assert(Versioned.write(snap(3), root) == 1L)
    assert(Versioned.write(snap(5), root) == 2L)

    // latest read sees the newest snapshot
    assert(Versioned.read(spark, root).count() == 5)
    // time travel to every retained version
    assert(Versioned.read(spark, root, Some(0L)).count() == 2)
    assert(Versioned.read(spark, root, Some(1L)).count() == 3)
    val tag1 = Versioned.read(spark, root, Some(1L))
      .select($"tag").distinct().as[String].collect().toSeq
    assert(tag1 == Seq("gen3"))

    // rollback: new commit, old data, nothing rewritten
    val v3 = Versioned.rollback(root, 1L)
    assert(v3 == 3L && Versioned.latestVersion(root).contains(3L))
    assert(Versioned.read(spark, root).count() == 3)
    // the rolled-back-over version is still readable for forensics
    assert(Versioned.read(spark, root, Some(2L)).count() == 5)
    // and a new write on top of the rollback keeps the chain monotone
    assert(Versioned.write(snap(7), root) == 4L)
    assert(Versioned.read(spark, root).count() == 7)
  }

  test("schema enforcement: drift refused; overwriteSchema evolves per-era") {
    import spark.implicits._
    val root = Files.createTempDirectory("versioned_sch").toFile.getAbsolutePath
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val evolved = Seq((1L, "a", 0.5), (2L, "b", 0.7)).toDF("id", "tag", "score")

    assert(Versioned.write(v1, root) == 0L)
    // default: a schema-changing commit is refused, table untouched
    val e = intercept[IllegalArgumentException](Versioned.write(evolved, root))
    assert(e.getMessage.contains("overwriteSchema"))
    assert(Versioned.latestVersion(root).contains(0L))
    // explicit evolution commits the new schema
    assert(Versioned.write(evolved, root, overwriteSchema = true) == 1L)
    assert(Versioned.read(spark, root).columns.toSeq ==
      Seq("id", "tag", "score"))
    // time travel across the boundary reads each era's own schema
    assert(Versioned.read(spark, root, Some(0L)).columns.toSeq ==
      Seq("id", "tag"))
    // post-evolution writes are enforced against the NEW schema
    intercept[IllegalArgumentException](Versioned.write(v1, root))
    assert(Versioned.write(evolved, root) == 2L)
  }

  test("optimistic concurrency: a stale expectedVersion refuses to commit") {
    import spark.implicits._
    val root = Files.createTempDirectory("versioned_occ").toFile.getAbsolutePath
    val df = Seq((1L, "a")).toDF("id", "tag")
    assert(Versioned.write(df, root) == 0L)

    // writer A reads v0, writer B commits v1 meanwhile
    val readByA = Versioned.latestVersion(root)
    assert(Versioned.write(df, root, expectedVersion = Some(0L)) == 1L)
    // A's commit against its stale read must conflict, table untouched
    val e = intercept[Versioned.VersionConflictException](
      Versioned.write(df, root, expectedVersion = readByA))
    assert(e.getMessage.contains("conflict"))
    assert(Versioned.latestVersion(root).contains(1L))
    // A re-reads and retries: succeeds
    assert(Versioned.write(df, root,
      expectedVersion = Versioned.latestVersion(root)) == 2L)
  }

  test("expire deletes old snapshots but never data a rollback points at") {
    import spark.implicits._
    val root = Files.createTempDirectory("versioned_exp").toFile.getAbsolutePath
    def snap(n: Int) = (1 to n).map(i => (i.toLong, s"gen$n")).toDF("id", "tag")

    Versioned.write(snap(2), root) // v0
    Versioned.write(snap(3), root) // v1
    Versioned.write(snap(5), root) // v2
    Versioned.rollback(root, 0L)   // v3 -> points at v0's data

    // keep the last 2 commits (v2, v3). v3 references v0's data, so
    // v0 must SURVIVE; only v1 is deletable.
    val deleted = Versioned.expire(root, keepLast = 2)
    assert(deleted == Seq(1L), deleted.toString)

    // current table (the rollback) still reads v0's data
    assert(Versioned.read(spark, root).count() == 2)
    assert(Versioned.read(spark, root, Some(2L)).count() == 5)
    // the expired version is gone
    intercept[Exception](Versioned.read(spark, root, Some(1L)).count())
    // expiring again is a no-op (idempotent maintenance)
    assert(Versioned.expire(root, keepLast = 2).isEmpty)
    // the chain stays writable after maintenance
    assert(Versioned.write(snap(9), root) == 4L)
    assert(Versioned.read(spark, root).count() == 9)
  }
}
