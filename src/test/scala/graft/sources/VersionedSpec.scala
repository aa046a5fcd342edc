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
