package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components via large-star/small-star: checked against a
  * brute-force union-find on synthetic graphs whose shapes stress the
  * algorithm (chains for diameter, stars, cliques, singleton merges),
  * then end-to-end on the real candidate-pair graph. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Cluster.components(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val expect = brute(edges).filter { case (k, v) => k != v }
    assert(run(edges) == expect)
  }

  test("chain of 40 collapses to one cluster (diameter >> rounds)") {
    // a path graph is the worst case for naive min-propagation
    // (diameter 39); star-contraction must still converge in <= 25 rounds
    check((1L until 40L).map(i => (i, i + 1)))
  }

  test("disjoint cliques, stars, and reversed/duplicated edges") {
    val clique = for { a <- 10L to 14L; b <- (a + 1) to 14L } yield (a, b)
    val star = (101L to 110L).map(i => (100L, i))
    val dupes = Seq((200L, 201L), (201L, 200L), (200L, 201L))
    check(clique ++ star ++ dupes)
  }

  test("two chains merged by a bridge edge") {
    val c1 = (1L until 10L).map(i => (i, i + 1))
    val c2 = (21L until 30L).map(i => (i, i + 1))
    check(c1 ++ c2 :+ (10L, 21L))
  }

  test("empty edge list yields no assignments") {
    assert(run(Seq.empty) == Map.empty)
  }

  test("random graphs match brute-force union-find (fixed seeds)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { _ =>
      val n = 30 + rnd.nextInt(30)
      val edges = Seq.fill(20 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      check(edges)
    }
  }

  test("clusters query: partition of all docs, keeper is min, sizes consistent") {
    val rows = Cluster.clusters(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val nDocs = graft.Tables(spark, sf0001, "documents").count()
    assert(rows.length == nDocs, "every document gets exactly one cluster row")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster id $cid must be its min member")
      assert(members.forall(_._3 == members.length.toLong), "cluster_size consistent")
      assert(members.count(_._4) == 1, "exactly one keeper per cluster")
    }
    // the LSH pair graph at sf0.001 has at least one multi-doc cluster
    assert(byCluster.values.exists(_.length > 1), "fixture has near-dup clusters")
  }

  test("pagerank step conserves probability mass over the pair graph") {
    // with r0 uniform, one damped step sums to exactly 1 over the graph
    // nodes: Σ inflow = Σ_u deg(u)·0.85/(N·deg(u)) = 0.85, plus N·0.15/N
    val rows = Cluster.pagerankStep(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 0.0))
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1e9) < 1.0,
      s"rank mass must be ~1e9 ppb (got $total)")
  }

  test("pagerank iter5 conserves mass and diverges from uniform") {
    // bidirectional edges mean no dangling mass: every round keeps
    // Σ rank = 1e9 ppb (up to 5 rounds of scale-5 quantization); and by
    // round 5 connectivity must differentiate ranks (non-uniform)
    val rows = Cluster.pagerankIter(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getDouble(1))
    assert(math.abs(vals.sum - 1e9) < 10.0,
      s"rank mass drifted (got ${vals.sum})")
    // the sf0.001 pair graph is close to regular (components of equal
    // degree), so the stationary point is near-uniform — assert only a
    // measurable, deterministic spread, not a large one
    assert(vals.max - vals.min > 1e-9, "ranks exactly uniform after 5 rounds")
  }

  test("triangle census: K4 gives 3 per vertex, chains give none") {
    // K4 on {1,2,3,4}: 4 triangles, each vertex in C(3,2) = 3
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
      .toDF("d1","d2")
    val census = Cluster.triangleCensus(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a path graph has wedges but no closures
    val chain = Seq((1L,2L),(2L,3L),(3L,4L)).toDF("d1","d2")
    assert(Cluster.triangleCensus(chain).collect().isEmpty)
  }

  test("negative sampling: no anchors, no near-dups, deterministic") {
    import spark.implicits._
    val rows = Cluster.negatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val pairs = Dedup.candidatePairs(spark, sf0001).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    rows.foreach { case (doc, rank, neg) =>
      assert(neg != doc, s"doc $doc drew itself")
      assert(!pairs((doc, neg)), s"doc $doc drew near-dup $neg")
      assert(rank == 1 || rank == 2)
    }
    rows.groupBy(_._1).foreach { case (_, rs) => assert(rs.length <= 2) }
    // re-run: the salted-hash draw is a pure function of ids
    val again = Cluster.negatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("edit distance on candidate pairs: bounds and exact-dup zeros") {
    val rows = Dedup.editDistance(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d1, d2, dist, sim) =>
      assert(d1 < d2 && dist >= 0 && sim >= 0.0 && sim <= 1.0)
    }
    // the fixture's near-dup pairs include byte-identical prefixes
    assert(rows.exists(_._4 == 1.0), "some candidate pair is prefix-identical")
  }
}
