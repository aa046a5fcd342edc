package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graph_modularity + text_burstiness: structural laws the oracle's
  * engine-parity hash cannot see — modularity's edge/degree accounting
  * must close against the clustering it audits, and burstiness must
  * respect its Poisson lower bound. */
class ModularityBurstinessSpec extends SparkSpec {

  test("modularity: edge and degree accounting close; Q in (-1, 1); sizes match clusters()") {
    import spark.implicits._
    val rows = Cluster.modularity(spark, sf0001)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    val m = rows.map(_._3).sum // every candidate edge is intra-component
    assert(m > 0)
    // handshake: cluster degree sums count each intra edge twice
    assert(rows.map(_._4).sum == 2 * m, "sum of degree sums must be 2m")
    rows.foreach { case (cid, n, l, d, q) =>
      assert(n >= 2, s"cluster $cid: modularity rows are non-singleton")
      assert(l >= n - 1, s"cluster $cid: connected needs >= n-1 edges")
      assert(l <= n * (n - 1) / 2, s"cluster $cid: at most complete")
      assert(d >= 2 * l && d <= 2 * m)
      val expect = l.toDouble / m -
        (d.toDouble / (2 * m)) * (d.toDouble / (2 * m))
      assert(q == expect, s"cluster $cid q_contrib")
    }
    val qTot = rows.map(_._5).sum
    assert(qTot > -1.0 && qTot < 1.0, s"Q=$qTot out of range")

    // n_nodes agrees with the clusters() sizes for multi-doc clusters
    val sizes = Cluster.clusters(spark, sf0001)
      .filter($"cluster_size" > 1)
      .groupBy($"cluster_id").agg(max($"cluster_size").as("sz"))
      .as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._1 -> r._2).toMap == sizes)
  }

  test("burstiness: VMR exceeds the content-word floor and replays locally for the top term") {
    import spark.implicits._
    val rows = TextStats.burstiness(spark, sf0001)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(rows.size == 30)
    val n = graft.Tables(spark, sf0001, "documents").count()
    // vmr sorted desc with term tiebreak
    assert(rows.sortBy(r => (-r._4, r._1)) == rows)
    rows.foreach { case (term, df, tf, vmr) =>
      assert(df <= tf && tf >= 5)
      // Cauchy-Schwarz floor: sum c^2 >= tf^2/df -> vmr >= tf/df - tf/n
      assert(vmr >= tf.toDouble / df - tf.toDouble / n - 1e-12, s"$term")
    }
    // local replay for the single burstiest term
    val top = rows.head._1
    val counts = graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (_, t) => t.split(" ", -1).count(_ == top).toLong }
    val tf = counts.sum
    val s2 = counts.map(c => c * c).sum
    assert(rows.head._2 == counts.count(_ > 0))
    assert(rows.head._3 == tf)
    assert(rows.head._4 == s2.toDouble / tf - tf.toDouble / n)
  }
}
