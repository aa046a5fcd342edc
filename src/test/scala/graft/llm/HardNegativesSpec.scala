package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** embed_hard_negatives: structural contract of the mined pairs plus a
  * margin-guarded agreement check against a brute-force in-cell scan. */
class HardNegativesSpec extends SparkSpec {

  test("hard negatives are cross-label, cell-local, dense-ranked, and argmax-correct") {
    import spark.implicits._
    val got = Similarity.hardNegatives(spark, sf0001)
      .as[(Long, Int, Long, Int, Double)].collect().toSeq
    assert(got.nonEmpty)

    val labels = graft.Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    // cross-label
    got.foreach { case (v1, _, neg, negLabel, _) =>
      assert(labels(neg) == negLabel)
      assert(labels(v1) != negLabel, s"$v1 mined a same-label negative")
    }
    // ranks dense from 1, cosine non-increasing per anchor
    got.groupBy(_._1).foreach { case (v1, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.size), s"$v1 ranks not dense")
      assert(sorted.map(_._5).sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      }, s"$v1 cosines not ordered")
    }

    // brute-force agreement inside cells (double arithmetic, so only
    // enforce when the winner's margin clears the cross-arithmetic slop)
    val cells = Similarity.autoKAssign(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val vecs = graft.Tables(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val byCell = cells.toSeq.groupBy(_._2)
    got.filter(_._2 == 1).take(50).foreach { case (v1, _, neg, _, _) =>
      val mates = byCell(cells(v1)).map(_._1)
        .filter(o => o != v1 && labels(o) != labels(v1))
      val scored = mates.map(o => o -> cos(vecs(v1), vecs(o)))
        .sortBy { case (o, c) => (-c, o) }
      val (bfTop, bfCos) = scored.head
      if (scored.size < 2 || bfCos - scored(1)._2 > 1e-6)
        assert(neg == bfTop, s"anchor $v1: got $neg, brute-force $bfTop")
    }
  }
}
