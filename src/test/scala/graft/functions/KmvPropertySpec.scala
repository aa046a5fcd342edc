package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the KMV buffer over seeded random hash
  * streams (no SparkSession — reduce/merge are exactly what Spark's
  * partial aggregation calls). These are the properties that make the
  * sketch safe under ANY partitioning, merge tree, or retry. */
class KmvPropertySpec extends AnyFunSuite {

  private val K = 32
  private val agg = new KmvSketchAggregator(K)
  private val rng = new scala.util.Random(7)

  private def stream(n: Int): Array[Long] =
    // duplicates on purpose: KMV must behave as a SET sketch
    Array.fill(n)(rng.nextInt(n / 2 + 10).toLong * 0x9E3779B97F4A7C15L)

  private def sketchOf(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def reference(xs: Seq[Long]): Array[Long] =
    xs.map(_ & Long.MaxValue).distinct.sorted.take(K).toArray

  private val cases = Seq.fill(50)(stream(rng.nextInt(300) + 5))

  test("sketch equals the k smallest distinct masked hashes") {
    cases.foreach { xs =>
      assert(sketchOf(xs).sameElements(reference(xs)))
    }
  }

  test("merge is commutative") {
    cases.sliding(2).foreach { case Seq(a, b) =>
      val (sa, sb) = (sketchOf(a), sketchOf(b))
      assert(agg.merge(sa, sb).sameElements(agg.merge(sb, sa)))
    }
  }

  test("merge is associative") {
    cases.sliding(3).foreach { case Seq(a, b, c) =>
      val (sa, sb, sc) = (sketchOf(a), sketchOf(b), sketchOf(c))
      assert(agg.merge(agg.merge(sa, sb), sc)
        .sameElements(agg.merge(sa, agg.merge(sb, sc))))
    }
  }

  test("merge is idempotent (retry-safe on identical buffers)") {
    cases.foreach { xs =>
      val s = sketchOf(xs)
      assert(agg.merge(s, s).sameElements(s))
    }
  }

  test("any split of the stream merges to the whole-stream sketch") {
    cases.foreach { xs =>
      val whole = sketchOf(xs)
      val cut1 = rng.nextInt(xs.length)
      val cut2 = cut1 + rng.nextInt(xs.length - cut1)
      val parts = Seq(xs.slice(0, cut1), xs.slice(cut1, cut2),
        xs.slice(cut2, xs.length))
      val merged = parts.map(p => sketchOf(p)).reduce(agg.merge)
      assert(merged.sameElements(whole))
    }
  }
}
