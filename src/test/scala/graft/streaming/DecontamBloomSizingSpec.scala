package graft.streaming

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property contract of the decontamination gate's Bloom artifact
  * (verdict r8 item 8): the serialized size must TRACK the distinct-
  * shingle count within the sketch's published bound — the operational
  * promise "~bytes-per-shingle, versionable like a model artifact" —
  * and the gate's verdicts must equal the exact batch operator's even
  * on corpora whose eval-shingle count approaches the fpp-regime load
  * the filter was sized for. Bound used: Bloom theory's optimal bit
  * count m = −n·ln(p)/(ln 2)², which Spark's public sketch implements
  * verbatim (util.sketch.BloomFilter.optimalNumOfBits), plus a
  * 64-byte allowance for the version/hash-count header and the
  * long-alignment of the bit array. */
class DecontamBloomSizingSpec extends SparkSpec {

  private def optimalBytes(n: Long, fpp: Double): Long =
    (math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))) / 8.0).toLong

  test("serialized size tracks distinct-shingle count within the published bound") {
    import spark.implicits._
    val fpp = 1e-8
    val sizes = Seq(64L, 512L, 4096L, 32768L)
    val measured = sizes.map { n =>
      val df = spark.range(n).select(concat(lit("sh_"), $"id").as("sh"))
      val bytes = graft.functions.BloomSet.build(df, "sh", fpp).length.toLong
      val opt = optimalBytes(n, fpp)
      // within the published bound: never below the optimal sizing
      // (that would mean a hotter filter than the fpp promises) and
      // never more than 20% + header above it (no silent over-alloc)
      assert(bytes >= opt, s"n=$n: $bytes bytes under optimal $opt")
      assert(bytes <= (opt * 1.2).toLong + 64,
        s"n=$n: $bytes bytes exceeds optimal $opt by more than 20%+64B")
      n -> bytes
    }
    // linearity: 8x the shingles is 8x the bytes (within 25%) — the
    // "size tracks count" direction of the contract
    measured.sliding(2).foreach { case Seq((n1, b1), (n2, b2)) =>
      val ratio = b2.toDouble / b1.toDouble
      val expect = n2.toDouble / n1.toDouble
      assert(math.abs(ratio - expect) / expect < 0.25,
        s"size ratio $ratio vs count ratio $expect (n=$n1->$n2)")
    }
  }

  test("gate verdicts equal exact membership when eval shingles approach the fpp regime") {
    import spark.implicits._
    // ~49K distinct eval shingles — the load the 1e-8 filter is sized
    // for; ~18K probed train windows => expected FP count ~2e-4, so
    // hits must be EXACTLY the true membership counts w.h.p., while
    // the >= direction must hold unconditionally.
    val evalDocs = (0 until 100).map { i =>
      (1000000L + i, "000eval", (0 until 500).map(j => s"e${i}_$j").mkString(" "))
    }
    val evalShingles = evalDocs.flatMap { case (_, _, text) =>
      text.split(" ").sliding(8).map(_.mkString(" "))
    }.toSet
    // scalacheck-driven train corpus: per-doc copied-slice length and
    // source-doc offset drawn from fixed-seed generators (deterministic
    // across runs, spec reruns explore the same 200-point sample)
    val lenGen = Gen.chooseNum(0, 100)
    val offGen = Gen.chooseNum(0, 380)
    val train = (0 until 200).map { d =>
      val k = lenGen(Gen.Parameters.default, Seed(d * 7919L + 1)).getOrElse(0)
      val off = offGen(Gen.Parameters.default, Seed(d * 7919L + 2)).getOrElse(0)
      val src = evalDocs(d % 100)._3.split(" ")
      val copied = src.slice(off, off + k)
      val fresh = (copied.length until 100).map(j => s"t${d}_$j")
      (d.toLong, "train", (copied ++ fresh).mkString(" "))
    }
    val docs = spark.createDataFrame(evalDocs ++ train)
      .toDF("doc_id", "source", "text")
    val bloom = DecontamStream.evalBloom(docs)
    val gated = DecontamStream.gate(
      docs.filter($"source" === "train"), bloom)
      .select($"doc_id", $"n_windows", $"n_hits", $"verdict")
      .as[(Long, Int, Int, String)].collect()
    assert(gated.length == train.count(_._3.split(" ").length >= 8))
    gated.foreach { case (doc, nw, nh, v) =>
      val toks = train(doc.toInt)._3.split(" ")
      val wins = toks.sliding(8).map(_.mkString(" ")).toSeq
      val exact = wins.count(evalShingles.contains)
      assert(nw == wins.length, s"doc $doc window count")
      assert(nh >= exact, s"doc $doc false negative: $nh < $exact")
      assert(nh == exact, s"doc $doc FP inflation at fpp-regime load: $nh vs $exact")
      val expectV =
        if (exact.toDouble / nw >= 0.25) "contaminated" else "clean"
      assert(v == expectV, s"doc $doc verdict $v vs $expectV")
    }
    // the sample must actually exercise both verdicts
    assert(gated.exists(_._4 == "contaminated"))
    assert(gated.exists(_._4 == "clean"))
  }
}
