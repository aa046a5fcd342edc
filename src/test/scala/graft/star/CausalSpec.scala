package graft.star

import graft.SparkSpec

/** stat_permutation_test + orders_did_lift: local reference solves on
  * collected data (same salted-hash permutations, same integer-cent
  * arithmetic). */
class CausalSpec extends SparkSpec {

  private def hash8(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("permutation p-value equals a local reference over the same 64 salted permutations") {
    import spark.implicits._
    val Seq((obs, nPerms, nGe, p)) = Warehouse.permutationTest(spark, sf0001)
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(nPerms == 64)
    assert(p > 0.0 && p <= 1.0)

    val pu = graft.Tables(spark, sf0001, "events")
      .selectExpr("user_id", "event_type", "CAST(round(value * 100) AS BIGINT) c")
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.filter(_._2 == "purchase").map(_._3).sum
      }.toSeq
    def stat(side: Long => Boolean): Double = {
      val (a, b) = pu.partition(r => side(r._1))
      math.abs(a.map(_._2).sum.toDouble / a.size -
        b.map(_._2).sum.toDouble / b.size)
    }
    val obsRef = stat(u => u % 2 == 1)
    assert(obs == obsRef)
    val ge = (0 until 64).count { b =>
      stat(u => hash8(s"perm:$u:$b") % 2 == 1) >= obsRef
    }
    assert(nGe == ge)
    assert(p == (ge + 1).toDouble / 65.0)
  }

  test("DiD equals a local reference over the four pre/post cells") {
    import spark.implicits._
    val Seq((n, mtPre, mtPost, mcPre, mcPost, did)) =
      Warehouse.didLift(spark, sf0001)
        .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq

    val o = graft.Tables(spark, sf0001, "orders")
      .selectExpr("o_orderpriority p", "CAST(year(o_orderdate) AS INT) yr",
        "CAST(round(o_totalprice * 100) AS BIGINT) c")
      .as[(String, Int, Long)].collect()
    assert(n == o.length)
    val split = (o.map(_._2).min + o.map(_._2).max + 1) / 2
    def cell(treated: Boolean, post: Boolean): Double = {
      val rs = o.filter(r =>
        (Set("1-URGENT", "2-HIGH")(r._1) == treated) && ((r._2 >= split) == post))
      rs.map(_._3).sum.toDouble / rs.size / 100.0
    }
    assert(mtPre == cell(true, false) && mtPost == cell(true, true))
    assert(mcPre == cell(false, false) && mcPost == cell(false, true))
    assert(did == (mtPost - mtPre) - (mcPost - mcPre))
  }
}
