package graft

/** t1 smoke: the flagship entry query returns rows (driver contract). */
class EntrySpec extends SparkSpec {
  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }
}
