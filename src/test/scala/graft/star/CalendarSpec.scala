package graft.star

import graft.SparkSpec

/** Calendar spine and gap-fill contracts: spine continuity, weekday
  * convention, and — the part the dense harness data cannot show — a
  * synthetic month hole materializing as an explicit zero row. */
class CalendarSpec extends SparkSpec {
  import spark.implicits._

  test("calendar spine is continuous and weekday-consistent") {
    val rows = Calendar.dimCalendar(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getDate(0).toLocalDate)
    days.sliding(2).foreach {
      case Array(a, b) => assert(b == a.plusDays(1), s"gap between $a and $b")
      case _ => ()
    }
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      // java.time: MONDAY=1 .. SUNDAY=7; ours: MONDAY=0
      assert(r.getInt(4) == d.getDayOfWeek.getValue - 1)
      assert((r.getInt(5) == 1) == (r.getInt(4) >= 5))
    }
  }

  test("gap fill materializes a zero row for a month with no orders") {
    val dir = java.nio.file.Files.createTempDirectory("gap").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // orders in Jan and Mar only — Feb must appear with zeros
    Seq(
      (1L, 1L, "O", 10.0, ts("2024-01-05"), "P1"),
      (2L, 1L, "O", 20.0, ts("2024-03-05"), "P1"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val rows = Calendar.gapFill(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", "P1", 1L, 10.0),
      ("2024-02-01", "P1", 0L, 0.0),
      ("2024-03-01", "P1", 1L, 20.0)))
  }
}
