package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
import graft.SparkSpec
import graft.pipeline.FlightPipeline

/** S1 main path: the all-string CSV boundary followed by the silver
  * cast chain reproduces the typed fixture (up to the fixed-scale
  * decimal rendering the CSV cells go through). */
class CsvBronzeSpec extends SparkSpec {

  test("CSV round trip: row count, schema types, and 4-dp value fidelity") {
    val out = CsvBronze.silverCsv(spark, sf0001)
    val src = FlightPipeline.silver(spark, sf0001)
    assert(out.count() == src.count())
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("year") == IntegerType && types("month") == IntegerType)
    assert(types("carrier") == StringType && types("airport_name") == StringType)
    assert(types("arr_delay") == DoubleType && types("carrier_delay") == DoubleType)
    // CSV cells are DECIMAL(18,4) renderings: totals agree to 4 dp scale
    val csvSum = out.agg(sum(round(col("arr_delay"), 4))).head.getDouble(0)
    val srcSum = src.agg(sum(round(col("arr_delay"), 4))).head.getDouble(0)
    assert(math.abs(csvSum - srcSum) < 1e-6, s"$csvSum vs $srcSum")
  }

  test("CSV scan has no inference pass: explicit schema, header honored") {
    val root = CsvBronze.writeCsv(spark, sf0001)
    val df = CsvBronze.readCsv(spark, root)
    assert(df.schema == CsvBronze.readSchema)
    // header rows are not data rows
    assert(df.where(col("year") === "year").count() == 0)
  }

  test("streaming CSV ingest drains the directory to the same typed rows") {
    import org.apache.spark.sql.streaming.Trigger
    val root = CsvBronze.writeCsv(spark, sf0001)
    val q = CsvBronze.silverCsvStream(spark, root)
      .writeStream.format("memory").queryName("csv_stream_sink")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    val streamed = spark.table("csv_stream_sink")
    val batch = CsvBronze.silverCsv(spark, sf0001)
    assert(streamed.count() == batch.count())
    assert(streamed.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      batch.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // content parity with the batch path (order-free compare)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
