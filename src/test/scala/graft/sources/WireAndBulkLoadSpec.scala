package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** S2 wire shape + S9 external-stage bulk-load semantics. */
class WireAndBulkLoadSpec extends SparkSpec {

  test("kafka wire shape: keyed JSON values with produced_at stamp (S2/F7/F8)") {
    import spark.implicits._
    val df = Seq((2024, "YV"), (2025, "AA")).toDF("year", "carrier")
    val wire = Wire.kafkaShape(df, Some("carrier"))
    assert(wire.columns.toSeq == Seq("key", "value"))
    val r = wire.where($"key" === "YV").head.getString(1)
    assert(r.contains(""""year":2024""") && r.contains(""""produced_at":"""))
    // unkeyed variant -> null keys (round-robin partitioning at the broker)
    assert(Wire.kafkaShape(df, None).where($"key".isNull).count() == 2)
  }

  test("kafka sink path wires to the kafka datasource (S2, no broker here)") {
    import spark.implicits._
    val df = Seq((2024, "YV")).toDF("year", "carrier")
    // no connector jar ships in this harness, so the save must fail AT
    // DATASOURCE RESOLUTION — proving the sink path is wired to the
    // real `kafka` format, not short-circuited before it
    val e = intercept[Exception] {
      Wire.toKafka(df, "broker:9092", "flights", Some("carrier"))
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  /** Snowflake `COPY INTO ... PATTERN='.*carrier.*' MATCH_BY_COLUMN_NAME
    * ON_ERROR=CONTINUE` (nb:188-193): regex file filtering, by-name
    * column resolution across files with different column order/subsets,
    * and tolerance of missing columns. */
  test("wire round trip: fromWire(kafkaShape(df)) restores the body (T3)") {
    import spark.implicits._
    val df = Seq((2024, "YV", 10.5), (2025, "AA", 3.25))
      .toDF("year", "carrier", "arr_delay")
    // what format("kafka") yields on the consume side: binary key/value
    val onWire = Wire.kafkaShape(df, Some("carrier"))
      .select($"key".cast("binary").as("key"), $"value".cast("binary").as("value"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "year INT, carrier STRING, arr_delay DOUBLE, produced_at BIGINT")
    val back = Wire.fromWire(onWire, schema)
    assert(back.columns.toSeq ==
      Seq("wire_key", "year", "carrier", "arr_delay", "produced_at"))
    val rows = back.select($"wire_key", $"year", $"carrier", $"arr_delay")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(rows == Set(("YV", 2024, "YV", 10.5), ("AA", 2025, "AA", 3.25)))
  }

  test("kafka source path wires to the kafka datasource (T3, no broker here)") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("year INT")
    val e = intercept[Exception] {
      Wire.fromKafkaStream(spark, "broker:9092", "flights", schema)
        .writeStream.format("noop").start().processAllAvailable()
    }
    val msg = e.toString.toLowerCase
    assert(msg.contains("kafka"), msg)
  }

  test("bulk load: regex file filter + by-name resolution + missing-column tolerance (S9)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stage").toFile.getAbsolutePath
    // file 1: canonical column order
    Seq((1L, "AA", 10.0)).toDF("id", "carrier", "flights")
      .write.parquet(s"$dir/part_carrier_1")
    // file 2: different column ORDER (by-name resolution must fix it)
    Seq(("BB", 20.0, 2L)).toDF("carrier", "flights", "id")
      .write.parquet(s"$dir/part_carrier_2")
    // file 3: a column missing entirely (-> null, ON_ERROR=CONTINUE)
    Seq((3L, "CC")).toDF("id", "carrier")
      .write.parquet(s"$dir/part_carrier_3")
    // file 4: should be EXCLUDED by the regex
    Seq((99L, "XX", 99.0)).toDF("id", "carrier", "flights")
      .write.parquet(s"$dir/other_monthly_1")

    val paths = new java.io.File(dir).listFiles()
      .map(_.getAbsolutePath).filter(_.matches(".*carrier.*")).sorted
    val loaded = spark.read
      .schema("id BIGINT, carrier STRING, flights DOUBLE")
      .parquet(paths: _*)
    assert(loaded.count() == 3)
    assert(loaded.where($"carrier" === "XX").count() == 0)     // regex filter
    assert(loaded.where($"id" === 2L).head.getDouble(2) == 20.0) // by-name
    assert(loaded.where($"id" === 3L).head.isNullAt(2))        // tolerance
  }
}
