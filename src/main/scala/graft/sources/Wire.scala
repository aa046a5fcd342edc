package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Producer wire-format helpers (SURVEY.md §2.1 S2/S3, §2.5 F7-F8): the
  * reference's CSV->JSON Kafka producer re-expressed as a projection a
  * Kafka sink consumes directly (`kafka-eh/produce_to_eventhub.py:73-79`).
  *
  * No Kafka broker exists in this harness, so the shape is produced and
  * tested as columns; against a real cluster the exact same frame goes
  * to `.write.format("kafka").option("kafka.bootstrap.servers", ...)` —
  * batching/linger/backpressure (the producer script's tuning knobs) are
  * sink configs, not data transformations.
  */
object Wire {

  /** JSON-serialize every row into `value`, optionally keying by a
    * column (`--key-field`, produce_to_eventhub.py:74-76), stamping
    * `produced_at` epoch seconds (produce_send_rows.py:76). */
  def kafkaShape(df: DataFrame, keyField: Option[String]): DataFrame = {
    val stamped = df.withColumn("produced_at",
      unix_timestamp(current_timestamp()))
    val value = to_json(struct(stamped.columns.toIndexedSeq.map(col): _*)).as("value")
    keyField match {
      case Some(k) => stamped.select(col(k).cast("string").as("key"), value)
      case None => stamped.select(lit(null).cast("string").as("key"), value)
    }
  }

  /** S2, the actual sink: batch-produce [[kafkaShape]] rows to a topic.
    * Runs verbatim on any cluster whose classpath carries the Kafka
    * connector (`spark-sql-kafka-0-10`); this harness ships no broker
    * and no connector jar, so execution here stops at datasource
    * resolution (asserted in `WireAndBulkLoadSpec`) — the producer
    * script's batching/linger knobs map to `kafka.*` options, not code. */
  def toKafka(df: DataFrame, bootstrapServers: String, topic: String,
      keyField: Option[String] = None): Unit =
    kafkaShape(df, keyField).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()

  /** T3 consume side: decode the Kafka wire (key/value binary +
    * broker timestamp — the columns `format("kafka")` yields) back
    * into typed body columns. Pure projection, so the SAME function
    * serves the real broker stream ([[fromKafkaStream]]) and any
    * replayed capture of it — and lets the produce->consume round trip
    * be proven broker-less: `fromWire(kafkaShape(df)) == df`
    * (WireAndBulkLoadSpec). */
  def fromWire(df: DataFrame,
      bodySchema: org.apache.spark.sql.types.StructType): DataFrame =
    df.select(
      from_json(col("value").cast("string"), bodySchema).as("body"),
      col("key").cast("string").as("wire_key"))
      .select(col("wire_key"), col("body.*"))

  /** T3, the actual broker source: `readStream.format("kafka")` feeding
    * [[fromWire]]. Runs verbatim where the connector jar is present;
    * this harness ships no broker, so resolution is where execution
    * stops here — the tested decode path is identical either way. */
  def fromKafkaStream(spark: org.apache.spark.sql.SparkSession,
      bootstrapServers: String, topic: String,
      bodySchema: org.apache.spark.sql.types.StructType): DataFrame =
    fromWire(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load(),
      bodySchema)

  /** S3/S5 streaming twin: paced production is the trigger cadence. */
  def toKafkaStream(envelopes: DataFrame, bootstrapServers: String,
      topic: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("15 minutes"))
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    envelopes.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
}
