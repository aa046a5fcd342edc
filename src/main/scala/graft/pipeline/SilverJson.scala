package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.Det.sqlOrderBy
import graft.Tables
import graft.functions.DecodeTrimJson

/** The reference's executed silver ETL, end-to-end and oracle-checkable:
  * bronze envelope (binary JSON body + broker metadata) -> UTF-8 decode +
  * truncation repair (F1) -> `from_json` with explicit all-string schema
  * (F2) -> struct flatten (P1) -> `na.drop` on parse failures (P2) ->
  * column-by-column cast (F3). Citations:
  * `ETL/flight-silver-transformation (1).ipynb:1171-1244`,
  * `README.md:155-161`.
  *
  * Because the harness has no Kafka/EventHub, the bronze envelopes are
  * synthesized *inside the query* from `lineitem` (JSON via `to_json` —
  * F8 — over decimal-formatted strings so both engines build identical
  * bytes), with two deterministic corruption classes:
  *   - every 19th order's line 1 gains trailing capture noise after the
  *     final '}' -> repaired by the trim and kept;
  *   - every 23rd order's line 2 loses its last 5 chars (no '}' left)
  *     -> unparseable -> dropped by `na.drop`, like the reference's
  *     truncated capture tails.
  *
  * Scale posture: the whole pipeline is a narrow per-row map — no
  * shuffle, one WholeStageCodegen span (the decode-trim is a codegen'd
  * native expression, not a UDF), so it streams at scan speed on any
  * number of executors.
  */
object SilverJson {

  /** Parse schema: explicit, all strings (two-phase typing, ipynb:1171). */
  val payloadSchema: StructType = StructType(Seq(
    "year", "month", "carrier", "airport", "arr_flights", "arr_del15",
    "arr_delay", "produced_at").map(StructField(_, StringType)))

  val outCols: Seq[String] = Seq("year", "month", "carrier", "airport",
    "arr_flights", "arr_del15", "arr_delay", "produced_at")

  /** Bronze synthesis: envelope rows with binary `Body` (note casing —
    * exercises case-insensitive resolution P3, ipynb:1210-1216),
    * broker-ish metadata, and the corruption classes above. */
  def bronze(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val body = to_json(struct(
      year($"l_shipdate").cast("string").as("year"),
      month($"l_shipdate").cast("string").as("month"),
      concat($"l_returnflag", lit("-"), $"l_linestatus").as("carrier"),
      lpad(($"l_partkey" % 25).cast("string"), 2, "0").as("airport"),
      $"l_quantity".cast("decimal(12,2)").cast("string").as("arr_flights"),
      ($"l_quantity" * $"l_discount").cast("decimal(14,4)").cast("string")
        .as("arr_del15"),
      ($"l_extendedprice" * $"l_discount").cast("decimal(14,4)").cast("string")
        .as("arr_delay"),
      ($"l_orderkey" * 10 + $"l_linenumber").cast("string").as("produced_at")))
    val corrupted = when(
      $"l_orderkey" % 19 === 0 && $"l_linenumber" === 1,
      concat($"to_json_body", lit("<<<capture noise")))
      .when(
        $"l_orderkey" % 23 === 0 && $"l_linenumber" === 2,
        expr("substr(to_json_body, 1, length(to_json_body) - 5)"))
      .otherwise($"to_json_body")
    Tables(spark, dir, "lineitem")
      .withColumn("to_json_body", body)
      .select(
        corrupted.cast("binary").as("Body"),
        ($"l_orderkey" * 10 + $"l_linenumber").as("SequenceNumber"),
        date_format($"l_shipdate", "yyyy-MM-dd'T'HH:mm:ss").as("EnqueuedTimeUtc"),
        // broker metadata maps (FIXTURES.md A2 envelope shape); the
        // silver projection prunes them — Catalyst never reads these
        // columns from the scan (P1 column pruning through the pipeline)
        map(lit("x-opt-kafka-key"), $"l_returnflag").as("Properties"),
        map(lit("iothub-enqueuedtime"),
          date_format($"l_shipdate", "yyyy-MM-dd'T'HH:mm:ss"))
          .as("SystemProperties"))
  }

  /** Silver: decode -> repair -> parse -> flatten -> drop -> cast. */
  def silver(spark: SparkSession, dir: String): DataFrame =
    silverFrom(spark, bronze(spark, dir))

  /** The silver transform over any bronze envelope frame (synthesized
    * in-query, Avro capture files, or a stream) — the reference applies
    * the same cell to batch and streaming bronze (ipynb:1171-1244). */
  def silverFrom(spark: SparkSession, env: DataFrame): DataFrame = {
    import spark.implicits._
    DecodeTrimJson.register(spark)
    // case-insensitive body resolution (P3): the capture schema says
    // `Body`, the stream schema says `body` (ipynb:1210-1216)
    val bodyCol = env.columns.find(_.equalsIgnoreCase("body"))
      .getOrElse(throw new IllegalArgumentException("no body column"))
    env
      .withColumn("body_str", expr(s"decode_trim_json(`$bodyCol`)"))
      .select(from_json($"body_str", payloadSchema).as("data"))
      // `_rid` (nondeterministic) pins the null-drop filter ABOVE this
      // projection: a projection containing a nondeterministic field
      // blocks predicate pushdown, so the null-check can't sink below
      // the parse and re-evaluate the whole decode+parse chain inside
      // the scan filter (measured 4x: the CASE-branch corruption chain
      // gets inlined 3x into the pushed predicate). The filter MUST
      // also reference `_rid` — otherwise ColumnPruning deletes the
      // unused pin first and the pushdown proceeds anyway.
      .select($"data.*", monotonically_increasing_id().as("_rid"))
      .filter($"year".isNotNull && $"_rid" >= 0)
      .drop("_rid")
      .withColumn("year", $"year".cast("int"))
      .withColumn("month", $"month".cast("int"))
      .withColumn("arr_flights", $"arr_flights".cast("double"))
      .withColumn("arr_del15", $"arr_del15".cast("double"))
      .withColumn("arr_delay", $"arr_delay".cast("double"))
      .withColumn("produced_at", $"produced_at".cast("bigint"))
  }

  // NOTE: the synthetic lineitem has duplicate (orderkey, linenumber)
  // pairs, so produced_at is NOT unique — order by every output column
  // (equal rows are interchangeable, so this is a total content order).
  //
  // The total order exists only for the oracle hash gate. A global
  // `orderBy` would be RangePartitioning, whose bound-sampling job runs
  // the whole decode->parse->cast chain a SECOND time (measured: 2x the
  // query). `repartition(1).sortWithinPartitions` is the same total
  // order with a single evaluation: the narrow chain runs parallel
  // once, one round-robin shuffle, one in-partition sort. (In
  // production the silver table is written unsorted — this tail is
  // harness-only.)
  def silverQuery(spark: SparkSession, dir: String): DataFrame =
    silver(spark, dir).repartition(1).sortWithinPartitions(outCols.map(col): _*)

  /** Oracle SQL for the silver pipeline over lineitem-synthesized
    * bronze, with an optional extra predicate on the bronze rows (used
    * by the Avro capture subset, AvroBronze). */
  def silverSqlWhere(extraWhere: String): String = {
    val body =
      """'{"year":"' || CAST(year(l_shipdate) AS VARCHAR)
        | || '","month":"' || CAST(month(l_shipdate) AS VARCHAR)
        | || '","carrier":"' || l_returnflag || '-' || l_linestatus
        | || '","airport":"' || lpad(CAST(l_partkey % 25 AS VARCHAR), 2, '0')
        | || '","arr_flights":"' || CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR)
        | || '","arr_del15":"' || CAST(CAST(l_quantity * l_discount AS DECIMAL(14,4)) AS VARCHAR)
        | || '","arr_delay":"' || CAST(CAST(l_extendedprice * l_discount AS DECIMAL(14,4)) AS VARCHAR)
        | || '","produced_at":"' || CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)
        | || '"}'""".stripMargin.replace("\n", "")
    s"""WITH j AS (
       |  SELECT $body AS body, l_orderkey, l_linenumber FROM lineitem$extraWhere
       |),
       |c AS (
       |  SELECT CASE
       |    WHEN l_orderkey % 19 = 0 AND l_linenumber = 1 THEN body || '<<<capture noise'
       |    WHEN l_orderkey % 23 = 0 AND l_linenumber = 2 THEN substr(body, 1, length(body) - 5)
       |    ELSE body END AS s
       |  FROM j
       |),
       |r AS (
       |  SELECT CASE WHEN strpos(reverse(s), '}') = 0 THEN ''
       |         ELSE substr(s, 1, length(s) - strpos(reverse(s), '}') + 1) END AS s
       |  FROM c
       |),
       |p AS (
       |  SELECT
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.year') END AS year_s,
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.month') END AS month_s,
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.carrier') END AS carrier,
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.airport') END AS airport,
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.arr_flights') END AS arr_flights_s,
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.arr_del15') END AS arr_del15_s,
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.arr_delay') END AS arr_delay_s,
       |    CASE WHEN json_valid(s) THEN json_extract_string(s, '$$.produced_at') END AS produced_at_s
       |  FROM r
       |)
       |SELECT
       |  CAST(year_s AS INTEGER) AS year,
       |  CAST(month_s AS INTEGER) AS month,
       |  carrier, airport,
       |  CAST(arr_flights_s AS DOUBLE) AS arr_flights,
       |  CAST(arr_del15_s AS DOUBLE) AS arr_del15,
       |  CAST(arr_delay_s AS DOUBLE) AS arr_delay,
       |  CAST(produced_at_s AS BIGINT) AS produced_at
       |FROM p WHERE year_s IS NOT NULL${sqlOrderBy(outCols)}""".stripMargin
  }

  val silverSql: String = silverSqlWhere("")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "silver_json_pipeline" -> silverQuery)

  val oracles: Map[String, String] = Map(
    "silver_json_pipeline" -> silverSql)
}
