package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native shingle generator must be row-for-row identical to the
  * built-in explode(transform(sequence…)) chain it replaces, and emit
  * nothing for under-length or null inputs. */
class PosShinglesSpec extends SparkSpec {

  private def tokenized = {
    import spark.implicits._
    graft.Tables(spark, sf0001, "documents")
      .select($"doc_id", split($"text", " ").as("t"))
  }

  test("generator equals the transform-chain formulation on real docs") {
    PosShingles.register(spark)
    val gen = tokenized
      .selectExpr("doc_id", "pos_shingles(t, 8, ' ') AS (i, sh)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val chain = tokenized
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 8), i -> named_struct('i', i, 'sh', concat_ws(' ', slice(t, i + 1, 8))))"))
        .as("s"))
      .select(col("doc_id"), col("s.i"), col("s.sh"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(gen.nonEmpty)
    assert(gen == chain)
  }

  test("under-length, empty, and null inputs emit zero rows") {
    import spark.implicits._
    PosShingles.register(spark)
    val df = Seq(
      (1L, Some(Seq("a", "b", "c"))),   // 3 tokens < n=4
      (2L, Some(Seq.empty[String])),
      (3L, None),
      (4L, Some(Seq("a", "b", "c", "d", "e")))
    ).toDF("id", "t")
    val out = df.selectExpr("id", "pos_shingles(t, 4, '_') AS (i, sh)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSet == Set(
      (4L, 0, "a_b_c_d"), (4L, 1, "b_c_d_e")))
  }
}
