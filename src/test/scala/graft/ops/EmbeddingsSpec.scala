package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class EmbeddingsSpec extends SparkTestBase {

  test("centroids: known tiny input, exact element-wise means") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 6.0f)),
      (1, Seq(10.0f, 0.0f))).toDF("label", "embedding")
    val got = Embeddings.centroids(df).orderBy("label", "idx")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0, 1, 2.0), (0, 2, 4.0), (1, 1, 10.0), (1, 2, 0.0)))
  }

  test("normalized: unit norms, zero vectors preserved, single-pass lambda") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(-1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.normalized(df)
      .select(col("vec_id"), expr(
        "aggregate(embedding_unit, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)").as("n2"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(out(2L) == 0.0)
    assert(math.abs(out(3L) - 1.0) < 1e-12)
  }

  test("normalized over the real embeddings table: every norm is 1") {
    Tables.register(spark, sfDir)
    val bad = Embeddings.normalized(spark.table("embeddings"))
      .select(expr(
        "abs(aggregate(embedding_unit, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x) - 1.0)")
        .as("err"))
      .filter(col("err") > 1e-9).count()
    assert(bad == 0)
  }
}
