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

  test("quantized: int8 range, zero vectors, reconstruction within scale/2") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)), (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Embeddings.dequantized(Embeddings.quantized(df))
    val rows = q.collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    val q1 = rows(1L).getAs[scala.collection.Seq[Int]]("embedding_q").toSeq
    assert(q1 == Seq(64, -127, 32), s"got $q1") // scale = 1/127
    assert(rows(2L).getAs[scala.collection.Seq[Int]]("embedding_q").toSeq ==
      Seq(0, 0, 0))
    assert(rows(2L).getAs[Double]("embedding_scale") == 0.0)
    // max |x - dequant(x)| <= scale/2 on the real table (round-to-nearest)
    Tables.register(spark, sfDir)
    val bad = Embeddings.dequantized(Embeddings.quantized(spark.table("embeddings")))
      .select(expr(
        """aggregate(zip_with(cast(embedding AS ARRAY<DOUBLE>), embedding_dq,
          |  (x, d) -> abs(x - d)), CAST(0.0 AS DOUBLE), (a, e) -> GREATEST(a, e))
          |  - embedding_scale / 2.0""".stripMargin).as("excess"))
      .filter(col("excess") > 1e-12).count()
    assert(bad == 0, "every element must reconstruct within half a step")
  }

  test("nearestCentroidClassify: planted separated clusters classify perfectly") {
    import spark.implicits._
    // three well-separated clusters around (0,0), (10,0), (0,10)
    val pts = for {
      (lab, cx, cy) <- Seq((0, 0.0, 0.0), (1, 10.0, 0.0), (2, 0.0, 10.0))
      i <- 0 until 8
    } yield (lab.toLong * 100 + i, Seq(cx + (i % 3) * 0.1, cy + (i % 2) * 0.1), lab)
    val df = pts.toDF("vec_id", "embedding", "label")
    val out = Embeddings.nearestCentroidClassify(df)
    assert(out.filter(!col("correct")).count() == 0,
      "separated clusters must classify without error")
    // prediction column covers every label
    assert(out.select("pred").distinct().count() == 3)
  }

  test("nearestCentroidClassify: identical centroids tie to the lower label") {
    import spark.implicits._
    // both labels' centroids land exactly at 0.5 → every point is
    // equidistant and the deterministic tie-break must pick label 0
    val df = Seq(
      (1L, Seq(0.0), 0), (2L, Seq(1.0), 0),
      (3L, Seq(0.2), 1), (4L, Seq(0.8), 1)
    ).toDF("vec_id", "embedding", "label")
    val preds = Embeddings.nearestCentroidClassify(df)
      .select("pred").collect().map(_.getInt(0)).toSet
    assert(preds == Set(0))
  }

  test("mmr: rank-1 is pure relevance; λ=10 degenerates to top-k; diversity kicks in") {
    graft.Tables.register(spark, sfDir)
    val e = spark.table("embeddings")
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 2)
    val brute = Similarity.bruteForceKnn(e, q, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // λ=10 → zero diversity penalty → MMR IS relevance order
    val pure = Similarity.mmrRerank(e, q, shortlistK = 8, k = 4, lambdaTenths = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
      .map(t => (t._1, t._2, t._3.toInt)).toSet
    assert(pure == brute, s"λ=1.0 MMR must equal exact top-k\n$pure\n$brute")
    // default λ: first pick is still the most relevant neighbor per query
    val mmr = Similarity.mmrRerank(e, q, shortlistK = 8, k = 4)
    val first = mmr.filter(org.apache.spark.sql.functions.col("mmr_rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteFirst = brute.filter(_._3 == 1).map(t => (t._1, t._2))
    assert(first == bruteFirst)
    // selections are distinct per query and come from the shortlist
    val rows = mmr.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.distinct.length == rows.length)
  }
}
