package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** SQ8 scalar quantization (s17): the shortlist+rerank contract shared
  * with Pq — codes rank candidates, exact cosine restores exact order —
  * plus the measured-margin evidence that makes "certified against the
  * exact oracle" honest rather than lucky. */
class SqSpec extends SparkTestBase {

  private def embs = { Tables.register(spark, sfDir); spark.table("embeddings") }

  test("sq8 shortlist+rerank equals brute force; codes are genuine int8") {
    val scale = Sq.trainScale(embs)
    val enc = Sq.encode(embs, scale)
    assert(enc.schema("n_code").dataType.simpleString == "array<tinyint>",
      "codes must scan as tinyint (the 4x bandwidth claim)")
    val queries = embs.filter(col("vec_id") < 4)
    val got = Sq.search(enc, embs, queries, scale, k = 5, shortlist = 64)
      .collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(embs, queries, k = 5)
      .collect().map(_.toString).sorted
    assert(got.sameElements(brute), "SQ8 rerank must restore exact order")
  }

  test("worst true-neighbor quantized rank leaves the 64-shortlist margin") {
    val scale = Sq.trainScale(embs)
    val enc = Sq.encode(embs, scale)
    val worst = Sq.worstTrueNeighborRank(enc, embs,
      embs.filter(col("vec_id") < 8), scale, k = 5)
    assert(worst <= 32,
      s"worst true-neighbor quantized rank $worst erodes the 64 shortlist")
    info(s"worst true-neighbor quantized rank = $worst (shortlist 64)")
  }

  test("sign-bit shortlist+rerank equals brute force; codes pack to longs") {
    val signs = Sq.signEncode(embs)
    assert(signs.schema("n_sign").dataType.simpleString == "array<bigint>",
      "sign codes must pack into long words (the 32x claim)")
    import spark.implicits._
    val words = signs.select(size(col("n_sign"))).as[Int].head()
    assert(words == 1, s"64-dim fixture must pack into ONE word, got $words")
    val queries = embs.filter(col("vec_id") < 4)
    val got = Sq.searchSign(signs, embs, queries, k = 5,
      shortlist = (embs.count() / 2).toInt)
      .collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(embs, queries, k = 5)
      .collect().map(_.toString).sorted
    assert(got.sameElements(brute), "sign rerank must restore exact order")
  }

  test("worst true-neighbor Hamming rank stays under the corpus/2 " +
    "shortlist contract") {
    val signs = Sq.signEncode(embs)
    val n = embs.count()
    val worst = Sq.worstTrueNeighborSignRank(signs, embs,
      embs.filter(col("vec_id") < 8), k = 5)
    // 1-bit codes are coarse: the worst true neighbor sits at a stable
    // ~1/3 of the corpus (91/166/640 of 500/500/2000 at sf0.001/.01/.1)
    // — a FRACTION, not a fixed rank; corpus/2 is the exactness contract
    // (1.5x margin) and 40% is the regression pin
    assert(worst <= (n * 2) / 5,
      s"worst true-neighbor Hamming rank $worst erodes the corpus/2 " +
        s"shortlist contract (n=$n)")
    info(s"worst true-neighbor Hamming rank = $worst of $n")
  }

  test("zero-code vectors under a heavy-tailed scale rank LAST, never " +
    "displace true neighbors (NaN-orders-first trap)") {
    import spark.implicits._
    // one outlier sets the global scale so the 30 junk vectors' every
    // component rounds to 0 -> zero-norm codes -> 0/0 cosine. Spark sorts
    // NaN as the LARGEST double, so before the floor fix the junk ranked
    // FIRST in the desc shortlist and pushed out every true neighbor.
    // junk points AWAY from the query direction (negative first component)
    // so the true top-5 is mids + outlier — all with nonzero codes
    val junk = (1L to 30L).map(i =>
      (i, Array(-0.001 * (i % 3 + 1), -0.001, 0.001 * (i % 5), -0.002)))
    val mids = (50L to 54L).map(i =>
      (i, Array(30.0 + i, 5.0, -3.0 * (i % 2), 1.0)))
    val outlier = Seq((99L, Array(1000.0, -1000.0, 1000.0, -1000.0)))
    val df = (junk ++ mids ++ outlier).toDF("vec_id", "embedding")
    val scale = Sq.trainScale(df)
    val enc = Sq.encode(df, scale)
    assert(enc.filter(col("n_id") <= 30L)
      .filter(expr("exists(n_code, x -> x != 0)")).count() == 0,
      "fixture: junk vectors must quantize to the all-zero code")
    val queries = df.filter(col("vec_id") === 50L)
    // shortlist 5 < 30 junk: with the NaN ordering the shortlist would be
    // pure junk and the rerank could never see the true neighbors
    val got = Sq.search(enc, df, queries, scale, k = 5, shortlist = 5)
      .collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(df, queries, k = 5)
      .collect().map(_.toString).sorted
    assert(got.sameElements(brute),
      "zero-code junk displaced true neighbors from the shortlist")
  }

  test("all-zero corpus is rejected loudly (no NaN scale)") {
    import spark.implicits._
    val z = Seq((1L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Sq.trainScale(z) }
  }
}
