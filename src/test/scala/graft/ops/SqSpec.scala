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

  test("all-zero corpus is rejected loudly (no NaN scale)") {
    import spark.implicits._
    val z = Seq((1L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Sq.trainScale(z) }
  }
}
