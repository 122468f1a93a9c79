package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8): every embedding component rounds to a
  * signed int8 against ONE global symmetric scale — the simplest, most
  * robust bandwidth knob in the ANN family. The corpus scans as
  * `array<tinyint>` (4x fewer bytes than float32, 8x vs the double
  * verify form), the quantized-cosine shortlist ranks candidates from
  * codes alone, and an exact-cosine rerank of the shortlist restores
  * exact ordering — the same shortlist-then-rerank contract as [[Pq]]
  * (reference has no ANN surface; this is beyond-parity, certified
  * against the s01 exact-kNN oracle like s08).
  *
  * Versus PQ: SQ8 needs no codebook training (the "model" is one scalar
  * from one aggregate), has zero reconstruction blind spots (every
  * dimension keeps its own sign and magnitude at 1/127 resolution), and
  * compresses 4x instead of 16x — the standard first rung of the
  * quantization ladder, composable with IVF cell pruning exactly like PQ.
  *
  * Scale shape: trainScale is ONE corpus-wide max-abs (a narrow
  * partial-aggregating scan — never an explode), encode is a pure
  * projection, search is a broadcast of the (small) query codes against
  * the codes scan + an id-keyed hash join for the rerank's raw vectors.
  */
object Sq {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** 127 / max|component| over the corpus — one distributed scalar. */
  def trainScale(corpus: DataFrame, vecCol: String = "embedding"): Double = {
    val maxAbs = corpus
      .agg(max(aggregate(transform(asDouble(col(vecCol)), x => abs(x)),
        lit(0.0), (a, x) => greatest(a, x))))
      .head.getDouble(0)
    require(maxAbs > 0.0, "SQ8: all-zero corpus (no scale exists)")
    127.0 / maxAbs
  }

  /** int8 codes: round(x * scale) clamped to [-127, 127]. */
  def encode(corpus: DataFrame, scale: Double, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("n_id"),
      transform(asDouble(col(vecCol)),
        x => greatest(lit(-127.0), least(lit(127.0), round(x * scale)))
          .cast("tinyint")).as("n_code"))

  /** integer dot product of two int8 code arrays (exact in long). */
  private def dotCodes(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Top-k cosine neighbors: quantized-cosine shortlist from the codes
    * scan, exact rerank of the shortlist against the raw vectors. Output
    * (q_id, n_id, rank, sim) — s01's shape, certified exact as long as
    * `shortlist` exceeds the worst true-neighbor quantized rank (SqSpec
    * measures the margin on the fixtures). */
  def search(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
             scale: Double, k: Int, shortlist: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val qCodes = encode(queries, scale, idCol, vecCol)
      .select(col("n_id").as("q_id"), col("n_code").as("q_code"))
    // quantized cosine: scale cancels in the ratio, so codes alone rank
    val qn = broadcast(qCodes.withColumn("q_norm",
      sqrt(dotCodes(col("q_code"), col("q_code")).cast("double"))))
    val simQ = encoded.crossJoin(qn)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("sim_q",
        dotCodes(col("n_code"), col("q_code")).cast("double") /
          (sqrt(dotCodes(col("n_code"), col("n_code")).cast("double")) *
            col("q_norm")))
    val wq = Window.partitionBy("q_id")
      .orderBy(col("sim_q").desc, col("n_id").asc)
    val short = simQ.withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= shortlist)
      .select("q_id", "n_id", "qrank")
    // exact rerank: raw vectors join back by id (broadcast query side)
    val rawC = corpus.select(col(idCol).as("n_id"),
      asDouble(col(vecCol)).as("n_vec"))
    val rawQ = broadcast(queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("q_vec")))
    val exact = short.join(rawC, "n_id").join(rawQ, "q_id")
      .withColumn("sim", Similarity.cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Measurement twin for the shortlist-margin claim: the worst quantized
    * rank (qrank) at which any TRUE top-k neighbor sits — `shortlist`
    * must exceed this for [[search]] to be exact. */
  def worstTrueNeighborRank(encoded: DataFrame, corpus: DataFrame,
                            queries: DataFrame, scale: Double, k: Int,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): Int = {
    val truth = Similarity.bruteForceKnn(corpus, queries, k, idCol, vecCol)
      .select("q_id", "n_id")
    // rank in the QUANTIZED ordering of each true neighbor
    val qCodes = encode(queries, scale, idCol, vecCol)
      .select(col("n_id").as("q_id"), col("n_code").as("q_code"))
    val qn = broadcast(qCodes.withColumn("q_norm",
      sqrt(dotCodes(col("q_code"), col("q_code")).cast("double"))))
    val simQ = encoded.crossJoin(qn)
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("sim_q",
        dotCodes(col("n_code"), col("q_code")).cast("double") /
          (sqrt(dotCodes(col("n_code"), col("n_code")).cast("double")) *
            col("q_norm")))
    val wq = Window.partitionBy("q_id")
      .orderBy(col("sim_q").desc, col("n_id").asc)
    val ranked = simQ.withColumn("qrank", row_number().over(wq))
    ranked.join(truth, Seq("q_id", "n_id"))
      .agg(max("qrank")).head.getInt(0)
  }
}
