package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Embedding-column utilities beyond search: per-group centroids and unit
  * normalization — the building blocks for cluster labeling, drift checks,
  * and cosine-ready storage in a training-data pipeline.
  */
object Embeddings {

  /** Element-wise per-group mean vector, exploded as (group, idx, centroid)
    * rows with 1-based idx. posexplode + groupBy(group, idx) is one shuffle
    * of (group, idx, value) triples with map-side partial sums — never a
    * whole-vector collect. Values accumulate as exact DECIMAL(27,15) so the
    * result is independent of partition/summation order (float addition is
    * not associative; exact accumulation is).
    */
  def centroids(df: DataFrame, byCol: String = "label",
                vecCol: String = "embedding"): DataFrame =
    df.select(col(byCol), posexplode(col(vecCol)).as(Seq("idx0", "val")))
      .select(col(byCol), (col("idx0") + 1).as("idx"), col("val"))
      .groupBy(col(byCol), col("idx"))
      .agg((sum(col("val").cast(DoubleType).cast(DecimalType(27, 15)))
        .cast(DoubleType) / count(lit(1))).as("centroid"))

  /** L2-normalized copy of the vector column (cosine becomes a plain dot
    * product downstream). Zero vectors stay zero instead of dividing by 0.
    * The norm is bound via a single-element-array wrap so the reduction runs
    * once per row, not once per element.
    */
  def normalized(df: DataFrame, vecCol: String = "embedding",
                 outCol: String = "embedding_unit"): DataFrame =
    df.withColumn(outCol, expr(
      s"""element_at(transform(array(cast($vecCol AS ARRAY<DOUBLE>)), v ->
         |  element_at(transform(
         |    array(sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x))),
         |    nrm -> CASE WHEN nrm = 0.0 THEN v
         |           ELSE transform(v, x -> x / nrm) END), 1)), 1)""".stripMargin))

  /** Symmetric int8 quantization: per-vector scale = max|x| / 127, elements
    * become round(x / scale) ∈ [−127, 127] — a 4× storage cut for a 100 TB
    * embedding store (fp32 → int8 + one fp scale). Zero vectors quantize to
    * zeros with scale 0. Arithmetic runs in double (fp32 → fp64 promotion
    * is exact, so any engine reproduces the quantized values bit for bit);
    * the scale is bound as a lambda variable so the max-abs reduction runs
    * once per row. Adds `<vecCol>_q` (array&lt;int&gt;) and `<vecCol>_scale`.
    */
  def quantized(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.withColumn("_qz", expr(
      s"""element_at(transform(array(cast($vecCol AS ARRAY<DOUBLE>)), v ->
         |  element_at(transform(
         |    array(aggregate(v, CAST(0.0 AS DOUBLE),
         |      (a, x) -> GREATEST(a, abs(x))) / 127.0D),
         |    sc -> named_struct(
         |      'q', CASE WHEN sc = 0.0 THEN transform(v, x -> 0)
         |           ELSE transform(v, x -> CAST(round(x / sc) AS INT)) END,
         |      'scale', sc)), 1)), 1)""".stripMargin))
      .withColumn(s"${vecCol}_q", col("_qz.q"))
      .withColumn(s"${vecCol}_scale", col("_qz.scale"))
      .drop("_qz")

  /** Dequantized (lossy) reconstruction of [[quantized]] output. */
  def dequantized(df: DataFrame, vecCol: String = "embedding",
                  outCol: String = "embedding_dq"): DataFrame =
    df.withColumn(outCol, expr(
      s"transform(${vecCol}_q, q -> q * ${vecCol}_scale)"))

  /** Nearest-centroid classification (Rocchio): fit per-label centroids
    * with the decimal-exact [[centroids]] aggregate, ROUND them to
    * `roundTo` decimals (so any engine rebuilding the same rounded
    * centroids classifies against bit-identical literals), collect the
    * labels×dim table (bounded — never corpus-sized) and predict each
    * row's label as the L2-nearest centroid, ties to the lower label.
    * One aggregate pass to fit + one narrow codegen'd pass to predict.
    * Adds `pred` and `correct` next to the true label column.
    */
  def nearestCentroidClassify(df: DataFrame, byCol: String = "label",
                              vecCol: String = "embedding",
                              idCol: String = "vec_id",
                              roundTo: Int = 9): DataFrame = {
    val cents: Seq[(Int, Seq[Double])] =
      centroids(df, byCol, vecCol)
        .select(col(byCol), col("idx"), round(col("centroid"), roundTo).as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (lab, rows) =>
          lab -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }.toSeq.sortBy(_._1)
    val v = col(vecCol).cast("array<double>")
    val dists = cents.map { case (lab, c) =>
      struct(graft.functions.VecFunctions.vecL2Sq(v, typedLit(c)).as("d"),
        lit(lab).as("l"))
    }
    df.withColumn("pred",
        array_sort(array(dists: _*)).getItem(0).getField("l"))
      .withColumn("correct", col(byCol) === col("pred"))
  }
}
