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
}
