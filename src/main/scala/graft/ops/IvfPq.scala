package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed billion-scale ANN index (FAISS's workhorse layout)
  * — Ivf's coarse cells cut how many vectors a probe TOUCHES, Pq's codes
  * cut how many BYTES each touched vector costs. Codes quantize the
  * RESIDUAL (vector − cell centroid), the classic refinement: residuals
  * concentrate near zero, so the same codebook budget spends its
  * resolution where the data actually is.
  *
  * Index rows are (cell, id, codes) — for a 64-dim float corpus that is
  * ~16 B of payload per vector instead of 256 B, and the saved layout
  * partitions by cell so a probe reads only its nprobe directories
  * (`searchPruned`, the same literal-PartitionFilter contract as
  * Ivf.searchPruned). Search: per (query, probed-cell) ADC tables over
  * the query's residual against THAT cell (a tiny broadcast side —
  * |Q|·nprobe rows), codegen'd pq_adc shortlist, exact-cosine rerank of
  * the shortlist against raw vectors.
  */
object IvfPq {

  final case class IvfPqIndex(centroids: Seq[Seq[Double]], model: Pq.PqModel,
                              encoded: DataFrame)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** residual of `vec` against the centroid of `cell` (both literals-side:
    * cents rides as one nested literal, indexed per row) */
  private def residual(vec: Column, cents: Column, cell: Column): Column =
    zip_with(vec, element_at(cents, cell + 1), (x, c) => x - c)

  /** Train coarse cells + residual codebooks on one bounded id-ordered
    * sample, then encode the corpus in a single narrow pass:
    * cell assignment (codegen'd vec_l2sq argmin) → residual → pq_encode.
    */
  def build(corpus: DataFrame, nlist: Int, m: Int, k: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            trainSampleFraction: Double = 1.0, seed: Long = 42L,
            maxTrainRows: Int = 16384): IvfPqIndex = {
    val base = corpus.select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("n_vec"))
    val sampled = (if (trainSampleFraction < 1.0)
      base.sample(withReplacement = false, trainSampleFraction, seed) else base)
      .orderBy("n_id").limit(maxTrainRows)
    val rows = sampled.select(col("n_vec")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "empty training sample")
    val dim = rows(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val cents = Pq.lloyd(rows, nlist, iters = 5)
    // residuals of the SAME sample against their assigned cells train the
    // codebooks — all driver-side, bounded by the sample
    val residuals = rows.map { v =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d = 0.0; var i = 0
        while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val r = new Array[Double](dim)
      var i = 0
      while (i < dim) { r(i) = v(i) - cents(best)(i); i += 1 }
      r
    }
    val ds = dim / m
    val books = (0 until m).map { j =>
      Pq.lloyd(residuals.map(_.slice(j * ds, (j + 1) * ds)), k, iters = 10)
        .map(_.toSeq).toSeq
    }
    val model = Pq.PqModel(m, k, dim, books)
    val centroids = cents.map(_.toSeq).toSeq
    val cLit = typedLit(centroids)
    val encoded = base
      .withColumn("cell", Ivf.nearestCells(col("n_vec"), centroids, 1).getItem(0))
      .select(col("n_id"), col("cell"),
        graft.functions.PqFunctions.pqEncode(
          residual(col("n_vec"), cLit, col("cell")),
          typedLit(model.codebooks)).as("codes"))
    IvfPqIndex(centroids, model, encoded)
  }

  /** Persist: codes partitioned by cell (probes partition-prune), plus the
    * few-KB centroid/codebook tables beside them. */
  def save(index: IvfPqIndex, path: String): Unit = {
    index.encoded.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val spark = index.encoded.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    index.model.codebooks.zipWithIndex
      .flatMap { case (book, j) => book.zipWithIndex.map { case (c, ci) => (j, ci, c) } }
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/books")
  }

  def load(spark: SparkSession, path: String): IvfPqIndex = {
    val cents = spark.read.parquet(s"$path/centroids").orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("centroid")).toSeq).toSeq
    val bookRows = spark.read.parquet(s"$path/books").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
    val m = bookRows.map(_._1).max + 1
    val k = bookRows.map(_._2).max + 1
    val books = (0 until m).map(j =>
      bookRows.filter(_._1 == j).sortBy(_._2).map(_._3).toSeq)
    val dim = cents.head.size
    IvfPqIndex(cents, Pq.PqModel(m, k, dim, books),
      spark.read.parquet(s"$path/cells"))
  }

  /** Top-k: per (query, probed cell) ADC tables over the query's residual
    * against that cell; codegen'd pq_adc shortlist across all probed
    * cells; exact-cosine rerank against the raw corpus. `queries` and
    * `corpus` (for the rerank) follow the broadcast-small contract. */
  def search(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
             k: Int, nprobe: Int, shortlist: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val model = index.model
    val cLit = typedLit(index.centroids)
    val books = typedLit(model.codebooks)
    val qv = asDouble(col(vecCol))
    // one row per (query, probed cell), each with the residual ADC table
    val q = queries
      .select(col(idCol).as("q_id"), qv.as("q_vec"),
        explode(Ivf.nearestCells(qv, index.centroids, nprobe)).as("cell"))
      .withColumn("__res", residual(col("q_vec"), cLit, col("cell")))
      .withColumn("tables", transform(sequence(lit(0), lit(model.m - 1)), j =>
        transform(element_at(books, j + 1), cent =>
          aggregate(zip_with(
            slice(col("__res"), j * model.ds + 1, lit(model.ds)), cent,
            (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v))))
    val adc = graft.functions.PqFunctions.pqAdc(col("codes"), col("tables"))
    val wS = Window.partitionBy("q_id").orderBy(col("adist").asc, col("n_id").asc)
    val short = index.encoded
      .join(broadcast(q.select("q_id", "cell", "tables")), "cell")
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("adist", adc)
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select("q_id", "n_id")
    val c = corpus.select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("n_vec"))
    val wK = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    c.join(broadcast(short), "n_id")
      .join(broadcast(queries.select(col(idCol).as("q_id"), qv.as("q_vec"))), "q_id")
      .withColumn("sim", Similarity.cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Probe a SAVED index with static partition pruning: the probed cell
    * set computes driver-side and lands as a literal partition filter on
    * the cell layout — nprobe directories read, nothing else. */
  def searchPruned(index: IvfPqIndex, corpus: DataFrame, queries: DataFrame,
                   k: Int, nprobe: Int, shortlist: Int,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val probed = queries
      .select(explode(Ivf.nearestCells(asDouble(col(vecCol)),
        index.centroids, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).sorted
    val pruned = index.copy(encoded =
      index.encoded.filter(col("cell").isin(probed.toIndexedSeq.map(Integer.valueOf): _*)))
    search(pruned, corpus, queries, k, nprobe, shortlist, idCol, vecCol)
  }
}
