package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-share breakdown for s20 (bucketed large-queryset kNN) at scale:
  * quantizer training vs corpus assignment vs query assignment vs the
  * candidate join + top-k. Each stage twice, min reported (Bench protocol).
  * Usage: runMain graft.tools.S20Probe <sfDir>
  */
object S20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp-sf10-fresh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time2(label: String)(f: => Long): Double = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      println(f"[s20probe] $label%-34s min=$best%7.2fs both=" +
        ts.map(t => f"${t._1}%.2f").mkString("/") + s" rows=${ts.head._2}")
      best
    }

    // warmup as Bench does (flat path at sf0.001)
    graft.SparkEntry.queries("s20_knn_bucketed")(spark, "/root/testdata/sf0.001").count()

    val e = graft.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("n_vec"))
      .localCheckpoint(true)
    val n = e.count()
    val cells = math.min(4096,
      math.max(16, math.ceil(n / graft.ops.Similarity.SelfSizeTargetOcc.toDouble).toInt))
    println(s"[s20probe] n=$n cells=$cells sf=$sfDir")

    var quant: graft.ops.Similarity.CellQuantizer = null
    time2("train quantizer") {
      quant = graft.ops.Similarity.trainCellQuantizer(
        e.select(col("n_id").as("nd_id"), col("n_vec").as("nd_vec")),
        cells, 0.5, 42L); 0L
    }
    time2("corpus assign (probe=1)") {
      graft.ops.Similarity.assignCells(
        e.select(col("n_id").as("nd_id"), col("n_vec").as("nd_vec")),
        quant, 1).count()
    }
    time2("query assign (probe=16)") {
      graft.ops.Similarity.assignCells(
        e.select(col("n_id").as("nd_id"), col("n_vec").as("nd_vec")),
        quant, 16).count()
    }
    // join + cosine WITHOUT the top-k window: isolates the sort/window
    // share (sum(sim) forces the cosine on every candidate)
    time2("join+cosine only (sum sim)") {
      val c0 = e
      val q0 = e.select(col("n_id").as("q_id"), col("n_vec").as("q_vec"))
        .withColumn("q_nrm", sqrt(graft.ops.Similarity.dot(col("q_vec"), col("q_vec"))))
      val cc = c0.withColumn("n_nrm",
          sqrt(graft.ops.Similarity.dot(col("n_vec"), col("n_vec"))))
        .join(graft.ops.Similarity.assignCells(
          c0.select(col("n_id").as("nd_id"), col("n_vec").as("nd_vec")),
          quant, 1).select(col("nd_id").as("n_id"), col("cell")), "n_id")
      val qq = q0.join(graft.ops.Similarity.assignCells(
          q0.select(col("q_id").as("nd_id"), col("q_vec").as("nd_vec")),
          quant, 16).select(col("nd_id").as("q_id"), col("cell")), "q_id")
      cc.join(qq, "cell")
        .filter(col("n_id") =!= col("q_id"))
        .select((graft.ops.Similarity.dot(col("q_vec"), col("n_vec")) /
          (col("q_nrm") * col("n_nrm"))).as("sim"))
        .agg(sum("sim"), count(lit(1))).collect()(0).getLong(1)
    }
    time2("full bucketedKnn (no wire)") {
      graft.ops.Similarity.bucketedKnn(
        graft.Tables.table(spark, sfDir, "embeddings"),
        graft.Tables.table(spark, sfDir, "embeddings"),
        k = 3, trainSampleFraction = 0.5).count()
    }
    time2("full s20 query (wire)") {
      graft.SparkEntry.queries("s20_knn_bucketed")(spark, sfDir).count()
    }
    spark.stop()
  }
}
