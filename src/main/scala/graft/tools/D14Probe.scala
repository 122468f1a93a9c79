package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-share breakdown for the d12/d13/d14 family (opt round 15):
  * where do the seconds go — pair generation, CC fixpoint rounds, or the
  * keep-best/incremental tail? Warm-measures each stage twice, reports
  * the min (Bench's protocol).
  * Usage: runMain graft.tools.D14Probe <sfDir>
  */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[d14probe] $label%-34s $best%7.2fs  rows=${ts.head._2}")
      best
    }

    // warmup at sf0.001 (codegen/JIT), as Bench does
    val wdir = "/root/testdata/sf0.001"
    val wd = graft.Tables.table(spark, wdir, "documents")
    graft.ops.Dedup.prefixFilterJaccardPairs(wd, "doc_id", "text", threshold = 0.5).count()
    graft.SparkEntry.queries("d14_keep_best_per_cluster")(spark, wdir).count()
    graft.SparkEntry.queries("d13_incremental_clusters")(spark, wdir).count()

    // re-register the measured dir AFTER warmup: the wire resolves table
    // NAMES through the catalog, and the warmup re-bound them to sf0.001
    val d = graft.Tables.table(spark, sfDir, "documents")

    time2("pairs (raw, no wire)") {
      graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
        threshold = 0.5).count()
    }
    time2("pairs (rt wire)") {
      graft.substrait.Serializer.roundtrip(spark,
        graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
          threshold = 0.5)).count()
    }
    val pairs = graft.substrait.Serializer.roundtrip(spark,
      graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
        threshold = 0.5)).localCheckpoint(true)
    time2("cc host (from cached pairs)") {
      graft.ops.Dedup.connectedComponents(pairs).count()
    }
    time2("cc wire (from cached pairs)") {
      graft.ops.Dedup.connectedComponents(pairs, stepThroughWire = true).count()
    }
    time2("keepBest tail (cached pairs)") {
      graft.ops.Dedup.keepBestPerCluster(d, pairs, col("n_chars"))
        .select("doc_id", "lang", "n_chars").orderBy("doc_id").count()
    }
    time2("d14 full") {
      graft.SparkEntry.queries("d14_keep_best_per_cluster")(spark, sfDir).count()
    }
    time2("d13 full") {
      graft.SparkEntry.queries("d13_incremental_clusters")(spark, sfDir).count()
    }
    spark.stop()
  }
}
