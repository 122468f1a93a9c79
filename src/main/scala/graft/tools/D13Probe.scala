package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-rep stage-share probe for d13 at scale (the 2-rep D14Probe is
  * too heavy for a 100× sitting): pairs on the wire, host CC vs wire CC
  * over the even split, and the incremental-CC tail.
  * Usage: runMain graft.tools.D13Probe <sfDir>
  */
object D13Probe {
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

    def time1(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[d13probe] $label%-34s $dt%7.2fs rows=$n")
      dt
    }

    // warmup (codegen/JIT) at sf0.001
    graft.SparkEntry.queries("d13_incremental_clusters")(spark, "/root/testdata/sf0.001").count()

    val d = graft.Tables.table(spark, sfDir, "documents")
    time1("pairs wire (d12 core)") {
      graft.substrait.Serializer.roundtrip(spark,
        graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
          threshold = 0.5)).count()
    }
    val pairs = graft.substrait.Serializer.roundtrip(spark,
      graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
        threshold = 0.5)).localCheckpoint(true)
    val oldPairs = pairs.filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0)
    val newBatch = pairs.filter(!(col("id_a") % 2 === 0 && col("id_b") % 2 === 0))
    time1("cc host (even split)") {
      graft.ops.Dedup.connectedComponents(oldPairs).count()
    }
    time1("cc wire (even split)") {
      graft.ops.Dedup.connectedComponents(oldPairs, stepThroughWire = true).count()
    }
    val oldLabels = graft.ops.Dedup.connectedComponents(oldPairs)
      .localCheckpoint(true)
    time1("incremental cc wire (tail)") {
      graft.ops.Dedup.incrementalConnectedComponents(oldLabels, newBatch,
        stepThroughWire = true).count()
    }
    time1("d13 full") {
      graft.SparkEntry.queries("d13_incremental_clusters")(spark, sfDir).count()
    }
    spark.stop()
  }
}
