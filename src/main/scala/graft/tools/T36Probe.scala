package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement probe for t36 (distributed BPE training on the wire):
  * times the wire loop end-to-end, reports per-round wall clock, and dumps
  * the FIRST consumed round's executed plan (the plan every round runs —
  * the body is constant). Usage:
  *   runMain graft.tools.T36Probe <sfDir> [rounds] [planOut]
  */
object T36Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(12)
    val planOut = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.table(spark, sfDir, "documents")

    // warm codegen/JIT once (uncounted), as Bench does
    graft.ops.BpeTrain.trainMerges(docs, "text", numMerges = 2,
      stepThroughWire = true).count()

    val roundTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    var last = System.nanoTime()
    var firstPlan: String = null
    graft.substrait.Consumer.roundPlanHook = df => {
      val now = System.nanoTime()
      roundTimes += (now - last) / 1e9
      last = now
      if (firstPlan == null)
        firstPlan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
    }
    try {
      val cg = org.apache.spark.metrics.source.CodegenMetrics
      val compiles0 = cg.METRIC_COMPILATION_TIME.getCount
      val jit0 = java.lang.management.ManagementFactory
        .getCompilationMXBean.getTotalCompilationTime
      val t0 = System.nanoTime()
      last = t0
      val out = graft.ops.BpeTrain.trainMerges(docs, "text",
        numMerges = rounds, stepThroughWire = true)
      val n = out.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[t36probe] total=$total%.2fs merges=$n rounds=${roundTimes.size}")
      println(s"[t36probe] codegen_compiles=" +
        s"${cg.METRIC_COMPILATION_TIME.getCount - compiles0} " +
        s"janino_ms=${cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum}" +
        s" jit_ms=${java.lang.management.ManagementFactory
          .getCompilationMXBean.getTotalCompilationTime - jit0}")
      println("[t36probe] per-round: " +
        roundTimes.map(t => f"$t%.2f").mkString(" "))
      planOut.foreach { p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), firstPlan)
        println(s"[t36probe] first-round plan -> $p")
      }
    } finally {
      graft.substrait.Consumer.roundPlanHook = null
      spark.stop()
    }
  }
}
