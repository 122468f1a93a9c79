package graft.tools

import org.apache.spark.sql.SparkSession

/** Batch [[PlanDump]]: dump the executed physical plan of several driver
  * queries into files in one JVM —
  * `runMain graft.tools.PlanDumpMany <sfDir> <outDir> <suffix> <query...>`
  * writes `<outDir>/<query>_<suffix>.txt` per query (the plans/rN
  * before/after evidence files).
  */
object PlanDumpMany {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDumpMany <sfDir> <outDir> <suffix> <query...>")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"),
          df.queryExecution.executedPlan.toString)
        System.err.println(s"[plans] $q -> ${q}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
