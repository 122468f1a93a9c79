package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed physical plan (and optionally run+time) any driver
  * query: `runMain graft.tools.PlanDump <sfDir> <query> [run]`. The
  * inspection loop the build instructions call for — explain, iterate.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [run]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.executedPlan.toString)
    if (args.length > 2 && args(2) == "run") {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
