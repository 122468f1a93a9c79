package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the physical plan of every SparkEntry query — the
  * `.explain("formatted")` iteration loop: check PushedFilters, ReadSchema
  * pruning, broadcast vs shuffle joins, WholeStageCodegen spans.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n######## $name ########")
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
          // compact: keep the operator skeleton lines
          plan.linesIterator
            .filter(l => l.contains("Scan parquet") || l.contains("Join") ||
              l.contains("Exchange") || l.contains("HashAggregate") ||
              l.contains("Sort") || l.contains("Window") ||
              l.contains("PushedFilters") || l.contains("ReadSchema") ||
              l.contains("Generate") || l.contains("TakeOrdered"))
            .take(40).foreach(l => println(l.take(250)))
        } catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
      }
    spark.stop()
  }
}
