package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the ANALYZED logical plan of a SQL string — the shape the Producer
  * consumes: `runMain graft.tools.PlanShape "<sql>" [<viewSetupSql>...]`. */
object PlanShape {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1L, 2.0, true), (3L, 4.5, false), (3L, 1.5, true))
      .toDF("a", "b", "d").createOrReplaceTempView("data")
    args.drop(1).foreach(spark.sql)
    println(spark.sql(args(0)).queryExecution.analyzed.treeString)
    spark.stop()
  }
}
