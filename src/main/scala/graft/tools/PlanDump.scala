package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Analyzed-plan introspection: dumps the Catalyst shapes the producer
  * pattern-matches (grouping sets / subqueries) — the reference material for
  * extending Producer.toRel with new node types.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1, "a", 2.0), (2, "b", 3.0)).toDF("k", "s", "v")
    val r = df.rollup(col("k"), col("s")).agg(sum("v").as("sv"), count(lit(1)).as("n"))
    println("=== rollup analyzed ===")
    println(r.queryExecution.analyzed.treeString)
    val gs = df.groupingSets(Seq(Seq(col("s")), Seq(col("k"), col("s"))),
      col("k"), col("s")).agg(sum("v").as("sv"))
    println("=== groupingSets analyzed ===")
    println(gs.queryExecution.analyzed.treeString)
    val c = df.cube(col("k"), col("s")).agg(sum("v").as("sv"), grouping_id().as("gid"))
    println("=== cube with grouping_id analyzed ===")
    println(c.queryExecution.analyzed.treeString)
    val e = df.rollup(expr("k + 1").as("k1"), col("s")).agg(sum("v").as("sv"))
    println("=== rollup on expression analyzed ===")
    println(e.queryExecution.analyzed.treeString)
    df.createOrReplaceTempView("t1")
    Seq((1, 9.0), (5, 8.0)).toDF("k2", "w").createOrReplaceTempView("t2")
    println("=== IN subquery analyzed ===")
    println(spark.sql("SELECT k, v FROM t1 WHERE k IN (SELECT k2 FROM t2)")
      .queryExecution.analyzed.treeString)
    println("=== EXISTS subquery analyzed ===")
    println(spark.sql("SELECT k FROM t1 WHERE EXISTS (SELECT 1 FROM t2 WHERE w > 8.5)")
      .queryExecution.analyzed.treeString)
    println("=== IN + extra conjunct analyzed ===")
    println(spark.sql("SELECT k FROM t1 WHERE k IN (SELECT k2 FROM t2) AND v > 1.0")
      .queryExecution.analyzed.treeString)
    spark.stop()
  }
}
