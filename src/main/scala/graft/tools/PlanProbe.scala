package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Physical-plan probe for the d14 winner aggregate (round 8): shows that
  * BOTH `max(struct(q, -node))` and `max_by(node, struct(q, -node))` plan as
  * SortAggregate — the struct ordering sits in the aggregation buffer, and
  * HashAggregateExec requires every buffer field to be UnsafeRow-mutable
  * (MaxBy is declarative, so ObjectHashAggregate doesn't apply either).
  * Keeps the measured evidence for the plan note on
  * [[graft.ops.Dedup.keepBestPerCluster]] runnable.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    val df = Seq((1L, 1L, 2.0), (2L, 1L, 3.0), (3L, 2L, 1.0)).toDF("node", "cluster_id", "__q")
    val a = df.groupBy("cluster_id").agg(expr("max_by(node, struct(__q, -node))").as("w"))
    println("=== max_by struct ===")
    println(a.queryExecution.executedPlan.toString.linesIterator.filter(_.contains("Aggregate")).mkString("\n"))
    val b = df.groupBy("cluster_id").agg(max(struct(col("__q"), (-col("node")).as("negid"))).as("w"))
    println("=== max struct ===")
    println(b.queryExecution.executedPlan.toString.linesIterator.filter(_.contains("Aggregate")).mkString("\n"))
    spark.stop()
  }
}
