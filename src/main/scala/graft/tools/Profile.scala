package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** Stage-level timing harness for the pipeline ops. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, dir)
    val docs = spark.table("documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    time("simhash64 alone")(Dedup.simhash64(docs).select("doc_id", "simhash").count())
    time("simhash64 again (warm)")(Dedup.simhash64(docs).select("doc_id", "simhash").count())
    val shPairs = Dedup.simhashNearDups(docs)
    time("simhash pairs: planning")({ shPairs.queryExecution.executedPlan; 0L })
    time("simhash pairs: run 1")(shPairs.count())
    time("simhash pairs: run 2")(Dedup.simhashNearDups(docs).count())
    time("minhash sig alone")(
      Dedup.minhashSignature(docs).select(col("doc_id"), col("minhash_sig")).count())
    time("minhash pairs")(Dedup.minhashNearDups(docs, threshold = 0.5).count())
    println("=== simhash pairs plan ===")
    println(shPairs.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
