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
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
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

    // bucketed co-located join: write once, join with zero shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Pipeline.writeBucketed(
      spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 8)
    Pipeline.writeBucketed(
      spark.table("customer").select("c_custkey", "c_name"),
      "customer_b", "c_custkey", 8)
    val bjoin = spark.table("orders_b").join(spark.table("customer_b"),
      col("o_custkey") === col("c_custkey"))
    time("bucketed join (no shuffle)")(bjoin.count())
    println("=== bucketed join plan (expect no Exchange hashpartitioning) ===")
    println(bjoin.queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
