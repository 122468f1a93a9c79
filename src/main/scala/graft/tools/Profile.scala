package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** Stage-level timing harness for the pipeline ops. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    // decomposed minhash stages (mirrors minhashNearDups internals)
    val base = docs.select(col("doc_id"), col("text")).repartition(col("doc_id"))
    val sigs = Dedup.minhashSignature(base, "text", 64, 3)
      .select(col("doc_id").as("mh_id"), col("minhash_sig")).persist()
    val banded = sigs.select(col("mh_id"),
      posexplode(expr(
        """transform(sequence(0, 15),
          |  b -> xxhash64(b, array_join(
          |         transform(slice(minhash_sig, b * 4 + 1, 4),
          |                   x -> cast(x AS STRING)), ',')))""".stripMargin))
        .as(Seq("band_idx", "band_hash")))
    time("mh: sig repart no persist")(
      Dedup.minhashSignature(base, "text", 64, 3)
        .select(col("doc_id"), col("minhash_sig")).count())
    val sigNoRepart = Dedup.minhashSignature(docs.select("doc_id", "text"), "text", 64, 3)
      .select(col("doc_id"), col("minhash_sig")).persist()
    time("mh: sig persist no repart")(sigNoRepart.count())
    time("mh: sig persist no repart read")(sigNoRepart.count())
    time("mh: sigs materialize")(sigs.count())
    time("mh: sigs cached read")(sigs.count())
    time("mh: banded")(banded.count())
    time("mh: banded again")(banded.count())
    val cand = banded.groupBy("band_idx", "band_hash")
      .agg(sort_array(collect_list(col("mh_id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= 1000)
      .select(explode(Dedup.sortedPairs("ids")).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct().persist()
    time("mh: candidates")(cand.count())
    val sa = base.select(col("doc_id").as("id_a"), Dedup.shingles("text", 3).as("sh_a"))
    val sb = base.select(col("doc_id").as("id_b"), Dedup.shingles("text", 3).as("sh_b"))
    time("mh: shingle side alone")(sa.count())
    val ver = cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard", Dedup.jaccardCol("sh_a", "sh_b"))
      .filter(col("jaccard") >= 0.5)
    time("mh: verify join")(ver.count())
    println("=== verify join plan ===")
    println(ver.queryExecution.executedPlan.toString.take(4000))
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
