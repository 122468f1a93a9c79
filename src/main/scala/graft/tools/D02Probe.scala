package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-share probe for the minhash LSH family (d02/t33/d10): signature
  * pass vs banding groupBy vs candidate pairs vs verify — decides where the
  * r16 effort goes (guide §1.2 measure-first).
  * Usage: runMain graft.tools.D02Probe <sfDir>
  */
object D02Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d02probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
      r
    }
    // warmup (codegen)
    graft.SparkEntry.queries("d02_minhash_pairs")(spark, "/root/testdata/sf0.001").count()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.select(col("doc_id"), col("text")).repartition(col("doc_id"))

    timed("n_docs")(docs.count())
    // signature pass alone (the composed string-shingle path the op runs)
    timed("minhash_sig composed (current)") {
      graft.ops.Dedup.minhashSignature(base, "text", 64, 3)
        .select(col("doc_id"), col("minhash_sig"))
        .write.format("noop").mode("overwrite").save()
    }
    // fused text kernel candidate (r16)
    timed("minhash_sig_text fused") {
      base.select(col("doc_id"),
          graft.functions.MinHashFunctions.minhashSigText(col("text"), 3, 64)
            .as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    // shingle-hash pass alone (what verify recomputes per side)
    timed("sortedHashedShingles pass") {
      base.select(col("doc_id"),
          graft.functions.ShingleFunctions.shingleHashes(col("text"), 3).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("d02 full (current)") {
      graft.SparkEntry.queries("d02_minhash_pairs")(spark, dir).count()
    }
    timed("t33 full (current)") {
      graft.SparkEntry.queries("t33_split_leakage")(spark, dir).count()
    }
    spark.stop()
  }
}
