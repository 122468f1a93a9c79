package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost probe for blocked n-gram Jaccard at rehearsal scale:
  * bucket-size distribution (the old path's Σm²/2 candidate volume) and
  * stage walls — the instrument for the 100× rehearsal's d04/d08 α finding.
  * Usage: runMain graft.tools.D04Probe <sfDir> <threshold>
  */
object D04Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d04probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[d04probe] docs = ${timed("docs count")(docs.count())}, t = $t")
    // replicate the shingle + size-bucket stages
    val blk = concat_ws("|", col("lang"), col("source"))
    val s = docs.select(blk.as("blk"), col("doc_id").as("jid"), col("text"))
      .withColumn("sh", array_sort(transform(
        graft.ops.Dedup.shingles("text", 3), x => xxhash64(x))))
      .withColumn("sz", size(col("sh")))
    val lnBase = math.log((1.0 / t) * (1.0 + 1e-6))
    val b = s.withColumn("szb",
      floor(log(greatest(col("sz"), lit(1)).cast("double")) / lnBase).cast("int"))
    val stats = timed("bucket stats") {
      b.select(col("blk"), col("szb"))
        .union(b.filter(col("szb") >= 1)
          .select(col("blk"), (col("szb") - 1).as("szb")))
        .groupBy("blk", "szb").agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("buckets"), sum(col("m")).as("members"),
          max(col("m")).as("maxM"), avg(col("m")).as("avgM"),
          sum(col("m") * col("m") / 2).as("pairsUB")).head()
    }
    println(s"[d04probe] buckets=${stats.get(0)} members=${stats.get(1)} " +
      s"maxM=${stats.get(2)} avgM=${stats.get(3)} allPairsUB=${stats.get(4)}")
    val shStats = timed("shingle stats") {
      s.agg(sum(col("sz")), avg(col("sz")), max(col("sz"))).head()
    }
    println(s"[d04probe] grams total=${shStats.get(0)} avg/doc=${shStats.get(1)} " +
      s"max/doc=${shStats.get(2)}")
    val pairs = timed(s"ngramJaccardPairs t=$t") {
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        blockCols = Seq("lang", "source"), threshold = t).count()
    }
    println(s"[d04probe] pairs = $pairs")
    val q = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        blockCols = Seq("lang", "source"), threshold = t)
      .select("blk", "id_a", "id_b", "jaccard").orderBy("blk", "id_a", "id_b")
    timed("direct + orderBy")(q.count())
    timed("roundtripped")(graft.substrait.Serializer.roundtrip(spark, q).count())
    spark.stop()
  }
}
