package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-rep internal stage shares of prefixFilterJaccardPairs at scale:
  * shingle compute, gram frequency, prefix build, candidate self-join,
  * verify. Mirrors the op's exact sub-frames (Dedup.scala).
  * Usage: runMain graft.tools.D12Probe <sfDir>
  */
object D12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp-sf10-fresh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time1(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[d12probe] $label%-34s $dt%7.2fs rows=$n")
      dt
    }

    graft.SparkEntry.queries("d12_prefix_jaccard")(spark, "/root/testdata/sf0.001").count()

    val threshold = 0.5
    val d = graft.Tables.table(spark, sfDir, "documents")
    val docs = d.select(col("doc_id").as("jid"), col("text").as("jtext"))
      .withColumn("sh", graft.ops.Dedup.sortedHashedShingles("jtext", 3))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
    time1("shingles (sum sizes)") {
      docs.agg(sum("sz")).collect()(0).getLong(0)
    }
    val freq = docs.select(explode(col("sh")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
    time1("freq groupBy") { freq.count() }
    val prefLen = (col("sz") -
      ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int") + 1)
    val pref = docs.select(col("jid"), col("sz"), explode(col("sh")).as("gram"))
      .join(freq, "gram")
      .groupBy("jid", "sz")
      .agg(array_sort(collect_list(struct(col("freq"), col("gram")))).as("ord"))
      .select(col("jid"), col("sz"),
        explode(slice(transform(col("ord"), s => s.getField("gram")),
          lit(1), prefLen)).as("gram"))
    time1("prefix build") { pref.count() }
    val cand = pref.select(col("gram"), col("jid").as("id_a"), col("sz").as("sz_a"))
      .join(pref.select(col("gram"), col("jid").as("id_b"), col("sz").as("sz_b")),
        "gram")
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .select("id_a", "id_b").distinct()
    time1("candidates (join+distinct)") { cand.count() }
    // PPJoin positional filter experiment: both arrays share the global
    // rarest-first order, so matching grams appear in the same relative
    // order — the first shared gram minimizes BOTH positions, and
    // overlap <= 1 + min(sz_a-pa-1, sz_b-pb-1) for that gram. Prune
    // candidates whose bound cannot reach the jaccard-t overlap
    // alpha = t/(1+t)*(sz_a+sz_b).
    val prefP = docs.select(col("jid"), col("sz"), explode(col("sh")).as("gram"))
      .join(freq, "gram")
      .groupBy("jid", "sz")
      .agg(array_sort(collect_list(struct(col("freq"), col("gram")))).as("ord"))
      .select(col("jid"), col("sz"),
        posexplode(slice(transform(col("ord"), s => s.getField("gram")),
          lit(1), prefLen)).as(Seq("p", "gram")))
    val candP = prefP.select(col("gram"), col("jid").as("id_a"),
        col("sz").as("sz_a"), col("p").as("p_a"))
      .join(prefP.select(col("gram"), col("jid").as("id_b"),
        col("sz").as("sz_b"), col("p").as("p_b")), "gram")
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .groupBy("id_a", "id_b")
      .agg(min("p_a").as("pa"), min("p_b").as("pb"),
        first("sz_a").as("sa"), first("sz_b").as("sb"))
      .filter((lit(1) + least(col("sa") - col("pa") - 1,
          col("sb") - col("pb") - 1)).cast("double") >=
        lit(threshold) / (1.0 + threshold) * (col("sa") + col("sb")) - lit(1e-9))
      .select("id_a", "id_b")
    time1("candidates + positional filter") { candP.count() }
    time1("full pairs (raw)") {
      graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
        threshold = 0.5).count()
    }
    time1("full pairs again (warm)") {
      graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
        threshold = 0.5).count()
    }
    spark.stop()
  }
}
