package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost probe for directed containment pairs at rehearsal
  * scale: prefix construction vs candidate join vs verify joins — decides
  * whether the d15 constant is worth restructuring.
  * Usage: runMain graft.tools.D15Probe <sfDir>
  */
object D15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[d15probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val t = 0.9
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ext = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000000L).as("doc_id"),
        concat(col("text"),
          lit(" zq xv extension tail tokens appended here")).as("text"))
    val df = base.unionAll(ext)
    // replicate containmentPairs stages with timers — r11: via the FUSED
    // shingle_hashes kernel (what the operator actually runs since r10),
    // so the stage budget reflects the current plan, not the retired
    // five-expression composition
    val docs = df.select(col("doc_id").as("jid"), col("text").as("jtext"))
      .withColumn("sh", graft.functions.ShingleFunctions
        .shingleHashes(col("jtext"), 3))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
    timed("docs+shingles count")(docs.count())
    val freq = docs.select(explode(col("sh")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
    timed("freq table")(freq.count())
    val prefLen = (floor(lit(1.0 - t) * col("sz") + lit(1e-9)).cast("int") + 1)
    val pref = docs.select(col("jid"), col("sz"), explode(col("sh")).as("gram"))
      .join(freq, "gram")
      .groupBy("jid", "sz")
      .agg(array_sort(collect_list(struct(col("freq"), col("gram")))).as("ord"))
      .select(col("jid"), col("sz"),
        explode(slice(transform(col("ord"), s => s.getField("gram")),
          lit(1), prefLen)).as("gram")).localCheckpoint(true)
    timed("pref build (checkpointed)")(pref.count())
    val allGrams = docs.select(col("jid").as("id_b"), col("sz").as("sz_b"),
      explode(col("sh")).as("gram")).localCheckpoint(true)
    timed("allGrams build (checkpointed)")(allGrams.count())
    val cand = pref.select(col("gram"), col("jid").as("id_a"), col("sz").as("sz_a"))
      .join(allGrams, "gram")
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("sz_b").cast("double") >= lit(t) * col("sz_a"))
      .select("id_a", "id_b").distinct().localCheckpoint(true)
    val nCand = timed("candidate join + distinct")(cand.count())
    println(s"[d15probe] candidates = $nCand")
    val g = docs.select(col("jid"), col("sh"))
    val out = timed("verify joins") {
      cand
        .join(g.select(col("jid").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(g.select(col("jid").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          graft.functions.JaccardFunctions
            .sortedContainmentGe(col("sh_a"), col("sh_b"), t).as("c"))
        .filter(col("c").isNotNull).count()
    }
    println(s"[d15probe] qualifying = $out")
    spark.stop()
  }
}
