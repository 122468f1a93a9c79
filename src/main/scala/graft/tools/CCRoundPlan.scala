package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dumps the executed per-round plan of connectedComponents' double-hop
  * body — the r16 before/after evidence for the step restructuring (the
  * reverse-pointer join branch replaced by its closed form, min-neighbor
  * init). Writes plans/r16/d13_cc_round_{before,after}.txt: "before" is the
  * r15 step shape reproduced inline (3-branch union through the join);
  * "after" is the live operator observed through the consumer's round hook.
  * Usage: runMain graft.tools.CCRoundPlan <sfDir> <outDir>
  */
object CCRoundPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r16"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    def put(name: String, text: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$name"),
        text.getBytes("UTF-8"))
    def exchanges(p: String): Int =
      p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")

    val d = graft.Tables.table(spark, sfDir, "documents")
    val pairs = graft.ops.Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
      threshold = 0.5).localCheckpoint(true)
    val oldPairs = pairs.filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0)

    // ---- BEFORE: the r15 step shape, one double-hop over the same edges
    val fwd = oldPairs.select(col("id_a").cast("long").as("u"),
      col("id_b").cast("long").as("v"))
    val edges = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(true)
    val lbl0 = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    def stepBefore(lbl: DataFrame): DataFrame = {
      val ptr = lbl.select(col("node").as("u"), col("label").as("v"))
      edges.union(ptr)
        .union(ptr.select(col("v").as("u"), col("u").as("v")))
        .join(lbl.select(col("node").as("v"), col("label")), "v")
        .groupBy("u").agg(min(col("label")).as("label"))
        .select(col("u").as("node"), col("label"))
    }
    val before = stepBefore(stepBefore(lbl0))
    before.collect()
    val beforePlan = before.queryExecution.executedPlan.toString
    put("d13_cc_round_before.txt", beforePlan)
    println(s"[ccplan] before round exchanges: ${exchanges(beforePlan)}")

    // full BEFORE fixpoint (identity init + r15 step): rounds to converge
    {
      var lbl = lbl0
      var prev: java.math.BigDecimal = null
      var it = 0
      var done = false
      val t0 = System.nanoTime()
      while (!done && it < 25) {
        lbl = stepBefore(stepBefore(lbl)).localCheckpoint(true)
        val s = lbl.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
        done = prev != null && s.compareTo(prev) == 0
        prev = s; it += 1
      }
      println(f"[ccplan] BEFORE shape: $it double-hop rounds, " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (identity init)")
    }

    // ---- AFTER: the live operator's consumed rounds via the hook
    val roundPlans = scala.collection.mutable.ArrayBuffer[String]()
    graft.substrait.Consumer.roundPlanHook =
      df => { roundPlans += df.queryExecution.executedPlan.toString; () }
    val t0 = System.nanoTime()
    try {
      val n = graft.ops.Dedup.connectedComponents(oldPairs,
        stepThroughWire = true).count()
      println(f"[ccplan] cc wire rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"rounds consumed: ${roundPlans.size}")
    } finally graft.substrait.Consumer.roundPlanHook = null
    roundPlans.zipWithIndex.foreach { case (p, i) =>
      println(s"[ccplan] after round ${i + 1} exchanges: ${exchanges(p)}")
    }
    if (roundPlans.nonEmpty) put("d13_cc_round_after.txt", roundPlans.head)
    spark.stop()
  }
}
