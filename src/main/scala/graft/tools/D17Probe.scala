package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 15, verdict item 3): what does ONE graphRank /
  * CC round actually exchange? Prints the executed per-round plan so the
  * co-partitioning attempt is designed against facts, not guesses. */
object D17Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("d17-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // mini probe A: does a localCheckpoint carry its partitioning at all?
    val mini = spark.range(1000)
      .select(col("id").as("u"), (col("id") * 2).as("x"))
      .repartition(8, col("u")).localCheckpoint(true)
    val magg = mini.groupBy("u").count()
    magg.collect()
    println("== mini groupBy over checkpointed repartition(8,u) ==")
    println(magg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head)

    // mini probe B: does a CACHED repartition carry its partitioning?
    val miniC = spark.range(1000)
      .select(col("id").as("u"), (col("id") * 2).as("x"))
      .repartition(8, col("u")).persist()
    miniC.count()
    val caggr = miniC.groupBy("u").count()
    caggr.collect()
    println("== mini groupBy over CACHED repartition(8,u) ==")
    println(caggr.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head)

    // mini probe C: cached-to-cached join on the shared key
    val miniD = spark.range(500)
      .select(col("id").as("u"), (col("id") * 3).as("y"))
      .repartition(8, col("u")).persist()
    miniD.count()
    val j = miniC.join(miniD, "u")
    j.collect()
    println("== cached-cached join on u ==")
    println(j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head)

    val pairs = (1L to 20000L).flatMap(i =>
      Seq((i, i + 1), (i, i + 7))).toDF("id_a", "id_b")

    val fwd = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
    val edges0 = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = edges0.groupBy("u").agg(count(lit(1)).as("deg"))
    val P = 8
    val edges = edges0.join(deg, "u")
      .repartition(P, col("u")).localCheckpoint(true)
    println("== edges logical partitioning ==")
    println(edges.queryExecution.optimizedPlan.toString.take(500))

    var ranks = edges.select(col("u").as("node")).distinct()
      .select(col("node"), lit(graft.ops.Dedup.RankUnit).as("rank_units"))
      .repartition(P, col("node")).localCheckpoint(true)

    def step(r: org.apache.spark.sql.DataFrame) =
      edges.join(r.select(col("node").as("u"), col("rank_units")), "u")
        .select(col("v"), expr("rank_units DIV deg").as("contrib"))
        .groupBy("v").agg(sum(col("contrib")).as("csum"))
        .select(col("v").as("node"),
          (lit(graft.ops.Dedup.RankBase) +
            expr("(85 * csum) DIV 100")).as("rank_units"))

    for (i <- 1 to 3) {
      val stepDf = step(ranks)
      stepDf.collect()
      println(s"== round $i executed plan ==")
      val p = stepDf.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      println(p)
      val ex = p.sliding("Exchange".length).count(_ == "Exchange")
      println(s"round $i exchanges: $ex")
      ranks = stepDf.repartition(8, col("node")).localCheckpoint(true)
    }

    // THE REAL PATH: graphRank through the wire, rounds observed via the
    // consumer hook
    println("== real graphRank(stepThroughWire=true) rounds ==")
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    graft.substrait.Consumer.roundPlanHook =
      df => { plans += df.queryExecution.executedPlan.toString; () }
    try {
      val out = graft.ops.Dedup.graphRank(pairs, stepThroughWire = true)
      println(s"result rows: ${out.count()}")
    } finally graft.substrait.Consumer.roundPlanHook = null
    plans.zipWithIndex.foreach { case (p0, i) =>
      val p = p0.split("== Initial Plan ==").head
      val ex = p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      println(s"-- consumed round ${i + 1}: $ex hash exchanges")
      if (i == 1) println(p)
    }
    spark.stop()
  }
}
