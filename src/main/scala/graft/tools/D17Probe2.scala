package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d17 stage-granularity timing probe (opt round 16): where do the
  * ~40 s at the 100× rehearsal go — pair distinct, edge prep (deg join +
  * repartition + persist), or the three wire-consumed rank rounds?
  * `runMain graft.tools.D17Probe2 <sfDir>`
  */
object D17Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, sfDir)
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$what] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = spark.table("lineitem")
      .select(col("l_suppkey").cast("long").as("id_a"),
        (col("l_partkey").cast("long") + 1000000000L).as("id_b"))
      .distinct()
    val nPairs = time("pairs distinct count")(pairs.count())
    println(s"  |pairs| = $nPairs")
    val fwd = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
    val edges0 = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = edges0.groupBy("u").agg(count(lit(1)).as("deg"))
    val edges = edges0.join(deg, "u")
      .repartition(cpus.toInt, col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edge prep OLD (sym distinct + deg join + repartition + persist)") {
      edges.count()
    }
    // NEW prep (the shape graphRank now uses): deg as a window count over
    // the same u-keyed exchange the cache pins
    val edgesNew = edges0
      .repartition(cpus.toInt, col("u"))
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("u")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edge prep NEW (sym distinct + repartition + window deg + persist)") {
      edgesNew.count()
    }
    edgesNew.unpersist(blocking = false)
    val init = edges.select(col("u").as("node")).distinct()
      .select(col("node"), lit(graft.ops.Dedup.RankUnit).as("rank_units"))
      .localCheckpoint(true)
    time("init distinct + checkpoint")(init.count())
    var ranks = init
    for (i <- 1 to 3) {
      val next = time(s"round $i (join + agg + localCheckpoint)") {
        val n = edges.join(
            ranks.select(col("node").as("u"), col("rank_units")), "u")
          .select(col("v"), expr("rank_units DIV deg").as("contrib"))
          .groupBy("v").agg(sum(col("contrib")).as("csum"))
          .select(col("v").as("node"),
            (lit(graft.ops.Dedup.RankBase) +
              expr("(85 * csum) DIV 100")).as("rank_units"))
          .localCheckpoint(true)
        n.count()
        n
      }
      ranks = next
    }
    time("full d17 query (wire, as declared)") {
      graft.SparkEntry.queries("d17_graph_rank")(spark, sfDir).count()
    }
    spark.stop()
  }
}
