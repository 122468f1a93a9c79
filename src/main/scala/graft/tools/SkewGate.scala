package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 skew gate: SKEW IS PLANTED AND OBSERVED, not reasoned about.
  * The r12 verdict's boundary 2 — "no rehearsal fixture plants a
  * Zipf-skewed join key (one language = 50% of corpus, one giant cluster
  * in d14) and verifies AQE skew-split or the routed path engages" — is
  * closed by two scenarios:
  *
  *   1. `join`    — a fact↔dim equi-join where HALF the fact rows carry ONE
  *                  key (the Zipf-head shape of a real corpus language
  *                  column). AQE must actually SPLIT the skewed partition:
  *                  the gate asserts the final adaptive plan carries
  *                  `skew=true` on the sort-merge join AND the join result
  *                  matches its closed form. Thresholds are scaled to the
  *                  fixture (64 MB skew threshold / 16 MB advisory vs the
  *                  256 MB/64 MB defaults — the head partition here is
  *                  ~700 MB, 11× the scaled threshold, the same ratio a
  *                  100 TB corpus' head bears to the defaults).
  *   2. `cluster` — d14 keep-best-per-cluster where ONE connected component
  *                  contains HALF the corpus (a 1M-member star — the shape
  *                  a template/boilerplate near-dup cluster takes at crawl
  *                  scale). The struct-max SortAggregate must survive the
  *                  single giant group via map-side partials; the gate
  *                  asserts survivor set == closed form (every loser of
  *                  the giant cluster gone, singletons intact, the winner
  *                  is the max-(quality, -id) member).
  *
  * Prints one JSON line per scenario; exits non-zero on failure.
  *
  * Usage: java -cp target/scala-2.13/classes:/opt/spark/jars/\* \
  *   graft.tools.SkewGate [join|cluster|all] [factRows] [clusterRows]
  */
object SkewGate {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val factRows = if (args.length > 1) args(1).toLong else 10000000L
    val clusterRows = if (args.length > 2) args(2).toLong else 2000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-skew-gate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failures = 0
    def run(name: String)(body: => (Boolean, String)): Unit =
      if (mode == "all" || mode == name) {
        val t0 = System.nanoTime()
        val (ok, detail) =
          try body
          catch { case e: Throwable =>
            (false, s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        val secs = (System.nanoTime() - t0) / 1e9
        if (!ok) failures += 1
        println(f"""{"scenario":"$name","pass":$ok,"secs":$secs%.1f,"detail":"${GateJson.esc(detail)}"}""")
      }

    run("join")(joinScenario(spark, factRows))
    run("cluster")(clusterScenario(spark, clusterRows))
    spark.stop()
    if (failures > 0) sys.exit(1)
  }

  /** Zipf-head join: 50 % of fact rows on key 0; AQE must split it. */
  private def joinScenario(spark: SparkSession, n: Long): (Boolean, String) = {
    val dimKeys = 20000L
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // fixture-proportionate thresholds (defaults are sized for production
    // partitions; the planted head here is ~700 MB ≈ 11× this threshold,
    // the same head:threshold ratio the 256 MB default sees at corpus scale)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
    // keep the join a shuffled SMJ: a broadcast dim would dodge the skew
    // machinery this gate exists to observe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = spark.range(n).select(
        when(col("id") % 2 === 0, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(dimKeys - 1)) + 1).as("k"),
        col("id").as("v"),
        // ~240 B INCOMPRESSIBLE payload (hash chain, not a constant pad):
        // AQE sizes partitions by COMPRESSED shuffle bytes, and a constant
        // pad compresses below the skew threshold no matter how wide it is
        array_join(transform(sequence(lit(0), lit(14)),
          w => conv(xxhash64(col("id"), w).cast("string"), 10, 16)), "")
          .as("pad"))
      val dim = spark.range(dimKeys).select(
        col("id").as("k"), (col("id") * 2).as("dk"))
      val joined = fact.join(dim, "k")
        // sum(length(pad)) keeps the payload ALIVE through column pruning —
        // without a consumer the optimizer strips pad before the exchange
        // and the head partition shrinks to 16 B/row, under any threshold
        .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"),
          sum(col("dk")).as("sdk"), sum(length(col("pad"))).as("sp"))
      val row = joined.collect()(0)
      val plan = joined.queryExecution.executedPlan.toString
      if (sys.env.contains("SKEW_DEBUG")) System.err.println(plan)
      val skewSplit = plan.contains("skew=true")
      val cnt = row.getLong(0); val sv = row.getLong(1)
      // closed form: every fact row joins exactly one dim row;
      // sum(v) = n(n-1)/2
      val ok = cnt == n && sv == n * (n - 1) / 2 && skewSplit
      (ok, s"cnt=$cnt sv=$sv skewSplitObserved=$skewSplit")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
        .foreach(spark.conf.unset)
    }
  }

  /** d14 with ONE component holding half the corpus (star shape). */
  private def clusterScenario(spark: SparkSession, n: Long): (Boolean, String) = {
    val half = n / 2
    val df = spark.range(n).select(
      col("id").as("doc_id"),
      pmod(xxhash64(col("id")), lit(1000L)).as("q"))
    // star: node 0 pairs with every node in [1, half) — one giant cluster
    // of `half` members; nodes >= half stay singletons
    val pairs = spark.range(1, half).select(
      lit(0L).as("id_a"), col("id").as("id_b"))
    val kept = graft.ops.Dedup.keepBestPerCluster(
      df, pairs, col("q"), idCol = "doc_id")
    // closed form: singletons survive untouched; of the giant cluster only
    // argmax(q, tiebreak min id) survives — compute the winner with an
    // independent formulation (plain max over a derived struct, no CC)
    val winner = df.filter(col("doc_id") < half)
      .agg(max(struct(col("q"), -col("doc_id"))).as("w"))
      .select((-col("w").getField("col2")).as("doc_id"))
      .collect()(0).getLong(0)
    val keptCount = kept.count()
    val expectCount = (n - half) + 1
    val winnerKept = kept.filter(col("doc_id") === winner).count() == 1
    val losersGone = kept.filter(col("doc_id") < half).count() == 1
    val ok = keptCount == expectCount && winnerKept && losersGone
    (ok, s"kept=$keptCount expect=$expectCount winner=$winner " +
      s"winnerKept=$winnerKept losersGone=$losersGone")
  }
}
