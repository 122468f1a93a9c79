package graft.tools

import org.apache.spark.sql.SparkSession

/** t13 reuse probe: does the (doc, term) tf exchange get reused by the df
  * branch (ReuseExchange / AQE stage reuse), host plan vs wire round-trip?
  * `runMain graft.tools.T13Probe <sfDir>` — prints ReusedExchange /
  * StageReuse evidence from the POST-RUN adaptive plan plus timings.
  */
object T13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    def run(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning"))
      println(f"[$name] $sec%.2f s, hashExchanges=$exchanges reused=$reused")
    }
    val host = graft.ops.TextOps.tfidfTopTerms(docs)
    run("host", host)
    run("host2", graft.ops.TextOps.tfidfTopTerms(docs))
    val wired = graft.substrait.Consumer.consume(spark,
      graft.substrait.Wire.decode(graft.substrait.Wire.encode(
        graft.substrait.Producer.produce(
          graft.ops.TextOps.tfidfTopTerms(docs)))))
    run("wire", wired)
    spark.stop()
  }
}
