package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-share breakdown for the ANN index queries (opt round 15):
  * driver-side training vs encode/save vs load vs search.
  * Usage: runMain graft.tools.SProbe <sfDir>
  */
object SProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time1(label: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sprobe] $label%-36s $dt%7.2fs  ($r)")
      dt
    }

    // warmup: run the full queries once at sf0.001
    for (q <- Seq("s08_knn_pq", "s11_knn_ivfpq", "s13_ivf_incremental_ingest",
                  "s16_knn_tombstone_delete", "s19_knn_ivfsq", "s20_knn_bucketed"))
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()

    val e = graft.Tables.table(spark, sfDir, "embeddings")
    println(s"[sprobe] embeddings rows=${e.count()} sf=$sfDir")

    // ---- s11 decomposition
    var idx: graft.ops.IvfPq.IvfPqIndex = null
    time1("s11 build (sample+lloyd+encode-def)") {
      idx = graft.ops.IvfPq.build(e, nlist = 16, m = 16, k = 64,
        trainSampleFraction = 0.5); ""
    }
    val path = s"${System.getProperty("java.io.tmpdir")}/sprobe-ivfpq"
    time1("s11 save (cells+cent+books writes)") {
      graft.ops.IvfPq.save(idx, path); ""
    }
    var loaded: graft.ops.IvfPq.IvfPqIndex = null
    time1("s11 load") { loaded = graft.ops.IvfPq.load(spark, path); "" }
    var sdf: org.apache.spark.sql.DataFrame = null
    time1("s11 searchPruned df build (no exec)") {
      sdf = graft.ops.IvfPq.searchPruned(loaded, e, e.filter(col("vec_id") < 8),
        k = 5, nprobe = 12, shortlist = 200).orderBy("q_id", "rank"); ""
    }
    var rtdf: org.apache.spark.sql.DataFrame = null
    var plan0: graft.substrait.model.Plan = null
    var bytes: Array[Byte] = null
    var plan1: graft.substrait.model.Plan = null
    time1("s11 rt.produce") { plan0 = graft.substrait.Producer.produce(sdf); "" }
    time1("s11 rt.encode") {
      bytes = graft.substrait.Wire.encode(plan0); s"${bytes.length}B"
    }
    time1("s11 rt.decode") { plan1 = graft.substrait.Wire.decode(bytes); "" }
    time1("s11 rt.consume") {
      rtdf = graft.substrait.Consumer.consume(spark, plan1); ""
    }
    time1("s11 rt.produce again") { graft.substrait.Producer.produce(sdf); "" }
    time1("s11 rt.encode again") { graft.substrait.Wire.encode(plan0); "" }
    time1("s11 rt.decode again") { graft.substrait.Wire.decode(bytes); "" }
    time1("s11 rt.consume again") { graft.substrait.Consumer.consume(spark, plan1); "" }
    time1("s11 rt plan (executedPlan only)") {
      rtdf.queryExecution.executedPlan; ""
    }
    time1("s11 rt count 1") { rtdf.count() }
    time1("s11 rt count 2") { rtdf.count() }
    time1("s11 full query (min-of-2 next)") {
      graft.SparkEntry.queries("s11_knn_ivfpq")(spark, sfDir).count()
    }
    time1("s11 full query again") {
      graft.SparkEntry.queries("s11_knn_ivfpq")(spark, sfDir).count()
    }

    // ---- s08
    time1("s08 Pq.train") { graft.ops.Pq.train(e, m = 16, k = 64); "" }
    time1("s08 full query") {
      graft.SparkEntry.queries("s08_knn_pq")(spark, sfDir).count()
    }

    // ---- s13 / s16 / s19 / s20 full
    for (q <- Seq("s13_ivf_incremental_ingest", "s16_knn_tombstone_delete",
                  "s19_knn_ivfsq", "s20_knn_bucketed")) {
      time1(s"$q full query") {
        graft.SparkEntry.queries(q)(spark, sfDir).count()
      }
      time1(s"$q full query again") {
        graft.SparkEntry.queries(q)(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
