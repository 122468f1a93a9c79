package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: stage-by-stage cost/cardinality of the d03 simhash
  * pipeline at a given SF dir. Not part of the library surface.
  */
object D03Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val plansOnly = args.length > 1 && args(1) == "plans"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    if (plansOnly) {
      def d03raw() = Dedup.simhashVerifiedNearDups(docs,
          threshold = 0.9, numChunks = 8, maxHamming = 15)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
      def summarize(tag: String, df: DataFrame): Unit = {
        // collect() executes THIS frame's executedPlan, so the adaptive plan
        // finalizes and the dump below shows the runtime join strategies
        // (count() would execute a derived aggregate plan instead)
        val t0 = System.nanoTime()
        val n = df.collect().length
        println(f"PROBE $tag%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
        val plan = df.queryExecution.executedPlan.toString
        println(s"===== $tag =====")
        val counts = plan.split("\n")
          .map(_.replaceAll("^[^A-Za-z*+:-]*", "").replaceAll("^[*+:\\- ]+", "")
            .takeWhile(c => c.isLetterOrDigit))
          .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length)
        counts.toSeq.sortBy(-_._2).foreach { case (k, v) => println(f"  $v%3d $k") }
        java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/d03plan_$tag.txt"),
          plan.getBytes("UTF-8"))
      }
      summarize("raw", d03raw())
      summarize("wire", graft.substrait.Serializer.roundtrip(spark, d03raw()))
      spark.stop(); return
    }

    val numChunks = 8; val chunkBits = 64 / numChunks; val mask = (1L << chunkBits) - 1
    val threshold = 0.9; val maxHamming = 15; val pairSalts = 16

    val base = docs.select(col("doc_id"), col("text")).repartition(col("doc_id"))
    val fp = Dedup.simhash64(base, "text")
      .withColumn("sz", size(Dedup.shingles("text", 3)))
      .select(col("doc_id").as("sv_id"), col("simhash"), col("sz"))

    timed("n_docs")(docs.count())
    timed("fingerprint_pass")(fp.count())

    val chunked = fp.select(
      posexplode(expr(
        s"""element_at(transform(array(simhash),
           |  s -> transform(sequence(0, ${numChunks - 1}),
           |    c -> shiftright(s, c * $chunkBits) & $mask)), 1)""".stripMargin))
        .as(Seq("chunk_idx", "chunk_val")),
      struct(col("sv_id"), col("simhash"), col("sz")).as("it"))

    // candidate volume the salted join must produce: sum bn^2 per (chunk,val)
    val bs = chunked.groupBy("chunk_idx", "chunk_val").agg(count(lit(1)).as("bn"))
    timed("sum_bn2")(bs.agg(sum(col("bn") * col("bn"))).head().getLong(0))
    timed("max_bn")(bs.agg(max("bn")).head().getLong(0))
    timed("n_kept_buckets")(bs.filter(col("bn") >= 2 && col("bn") <= 10000).count())

    // with a size-bucket refinement: sum over (chunk,val,szb) of n*(n+guests)
    val lnBase = math.log((1.0 / threshold) * (1.0 + 1e-6))
    val szb = chunked.withColumn("szb",
      floor(log(greatest(col("it.sz"), lit(1)).cast("double")) / lnBase).cast("int"))
    val bs2 = szb.groupBy("chunk_idx", "chunk_val", "szb").agg(count(lit(1)).as("bn"))
    timed("n_size_buckets")(bs2.count())
    timed("sum_bn2_size_refined")(bs2.agg(sum(col("bn") * col("bn"))).head().getLong(0))

    val bucketSizes = bs.filter(col("bn") >= 2 && col("bn") <= 10000)
    val inBuckets = chunked.join(broadcast(bucketSizes.select("chunk_idx", "chunk_val")),
      Seq("chunk_idx", "chunk_val"))
    val probe = inBuckets.select(col("chunk_idx"), col("chunk_val"),
      pmod(xxhash64(col("it.sv_id")), lit(pairSalts)).as("salt"), col("it").as("x"))
    val build = inBuckets.select(col("chunk_idx"), col("chunk_val"),
      explode(expr(s"sequence(0, ${pairSalts - 1})")).as("salt"), col("it").as("y"))
    timed("build_rows")(build.count())

    val joined = probe.join(build, Seq("chunk_idx", "chunk_val", "salt"))
      .filter(col("x.sv_id") < col("y.sv_id"))
    timed("candidates_lt")(joined.count())

    val afterHamming = joined
      .filter(expr(s"bit_count(x.simhash ^ y.simhash) <= $maxHamming"))
    timed("after_hamming")(afterHamming.count())

    val afterFirstChunk = afterHamming
      .withColumn("xorfp", expr("x.simhash ^ y.simhash"))
      .withColumn("zmap", expr(
        (0 until numChunks).map(c =>
          s"(CASE WHEN (shiftright(xorfp, ${c * chunkBits}) & $mask) = 0 " +
            s"THEN ${1L << c}L ELSE 0L END)").mkString(" + ")))
      .filter(expr("(zmap & -zmap) = shiftleft(1L, chunk_idx)"))
      .filter(least(col("x.sz"), col("y.sz")).cast("double") /
        greatest(col("x.sz"), col("y.sz")) >= threshold)
    timed("after_first_chunk+ratio")(afterFirstChunk.count())

    val candidates = afterFirstChunk.select(col("x.sv_id").as("id_a"),
      col("y.sv_id").as("id_b"), col("x.sz").as("sz_a"), col("y.sz").as("sz_b"))
    val hashedShingles = base.select(col("doc_id"),
      transform(Dedup.shingles("text", 3), s => xxhash64(s)).as("sh"))
    val sa = hashedShingles.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val sb = hashedShingles.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val out = candidates.join(sa, "id_a").join(sb, "id_b")
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
    timed("final_pairs")(out.count())

    // raw vs wire-round-tripped execution of the actual d03 query shape
    def d03raw() = Dedup.simhashVerifiedNearDups(docs,
        threshold = 0.9, numChunks = 8, maxHamming = 15)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
    timed("d03_raw")(d03raw().count())
    timed("d03_wire")(graft.substrait.Serializer.roundtrip(spark, d03raw()).count())
    spark.stop()
  }
}
