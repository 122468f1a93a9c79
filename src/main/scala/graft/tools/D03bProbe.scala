package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-share probe for d03b_simhash_prod (numChunks=4, maxHamming=3,
  * salted-twin fixture): fingerprint pass vs salted pair join vs verify
  * joins — including the candidate count feeding the array-shipping verify
  * (guide §1.2 measure-first).
  * Usage: runMain graft.tools.D03bProbe <sfDir>
  */
object D03bProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d03bprobe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
      r
    }
    graft.SparkEntry.queries("d03b_simhash_prod")(spark, "/root/testdata/sf0.001").count()

    // the d03b fixture construction
    val salted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        expr("array_join(flatten(transform(split(lower(text), ' '), " +
          "w -> array(w, concat('s', cast(doc_id AS STRING))))), ' ')").as("text"))
    val twins = salted.select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val df = salted.unionAll(twins)

    val numChunks = 4; val chunkBits = 16; val mask = (1L << chunkBits) - 1
    val threshold = 0.9; val maxHamming = 3; val pairSalts = 16

    val base = df.select(col("doc_id"), col("text")).repartition(col("doc_id"))
    timed("n_docs")(df.count())
    val fp = graft.ops.Dedup.simhash64(base, "text")
      .withColumn("sz", size(graft.ops.Dedup.shingles("text", 3)))
      .select(col("doc_id").as("sv_id"), col("simhash"), col("sz"))
    timed("fingerprint pass (current: simhash + size(shingles))") {
      fp.write.format("noop").mode("overwrite").save()
    }
    timed("fingerprint pass (fused: simhash64_text + size(shingle_hashes))") {
      base.select(col("doc_id"),
          graft.functions.MinHashFunctions.simhash64Text(col("text")).as("simhash"),
          size(graft.functions.ShingleFunctions.shingleHashes(col("text"), 3)).as("sz"))
        .write.format("noop").mode("overwrite").save()
    }
    val chunked = fp.select(
      posexplode(expr(
        s"""element_at(transform(array(simhash),
           |  s -> transform(sequence(0, ${numChunks - 1}),
           |    c -> shiftright(s, c * $chunkBits) & $mask)), 1)""".stripMargin))
        .as(Seq("chunk_idx", "chunk_val")),
      struct(col("sv_id"), col("simhash"), col("sz")).as("it"))
    // pair volume the salted join must stream: sum bn^2 per (chunk,val),
    // and the same with a lossless geometric size-bucket refinement
    // (J >= t implies size ratio >= t => same-or-adjacent bucket)
    val bs0 = chunked.groupBy("chunk_idx", "chunk_val").agg(count(lit(1)).as("bn"))
    timed("sum_bn2 (current buckets)") {
      bs0.agg(sum(col("bn") * col("bn"))).head().getLong(0)
    }
    timed("max_bn (current buckets)") { bs0.agg(max("bn")).head().getLong(0) }
    val lnBase = math.log(1.0 / threshold)
    val szRef = chunked.withColumn("szb",
      floor(log(greatest(col("it.sz"), lit(1)).cast("double")) / lnBase).cast("int"))
      .groupBy("chunk_idx", "chunk_val", "szb").agg(count(lit(1)).as("bn"))
    timed("sum_bn2 (size-refined, home only)") {
      szRef.agg(sum(col("bn") * col("bn"))).head().getLong(0)
    }
    val bucketSizes = chunked.groupBy("chunk_idx", "chunk_val")
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") >= 2 && col("bn") <= 10000)
    val inBuckets = chunked.join(broadcast(bucketSizes.select("chunk_idx", "chunk_val")),
      Seq("chunk_idx", "chunk_val"))
    val pairPar = spark.sparkContext.defaultParallelism
    val probe = inBuckets.select(col("chunk_idx"), col("chunk_val"),
        pmod(xxhash64(col("it.sv_id")), lit(pairSalts)).as("salt"), col("it").as("x"))
      .repartition(pairPar, col("chunk_idx"), col("chunk_val"), col("salt"))
    val build = inBuckets.select(col("chunk_idx"), col("chunk_val"),
      explode(expr(s"sequence(0, ${pairSalts - 1})")).as("salt"), col("it").as("y"))
    timed("in-bucket rows")(inBuckets.count())
    val candidates = probe.join(build, Seq("chunk_idx", "chunk_val", "salt"))
      .filter(col("x.sv_id") < col("y.sv_id"))
      .filter(expr(s"bit_count(x.simhash ^ y.simhash) <= $maxHamming"))
      .withColumn("xorfp", expr("x.simhash ^ y.simhash"))
      .withColumn("zmap", expr(
        (0 until numChunks).map(c =>
          s"(CASE WHEN (shiftright(xorfp, ${c * chunkBits}) & $mask) = 0 " +
            s"THEN ${1L << c}L ELSE 0L END)").mkString(" + ")))
      .filter(expr("(zmap & -zmap) = shiftleft(1L, chunk_idx)"))
      .filter(least(col("x.sz"), col("y.sz")).cast("double") /
        greatest(col("x.sz"), col("y.sz")) >= threshold)
      .select(col("x.sv_id").as("id_a"), col("y.sv_id").as("id_b"))
    timed("candidates after all filters")(candidates.count())
    timed("d03b full (current)") {
      graft.SparkEntry.queries("d03b_simhash_prod")(spark, dir).count()
    }
    spark.stop()
  }
}
