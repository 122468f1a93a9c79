package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-share probe for d16_shared_spans: span-hash explosion (string-built
  * windows vs the fused shingle_hashes kernel) vs bucket groupBy vs pair
  * explosion (guide §1.2 measure-first).
  * Usage: runMain graft.tools.D16Probe <sfDir>
  */
object D16Probe {
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
      println(f"[d16probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
      r
    }
    graft.SparkEntry.queries("d16_shared_spans")(spark, "/root/testdata/sf0.001").count()

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val quoters = base.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"),
        concat(
          expr("array_join(slice(split(text, ' '), 1, 25), ' ')"),
          lit(" qz"), col("doc_id").cast("string"),
          lit(" unrelated salted tail content follows here")).as("text"))
    val df = base.unionAll(quoters)
    val spanTokens = 20

    // current: per-window array_join string construction, then xxhash64
    val spansCurrent = df.select(col("doc_id").as("sid"),
      explode(array_distinct(expr(
        s"""element_at(transform(array(split(lower(text), ' ')), ws ->
           |  CASE WHEN size(ws) < $spanTokens
           |       THEN array(xxhash64(array_join(ws, ' ')))
           |       ELSE transform(sequence(0, size(ws) - $spanTokens),
           |              i -> xxhash64(array_join(slice(ws, i + 1, $spanTokens), ' ')))
           |  END), 1)""".stripMargin))).as("wh"))
    timed("span explosion (current string-built)") {
      spansCurrent.write.format("noop").mode("overwrite").save()
    }
    // candidate: fused kernel (identical hash values, order irrelevant)
    val spansFused = df.select(col("doc_id").as("sid"),
      explode(graft.functions.ShingleFunctions
        .shingleHashes(col("text"), spanTokens)).as("wh"))
    timed("span explosion (fused kernel)") {
      spansFused.write.format("noop").mode("overwrite").save()
    }
    // hash-multiset identity check (cheap): counts and decimal sums must
    // agree (bare long sum overflows under ANSI at 100x span volume)
    val a = spansCurrent.agg(count(lit(1)),
      sum(col("wh").cast("decimal(38,0)"))).head()
    val b = spansFused.agg(count(lit(1)),
      sum(col("wh").cast("decimal(38,0)"))).head()
    println(s"[d16probe] identity current=(${a.getLong(0)},${a.get(1)}) fused=(${b.getLong(0)},${b.get(1)})")

    timed("grouped buckets (current)") {
      spansCurrent.groupBy("wh")
        .agg(sort_array(collect_list(col("sid"))).as("ids"))
        .filter(size(col("ids")) >= 2).count()
    }
    timed("d16 full (current)") {
      graft.SparkEntry.queries("d16_shared_spans")(spark, dir).count()
    }
    spark.stop()
  }
}
