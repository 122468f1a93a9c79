package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost probe for s07 (semanticNearDups) at rehearsal scale:
  * prints cell count, occupancy histogram, candidate volume, and per-stage
  * wall — the instrument for the 100× rehearsal's s07 segment-α finding.
  * Usage: runMain graft.tools.S07Probe <sfDir>
  */
object S07Probe {
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
      println(f"[s07probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // twin offset COLLISION-FREE at any rehearsal scale (the gated s07
    // query's +100000 is fine at sf≤0.1 but collides with base ids once
    // the corpus passes 100k vectors — rehearsal pair counts were junk)
    val off = 100000000L
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twin = e.select((col("vec_id") + off).as("vec_id"),
      expr("transform(embedding, (x, i) -> x * (1.0D + 0.002D * ((i % 5) - 2)))")
        .as("embedding"))
    val corpus = e.unionAll(twin)
    val n = timed("count")(corpus.count())
    println(s"[s07probe] corpus = $n vectors")
    // replicate the bucketing stage via the public entry but stop at pairs
    val targetOcc = sys.env.get("GRAFT_S07_TARGETOCC").map(_.toInt).getOrElse(32)
    val probe = sys.env.get("GRAFT_S07_PROBECELLS").map(_.toInt).getOrElse(2)
    val pairs = timed("full semanticNearDups") {
      graft.ops.Similarity.semanticNearDups(corpus, threshold = 0.8,
        nlist = sys.env.get("GRAFT_S07_NLIST").map(_.toInt).getOrElse(0),
        probeCells = probe, trainSampleFraction = 0.5, corpusSizeHint = n,
        maxBucket = sys.env.get("GRAFT_S07_MAXBUCKET").map(_.toInt)
          .getOrElse(10000),
        targetOcc = targetOcc)
        .localCheckpoint(true)
    }
    val total = pairs.count()
    // planted-twin recall: (v, v+off) is a KNOWN qualifying pair for every
    // base vector — the measurable completeness floor at rehearsal scale
    val twins = pairs.filter(col("id_b") - col("id_a") === off).count()
    println(s"[s07probe] targetOcc=$targetOcc probeCells=$probe " +
      s"result pairs = $total, twin recall = $twins / ${n / 2}")
    spark.stop()
  }
}
