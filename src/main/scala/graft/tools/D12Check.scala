package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: does the wire roundtrip of prefixFilterJaccardPairs return the
  * same row set as the raw frame at a given SF? */
object D12Check {
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
    val d = graft.Tables.table(spark, sfDir, "documents")
    def pairs() = graft.ops.Dedup.prefixFilterJaccardPairs(
      d, "doc_id", "text", threshold = 0.5)
    val raw1 = pairs().count()
    val raw2 = pairs().count()
    val rt1 = graft.substrait.Serializer.roundtrip(spark, pairs()).count()
    val rt2 = graft.substrait.Serializer.roundtrip(spark, pairs()).count()
    println(s"[d12check] raw=$raw1/$raw2 rt=$rt1/$rt2")
    val a = pairs().select("id_a", "id_b")
    val b = graft.substrait.Serializer.roundtrip(spark, pairs())
      .select("id_a", "id_b")
    println(s"[d12check] raw-minus-rt=${a.exceptAll(b).count()} " +
      s"rt-minus-raw=${b.exceptAll(a).count()}")
    spark.stop()
  }
}
