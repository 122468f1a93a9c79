package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Tables
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    spark.table("events").coalesce(2).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val se = spark.readStream.schema(schema).parquet(dir)
    val q = graft.streaming.EventStream.sessionize(spark, se, 120)
      .writeStream.format("memory").queryName("sd").outputMode("append").start()
    q.processAllAvailable()
    println("== batches: " + q.recentProgress.length)
    q.recentProgress.foreach(p => println("== batch rows: " + p.numInputRows))
    println("== sessions emitted: " + spark.table("sd").count())
    println("== batch sessions: " + graft.streaming.EventStream.sessionizeBatch(spark.table("events"), 120).count())
    q.stop(); spark.stop()
  }
}
