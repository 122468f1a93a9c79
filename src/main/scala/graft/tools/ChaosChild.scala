package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sources

/** Child-JVM workload for [[DriverKillGate]]: performs a REAL versioned /
  * CoW commit and then parks INSIDE the commit's narrowest crash window
  * (after every data byte is staged, before the manifest publish — or
  * between the CoW swap's two renames) after dropping a marker file. The
  * parent gate waits for the marker and `kill -9`s this whole JVM: a real
  * driver death over a real half-written filesystem, closing the r13
  * declared boundary that driver loss was only ever injection-simulated.
  *
  * The fixture frames are public so the parent gate asserts against the
  * SAME closed form the child wrote. */
object ChaosChild {

  /** 400-row base table: ids 1..400, lang en/de by parity, x = id. */
  def init(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "de", i, "I"))
      .toDF("id", "lang", "x", "op")
  }

  /** Change batch touching ONLY the en band: 100 inserts (1001-1100),
    * updates at id % 4 == 2 (x flips negative), deletes at id % 4 == 0 —
    * disjoint key sets, so the merged closed form is unambiguous. */
  def change(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ((1001L to 1100L).map(i => (i, "en", i, "I")) ++
      (2L to 40L by 4).map(i => (i, "en", -i, "U")) ++
      (4L to 40L by 4).map(i => (i, "en", i, "D")))
      .toDF("id", "lang", "x", "op")
  }

  private def park(markerPath: String): Unit = {
    new java.io.File(markerPath).createNewFile()
    Thread.sleep(600000) // the parent kills us long before this elapses
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val base = args(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-chaos-child")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("chaos_child_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "delta" =>
        Sources.deltaCommit(spark, base, init(spark), "lang",
          Seq("lang", "id"))
        Sources.beforePublishHook = () => park(s"$base/.chaos-staged")
        Sources.deltaCommit(spark, base, change(spark), "lang",
          Seq("lang", "id"))
      case "snapshot" =>
        Sources.commitVersion(init(spark).drop("op"), base)
        Sources.beforePublishHook = () => park(s"$base/.chaos-staged")
        Sources.commitVersion(
          init(spark).drop("op").filter("id <= 200"), base)
      case "merge" =>
        init(spark).drop("op")
          .write.mode("overwrite").partitionBy("lang").parquet(base)
        Sources.betweenSwapRenamesHook = () => park(s"$base/.chaos-staged")
        Sources.mergeRangePartitioned(spark, base, change(spark), "lang",
          Seq("lang", "id"))
      case other => sys.error(s"unknown chaos-child mode: $other")
    }
    // reaching here means the parent failed to kill us in the window
    sys.exit(3)
  }
}
