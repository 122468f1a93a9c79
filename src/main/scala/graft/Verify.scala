package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Robustness contract (round-6 hardening — CORRECTNESS_r05 came back `{}`):
  *  - oracle_sql.json is written FIRST, before any query runs, so a timeout
  *    or crash mid-run still leaves the oracle map plus every completed
  *    query's parquet → a partial correctness report instead of an empty one.
  *  - queries run on a small thread pool (Spark's scheduler is thread-safe;
  *    concurrent jobs overlap each other's single-threaded planning/codegen
  *    phases) → ~3-4× lower wall than the serial loop, far under any driver
  *    timeout.
  *  - every query logs start/finish + elapsed to stderr, so a driver-side
  *    failure is attributable to a specific query instead of silent.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd+ args: run only these query names (debug aid)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the 131-query sweep compiles >200 codegen stages; the 100-entry
      // default class cache thrashes (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }.toSeq
    val t0 = System.nanoTime()
    def log(m: String): Unit =
      System.err.println(f"[verify +${(System.nanoTime() - t0) / 1e9}%.1fs] $m")
    val nThreads = math.max(2, math.min(8, cpus.toInt / 4))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = selected.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val s0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            log(f"$name ok (${(System.nanoTime() - s0) / 1e9}%.1fs, " +
              s"${done.incrementAndGet()}/${selected.size})")
          } catch { case e: Throwable =>
            done.incrementAndGet()
            log(s"$name FAILED: ${e.getMessage}")
          }
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    log(s"all ${selected.size} queries done")
    spark.stop()
  }
}
