package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver's parquet tables (TESTDATA.md) as temp views so
  * Substrait NamedTable scans resolve through the session catalog, exactly as
  * the reference resolves names against its SessionContext
  * (reference: src/consumer.rs:320-339).
  *
  * Registration is by-name idempotent and cached per (session, dir): the
  * correctness/bench drivers call every query with the same (spark, sfDir), so
  * views are created once and each query's plan starts from the same
  * file-backed relations — filters and column pruning push down to the
  * parquet scans via Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // session → currently-registered dir: re-registering the SAME dir is a
  // no-op, switching dirs replaces every view (so a caller can warm up
  // against one scale factor and then measure another). Weakly keyed by the
  // session itself — identity hashes can be reused after a GC'd session, and
  // a string-keyed map grows without bound across session churn.
  private val current = new java.util.WeakHashMap[SparkSession, String]()

  def register(spark: SparkSession, dir: String): Unit = synchronized {
    if (current.get(spark) != dir) {
      // events.parquet's ts physical type has varied across testdata
      // generations: TIMESTAMP(NANOS) (unreadable unless surfaced as raw
      // int64 via nanosAsLong), TIMESTAMP(MICROS) isAdjustedToUTC=false
      // (reads as TIMESTAMP_NTZ), or already-LTZ micros. The view exposes
      // ONE canonical type regardless: micros-precision LTZ TIMESTAMP with
      // session timezone UTC — the same instants DuckDB's naive timestamps
      // compare as, and the only event-time type Structured Streaming
      // watermarks accept.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      names.foreach { n =>
        val p = s"$dir/$n.parquet"
        if (new java.io.File(p).exists()) {
          val df0 = spark.read.parquet(p)
          val df =
            if (n == "events") {
              import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
              import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
              val ts = df0.schema("ts").dataType match {
                case LongType         => timestamp_micros(expr("ts div 1000"))
                case TimestampNTZType => col("ts").cast(TimestampType)
                case _                => col("ts")
              }
              df0.withColumn("ts", ts)
                .select("event_id", "ts", "user_id", "event_type", "value", "props")
            } else df0
          df.createOrReplaceTempView(n)
        }
      }
      current.put(spark, dir)
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    register(spark, dir)
    spark.table(name)
  }
}
