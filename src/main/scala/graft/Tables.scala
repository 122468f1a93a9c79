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
  // against one scale factor and then measure another)
  private val current = scala.collection.mutable.Map.empty[String, String]

  def register(spark: SparkSession, dir: String): Unit = synchronized {
    val key = System.identityHashCode(spark).toString
    if (!current.get(key).contains(dir)) {
      // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
      // rejects; read the raw int64 nanos and expose micros-precision ts
      // (matching DuckDB, whose timestamps are micros).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      names.foreach { n =>
        val p = s"$dir/$n.parquet"
        if (new java.io.File(p).exists()) {
          val df0 = spark.read.parquet(p)
          val df =
            if (n == "events" &&
                df0.schema("ts").dataType.isInstanceOf[org.apache.spark.sql.types.LongType.type])
              df0.withColumn("ts",
                org.apache.spark.sql.functions.timestamp_micros(
                  org.apache.spark.sql.functions.expr("ts div 1000")))
                .select("event_id", "ts", "user_id", "event_type", "value", "props")
            else df0
          df.createOrReplaceTempView(n)
        }
      }
      current(key) = dir
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    register(spark, dir)
    spark.table(name)
  }
}
