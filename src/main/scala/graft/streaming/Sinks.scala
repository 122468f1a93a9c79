package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming sinks. The reference has no streaming at all (SURVEY.md §2.10);
  * these are the Spark-native write side of graft's streaming surface.
  *
  * Exactly-once contract of the parquet sink: the checkpoint records
  * committed source offsets and the file-sink manifest (_spark_metadata)
  * records committed output files, so a restart with the same
  * (path, checkpoint) pair resumes from the last committed batch without
  * duplicating or losing rows — readers that go through
  * `spark.read.parquet(path)` see only manifest-committed files.
  *
  * Scale notes: partition by a low-cardinality column (date/hour) so each
  * micro-batch appends a bounded file count; Trigger.AvailableNow drains a
  * backlog with the same exactly-once guarantees and then stops, which is
  * the batch-backfill mode of the same pipeline.
  */
object Sinks {

  /** Append-mode partitioned parquet sink. */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
                  partitionCols: Seq[String] = Nil,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).start()
  }

  /** Append-mode CSV sink (same checkpoint/manifest contract). */
  def csvSink(df: DataFrame, path: String, checkpoint: String,
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream.format("csv")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .option("header", "true")
      .outputMode("append")
      .trigger(trigger)
      .start()
}
