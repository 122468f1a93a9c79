package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Micro-batch state-store metrics recorder — the instrument behind the
  * bounded-state claims every watermark-carrying operator in this library
  * makes (windowed aggregation, dropDuplicatesWithinWatermark,
  * stream-stream interval joins, session windows, the funnel's
  * flatMapGroupsWithState). Construction arguments say state is
  * O(watermark window), not O(stream); this measures it: drive a
  * transform over a synthetic file-source stream delivered as N
  * micro-batches, each advancing event time by a fixed step, and record
  * `StreamingQueryProgress.stateOperators` after every batch —
  * `numRowsTotal` must PLATEAU (watermark eviction observed as
  * `numRowsRemoved > 0`), and the watermark must track the max event time
  * within one batch step.
  *
  * At 100 TB the same numbers come from the production
  * StreamingQueryListener feed; nothing here is test-only — the recorder
  * runs any transform on any schema.
  */
object StateMetrics {

  /** One micro-batch's observed state metrics. */
  final case class BatchMetrics(batchIdx: Int, inputRows: Long,
                                stateRowsTotal: Long, stateRowsRemoved: Long,
                                watermarkLagSec: Long)

  /** Fixed, deterministic epoch base for synthetic streams (no wall clock
    * — results reproduce bit-identically). */
  val BaseMs: Long = 1700000000000L

  /** Synthetic event micro-batch `b`: `rows` events spread uniformly over
    * `[base + b*advanceMin, base + (b+1)*advanceMin)`, four event types,
    * globally-unique event ids. `usersPerBatchUnique=false` recycles the
    * same `nUsers` user ids every batch (recurring visitors — the session
    * shape); `true` gives each batch fresh users (cohorts that go quiet —
    * the funnel-timeout shape). */
  def eventsBatch(spark: SparkSession, b: Int, rows: Int, advanceMin: Int,
                  nUsers: Int = 500,
                  usersPerBatchUnique: Boolean = false): DataFrame = {
    import spark.implicits._
    val spanMs = advanceMin * 60000L
    val types = Seq("view", "click", "purchase", "scroll")
    (0 until rows).map { i =>
      val id = b.toLong * rows + i
      val ts = new java.sql.Timestamp(
        BaseMs + b * spanMs + i.toLong * spanMs / rows)
      val user =
        if (usersPerBatchUnique) b.toLong * nUsers + (i % nUsers)
        else (i % nUsers).toLong
      (id, ts, user, types(i % types.size), (i % 100) / 10.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  /** Drive `transform` over `nBatches` file-source micro-batches and
    * record state metrics after each. The sink is `noop` — this measures
    * state, not results (the streaming==batch specs certify results). */
  def run(spark: SparkSession, name: String,
          transform: DataFrame => DataFrame,
          nBatches: Int, rowsPerBatch: Int, advanceMin: Int,
          outputMode: String = "append",
          usersPerBatchUnique: Boolean = false): Seq[BatchMetrics] = {
    val root = java.nio.file.Files
      .createTempDirectory(s"smx_$name").toString
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val schema = eventsBatch(spark, 0, 1, advanceMin).schema
    val q = transform(spark.readStream.schema(schema).parquet(src))
      .writeStream.format("noop")
      .option("checkpointLocation", s"$root/ck")
      .outputMode(outputMode).start()
    val out = Seq.newBuilder[BatchMetrics]
    try {
      var maxEventMs = 0L
      (0 until nBatches).foreach { b =>
        eventsBatch(spark, b, rowsPerBatch, advanceMin,
          usersPerBatchUnique = usersPerBatchUnique)
          .coalesce(1).write.mode("append").parquet(src)
        maxEventMs = BaseMs + (b + 1L) * advanceMin * 60000L -
          (advanceMin * 60000L / rowsPerBatch)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null) {
          val so = p.stateOperators
          val wmMs = Option(p.eventTime.get("watermark"))
            .map(java.time.Instant.parse(_).toEpochMilli)
          out += BatchMetrics(b,
            p.numInputRows,
            so.map(_.numRowsTotal).sum,
            so.map(_.numRowsRemoved).sum,
            wmMs.map(w => (maxEventMs - w) / 1000L).getOrElse(Long.MaxValue))
        }
      }
    } finally {
      q.stop()
      // the gate writes ~1.4M rows per scenario into this temp root —
      // delete it eagerly or back-to-back gate/spec runs leak disk
      deleteRecursively(new java.io.File(root))
    }
    out.result()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** The boundedness verdict over a recorded run: state must PLATEAU —
    * the max observed state never exceeds `plateauCap` rows, eviction is
    * actually observed (`numRowsRemoved > 0` somewhere), and late-run
    * state is no more than `plateauRatio` × the state once warm (batch
    * `warmAt`). Returns (ok, detail). */
  def boundedVerdict(ms: Seq[BatchMetrics], plateauCap: Long,
                     warmAt: Int = 3,
                     plateauRatio: Double = 1.6,
                     requireRemovals: Boolean = true): (Boolean, String) = {
    // a run that never reported progress is a FAILED verdict with its own
    // message, not an empty.max crash masking the state data
    if (ms.isEmpty)
      return (false, "no StreamingQueryProgress recorded (no batches ran " +
        "or lastProgress stayed null)")
    val maxTotal = ms.map(_.stateRowsTotal).max
    val removed = ms.map(_.stateRowsRemoved).sum
    val warm = ms(math.min(warmAt, ms.size - 1)).stateRowsTotal max 1L
    val last = ms.last.stateRowsTotal
    val lag = ms.map(_.watermarkLagSec).filter(_ != Long.MaxValue)
      .maxOption.getOrElse(-1L) // -1: no watermark ever reported
    val ok = maxTotal <= plateauCap &&
      (!requireRemovals || removed > 0) &&
      last <= (plateauRatio * warm).toLong
    (ok, s"maxState=$maxTotal (cap $plateauCap), removedTotal=$removed, " +
      s"warm(b$warmAt)=$warm, last=$last, lagSec=$lag")
  }
}
