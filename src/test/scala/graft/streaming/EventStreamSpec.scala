package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Streaming specs: drive the same transformations through a file-source
  * readStream into a memory sink and assert parity with the batch run
  * (spark_guide.md streaming pattern: processAllAvailable over parquet).
  */
class EventStreamSpec extends SparkTestBase {

  /** events view (ts already converted from raw nanos) re-materialized to a
    * temp dir so the streaming file source can list it */
  private lazy val eventsDir: String = {
    Tables.register(spark, sfDir)
    val dir = Files.createTempDirectory("graft_events").toString
    spark.table("events").coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamingEvents: DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).parquet(eventsDir)
  }

  test("windowed aggregation: streaming (complete mode) == batch") {
    val q = EventStream.windowedTypeCounts(streamingEvents)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
      val batch = EventStream.windowedTypeCounts(spark.table("events"))
      assertSameRows(batch, streamed)
      assert(streamed.count() > 0)
    } finally q.stop()
  }

  test("sliding windowed counts: streaming (complete mode) == batch") {
    val q = EventStream.slidingTypeCounts(streamingEvents)
      .writeStream.format("memory").queryName("slide_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("slide_out")
      val batch = EventStream.slidingTypeCounts(spark.table("events"))
      assertSameRows(batch, streamed)
      assert(streamed.count() > 0)
    } finally q.stop()
  }

  test("streaming windowed heavy-hitters: bounds hold on streamed sketches") {
    val q = EventStream.windowedHeavyHitters(streamingEvents)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hh_out")
      val batch = EventStream.windowedHeavyHitters(spark.table("events"))
      assert(streamed.select("window_start").collect().map(_.get(0)).toSet ==
        batch.select("window_start").collect().map(_.get(0)).toSet,
        "window sets drifted")
      // the Misra–Gries contract on the STREAMED sketches for EVERY
      // (window, user): lb ≤ true ≤ ub. Sketch bytes are merge-order-
      // dependent (micro-batch merges ≠ batch partial merges) — bounds,
      // never bit equality, are the certified property.
      val exact = spark.table("events")
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("exact_n"))
        .select(col("window.start").as("window_start"),
          col("user_id").cast("long").as("uid"), col("exact_n"))
      val F = graft.functions.FreqFunctions
      val bad = exact.join(streamed, "window_start")
        .filter(!(F.freqLowerBoundLong(col("sketch"), col("uid")) <= col("exact_n") &&
          col("exact_n") <= F.freqUpperBoundLong(col("sketch"), col("uid"))))
        .count()
      assert(bad == 0, s"$bad Misra–Gries bound violations in streamed sketches")
      assert(streamed.count() > 0)
    } finally q.stop()
  }

  test("native session_window: streamed closed sessions ⊆ batch sessions") {
    val q = EventStream.sessionWindowAgg(streamingEvents)
      .writeStream.format("memory").queryName("swin_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def norm(df: DataFrame): Set[String] = df
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("total_value"), 4).as("tv"))
        .collect().map(_.toString).toSet
      val streamed = norm(spark.table("swin_out"))
      val batch = norm(EventStream.sessionWindowAgg(spark.table("events")))
      // append mode emits only watermark-closed sessions; each must match a
      // batch session exactly
      assert(streamed.nonEmpty, "some sessions must close under the watermark")
      val missing = streamed -- batch
      assert(missing.isEmpty, s"streamed-only sessions: ${missing.take(3)}")
    } finally q.stop()
  }

  test("stream-static enrichment: streaming (complete mode) == batch") {
    val dim = spark.table("customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val q = EventStream.enrichedTypeTotals(streamingEvents, dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
      val batch = EventStream.enrichedTypeTotals(spark.table("events"), dim)
      assertSameRows(batch, streamed)
      assert(streamed.count() > 0)
    } finally q.stop()
  }

  test("sessionization: streaming sessions match batch sessions for closed sessions") {
    val q = EventStream.sessionize(spark, streamingEvents, gapMinutes = 120)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // round totals: the streaming state sums doubles in event order, the
      // batch oracle sums exact decimals — equal to cents, not to ulps
      def norm(df: DataFrame): Set[String] = df
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("total_value"), 2).as("tv"))
        .collect().map(_.toString).toSet
      val streamed = norm(spark.table("sess_out"))
      val batch = norm(EventStream.sessionizeBatch(spark.table("events"), gapMinutes = 120))
      // append mode only emits sessions closed by gap or watermark timeout;
      // every emitted session must exist in the batch ground truth
      assert(streamed.nonEmpty, "some sessions must close")
      val missing = streamed -- batch
      assert(missing.isEmpty, s"streamed-only sessions: ${missing.take(3)}")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    // duplicate the stream source: each event appears twice across files
    val dupDir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val ev = spark.read.parquet(eventsDir)
    ev.write.mode("overwrite").parquet(dupDir)
    ev.write.mode("append").parquet(dupDir)
    val schema = ev.schema
    val stream = spark.readStream.schema(schema).parquet(dupDir)
    val q = EventStream.streamingDedup(stream, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      assert(n == ev.count(), s"expected ${ev.count()} unique events, got $n")
      // streaming == batch: the same function on the duplicated batch frame
      // (watermark is a no-op there) restores the identical exactly-once set
      val batch = EventStream.streamingDedup(
        ev.unionByName(ev), ev.columns.filter(_ != "ts").toSeq)
        .select("event_id").collect().map(_.getLong(0)).toSet
      val streamed = spark.table("dedup_out")
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(batch == streamed, "batch twin must equal the streamed result")
    } finally q.stop()
  }

  test("stream-stream interval join: streaming == batch") {
    def sides(df: DataFrame): (DataFrame, DataFrame) = (
      df.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
          col("ts").as("e_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts")))
    val (se, sc) = sides(streamingEvents)
    val q = EventStream.intervalJoin(se, sc, "e_user", "c_user",
        "e_ts", "c_ts", horizonSeconds = 3600)
      .select("e_id", "c_id")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val (be, bc) = sides(spark.table("events"))
      val batch = EventStream.intervalJoin(be, bc, "e_user", "c_user",
        "e_ts", "c_ts", horizonSeconds = 3600).select("e_id", "c_id")
      assert(batch.count() > 0, "join must be non-vacuous")
      assertSameRows(batch, spark.table("ij_out"))
    } finally q.stop()
  }

  test("streaming as-of joins (inner + outer): chained stateful operators == batch") {
    import java.sql.Timestamp
    def sides(df: DataFrame): (DataFrame, DataFrame) = (
      df.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
          col("ts").as("e_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts")))
    // private source dir + far-future sentinel pair (the e10 pattern): a
    // finite source alone never advances the watermark past the last rows'
    // match windows, and the latest-per-left AGGREGATE additionally waits
    // for the join-propagated (horizon-delayed) watermark — the sentinel
    // closes both, so the assertion is FULL equality, not a flushed prefix
    val srcDir = Files.createTempDirectory("graft_asof").toString
    Tables.register(spark, sfDir)
    val ev = spark.table("events")
    ev.coalesce(2).write.mode("overwrite").parquet(srcDir)
    val schema = ev.schema
    val far = new Timestamp(
      ev.agg(max(col("ts"))).head().getTimestamp(0).getTime + 7L * 86400000L)
    def runStream(outer: Boolean, sink: String): DataFrame = {
      val (se, sc) = sides(spark.readStream.schema(schema).parquet(srcDir))
      val asof = if (outer)
        EventStream.asofJoinWithinOuter(se, sc, "e_user", "c_user",
          "e_ts", "c_ts", horizonSeconds = 3600, watermark = "10 minutes",
          payload = Seq("c_id"))
      else
        EventStream.asofJoinWithin(se, sc, "e_user", "c_user",
          "e_ts", "c_ts", horizonSeconds = 3600, watermark = "10 minutes",
          payload = Seq("c_id"))
      val q = asof.select("e_id", "e_ts", "r_c_id")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table(sink).filter(col("e_id") >= 0)
    }
    // the sentinel appends ONCE before the first run (append-mode memory
    // sinks accumulate; both runs re-read the whole dir)
    import spark.implicits._
    Seq((-1L, far, -1L, "error", 0.0), (-2L, far, -1L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("append").parquet(srcDir)

    val (be, bc) = sides(ev)
    val batchInner = EventStream.asofJoinWithin(be, bc, "e_user", "c_user",
      "e_ts", "c_ts", horizonSeconds = 3600, payload = Seq("c_id"))
      .select("e_id", "e_ts", "r_c_id")
    val batchOuter = EventStream.asofJoinWithinOuter(be, bc, "e_user", "c_user",
      "e_ts", "c_ts", horizonSeconds = 3600, payload = Seq("c_id"))
      .select("e_id", "e_ts", "r_c_id")
    assert(batchInner.count() > 0, "inner as-of must be non-vacuous")
    assert(batchOuter.filter(col("r_c_id").isNull).count() > 0,
      "outer as-of must exercise the null branch")
    assert(batchOuter.count() == be.count(),
      "outer as-of keeps exactly one row per left row")
    assertSameRows(batchInner, runStream(outer = false, "asof_inner_out"))
    assertSameRows(batchOuter, runStream(outer = true, "asof_outer_out"))
  }

  test("dropDuplicatesWithinWatermark: late dups at jittered timestamps still drop") {
    // duplicate every event with its ts shifted +5 minutes (an
    // at-least-once replay with clock jitter): id-only keyed state must
    // drop the replica; the ts-keyed streamingDedup would KEEP it
    val dupDir = java.nio.file.Files.createTempDirectory("graft_wmdup").toString
    Tables.register(spark, sfDir)
    val ev = spark.table("events")
    ev.write.mode("overwrite").parquet(dupDir)
    ev.withColumn("ts", col("ts") + expr("INTERVAL 5 MINUTES"))
      .write.mode("append").parquet(dupDir)
    val schema = ev.schema
    val stream = spark.readStream.schema(schema).parquet(dupDir)
    val q = EventStream.streamingDedupWithinWatermark(stream, Seq("event_id"))
      .writeStream.format("memory").queryName("wmdedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wmdedup_out")
        .select("event_id").collect().map(_.getLong(0)).toSet
      val expected = ev.select("event_id").collect().map(_.getLong(0)).toSet
      assert(streamed == expected,
        s"late jittered duplicates must drop: ${streamed.size} vs ${expected.size}")
      // the ts-keyed variant would NOT drop these (distinct (id, ts) pairs)
      val tsKeyed = EventStream.streamingDedup(
        spark.read.parquet(dupDir), Seq("event_id")).count()
      assert(tsKeyed == 2 * expected.size,
        "fixture must actually present distinct (id, ts) duplicates")
      // batch twin on the same duplicated frame: identical key set
      val batch = EventStream.streamingDedupWithinWatermark(
        spark.read.parquet(dupDir), Seq("event_id"))
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(batch == expected)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: null emission on watermark expiry == batch") {
    import java.sql.Timestamp
    def sides(df: DataFrame): (DataFrame, DataFrame) = (
      df.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
          col("ts").as("e_ts")),
      df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts")))
    // private source dir: a sentinel file is appended later to advance the
    // watermark (outer-join null rows only flush when the watermark passes
    // a left row's match window — finite sources never get there alone)
    val srcDir = Files.createTempDirectory("graft_oij").toString
    Tables.register(spark, sfDir)
    val ev = spark.table("events")
    ev.coalesce(2).write.mode("overwrite").parquet(srcDir)
    val schema = ev.schema
    val (se, sc) = sides(spark.readStream.schema(schema).parquet(srcDir))
    val q = EventStream.intervalJoinOuter(se, sc, "e_user", "c_user",
        "e_ts", "c_ts", horizonSeconds = 3600, watermark = "10 minutes")
      .select("e_id", "c_id")
      .writeStream.format("memory").queryName("oij_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinel: one far-future error+click pair (excluded from compare by
      // id) pushes the watermark past every real row's window on BOTH sides
      val far = new Timestamp(
        ev.agg(max(col("ts"))).head().getTimestamp(0).getTime + 7L * 86400000L)
      import spark.implicits._
      Seq((-1L, far, -1L, "error", 0.0), (-2L, far, -1L, "click", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      val streamed = spark.table("oij_out").filter(col("e_id") >= 0)
      val (be, bc) = sides(ev)
      val batch = EventStream.intervalJoinOuter(be, bc, "e_user", "c_user",
        "e_ts", "c_ts", horizonSeconds = 3600).select("e_id", "c_id")
      assert(batch.filter(col("c_id").isNull).count() > 0,
        "unmatched-left rows must be non-vacuous")
      assert(batch.filter(col("c_id").isNotNull).count() > 0,
        "matched rows must be non-vacuous")
      assertSameRows(batch, streamed)
    } finally q.stop()

    // FULL outer: unmatched rows from BOTH sides emit with nulls
    val (se2, sc2) = sides(spark.readStream.schema(schema).parquet(srcDir))
    val q2 = EventStream.intervalJoinOuter(se2, sc2, "e_user", "c_user",
        "e_ts", "c_ts", horizonSeconds = 3600, watermark = "10 minutes",
        joinType = "full_outer")
      .select("e_id", "c_id")
      .writeStream.format("memory").queryName("foij_out")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val streamed = spark.table("foij_out")
        .filter(coalesce(col("e_id"), lit(0L)) >= 0 &&
          coalesce(col("c_id"), lit(0L)) >= 0)
      val (be, bc) = sides(spark.table("events"))
      val batch = EventStream.intervalJoinOuter(be, bc, "e_user", "c_user",
        "e_ts", "c_ts", horizonSeconds = 3600, joinType = "full_outer")
        .select("e_id", "c_id")
      assert(batch.filter(col("e_id").isNull).count() > 0,
        "unmatched-right rows must be non-vacuous")
      assertSameRows(batch, streamed)
    } finally q2.stop()
  }

  test("parquet streaming sink: exactly-once across a restart with new data") {
    val srcDir = Files.createTempDirectory("graft_sink_src").toString
    val outDir = Files.createTempDirectory("graft_sink_out").toString
    val ckDir = Files.createTempDirectory("graft_sink_ck").toString
    Tables.register(spark, sfDir)
    val events = spark.table("events")
      .select("event_id", "user_id", "event_type", "value")
    val half1 = events.filter(col("event_id") % 2 === 0)
    val half2 = events.filter(col("event_id") % 2 === 1)
    half1.coalesce(1).write.mode("append").parquet(srcDir)

    val schema = spark.read.parquet(srcDir).schema
    def drain(): Unit = {
      val q = Sinks.parquetSink(
        spark.readStream.schema(schema).parquet(srcDir)
          .filter(col("value") >= 0).withColumn("v2", col("value") * 2),
        outDir, ckDir, partitionCols = Seq("event_type"))
      q.awaitTermination()
    }
    drain()
    val afterFirst = spark.read.parquet(outDir)
    assert(afterFirst.count() == half1.filter(col("value") >= 0).count())

    // more source data arrives; a restart with the SAME checkpoint must
    // append only the new rows — no duplicates, none lost
    half2.coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    val afterSecond = spark.read.parquet(outDir)
    val expected = events.filter(col("value") >= 0)
    assert(afterSecond.count() == expected.count())
    assert(afterSecond.select("event_id").distinct().count() == expected.count())
    // partition pruning works on the sink layout
    val clicks = spark.read.parquet(outDir).filter(col("event_type") === "click")
    assert(clicks.count() ==
      expected.filter(col("event_type") === "click").count())
  }

  test("streaming upsert sink: micro-batched ingest == one-shot final state") {
    val srcDir = Files.createTempDirectory("graft_upsink_src").toString
    val tblDir = Files.createTempDirectory("graft_upsink_tbl").toString + "/t"
    val ckDir = Files.createTempDirectory("graft_upsink_ck").toString
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
      .withColumn("len_band", floor(col("n_chars") / 100).cast("int"))
      .select("doc_id", "text", "lang", "len_band")
    // wave 1 bootstraps; wave 2 rewrites a third of the SAME keys (upper-
    // cased text — last writer must win) and inserts new ones
    val wave1 = docs
    val wave2 = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("text", upper(col("text")))
      .unionByName(docs.filter(col("doc_id") % 97 === 5)
        .withColumn("doc_id", col("doc_id") + 5000000L))

    val schema = wave1.schema
    def drain(): Unit = {
      val q = Sinks.upsertSink(
        spark.readStream.schema(schema).parquet(srcDir),
        tblDir, ckDir, "len_band", Seq("doc_id"), sortCols = Seq("doc_id"))
      q.awaitTermination()
    }
    wave1.coalesce(1).write.mode("append").parquet(srcDir)
    drain()
    assert(spark.read.parquet(tblDir).count() == wave1.count())
    wave2.coalesce(1).write.mode("append").parquet(srcDir)
    drain() // restart with the same checkpoint: only wave 2 merges

    val expected = wave1
      .join(wave2.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(wave2)
    assertSameRows(
      expected.select("doc_id", "text", "lang", "len_band"),
      spark.read.parquet(tblDir).select("doc_id", "text", "lang", "len_band"))
  }

  test("batch sessionization: sessions partition the events") {
    Tables.register(spark, sfDir)
    val events = spark.table("events")
    val sessions = EventStream.sessionizeBatch(events, gapMinutes = 120)
    assert(sessions.agg(sum("n_events")).head.getLong(0) == events.count())
    assert(sessions.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("streaming incremental dedup: stream-static anti-join == batch twin") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val docsDir = Files.createTempDirectory("graft_incdocs").toString
    docs.filter(col("doc_id") % 2 === 1).coalesce(2)
      .write.mode("overwrite").parquet(docsDir)
    val sNew = spark.readStream
      .schema(spark.read.parquet(docsDir).schema).parquet(docsDir)
    val kept = docs.filter(col("doc_id") % 2 === 0)
      .select(graft.ops.TextOps.fingerprint(col("text")).as("digest"))
    val q = graft.streaming.EventStream.streamingIncrementalDedup(sNew, kept)
      .select("digest")
      .writeStream.format("memory").queryName("inc_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("inc_out").collect().map(_.getString(0)).toSet
      val batch = graft.streaming.EventStream.streamingIncrementalDedup(
          docs.filter(col("doc_id") % 2 === 1), kept)
        .select("digest").collect().map(_.getString(0)).toSet
      assert(streamed == batch, "stream and batch must keep identical digests")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("curation ops run unchanged on a stream: repetition + mixture == batch") {
    // the narrow curation operators (zero-shuffle projections/filters) are
    // streaming-compatible by construction — continuous-ingest curation
    // needs no separate code path
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val docsDir = Files.createTempDirectory("graft_docs").toString
    docs.coalesce(2).write.mode("overwrite").parquet(docsDir)
    val sDocs = spark.readStream
      .schema(spark.read.parquet(docsDir).schema).parquet(docsDir)
    val rates = Map("en" -> 0.5, "zh" -> 1.0)
    val q = graft.ops.Pipeline.mixtureSample(
        graft.ops.TextOps.repetitionStats(sDocs), "doc_id", "doc_id", Map.empty,
        default = 1.0) // identity sample proves the filter runs on streams
      .writeStream.format("memory").queryName("cur_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cur_out")
      val batch = graft.ops.TextOps.repetitionStats(docs)
      assertSameRows(batch, streamed)
    } finally q.stop()
    // and the stratum filter itself on a stream, vs batch
    val q2 = graft.ops.Pipeline.mixtureSample(sDocs, "doc_id", "lang", rates,
        default = 0.0)
      .select("doc_id")
      .writeStream.format("memory").queryName("mix_out")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val streamed = spark.table("mix_out").collect().map(_.getLong(0)).toSet
      val batch = graft.ops.Pipeline.mixtureSample(docs, "doc_id", "lang",
        rates, default = 0.0).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch, "stream and batch must select identical docs")
    } finally q2.stop()
  }

  test("mergeable sketches build on a stream: per-shard HLL == batch shards") {
    // the per-shard sketch stage of Sketches.distinctEstimate runs on a
    // readStream frame in complete mode — continuous ingest keeps the
    // sketch table fresh, and the merge stage stays a batch query over it
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val docsDir = Files.createTempDirectory("graft_docs_hll").toString
    docs.coalesce(2).write.mode("overwrite").parquet(docsDir)
    val sDocs = spark.readStream
      .schema(spark.read.parquet(docsDir).schema).parquet(docsDir)
    val q = graft.ops.Sketches.hllShards(sDocs, "text", col("doc_id") % 4)
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // merged estimates must agree with the batch-shard merge exactly:
      // each (shard) group saw identical input sets
      val streamedEst = graft.ops.Sketches.hllMerge(spark.table("hll_out"))
        .collect()(0).getLong(0)
      val batchEst = graft.ops.Sketches.distinctEstimate(
        docs, "text", col("doc_id") % 4).collect()(0).getLong(0)
      assert(math.abs(streamedEst - batchEst) <= batchEst * 0.02,
        s"$streamedEst vs $batchEst")
    } finally q.stop()
  }

  test("resampleHourlyFF: gaps densify, forward-fill carries the last value") {
    import spark.implicits._
    val ts = (h: Int, m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1: events at 00:xx (two, sum 3.0), 03:xx (one, 7.0) — hours 1,2 gap
    val ev = Seq(
      (1L, ts(0, 10), 1L, "a", 1.0), (2L, ts(0, 50), 1L, "a", 2.0),
      (3L, ts(3, 5), 1L, "a", 7.0),
      (4L, ts(5, 0), 2L, "a", 4.0) // user 2: single hour, no grid expansion
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.streaming.EventStream.resampleHourlyFF(ev)
      .orderBy("user_id", "h").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length == 4, "hours 0..3 inclusive")
    assert(u1.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L), "gap hours have 0 events")
    assert(u1.map(_.getDouble(3)).toSeq == Seq(3.0, 3.0, 3.0, 7.0),
      "forward-fill carries 3.0 across the gap")
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getDouble(3) == 4.0)
  }

  test("behaviorSequences: hand-computed window geometry and ordering") {
    import spark.implicits._
    val ts = (i: Int) => new java.sql.Timestamp(1000L * i)
    // 10 events for user 1, types a..j in time order
    val ev = (0 until 10).map(i =>
      (i.toLong, ts(i), 1L, ('a' + i).toChar.toString)).toDF(
      "event_id", "ts", "user_id", "event_type")
    val w = graft.streaming.EventStream.behaviorSequences(ev, len = 4, stride = 2)
      .orderBy("win_idx").collect()
    // ceil(10/2) = 5 windows; starts 0,2,4,6,8
    assert(w.length == 5)
    assert(w(0).getAs[String]("seq") == "a|b|c|d")
    assert(w(1).getAs[String]("seq") == "c|d|e|f")
    assert(w(4).getAs[String]("seq") == "i|j" && w(4).getAs[Int]("n") == 2)
    // ordering by (ts, event_id): a tie in ts breaks on event_id
    val tie = Seq((2L, ts(0), 7L, "second"), (1L, ts(0), 7L, "first"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val tw = graft.streaming.EventStream.behaviorSequences(tie, len = 4, stride = 4)
      .head().getAs[String]("seq")
    assert(tw == "first|second")
  }

  test("classifier + DSIR scoring run unchanged on a stream == batch") {
    // literal-map scoring ops are narrow zero-shuffle projections —
    // continuous-ingest quality filtering needs no separate code path
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val docsDir = Files.createTempDirectory("graft_score_docs").toString
    docs.coalesce(2).write.mode("overwrite").parquet(docsDir)
    val sDocs = spark.readStream
      .schema(spark.read.parquet(docsDir).schema).parquet(docsDir)
    val w = graft.ops.TextOps.dsirWeights(docs, col("lang") === "en")
    val q = graft.ops.TextOps.dsirScore(
        graft.ops.TextOps.hashedLinearScore(sDocs)
          .withColumnRenamed("n_features", "lc_n")
          .withColumnRenamed("score_num", "lc_score")
          .withColumnRenamed("score", "lc_scaled"), w)
      .select("doc_id", "lc_score", "score_num", "n_features")
      .writeStream.format("memory").queryName("score_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("score_out")
      val batch = graft.ops.TextOps.dsirScore(
          graft.ops.TextOps.hashedLinearScore(docs)
            .withColumnRenamed("n_features", "lc_n")
            .withColumnRenamed("score_num", "lc_score")
            .withColumnRenamed("score", "lc_scaled"), w)
        .select("doc_id", "lc_score", "score_num", "n_features")
      assertSameRows(batch, streamed)
    } finally q.stop()
  }

  test("streaming funnel: emitted funnels == batch funnels on a planted fixture") {
    import spark.implicits._
    val base = 1767225600000L // 2026-01-01T00:00Z
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    // (event_id, ts, user_id, event_type, value) — users cover: full chain,
    // step-2 stall (purchase BEFORE click), no step-1, step-1 only,
    // reverse file order (out-of-order arrival), earliest-min tie shapes
    val planted = Seq(
      (1L, ts(0), 1L, "view", 1.0), (2L, ts(10), 1L, "click", 1.0),
      (3L, ts(20), 1L, "purchase", 1.0),
      (4L, ts(0), 2L, "view", 1.0), (5L, ts(5), 2L, "purchase", 1.0),
      (6L, ts(10), 2L, "click", 1.0),
      (7L, ts(0), 3L, "click", 1.0), (8L, ts(5), 3L, "purchase", 1.0),
      (9L, ts(0), 4L, "view", 1.0),
      (10L, ts(30), 5L, "purchase", 1.0), (11L, ts(20), 5L, "click", 1.0),
      (12L, ts(10), 5L, "view", 1.0),
      (13L, ts(50), 6L, "view", 1.0), (14L, ts(5), 6L, "view", 1.0),
      (15L, ts(8), 6L, "click", 1.0), (16L, ts(6), 6L, "purchase", 1.0),
      // sentinel: advances the watermark past every horizon so all real
      // users' event-time timeouts fire (the sentinel itself never emits)
      (99L, ts(60L * 24 * 10), 999L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_funnel").toString
    planted.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = EventStream.funnelStream(spark, stream, horizonMinutes = 240)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("funnel_out")
        .select("user_id", "t_view", "t_click", "t_purchase", "stage")
      val batch = EventStream.funnelBatch(
          planted.filter(col("user_id") =!= 999L))
        .select("user_id", "t_view", "t_click", "t_purchase", "stage")
      assert(streamed.count() == 5) // users 1,2,4,5,6 (3 never sees a view)
      assertSameRows(batch, streamed)
    } finally q.stop()
  }

  test("batch funnel semantics: stalls, ties, and ordering are exact") {
    import spark.implicits._
    val base = 1767225600000L
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    val planted = Seq(
      (1L, ts(0), 1L, "view", 1.0), (2L, ts(10), 1L, "click", 1.0),
      (3L, ts(20), 1L, "purchase", 1.0),
      // simultaneous click at the view's own timestamp is NOT after it
      (4L, ts(0), 2L, "view", 1.0), (5L, ts(0), 2L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.funnelBatch(planted)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("delta sink: versions per batch, restart without new data adds none") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dsink").toString
    val src = s"$root/src"; val tbl = s"$root/tbl"; val ck = s"$root/ck"
    val b1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "band", "x")
      .withColumn("op", lit("I"))
    val b2 = Seq((1L, "a", 11L)).toDF("k", "band", "x")
      .withColumn("op", lit("U"))
    val schema = b1.schema
    def drain(): Unit = Sinks.deltaSink(
      spark.readStream.schema(schema).parquet(src), tbl, ck,
      "band", Seq("band", "k")).awaitTermination()
    b1.coalesce(1).write.mode("append").parquet(src); drain()
    assert(graft.sources.Sources.listVersions(spark, tbl) == Seq(1L))
    b2.coalesce(1).write.mode("append").parquet(src); drain()
    assert(graft.sources.Sources.listVersions(spark, tbl) == Seq(1L, 2L))
    // restart with the same checkpoint and NO new data: no new version
    drain()
    assert(graft.sources.Sources.listVersions(spark, tbl) == Seq(1L, 2L))
    assertSameRows(
      Seq((1L, "a", 11L), (2L, "b", 20L)).toDF("k", "band", "x"),
      graft.sources.Sources.deltaRead(spark, tbl).select("k", "band", "x"))
    assertSameRows(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "band", "x"),
      graft.sources.Sources.deltaRead(spark, tbl, Some(1L))
        .select("k", "band", "x"))
  }

  test("cohortRetention: closed-form weekly cohort matrix") {
    import spark.implicits._
    val week = 604800L * 1000L
    val base = (1700000000L / 604800L + 1L) * week // a clean week boundary
    def ts(w: Long, off: Long = 1000L) = new java.sql.Timestamp(base + w * week + off)
    // cohort W0: users 1,2,3 (u1 active w0+w1+w2, u2 w0+w2, u3 w0 only);
    // cohort W1: user 4 (active w1 only); duplicate events must not
    // double-count (u1 twice in w0)
    val events = Seq(
      (1L, ts(0)), (1L, ts(0, 2000L)), (1L, ts(1)), (1L, ts(2)),
      (2L, ts(0)), (2L, ts(2)),
      (3L, ts(0)),
      (4L, ts(1)))
      .toDF("user_id", "ts")
    val got = EventStream.cohortRetention(events)
      .orderBy("cohort_week", "week_offset")
      .select(col("week_offset"), col("n_users"), col("retention"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w0 = base / week
    val cohorts = EventStream.cohortRetention(events)
      .select("cohort_week").distinct().as[Long].collect().sorted
    assert(cohorts.sameElements(Array(w0, w0 + 1)))
    assert(got.toSeq == Seq(
      (0L, 3L, 1.0), (1L, 1L, 0.333333), (2L, 2L, 0.666667), // cohort W0
      (0L, 1L, 1.0)))                                        // cohort W1
  }

  // ------------------------------------------------------------- round 14:
  // the bounded-state claims MEASURED, not argued: every watermark-carrying
  // operator streams 10 micro-batches of advancing event time through
  // StateMetrics and must show numRowsTotal PLATEAU (with numRowsRemoved>0
  // — eviction actually observed) far below the total keys inserted.

  test("state metrics: windowed aggregation state plateaus (eviction observed)") {
    val ms = StateMetrics.run(spark, "winagg",
      df => EventStream.windowedTypeCounts(df,
        watermark = "30 minutes", windowLen = "10 minutes"),
      nBatches = 10, rowsPerBatch = 1200, advanceMin = 60)
    // 10 batches x 6 windows x 4 types = 240 groups in total; live state
    // holds only ~(batch span + watermark + one-batch eviction lag)
    val (ok, detail) = StateMetrics.boundedVerdict(ms, plateauCap = 120)
    assert(ok, detail)
  }

  test("state metrics: dropDuplicatesWithinWatermark state plateaus") {
    val ms = StateMetrics.run(spark, "dedup",
      df => EventStream.streamingDedupWithinWatermark(df, Seq("event_id"),
        watermark = "30 minutes"),
      nBatches = 10, rowsPerBatch = 1200, advanceMin = 60)
    // 12,000 unique ids flow through; live dedup state holds ~1 batch +
    // the 30-minute watermark tail + one-batch eviction lag
    val (ok, detail) = StateMetrics.boundedVerdict(ms, plateauCap = 3600)
    assert(ok, detail)
  }

  test("state metrics: stream-stream interval join state plateaus on both sides") {
    val ms = StateMetrics.run(spark, "ivjoin",
      df => EventStream.intervalJoin(
        df.filter(col("event_type") === "view")
          .select(col("event_id").as("l_id"), col("ts").as("l_ts"),
            col("user_id").as("l_user")),
        df.filter(col("event_type") === "click")
          .select(col("event_id").as("r_id"), col("ts").as("r_ts"),
            col("user_id").as("r_user")),
        "l_user", "r_user", "l_ts", "r_ts",
        horizonSeconds = 600, watermark = "30 minutes"),
      nBatches = 10, rowsPerBatch = 1200, advanceMin = 60)
    // 300 rows/side/batch; join state holds horizon+watermark per side
    val (ok, detail) = StateMetrics.boundedVerdict(ms, plateauCap = 2400)
    assert(ok, detail)
  }

  test("state metrics: session-window state plateaus as sessions close") {
    val ms = StateMetrics.run(spark, "sessions",
      df => EventStream.sessionWindowAgg(df,
        gap = "5 minutes", watermark = "30 minutes"),
      nBatches = 10, rowsPerBatch = 1200, advanceMin = 60)
    // recurring users 25 minutes apart with a 5-minute gap: every event is
    // its own session (~1200/batch, 12,000 total); open-session state holds
    // only the un-finalized tail
    val (ok, detail) = StateMetrics.boundedVerdict(ms, plateauCap = 3600)
    assert(ok, detail)
  }

  test("state metrics: funnel flatMapGroupsWithState evicts on event-time timeout") {
    val ms = StateMetrics.run(spark, "funnel",
      df => EventStream.funnelStream(spark, df, horizonMinutes = 90).toDF(),
      nBatches = 10, rowsPerBatch = 1200, advanceMin = 60,
      usersPerBatchUnique = true)
    // 500 fresh users per batch (5,000 total) who go quiet after their
    // batch: the 90-minute event-time timeout must evict them, so live
    // state holds ~2 batches' cohorts
    val (ok, detail) = StateMetrics.boundedVerdict(ms, plateauCap = 2000)
    assert(ok, detail)
  }
}
