package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured-Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming surface (SURVEY.md §2.10) — this is the
  * beyond-parity extension the testdata's events stream exists for. The same
  * transformations run on a batch DataFrame or a readStream frame (Spark's
  * unified Dataset API); specs assert streaming output == batch output.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond it is dropped, state evicted); sessionization state is
  * per-active-user and evicted on event-time timeout — both are the standard
  * bounded-state designs for unbounded inputs.
  */
object EventStream {

  /** Tumbling-window per-type aggregation with a late-data watermark.
    * Works identically on batch and streaming frames.
    */
  def windowedTypeCounts(events: DataFrame, watermark: String = "1 hour",
                         windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** SLIDING-window per-type aggregation: each event lands in
    * windowLen/slide overlapping windows (Catalyst's Expand rewrite — the
    * expansion happens below the aggregate, so the exchange carries
    * partially-combined per-window rows, not replicated events). Works
    * identically on batch and streaming frames; on the wire the Expand
    * rides as a union-of-projects SetRel.
    */
  def slidingTypeCounts(events: DataFrame, watermark: String = "1 hour",
                        windowLen: String = "2 hours",
                        slide: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming windowed heavy-hitters: ONE Misra–Gries frequent-items
    * sketch per event-time tumbling window — state is ≤ maxMapSize
    * counters per open window REGARDLESS of key cardinality, the
    * bounded-state "trending keys" query over an unbounded key space
    * (p20's mergeable sketch family, streamed). Works identically on batch
    * and streaming frames (the watermark no-ops on batch); in streaming
    * the sketch buffer lives in the state store and merges across
    * micro-batches. Downstream readers probe the sketch with
    * [[graft.functions.FreqFunctions]] bound accessors under the
    * Misra–Gries contract: lb ≤ true ≤ ub, ub − lb ≤ maxError, and no key
    * with true count > maxError is missed. (The sketch BYTES are merge-
    * order-dependent — the contract certifies bounds, never bit equality.)
    */
  def windowedHeavyHitters(events: DataFrame, keyCol: String = "user_id",
                           watermark: String = "1 hour",
                           windowLen: String = "1 hour",
                           maxMapSize: Int = 64): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.FreqFunctions.freqSketchAggLong(
        col(keyCol).cast("long"), maxMapSize).as("sketch"))
      .select(col("window.start").as("window_start"), col("sketch"))

  /** Gap-based sessionization via Spark's NATIVE `session_window` — the
    * built-in-first counterpart to [[sessionize]]'s custom
    * flatMapGroupsWithState: same session semantics (new session when the
    * gap to the previous event reaches `gap`; window end = last event +
    * gap), but declared, so Catalyst owns the merge (UpdatingSessions in
    * batch, the session state store in streaming) and the watermark evicts
    * state. Works identically on batch and streaming frames (watermark is
    * a no-op on batch). Totals accumulate as DECIMAL — order-independent.
    *
    * Wire-round-trippable since round 8: the producer recognizes the
    * SessionWindowing-rewritten aggregate (session attribute marked with
    * SessionWindow.marker metadata over the struct-projection shape) and
    * ships the sessionization as `ExtSessionWindow` below a plain
    * AggregateRel; the consumer rebuilds the projection with
    * `session_window()`, which re-fires the same analysis and restores the
    * merge semantics (MergingSessions verified in the consumed plan). The
    * e08 driver query round-trips this WHOLE aggregate.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "120 minutes",
                       watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))

  /** Stream-static dimension enrichment + per-(attribute, type) totals: the
    * classic streaming-ETL shape — each event left-joins its dimension row
    * (unmatched keys keep flowing as 'unknown'), then value totals
    * accumulate per (dim attribute, event type). In a streaming query the
    * STATIC side re-resolves every micro-batch, so dimension updates are
    * picked up without restarting the stream; in batch the same plan
    * broadcasts the dim. Totals accumulate as scaled longs (cents) —
    * summation-order-independent, so streaming == batch == oracle exactly.
    * Works identically on batch and streaming frames.
    */
  def enrichedTypeTotals(events: DataFrame, dim: DataFrame,
                         dimKey: String = "user_id",
                         attrCol: String = "segment"): DataFrame =
    events
      .join(broadcast(dim.select(col(dimKey), col(attrCol))), Seq(dimKey), "left")
      .groupBy(coalesce(col(attrCol), lit("unknown")).as(attrCol),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col(attrCol), col("event_type"), col("n_events"),
        round(col("cents").cast("double") / 100, 2).as("total_value"))

  /** Streaming exact dedup: drop events whose id re-appears within the
    * watermark horizon (exactly-once-per-id within the late-data window).
    * State is bounded: ids older than the watermark are evicted. This is the
    * streaming twin of `Dedup.exactDedup` for continuous ingestion.
    */
  def streamingDedup(events: DataFrame, idCols: Seq[String],
                     watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(idCols :+ "ts")

  /** Streaming dedup tolerant of LATE duplicates at DIFFERENT event times:
    * `dropDuplicatesWithinWatermark` keys state on the id columns ONLY (no
    * ts in the key, unlike [[streamingDedup]]), so a duplicate id arriving
    * with a skewed timestamp within the watermark delay still drops, while
    * state for ids older than the watermark is evicted — the production
    * at-least-once-source → exactly-once shape when replays carry jittered
    * timestamps. Spark rejects `dropDuplicatesWithinWatermark` on batch
    * frames outright, so the batch twin dispatches to the semantically
    * equal plain `dropDuplicates(ids)` (specs assert streaming == batch on
    * the key set).
    */
  def streamingDedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                                    watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Streaming incremental dedup against a STATIC kept corpus: the ingest
    * shape — documents arrive as a stream, each batch drops rows whose
    * content digest already exists in the kept table (stream-static
    * left_anti join; the static side is re-scannable per micro-batch, so a
    * growing kept table is picked up on restart), then in-stream duplicates
    * drop via keyed state. Works identically on batch frames (specs assert
    * streaming == batch).
    *
    * Scale shape: only digests join — the static side reduces to a distinct
    * digest projection that Catalyst prunes to one column; with the kept
    * digests written as a parquet table the anti-join build side stays
    * columnar and the stream side never shuffles its payloads.
    */
  /** `watermarkCol`: on an UNBOUNDED stream the in-stream dedup state grows
    * one entry per distinct digest forever; pass the event-time column to
    * bound state to the watermark window (dropDuplicatesWithinWatermark —
    * exact within the window, the standard streaming-dedup contract). Leave
    * None for batch frames or short-lived backfills.
    */
  def streamingIncrementalDedup(newDocs: DataFrame, keptDigests: DataFrame,
                                textCol: String = "text",
                                watermarkCol: Option[String] = None,
                                watermark: String = "24 hours"): DataFrame = {
    val digested = newDocs.withColumn("digest",
      graft.ops.TextOps.fingerprint(col(textCol)))
    val novel = digested
      .join(keptDigests.select(col("digest")).distinct(), Seq("digest"), "left_anti")
    watermarkCol match {
      case Some(c) if novel.isStreaming =>
        novel.withWatermark(c, watermark).dropDuplicatesWithinWatermark("digest")
      case _ => novel.dropDuplicates("digest")
    }
  }

  /** Stream-stream interval join: pair each left event with the right events
    * of the same key whose time falls in [leftTs − horizon, leftTs]. With
    * watermarks on BOTH sides and a two-sided time bound, Spark keeps join
    * state only for the horizon+watermark window — the standard bounded-state
    * stream-stream join. The same call works on batch frames (watermark is a
    * no-op there), so specs can assert streaming == batch.
    *
    * Column names across the two inputs must be disjoint (alias beforehand);
    * `leftKey`/`rightKey` name the equality pair.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   horizonSeconds: Long,
                   watermark: String = "2 hours"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark), expr(
        s"""$leftKey = $rightKey AND
           |$rightTs >= $leftTs - INTERVAL $horizonSeconds SECONDS AND
           |$rightTs <= $leftTs""".stripMargin))

  /** LEFT OUTER stream-stream interval join — the production shape for
    * "events with no match within the window": a left row that the
    * watermark proves can no longer match (event time + horizon below the
    * watermark) is emitted with nulls on the right. Same bounded-state
    * contract as [[intervalJoin]]: the watermark + time-range condition let
    * both sides' state expire, so state is O(horizon · rate), never the
    * stream. In a batch frame the same call is a plain left outer join, so
    * specs assert streaming == batch (the null rows only FLUSH once the
    * watermark advances past a left row's match window — a finite test
    * source needs one later event to push it).
    */
  def intervalJoinOuter(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTs: String, rightTs: String,
                        horizonSeconds: Long,
                        watermark: String = "2 hours",
                        joinType: String = "left_outer"): DataFrame = {
    require(Set("left_outer", "right_outer", "full_outer").contains(joinType),
      s"joinType must be an outer type, got '$joinType' (use intervalJoin for inner)")
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark), expr(
        s"""$leftKey = $rightKey AND
           |$rightTs >= $leftTs - INTERVAL $horizonSeconds SECONDS AND
           |$rightTs <= $leftTs""".stripMargin), joinType)
  }

  /** Streaming AS-OF join within a horizon — AsOfJoin.asofJoinWithin's
    * semantics executable on unbounded streams: for every left row, the
    * LATEST right row with rightTs ∈ [leftTs − horizon, leftTs] on the
    * same key. Left rows with no right row in the horizon DROP (inner
    * as-of; compose from [[intervalJoinOuter]] for the outer variant).
    *
    * Spark has no streaming as-of operator, so this is the canonical
    * two-stage composition: the bounded-state interval join, then a
    * latest-per-left-row event-time aggregate — max over a
    * (rightTs, payload…) struct, deterministic under rightTs ties when
    * the first payload column is unique (put an id first). That is TWO
    * chained stateful operators in one append-mode query (Spark ≥ 3.5
    * watermark propagation): join state is O(horizon·rate) per side, and
    * the aggregate holds only left rows younger than the watermark — a
    * group emits exactly once, when the watermark passes its leftTs (no
    * right row after that can still fall in its horizon). Batch frames run
    * the identical plan (watermarks are no-ops), so the DuckDB oracle and
    * the streaming==batch spec certify the same code path.
    *
    * Column names across the two inputs must be disjoint (alias
    * beforehand); left rows must be unique (the aggregate groups by every
    * left column). Output: left.* ++ prefix+rightTs ++ prefix+payload.
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTs: String, rightTs: String,
                     horizonSeconds: Long,
                     watermark: String = "2 hours",
                     payload: Seq[String] = Seq(),
                     prefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val joined = intervalJoin(left, right, leftKey, rightKey,
      leftTs, rightTs, horizonSeconds, watermark)
      .select(leftCols.map(col) :+
        struct((col(rightTs) +: payload.map(col)): _*).as("__r"): _*)
    joined.groupBy(leftCols.map(col): _*)
      .agg(max(col("__r")).as("__m"))
      .select(leftCols.map(col) ++
        (rightTs +: payload).map(c =>
          col("__m").getField(c).as(prefix + c)): _*)
  }

  /** LEFT OUTER variant of [[asofJoinWithin]]: every left row survives —
    * with its latest in-horizon right row, or all-null right columns when
    * none exists. The outer interval join emits a null-right row only once
    * the watermark proves no match can arrive, so the downstream latest
    * aggregate sees either real matches or that single null row; the
    * match struct is null for the null row (`when(rightTs IS NOT NULL)` —
    * a bare struct of nulls would be a non-null MAX candidate) and max
    * ignores nulls, so unmatched rows emit null payload columns. Same
    * bounded-state contract and batch-twin property as the inner form.
    */
  def asofJoinWithinOuter(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          horizonSeconds: Long,
                          watermark: String = "2 hours",
                          payload: Seq[String] = Seq(),
                          prefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val joined = intervalJoinOuter(left, right, leftKey, rightKey,
      leftTs, rightTs, horizonSeconds, watermark)
      .select(leftCols.map(col) :+
        when(col(rightTs).isNotNull,
          struct((col(rightTs) +: payload.map(col)): _*)).as("__r"): _*)
    joined.groupBy(leftCols.map(col): _*)
      .agg(max(col("__r")).as("__m"))
      .select(leftCols.map(col) ++
        (rightTs +: payload).map(c =>
          col("__m").getField(c).as(prefix + c)): _*)
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionAgg(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long,
                              total_value: Double)
  /** internal per-user state (public: the state Encoder codegen constructs it) */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Streaming sessionization: per-user sessions closed after `gapMinutes` of
    * event-time silence, via flatMapGroupsWithState with event-time timeout.
    * Emits a session when (a) a new event arrives after the gap, or (b) the
    * watermark passes last+gap (timeout fires). State per active user only.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int): Dataset[SessionAgg] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    // local (not object members): the state closure ships to executors and
    // must not capture the enclosing module. Timestamp ↔ microseconds —
    // getTime is millis-only; the events table carries microsecond precision.
    val toMicros: Timestamp => Long =
      t => t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val fromMicros: Long => Timestamp = us => {
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessionState]): Iterator[SessionAgg] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
      if (state.hasTimedOut) {
        val s = state.get
        out += SessionAgg(userId, fromMicros(s.start), fromMicros(s.last),
          s.n, s.total)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
        var cur = state.getOption.orNull
        sorted.foreach { e =>
          val t = toMicros(e.ts)
          if (cur == null) cur = SessionState(t, t, 1, e.value)
          else if (t - cur.last > gapUs) {
            out += SessionAgg(userId, fromMicros(cur.start),
              fromMicros(cur.last), cur.n, cur.total)
            cur = SessionState(t, t, 1, e.value)
          } else cur = SessionState(cur.start, math.max(cur.last, t),
            cur.n + 1, cur.total + e.value)
        }
        if (cur != null) {
          state.update(cur)
          // GroupState timeouts are millisecond-granular; round up so the
          // timeout never fires before the true gap elapses
          state.setTimeoutTimestamp(Math.floorDiv(cur.last + gapUs + 999L, 1000L))
        }
      }
      out.iterator
    }

    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Batch sessionization oracle: identical gap semantics via lag + running
    * sum of session-boundary flags — SQL-expressible in any engine.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val upTo = byUser.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      // NTZ→LTZ→long: TIMESTAMP_NTZ has no direct numeric cast; with the
      // session pinned to UTC the hop is value-preserving
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("timestamp").cast("long") -
            col("prev_ts").cast("timestamp").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum("new_session").over(upTo))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("total_value"))
      .drop("session_no")
  }

  /** Hourly resample with forward-fill: each key's event stream becomes a
    * DENSE hourly series over its own [first, last] hour — missing hours
    * materialize from a per-key `sequence` generator (no driver-side
    * calendar), `n_events` 0 marks the gaps, and the value forward-fills
    * with an IGNORE NULLS running last (one window over the same key
    * shuffle the grid join used). Hour sums accumulate as DECIMAL so the
    * series is summation-order-independent. The gap-fill/resample step
    * every downstream time-series model assumes already happened.
    */
  def resampleHourlyFF(events: DataFrame, keyCol: String = "user_id",
                       tsCol: String = "ts",
                       valCol: String = "value"): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(sum(col(valCol).cast(DecimalType(18, 4))).cast(DoubleType).as("v"),
        count(lit(1)).as("n_events"))
    val grid = hourly.groupBy(col(keyCol))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col(keyCol),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(keyCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "h"), "left")
      .select(col(keyCol), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(last(col("v"), ignoreNulls = true).over(w), 4).as("v_ff"))
  }

  /** Behavior-sequence training windows: each user's event-type stream,
    * ordered by (ts, event_id), sliced into overlapping windows of
    * `len` events at `stride` — the sequence-model training-example
    * builder (next-action prediction, session embeddings). One groupBy
    * shuffle per user; windows stream out of a generator, partial tail
    * windows included (the final context a model still trains on).
    * Output: (user_id, win_idx, seq "a|b|…", n).
    */
  def behaviorSequences(events: DataFrame, len: Int = 8,
                        stride: Int = 4): DataFrame = {
    require(len > 0 && stride > 0, "len and stride must be positive")
    events
      .groupBy("user_id")
      .agg(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type")).as("seq"))
      .select(col("user_id"),
        explode(transform(
          sequence(lit(0),
            ceil(size(col("seq")).cast("double") / stride).cast("int") - 1),
          i => struct(i.as("win_idx"),
            concat_ws("|", slice(col("seq"), i * stride + 1, lit(len))).as("seq"),
            size(slice(col("seq"), i * stride + 1, lit(len))).as("n")))).as("w"))
      .select(col("user_id"), col("w.win_idx"), col("w.seq"), col("w.n"))
  }

  /** Weekly cohort-retention matrix — the other canonical product/
    * curation analytics shape beside the funnel: users bucket into the
    * week of their FIRST event (the cohort), and each later activity week
    * counts them at `week_offset = week - cohort_week`; `retention` is
    * that count over the cohort's size (its offset-0 count, which every
    * member has by construction). Weeks are `floor(epoch/604800)` —
    * engine-neutral integer arithmetic, no calendar-week convention to
    * disagree on.
    *
    * Scale shape: two partial-aggregating shuffles over narrow (user,
    * week) pairs — the distinct-activity set on (user, week), the cohort
    * min on user (which then hash-joins the activity side on that same
    * user key; small-dim cohorts broadcast) — then one tiny
    * (cohort, offset) aggregate and a per-cohort window over at most a
    * few hundred offset rows. Event payloads never shuffle.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val wk = events.select(col(userCol).as("user_id"),
      floor(unix_timestamp(col(tsCol)) / 604800L).cast("long").as("w"))
    val cohort = wk.groupBy("user_id").agg(min("w").as("c0"))
    val act = wk.distinct()
    val counts = act.join(cohort, "user_id")
      .groupBy(col("c0").as("cohort_week"),
        (col("w") - col("c0")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val w0 = Window.partitionBy("cohort_week").orderBy("week_offset")
    counts.withColumn("retention",
      round(col("n_users").cast("double") /
        first(col("n_users")).over(w0), 6))
  }

  /** Ordered-funnel analysis (batch twin): per user, the earliest
    * strictly-increasing chain of step timestamps — t(step1) = first step1
    * event, t(stepN) = first stepN event AFTER t(stepN−1) — and the funnel
    * stage reached. The standard product-analytics conversion query, and a
    * common curation query over interaction logs.
    *
    * Scale shape: every step's min is a window aggregate over the SAME
    * `partitionBy(user)` (no orderBy), and the final per-user collapse
    * groups by the same key — Catalyst reuses ONE exchange for all of it;
    * events shuffle once regardless of the number of steps. Only users who
    * reached step 1 emit a row (stage ≥ 1).
    */
  def funnelBatch(events: DataFrame,
                  steps: Seq[String] = Seq("view", "click", "purchase"),
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2 && steps.distinct.size == steps.size,
      s"funnel needs >= 2 distinct steps, got $steps")
    val w = Window.partitionBy(userCol)
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    steps.zipWithIndex.foreach { case (st, i) =>
      val cond =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(tsCol) > col(s"t_${steps(i - 1)}")
      df = df.withColumn(s"t_$st", min(when(cond, col(tsCol))).over(w))
    }
    df.groupBy(col(userCol))
      .agg(min(col(s"t_${steps.head}")).as(s"t_${steps.head}"),
        steps.tail.map(st => min(col(s"t_$st")).as(s"t_$st")): _*)
      .withColumn("stage",
        steps.map(st => when(col(s"t_$st").isNotNull, 1L).otherwise(0L))
          .reduce(_ + _))
      .filter(col(s"t_${steps.head}").isNotNull)
  }

  final case class FunnelAgg(user_id: Long, t_view: Option[Timestamp],
                             t_click: Option[Timestamp],
                             t_purchase: Option[Timestamp], stage: Long)
  /** internal per-user state: buffered (micros, stepIdx) step events —
    * bounded by the horizon (state evicts on event-time timeout) */
  final case class FunnelState(events: List[(Long, Int)])

  /** Streaming funnel over the fixed view→click→purchase steps: per-user
    * step events BUFFER in state (out-of-order arrivals within the horizon
    * reorder correctly — an incremental min-chain would lock in wrong
    * chains), and the funnel is computed and emitted once the user goes
    * quiet for `horizonMinutes` of event time (event-time timeout). State
    * is bounded: only step events within an active horizon, evicted on
    * emit. EventStreamSpec asserts emitted funnels ⊆ the batch ground
    * truth, the sessionize contract.
    */
  def funnelStream(spark: SparkSession, events: DataFrame,
                   horizonMinutes: Int = 240): Dataset[FunnelAgg] = {
    import spark.implicits._
    val steps = Seq("view", "click", "purchase")
    val horizonUs = horizonMinutes * 60L * 1000000L
    val toMicros: Timestamp => Long =
      t => t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val fromMicros: Long => Timestamp = us => {
      val t = new Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val stepIdx = steps.zipWithIndex.toMap

    def chain(evs: List[(Long, Int)]): (Array[Option[Long]], Long) = {
      val sorted = evs.sortBy(identity)
      val ts = Array.fill[Option[Long]](steps.size)(None)
      sorted.foreach { case (t, si) =>
        if (si == 0) { if (ts(0).isEmpty) ts(0) = Some(t) }
        else if (ts(si).isEmpty && ts(si - 1).exists(_ < t)) ts(si) = Some(t)
      }
      (ts, ts.count(_.isDefined).toLong)
    }

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[FunnelState]): Iterator[FunnelAgg] = {
      if (state.hasTimedOut) {
        val (ts, stage) = chain(state.get.events)
        state.remove()
        if (stage >= 1)
          Iterator.single(FunnelAgg(userId, ts(0).map(fromMicros),
            ts(1).map(fromMicros), ts(2).map(fromMicros), stage))
        else Iterator.empty
      } else {
        val fresh = rows.filter(e => stepIdx.contains(e.event_type))
          .map(e => (toMicros(e.ts), stepIdx(e.event_type))).toList
        val all = state.getOption.map(_.events).getOrElse(Nil) ::: fresh
        if (all.nonEmpty) {
          state.update(FunnelState(all))
          val last = all.map(_._1).max
          state.setTimeoutTimestamp(
            Math.floorDiv(last + horizonUs + 999L, 1000L))
        }
        Iterator.empty
      }
    }

    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", s"$horizonMinutes minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
