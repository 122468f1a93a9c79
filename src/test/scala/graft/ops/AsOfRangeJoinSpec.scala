package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** AsOfJoin / RangeJoin vs their naive (join-explosion) formulations —
  * the optimized operators must return the exact same rows.
  */
class AsOfRangeJoinSpec extends SparkTestBase {

  private def events = {
    Tables.register(spark, sfDir)
    spark.table("events").withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  test("asofJoin == naive join + row_number pick of latest preceding") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")

    val fast = AsOfJoin.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
      payload = Seq("event_id", "value"), prefix = "p_")

    val p = purchases.select(col("user_id").as("pu"), col("ts").as("p_ts"),
      col("event_id").as("p_event_id"), col("value").as("p_value"))
    val w = Window.partitionBy("event_id")
      .orderBy(col("p_ts").desc_nulls_last, col("p_event_id").desc_nulls_last)
    val naive = clicks
      .join(p, col("user_id") === col("pu") && col("ts") >= col("p_ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "ts", "p_ts", "p_event_id", "p_value")

    assertSameRows(naive, fast)
    // left-outer completeness: every click appears exactly once
    assert(fast.count() == clicks.count())
  }

  test("asofJoin matches a right row at exactly the left timestamp (inclusive)") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 5L)).toDF("k", "t")
    val r = Seq((1L, 10L, "at10"), (1L, 4L, "at4"), (1L, 11L, "at11"))
      .toDF("k", "t", "tag")
    val out = AsOfJoin.asofJoin(l, r, Seq("k"), "t", "t", Seq("tag"))
      .orderBy("t").collect()
    assert(out.map(_.getAs[String]("r_tag")).toSeq == Seq("at4", "at10"))
  }

  test("asofJoin: a right row with a NULL time never matches (ASOF semantics)") {
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, Option.empty[Long], "nullt"), (2L, Some(5L), "at5"))
      .toDF("k", "t", "tag")
    val out = AsOfJoin.asofJoin(l, r, Seq("k"), "t", "t", Seq("tag"))
      .orderBy("k").collect()
    // k=1's only right row has NULL time → no match; k=2 matches at5
    assert(out.map(_.getAs[String]("r_tag")).toSeq == Seq(null, "at5"))
    assert(out.map(r => Option(r.getAs[Any]("r_t"))).toSeq ==
      Seq(None, Some(5L)))
  }

  test("pointInInterval == plain inequality join, across bin widths") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        unix_micros(col("ts").cast("timestamp_ltz")).as("pt"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_id"),
        (unix_micros(col("ts").cast("timestamp_ltz")) - 3600000000L).as("lo"),
        unix_micros(col("ts").cast("timestamp_ltz")).as("hi"))

    val naive = clicks.join(errors, Seq("user_id"))
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("user_id", "c_id", "e_id")

    for (w <- Seq(600000000L, 3600000000L, 7200000000L)) {
      val fast = RangeJoin.pointInInterval(
          clicks, errors, Seq("user_id"), "pt", "lo", "hi", binWidth = w)
        .select("user_id", "c_id", "e_id")
      assertSameRows(naive, fast)
    }
  }

  test("pointInInterval handles negative values (floor binning)") {
    import spark.implicits._
    val pts = Seq(-5L, -1L, 0L, 3L).toDF("pt").withColumn("k", lit(1))
    val ivs = Seq((-6L, -2L, "a"), (-1L, 4L, "b")).toDF("lo", "hi", "tag")
      .withColumn("k", lit(1))
    val got = RangeJoin.pointInInterval(pts, ivs, Seq("k"), "pt", "lo", "hi", 4L)
      .select("pt", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((-5L, "a"), (-1L, "b"), (0L, "b"), (3L, "b")))
  }

  test("asofJoinWithin: stale matches null out, fresh ones survive (numeric times)") {
    import spark.implicits._
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val r = Seq((1L, 95L, "fresh_for_100"), (1L, 90L, "older")).toDF("k", "t", "tag")
    val out = AsOfJoin.asofJoinWithin(l, r, Seq("k"), "t", "t", Seq("tag"),
      maxAgeSeconds = 10L).orderBy("t").collect()
    // t=100 matches t=95 (age 5 ≤ 10); t=200's best match (95) is 105 old → nulled
    assert(out(0).getAs[String]("r_tag") == "fresh_for_100")
    assert(out(1).isNullAt(out(1).fieldIndex("r_tag")) &&
      out(1).isNullAt(out(1).fieldIndex("r_t")))
    // rows are never dropped — left-outer semantics survive the bound
    assert(out.length == 2)
  }

  test("intervalOverlapJoin == plain inequality join, across bin widths") {
    val us = (c: org.apache.spark.sql.Column) =>
      unix_micros(c.cast("timestamp_ltz"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        (us(col("ts")) - 1800000000L).as("p_lo"), us(col("ts")).as("p_hi"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_id"),
        (us(col("ts")) - 2700000000L).as("e_lo"), us(col("ts")).as("e_hi"))

    val naive = purchases.join(errors, Seq("user_id"))
      .filter(col("p_lo") <= col("e_hi") && col("e_lo") <= col("p_hi"))
      .select("user_id", "p_id", "e_id")

    for (w <- Seq(600000000L, 1800000000L, 7200000000L)) {
      val fast = RangeJoin.intervalOverlapJoin(purchases, errors,
          Seq("user_id"), "p_lo", "p_hi", "e_lo", "e_hi", binWidth = w)
        .select("user_id", "p_id", "e_id")
      assertSameRows(naive, fast)
      // exactly-once: no dedup pass exists, so duplicates would survive
      assert(fast.count() ==
        fast.select("user_id", "p_id", "e_id").distinct().count())
    }
  }

  test("intervalOverlapJoin: touching endpoints match, disjoint do not") {
    import spark.implicits._
    val l = Seq((0L, 10L, "l1"), (20L, 30L, "l2")).toDF("a", "b", "ltag")
      .withColumn("k", lit(1))
    val r = Seq((10L, 15L, "r1"), (16L, 19L, "r2"), (-5L, -1L, "r3"))
      .toDF("c", "d", "rtag").withColumn("k", lit(1))
    val got = RangeJoin.intervalOverlapJoin(l, r, Seq("k"), "a", "b", "c", "d", 7L)
      .select("ltag", "rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    // l1 [0,10] touches r1 [10,15] at 10 → match; nothing else overlaps
    assert(got == Set(("l1", "r1")))
  }

  test("intervalOverlapJoin handles negative bounds and containment") {
    import spark.implicits._
    val l = Seq((-10L, 10L, "wide")).toDF("a", "b", "ltag")
      .withColumn("k", lit(1))
    val r = Seq((-3L, -2L, "inner1"), (-12L, -10L, "edge"), (11L, 12L, "out"))
      .toDF("c", "d", "rtag").withColumn("k", lit(1))
    val got = RangeJoin.intervalOverlapJoin(l, r, Seq("k"), "a", "b", "c", "d", 4L)
      .select("rtag").collect().map(_.getString(0)).toSet
    assert(got == Set("inner1", "edge"))
  }
}
