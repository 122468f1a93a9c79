package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** TopKByKey (the sort-free grouped top-k that replaced the kNN
  * row_number window, opt round 15) must be BIT-equal to the window it
  * replaced — (key DESC NULLS LAST, id ASC), Spark's total double order
  * (NaN greatest, NaN = NaN, -0.0 = 0.0 with the tie falling to id ASC —
  * SQLOrderingUtil's `x == y` primitive check fires before the bit
  * compare, so signed zeros are EQUAL, same as the window's sort) — on
  * tie-heavy and degenerate inputs, under partial/final merge
  * (multi-partition input). k <= 4 exercises the declarative kernel;
  * k = 16/64 the loop-based imperative twin (opt round 16). */
class TopKSpec extends SparkTestBase {

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy("g")
    .agg(TopKFunctions.topkByKey(col("key"), col("id"), k).as("top"))
    .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
    .filter(col("t").getField("id").isNotNull)
    .select(col("g"), col("t").getField("id").as("id"),
      (col("pos") + 1).cast("int").as("rank"),
      col("t").getField("key").as("key"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("key").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("g", "id", "rank", "key")
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val a = viaAgg(df, k).collect().map(_.toString).sorted
    val b = viaWindow(df, k).collect().map(_.toString).sorted
    assert(a.sameElements(b),
      s"agg top-$k != window top-$k:\n  agg=${a.mkString("; ")}" +
        s"\n  win=${b.mkString("; ")}")
  }

  test("tie-heavy keys, many groups, multi-partition merge, k 1..4") {
    import spark.implicits._
    // keys drawn from 4 values -> heavy ties broken only by id; 8
    // partitions force real partial/final merges
    val df = (0 until 4000)
      .map(i => (i % 37L, (i * 2654435761L) % 1000, (i % 4).toDouble / 2.0))
      .toDF("g", "id", "key").repartition(8)
    for (k <- 1 to 4) assertSame(df, k)
  }

  test("loop twin (k > 4): tie-heavy multi-partition merge at k = 16 and 64") {
    import spark.implicits._
    // ~108 rows per group with only 6 distinct keys: k = 16 truncates
    // mid-tie-run, k = 64 leaves some groups shorter than k (dense ranks)
    val df = (0 until 4000)
      .map(i => (i % 37L, (i * 2654435761L) % 1000, (i % 6).toDouble / 2.0))
      .toDF("g", "id", "key").repartition(8)
    for (k <- Seq(5, 16, 64)) assertSame(df, k)
  }

  test("loop twin: NaN/infinities/signed zero/null keys at k = 16") {
    import spark.implicits._
    val special = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0, 1.5, -1.5)
    val rows = for (g <- 0L until 3L; (v, i) <- special.zipWithIndex)
      yield (g, i.toLong + 10 * g, v)
    val withNulls = rows.toDF("g", "id", "key")
      .unionByName(Seq((0L, 100L), (1L, 101L)).toDF("g", "id")
        .withColumn("key", lit(null).cast("double")))
      .repartition(5)
    assertSame(withNulls, 16)
  }

  test("loop twin rides the wire (roundtrip equals direct, k = 8)") {
    import spark.implicits._
    val df = (0 until 300)
      .map(i => (i % 7L, i.toLong, (i % 5).toDouble)).toDF("g", "id", "key")
    val direct = viaAgg(df, 8)
    val rt = graft.substrait.Serializer.roundtrip(spark, direct)
    val a = direct.collect().map(_.toString).sorted
    val b = rt.collect().map(_.toString).sorted
    assert(a.sameElements(b), "wire roundtrip of topk_by_key_loop diverged")
  }

  test("NaN, infinities, signed zero, null keys follow the window's total " +
    "order (NaN greatest, nulls last, -0.0 < 0.0)") {
    import spark.implicits._
    val special = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0, 1.5, -1.5)
    val rows = for (g <- 0L until 3L; (v, i) <- special.zipWithIndex)
      yield (g, i.toLong + 10 * g, v)
    val withNulls = rows.toDF("g", "id", "key")
      .unionByName(Seq((0L, 100L), (1L, 101L)).toDF("g", "id")
        .withColumn("key", lit(null).cast("double")))
      .repartition(5)
    for (k <- Seq(2, 4)) assertSame(withNulls, k)
  }

  test("groups smaller than k emit exactly their rows, ranks dense from 1") {
    import spark.implicits._
    val df = Seq((1L, 7L, 0.5), (1L, 3L, 0.5), (2L, 9L, Double.NaN))
      .toDF("g", "id", "key").repartition(3)
    assertSame(df, 4)
  }

  test("topk_by_key rides the wire (roundtrip equals direct)") {
    import spark.implicits._
    val df = (0 until 300)
      .map(i => (i % 7L, i.toLong, (i % 5).toDouble)).toDF("g", "id", "key")
    val direct = viaAgg(df, 3)
    val rt = graft.substrait.Serializer.roundtrip(spark, direct)
    val a = direct.collect().map(_.toString).sorted
    val b = rt.collect().map(_.toString).sorted
    assert(a.sameElements(b), "wire roundtrip of topk_by_key diverged")
  }
}
