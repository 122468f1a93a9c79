package graft.substrait

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** First end-to-end slice (SURVEY.md §7.2 step 1): scan + projection round-trip
  * over the driver parquet, then each operator family.
  */
class SmokeSpec extends SparkTestBase {

  test("scan + projection round-trips") {
    Tables.register(spark, sfDir)
    val df = spark.table("lineitem").select("l_orderkey", "l_extendedprice")
    assertRoundtrip(df)
  }

  test("filter with literals and binary ops") {
    Tables.register(spark, sfDir)
    val df = spark.table("lineitem")
      .filter(col("l_discount") > 0.05 && col("l_quantity") < 30.0)
      .select("l_orderkey", "l_quantity", "l_discount")
    assertRoundtrip(df)
  }

  test("sort + limit + offset") {
    Tables.register(spark, sfDir)
    val df = spark.table("orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .offset(5).limit(10)
      .select("o_orderkey", "o_totalprice")
    assertRoundtrip(df)
  }

  test("aggregate with group by") {
    Tables.register(spark, sfDir)
    val df = spark.table("lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"),
           count(lit(1)).as("n"),
           max("l_extendedprice").as("max_price"))
    assertRoundtrip(df)
  }

  test("inner equi-join") {
    Tables.register(spark, sfDir)
    val o = spark.table("orders"); val c = spark.table("customer")
    val df = o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select("o_orderkey", "c_name")
    assertRoundtrip(df)
  }

  test("case when") {
    Tables.register(spark, sfDir)
    val df = spark.table("lineitem").select(
      col("l_orderkey"),
      when(col("l_returnflag") === "A", lit(1))
        .when(col("l_returnflag") === "R", lit(2))
        .otherwise(lit(0)).as("flag_code"))
    assertRoundtrip(df)
  }

  test("sql query round-trips") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
        |FROM lineitem WHERE l_discount > 0.02 GROUP BY l_returnflag""".stripMargin)
    assertRoundtrip(df)
  }
}
