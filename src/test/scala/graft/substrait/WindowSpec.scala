package graft.substrait

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Window-function round-trips — beyond the reference's subset (SURVEY.md
  * §2.8: reference has none), encoded as substrait Expression.WindowFunction
  * inside a ProjectRel.
  */
class WindowFnSpec extends SparkTestBase {

  private def li = { Tables.register(spark, sfDir); spark.table("lineitem") }
  private def ev = { Tables.register(spark, sfDir); spark.table("events") }

  test("row_number over partition/order") {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"), col("l_orderkey"))
    assertRoundtrip(li.select(col("l_orderkey"), col("l_suppkey"),
      row_number().over(w).as("rn")))
  }

  test("rank and dense_rank") {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").desc)
    assertRoundtrip(li.select(col("l_orderkey"),
      rank().over(w).as("rk"), dense_rank().over(w).as("drk")))
  }

  test("running sum with rows frame") {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assertRoundtrip(li.select(col("l_orderkey"), col("l_suppkey"),
      sum(col("l_quantity")).over(w).as("running_qty")))
  }

  test("sliding average with bounded rows frame") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, 0)
    assertRoundtrip(ev.select(col("event_id"), col("user_id"),
      avg(col("value")).over(w).as("avg3")))
  }

  test("RANGE frame: unbounded-preceding to current peers") {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    assertRoundtrip(li.select(col("l_orderkey"), col("l_suppkey"),
      col("l_quantity"), sum(col("l_extendedprice")).over(w).as("cum_price")))
  }

  test("RANGE frame with VALUE bounds (quantity within 5 below)") {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
      .rangeBetween(-5, 0)
    assertRoundtrip(li.select(col("l_orderkey"), col("l_suppkey"),
      col("l_quantity"), count(lit(1)).over(w).as("n_near")))
  }

  test("lag and lead with defaults") {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    assertRoundtrip(ev.select(col("event_id"), col("user_id"),
      lag(col("value"), 1).over(w).as("prev_v"),
      lead(col("value"), 2, -1.0).over(w).as("next2_v")))
  }

  test("ntile") {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    assertRoundtrip(li.select(col("l_orderkey"),
      ntile(4).over(w).as("quartile")))
  }

  test("first_value, last_value and nth_value (incl. IGNORE NULLS)") {
    li
    assertRoundtrip(spark.sql(
      """SELECT l_orderkey, l_linenumber,
        |  first_value(l_quantity) OVER w AS fv,
        |  last_value(l_quantity) OVER w AS lv,
        |  nth_value(l_quantity, 2) OVER w AS nv,
        |  first_value(nullif(l_tax, 0.0)) IGNORE NULLS OVER
        |    (PARTITION BY l_orderkey ORDER BY l_linenumber) AS fv_in
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin))
  }

  test("sql window round-trips") {
    Tables.register(spark, sfDir)
    assertRoundtrip(spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_total
        |FROM orders""".stripMargin))
  }
}
