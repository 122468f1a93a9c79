package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.substrait.Serializer

/** Format-independence of the substrait surface: the same wire bytes execute
  * against a table regardless of whether the catalog name is backed by
  * parquet, csv, or json (mirrors the reference's CSV-backed test context,
  * tests/roundtrip.rs:294-297).
  */
class SourcesSpec extends SparkTestBase {

  private lazy val dirs: Map[String, String] = {
    Tables.register(spark, sfDir)
    val nation = spark.table("nation")
    Seq("csv", "json", "orc").map { f =>
      val d = Files.createTempDirectory(s"graft_src_$f").toString
      Sources.write(nation, d, f)
      f -> d
    }.toMap
  }

  test("csv/json/orc register → identical rows to the parquet view") {
    val d0 = dirs // materialize fixtures (also registers the parquet views)
    val parquet = spark.table("nation")
    for ((f, d) <- d0) {
      Sources.register(spark, s"nation_$f", d, f,
        if (f == "orc") None else Some(parquet.schema))
      assertSameRows(parquet, spark.table(s"nation_$f"))
    }
  }

  test("substrait round-trip executes against a csv-backed NamedTable") {
    dirs // force registration fixtures
    Sources.register(spark, "nation_csv", dirs("csv"), "csv",
      Some(spark.table("nation").schema))
    val q = spark.sql(
      """SELECT n_regionkey, count(*) AS n FROM nation_csv
        |WHERE n_nationkey > 5 GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    assertRoundtrip(q)
  }

  test("csv/json without a schema are rejected loudly (no silent double scan)") {
    intercept[IllegalArgumentException](
      Sources.read(spark, dirs("csv"), "csv"))
    intercept[IllegalArgumentException](
      Sources.read(spark, "/tmp/nope", "avro", None))
  }

  test("partitioned sink: downstream scan prunes partitions") {
    Tables.register(spark, sfDir)
    val d = Files.createTempDirectory("graft_part").toString
    Sources.write(spark.table("orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus"), d, "parquet",
      partitionBy = Seq("o_orderstatus"))
    val scan = Sources.read(spark, d, "parquet")
      .filter(col("o_orderstatus") === "F")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"), plan)
    assert(scan.count() > 0)
  }
}
