package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.functions.CmsFunctions

/** Count-Min frequency sketches: merged shard sketches must answer like a
  * single corpus-wide sketch (CMS merge is cell-wise addition — EXACT, not
  * bound-based like HLL/KLL), and estimates must respect the CMS guarantee
  * (never undercount; overcount ≤ ε·N at the build parameters).
  */
class CmsSpec extends SparkTestBase {

  private lazy val li = {
    Tables.register(spark, sfDir)
    spark.table("lineitem")
  }

  test("merged shard sketches == single global sketch, key for key") {
    val sharded = Sketches.cmsMerge(
      Sketches.cmsShards(li, "l_suppkey", col("l_orderkey") % 8))
    val global = Sketches.cmsMerge(
      Sketches.cmsShards(li, "l_suppkey", lit(0)))
    val keys = li.select(col("l_suppkey")).distinct()
    val both = keys.select(col("l_suppkey"),
      CmsFunctions.cmsEstimateLong(sharded.scalar(), col("l_suppkey")).as("a"),
      CmsFunctions.cmsEstimateLong(global.scalar(), col("l_suppkey")).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("estimates never undercount and overcount within eps*N") {
    val merged = Sketches.cmsMerge(
      Sketches.cmsShards(li, "l_suppkey", col("l_orderkey") % 8, eps = 1e-4))
    val n = li.count()
    val bad = li.groupBy("l_suppkey").agg(count(lit(1)).as("exact"))
      .select(col("l_suppkey"), col("exact"),
        CmsFunctions.cmsEstimateLong(merged.scalar(), col("l_suppkey")).as("est"))
      .filter(col("est") < col("exact") ||
        col("est") > col("exact") + lit(math.ceil(n * 1e-4).toLong))
    assert(bad.count() == 0, bad.collect().take(5).mkString(", "))
  }

  test("cms merge + probe ride the wire") {
    val merged = Sketches.cmsMerge(
      Sketches.cmsShards(li, "l_suppkey", col("l_orderkey") % 8))
    assertRoundtrip(
      li.groupBy("l_suppkey").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("l_suppkey").asc).limit(5)
        .select(col("l_suppkey"),
          CmsFunctions.cmsEstimateLong(merged.scalar(), col("l_suppkey")).as("est"))
        .orderBy("l_suppkey"), ordered = true)
  }
}
