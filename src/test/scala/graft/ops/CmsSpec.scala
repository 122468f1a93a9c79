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

  test("inner product: never undercounts, overcount within the formal bound") {
    // two sides with known per-key frequencies → exact inner product
    val a = li.select(col("l_suppkey").as("k"))
    val b = li.filter(col("l_orderkey") % 2 === 0).select(col("l_suppkey").as("k"))
    val exact = a.groupBy("k").agg(count(lit(1)).as("ca"))
      .join(b.groupBy("k").agg(count(lit(1)).as("cb")), "k")
      .agg(sum(col("ca") * col("cb"))).collect()(0).getLong(0)
    val est = Sketches.joinSizeEstimate(a, "k", b, "k")
      .collect()(0).getLong(0)
    val na = a.count(); val nb = b.count()
    assert(est >= exact, s"inner product undercounted: $est < $exact")
    assert(est <= exact + math.ceil(1e-4 * na * nb).toLong,
      s"overcount beyond bound: $est vs $exact (+${math.ceil(1e-4 * na * nb)})")
  }

  test("inner product with itself is the exact-bounded F2 self-join size") {
    val exactF2 = li.groupBy("l_suppkey").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
    val est = Sketches.joinSizeEstimate(li, "l_suppkey", li, "l_suppkey")
      .collect()(0).getLong(0)
    val n = li.count()
    assert(est >= exactF2 && est <= exactF2 + math.ceil(1e-4 * n * n).toLong,
      s"F2 estimate $est outside [$exactF2, +${math.ceil(1e-4 * n * n)}]")
  }

  test("inner product rejects sketches built with different parameters") {
    def sk(eps: Double) =
      li.agg(expr(s"count_min_sketch(cast(l_suppkey as bigint), ${eps}d, " +
        "0.999d, 42)").as("cms"))
    val e = intercept[Exception] {
      sk(1e-4).select(CmsFunctions.cmsInnerProduct(
        col("cms"), sk(1e-3).scalar())).collect()
    }
    assert(e.getMessage.contains("cannot combine") ||
      Option(e.getCause).exists(_.getMessage.contains("cannot combine")), e.getMessage)
  }

  test("inner product rides the wire") {
    assertRoundtrip(
      Sketches.joinSizeEstimate(li, "l_orderkey",
        spark.table("orders"), "o_orderkey"), ordered = true)
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
