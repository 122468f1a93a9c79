package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}
import graft.ops.Similarity

class VecExpressionsSpec extends SparkTestBase {

  private def embs = {
    Tables.register(spark, sfDir)
    spark.table("embeddings").select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
  }

  test("vec_dot / vec_cosine are bit-identical to the HOF reference") {
    val e = embs.limit(50)
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val cmp = pairs.select(
      Similarity.dot(col("va"), col("vb")).as("dot_gen"),
      Similarity.dotHof(col("va"), col("vb")).as("dot_hof"),
      Similarity.cosine(col("va"), col("vb")).as("cos_gen"),
      Similarity.cosineHof(col("va"), col("vb")).as("cos_hof"))
    val bad = cmp.filter(col("dot_gen") =!= col("dot_hof") ||
      col("cos_gen") =!= col("cos_hof")).count()
    assert(bad == 0, "codegen kernels must be bit-identical to the HOF folds")
  }

  test("kernels run inside whole-stage codegen") {
    val df = embs.limit(5).select(Similarity.cosine(col("v"), col("v")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vec_cosine"), plan.take(500))
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("lsh_buckets kernel is bit-identical to the composed when/vec_dot form") {
    // the composed reference inlines tables×planes dot loops (the shape the
    // kernel replaced for JIT-size reasons) — every bucket must agree on
    // several (tables, planes) shapes incl. d05's production 6×13
    for ((t, p) <- Seq((6, 6), (6, 13), (16, 3))) {
      val cmp = embs.select(
        Similarity.lshBucketArray(col("v"), t, p, 64).as("kernel"),
        Similarity.lshBucketArrayComposed(col("v"), t, p, 64).as("composed"))
      val bad = cmp.filter(col("kernel") =!= col("composed")).count()
      assert(bad == 0, s"kernel diverged from composed form at tables=$t planes=$p")
    }
    // codegen + wire: the kernel round-trips by name with its literal shape
    val df = embs.limit(20).select(col("vec_id"),
      Similarity.lshBucketArray(col("v"), 4, 5, 64).as("b"))
    assert(df.queryExecution.executedPlan.toString.contains("lsh_buckets"))
    assertRoundtrip(df)
    // non-literal shape rejects loudly
    val e = intercept[Exception] {
      spark.sql("SELECT lsh_buckets(array(1.0d), 2, CAST(rand()*2 AS INT), 4)")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("null and length-mismatch behavior") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0, 1.0)))).toDF("x", "y")
    val r = df.select(VecFunctions.vecDot(col("x"), col("y")).as("d")).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
    val short = Seq((Seq(1.0, 2.0, 3.0), Seq(2.0))).toDF("x", "y")
      .select(VecFunctions.vecDot(col("x"), col("y"))).head.getDouble(0)
    assert(short == 2.0) // min-length semantics, same as zip_with
  }
}
