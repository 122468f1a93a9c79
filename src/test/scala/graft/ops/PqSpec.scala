package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Product quantization: ADC consistency, rerank exactness, compression. */
class PqSpec extends SparkTestBase {

  private lazy val emb = {
    Tables.register(spark, sfDir)
    spark.table("embeddings")
  }

  test("ADC distance == exact distance to the decoded reconstruction") {
    val model = Pq.train(emb, m = 8, k = 16)
    val enc = Pq.encode(emb, model)
    val recon = Pq.decode(enc, model)
      .join(emb.select(col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("v")), "n_id")
    // the ADC table lookup must agree with ||q - recon||² computed directly
    // (one fixed probe vector; tolerance covers IEEE summation order)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val adcTables = (0 until model.m).map { j =>
      array(model.codebooks(j).map(cent =>
        graft.functions.VecFunctions.vecL2Sq(
          typedLit(probe.slice(j * model.ds, (j + 1) * model.ds)),
          typedLit(cent))): _*)
    }
    val adist = aggregate(
      zip_with(col("codes"), array(adcTables: _*), (c, t) => element_at(t, c + 1)),
      lit(0.0d), (acc, v) => acc + v)
    val direct = graft.functions.VecFunctions.vecL2Sq(typedLit(probe), col("recon"))
    val maxGap = recon.select(max(abs(adist - direct))).head().getDouble(0)
    assert(maxGap < 1e-9, s"ADC lookup drifted from reconstruction: $maxGap")
  }

  test("shortlist rerank == exact brute-force kNN on the fixture") {
    // m=16/k=64: measured worst ADC rank of a true top-5 neighbor is 49 at
    // 500 rows and 71 at 2000 rows (sf0.1) — shortlist 200 carries ~3x
    // margin at both scales, so the rerank restores exact output
    val model = Pq.train(emb, m = 16, k = 64)
    val enc = Pq.encode(emb, model)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceKnn(emb, queries, k = 5)
    val pq = Pq.search(enc, emb, model, queries, k = 5, shortlist = 200)
    assertSameRows(exact, pq)
  }

  test("shortlist == corpus degenerates to exact kNN under ANY codebooks") {
    val model = Pq.train(emb, m = 4, k = 4, sampleFraction = 0.3)
    val enc = Pq.encode(emb, model)
    val queries = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    val exact = Similarity.bruteForceKnn(emb, queries, k = 3)
    val pq = Pq.search(enc, emb, model, queries, k = 3, shortlist = n)
    assertSameRows(exact, pq)
  }

  test("codegen'd pq_encode == interpreted HOF reference, code for code") {
    val model = Pq.train(emb, m = 16, k = 64)
    val fast = Pq.encode(emb, model)
    val ref = Pq.encodeHof(emb, model, "vec_id", "embedding")
    assertSameRows(ref, fast)
    // and the kernel actually codegens (no fallback to interpreted eval)
    // "*(n)" is toString's WholeStageCodegen marker on the Project
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("pq_encode") && plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("pq_encode")), plan.take(500))
  }

  test("codes compress 64 floats to m small ints; decode restores the dim") {
    val model = Pq.train(emb, m = 8, k = 16)
    val enc = Pq.encode(emb, model)
    val row = enc.head()
    assert(row.getSeq[Int](row.fieldIndex("codes")).size == 8)
    assert(enc.count() == emb.count())
    val allInRange = enc.select(
      forall(col("codes"), c => c >= 0 && c < 16).as("ok"))
      .agg(min(col("ok"))).head().getBoolean(0)
    assert(allInRange)
    val recon = Pq.decode(enc, model)
    assert(recon.select(size(col("recon"))).head().getInt(0) == 64)
  }
}
