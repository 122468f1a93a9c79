package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Large-queryset bucketed kNN (s20): neither side broadcasts — the
  * corpus-vs-queryset generalization of the s07 cell pattern. Exactness
  * pins against brute force at full probe (probe recall is the
  * nprobe/fixture property, measured separately), and a planted fixture
  * proves the partial probe finds planted twins through the cell join. */
class BucketedKnnSpec extends SparkTestBase {

  private def embs = { Tables.register(spark, sfDir); spark.table("embeddings") }

  test("full-probe bucketed kNN over the WHOLE corpus as queries equals " +
    "per-query brute force") {
    val got = Similarity.bucketedKnn(embs, embs, k = 3,
      nlist = 16, nprobe = 16).collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(embs, embs, k = 3)
      .collect().map(_.toString).sorted
    assert(got.sameElements(brute),
      "full-probe bucketed kNN must equal brute force for every query")
  }

  test("planted twins surface through a PARTIAL probe: near-identical " +
    "vectors co-cluster, so nprobe 1 already finds them") {
    import spark.implicits._
    // 8 well-separated anchors, each with a near-identical twin: the twin
    // is every anchor's true top-1, and quantization puts both in the
    // same cell, so even nprobe = 1 of 8 must return it
    val dim = 16
    def anchor(g: Int): Seq[Double] =
      (0 until dim).map(i => if (i == g * 2) 10.0 else 0.0)
    val rows = (0 until 8).flatMap { g =>
      val a = anchor(g)
      Seq((g.toLong * 2, a.map(_.toFloat)),
        (g.toLong * 2 + 1, a.updated(1, 0.01).map(_.toFloat)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.bucketedKnn(df, df, k = 1, nlist = 8, nprobe = 1,
      trainSampleFraction = 1.0)
      .select("q_id", "n_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (g <- 0 until 8) {
      assert(got(g * 2L) == g * 2L + 1,
        s"anchor ${g * 2} must find its twin through the cell join")
      assert(got(g * 2L + 1) == g * 2L,
        s"twin ${g * 2 + 1} must find its anchor through the cell join")
    }
  }

  test("self-sized cells give the full probe at this SF — the s20 driver " +
    "configuration is exact corpus-wide") {
    // 500 vectors / targetOcc 32 → 16 cells; nprobe 16 covers them all,
    // so the oracle-certified regime is full probe by construction
    val got = Similarity.bucketedKnn(embs, embs, k = 3,
      trainSampleFraction = 0.5).collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(embs, embs, k = 3)
      .collect().map(_.toString).sorted
    assert(got.sameElements(brute),
      "self-sized full probe must equal brute force for every query")
  }

  test("two-level quantizer path (nlist > 64) at full probe equals brute " +
    "force — the 100x assignment route returns the same answers") {
    val got = Similarity.bucketedKnn(embs, embs, k = 3,
      nlist = 80, nprobe = 80).collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(embs, embs, k = 3)
      .collect().map(_.toString).sorted
    assert(got.sameElements(brute),
      "two-level full probe must equal brute force for every query")
  }

  test("the candidate stream never rides a shuffle: every exchange stays " +
    "under |Q|*nprobe*k rows while the cell join emits an order of " +
    "magnitude more — the rank-limit claim MEASURED, not asserted") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Similarity.bucketedKnn(embs, embs, k = 3,
        nlist = 16, nprobe = 16)
      df.collect()
      val nodes = physicalNodes(df)
      val joinRows = nodes.collect {
        case j: SortMergeJoinExec => j.metrics("numOutputRows").value
        case j: ShuffledHashJoinExec => j.metrics("numOutputRows").value
      }
      assert(joinRows.nonEmpty, "expected a shuffled cell join")
      val n = embs.count()
      val bound = n * 16 * 3 // |Q| * nprobe * k
      assert(joinRows.max > bound * 4,
        s"fixture too small to exercise the claim: join emitted " +
          s"${joinRows.max} candidates vs bound $bound")
      val shuffled = nodes.collect { case e: ShuffleExchangeExec =>
        e.metrics("shuffleRecordsWritten").value
      }
      assert(shuffled.nonEmpty)
      for (rows <- shuffled)
        assert(rows <= bound,
          s"an exchange carried $rows rows (> |Q|*nprobe*k = $bound): " +
            s"the candidate stream leaked into a shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("nprobe out of range fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.bucketedKnn(embs, embs, k = 3, nlist = 8, nprobe = 0)
    }
    assert(e.getMessage.contains("out of range"), e.getMessage)
  }
}
