package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** IVF-SQ8 (s19): int8 codes inside the cell-pruned inverted file — the
  * probe must equal brute force on the fixture (probed cells cover the
  * true neighbors at the s03-measured nprobe), codes must stay genuine
  * tinyint end-to-end through save/load, and the shortlist margin is
  * MEASURED within the probe, not assumed. */
class IvfSqSpec extends SparkTestBase {

  private def embs = { Tables.register(spark, sfDir); spark.table("embeddings") }

  test("full-probe ivf-sq8 + rerank equals brute force; codes are int8; " +
    "no raw vectors in the index") {
    // nprobe == nlist isolates the QUANTIZATION contract (shortlist must
    // cover the true neighbors; margin test below measures it) from probe
    // recall, which is an nprobe/fixture property measured at the driver
    // SF — the same split as IvfSpec's full-probe exactness test
    val idx = IvfSq.build(embs, nlist = 16, trainSampleFraction = 0.5)
    assert(idx.encoded.schema("n_code").dataType.simpleString
      == "array<tinyint>", "cell codes must scan as tinyint")
    assert(idx.encoded.columns.sorted.toSeq == Seq("cell", "n_code", "n_id"),
      "the index layout must carry codes ONLY — no raw vectors")
    val queries = embs.filter(col("vec_id") < 4)
    val got = IvfSq.search(idx, embs, queries, k = 5, nprobe = 16,
      shortlist = 64).collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(embs, queries, k = 5)
      .collect().map(_.toString).sorted
    assert(got.sameElements(brute), "IVF-SQ8 rerank must restore exact order")
  }

  test("save/load/searchPruned round-trips exactly; scale survives") {
    val idx = IvfSq.build(embs, nlist = 16, trainSampleFraction = 0.5)
    val path = java.nio.file.Files
      .createTempDirectory("ivfsq_spec").toString
    IvfSq.save(idx, path)
    val loaded = IvfSq.load(spark, path)
    assert(loaded.scale == idx.scale, "scale must survive save/load")
    assert(loaded.centroids == idx.centroids,
      "centroids must survive save/load in cell order")
    val queries = embs.filter(col("vec_id") < 4)
    val got = IvfSq.searchPruned(loaded, embs, queries, k = 5,
      nprobe = 12, shortlist = 64).collect().map(_.toString).sorted
    val direct = IvfSq.search(idx, embs, queries, k = 5, nprobe = 12,
      shortlist = 64).collect().map(_.toString).sorted
    assert(got.sameElements(direct), "pruned saved probe must equal direct")
  }

  test("worst true-neighbor quantized rank within the probe leaves the " +
    "64-shortlist margin") {
    val idx = IvfSq.build(embs, nlist = 16, trainSampleFraction = 0.5)
    val worst = IvfSq.worstTrueNeighborRank(idx, embs,
      embs.filter(col("vec_id") < 8), k = 5, nprobe = 12)
    assert(worst <= 32,
      s"worst in-probe true-neighbor quantized rank $worst erodes the " +
        "64 shortlist")
    info(s"worst in-probe true-neighbor quantized rank = $worst " +
      "(shortlist 64)")
  }

  test("empty corpus fails loudly at build (no scale exists)") {
    val empty = embs.filter(col("vec_id") < 0)
    val e = intercept[IllegalArgumentException] {
      IvfSq.build(empty, nlist = 4)
    }
    assert(e.getMessage.contains("empty") ||
      e.getMessage.contains("training"), e.getMessage)
  }
}
