package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class IvfSpec extends SparkTestBase {

  private def embs = { Tables.register(spark, sfDir); spark.table("embeddings") }

  test("ivf with nprobe == nlist equals brute force exactly") {
    val idx = Ivf.build(embs, nlist = 8)
    val queries = embs.filter(col("vec_id") < 4)
    val ivf = Ivf.search(idx, queries, k = 5, nprobe = 8)
      .collect().map(_.toString).sorted
    val brute = Similarity.bruteForceKnn(embs, queries, k = 5)
      .collect().map(_.toString).sorted
    assert(ivf.sameElements(brute), "full-probe IVF must equal brute force")
  }

  test("ivf with partial probe returns ranked subsets") {
    val idx = Ivf.build(embs, nlist = 8)
    val queries = embs.filter(col("vec_id") < 4)
    val r = Ivf.search(idx, queries, k = 5, nprobe = 2).collect()
    assert(r.nonEmpty)
    val brute = Similarity.bruteForceKnn(embs, queries, k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // partial-probe results are genuine vectors ranked correctly per query
    r.groupBy(_.getLong(0)).values.foreach { rows =>
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.zipWithIndex.forall { case (rk, i) => rk == i + 1 })
    }
    // recall sanity: at least some overlap with exact top-k
    val got = r.map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.intersect(brute).nonEmpty)
  }

  test("incremental append: grown saved index equals building over the union") {
    val oldHalf = embs.filter(col("vec_id") % 2 === 0)
    val newHalf = embs.filter(col("vec_id") % 2 === 1)
    val idx = Ivf.build(oldHalf, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Ivf.save(idx, dir)
    val grown = Ivf.appendToSaved(spark, dir, newHalf)
    assert(grown.centroids == idx.centroids, "append must not move centroids")
    // the grown index answers exactly like the same quantizer assigned over
    // the full corpus in one shot
    val oneShot = Ivf.IvfIndex(idx.centroids, Ivf.assign(idx, embs))
    val queries = embs.filter(col("vec_id") < 4)
    val a = Ivf.searchPruned(grown, queries, k = 5, nprobe = 3)
      .collect().map(_.toString).sorted
    val b = Ivf.search(oneShot, queries, k = 5, nprobe = 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "append path must equal one-shot assignment")
    // old cell files untouched: ingest wrote only the new batch's rows
    assert(grown.assigned.count() == embs.count())
  }

  test("saved index reloads: identical results, probe prunes to cell partitions") {
    val idx = Ivf.build(embs, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Ivf.save(idx, dir)
    val loaded = Ivf.load(spark, dir)
    assert(loaded.centroids == idx.centroids)
    val queries = embs.filter(col("vec_id") < 4)
    val a = Ivf.search(idx, queries, k = 5, nprobe = 3).collect().map(_.toString).sorted
    val b = Ivf.search(loaded, queries, k = 5, nprobe = 3).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // the probe over the loaded index prunes to the probed cell directories
    val probed = Ivf.search(loaded, queries, k = 5, nprobe = 3)
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(cell"), scan)
  }

  test("every corpus vector lands in exactly one cell") {
    val idx = Ivf.build(embs, nlist = 8)
    assert(idx.assigned.count() == embs.count())
    assert(idx.assigned.select("cell").distinct().count() <= 8)
  }
}
