package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The rehearsal-fixture generator must preserve the properties the scale
  * analysis relies on: exact N× row counts, collision-free key spaces, FK
  * joins that still resolve inside every replica, and near-dup (not exact-
  * dup) document replication.
  */
class ScaleUpSpec extends SparkTestBase {

  test("ScaleUp: 3x replicas with disjoint keys, consistent joins, tagged texts") {
    val out = Files.createTempDirectory("graft_scaleup").toString
    ScaleUp.main(Array(sfDir, out, "3"))
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 3 * docs0.count(), "exact 3x rows")
    assert(docs.select("doc_id").distinct().count() == docs.count(),
      "replica key spaces must not collide")
    // cross-replica copies are NEAR-duplicates (tag appended), never exact
    assert(docs.select("text").distinct().count() == docs.count() ||
      docs0.select("text").distinct().count() < docs0.count(),
      "rep tags keep cross-replica texts distinct")
    // FK joins resolve inside every replica: orders ⨝ customer keeps 3x rows
    val ord = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val ord0 = spark.read.parquet(s"$sfDir/orders.parquet")
    assert(ord.join(cust, ord("o_custkey") === cust("c_custkey")).count() ==
      3 * ord0.count(), "every replicated order must find its customer")
    // embeddings replicate verbatim (vec_id offset, vector bytes identical)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(emb.count() == 3 * emb0.count())
    assert(emb.select(hash(col("embedding"))).distinct().count() ==
      emb0.select(hash(col("embedding"))).distinct().count(),
      "vectors replicate verbatim — no new distinct vectors")
  }
}
