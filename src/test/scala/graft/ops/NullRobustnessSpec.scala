package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Null-text robustness: the driver fixture has no NULL documents, so a
  * latent NPE or silent 3VL drop in a text operator would only surface in
  * production. Each core op must either carry the null row per its
  * contract or drop it cleanly — never throw, never corrupt the non-null
  * rows' results.
  */
class NullRobustnessSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = {
    graft.Tables.register(spark, sfDir)
    val base = spark.table("documents").limit(50)
    base.unionByName(
      Seq((999901L, null.asInstanceOf[String], "en", "web", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("exact dedup: a null text neither throws nor collides with real digests") {
    val out = Dedup.exactDedup(docs)
    assert(out.count() >= 1, "non-null rows must survive")
    // the null-text row must not swallow any real document
    assert(out.filter(col("keep_id") < 999901L).count() ==
      Dedup.exactDedup(docs.filter(col("doc_id") < 999901L)).count())
  }

  test("minhash near-dups: null text drops cleanly, pairs unchanged") {
    val withNull = Dedup.minhashNearDups(docs, threshold = 0.5)
      .select("id_a", "id_b").collect().map(_.toString).toSet
    val without = Dedup.minhashNearDups(docs.filter(col("text").isNotNull),
      threshold = 0.5).select("id_a", "id_b").collect().map(_.toString).toSet
    assert(withNull == without)
  }

  test("char-LM scoring: null text drops (inner semantics), scores unchanged") {
    val withNull = TextOps.charLmScore(docs).collect().map(_.toString).toSet
    val without = TextOps.charLmScore(docs.filter(col("text").isNotNull))
      .collect().map(_.toString).toSet
    assert(withNull == without)
    assert(!withNull.exists(_.contains("999901")))
  }

  test("contamination score: null corpus text drops; null benchmark text is inert") {
    val out = TextOps.contaminationScore(
      docs, docs.filter(col("doc_id") % 7 === 0), n = 5)
    assert(out.filter(col("doc_id") === 999901L).count() <= 1)
    assert(out.filter(col("contamination").isNull).count() == 0)
  }

  test("segment dedup: null text drops, survivors keep their novel content") {
    val out = TextOps.dedupSegments(docs)
    assert(out.count() >= 1)
    assert(out.filter(col("text_deduped").isNull).count() == 0)
  }

  test("boilerplate removal: null text drops cleanly; non-null results unchanged") {
    val out = TextOps.removeBoilerplate(docs, n = 3, minDocFreq = 3)
    assert(out.filter(col("doc_id") === 999901L).isEmpty,
      "a null-text doc has no segments — it must drop, not emit a row")
    val clean = TextOps.removeBoilerplate(
      docs.filter(col("doc_id") =!= 999901L), n = 3, minDocFreq = 3)
    assert(out.collect().map(_.toSeq).toSet == clean.collect().map(_.toSeq).toSet,
      "the null row must not perturb any other doc's segments or counts")
  }

  test("edit-distance near-dups: null keys never pair, never throw") {
    val keyed = docs.select(col("doc_id"), col("lang"),
      expr("substring(lower(text), 1, 16)").as("k"))
    val out = Dedup.editDistanceNearDups(keyed, "doc_id", "k",
      blockCols = Seq("lang"), maxDist = 2)
    assert(out.filter(col("id_a") === 999901L || col("id_b") === 999901L).isEmpty,
      "a null key must not match anything (SQL 3VL, not empty-string)")
    val clean = Dedup.editDistanceNearDups(
      keyed.filter(col("doc_id") =!= 999901L), "doc_id", "k",
      blockCols = Seq("lang"), maxDist = 2)
    assert(out.collect().map(_.toSeq).toSet == clean.collect().map(_.toSeq).toSet)
  }

  test("brute-force kNN: a null embedding neither throws nor enters any top-k") {
    val base = spark.table("embeddings").limit(50)
    val e = base.unionByName(
      Seq((999901L, null.asInstanceOf[Seq[Float]], 0))
        .toDF("vec_id", "embedding", "label"))
    val out = Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 4), k = 3)
    assert(out.filter(col("n_id") === 999901L).count() == 0,
      "a null vector must never rank")
    val clean = Similarity.bruteForceKnn(base, base.filter(col("vec_id") < 4), k = 3)
    assert(out.collect().map(_.toString).sorted.sameElements(
      clean.collect().map(_.toString).sorted))
  }

  test("LSH near-dups: a null embedding drops cleanly, pairs unchanged") {
    val base = spark.table("embeddings").limit(50)
    val e = base.unionByName(
      Seq((999901L, null.asInstanceOf[Seq[Float]], 0))
        .toDF("vec_id", "embedding", "label"))
    val withNull = Similarity.lshNearDups(e, "vec_id", "embedding",
      threshold = 0.3).select("id_a", "id_b").collect().map(_.toString).toSet
    val without = Similarity.lshNearDups(base, "vec_id", "embedding",
      threshold = 0.3).select("id_a", "id_b").collect().map(_.toString).toSet
    assert(withNull == without)
  }

  test("prepareCorpus composite survives a null text end to end") {
    val out = Pipeline.prepareCorpus(docs)
    assert(out.count() >= 1)
    assert(out.filter(col("doc_id") === 999901L).count() == 0,
      "a null text can never pass the quality gate")
  }
}
