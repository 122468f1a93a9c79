package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact (digest group-by),
  * MinHash+LSH band-bucketing, SimHash with pigeonhole candidate generation,
  * and exact n-gram Jaccard verification. Built from codegen'd built-ins —
  * higher-order array functions, xxhash64, bit ops — so every stage runs
  * inside whole-stage codegen with map-side partial aggregation.
  *
  * Scale design (100 TB):
  * - exact dedup shuffles 16-byte digests, never document payloads;
  * - MinHash signatures are fixed-width (numHashes × 8 bytes) regardless of
  *   document size; only (band, bandHash, id) triples shuffle for LSH;
  * - candidate verification joins shingle SETS only for LSH-surviving pairs;
  * - giant near-duplicate clusters create quadratic bucket blowup — cap with
  *   `maxBucket` (buckets above the cap are dropped; at cap b a cluster of n
  *   docs still surfaces via its other bands with high probability).
  */
object Dedup {

  /** One row per distinct normalized text: the minimum id wins, with the
    * duplicate count. Shuffle key = md5 digest (32 hex chars).
    */
  def exactDedup(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("digest"))
      .groupBy("digest")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** word-level shingles of size k as a distinct array column */
  def shingles(textCol: String, k: Int): org.apache.spark.sql.Column =
    expr(
      s"""array_distinct(CASE
         |  WHEN size(split(lower($textCol), ' ')) < $k THEN array(lower($textCol))
         |  ELSE transform(
         |    sequence(0, size(split(lower($textCol), ' ')) - $k),
         |    i -> array_join(slice(split(lower($textCol), ' '), i + 1, $k), ' '))
         |END)""".stripMargin)

  /** MinHash signature: sig[j] = min over shingles of xxhash64(shingle, j).
    * Fixed 8·numHashes bytes per doc regardless of document length.
    *
    * Expression shape matters: `shingles` appears only in the COLLECTION
    * argument of the fold, so it evaluates once per row. (The naive
    * `transform(seq, j -> array_min(transform(shingles, …)))` re-evaluates
    * the shingle construction once per seed — 64× — because lambda bodies
    * re-evaluate everything inside them.)
    */
  def minhashSignature(df: DataFrame, textCol: String = "text",
                       numHashes: Int = 64, shingleSize: Int = 3): DataFrame =
    df.withColumn("shingles", shingles(textCol, shingleSize))
      .withColumn("minhash_sig",
        graft.functions.MinHashFunctions.minhashSig(col("shingles"), numHashes))

  /** LSH candidate pairs: signatures are cut into `bands` bands of
    * numHashes/bands rows; docs sharing any band hash become candidates; the
    * pair is kept when exact shingle-set Jaccard ≥ `threshold`.
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashNearDups(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", numHashes: Int = 64,
                      bands: Int = 16, shingleSize: Int = 3,
                      threshold: Double = 0.5,
                      maxBucket: Int = 1000): DataFrame = {
    val r = numHashes / bands
    // repartition BEFORE the signature computation so it runs across all
    // cores (a small parquet input is otherwise a single serial partition);
    // persist the fixed-width signature frame so the band explode and both
    // verify-join sides read it instead of re-evaluating the folds
    val sigs = minhashSignature(
        df.select(col(idCol), col(textCol)).repartition(col(idCol)),
        textCol, numHashes, shingleSize)
      .select(col(idCol).as("mh_id"), col("shingles"), col("minhash_sig"))
      .persist()

    val banded = sigs.select(col("mh_id"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> xxhash64(b, array_join(
           |         transform(slice(minhash_sig, b * $r + 1, $r),
           |                   x -> cast(x AS STRING)), ',')))""".stripMargin))
        .as(Seq("band_idx", "band_hash")))

    // drop pathological buckets (quadratic blowup guard at corpus scale)
    val bucketed = banded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_hash")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

    val l = bucketed.select(col("band_idx"), col("band_hash"), col("mh_id").as("id_a"))
    val rgt = bucketed.select(col("band_idx"), col("band_hash"), col("mh_id").as("id_b"))
    val candidates = l.join(rgt, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val sa = sigs.select(col("mh_id").as("id_a"), col("shingles").as("sh_a"))
    val sb = sigs.select(col("mh_id").as("id_b"), col("shingles").as("sh_b"))
    candidates.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard", jaccardCol("sh_a", "sh_b"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** exact Jaccard over two distinct-element array columns */
  def jaccardCol(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"size(array_intersect($a, $b)) / CAST(size(array_union($a, $b)) AS DOUBLE)")

  /** n-gram Jaccard similarity for pairs grouped by a blocking key:
    * deterministic and oracle-checkable, no hashing involved. Pair count is
    * quadratic per block — choose blocking keys so blocks stay small (this is
    * the classic blocked-similarity design; unblocked all-pairs at corpus
    * scale is what MinHash LSH is for). The intersect/union sizes are
    * computed once in a projection below the threshold filter, not re-derived
    * per consumer.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], shingleSize: Int = 3,
                        threshold: Double = 0.1): DataFrame = {
    val blk = concat_ws("|", blockCols.map(col): _*)
    val s = df.select(blk.as("blk"), col(idCol).as("jid"),
        col(textCol).as("jtext"))
      .repartition(col("blk"))
      .withColumn("sh", shingles("jtext", shingleSize))
      .select("blk", "jid", "sh")
      .persist()
    val a = s.select(col("blk"), col("jid").as("id_a"), col("sh").as("sh_a"))
    val b = s.select(col("blk"), col("jid").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .select(col("blk"), col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
        size(array_union(col("sh_a"), col("sh_b"))).as("n_union"))
      .filter(col("n_inter").cast("double") / col("n_union") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") / col("n_union"), 6).as("jaccard"))
  }

  /** 64-bit SimHash fingerprint via the codegen'd single-pass kernel
    * (graft.functions.SimHash64): per token, hash bits vote +1/−1 per
    * position; fingerprint bit b is set when the vote is positive.
    */
  def simhash64(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("simhash",
      graft.functions.MinHashFunctions.simhash64(split(lower(col(textCol)), " ")))

  /** Near-duplicate pairs by SimHash hamming distance ≤ maxHamming (≤ 3 with
    * the default 4 chunks): pigeonhole — at least one 16-bit chunk must match
    * exactly, so candidates come from 4 cheap equi-joins, then bit_count
    * verifies. Returns (id_a, id_b, hamming).
    */
  def simhashNearDups(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text",
                      maxHamming: Int = 3): DataFrame = {
    // parallelize the fingerprint fold, then persist the tiny (id, 8-byte)
    // frame so the 4 chunk explodes and both join sides read it once
    val fp = simhash64(
        df.select(col(idCol), col(textCol)).repartition(col(idCol)), textCol)
      .select(col(idCol).as("sh_id"), col("simhash"))
      .persist()
    val chunked = fp.select(col("sh_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535)"))
        .as(Seq("chunk_idx", "chunk_val")))
    val a = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("sh_id").as("id_a"), col("simhash").as("fp_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("sh_id").as("id_b"), col("simhash").as("fp_b"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(fp_a ^ fp_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicates via multi-table sign-LSH bucketing +
    * exact cosine verify; see Similarity.scala for the primitives. */
  def embeddingNearDups(df: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        threshold: Double = 0.35): DataFrame =
    Similarity.lshNearDups(df, idCol, vecCol, threshold)
}
