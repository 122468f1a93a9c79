package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches — the incremental-statistics pattern for a 100 TB
  * corpus. Exact `count(DISTINCT ...)` / exact quantiles over the full
  * corpus re-scan everything on every refresh; the sketch pattern instead
  * keeps one small binary sketch per (group, ingestion shard) — computed
  * once, when the shard lands — and answers corpus-wide questions by
  * MERGING sketches, never re-reading data. A daily refresh over 100 TB
  * becomes a merge over kilobyte-sized sketch rows; new shards append
  * without touching old ones (union-then-merge, certified associative by
  * SketchesSpec).
  *
  * Built on Spark's native datasketches expressions (codegen'd, no UDFs):
  * HLL for cardinality (`hll_sketch_agg` / `hll_union_agg`, Apache
  * DataSketches HllSketch under the hood), KLL for rank/quantiles
  * (`kll_sketch_agg_bigint` / `kll_merge_agg_bigint`). Both are mergeable
  * and deterministic: merging per-shard sketches yields byte-identical
  * estimates regardless of shard order or count.
  *
  * The reference has no sketch surface at all (its only approximate
  * aggregate exposure is whatever the host engine registers); this is a
  * beyond-parity scale operator like graft.ops.Dedup's LSH family.
  */
object Sketches {

  // ----------------------------------------------------------- cardinality

  /** Stage 1 — one binary HLL sketch per (group, shard). Run this when a
    * shard (a day, a dump, an ingestion batch) lands and persist the result;
    * the sketch column is a few KB regardless of shard row count. `lgK` 12
    * ≈ ±1.6% standard error at 4 KB per sketch.
    */
  def hllShards(df: DataFrame, valueCol: String, shardCol: Column,
                groupCols: Seq[String] = Nil, lgK: Int = 12): DataFrame =
    df.groupBy(shardCol.as("shard") +: groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Stage 2 — merge shard sketches to a per-group distinct estimate. The
    * input is typically today's `hllShards` output unioned with the persisted
    * history table; nothing re-reads corpus bytes. `allowDifferentLgConfigK`
    * lets shards written at different precisions still merge.
    */
  def hllMerge(shards: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val est = hll_sketch_estimate(
      hll_union_agg(col("hll"), lit(true))).as("distinct_est")
    if (groupCols.isEmpty) shards.agg(est)
    else shards.groupBy(groupCols.map(col): _*).agg(est)
  }

  /** End-to-end sharded distinct count: shard → sketch → merge. One wide
    * shuffle of sketch rows (bytes ∝ groups × shards, not corpus rows).
    */
  def distinctEstimate(df: DataFrame, valueCol: String, shardCol: Column,
                       groupCols: Seq[String] = Nil, lgK: Int = 12): DataFrame =
    hllMerge(hllShards(df, valueCol, shardCol, groupCols, lgK), groupCols)

  // ------------------------------------------------------------- frequency

  /** Stage 1 — one Count-Min frequency sketch of a BIGINT key per (group,
    * shard), via Spark's `count_min_sketch` build aggregate. All shards
    * MUST share (eps, confidence, seed) — the merge rejects mismatches.
    * Size ≈ (e/eps)·⌈ln(1/(1−confidence))⌉·8 bytes, independent of rows.
    */
  def cmsShards(df: DataFrame, keyCol: String, shardCol: Column,
                groupCols: Seq[String] = Nil, eps: Double = 1e-4,
                confidence: Double = 0.999, seed: Int = 42): DataFrame =
    df.groupBy(shardCol.as("shard") +: groupCols.map(col): _*)
      .agg(expr(s"count_min_sketch(cast($keyCol as bigint), ${eps}d, " +
        s"${confidence}d, $seed)").as("cms"))

  /** Stage 2 — merge shard sketches (graft's `cms_merge_agg`; Spark has no
    * built-in CMS merge) to one per-group frequency sketch, ready for
    * [[graft.functions.CmsFunctions.cmsEstimateLong]] probes.
    */
  def cmsMerge(shards: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val m = graft.functions.CmsFunctions.cmsMergeAgg(col("cms")).as("cms")
    if (groupCols.isEmpty) shards.agg(m)
    else shards.groupBy(groupCols.map(col): _*).agg(m)
  }

  /** Frequent-items shards: per-shard DataSketches LongsSketch over a long
    * key — unlike CMS this returns the heavy-hitter LIST itself (no probe
    * universe needed), with the Misra-Gries contract: lb ≤ true ≤ ub,
    * ub − lb ≤ maxError, and no item with true count > maxError is missed.
    */
  def freqShards(df: DataFrame, keyCol: String, shardCol: Column,
                 maxMapSize: Int = 256): DataFrame =
    df.groupBy(shardCol.as("shard"))
      .agg(graft.functions.FreqFunctions.freqSketchAggLong(
        col(keyCol).cast("long"), maxMapSize).as("freq"))

  /** Merge frequent-items shard sketches into one corpus-wide sketch. */
  def freqMerge(shards: DataFrame): DataFrame =
    shards.agg(graft.functions.FreqFunctions.freqMergeAgg(col("freq")).as("freq"))

  /** Join-size estimate between two key columns WITHOUT executing the join
    * (Cormode-Muthukrishnan inner product): one CMS per side, est =
    * cms_inner_product of the two sketches. Self-join size (a == b, the F₂
    * frequency moment) is the skew diagnostic that prices a shuffle join
    * BEFORE running it — the planning companion to Pipeline.skewReport.
    * Guarantee: never undercounts; overcounts > (2/width)·N_a·N_b with
    * probability ≤ 2^-depth (deterministic given the build seed).
    * Returns a 1-row frame (join_size_est).
    */
  def joinSizeEstimate(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
                       eps: Double = 1e-4, confidence: Double = 0.999,
                       seed: Int = 42): DataFrame = {
    def sk(df: DataFrame, k: String) =
      df.agg(expr(s"count_min_sketch(cast($k as bigint), ${eps}d, " +
        s"${confidence}d, $seed)").as("cms"))
    sk(a, keyA).select(graft.functions.CmsFunctions.cmsInnerProduct(
      col("cms"), sk(b, keyB).scalar()).as("join_size_est"))
  }

  // --------------------------------------------------------- set operations

  /** Stage 1 — one theta sketch of a BIGINT key per (group, shard): the
    * set-operation member of the family (union/intersection/difference
    * cardinalities between corpus snapshots WITHOUT a join). Wider keys
    * hash to 64 bits first (xxhash64 — the corpus-digest convention).
    * `nominalEntries` 2^14 stays EXACT below 16,384 distinct keys per
    * sketch, then estimates at RSE ≈ 0.8%, ~128 KB ceiling per sketch.
    */
  def thetaShards(df: DataFrame, keyCol: String, shardCol: Column,
                  groupCols: Seq[String] = Nil,
                  nominalEntries: Int = 1 << 14): DataFrame =
    df.groupBy(shardCol.as("shard") +: groupCols.map(col): _*)
      .agg(graft.functions.ThetaFunctions.thetaSketchAggLong(
        xxhash64(col(keyCol)), nominalEntries).as("theta"))

  /** Stage 2 — merge shard sketches to one per-group theta sketch, ready
    * for `theta_estimate` / `theta_intersect_estimate` /
    * `theta_anotb_estimate` probes between merged groups.
    */
  def thetaMerge(shards: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val m = graft.functions.ThetaFunctions.thetaUnionAgg(col("theta")).as("theta")
    if (groupCols.isEmpty) shards.agg(m)
    else shards.groupBy(groupCols.map(col): _*).agg(m)
  }

  // ------------------------------------------------------------- quantiles

  /** Stage 1 — one binary KLL sketch of a BIGINT measure per (group, shard).
    * `k` 200 ≈ 1.3% rank error at ~1 KB per sketch.
    */
  def kllShards(df: DataFrame, valueCol: String, shardCol: Column,
                groupCols: Seq[String] = Nil, k: Int = 200): DataFrame =
    df.groupBy(shardCol.as("shard") +: groupCols.map(col): _*)
      .agg(expr(s"kll_sketch_agg_bigint(cast($valueCol as bigint), $k)").as("kll"))

  /** Stage 2 — merge shard sketches and read quantiles. Each requested
    * quantile comes back as an actual observed value whose rank is within
    * the sketch's rank error of the target.
    */
  def kllQuantiles(shards: DataFrame, quantiles: Seq[Double],
                   groupCols: Seq[String] = Nil): DataFrame = {
    val merged = expr("kll_merge_agg_bigint(kll)")
    val qCols = quantiles.map(q =>
      expr(s"kll_sketch_get_quantile_bigint(merged, cast($q as double))")
        .as(s"p${(q * 100).round}"))
    val base =
      if (groupCols.isEmpty) shards.agg(merged.as("merged"))
      else shards.groupBy(groupCols.map(col): _*).agg(merged.as("merged"))
    base.select(groupCols.map(col) ++ qCols: _*)
  }
}
