package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed training-data-prep pipeline and skew-handling join utilities. */
object Pipeline {

  /** The canonical corpus-preparation flow, one declarative plan:
    *   quality-score → filter → language-ID → keep confidently-IDed docs →
    *   exact dedup (min doc_id per fingerprint survives) → project metadata.
    * All stages are narrow except the final digest group-by; Catalyst fuses
    * the scoring/filter/langid stages into one codegen'd map over the scan.
    */
  def prepareCorpus(docs: DataFrame, minTokens: Int = 50,
                    maxPunctRatio: Double = 0.1): DataFrame = {
    val scored = TextOps.langId(TextOps.qualityScore(docs))
    val kept = scored
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
      .withColumn("digest", TextOps.fingerprint(col("text")))
    // survivor per digest = min doc_id; single shuffle on the 32-char digest
    val survivors = kept.groupBy(col("digest"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
    survivors.join(kept.drop("digest"), Seq("doc_id"))
      .select(col("doc_id"), col("digest"), col("n_dups"), col("lang"),
        col("lang_pred"), col("n_tokens"), col("quality_score"))
  }

  /** Write a table bucketed+sorted by its join key. Joins between tables
    * bucketed the same way on the same key skip the shuffle entirely — the
    * co-location is established once at write time and amortized over every
    * subsequent join (the standard layout for repeatedly-joined 100 TB fact
    * tables). Requires a catalog table (bucket metadata lives there).
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit =
    df.write.bucketBy(buckets, keyCol).sortBy(keyCol)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Deterministic train/val/test assignment: each row lands in exactly one
    * named split, decided by xxhash64 of its id — stable across runs,
    * machines, partitionings, and insertion order (the property random()
    * splits lack, and the one that matters when a corpus is re-processed
    * incrementally: a document's split never changes). Zero shuffles — a
    * pure projection over the scan.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
                         fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val buckets = 1000000L
    val slot = pmod(xxhash64(col(idCol)), lit(buckets))
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => (f * buckets).toLong)
    val labeled = fractions.map(_._1).zip(cuts)
    val split = labeled.init.foldRight(lit(labeled.last._1)) {
      case ((name, cut), rest) => when(slot < cut, name).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Sequence packing for pretraining: assign each document a bin and a
    * token offset in a deterministic packed stream, per group (e.g. per
    * language/shard), ordered by `orderCol`. A document's bin is the one its
    * STARTING offset falls in (offset-based packing: a doc may straddle into
    * the next bin's budget — the standard indexing for packed datasets,
    * where the reader slices windows from the concatenated token stream).
    *
    * One window pass (cumulative sum) per group — a single hash shuffle on
    * the group key at any scale; the stream offset doubles as the byte-exact
    * index for the downstream packed-file writer. `orderCol` must be unique
    * within each group (ties would make the prefix sums order-dependent).
    */
  def packSequences(df: DataFrame, tokenCol: String, orderCol: String,
                    budget: Int, byCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(byCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offset = coalesce(sum(col(tokenCol)).over(w), lit(0L))
    df.withColumn("stream_offset", offset)
      .withColumn("bin_id", (col("stream_offset") / budget).cast("long"))
  }

  /** Deterministic per-stratum sampling: keep ~`fraction(stratum)` of each
    * stratum's rows, decided by xxhash64 of the id — stable across runs and
    * re-processing like [[deterministicSplit]], zero shuffles. A row's
    * membership never changes when the corpus grows, so incremental
    * pipelines can re-sample without churning previously selected docs.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       default: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val buckets = 1000000L
    val slot = pmod(xxhash64(col(idCol)), lit(buckets))
    val cut = fractions.foldRight(lit((default * buckets).toLong)) {
      case ((s, f), rest) =>
        when(col(strataCol) === s, lit((f * buckets).toLong)).otherwise(rest)
    }
    df.filter(slot < cut)
  }

  /** Mixture-weighted corpus resampling: keep ~`rates(stratum)` of each
    * stratum, the standard lever for hitting a target domain/language mix
    * in a training corpus. Like [[stratifiedSample]] it is a zero-shuffle
    * narrow filter, deterministic, and membership-monotone (raising a
    * stratum's rate only ADDS documents — the decision compares the same
    * per-id draw against a higher cut, so epoch-over-epoch mixture tuning
    * never churns already-selected docs). The per-id draw is the first 4
    * hex chars of md5(id) — engine-portable (any SQL engine reproduces the
    * selection bit for bit, unlike xxhash64 which is Spark-specific), and
    * lowercase-hex string order equals numeric order so the cut is a plain
    * string compare the scan pushes down.
    */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
                    rates: Map[String, Double],
                    default: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(default)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val draw = substring(md5(col(idCol).cast("string")), 1, 4)
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true)
      else draw < lit(f"${math.floor(rate * 65536).toInt}%04x")
    val decision = rates.foldRight(keep(default)) { case ((s, r), rest) =>
      when(col(strataCol) === s, keep(r)).otherwise(rest)
    }
    df.filter(decision)
  }

  /** Temperature-based mixture rebalancing (the Pile/DoReMi-style domain
    * reweighting at τ = 0.5): per-domain keep rates are DERIVED from the
    * data — sampling weight ∝ √n_d (up-weights small domains, flattens
    * head domains), scaled so the expected kept total ≈ `targetFraction`
    * of the corpus, capped at 1. The per-id draw and cut convention are
    * [[mixtureSample]]'s (first 4 md5 hex chars vs a 16-bit cut), so the
    * decision is engine-portable bit for bit and membership-monotone.
    *
    * Determinism across engines is engineered, not hoped for: √n_d is
    * quantized to an integer (⌊√n·2^20⌋) BEFORE the normalizing sum, so
    * the sum is exact and independent of aggregation order (a direct sum
    * of irrational doubles would differ in the last ULP across merge
    * orders); every later step is a single correctly-rounded IEEE op.
    *
    * Scale shape: one tiny aggregation (|domains| rows) broadcast-joined
    * back — the corpus never shuffles; the filter is a narrow map.
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     targetFraction: Double = 0.5): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    // null domains form their own stratum: the rate join keys on a
    // null-coalesced shadow column (a bare equi join on the domain would
    // silently DROP every null-domain row — null never equals null)
    val joinKey = "__graft_mix_stratum"
    val keyed = df.withColumn(joinKey,
      coalesce(col(strataCol).cast("string"), lit("\u0000null")))
    val counts = keyed.groupBy(col(joinKey)).agg(count(lit(1)).as("n_d"))
      .withColumn("w_q", floor(sqrt(col("n_d").cast("double")) * 1048576L)
        .cast("long"))
    val totals = counts.agg(sum(col("w_q")).as("norm_q"),
      sum(col("n_d")).as("n_total"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("rate", least(lit(1.0),
        (lit(targetFraction) * col("n_total").cast("double")) *
          col("w_q").cast("double") /
          (col("norm_q").cast("double") * col("n_d").cast("double"))))
      .withColumn("cut", floor(col("rate") * 65536).cast("int"))
      .select(col(joinKey), col("cut"))
    val slot = conv(substring(md5(col(idCol).cast("string")), 1, 4),
      16, 10).cast("int")
    keyed.join(broadcast(rates), joinKey).filter(slot < col("cut"))
      .drop(joinKey)
  }

  /** Deterministic token-budget sampling: keep each stratum's md5-ordered
    * document prefix until the stratum's TOKEN budget fills — "build an
    * N-token mixture at these per-language budgets", the curation step when
    * the target is absolute token counts, not [[mixtureSample]]'s rates. A
    * document is kept iff its stratum's budget was not yet full when it
    * arrived (the first overshooting doc is included, so every non-empty
    * budget yields ≥ 1 doc and the shortfall is < 1 document); strata
    * without a budget drop entirely. Returns the kept rows + n_tokens +
    * the stratum's running total (audit column).
    *
    * Scale design: one window pass = one hash shuffle on the stratum key;
    * the md5 draw order is engine-portable (same convention as
    * mixtureSample). Ranks reshuffle when the corpus grows — pin a corpus
    * snapshot for reproducible mixtures.
    */
  def tokenBudgetSample(df: DataFrame, budgets: Map[String, Long],
                        stratumCol: String = "lang",
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val budget = budgets.foldRight(lit(0L)) { case ((s, b), rest) =>
      when(col(stratumCol) === s, lit(b)).otherwise(rest)
    }
    df.withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
  }

  /** Materialize a packed corpus as size-bounded parquet shards — the
    * training-data layout: each (group, shard) directory holds
    * `binsPerShard` consecutive packing bins (≤ binsPerShard × budget
    * tokens), rows sorted by their stream offset so the reader concatenates
    * token streams by scanning a shard front to back.
    *
    * Scale design: one window pass assigns offsets (packSequences), one
    * repartition routes every (group, shard) to a single task — so each
    * shard directory is exactly one parquet file, written sorted, no
    * post-hoc compaction. Readers fetch shards via PARTITION PRUNING
    * (`where shard_id = N`): a trainer streaming shard k touches one
    * directory, not the corpus. Deterministic end to end — same input,
    * same shards, byte for byte (offsets come from the orderCol window,
    * routing from the bin arithmetic; nothing samples or races).
    */
  def writePackedShards(df: DataFrame, tokenCol: String, orderCol: String,
                        budget: Int, byCols: Seq[String], outDir: String,
                        binsPerShard: Int = 64): Unit = {
    require(binsPerShard > 0, "binsPerShard must be positive")
    val packed = packSequences(df, tokenCol, orderCol, budget, byCols)
      .withColumn("shard_id", (col("bin_id") / binsPerShard).cast("long"))
    val routeCols = byCols.map(col) :+ col("shard_id")
    packed
      .repartition(routeCols: _*)
      .sortWithinPartitions(routeCols :+ col("stream_offset"): _*)
      .write.mode("overwrite")
      .partitionBy(byCols :+ "shard_id": _*)
      .parquet(outDir)
  }

  /** One-pass column profiler (ANALYZE-style data QA): per column, row
    * count, null count, distinct count, and stringified min/max — the
    * standard pre-training corpus health check. ONE scan and ONE aggregate
    * produce every column's stats (the long form comes from exploding an
    * inline struct array, not from per-column jobs).
    *
    * Scale note: exact distinct counts expand the aggregate input once per
    * distinct-counted column (Spark's Expand); at corpus scale pass
    * `approx = true` to switch to approx_count_distinct (HLL, one pass,
    * no expand) — the remaining stats are unchanged.
    */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"cnt_$c"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val agged = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col("n_rows"),
      (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
      col(s"nd_$c").as("n_distinct"),
      col(s"min_$c").as("min_value"),
      col(s"max_$c").as("max_value")))
    agged.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Heavy-hitter report for a join/shuffle key: the top-k keys by row
    * count with their corpus share — run it BEFORE a big join; keys holding
    * more than a few percent are [[saltedJoin]] / AQE-skew-split
    * candidates. One map-side-combined shuffle (the explosion collapses to
    * distinct keys before the exchange), a single-row total broadcast, and
    * a TakeOrdered top-k — no full sort at any scale. Ties break on the
    * key, so the report is deterministic.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("total"), 6))
      .orderBy(col("n").desc, col("key").asc).limit(k)
      .select("key", "n", "share")
  }

  /** Skew-safe equi-join: the build side is replicated `salts` times, the
    * probe side's rows get a deterministic salt from their own payload, and
    * the join runs on (key, salt) — a hot key's rows spread over `salts`
    * reducers instead of one. Result is row-identical to the plain join.
    * Use when AQE's skew-join splitting isn't available/enough (e.g. a
    * single giant key after filters). Deterministic: the salt derives from
    * xxhash64 of the probe row's columns, not from random().
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, salts: Int = 8): DataFrame = {
    val saltSrc: Seq[Column] = probe.columns.toSeq.map(col)
    val p = probe.withColumn("_salt",
      pmod(xxhash64(saltSrc: _*), lit(salts.toLong)).cast("int"))
    val b = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, p(probeKey) === b(buildKey) && p("_salt") === b("_salt"))
      .drop("_salt")
  }

  /** Deterministic negative sampling for contrastive training: each anchor
    * row draws `k` pseudo-random partner rows, with no RNG anywhere — the
    * draw is xxhash64 of (anchor id, draw index), so pairs are stable
    * across runs, machines, partitionings, and insertion order (the
    * [[deterministicSplit]] property, which matters when a corpus is
    * re-processed incrementally: an anchor's negatives never silently
    * change). Returns (anchor_id, neg_id, draw); self-draws are dropped, so
    * an anchor yields k or occasionally k−1 pairs (probability 1/n per
    * draw) — re-drawing would need a second corpus pass for a ~1/n event.
    *
    * Scale design: no global index (a corpus-wide row_number would be a
    * single-partition window). Partners get a (bucket, index-in-bucket)
    * address via a BUCKET-partitioned window — `buckets` ≫ cores keeps
    * every window partition small — and bucket sizes broadcast (`buckets`
    * rows). The anchor side computes its k (bucket, index) draws and
    * equi-joins the address table: one window shuffle + one pair join,
    * both on 8-byte keys; payloads never travel.
    */
  def negativePairs(df: DataFrame, idCol: String = "doc_id", k: Int = 4,
                    buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = df.select(col(idCol))
    val addressed = ids.select(col(idCol).as("neg_id"),
      pmod(xxhash64(col(idCol)), lit(buckets.toLong)).as("b"))
      .withColumn("idx", row_number().over(
        Window.partitionBy("b").orderBy(xxhash64(col("neg_id"), lit(7)),
          col("neg_id"))).cast("long") - 1L)
    // draws address the RANKED non-empty buckets, not the raw hash range: a
    // draw into an empty bucket would silently vanish (at |corpus| ≲
    // `buckets` most buckets are empty), breaking the ≥ k−1 coverage
    // contract. The rank table is ≤ `buckets` rows (broadcast); the
    // non-empty count rides as a scalar subquery — no driver action.
    val sizes = addressed.groupBy("b").agg(count(lit(1)).as("bn"))
      .withColumn("brank",
        row_number().over(Window.orderBy("b")).cast("long") - 1L)
    val nBuckets = sizes.agg(count(lit(1)).as("m"))
    val draws = ids.select(col(idCol).as("anchor_id"),
        explode(sequence(lit(1), lit(k))).as("draw"))
      .withColumn("brank",
        pmod(xxhash64(col("anchor_id"), col("draw")), nBuckets.scalar()))
      .join(broadcast(sizes), "brank")
      .withColumn("idx", pmod(xxhash64(col("anchor_id"), col("draw"), lit(13)), col("bn")))
    draws.join(addressed, Seq("b", "idx"))
      .filter(col("anchor_id") =!= col("neg_id"))
      .select(col("anchor_id"), col("neg_id"), col("draw"))
  }

  /** Deterministic global training-order shuffle into shards: every row gets
    * a pseudo-random but REPRODUCIBLE (seed, id)-keyed position — shard by
    * one md5 draw, rank within the shard by another — so the training data
    * order is stable across reruns, engines, and cluster sizes (no
    * rand()/monotonically_increasing_id, whose values depend on the physical
    * partitioning). Output: (id, shard, pos); writing partitioned by shard
    * gives the epoch reader one directory per shard in a ready order.
    *
    * Scale shape: one hash exchange on shard + a per-shard local sort for
    * the row_number — no global window, no single-partition sort; shard
    * sizes concentrate at n/numShards (md5 is uniform), so per-shard sorts
    * stay balanced at any corpus size. The md5 convention matches
    * mixtureSample/tokenBudgetSample — any SQL engine reproduces the order.
    */
  def shuffleShards(df: DataFrame, numShards: Int, seed: Long = 42L,
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hk = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val withShard = df
      .withColumn("__hk", hk)
      .withColumn("shard",
        pmod(conv(substring(col("__hk"), 1, 8), 16, 10).cast("long"),
          lit(numShards.toLong)).cast("int"))
    withShard
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("__hk"), col(idCol))).cast("long"))
      .drop("__hk")
  }

  /** Deterministic weighted (probability-proportional-to-size) sampling:
    * row i is kept iff u_i · W < k · w_i, where u_i is an md5-derived
    * uniform draw, w_i the row's weight and W their sum — a Poisson/PPS
    * sample with expected size k and inclusion probability ∝ weight (the
    * "sample by quality score / token count" training-mix primitive).
    *
    * Engine-portable BY CONSTRUCTION: the draw is a 52-bit integer scaled
    * by the exact power of two 2^52, and the decision uses only IEEE
    * multiply/compare — operations whose results are fully determined by
    * the standard — never ln/exp, whose last-ulp behavior is libm-specific
    * (the Efraimidis-Spirakis key formulation would NOT replay exactly
    * across engines). Any SQL engine reproduces the member set bit-for-bit.
    *
    * Scale shape: W rides as a scalar subquery over one aggregate; the
    * decision is a narrow per-row filter — zero shuffles, membership stable
    * under any partitioning, monotone in k for a fixed seed.
    */
  def weightedSample(df: DataFrame, weightCol: String, expectedK: Double,
                     seed: Long = 42L, idCol: String = "doc_id"): DataFrame = {
    val tot = df.agg(sum(col(weightCol).cast("double")).as("tot"))
    val draw = conv(substring(
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") / lit(4503599627370496.0) // 2^52
    df.filter(draw * tot.scalar() < col(weightCol).cast("double") * expectedK)
  }

  /** One-call corpus card: the headline dataset-documentation numbers
    * (size, exact distinct content, token volume, median length, language
    * spread, dominant language) as a single row from ONE full scan + one
    * tiny top-language aggregate — the summary every corpus release ships
    * with, kept exact so two engines agree on the card itself.
    */
  def corpusCard(df: DataFrame, textCol: String = "text",
                 langCol: String = "lang",
                 lenCol: String = "n_chars"): DataFrame = {
    val top = df.groupBy(col(langCol)).agg(count(lit(1)).as("top_lang_docs"))
      .orderBy(col("top_lang_docs").desc, col(langCol).asc).limit(1)
      .select(col(langCol).as("top_lang"), col("top_lang_docs"))
    df.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col(textCol))).as("n_distinct_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        percentile(col(lenCol), lit(0.5)).as("median_chars"),
        countDistinct(col(langCol)).as("n_langs"))
      .crossJoin(broadcast(top))
  }

  /** Per-stratum weighted PPS sampling: [[weightedSample]]'s u·W < k·w
    * keep rule applied INSIDE each stratum — "≈k docs per language,
    * probability ∝ length", the balanced-mixture variant. The per-stratum
    * weight totals are a |strata|-row aggregate broadcast back; everything
    * else stays the zero-shuffle portable-md5 filter, so any engine
    * replays the exact member set.
    */
  def stratifiedWeightedSample(df: DataFrame, weightCol: String,
                               strataCol: String, expectedKPerStratum: Double,
                               seed: Long = 42L,
                               idCol: String = "doc_id"): DataFrame = {
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(weightCol).cast("double")).as("__wtot"))
    val draw = conv(substring(
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") / lit(4503599627370496.0) // 2^52
    df.join(broadcast(totals), strataCol)
      .filter(draw * col("__wtot") <
        col(weightCol).cast("double") * expectedKPerStratum)
      .drop("__wtot")
  }

  /** Runtime-filter (semi-join-reduction) join: a Bloom filter built over
    * the dim side's join keys prefilters the FACT side before it reaches the
    * join's shuffle. The 100 TB case: dim is selective but too large to
    * broadcast, so Spark plans a shuffle join that moves EVERY fact row;
    * the bloom probe (a scalar subquery — the filter itself never lands on
    * the driver) drops non-matching fact rows at the scan, so the shuffle
    * carries only rows that can actually join. Exact by construction for
    * inner/left_semi: no false negatives, and false positives die in the
    * real join (`fpp` only tunes how much useless data still shuffles).
    *
    * `expectedDimKeys` sizes the filter without an extra dim pass (same
    * hint contract as lshNearDups / bloomIncrementalDedup).
    */
  def bloomPrefilteredJoin(fact: DataFrame, dim: DataFrame,
                           factKey: String, dimKey: String,
                           joinType: String = "inner",
                           fpp: Double = 0.01,
                           expectedDimKeys: Long = 0L): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom prefilter preserves only inner/left_semi semantics, got $joinType")
    import graft.functions.BloomFunctions
    val nItems = math.max(1L,
      if (expectedDimKeys > 0) expectedDimKeys else dim.select(dimKey).count())
    val bloom = dim.agg(BloomFunctions.bloomFilterAgg(
      xxhash64(col(dimKey)), nItems, BloomFunctions.bitsFor(nItems, fpp)).as("bf"))
    fact.filter(BloomFunctions.mightContain(bloom.scalar(), xxhash64(col(factKey))))
      .join(dim, col(factKey) === col(dimKey), joinType)
  }

  /** Deterministic curriculum interleave: rank each row inside its stratum
    * by an md5 draw; consuming the corpus ORDER BY (rank_in_stratum,
    * stratum) yields a round-robin interleave — every window of ~|strata|
    * consecutive examples touches every stratum once, the anti-clumping
    * property batch-mixture training wants. No global window: the rank is
    * one per-stratum hash shuffle, and the interleave itself is a plain
    * (parallel, range-partitioned) sort any engine reproduces.
    */
  def curriculumOrder(df: DataFrame, strataCol: String, idCol: String,
                      seed: Long = 42L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(concat_ws(":", lit(seed), col(idCol).cast("string"))),
        col(idCol))
    df.withColumn("rank_in_stratum", row_number().over(w))
  }

  /** CDC log → snapshot compaction: reduce an upsert/delete event log to
    * the latest state per key — the step that turns an append-only change
    * stream into the table downstream jobs actually read. For each key,
    * the event with the highest (`seqCol`, `tieCols`…) wins; if that
    * winning event satisfies `deleteWhen`, the key is absent from the
    * snapshot (a delete marker tombstones everything before it).
    *
    * One window pass = one hash shuffle on the keys; with
    * WindowGroupLimit, each partition keeps only its per-key winner before
    * the exchange, so the shuffle carries ~|keys| rows, not |log| rows.
    * Compose with `Sources.upsertRangePartitioned` to fold the snapshot
    * into a partitioned corpus copy-on-write.
    */
  def cdcSnapshot(log: DataFrame, keyCols: Seq[String], seqCol: String,
                  deleteWhen: Column,
                  tieCols: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col(seqCol).desc +: tieCols.map(col(_).desc)): _*)
    // coalesce: a NULL delete predicate (e.g. null event_type) must KEEP
    // the key — three-valued !NULL would silently tombstone it
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && coalesce(!deleteWhen, lit(true)))
      .drop("__rn")
  }
}
