package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class PipelineSpec extends SparkTestBase {

  private def docs = { Tables.register(spark, sfDir); spark.table("documents") }

  test("prepareCorpus keeps one survivor per digest and stays under input size") {
    val out = Pipeline.prepareCorpus(docs)
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    assert(out.select("digest").distinct().count() == n)
  }

  test("salted join equals plain join") {
    Tables.register(spark, sfDir)
    val o = spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val c = spark.table("customer").select("c_custkey", "c_name")
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name").collect().map(_.toString).sorted
    val salted = Pipeline.saltedJoin(o, c, "o_custkey", "c_custkey", salts = 4)
      .select("o_orderkey", "c_name").collect().map(_.toString).sorted
    assert(plain.sameElements(salted))
  }

  test("weightedSample: deterministic, size near k, weight-proportional, k-monotone") {
    val d = docs.select(col("doc_id"), col("n_chars"))
    val k = 80.0
    val got = Pipeline.weightedSample(d, "n_chars", k)
    // deterministic under repartitioning
    assertSameRows(got, Pipeline.weightedSample(d.repartition(13), "n_chars", k))
    // matches a driver-side replay of the exact same arithmetic
    val tot = d.agg(sum(col("n_chars").cast("double"))).collect()(0).getDouble(0)
    val expected = d.select("doc_id", "n_chars").collect().filter { r =>
      val id = r.getLong(0); val w = r.getLong(1).toDouble
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5.take(13), 16).toDouble / 4503599627370496.0
      u * tot < w * k
    }.map(_.getLong(0)).toSet
    val gotIds = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expected,
      s"engine/replay mismatch: ${gotIds.diff(expected)} / ${expected.diff(gotIds)}")
    // expected size k — allow 4 sigma of a Poisson-ish sample
    assert(math.abs(gotIds.size - k) <= 4 * math.sqrt(k),
      s"sample size ${gotIds.size} far from expected $k")
    // k-monotone: a smaller target is a subset of a larger one (same seed)
    val smaller = Pipeline.weightedSample(d, "n_chars", 30.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(gotIds), "k-monotonicity violated")
    // inclusion rate must grow with weight: top-quartile tokens vs bottom
    val q = d.stat.approxQuantile("n_chars", Array(0.25, 0.75), 0.0)
    val loIds = d.filter(col("n_chars") <= q(0)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val hiIds = d.filter(col("n_chars") >= q(1)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val loRate = loIds.count(gotIds).toDouble / loIds.size
    val hiRate = hiIds.count(gotIds).toDouble / hiIds.size
    assert(hiRate > loRate, s"weighting inert: hi $hiRate vs lo $loRate")
  }

  test("shuffleShards: complete, contiguous per-shard positions, deterministic, balanced") {
    val n = docs.count()
    val out = Pipeline.shuffleShards(docs, numShards = 8)
    assert(out.count() == n, "every row exactly once")
    assert(out.select("doc_id").distinct().count() == n)
    // per shard: pos is exactly 1..size (dense, no gaps or dups)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("sz"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("np")).collect()
    assert(perShard.length == 8, s"expected 8 shards, got ${perShard.length}")
    perShard.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("sz")
        && r.getAs[Long]("np") == r.getAs[Long]("sz"), s"ragged shard: $r")
    }
    // md5 uniformity keeps shards balanced
    val sizes = perShard.map(_.getAs[Long]("sz"))
    assert(sizes.max <= sizes.min * 3, s"skewed shards: ${sizes.mkString(",")}")
    // reruns and repartitioned inputs reproduce the identical order
    assertSameRows(out.select("doc_id", "shard", "pos"),
      Pipeline.shuffleShards(docs.repartition(13), numShards = 8)
        .select("doc_id", "shard", "pos"))
    // a different seed produces a different order (not a constant function)
    val reseeded = Pipeline.shuffleShards(docs, numShards = 8, seed = 7L)
      .select("doc_id", "shard", "pos")
    assert(out.select("doc_id", "shard", "pos").except(reseeded).count() > 0)
  }

  test("bloom-prefiltered join equals plain join, and the probe sits below the join") {
    Tables.register(spark, sfDir)
    val li = spark.table("lineitem").select("l_orderkey", "l_extendedprice")
    val dim = spark.table("orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_extendedprice", "o_orderpriority")
    for (fpp <- Seq(0.5, 0.01)) { // high fpp: many false positives, same rows
      val bloomed = Pipeline.bloomPrefilteredJoin(li, dim,
          "l_orderkey", "o_orderkey", fpp = fpp)
        .select("l_orderkey", "l_extendedprice", "o_orderpriority")
      assertSameRows(plain, bloomed)
    }
    val semi = Pipeline.bloomPrefilteredJoin(li, dim,
      "l_orderkey", "o_orderkey", joinType = "left_semi")
    assertSameRows(
      li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi"), semi)
    // plan shape: the might_contain filter must be on the fact side BELOW
    // the join, not applied to the join output
    val plan = Pipeline.bloomPrefilteredJoin(li, dim, "l_orderkey", "o_orderkey")
      .queryExecution.optimizedPlan
    val filterBelowJoin = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.left.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("might_contain") => f
        }.isDefined
    }
    assert(filterBelowJoin.contains(true),
      s"might_contain not below the join:\n$plan")
    intercept[IllegalArgumentException] {
      Pipeline.bloomPrefilteredJoin(li, dim, "l_orderkey", "o_orderkey",
        joinType = "left")
    }
  }

  test("bucketed tables join without a shuffle") {
    Tables.register(spark, sfDir)
    Pipeline.writeBucketed(
      spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_custkey", 8)
    Pipeline.writeBucketed(
      spark.table("customer").select("c_custkey", "c_name"),
      "customer_b", "c_custkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      // co-located result still correct
      val expected = spark.table("orders").join(spark.table("customer"),
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join spreads a hot key across salt partitions") {
    import spark.implicits._
    // one pathological key: 10k rows of key=1 against a small dim
    val big = spark.range(10000).select(lit(1L).as("k"), col("id"))
      .union(spark.range(100).select((col("id") + 2).as("k"), col("id")))
    val dim = Seq((1L, "hot"), (50L, "cold")).toDF("dk", "name")
    val joined = Pipeline.saltedJoin(big, dim, "k", "dk", salts = 8)
    assert(joined.count() == 10000 + 1)
    // the hot key's probe rows carry ≥2 distinct salts (spread achieved)
    val saltSrc = big.columns.toSeq.map(col)
    val spread = big.filter(col("k") === 1)
      .select(pmod(xxhash64(saltSrc: _*), lit(8L)).as("s"))
      .distinct().count()
    assert(spread >= 2)
  }

  test("deterministic split: disjoint, complete, stable, near the fractions") {
    val d = docs
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Pipeline.deterministicSplit(d, "doc_id", fr)
    val counts = s1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = d.count()
    assert(counts.values.sum == n, "every row lands in exactly one split")
    assert(counts.keySet == Set("train", "val", "test"))
    // 500 docs: loose tolerance, but train must dominate
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    assert(math.abs(counts("train") - 0.8 * n) < 0.1 * n)
    // stability: identical assignment on re-computation and re-ordering
    val s2 = Pipeline.deterministicSplit(d.orderBy(col("doc_id").desc), "doc_id", fr)
    assertSameRows(s1.select("doc_id", "split"), s2.select("doc_id", "split"))
  }

  test("deterministic split rejects fractions that don't sum to 1") {
    intercept[IllegalArgumentException](
      Pipeline.deterministicSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("packSequences: offsets are the exact prefix sums, bins cover the stream") {
    import spark.implicits._
    val d = Seq((1L, "en", 600), (2L, "en", 600), (3L, "en", 100),
      (4L, "fr", 2000), (5L, "fr", 10)).toDF("doc_id", "lang", "n_tokens")
    val p = Pipeline.packSequences(d, "n_tokens", "doc_id", budget = 1024,
      byCols = Seq("lang")).orderBy("doc_id").collect()
    val offs = p.map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // en: offsets 0, 600, 1200 -> bins 0, 0, 1; fr: offsets 0, 2000 -> bins 0, 1
    assert(offs.toSeq == Seq((1L, 0L, 0L), (2L, 600L, 0L), (3L, 1200L, 1L),
      (4L, 0L, 0L), (5L, 2000L, 1L)))
  }

  test("writePackedShards: one sorted file per shard dir, prunable, deterministic") {
    import spark.implicits._
    val d = (1L to 200L).map(i => (i, if (i % 3 == 0) "fr" else "en",
      100 + (i % 7).toInt * 50)).toDF("doc_id", "lang", "n_tokens")
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Pipeline.writePackedShards(d, "n_tokens", "doc_id", budget = 1024,
      byCols = Seq("lang"), outDir = out, binsPerShard = 4)
    val back = spark.read.parquet(out)
    // complete: every row lands in exactly one shard
    assert(back.count() == 200)
    // shard membership is the bin arithmetic, bins are consecutive per shard
    val byShard = back.groupBy("lang", "shard_id")
      .agg(min("bin_id").as("lo"), max("bin_id").as("hi"))
      .collect()
    byShard.foreach { r =>
      // shard_id is a partition column — parquet reads it back as int
      val sid = r.getAs[Number]("shard_id").longValue
      val (lo, hi) = (r.getLong(2), r.getLong(3))
      assert(lo >= sid * 4 && hi < (sid + 1) * 4, r.toString)
    }
    // exactly one data file per shard directory (no compaction needed)
    val shardDirs = new java.io.File(out).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles.filter(_.isDirectory))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { dir =>
      val files = dir.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${dir} has ${files.length} files")
    }
    // rows inside a shard file are sorted by stream offset (reader streams
    // the token stream front to back)
    val oneShard = back.filter(col("lang") === "en" && col("shard_id") === 0)
      .select("stream_offset").collect().map(_.getLong(0))
    // partition pruning: reading one shard touches one directory
    val pruned = spark.read.parquet(out)
      .filter(col("lang") === "en" && col("shard_id") === 0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    assert(oneShard.nonEmpty && oneShard.sameElements(oneShard.sorted))
    // deterministic: a second write produces identical shard contents
    val out2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    Pipeline.writePackedShards(d, "n_tokens", "doc_id", budget = 1024,
      byCols = Seq("lang"), outDir = out2, binsPerShard = 4)
    val a = spark.read.parquet(out).orderBy("lang", "shard_id", "stream_offset")
      .collect().map(_.toString).toSeq
    val b = spark.read.parquet(out2).orderBy("lang", "shard_id", "stream_offset")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("stratifiedSample: deterministic, per-stratum, membership-stable") {
    val d = docs
    val s1 = Pipeline.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 0.5, "fr" -> 1.0), default = 0.0)
    val byLang = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frTotal = d.filter(col("lang") === "fr").count()
    assert(byLang.getOrElse("fr", 0L) == frTotal, "fraction 1.0 keeps everything")
    assert(!byLang.contains("de") && !byLang.contains("es"),
      "default 0.0 drops unlisted strata")
    val enTotal = d.filter(col("lang") === "en").count()
    assert(math.abs(byLang.getOrElse("en", 0L) - 0.5 * enTotal) < 0.2 * enTotal)
    // growing the corpus never drops a previously selected doc
    val shrunk = Pipeline.stratifiedSample(d.filter(col("doc_id") < 250),
      "doc_id", "lang", Map("en" -> 0.5, "fr" -> 1.0))
    val fullIds = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    shrunk.select("doc_id").collect().map(_.getLong(0))
      .foreach(id => assert(fullIds.contains(id), s"doc $id churned"))
  }

  test("skewReport: hot key first with exact share, deterministic ties") {
    import spark.implicits._
    val d = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "b")).toDF("k")
    val r = Pipeline.skewReport(d, "k", k = 2).collect()
    assert(r.length == 2)
    assert(r(0).getString(0) == "hot" && r(0).getLong(1) == 6)
    assert(math.abs(r(0).getDouble(2) - 0.6) < 1e-9)
    assert(r(1).getString(0) == "a", "count tie must break on the key")
  }

  test("profile: one-pass stats including nulls; approx variant stays sane") {
    import spark.implicits._
    val d = Seq((1L, Option("a")), (2L, None), (3L, Option("b")),
      (3L, Option("a"))).toDF("id", "s")
    val p = Pipeline.profile(d, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val idr = p("id")
    assert(idr.getLong(1) == 4 && idr.getLong(2) == 0 && idr.getLong(3) == 3)
    assert(idr.getString(4) == "1" && idr.getString(5) == "3")
    val sr = p("s")
    assert(sr.getLong(2) == 1 && sr.getLong(3) == 2)
    assert(sr.getString(4) == "a" && sr.getString(5) == "b")
    val ap = Pipeline.profile(d, Seq("id"), approx = true).collect()(0)
    assert(math.abs(ap.getLong(3) - 3L) <= 1, "HLL on 3 values is near-exact")
  }

  test("mixtureSample: deterministic, rate-accurate, membership-monotone") {
    val d = docs
    val s1 = Pipeline.mixtureSample(d, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 1.0), default = 0.0)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Pipeline.mixtureSample(d, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 1.0), default = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "same rates must select the same docs")
    val byLang = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("zh", 0L) == d.filter(col("lang") === "zh").count(),
      "rate 1.0 keeps everything")
    assert(!byLang.contains("de"), "default 0.0 drops unlisted strata")
    val enTotal = d.filter(col("lang") === "en").count()
    assert(math.abs(byLang.getOrElse("en", 0L) - 0.5 * enTotal) < 0.2 * enTotal)
    // raising a rate only ADDS docs (the draw compares against a higher cut)
    val raised = Pipeline.mixtureSample(d, "doc_id", "lang",
      Map("en" -> 0.9, "zh" -> 1.0), default = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(raised), "raising rates must never drop a member")
  }

  test("temperatureMix: sqrt reweighting favors small domains, hits the target, deterministic") {
    import spark.implicits._
    // skewed corpus: 900 'en', 90 'de', 10 'zh'
    val d = ((0 until 900).map(i => (i.toLong, "en")) ++
      (900 until 990).map(i => (i.toLong, "de")) ++
      (990 until 1000).map(i => (i.toLong, "zh"))).toDF("doc_id", "lang")
    val kept = Pipeline.temperatureMix(d, "doc_id", "lang", targetFraction = 0.5)
    val cuts = kept.select("lang", "cut").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // expected rates: w ∝ √n → en 30, de ~9.49, zh ~3.16 (norm ~42.65);
    // rate_d = 0.5·1000·w_d/(norm·n_d) → en ~0.352, de ~1 (capped), zh 1
    assert(cuts("zh") == 65536 && cuts("de") == 65536,
      s"small domains must keep everything: $cuts")
    assert(cuts("en") < 30000 && cuts("en") > 20000,
      s"head domain must downsample to ~0.35: $cuts")
    // replay the exact arithmetic
    val wEn = math.floor(math.sqrt(900.0) * 1048576).toLong
    val wDe = math.floor(math.sqrt(90.0) * 1048576).toLong
    val wZh = math.floor(math.sqrt(10.0) * 1048576).toLong
    val norm = (wEn + wDe + wZh).toDouble
    val expEn = math.floor(math.min(1.0,
      0.5 * 1000.0 * wEn / (norm * 900.0)) * 65536).toInt
    assert(cuts("en") == expEn, s"cut must equal the quantized rate: $cuts vs $expEn")
    // deterministic + membership-monotone in the target
    val again = Pipeline.temperatureMix(d, "doc_id", "lang", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again)
    val larger = Pipeline.temperatureMix(d, "doc_id", "lang", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(larger), "raising the target must never drop a member")
    // kept size near the target overall
    assert(math.abs(ids.size - 500.0) < 120, s"kept ${ids.size} of 1000")
    // null domains form their own stratum — never silently dropped
    val withNull = d.withColumn("lang",
      when(col("doc_id") % 10 === 0, lit(null)).otherwise(col("lang")))
    val keptNull = Pipeline.temperatureMix(withNull, "doc_id", "lang", 0.5)
    assert(keptNull.filter(col("lang").isNull).count() > 0,
      "null-domain rows must participate in the mix")
    assert(keptNull.columns.toSeq == withNull.columns.toSeq :+ "cut",
      "no helper columns may leak")
  }

  test("negative sampling: deterministic, self-free, covering, spread") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val n = docs.count()
    val pairs = Pipeline.negativePairs(docs, k = 4).cache()
    try {
      // no self pairs; every anchor draws, keeping >= k-1
      assert(pairs.filter(col("anchor_id") === col("neg_id")).count() == 0)
      val perAnchor = pairs.groupBy("anchor_id").count()
      assert(perAnchor.count() == n, "every document must anchor")
      assert(perAnchor.filter(col("count") < 3).count() == 0)
      // deterministic: a second independent run draws identical pairs
      assertSameRows(pairs, Pipeline.negativePairs(docs, k = 4))
      // spread: no partner is drawn wildly above the uniform expectation
      // (expected in-degree = k; bound is loose on purpose — hash draws over
      // uneven bucket sizes are near-uniform, not exactly uniform)
      val maxIn = pairs.groupBy("neg_id").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(maxIn <= 4 * 12, s"partner in-degree $maxIn too concentrated")
    } finally pairs.unpersist()
  }

  test("stratifiedWeightedSample: per-stratum sizes, weight-proportional, deterministic") {
    Tables.register(spark, sfDir)
    import org.apache.spark.sql.functions._
    val docs = spark.table("documents")
    val k = 20.0
    val got = Pipeline.stratifiedWeightedSample(docs, "n_chars", "lang", k)
    // deterministic membership
    val ids1 = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Pipeline.stratifiedWeightedSample(docs, "n_chars", "lang", k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // every stratum lands within 4 sigma of k
    val counts = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      val c = counts.getOrElse(l, 0L).toDouble
      assert(math.abs(c - k) <= 4 * math.sqrt(k), s"$l drew $c for k=$k")
    }
    // longer docs are kept at a higher rate (weight-proportionality):
    // compare keep rates of the top and bottom length halves within en
    val en = docs.filter(col("lang") === "en")
    val med = en.stat.approxQuantile("n_chars", Array(0.5), 0.0).head
    val topRate = got.filter(col("lang") === "en" && col("n_chars") > med).count().toDouble /
      math.max(en.filter(col("n_chars") > med).count(), 1)
    val botRate = got.filter(col("lang") === "en" && col("n_chars") <= med).count().toDouble /
      math.max(en.filter(col("n_chars") <= med).count(), 1)
    assert(topRate > botRate, s"PPS must favor heavier rows ($topRate vs $botRate)")
  }

  test("curriculumOrder: round-robin interleave property + determinism") {
    Tables.register(spark, sfDir)
    import org.apache.spark.sql.functions._
    val docs = spark.table("documents")
    val ordered = Pipeline.curriculumOrder(docs, "lang", "doc_id")
      .orderBy("rank_in_stratum", "lang")
      .select("lang").collect().map(_.getString(0))
    val nLangs = docs.select("lang").distinct().count().toInt
    // in the full prefix where every stratum still has members, each
    // window of nLangs consecutive rows covers all langs exactly once
    val minCount = docs.groupBy("lang").count()
      .agg(min("count")).head().getLong(0).toInt
    for (w <- 0 until minCount) {
      val window = ordered.slice(w * nLangs, (w + 1) * nLangs)
      assert(window.toSet.size == nLangs,
        s"window $w not a full interleave: ${window.mkString(",")}")
    }
    // deterministic across runs
    val again = Pipeline.curriculumOrder(docs, "lang", "doc_id")
      .orderBy("rank_in_stratum", "lang").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val first = Pipeline.curriculumOrder(docs, "lang", "doc_id")
      .orderBy("rank_in_stratum", "lang").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(again == first)
  }

  test("cdcSnapshot: latest wins, delete markers tombstone, ties break on tieCols") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val log = Seq(
      (1L, 10L, 1L, "upsert", "a"),   // overwritten by seq 2
      (1L, 2L, 2L, "upsert", "b"),    // winner for key 1
      (2L, 5L, 1L, "upsert", "x"),
      (2L, 9L, 2L, "delete", "-"),    // key 2 tombstoned
      (3L, 7L, 1L, "upsert", "p"),
      (3L, 8L, 1L, "upsert", "q")     // same seq → higher uid (8) wins
    ).toDF("key", "uid", "seq", "op", "payload")
    val snap = Pipeline.cdcSnapshot(log, Seq("key"), "seq",
        deleteWhen = col("op") === "delete", tieCols = Seq("uid"))
      .orderBy("key").collect()
    assert(snap.map(r => (r.getLong(0), r.getString(4))).toSeq ==
      Seq((1L, "b"), (3L, "q")))
  }
}
