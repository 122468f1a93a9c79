package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Mergeable-sketch properties: what makes the per-shard-sketch pattern
  * sound at 100 TB is that merging shard sketches answers like sketching
  * the whole corpus at once — shard count, shard order, and incremental
  * arrival must not move the estimate outside the sketch's error bound.
  * NOTE: merges are order-insensitive only within that bound, not
  * byte-identical — KLL compaction in particular keeps different survivors
  * under different merge orders — so these assert error bounds, not
  * equality (measured drift here is ~1%, well inside the 5%/2.5% margins
  * the driver queries certify).
  */
class SketchesSpec extends SparkTestBase {

  private lazy val docs = {
    Tables.register(spark, sfDir)
    spark.table("documents")
  }

  test("HLL: merged shard sketches answer like a single global sketch") {
    val sharded: Long = Sketches.distinctEstimate(docs, "text", col("doc_id") % 8)
      .collect()(0).getLong(0)
    val global: Long = Sketches.distinctEstimate(docs, "text", lit(0))
      .collect()(0).getLong(0)
    assert(math.abs(sharded - global) <= global * 0.02,
      s"shard-merge must track the one-shot sketch: $sharded vs $global")
  }

  test("HLL: estimate within 5% of exact, per group") {
    val est = Sketches.distinctEstimate(docs, "text", col("doc_id") % 8,
      groupCols = Seq("lang"))
    val exact = docs.groupBy("lang").agg(countDistinct(col("text")).as("exact"))
    val rows = exact.join(est, "lang").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val g = r.getAs[Long]("distinct_est").toDouble
      assert(math.abs(g - e) <= e * 0.05, s"lang=${r.get(0)}: est $g vs exact $e")
    }
  }

  test("HLL: incremental arrival — old shards' sketches are reusable as-is") {
    // history = sketches of shards 0..5 (persisted once); a new shard lands;
    // the refresh merges history ∪ new WITHOUT touching shards 0..5 rows
    val all = Sketches.hllShards(docs, "text", col("doc_id") % 8)
    val history = all.filter(col("shard") < 6)
    val fresh = Sketches.hllShards(
      docs.filter(col("doc_id") % 8 >= 6), "text", col("doc_id") % 8)
    val incremental: Long = Sketches.hllMerge(history.unionAll(fresh))
      .collect()(0).getLong(0)
    val oneShot: Long = Sketches.hllMerge(all).collect()(0).getLong(0)
    assert(math.abs(incremental - oneShot) <= oneShot * 0.02,
      s"$incremental vs $oneShot")
    val exact = docs.select("text").distinct().count()
    assert(math.abs(incremental - exact) <= exact * 0.05,
      s"incremental $incremental vs exact $exact")
  }

  test("KLL: merged shard quantiles carry rank error within bound") {
    val d = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("len"))
    val q = Sketches.kllQuantiles(
      Sketches.kllShards(d, "len", col("doc_id") % 8), Seq(0.5, 0.95))
      .collect()(0)
    val n = d.count().toDouble
    for ((target, v) <- Seq(0.5 -> q.getAs[Long]("p50"), 0.95 -> q.getAs[Long]("p95"))) {
      // with ties the item's rank is an interval [P(X<v), P(X≤v)]; the KLL
      // bound is on the rank, so certify interval-overlap, not CDF-at-v
      val lt = d.filter(col("len") < v).count() / n
      val le = d.filter(col("len") <= v).count() / n
      assert(lt <= target + 0.025 && le >= target - 0.025,
        s"p${(target * 100).round}: value $v has rank interval [$lt, $le]")
    }
  }

  test("KLL: every shard-merge order stays within the rank bound") {
    val d = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("len"))
    val n = d.count().toDouble
    val shards = Sketches.kllShards(d, "len", col("doc_id") % 8)
    for (ord <- Seq(col("shard").asc, col("shard").desc)) {
      val p50 = Sketches.kllQuantiles(shards.orderBy(ord), Seq(0.5))
        .collect()(0).getAs[Long]("p50")
      val lt = d.filter(col("len") < p50).count() / n
      val le = d.filter(col("len") <= p50).count() / n
      assert(lt <= 0.525 && le >= 0.475,
        s"order $ord: p50 $p50 rank interval [$lt, $le]")
    }
  }

  test("Theta: exact below nominal — estimates equal exact set cardinalities") {
    import graft.functions.ThetaFunctions._
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 2 === 0)
    val skA = Sketches.thetaMerge(Sketches.thetaShards(a, "doc_id", col("doc_id") % 8))
    val skB = Sketches.thetaMerge(Sketches.thetaShards(b, "doc_id", col("doc_id") % 8))
    val r = skA.select(col("theta").as("ta"))
      .crossJoin(skB.select(col("theta").as("tb")))
      .select(
        round(thetaEstimate(col("ta"))).as("ea"),
        round(thetaEstimate(col("tb"))).as("eb"),
        round(thetaIntersectEstimate(col("ta"), col("tb"))).as("ei"),
        round(thetaANotBEstimate(col("ta"), col("tb"))).as("ed"))
      .collect()(0)
    val exactA = a.count(); val exactB = b.count()
    val exactI = a.select("doc_id").intersect(b.select("doc_id")).count()
    assert(r.getDouble(0) == exactA && r.getDouble(1) == exactB,
      s"exact-mode estimates must be exact: $r vs ($exactA, $exactB)")
    assert(r.getDouble(2) == exactI && r.getDouble(3) == exactA - exactI,
      s"intersection/difference: $r vs ($exactI, ${exactA - exactI})")
  }

  test("Theta: shard-merge equals one-shot, any shard order") {
    import graft.functions.ThetaFunctions._
    val shards = Sketches.thetaShards(docs, "doc_id", col("doc_id") % 8)
    val oneShot = Sketches.thetaMerge(
      Sketches.thetaShards(docs, "doc_id", lit(0)))
      .select(thetaEstimate(col("theta"))).collect()(0).getDouble(0)
    for (ord <- Seq(col("shard").asc, col("shard").desc)) {
      val merged = Sketches.thetaMerge(shards.orderBy(ord))
        .select(thetaEstimate(col("theta"))).collect()(0).getDouble(0)
      assert(merged == oneShot, s"order $ord: $merged vs $oneShot")
    }
  }

  test("Theta: estimation mode stays within the RSE bound at 8x nominal occupancy") {
    import graft.functions.ThetaFunctions._
    val n = 32768L
    val d = spark.range(n).select(col("id"))
    val est = d.agg(thetaSketchAggLong(xxhash64(col("id")), 1 << 12).as("t"))
      .select(thetaEstimate(col("t"))).collect()(0).getDouble(0)
    // RSE ≈ 1/sqrt(4096) ≈ 1.6%; allow 4 sigma
    assert(math.abs(est - n) <= n * 0.064, s"est $est vs exact $n")
  }

  test("Theta: sketches and probes ride the wire") {
    import graft.functions.ThetaFunctions._
    val q = Sketches.thetaMerge(
        Sketches.thetaShards(docs, "doc_id", col("doc_id") % 4))
      .select(round(thetaEstimate(col("theta"))).as("est"))
    assertSameRows(q, graft.substrait.Serializer.roundtrip(spark, q))
  }

  test("FreqItems: bounds bracket exact counts for every key; merge == one-shot contract") {
    import graft.functions.FreqFunctions._
    import spark.implicits._
    // skewed stream: key k appears 2^(10-k) times for k = 0..9 (1024..2 +
    // noise keys), through a 16-counter map that must overflow
    val rows = (0 until 10).flatMap(k => Seq.fill(1 << (10 - k))(k.toLong)) ++
      (100L until 160L)
    val df = rows.toDF("k")
    val merged = Sketches.freqMerge(
      Sketches.freqShards(df, "k", col("k") % 7, maxMapSize = 16))
    val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val probe = exact.keys.toSeq.sorted.toDF("k")
      .crossJoin(broadcast(merged))
      .select(col("k"), freqLowerBoundLong(col("freq"), col("k")).as("lb"),
        freqUpperBoundLong(col("freq"), col("k")).as("ub"),
        freqEstimateLong(col("freq"), col("k")).as("est"),
        freqMaxError(col("freq")).as("me"))
      .collect()
    probe.foreach { r =>
      val (k, lb, ub, est, me) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      val ex = exact(k)
      assert(lb <= ex && ex <= ub, s"k=$k exact=$ex outside [$lb, $ub]")
      assert(est >= lb && est <= ub, s"k=$k estimate outside its own bounds")
      assert(ub - lb <= me, s"k=$k bound width ${ub - lb} exceeds maxError $me")
    }
    val me = probe.head.getLong(4)
    assert(me > 0, "16-counter map over 70 keys must overflow (else vacuous)")
    // no false negatives: every key with exact > maxError is bracketed with
    // a nonzero lower bound (the sketch still tracks it)
    exact.filter(_._2 > me).keys.foreach { k =>
      val r = probe.find(_.getLong(0) == k).get
      assert(r.getLong(1) > 0, s"heavy key $k lost by the sketch")
    }
    // probes ride the wire
    val q = merged.select(freqMaxError(col("freq")).as("me"))
    assertSameRows(q, graft.substrait.Serializer.roundtrip(spark, q))
  }
}
