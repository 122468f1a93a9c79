package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.substrait.Serializer

/** Format-independence of the substrait surface: the same wire bytes execute
  * against a table regardless of whether the catalog name is backed by
  * parquet, csv, or json (mirrors the reference's CSV-backed test context,
  * tests/roundtrip.rs:294-297).
  */
class SourcesSpec extends SparkTestBase {

  private lazy val dirs: Map[String, String] = {
    Tables.register(spark, sfDir)
    val nation = spark.table("nation")
    Seq("csv", "json", "orc").map { f =>
      val d = Files.createTempDirectory(s"graft_src_$f").toString
      Sources.write(nation, d, f)
      f -> d
    }.toMap
  }

  test("csv/json/orc register → identical rows to the parquet view") {
    val d0 = dirs // materialize fixtures (also registers the parquet views)
    val parquet = spark.table("nation")
    for ((f, d) <- d0) {
      Sources.register(spark, s"nation_$f", d, f,
        if (f == "orc") None else Some(parquet.schema))
      assertSameRows(parquet, spark.table(s"nation_$f"))
    }
  }

  test("substrait round-trip executes against a csv-backed NamedTable") {
    dirs // force registration fixtures
    Sources.register(spark, "nation_csv", dirs("csv"), "csv",
      Some(spark.table("nation").schema))
    val q = spark.sql(
      """SELECT n_regionkey, count(*) AS n FROM nation_csv
        |WHERE n_nationkey > 5 GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    assertRoundtrip(q)
  }

  test("csv/json without a schema are rejected loudly (no silent double scan)") {
    intercept[IllegalArgumentException](
      Sources.read(spark, dirs("csv"), "csv"))
    intercept[IllegalArgumentException](
      Sources.read(spark, "/tmp/nope", "avro", None))
  }

  test("bucketed tables co-locate: join and groupBy run with zero exchanges") {
    graft.Tables.register(spark, sfDir)
    Sources.writeBucketed(spark.table("orders")
      .select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", Seq("o_orderkey"), buckets = 4)
    Sources.writeBucketed(spark.table("lineitem")
      .select("l_orderkey", "l_quantity"),
      "lineitem_b", Seq("l_orderkey"), buckets = 4)
    // at sf0.001 the planner would broadcast these tiny tables (also
    // correct); disable it to expose the large-large path bucketing exists
    // for — the sort-merge join over aligned bucket files
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // large-large join: bucket files align, neither side shuffles
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
        .withColumn("x", col("o_totalprice") * col("l_quantity"))
      val jp = joined.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"), s"bucketed join must not shuffle:\n$jp")
      assert(joined.count() > 0)
      // aggregation on the bucket key also skips its exchange
      val agg = spark.table("lineitem_b").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$ap")
      // row parity with the unbucketed join
      val plain = spark.table("orders").join(spark.table("lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned sink: downstream scan prunes partitions") {
    Tables.register(spark, sfDir)
    val d = Files.createTempDirectory("graft_part").toString
    Sources.write(spark.table("orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus"), d, "parquet",
      partitionBy = Seq("o_orderstatus"))
    val scan = Sources.read(spark, d, "parquet")
      .filter(col("o_orderstatus") === "F")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"), plan)
    assert(scan.count() > 0)
  }

  test("compaction: target file count, even sizes, row-lossless") {
    Tables.register(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // tiny target forces a multi-file rewrite even at sf0.001
    Sources.compact(spark, s"$sfDir/documents.parquet", out,
      targetBytes = 8L * 1024)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2, s"expected a multi-file rewrite, got ${files.length}")
    // repartition (round-robin), not coalesce: sizes must be even-ish
    val sizes = files.map(_.length()).sorted
    assert(sizes.last <= sizes.head * 3,
      s"file sizes too skewed: ${sizes.mkString(", ")}")
    assertSameRows(spark.table("documents"), spark.read.parquet(out))
  }

  test("range-partitioned layout restores rows and partition-prunes") {
    Tables.register(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Sources.writeRangePartitioned(
      spark.table("documents").withColumn("len_band",
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("n_chars") / 1000).cast("int")),
      bucketCol = "len_band", path = out, sortCols = Seq("n_chars"))
    val back = spark.read.parquet(out)
    assertSameRows(
      spark.table("documents").select("doc_id", "text", "lang", "source", "n_chars"),
      back.select("doc_id", "text", "lang", "source", "n_chars"))
    val pruned = back.filter(org.apache.spark.sql.functions.col("len_band") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(len_band"), plan)
  }

  test("copy-on-write upsert rewrites only affected bands; untouched files identical") {
    Tables.register(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val docs = spark.table("documents").withColumn("len_band",
      floor(col("n_chars") / 100).cast("int"))
    Sources.writeRangePartitioned(docs, "len_band", out, sortCols = Seq("doc_id"))

    // batch touches only bands 2 and 3: replace one doc per band, insert one
    val mods = docs.filter(col("len_band").isin(2, 3))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("len_band").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("text", upper(col("text")))
    val ins = mods.withColumn("doc_id", col("doc_id") + 10000000L)
    val batch = mods.unionByName(ins)

    def snapshot(band: Int): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$out/len_band=$band")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val untouchedBands = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && !Seq("len_band=2", "len_band=3").contains(f.getName))
      .map(_.getName.stripPrefix("len_band=").toInt).toSeq
    assert(untouchedBands.nonEmpty, "fixture needs untouched bands")
    val before = untouchedBands.map(b => b -> snapshot(b)).toMap

    val touched = Sources.upsertRangePartitioned(spark, out, batch,
      "len_band", Seq("doc_id"), sortCols = Seq("doc_id"))
    assert(touched.map(_.toString.toInt).toSet == Set(2, 3))

    // untouched directories: same files, same bytes, same mtimes
    untouchedBands.foreach(b => assert(snapshot(b) == before(b),
      s"band $b was rewritten but not in the batch"))

    // merged content == anti-join + batch, computed independently
    val expected = docs
      .join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(batch)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assertSameRows(expected,
      spark.read.parquet(out).select("doc_id", "text", "lang", "source", "n_chars"))

    // second upsert over the same keys is idempotent (replace, not append)
    Sources.upsertRangePartitioned(spark, out, batch,
      "len_band", Seq("doc_id"), sortCols = Seq("doc_id"))
    assertSameRows(expected,
      spark.read.parquet(out).select("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("merge: I/U/D in one pass; a fully-deleted band's directory retires") {
    Tables.register(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_merge").toString
    val docs = spark.table("documents").withColumn("len_band",
      floor(col("n_chars") / 100).cast("int"))
    Sources.writeRangePartitioned(docs, "len_band", out, sortCols = Seq("doc_id"))
    val bands = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    // smallest band by row count gets FULLY deleted (the empty-band path);
    // band 2 gets one update + one insert; one untouched band must survive
    val counts = docs.groupBy("len_band").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val wipeBand = counts.minBy(_._2)._1
    assert(wipeBand != 2 && counts.size > 2, "fixture shape assumption")
    val del = docs.filter(col("len_band") === wipeBand).withColumn("op", lit("D"))
    val upd = docs.filter(col("len_band") === 2)
      .orderBy("doc_id").limit(1)
      .withColumn("text", upper(col("text"))).withColumn("op", lit("U"))
    val ins = upd.withColumn("doc_id", col("doc_id") + 10000000L)
      .withColumn("op", lit("I"))
    val batch = del.unionByName(upd).unionByName(ins)
    val touched = Sources.mergeRangePartitioned(spark, out, batch,
      "len_band", Seq("doc_id"), sortCols = Seq("doc_id"))
    assert(touched.map(_.toString.toInt).toSet == Set(wipeBand, 2))
    // the wiped band's directory is GONE; everything else still listed
    val after = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(after == bands - s"len_band=$wipeBand", s"dirs after merge: $after")
    // content == independent relational replay of the merge rule
    val expected = docs
      .join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(batch.filter(col("op") =!= "D")
        .select(docs.columns.toIndexedSeq.map(col): _*))
      .select("doc_id", "text", "lang", "source", "n_chars")
    assertSameRows(expected,
      spark.read.parquet(out).select("doc_id", "text", "lang", "source", "n_chars"))
    // a bad op value is rejected loudly before any mutation
    val ex = intercept[IllegalArgumentException] {
      Sources.mergeRangePartitioned(spark, out,
        del.withColumn("op", lit("X")), "len_band", Seq("doc_id"))
    }
    assert(ex.getMessage.contains("I/U/D"))
  }

  test("upsert crash recovery: dot-prefixed backup is invisible and restores") {
    Tables.register(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_upsert_cr").toString
    val docs = spark.table("documents").withColumn("len_band",
      floor(col("n_chars") / 100).cast("int"))
    Sources.writeRangePartitioned(docs, "len_band", out, sortCols = Seq("doc_id"))
    val band2 = docs.filter(col("len_band") === 2)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val nBand2 = band2.count()
    assert(nBand2 > 0, "fixture needs band 2 rows")

    // crash window A: swap died BETWEEN its two renames — live band gone,
    // only the dot-prefixed backup remains
    val live = new java.io.File(s"$out/len_band=2")
    val backup = new java.io.File(s"$out/.len_band=2.upsert-backup")
    assert(live.renameTo(backup))
    // partition discovery must NOT see the backup: the read succeeds and
    // simply lacks band 2 (a non-dot name here would double-count or break)
    assert(spark.read.parquet(out).filter(col("len_band") === 2).count() == 0)

    // the next upsert (touching band 2) restores the backup BEFORE reading
    // base — survivors come from the restored band, not an empty one
    val mod = band2.orderBy("doc_id").limit(1)
      .withColumn("text", upper(col("text")))
      .withColumn("len_band", lit(2).cast("int"))
    Sources.upsertRangePartitioned(spark, out, mod,
      "len_band", Seq("doc_id"), sortCols = Seq("doc_id"))
    assert(!backup.exists, "backup should be consumed by recovery")
    val after = spark.read.parquet(out).filter(col("len_band") === 2)
    assert(after.count() == nBand2, "restored band lost rows")
    val expected = band2.join(mod.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(mod.select("doc_id", "text", "lang", "source", "n_chars"))
    assertSameRows(expected,
      after.select("doc_id", "text", "lang", "source", "n_chars"))

    // crash window B: swap completed past the dst rename but died before
    // dropping the backup — both exist; a reader sees each row exactly ONCE
    // and recovery drops the stale backup
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(live.toString),
      fs, new org.apache.hadoop.fs.Path(backup.toString),
      false, spark.sparkContext.hadoopConfiguration)
    assert(spark.read.parquet(out).filter(col("len_band") === 2).count()
      == nBand2, "stale backup leaked into partition discovery")
    Sources.recoverUpsertBackups(spark, out, "len_band")
    assert(!backup.exists, "stale backup should be dropped")
    assert(spark.read.parquet(out).filter(col("len_band") === 2).count() == nBand2)
  }

  test("conformTo/readEvolved: null back-fill, widening casts, loud narrowing reject") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val canonical = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("tag", StringType)))
    val g1 = Seq((1, 2.5f)).toDF("id", "v") // int id, float v, no tag
    val out = Sources.conformTo(g1, canonical)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      canonical.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = out.head()
    assert(r.getLong(0) == 1L && math.abs(r.getDouble(1) - 2.5) < 1e-9 && r.isNullAt(2))
    // narrowing (long → int) rejects loudly
    val bad = StructType(Seq(StructField("id", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      Sources.conformTo(Seq(1L).toDF("id"), bad)
    }
    assert(e.getMessage.contains("lossless widening"))
    // union across drifted generations restores every row
    val d1 = java.nio.file.Files.createTempDirectory("graft_ev1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_ev2").toString
    Seq((1, 2.5f)).toDF("id", "v").write.mode("overwrite").parquet(d1)
    Seq((2L, 3.5, "x")).toDF("id", "v", "tag").write.mode("overwrite").parquet(d2)
    val u = Sources.readEvolved(spark, Seq(d1, d2), canonical).orderBy("id").collect()
    assert(u.length == 2 && u(0).isNullAt(2) && u(1).getString(2) == "x")
  }

  test("z-ordered layout is row-lossless and skips files on BOTH box dimensions") {
    import org.apache.spark.sql.functions._
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val nFiles = 16
    val zOut = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Sources.writeZOrdered(docs, Seq("doc_id", "n_chars"), zOut, numFiles = nFiles)
    assertSameRows(
      docs.select("doc_id", "text", "lang", "source", "n_chars"),
      spark.read.parquet(zOut).select("doc_id", "text", "lang", "source", "n_chars"))
    // single-column comparison layout: same file count, sorted by doc_id only
    val sOut = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    docs.repartitionByRange(nFiles, col("doc_id"))
      .sortWithinPartitions("doc_id").write.mode("overwrite").parquet(sOut)
    // per-file min/max decide stats-based skipping; count the files a
    // predicate on the SECOND dimension alone must touch — the layout
    // property parquet row-group/file pruning keys off
    def fileStats(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"),
        min("n_chars").as("c0"), max("n_chars").as("c1"))
    // n_chars-only predicate: the doc_id-sorted layout spreads every
    // n_chars value across ALL files (zero skipping possible); z-order
    // constrains n_chars's high bits per z-range → real skipping
    val zTouchC = fileStats(zOut)
      .filter(col("c1") >= 150 && col("c0") <= 250).count()
    val sTouchC = fileStats(sOut)
      .filter(col("c1") >= 150 && col("c0") <= 250).count()
    assert(sTouchC == nFiles,
      s"doc_id-sorted layout unexpectedly skipped n_chars files: $sTouchC")
    assert(zTouchC < sTouchC,
      s"z-order touched $zTouchC files on the n_chars band, sorted $sTouchC")
    // and the 2-D box (the p10 shape) touches a minority of files
    val zTouchBox = fileStats(zOut)
      .filter(col("d1") >= 100 && col("d0") <= 300 &&
        col("c1") >= 150 && col("c0") <= 350).count()
    assert(zTouchBox < nFiles, s"2-D box touched all $nFiles files")
  }

  test("versioned snapshots: time travel, isolation, crash orphans, vacuum") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_tt").toString + "/tbl"
    val v1data = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val v2data = Seq((1L, "a"), (3L, "c"), (4L, "d")).toDF("k", "v")
    assert(Sources.commitVersion(v1data, base) == 1L)
    assert(Sources.commitVersion(v2data, base) == 2L)
    assert(Sources.listVersions(spark, base) == Seq(1L, 2L))
    // time travel: v1 is intact AFTER v2 committed
    assertSameRows(v1data, Sources.readVersion(spark, base, Some(1L)))
    assertSameRows(v2data, Sources.readVersion(spark, base))
    // snapshot isolation: a plan built at v2 survives a LATER commit
    val pinned = Sources.readVersion(spark, base, Some(2L))
    Sources.commitVersion(Seq((9L, "z")).toDF("k", "v"), base)
    assertSameRows(v2data, pinned)
    // crash orphan: data files without a manifest are invisible
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((99L, "ghost")).toDF("k", "v")
      .write.parquet(s"$base/data/v99")
    assert(Sources.listVersions(spark, base) == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Sources.readVersion(spark, base, Some(99L))
    }
    // vacuum: old versions and the orphan go; survivors still read.
    // minOrphanAgeMs = 0: the v99 "in-flight" orphan is a planted ghost,
    // provably dead here (the default age guard protects real committers)
    assert(Sources.vacuumVersions(spark, base, keepLast = 2,
      minOrphanAgeMs = 0L) == Seq(1L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/data/v1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/data/v99")))
    assertSameRows(v2data, Sources.readVersion(spark, base, Some(2L)))
    intercept[IllegalArgumentException] {
      Sources.readVersion(spark, base, Some(1L))
    }
  }

  test("shallow clone: zero data bytes, pinned snapshot, isolated " +
    "divergence, vacuum safety, chained clones, delta refusal") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_clone").toString
    val src = s"$root/src"; val dst = s"$root/dst"; val dst2 = s"$root/dst2"
    val v1data = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sources.commitVersion(v1data, src)
    assert(Sources.cloneVersion(spark, src, dst) == 1L)
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ZERO data bytes under the clone: only the manifest exists
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/data")),
      "a shallow clone must not copy or write any data files")
    assertSameRows(v1data, Sources.readVersion(spark, dst))
    // divergence is local: clone v2 never touches src; src v2 never
    // reaches the clone
    val forked = Seq((1L, "a"), (9L, "z")).toDF("k", "v")
    Sources.commitVersion(forked, dst)
    Sources.commitVersion(Seq((7L, "s")).toDF("k", "v"), src)
    assertSameRows(forked, Sources.readVersion(spark, dst))
    assertSameRows(v1data, Sources.readVersion(spark, dst, Some(1L)))
    assertSameRows(v1data, Sources.readVersion(spark, src, Some(1L)))
    // clone of a clone pins the ORIGINAL files (absolute entries pass
    // through), so it survives the intermediate clone being deleted
    assert(Sources.cloneVersion(spark, dst, dst2, Some(1L)) == 1L)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    assertSameRows(v1data, Sources.readVersion(spark, dst2))
    // vacuum on a DIVERGED clone deletes only clone-local files: rebuild
    // a clone, diverge twice so v1 (pure source refs) retires
    val dst3 = s"$root/dst3"
    Sources.cloneVersion(spark, src, dst3, Some(1L))
    Sources.commitVersion(forked, dst3)
    Sources.commitVersion(forked, dst3)
    Sources.vacuumVersions(spark, dst3, keepLast = 1, minOrphanAgeMs = 0L)
    // the source table is untouched by the clone's vacuum
    assertSameRows(v1data, Sources.readVersion(spark, src, Some(1L)))
    // a cloned manifest refuses the delta-commit merge path loudly
    val dst4 = s"$root/dst4"
    Sources.cloneVersion(spark, src, dst4, Some(1L))
    val e = intercept[UnsupportedOperationException] {
      Sources.deltaCommit(spark, dst4,
        Seq((1L, "a", "I")).toDF("k", "v", "op"), "v", Seq("k"))
    }
    assert(e.getMessage.contains("materialize"), e.getMessage)
    // clone onto a non-empty table refuses
    val e2 = intercept[IllegalArgumentException] {
      Sources.cloneVersion(spark, src, dst3)
    }
    assert(e2.getMessage.contains("already has published versions"),
      e2.getMessage)
  }

  test("delta commits: file reuse, band retirement, band-pruned reads, vacuum") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_delta").toString + "/tbl"
    def mk(rows: Seq[(Long, String, Long)], op: String) =
      rows.toDF("k", "band", "x").withColumn("op", lit(op))
    // v1: three bands
    Sources.deltaCommit(spark, base,
      mk(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L)), "I"),
      "band", Seq("band", "k"))
    // v2 touches ONLY band a: update k=1, delete k=2, insert k=5
    val v2changes = mk(Seq((1L, "a", 11L)), "U")
      .unionByName(mk(Seq((2L, "a", 0L)), "D"))
      .unionByName(mk(Seq((5L, "a", 50L)), "I"))
    Sources.deltaCommit(spark, base, v2changes, "band", Seq("band", "k"))
    def manifest(v: Long): Set[String] = {
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(base, s"v$v.manifest"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toSet
      finally in.close()
    }
    val (m1, m2) = (manifest(1), manifest(2))
    // FILE REUSE: untouched bands' v1 files are listed verbatim in v2
    val untouched1 = m1.filter(f => !f.startsWith("data/band=a/"))
    assert(untouched1.nonEmpty && untouched1.subsetOf(m2),
      s"v2 must carry untouched v1 files: $untouched1 vs $m2")
    assert(m2.filter(_.startsWith("data/band=a/")).forall(_.contains("/v2-")),
      "band a must be fully rewritten by v2")
    // contents: v1 intact, v2 applied
    assertSameRows(
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L))
        .toDF("k", "band", "x"),
      Sources.deltaRead(spark, base, Some(1L)).select("k", "band", "x"))
    assertSameRows(
      Seq((1L, "a", 11L), (5L, "a", 50L), (3L, "b", 30L), (4L, "c", 40L))
        .toDF("k", "band", "x"),
      Sources.deltaRead(spark, base).select("k", "band", "x"))
    // v3: delete EVERYTHING in band b — the band disappears from v3
    Sources.deltaCommit(spark, base, mk(Seq((3L, "b", 0L)), "D"),
      "band", Seq("band", "k"))
    assert(!manifest(3).exists(_.startsWith("data/band=b/")),
      "a fully-deleted band must vanish from the manifest")
    assertSameRows(
      Seq((1L, "a", 11L), (5L, "a", 50L), (4L, "c", 40L)).toDF("k", "band", "x"),
      Sources.deltaRead(spark, base).select("k", "band", "x"))
    // band-pruned read: only band c's files scan
    assertSameRows(Seq((4L, "c", 40L)).toDF("k", "band", "x"),
      Sources.deltaReadBands(spark, base, Set("band=c")).select("k", "band", "x"))
    // vacuum to the last version: v1/v2 manifests gone, their exclusive
    // files deleted, v3 still reads
    val (dropped, deleted) = Sources.deltaVacuum(spark, base, keepLast = 1)
    assert(dropped == Seq(1L, 2L) && deleted >= 2, s"$dropped / $deleted")
    assertSameRows(
      Seq((1L, "a", 11L), (5L, "a", 50L), (4L, "c", 40L)).toDF("k", "band", "x"),
      Sources.deltaRead(spark, base).select("k", "band", "x"))
    intercept[IllegalArgumentException] {
      Sources.deltaRead(spark, base, Some(1L))
    }
    // first commit must be pure inserts
    val fresh = java.nio.file.Files.createTempDirectory("graft_delta2").toString + "/t"
    intercept[IllegalArgumentException] {
      Sources.deltaCommit(spark, fresh, mk(Seq((1L, "a", 1L)), "D"),
        "band", Seq("band", "k"))
    }
  }

  test("deltaDiff scans ONLY the files the two manifests do not share " +
    "and yields the exact added/removed multisets") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_vdiff").toString + "/tbl"
    def mk(rows: Seq[(Long, String, Long)], op: String) =
      rows.toDF("k", "band", "x").withColumn("op", lit(op))
    Sources.deltaCommit(spark, base,
      mk(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L)), "I"),
      "band", Seq("band", "k"))
    // v2 touches ONLY band a: update k=1, delete k=2, insert k=5
    Sources.deltaCommit(spark, base,
      mk(Seq((1L, "a", 11L)), "U")
        .unionByName(mk(Seq((2L, "a", 0L)), "D"))
        .unionByName(mk(Seq((5L, "a", 50L)), "I")),
      "band", Seq("band", "k"))
    val diff = Sources.deltaDiff(spark, base, 1L, 2L)
    // O(delta): the untouched b/c bands' carried files are never read
    val scanned = diff.inputFiles.map(u => new java.net.URI(u).getPath)
    assert(scanned.nonEmpty && scanned.forall(_.contains("/band=a/")),
      s"diff must scan only the differing band's files: ${scanned.toSeq}")
    assertSameRows(
      Seq((1L, "a", 11L, "A"), (5L, "a", 50L, "A"),
        (1L, "a", 10L, "R"), (2L, "a", 20L, "R"))
        .toDF("k", "band", "x", "change"),
      diff.select("k", "band", "x", "change"))
    // identical versions diff to empty (and don't blow up on no files)
    assert(Sources.deltaDiff(spark, base, 2L, 2L).count() == 0)
    // pure-addition diff: v3 inserts into band b; the carried-over row
    // (3,b,30) appears in both versions' band-b files and must CANCEL
    Sources.deltaCommit(spark, base, mk(Seq((6L, "b", 60L)), "I"),
      "band", Seq("band", "k"))
    assertSameRows(
      Seq((6L, "b", 60L, "A")).toDF("k", "band", "x", "change"),
      Sources.deltaDiff(spark, base, 2L, 3L).select("k", "band", "x", "change"))
  }

  test("deltaVacuum retention edge: a reader holding a retired version " +
    "fails LOUDLY, never returns partial rows") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_retention").toString + "/tbl"
    def mk(rows: Seq[(Long, String, Long)], op: String) =
      rows.toDF("k", "band", "x").withColumn("op", lit(op))
    Sources.deltaCommit(spark, base,
      mk(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)), "I"),
      "band", Seq("band", "k"))
    // v2 rewrites band a, so v1's band-a files become v1-exclusive
    Sources.deltaCommit(spark, base, mk(Seq((1L, "a", 11L)), "U"),
      "band", Seq("band", "k"))
    // a long-running reader resolves v1's file list NOW (plan-build time)
    val held = Sources.deltaRead(spark, base, Some(1L)).select("k", "band", "x")
    assert(held.count() == 3L, "pre-vacuum read must see all of v1")
    // retention passes v1: its exclusive files are deleted
    val (dropped, deleted) = Sources.deltaVacuum(spark, base, keepLast = 1)
    assert(dropped == Seq(1L) && deleted >= 1, s"$dropped / $deleted")
    // the held plan must now fail LOUDLY with the missing file surfaced —
    // a partial result (band b still exists!) would silently corrupt any
    // downstream consumer. This is the minimum-retention contract: size
    // deltaVacuum's keepLast above the longest-running reader.
    val e = intercept[Exception] { held.count() }
    def rootChain(t: Throwable): List[Throwable] =
      t :: Option(t.getCause).map(rootChain).getOrElse(Nil)
    assert(rootChain(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        c.getMessage != null && c.getMessage.contains("FILE_NOT_EXIST") ||
        c.getMessage != null && c.getMessage.contains("does not exist")),
      s"expected a missing-file failure, got: $e")
    // and the surviving version still reads exactly
    assertSameRows(
      Seq((1L, "a", 11L), (2L, "a", 20L), (3L, "b", 30L)).toDF("k", "band", "x"),
      Sources.deltaRead(spark, base).select("k", "band", "x"))
  }

  test("object-store schemes are rejected loudly BEFORE any data stages") {
    import spark.implicits._
    // a RawLocalFileSystem wearing an s3a URI: rename there is copy+delete
    // with silent replace, so the capability probe must refuse commits at
    // table-create time (the Delta-on-S3 "bring a commit coordinator" rule)
    spark.sparkContext.hadoopConfiguration.set("fs.s3a.impl",
      classOf[FauxObjectStoreFileSystem].getName)
    val df = Seq((1L, "en", "I")).toDF("id", "lang", "op")
    val e = intercept[UnsupportedOperationException](
      Sources.commitVersion(df.drop("op"), "s3a://faux/tbl"))
    assert(e.getMessage.contains("commit coordinator"), e.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      Sources.deltaCommit(spark, "s3a://faux/tbl2", df, "lang",
        Seq("lang", "id")))
    assert(e2.getMessage.contains("commit coordinator"), e2.getMessage)
    // nothing was staged: the probe fired before mkdirs/write
    assert(!new java.io.File("/faux").exists())
  }

  test("a manifest published by ANOTHER process loses the commit loudly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_excl").toString + "/tbl"
    val df = Seq((1L, "x")).toDF("id", "src")
    Sources.commitVersion(df, base) // v1
    // forge v2 INSIDE the publish window (after this writer resolved its
    // target version), as if a separate PROCESS had published first — the
    // in-JVM lock cannot have serialized that writer, so only the
    // filesystem-level exclusivity can save the commit
    val once = new java.util.concurrent.atomic.AtomicBoolean(false)
    Sources.beforePublishHook = () =>
      if (once.compareAndSet(false, true))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$base/v2.manifest"),
          "data/vX-forged/part-0.parquet\n".getBytes("UTF-8"))
    try intercept[ConcurrentCommitException](Sources.commitVersion(df, base))
    finally Sources.beforePublishHook = () => ()
    // the loser left no dot-temp litter and no second manifest
    val names = new java.io.File(base).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith(".tmp.")), names.mkString(","))
    assert(names.count(_.endsWith(".manifest")) == 2, names.mkString(","))
    // CAS retry from this JVM lands v3 (forged v2 stays untouched)
    assert(Sources.commitVersion(df, base) == 3L)
  }
}

/** Test shim: local semantics, object-store scheme — lets the capability
  * probe be exercised without network. Rename on real object stores is
  * copy+delete with silent replace; the probe refuses before any I/O, so
  * none of RawLocalFileSystem's actual behavior is reached. */
class FauxObjectStoreFileSystem
  extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a://faux")
}
