package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format table sources and sinks.
  *
  * Substrait carries NO storage information — a ReadRel names a table and the
  * host's catalog decides where the bytes live (the reference resolves names
  * against whatever its SessionContext registered; its own tests run over CSV
  * — reference: tests/roundtrip.rs:294-297). This module is that host-side
  * registration surface for Spark: any supported format registered under a
  * name becomes scannable by every wire-round-tripped query.
  *
  * Scale notes: parquet is the 100 TB format (columnar, predicate/projection
  * pushdown, splittable); csv/json scans are splittable but row-oriented —
  * schema must be supplied (inference would scan the data twice) and filters
  * only prune AFTER parse. The sink side writes partitioned directories so
  * downstream scans can partition-prune.
  */
/** Loud loser of a commit race at the manifest publish point: the version
  * it tried to publish was already published by a concurrent committer.
  * The retry protocol is to re-read the latest version and commit at the
  * next one — [[Sources.commitVersion]]/[[Sources.deltaCommit]] do this
  * automatically when `maxRetries > 0`. */
class ConcurrentCommitException(msg: String) extends IllegalStateException(msg)

object Sources {

  val SupportedFormats: Set[String] = Set("parquet", "csv", "json", "orc")

  /** Read a table in any supported format. `schema` is required for csv/json
    * (schema inference at corpus scale means reading everything twice);
    * parquet/orc carry their own.
    */
  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    require(SupportedFormats.contains(format), s"unsupported format $format")
    require(schema.isDefined || format == "parquet" || format == "orc",
      s"$format needs an explicit schema — inference scans the data twice")
    val r0: DataFrameReader = spark.read.format(format).options(defaults(format) ++ options)
    val r = schema.fold(r0)(r0.schema)
    r.load(path)
  }

  /** Register `path` as temp view `name`, making it a substrait NamedTable. */
  def register(spark: SparkSession, name: String, path: String, format: String,
               schema: Option[StructType] = None,
               options: Map[String, String] = Map.empty): Unit =
    read(spark, path, format, schema, options).createOrReplaceTempView(name)

  /** Write a frame in any supported format, optionally hive-partitioned by
    * low-cardinality columns so downstream scans partition-prune.
    */
  def write(df: DataFrame, path: String, format: String,
            partitionBy: Seq[String] = Nil,
            options: Map[String, String] = Map.empty,
            mode: String = "overwrite"): Unit = {
    require(SupportedFormats.contains(format), s"unsupported format $format")
    val w0 = df.write.format(format).options(defaults(format) ++ options).mode(mode)
    val w = if (partitionBy.isEmpty) w0 else w0.partitionBy(partitionBy: _*)
    w.save(path)
  }

  /** csv gets a header (self-describing for humans; the schema still comes
    * from the caller on read); json is JSON-lines by default in Spark.
    */
  private def defaults(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true")
    case _ => Map.empty
  }

  /** Save `df` as a catalog table bucketed (and sorted) by the join/agg key.
    *
    * THE co-location primitive at 100 TB: two tables bucketed into the same
    * bucket count on the same key sort-merge-join with ZERO exchange on
    * either side (each task reads matching bucket files directly), and a
    * groupBy on the bucket key skips its exchange the same way. Worth it for
    * any fact table joined repeatedly on one key; the write pays one shuffle
    * once, every downstream join saves one per side forever after.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, format: String = "parquet",
                    mode: String = "overwrite",
                    path: Option[String] = None): Unit = {
    val w = df.write.format(format).mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
    // explicit path → external table: data lands at the caller's location
    // (not the session warehouse), catalog carries only the bucket metadata
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Small-file compaction: rewrite a parquet dataset into
    * ⌈bytes/targetBytes⌉ evenly-sized files. Streaming sinks and
    * fine-grained ingest leave thousands of KB-sized files per partition;
    * at 100 TB that turns every downstream scan's task scheduling and
    * footer-reading into the bottleneck (and S3 listing into a DOS).
    * Content is byte-for-byte the same rows — certified by the p08 oracle.
    * Uses repartition (one round-robin shuffle) rather than coalesce:
    * coalesce is narrow but inherits input skew, and a compaction job's
    * whole point is even output sizes.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 512L * 1024 * 1024): Int = {
    val in = new java.io.File(inPath)
    val bytes =
      if (in.isDirectory) in.listFiles().map(_.length()).sum else in.length()
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Range-partitioned layout: directory-per-bucket of a derived range
    * column (date, length band, shard) with rows sorted within partitions.
    * The layout every 100 TB corpus query leans on: a filter on the bucket
    * column prunes whole DIRECTORIES at plan time (PartitionFilters — the
    * same mechanism Ivf.searchPruned certifies) and the within-file sort
    * gives parquet row-group min/max stats their skipping power for range
    * predicates on the sort key.
    */
  def writeRangePartitioned(df: DataFrame, bucketCol: String, path: String,
                            sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
    sorted.write.mode("overwrite").partitionBy(bucketCol).parquet(path)
  }

  /** Conform a frame to a canonical schema: columns reorder, missing
    * columns fill with typed nulls, and types WIDEN along the lossless
    * parquet-evolution lattice (byte/short/int→long, float→double,
    * int→double) — anything else (narrowing, renames, type flips)
    * rejects loudly instead of silently corrupting. The per-generation
    * half of [[readEvolved]].
    */
  def conformTo(df: DataFrame, canonical: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types._
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType | ShortType | IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType | LongType | FloatType, DoubleType) => true
      case _ => false
    }
    val cols = canonical.fields.map { f =>
      df.schema.fields.find(_.name == f.name) match {
        case Some(cur) if cur.dataType == f.dataType => col(f.name)
        case Some(cur) if widens(cur.dataType, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(cur) => throw new IllegalArgumentException(
          s"cannot conform column ${f.name}: ${cur.dataType} -> ${f.dataType} is not a lossless widening")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Read a corpus whose generations were written with DRIFTED schemas —
    * added columns, int→long / float→double widenings — as ONE frame in
    * the canonical schema. Spark's own mergeSchema handles added columns
    * but FAILS on widened primitives ("Failed to merge incompatible data
    * types"); this reads each generation with its own schema, conforms it
    * (nulls + widening casts, loud on anything lossy), and unions — at
    * 100 TB this is how five years of crawl generations stay one logical
    * table without a petabyte rewrite.
    */
  def readEvolved(spark: SparkSession, paths: Seq[String],
                  canonical: StructType): DataFrame =
    paths.map(p => conformTo(spark.read.parquet(p), canonical))
      .reduce(_.unionByName(_))

  /** Copy-on-write upsert into a `writeRangePartitioned` layout: merge
    * `updates` (full rows, same schema as the corpus, `keyCols` as row
    * identity) into `basePath`, rewriting ONLY the partition directories
    * whose `bucketCol` value appears in the batch. Rows whose key exists
    * are replaced by the update; new keys are inserts (including into
    * brand-new bucket values).
    *
    * THE incremental-maintenance primitive at 100 TB: a daily batch that
    * touches 1% of the bands costs 1% of a full rewrite — the untouched
    * 99% of directories are never read, never written, byte-identical
    * after the merge (SourcesSpec asserts exactly that). The affected-
    * bucket list is collected to the driver (bounded by the number of
    * touched bands, the same driver-side pruning lever Ivf.searchPruned
    * uses) and prunes the corpus read to those directories at plan time.
    * The swap is a per-directory FileSystem rename — a metadata op on
    * HDFS-like stores, no second data copy.
    *
    * Contract: `bucketCol` must be a deterministic function of the key
    * (else a key that changed band would leave its stale row in the old
    * directory), and bucket values must be non-null.
    */
  /** Crash recovery for [[upsertRangePartitioned]]'s rename swap: a
    * `.bandDir.upsert-backup` whose live band is MISSING marks a swap that
    * died between its two renames — the backup holds the only copy, so
    * RESTORE it; one whose live band exists is stale (the swap completed
    * past the dst rename) and is dropped. Runs automatically at the start
    * of every upsert; callers can also invoke it directly after a crash.
    */
  def recoverUpsertBackups(spark: SparkSession, basePath: String,
                           bucketCol: String): Unit = {
    val baseP = new org.apache.hadoop.fs.Path(basePath)
    val fs = baseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(baseP)) return
    val suffix = ".upsert-backup"
    val prefix = s".$bucketCol="
    // also sweep LEGACY non-dot-prefixed backups (`<bucketCol>=*.upsert-backup`,
    // the pre-round-8 naming): left behind by a crash under the old scheme
    // they are visible to partition discovery and corrupt every read of
    // basePath with a bogus partition value — restore-or-delete identically
    val legacyPrefix = s"$bucketCol="
    fs.listStatus(baseP)
      .filter(st => st.isDirectory && st.getPath.getName.endsWith(suffix) &&
        (st.getPath.getName.startsWith(prefix) ||
          st.getPath.getName.startsWith(legacyPrefix)))
      .foreach { st =>
        val live = new org.apache.hadoop.fs.Path(basePath,
          st.getPath.getName.stripPrefix(".").stripSuffix(suffix))
        if (!fs.exists(live))
          require(fs.rename(st.getPath, live),
            s"crash-recovery restore failed: ${st.getPath} -> $live")
        else fs.delete(st.getPath, true)
      }
  }

  def upsertRangePartitioned(spark: SparkSession, basePath: String,
                             updates: DataFrame, bucketCol: String,
                             keyCols: Seq[String],
                             sortCols: Seq[String] = Nil): Seq[Any] = {
    import org.apache.spark.sql.functions.col
    val affected = updates.select(bucketCol).distinct().collect().map(_.get(0))
    require(!affected.contains(null), s"null $bucketCol in update batch")
    // Crash recovery MUST run before the base read: a backup whose live
    // band is missing means a prior swap died between its two renames, and
    // reading basePath without restoring it would compute this upsert's
    // survivors from an empty band — making the loss permanent when the
    // merge overwrites the directory.
    recoverUpsertBackups(spark, basePath, bucketCol)
    val base = spark.read.parquet(basePath)
    // isInCollection over the driver-side band list → PartitionFilters:
    // only the affected directories are ever read
    val survivors = base.filter(col(bucketCol).isInCollection(affected))
      .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    val merged = survivors.unionByName(updates.select(base.columns.toIndexedSeq.map(col): _*))
    val sorted =
      if (sortCols.isEmpty) merged
      else merged.sortWithinPartitions(sortCols.map(col): _*)
    val staging = s"$basePath.upsert-staging"
    sorted.write.mode("overwrite").partitionBy(bucketCol).parquet(staging)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stagingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The swap iterates the directories the staging write ACTUALLY produced
    // (never a name derived from value.toString — Spark's partition-path
    // rendering of timestamps/decimals differs from toString, and a wrong
    // name here would delete a live directory with nothing to replace it).
    // Every affected band re-materializes (survivors ∪ updates both land
    // there), so staging children == affected bands; asserted below.
    val prefix = s"$bucketCol="
    val produced = fs.listStatus(stagingPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
    require(produced.length == affected.length,
      s"staging produced ${produced.length} band dirs for ${affected.length} " +
        s"affected bands — partition rendering or bucket contract violated; " +
        s"live data untouched")
    produced.foreach { st =>
      val dir = st.getPath.getName
      val dst = new org.apache.hadoop.fs.Path(basePath, dir)
      // Dot-prefixed so Spark/Hadoop partition discovery ignores it: a
      // concurrent reader during the swap window never sees the band twice,
      // and a backup left by a crash can't pollute subsequent reads of
      // basePath (including the next upsert's own read). Any leftover was
      // already handled by recoverUpsertBackups above.
      val backup = new org.apache.hadoop.fs.Path(basePath, s".$dir.upsert-backup")
      // backup-rename instead of delete-then-rename: a crash between the
      // two renames leaves the old band recoverable at .*.upsert-backup
      // instead of destroyed. Renames are metadata ops on HDFS-like stores.
      val hadOld = fs.exists(dst)
      if (hadOld) require(fs.rename(dst, backup), s"backup rename failed: $dst")
      require(fs.rename(st.getPath, dst), s"swap rename failed: $dst")
      if (hadOld) fs.delete(backup, true)
    }
    fs.delete(stagingPath, true)
    affected.toSeq
  }

  /** MERGE INTO over the range-partitioned CoW layout: ONE change batch
    * carrying inserts, updates, and DELETES (`opCol` ∈ {I, U, D}) applies
    * in a single partition-swap pass — the Delta/Iceberg MERGE contract on
    * plain parquet. Updates and deletes both remove the old row via the
    * same keyed anti-join; non-delete change rows re-insert. Same
    * crash-safe backup-rename swap as [[upsertRangePartitioned]], with one
    * new case: a band whose rows are ALL deleted produces no staging
    * directory and must have its live directory retired. Band directory
    * names are never derived from `value.toString` (the rendering trap the
    * upsert documents) — a one-row-per-band name probe is written through
    * Spark's own partition renderer, and fully-emptied bands are the probe
    * names minus the staging names. A crash mid-retire leaves the band's
    * backup; recovery restores it (a per-band rollback) and re-running the
    * same merge batch re-empties it — idempotent.
    *
    * Scale: only affected bands are read (`isInCollection` → literal
    * PartitionFilters), one anti-join keyed on the merge keys, one write
    * of the affected bands. Delete-only merges never touch unaffected
    * partitions.
    */
  def mergeRangePartitioned(spark: SparkSession, basePath: String,
                            changes: DataFrame, bucketCol: String,
                            keyCols: Seq[String], opCol: String = "op",
                            sortCols: Seq[String] = Nil): Seq[Any] = {
    import org.apache.spark.sql.functions.{col, lit}
    // ONE snapshot of the change batch for every phase below: the op-set
    // validation, the affected-band collect, the name probe, and the staging
    // write are four independent actions, and a non-deterministic or
    // source-changing `changes` evaluated freshly per action could make the
    // staging output inconsistent with the validated ops / probed bands —
    // tripping the post-write requires AFTER live-data renames have begun.
    val snap = changes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val ops = snap.select(opCol).distinct().collect()
      .map(r => Option(r.get(0)).map(_.toString).orNull).toSet
    require(ops.nonEmpty && ops.subsetOf(Set("I", "U", "D")),
      s"mergeRangePartitioned: $opCol values must be I/U/D, got $ops")
    val affected = snap.select(bucketCol).distinct().collect().map(_.get(0))
    require(!affected.contains(null), s"null $bucketCol in merge batch")
    recoverUpsertBackups(spark, basePath, bucketCol)
    val base = spark.read.parquet(basePath)
    val survivors = base.filter(col(bucketCol).isInCollection(affected))
      .join(snap.select(keyCols.map(col): _*), keyCols, "left_anti")
    val additions = snap.filter(col(opCol) =!= "D")
      .select(base.columns.toIndexedSeq.map(col): _*)
    val merged = survivors.unionByName(additions)
    val sorted =
      if (sortCols.isEmpty) merged
      else merged.sortWithinPartitions(sortCols.map(col): _*)
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$bucketCol="
    def bandDirs(path: String): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
    // name probe: Spark itself renders every affected band's directory name
    val affectedDirs =
      probeBandNames(snap, bucketCol, s"$basePath.merge-nameprobe", fs)
    require(affectedDirs.size == affected.length,
      s"name probe rendered ${affectedDirs.size} dirs for ${affected.length} bands")
    val staging = s"$basePath.upsert-staging"
    sorted.write.mode("overwrite").partitionBy(bucketCol).parquet(staging)
    val produced = bandDirs(staging)
    val producedNames = produced.map(_.getPath.getName).toSet
    require(producedNames.subsetOf(affectedDirs),
      s"staging produced unexpected bands ${producedNames -- affectedDirs}; " +
        "live data untouched")
    def retire(dst: org.apache.hadoop.fs.Path,
               backup: org.apache.hadoop.fs.Path): Boolean = {
      val hadOld = fs.exists(dst)
      if (hadOld) require(fs.rename(dst, backup), s"backup rename failed: $dst")
      hadOld
    }
    produced.foreach { st =>
      val dir = st.getPath.getName
      val dst = new org.apache.hadoop.fs.Path(basePath, dir)
      val backup = new org.apache.hadoop.fs.Path(basePath, s".$dir.upsert-backup")
      val hadOld = retire(dst, backup)
      betweenSwapRenamesHook()
      require(fs.rename(st.getPath, dst), s"swap rename failed: $dst")
      if (hadOld) fs.delete(backup, true)
    }
    // fully-emptied bands: retired without replacement
    (affectedDirs -- producedNames).foreach { dir =>
      val dst = new org.apache.hadoop.fs.Path(basePath, dir)
      val backup = new org.apache.hadoop.fs.Path(basePath, s".$dir.upsert-backup")
      if (retire(dst, backup)) fs.delete(backup, true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    affected.toSeq
    } finally snap.unpersist(blocking = false)
  }

  /** Morton/Z-order spread table: the 2^bits possible ranks with their bits
    * re-spaced `stride` positions apart, so `stride` interleaved ranks OR
    * together without collision. A 256-entry literal — rides in the plan. */
  private def spreadTable(bits: Int, stride: Int): Seq[Long] =
    (0 until (1 << bits)).map { r =>
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((r >> i) & 1).toLong << (i * stride))
      }
    }

  /** Z-value of a row: each column quantized to a 2^bits-band rank against
    * its own (pre-computed) quantile boundaries, ranks bit-interleaved.
    * Boundaries are literal arrays (≤255 doubles/column) and the spread
    * lookup is a 256-entry `element_at` — all codegen'd, no UDF. */
  def zorderCol(colsWithBounds: Seq[(org.apache.spark.sql.Column, Seq[Double])],
                bits: Int = 8): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(colsWithBounds.nonEmpty && colsWithBounds.size * bits <= 63,
      s"${colsWithBounds.size} cols x $bits bits exceeds a signed long")
    val stride = colsWithBounds.size
    val spread = typedLit(spreadTable(bits, stride))
    colsWithBounds.zipWithIndex.map { case ((c, bounds), idx) =>
      require(bounds.size == (1 << bits) - 1,
        s"need ${(1 << bits) - 1} boundaries, got ${bounds.size}")
      val v = c.cast("double")
      // rank = #boundaries <= v, in 0..2^bits-1 (nulls sort first: rank 0)
      val rank = size(filter(typedLit(bounds), b => v.isNotNull && v >= b))
      shiftleft(element_at(spread, rank + 1), idx)
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-ordered (multi-dimensional-clustered) parquet layout: rows sorted by
    * the Morton interleave of per-column quantile ranks, so parquet
    * row-group/file min-max stats skip on EVERY z-dimension at once — the
    * layout for corpora queried by more than one selective column (date x
    * domain, length x quality, ...), where a single-column sort gives
    * skipping power to that column only and leaves the rest full-scan.
    *
    * Scale shape: one multi-column approx-quantile aggregate sizes the band
    * boundaries (bounded sketch state, never a sort); one range shuffle on
    * the z-value distributes rows into `numFiles` even, contiguous z-ranges;
    * the within-partition sort is local. Boundaries and spread tables are
    * KB-sized literals in the plan. Row content is untouched (certified by
    * the p10 oracle: a 2-D box filter over the layout equals the same filter
    * over the source).
    */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], path: String,
                    numFiles: Int, bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    val cuts = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val casted = df.select(zCols.map(c => col(c).cast("double").as(c)): _*)
    val bounds = casted.stat.approxQuantile(zCols.toArray, cuts, 1e-3)
    val z = zorderCol(zCols.zip(bounds).map { case (c, b) => (col(c), b.toSeq) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Skipping-effectiveness report: for a banded layout (range or z-order),
    * the per-band min/max envelope of `valueCol` and whether a `[lo, hi]`
    * range predicate could PRUNE the band on that envelope alone — the
    * quantitative "is this layout worth it" answer before committing a
    * 100 TB rewrite. `rows_scanned` is what a min/max-pruning reader
    * (parquet row-group stats, partition pruning) would actually read for
    * the predicate; Σ rows_scanned / Σ n_rows over the report is the
    * layout's scan-fraction for that workload.
    *
    * One scan, one map-side-combining aggregate to ≤|bands| rows — the
    * report never shuffles row data, only band envelopes.
    */
  def skippingReport(df: DataFrame, bandCol: String, valueCol: String,
                     lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(col(bandCol).as("band"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol).cast("double")).as("vmin"),
        max(col(valueCol).cast("double")).as("vmax"))
      .withColumn("pruned", col("vmax") < lo || col("vmin") > hi)
      .withColumn("rows_scanned",
        when(col("pruned"), 0L).otherwise(col("n_rows")))
  }

  // ------------------------------------------------ versioned snapshots (p22)

  /** Versioned-snapshot layout on plain parquet — SNAPSHOT ISOLATION and
    * TIME TRAVEL, the lakehouse-table contract the CoW upsert/merge family
    * lacks (they swap in place, so a concurrent reader races the swap and
    * yesterday's table is gone):
    *
    *   basePath/data/v<N>-<tok>/part-*.parquet  immutable data files of
    *                                            commit N (tok = a writer-
    *                                            unique token, so racing
    *                                            committers never share a dir)
    *   basePath/v<N>.manifest                   newline list of N's files
    *
    * A commit writes its data files FIRST, then publishes the manifest by
    * an atomic rename from a dot-temp — the manifest rename IS the commit
    * point. A crash before it leaves orphaned data files that no reader
    * can see (vacuum sweeps them); published versions' files are never
    * mutated or deleted by later commits, so a reader holding version N's
    * plan is isolated from any concurrent commit. Readers resolve the
    * manifest list at PLAN BUILD time and scan exactly those files.
    *
    * Scale: the manifest is KB-scale metadata regardless of data size; a
    * version read plans as a plain multi-file parquet scan (pushdown and
    * pruning intact). Each commit here is a full snapshot — band-level
    * delta commits compose by listing carried-over files from version N−1
    * in N's manifest, the natural extension of this protocol (not needed
    * by the gated surface, so not speculatively built).
    */
  def commitVersion(df: DataFrame, basePath: String,
                    maxRetries: Int = 0): Long = {
    val spark = df.sparkSession
    val baseP = new org.apache.hadoop.fs.Path(basePath)
    val fs = baseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assertCommitCapability(fs, basePath) // fail before staging any data
    fs.mkdirs(baseP)
    var attempts = 0
    while (true) {
      // writer-UNIQUE data dir: two racing committers at the same version
      // must never interleave files into one directory (the manifest is
      // built by listing it — shared dirs would silently mix two commits);
      // the loser's dir becomes an invisible orphan that vacuum sweeps
      val v = listVersions(spark, basePath).lastOption.getOrElse(0L) + 1
      val tok = java.util.UUID.randomUUID.toString.take(8)
      val rel = s"data/v$v-$tok"
      val dataDir = new org.apache.hadoop.fs.Path(basePath, rel)
      df.write.mode("errorifexists").parquet(dataDir.toString)
      val files = fs.listStatus(dataDir)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => s"$rel/${st.getPath.getName}").toSeq
      try {
        publishManifest(fs, basePath, v, files)
        return v
      } catch {
        case e: ConcurrentCommitException =>
          fs.delete(dataDir, true) // tidy the loser's staged files now
          attempts += 1
          if (attempts > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Published versions, ascending. */
  def listVersions(spark: SparkSession, basePath: String): Seq[Long] = {
    val baseP = new org.apache.hadoop.fs.Path(basePath)
    val fs = baseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(baseP)) return Nil
    fs.listStatus(baseP).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted
  }

  /** Manifest entries are table-relative (`data/v1-tok/part-...`) except
    * in SHALLOW CLONES ([[cloneVersion]]), whose entries are absolute
    * URIs into the source table — resolve accordingly. */
  private def resolveEntry(basePath: String, f: String): String =
    if (new org.apache.hadoop.fs.Path(f).isAbsolute || f.contains("://")) f
    else s"$basePath/$f"

  /** Read a version (default: latest). The file list resolves NOW — the
    * returned frame keeps reading version `v`'s files even if later
    * commits land while it executes. */
  def readVersion(spark: SparkSession, basePath: String,
                  version: Option[Long] = None): DataFrame = {
    val versions = listVersions(spark, basePath)
    require(versions.nonEmpty, s"no published versions at $basePath")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v),
      s"version $v not published at $basePath (have ${versions.mkString(",")})")
    val files = readManifest(spark, basePath, v)
    spark.read.parquet(files.map(resolveEntry(basePath, _)): _*)
  }

  /** SHALLOW CLONE (p26): publish `dstPath`'s v1 manifest listing the
    * SOURCE version's files by absolute path — zero data bytes copied,
    * zero data bytes written; the clone is a KB-scale manifest. The clone
    * is immediately a first-class versioned table: [[readVersion]] reads
    * the pinned source snapshot, [[commitVersion]] publishes subsequent
    * full snapshots as the clone's OWN local files (divergence never
    * touches the source),
    * time travel and snapshot isolation work unchanged, and vacuum on the
    * CLONE only ever deletes files under the clone's own data/ directory
    * (absolute source entries are never deletion candidates by
    * construction).
    *
    * The one real contract, stated loudly (the same rule Delta's shallow
    * clones carry): the source table must NOT be vacuumed below the
    * cloned version while the clone lives — the clone pins source FILES,
    * and the source's vacuum has no back-references to clones. Deep-copy
    * (CTAS + commitVersion) instead when the source's retention cannot be
    * guaranteed. Delta-commit tables (band-partitioned manifests) refuse
    * cloning onto their merge path: [[deltaCommit]] requires
    * table-relative band entries and fails loudly on a cloned manifest.
    *
    * At 100 TB: cloning a petabyte table costs one manifest read + one
    * manifest write — the operation that makes experiment forks,
    * ablation branches, and rollback-safe reprocessing free.
    */
  def cloneVersion(spark: SparkSession, srcPath: String, dstPath: String,
                   version: Option[Long] = None): Long = {
    val srcP = new org.apache.hadoop.fs.Path(srcPath)
    val fs = srcP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcAbs = fs.makeQualified(srcP).toUri.getPath
    val versions = listVersions(spark, srcPath)
    require(versions.nonEmpty, s"no published versions at $srcPath")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v),
      s"version $v not published at $srcPath (have ${versions.mkString(",")})")
    require(listVersions(spark, dstPath).isEmpty,
      s"clone target $dstPath already has published versions")
    // entries that are already absolute (clone of a clone) pass through —
    // the chain keeps pinning the ORIGINAL files, never an intermediate
    val files = readManifest(spark, srcPath, v)
      .map(f => resolveEntry(srcAbs, f))
    // the publish must run against the DESTINATION's filesystem: its
    // scheme decides the atomic-create primitive (and the object-store
    // refusal), and src and dst need not share one
    val dstP = new org.apache.hadoop.fs.Path(dstPath)
    val dstFs = dstP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(dstFs.getUri == fs.getUri,
      s"cloneVersion: source (${fs.getUri}) and target (${dstFs.getUri}) " +
        "must live on the same filesystem — a cross-filesystem clone " +
        "would publish file references the target's reader cannot " +
        "resolve; deep-copy (CTAS + commitVersion) across filesystems")
    dstFs.mkdirs(dstP)
    publishManifest(dstFs, dstPath, 1L, files)
    1L
  }

  // ------------------------------------------------- delta commits (p23)

  /** INCREMENTAL version commit — the full lakehouse CoW contract on plain
    * parquet, unifying [[mergeRangePartitioned]]'s band-level I/U/D with
    * the manifest protocol of [[commitVersion]]:
    *
    *   basePath/data/<bucketCol>=X/v<N>-*.parquet   immutable band files
    *   basePath/v<N>.manifest                       N's file list
    *
    * A delta commit rewrites ONLY the bands the change batch touches; the
    * new manifest lists the previous version's files for every untouched
    * band verbatim (file REUSE — the property that makes commit cost
    * proportional to the delta, not the table) plus the new files for
    * affected bands. Files are never mutated or deleted by commits, so
    * every published version stays readable (time travel + snapshot
    * isolation exactly as [[commitVersion]]); [[deltaVacuum]] retires old
    * manifests and deletes only files no surviving manifest references.
    * The manifest rename is the atomic commit point; a crash before it
    * leaves invisible orphan files.
    *
    * Band values render through Spark's own partition-directory writer
    * (never `value.toString` — the rendering trap the upsert documents).
    * The first commit must be all-inserts (there is no previous version to
    * update). At 100 TB: a commit reads only affected bands (partition-
    * pruned through the manifest's file list + `basePath` option), writes
    * only affected bands, and the manifest stays KB-scale metadata.
    */
  def deltaCommit(spark: SparkSession, basePath: String, changes: DataFrame,
                  bucketCol: String, keyCols: Seq[String],
                  opCol: String = "op",
                  sortCols: Seq[String] = Nil,
                  maxRetries: Int = 0): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val baseP = new org.apache.hadoop.fs.Path(basePath)
    val fs = baseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assertCommitCapability(fs, basePath) // fail before staging any data
    fs.mkdirs(baseP)
    // writer-unique token: the staging dir, the name probe, and the moved
    // file names all carry it, so two racing committers never share a
    // scratch path (and Spark's own part-file UUIDs keep the final data
    // file names distinct in any case)
    val tok = java.util.UUID.randomUUID.toString.take(8)
    val snap = changes.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ops = snap.select(opCol).distinct().collect()
        .map(r => Option(r.get(0)).map(_.toString).orNull).toSet
      require(ops.nonEmpty && ops.subsetOf(Set("I", "U", "D")),
        s"deltaCommit: $opCol values must be I/U/D, got $ops")
      val affected = probeBandNames(snap, bucketCol,
        s"$basePath/.delta-nameprobe-$tok", fs)
      val prefix = s"$bucketCol="
      def bandDirs(path: String) =
        fs.listStatus(new org.apache.hadoop.fs.Path(path))
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      def bandOf(relFile: String) = relFile.stripPrefix("data/").split("/")(0)
      val cols = snap.columns.filter(_ != opCol).toIndexedSeq
      var attempts = 0
      while (true) {
        // CAS loop: everything version-dependent recomputes per attempt —
        // a retry after losing the publish race merges against the NEW
        // latest version (whose files may now include the winner's bands)
        val versions = listVersions(spark, basePath)
        val v = versions.lastOption.getOrElse(0L) + 1
        require(v > 1 || ops == Set("I"),
          s"first delta commit must be all-inserts, got $ops")
        val prevFiles: List[String] =
          if (versions.isEmpty) Nil
          else readManifest(spark, basePath, versions.last)
        // a SHALLOW CLONE's manifest pins absolute source files with no
        // band structure — the merge path below parses band dirs out of
        // table-relative entries, so a cloned table must be materialized
        // (deep-copied) before it can delta-commit; silent mis-banding
        // would corrupt the carried file list
        prevFiles.find(f => !f.startsWith("data/")).foreach(f =>
          throw new UnsupportedOperationException(
            s"deltaCommit at $basePath: previous manifest entry '$f' is " +
              "not a table-relative band file (shallow-cloned snapshot?) " +
              "— materialize the clone (CTAS + commitVersion/deltaCommit " +
              "from scratch) before delta-committing onto it"))
        val (affectedPrev, carried) = prevFiles.partition(f => affected(bandOf(f)))
        // survivors of affected bands (the MANIFEST is the pruner: only their
        // files are even listed) + non-delete change rows
        val prevRows =
          if (affectedPrev.isEmpty) None
          else Some(deltaFiles(spark, basePath, affectedPrev))
        val additions = snap.filter(col(opCol) =!= "D").select(cols.map(col): _*)
        val merged = (prevRows match {
          case Some(p) =>
            p.select(cols.map(col): _*)
              .join(snap.select(keyCols.map(col): _*), keyCols, "left_anti")
              .unionByName(additions)
          case None => additions
          // canonical column order in every data file: the USING join above
          // moves its keys to the FRONT of the survivors, so without this
          // select a merged commit's files would order columns differently
          // from an initial commit's — positional consumers (exceptAll in
          // deltaDiff) would silently mis-align
        }).select(cols.map(col): _*)
        val sorted =
          if (sortCols.isEmpty) merged
          else merged.sortWithinPartitions(sortCols.map(col): _*)
        val staging = s"$basePath/.delta-staging-$tok"
        // the band value rides BOTH as the partition directory (manifest keys,
        // human-auditable layout) AND inside the data files (as __delta_band):
        // a version read is then a plain multi-file parquet scan — no
        // partition-directory recovery, which the substrait wire hop cannot
        // carry — and band predicates still skip via parquet column stats,
        // while file-level pruning happens at MANIFEST level
        sorted.withColumnRenamed(bucketCol, DeltaBandCol)
          .withColumn(bucketCol, col(DeltaBandCol))
          .write.mode("overwrite").partitionBy(bucketCol).parquet(staging)
        val staged = bandDirs(staging)
        require(staged.map(_.getPath.getName).toSet.subsetOf(affected),
          "staging produced bands outside the change batch")
        // move staged files under data/<band>/ with version-prefixed names
        val moved = scala.collection.mutable.ArrayBuffer.empty[String]
        staged.foreach { bd =>
          val band = bd.getPath.getName
          val dst = new org.apache.hadoop.fs.Path(s"$basePath/data/$band")
          fs.mkdirs(dst)
          fs.listStatus(bd.getPath)
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .zipWithIndex.foreach { case (st, i) =>
              val name = s"v$v-$tok-$i-${st.getPath.getName}"
              require(fs.rename(st.getPath,
                new org.apache.hadoop.fs.Path(dst, name)),
                s"delta move failed: $band/$name")
              moved += s"data/$band/$name"
            }
        }
        fs.delete(new org.apache.hadoop.fs.Path(staging), true)
        try {
          publishManifest(fs, basePath, v, carried ++ moved)
          return v
        } catch {
          case e: ConcurrentCommitException =>
            // the loser's moved files are invisible (no manifest lists
            // them) — tidy them now rather than waiting for vacuum
            moved.foreach(f => fs.delete(
              new org.apache.hadoop.fs.Path(s"$basePath/$f"), false))
            attempts += 1
            if (attempts > maxRetries) throw e
        }
      }
      throw new IllegalStateException("unreachable")
    } finally snap.unpersist(blocking = false)
  }

  /** in-file twin of the band partition column (see deltaCommit) */
  private val DeltaBandCol = "__delta_band"

  /** Test-only fault window: invoked after a commit's data files are fully
    * staged and immediately before the manifest publish. The driver-kill
    * chaos gate arms this (marker file + sleep) to prove that a REAL
    * process death between staging and commit leaves every published
    * version intact and the orphans invisible. A no-op in production. */
  @volatile private[graft] var beforePublishHook: () => Unit = () => ()

  /** Test-only fault window twin for the CoW family: invoked between a
    * band's backup rename and its replacement rename — the narrowest
    * crash window of [[mergeRangePartitioned]]'s swap. The driver-kill
    * chaos gate arms this in a child JVM. A no-op in production. */
  @volatile private[graft] var betweenSwapRenamesHook: () => Unit = () => ()

  // one lock object per qualified table base path: in-process racing
  // committers serialize here, so the exists-check in publishManifest is
  // race-free WITHIN a JVM (exactly one wins, the loser throws typed)
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // Rename-less object stores: no atomic no-replace primitive exists, so
  // the manifest publish cannot be made exclusive by the filesystem alone.
  // Same boundary Delta Lake draws — S3 et al. need an external commit
  // coordinator (a DynamoDB-style lock service or a single writer).
  private val ObjectStoreSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss",
      "oss", "swift", "cos", "cosn", "obs")

  /** Capability probe for the versioned-commit protocol: loud, typed,
    * and callable at table-CREATE time (every versioned writer also calls
    * it before staging any data, so a misdeployed object-store table
    * fails before the first byte is written, not after).
    *
    *   - `file`  — atomic: publish is a POSIX `link(2)` (O(1), fails
    *     EEXIST atomically even across PROCESSES).
    *   - object stores ([[ObjectStoreSchemes]]) — UNSUPPORTED without an
    *     external commit coordinator: rename is copy+delete and silently
    *     replaces, so two writers can both "win". Bring a coordinator
    *     (single writer per table, or a lock service) and front this
    *     probe with it — the rule Delta Lake documents for S3.
    *   - anything else (hdfs, viewfs, ...) — atomic via rename-no-replace
    *     semantics (HDFS `rename` fails onto an existing destination). */
  def assertCommitCapability(fs: org.apache.hadoop.fs.FileSystem,
                             basePath: String): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (ObjectStoreSchemes(scheme.toLowerCase))
      throw new UnsupportedOperationException(
        s"versioned commits on '$scheme' ($basePath) are unsafe without " +
          "an external commit coordinator: the store has no atomic " +
          "no-replace rename/create, so two racing writers would both " +
          "publish and one commit would be silently lost. Run a single " +
          "writer per table, or front commits with a lock service, then " +
          "mirror manifests through a coordinator-owned path.")
  }

  /** THE commit point, shared by every versioned writer: file list staged
    * to a writer-unique dot-temp, fsynced, then published to
    * `v<N>.manifest` by an ATOMIC no-replace primitive. Concurrency
    * contract:
    *   - IN-PROCESS races (many sessions/threads, one JVM — the shared-
    *     driver case): serialized by `commitLocks`; exactly one writer
    *     per version wins and every loser gets a typed
    *     [[ConcurrentCommitException]], never a silent overwrite.
    *   - CROSS-PROCESS races on the LOCAL filesystem: publish is
    *     `Files.createLink(dst, tmp)` — POSIX `link(2)` fails with EEXIST
    *     atomically, so the loser in a SEPARATE JVM gets the same typed
    *     exception (gated: ConcurrencyGate xproc scenarios race two child
    *     JVMs). The staged temp carries the full content and is fsynced
    *     before the link, so the published name never exposes a torn
    *     write; a crash between link and temp-delete leaves only an
    *     invisible dot-temp orphan.
    *   - CROSS-PROCESS races on HDFS-like filesystems: `rename` onto an
    *     existing destination fails, so the `require` catches the loser.
    *   - Object stores: rejected loudly by [[assertCommitCapability]] —
    *     no atomic no-replace primitive exists there; bring a commit
    *     coordinator (the Delta-on-S3 rule).
    * Any future change to the publish protocol lands here once. */
  private def publishManifest(fs: org.apache.hadoop.fs.FileSystem,
                              basePath: String, v: Long,
                              files: Seq[String]): Unit = {
    require(files.nonEmpty, s"commit v$v would publish an empty table")
    assertCommitCapability(fs, basePath)
    beforePublishHook()
    val tmp = new org.apache.hadoop.fs.Path(basePath,
      s".tmp.v$v.manifest-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write((files.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(basePath, s"v$v.manifest")
    val lockKey = fs.makeQualified(
      new org.apache.hadoop.fs.Path(basePath)).toString
    val lock = commitLocks.computeIfAbsent(lockKey, _ => new Object)
    lock.synchronized {
      if (fs.exists(dst)) {
        fs.delete(tmp, false)
        throw new ConcurrentCommitException(
          s"concurrent commit: v$v.manifest already published at $basePath " +
            "— re-read the latest version and retry at the next one")
      }
      if (Option(fs.getUri.getScheme).forall(_ == "file")) {
        // POSIX publish: fsync the staged bytes, then link(2) — atomic
        // exclusive create even across processes (EEXIST for the loser)
        val tmpNio = java.nio.file.Paths.get(
          fs.makeQualified(tmp).toUri.getPath)
        val dstNio = java.nio.file.Paths.get(
          fs.makeQualified(dst).toUri.getPath)
        val ch = java.nio.channels.FileChannel.open(
          tmpNio, java.nio.file.StandardOpenOption.WRITE)
        try ch.force(true) finally ch.close()
        try java.nio.file.Files.createLink(dstNio, tmpNio)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            fs.delete(tmp, false)
            throw new ConcurrentCommitException(
              s"concurrent commit: v$v.manifest already published at " +
                s"$basePath (cross-process racer won the link) — re-read " +
                "the latest version and retry at the next one")
        }
        fs.delete(tmp, false)
      } else {
        // HDFS-like: rename fails onto an existing destination
        if (!fs.rename(tmp, dst)) {
          fs.delete(tmp, false)
          throw new ConcurrentCommitException(
            s"concurrent commit: publish of v$v.manifest at $basePath " +
              "lost the rename race — re-read the latest version and " +
              "retry at the next one")
        }
      }
    }
  }

  /** Band directory names rendered by Spark's OWN partition writer (never
    * `value.toString` — the rendering trap the upsert documents): write a
    * one-row-per-band probe, read the dir names back, clean up. */
  private def probeBandNames(snap: DataFrame, bucketCol: String,
                             probePath: String,
                             fs: org.apache.hadoop.fs.FileSystem): Set[String] = {
    import org.apache.spark.sql.functions.{col, lit}
    snap.select(col(bucketCol)).distinct().withColumn("__one", lit(1))
      .write.mode("overwrite").partitionBy(bucketCol).parquet(probePath)
    val prefix = s"$bucketCol="
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(probePath))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName).toSet
    fs.delete(new org.apache.hadoop.fs.Path(probePath), true)
    names
  }

  /** Plain multi-file scan of delta files with the band column restored
    * from its in-file twin — wire-safe (a rename is just a projection). */
  private def deltaFiles(spark: SparkSession, basePath: String,
                         files: Seq[String]): DataFrame = {
    val df = spark.read.parquet(files.map(f => s"$basePath/$f"): _*)
    val band = df.columns.find(_ == DeltaBandCol).getOrElse(
      throw new IllegalStateException(
        s"delta files missing $DeltaBandCol: not a deltaCommit layout"))
    // restore the original band name: the dir name before '=' of any file
    val bucketCol = files.head.stripPrefix("data/").split("/")(0)
      .split("=")(0)
    df.withColumnRenamed(band, bucketCol)
  }

  private def readManifest(spark: SparkSession, basePath: String,
                           v: Long): List[String] = {
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(basePath, s"v$v.manifest"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Read a delta-committed version (default latest): a plain multi-file
    * parquet scan of exactly the manifest's files, band column restored
    * from its in-file twin. Band-level pruning is manifest-level — use
    * [[deltaReadBands]] to scan only chosen bands' files. */
  def deltaRead(spark: SparkSession, basePath: String,
                version: Option[Long] = None): DataFrame =
    deltaFiles(spark, basePath, deltaManifestFor(spark, basePath, version))

  /** The file-level band pruner: scan only the named bands' files of a
    * version — the manifest is the index, so unselected bands cost zero
    * bytes, zero listing. Band names are `<bucketCol>=<rendered>` exactly
    * as the manifest records them. */
  def deltaReadBands(spark: SparkSession, basePath: String,
                     bands: Set[String],
                     version: Option[Long] = None): DataFrame = {
    val files = deltaManifestFor(spark, basePath, version)
      .filter(f => bands.contains(f.stripPrefix("data/").split("/")(0)))
    require(files.nonEmpty, s"no files for bands $bands")
    deltaFiles(spark, basePath, files)
  }

  /** Version-to-version DIFF from the manifests alone (p25): rows added
    * ('A') and removed ('R') between two published versions, scanning
    * ONLY the files the two manifests do NOT share — the file-reuse
    * property that makes commits O(delta) makes diffs O(delta) too: a
    * diff across versions that touched one band reads that band twice,
    * never the table. Rows carried in shared files cancel by
    * construction; unchanged rows inside a rewritten band cancel through
    * the EXCEPT ALL pair (multiset semantics — duplicate-safe). */
  def deltaDiff(spark: SparkSession, basePath: String,
                vFrom: Long, vTo: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val fFrom = deltaManifestFor(spark, basePath, Some(vFrom)).toSet
    val fTo = deltaManifestFor(spark, basePath, Some(vTo)).toSet
    val onlyFrom = (fFrom -- fTo).toSeq.sorted
    val onlyTo = (fTo -- fFrom).toSeq.sorted
    def side(files: Seq[String], other: Seq[String]): DataFrame =
      if (files.nonEmpty) deltaFiles(spark, basePath, files)
      else deltaFiles(spark, basePath, other).limit(0)
    if (onlyFrom.isEmpty && onlyTo.isEmpty)
      return deltaFiles(spark, basePath, fTo.toSeq.sorted.take(1))
        .limit(0).withColumn("change", lit(""))
    val after = side(onlyTo, onlyFrom)
    // exceptAll is POSITIONAL — align the before side to after's column
    // order by name (tables written before the canonical-order fix can
    // carry per-commit column orders in their files)
    val before = side(onlyFrom, onlyTo)
      .select(after.columns.map(org.apache.spark.sql.functions.col): _*)
    after.exceptAll(before).withColumn("change", lit("A"))
      .unionByName(before.exceptAll(after).withColumn("change", lit("R")))
  }

  private def deltaManifestFor(spark: SparkSession, basePath: String,
                               version: Option[Long]): List[String] = {
    val versions = listVersions(spark, basePath)
    require(versions.nonEmpty, s"no published versions at $basePath")
    val v = version.getOrElse(versions.last)
    require(versions.contains(v),
      s"version $v not published at $basePath (have ${versions.mkString(",")})")
    readManifest(spark, basePath, v)
  }

  /** Retire delta versions older than the newest `keepLast` and delete
    * every data file no surviving manifest references. Returns (removed
    * versions, deleted file count).
    *
    * Minimum-retention contract (gated in SourcesSpec): a reader that
    * resolved a retired version's plan fails LOUDLY mid-scan
    * (FileNotFoundException — `spark.sql.files.ignoreMissingFiles` must
    * stay false on these tables), never returns partial rows. Size
    * `keepLast` above the longest-running reader's version age.
    *
    * In-flight-commit guard: an unreferenced file whose name parses to a
    * version ABOVE the newest surviving manifest may belong to a commit
    * that has staged its data but not yet published (exactly the
    * beforePublishHook window) — deleting it would publish a manifest
    * over missing files. Such files (and unparsable names) only delete
    * once older than `minOrphanAgeMs`; files at or below the newest
    * surviving version are provably dead (their manifest is gone or they
    * lost a commit race) and delete immediately. Pass 0 when the table
    * provably has no concurrent committer (tests, post-crash cleanup). */
  def deltaVacuum(spark: SparkSession, basePath: String,
                  keepLast: Int,
                  minOrphanAgeMs: Long = 20 * 60 * 1000L): (Seq[Long], Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = listVersions(spark, basePath)
    val drop = versions.dropRight(keepLast)
    drop.foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(basePath, s"v$v.manifest"), false))
    val surviving = listVersions(spark, basePath)
    val latest = surviving.lastOption.getOrElse(0L)
    val live = surviving
      .flatMap(v => readManifest(spark, basePath, v)).toSet
    val fileVersion = "^v(\\d+)-".r
    val cutoff = System.currentTimeMillis() - minOrphanAgeMs
    var deleted = 0
    val dataP = new org.apache.hadoop.fs.Path(basePath, "data")
    if (fs.exists(dataP)) fs.listStatus(dataP)
      .filter(_.isDirectory).foreach { bd =>
        fs.listStatus(bd.getPath).filter(_.isFile).foreach { st =>
          val name = st.getPath.getName
          val rel = s"data/${bd.getPath.getName}/$name"
          val provablyDead = fileVersion.findFirstMatchIn(name)
            .exists(_.group(1).toLong <= latest)
          if (!live.contains(rel) &&
            (provablyDead || st.getModificationTime < cutoff)) {
            fs.delete(st.getPath, false); deleted += 1
          }
        }
      }
    (drop, deleted)
  }

  /** Retire versions older than the newest `keepLast`, plus any orphaned
    * data dirs a crashed commit left behind (data without a manifest).
    * Returns the removed version numbers.
    *
    * In-flight-commit guard (shared rationale with [[deltaVacuum]]): an
    * orphan dir whose version is ABOVE the newest surviving manifest may
    * be a commit mid-staging — it only deletes once older than
    * `minOrphanAgeMs`; orphans at or below the newest version are
    * provably dead and delete immediately. Pass 0 when no concurrent
    * committer can exist. */
  def vacuumVersions(spark: SparkSession, basePath: String,
                     keepLast: Int,
                     minOrphanAgeMs: Long = 20 * 60 * 1000L): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val baseP = new org.apache.hadoop.fs.Path(basePath)
    val fs = baseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = listVersions(spark, basePath)
    val drop = versions.dropRight(keepLast)
    // dir names are v<N> or v<N>-<writer-token> (see commitVersion)
    def versionOf(name: String): Option[Long] = {
      val core = name.stripPrefix("v").takeWhile(_ != '-')
      if (name.startsWith("v") && core.nonEmpty && core.forall(_.isDigit))
        Some(core.toLong)
      else None
    }
    // manifests first: each version disappears atomically, THEN its files
    drop.foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(basePath, s"v$v.manifest"), false))
    // data dirs of dropped versions, plus orphans: dirs with no manifest
    // (crashed pre-publish commits, losers of a commit race)
    val dataP = new org.apache.hadoop.fs.Path(basePath, "data")
    val surviving = listVersions(spark, basePath)
    val latest = surviving.lastOption.getOrElse(0L)
    val live = surviving.toSet
    val cutoff = System.currentTimeMillis() - minOrphanAgeMs
    if (fs.exists(dataP)) fs.listStatus(dataP)
      .filter(_.isDirectory)
      .filter { st =>
        versionOf(st.getPath.getName).exists(v => !live.contains(v) &&
          (v <= latest || st.getModificationTime < cutoff))
      }
      .foreach(st => fs.delete(st.getPath, true))
    drop
  }
}
