package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-bucket qualifying-pair kernel for blocked n-gram Jaccard
  * (`ops.Dedup.ngramJaccardPairs`): takes ONE (block, size-bucket) group's
  * members as an id-sorted array<struct<jid, sh, sz, guest>> and emits every
  * pair with J ≥ threshold honoring the bucket emission rules (no
  * guest/guest pairs; size-ratio prefilter; early-terminating merge-scan
  * verify — all arithmetic bit-identical to the former SQL tail, so no
  * oracle-checked value can move).
  *
  * Scale guard — in-task prefix filtering (AllPairs/Bayardo): the former
  * tail streamed ALL m²/2 in-bucket combinations through two chained
  * generators; with linear corpus growth inside a fixed (lang, source,
  * size-bucket) key that term is quadratic — the 100× rehearsal measured
  * segment α ≈ 1.6–2.0 on d04/d08 from exactly this. Above `SMALL_CUT`
  * members the kernel instead builds the bucket's own rarest-first prefix
  * index: grams ordered by (in-bucket frequency, gram value) — one total
  * order per bucket — each doc indexed by its first sz − ⌈t·sz⌉ + 1 grams;
  * the classic completeness argument (the globally-rarest COMMON gram of a
  * qualifying pair sits inside BOTH prefixes, given the ratio filter
  * sy ≥ t·sx ⇒ overlap ≥ ⌈t·sx⌉) makes candidates = pairs sharing an
  * indexed gram a provable superset of the output. Candidate volume drops
  * from m²/2 to Σ_g df(g)² over prefix grams — for distinct-content corpus
  * growth (new docs bring new grams) that is linear in m, not quadratic.
  * Below the cut the plain double loop wins (no index to build) and is
  * itself faster than the generator pipeline it replaces.
  */
object BucketJaccardKernel {
  private val OUT_SCHEMA = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))

  def outType: DataType = ArrayType(OUT_SCHEMA, containsNull = false)

  private val SMALL_CUT = 64

  def pairs(items: ArrayData, threshold: Double): ArrayData = {
    val n = items.numElements()
    val ids = new Array[Long](n)
    val shs = new Array[Array[Long]](n)
    val szs = new Array[Int](n)
    val guests = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val r = items.getStruct(i, 4)
      ids(i) = r.getLong(0)
      shs(i) = r.getArray(1).toLongArray()
      szs(i) = r.getInt(2)
      guests(i) = r.getBoolean(3)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]

    // the bucket emission rules + the exact former verify arithmetic:
    // guest/guest pairs arise once as home/home a bucket up — skip; the
    // size-ratio prefilter (min/max ≥ t, DOUBLE division like the SQL
    // filter it replaces) bounds J from above; the merge-scan is the
    // SortedJaccardGe kernel verbatim (need-bound epsilon included)
    def tryPair(a: Int, b: Int): Unit = {
      if (guests(a) && guests(b)) return
      val sa = szs(a); val sb = szs(b)
      val ratio = math.min(sa, sb).toDouble / math.max(sa, sb)
      if (!(ratio >= threshold)) return
      val x = shs(a); val y = shs(b)
      val na = x.length; val nb = y.length
      val need = threshold * (na + nb) / (1.0 + threshold) - 1e-7
      var i = 0; var j = 0; var inter = 0
      while (i < na && j < nb &&
          inter + math.min(na - i, nb - j) >= need) {
        val xa = x(i); val xb = y(j)
        if (xa == xb) { inter += 1; i += 1; j += 1 }
        else if (xa < xb) i += 1
        else j += 1
      }
      val jac = inter.toDouble / (na + nb - inter)
      if (jac >= threshold) out += InternalRow(ids(a), ids(b), jac)
    }

    def allPairsLoop(): Unit = {
      var a = 0
      while (a < n) {
        var b = a + 1
        while (b < n) { tryPair(a, b); b += 1 }
        a += 1
      }
    }

    if (n <= SMALL_CUT || threshold <= 0.0 || threshold >= 1.0) {
      allPairsLoop()
      return new GenericArrayData(out.toArray[Any])
    }

    // ---- primitive-array prefix filter (no boxing anywhere on this path:
    // the first cut of this kernel used HashMap/tuple sorts and spent more
    // on allocation than the m²/2 loop it replaced spent on compute) ----

    // distinct grams + in-bucket df via one sorted multiset pass.
    // total accumulates in a LONG: a bucket near the 65,536-member routing
    // cap with tens-of-thousands-shingle documents overflows an Int, and a
    // negative array size would crash exactly the extreme-scale path this
    // kernel protects. Past 1<<30 grams the flat index itself is the memory
    // hazard — route those through the plain m²/2 loop (which allocates
    // nothing bucket-wide) rather than allocating a multi-GB scratch array.
    var totalL = 0L
    i = 0
    while (i < n) { totalL += shs(i).length; i += 1 }
    if (totalL > (1L << 30)) {
      // exactness-preserving escape hatch, but at 65k+ members × huge
      // shingle arrays the m²/2 loop is ~10^13 merge ops in ONE task —
      // effectively a hang, not an OOM. Log loudly (executor stderr) so an
      // operator can find the offending block and route it through the
      // bigBucket shuffle path instead of waiting on a silent task.
      org.slf4j.LoggerFactory.getLogger(BucketJaccardKernel.getClass).warn(
        s"bucket_jaccard_pairs: bucket with $n members / $totalL total " +
          "grams exceeds the 2^30-gram prefix-index cap; falling back to " +
          "the quadratic all-pairs loop IN ONE TASK. If this task runs too " +
          "long, lower ngramJaccardPairs(bigBucket=...) so blocks this " +
          "size route through the shuffle-based prefix join.")
      allPairsLoop()
      return new GenericArrayData(out.toArray[Any])
    }
    val total = totalL.toInt
    val all = new Array[Long](total)
    var w = 0
    i = 0
    while (i < n) {
      val sh = shs(i)
      System.arraycopy(sh, 0, all, w, sh.length); w += sh.length
      i += 1
    }
    java.util.Arrays.sort(all)
    var distinct = 0
    i = 0
    while (i < total) {
      var j = i + 1
      while (j < total && all(j) == all(i)) j += 1
      distinct += 1; i = j
    }
    val grams = new Array[Long](distinct)
    val df = new Array[Int](distinct)
    var d = 0
    i = 0
    while (i < total) {
      var j = i + 1
      while (j < total && all(j) == all(i)) j += 1
      grams(d) = all(i); df(d) = j - i; d += 1; i = j
    }

    // per-doc rarest-first prefix as gram RANKS: sort packed
    // (df << 32 | rank) longs — (df, gram) ascending is one total order
    // per bucket (ranks order like gram values); prefix length
    // sz − ⌈t·sz⌉ + 1 (1e-9 slack: a float ⌈⌉ rounding UP would lose
    // completeness; one long is a few extra candidates)
    val prefRanks = new Array[Array[Int]](n)
    i = 0
    while (i < n) {
      val sh = shs(i); val sz = sh.length
      if (sz == 0) prefRanks(i) = Array.emptyIntArray
      else {
        val pl = math.min(sz, sz - math.ceil(threshold * sz - 1e-9).toInt + 1)
        val keys = new Array[Long](sz)
        var j = 0
        while (j < sz) {
          val r = java.util.Arrays.binarySearch(grams, sh(j))
          keys(j) = (df(r).toLong << 32) | r.toLong
          j += 1
        }
        java.util.Arrays.sort(keys)
        val pr = new Array[Int](pl)
        j = 0
        while (j < pl) { pr(j) = (keys(j) & 0xffffffffL).toInt; j += 1 }
        prefRanks(i) = pr
      }
      i += 1
    }

    // postings per gram rank over prefix entries only
    val cnt = new Array[Int](distinct)
    i = 0
    while (i < n) {
      val pr = prefRanks(i); var j = 0
      while (j < pr.length) { cnt(pr(j)) += 1; j += 1 }
      i += 1
    }
    // adaptive density gate: the prefix index costs Σ df_pref² posting
    // visits; on a gram-dense bucket (template-heavy corpus, tiny vocab)
    // that can exceed the m²/2 the plain loop pays with a far smaller
    // constant — pick whichever enumeration is provably cheaper here.
    // Both enumerate a superset of the same output; only cost changes.
    var visits = 0.0
    d = 0
    while (d < distinct) {
      visits += cnt(d).toDouble * cnt(d); d += 1
    }
    if (visits > n.toDouble * n / 2) {
      allPairsLoop()
      return new GenericArrayData(out.toArray[Any])
    }
    val off = new Array[Int](distinct + 1)
    d = 0
    while (d < distinct) { off(d + 1) = off(d) + cnt(d); d += 1 }
    val post = new Array[Int](off(distinct))
    val fill = java.util.Arrays.copyOf(off, distinct)
    i = 0
    while (i < n) {
      val pr = prefRanks(i); var j = 0
      while (j < pr.length) {
        val r = pr(j); post(fill(r)) = i; fill(r) += 1; j += 1
      }
      i += 1
    }
    // doc-major probe with an epoch scratch array: docs ascend, so member
    // a < member b whenever a's posting precedes b's insertion scan — each
    // unordered pair is tried at most once per epoch owner, no hash set
    val epoch = new Array[Int](n)
    java.util.Arrays.fill(epoch, -1)
    var b = 0
    while (b < n) {
      val pr = prefRanks(b); var j = 0
      while (j < pr.length) {
        val r = pr(j)
        var p = off(r)
        val end = off(r + 1)
        while (p < end) {
          val a = post(p)
          if (a < b && epoch(a) != b) { epoch(a) = b; tryPair(a, b) }
          p += 1
        }
        j += 1
      }
      b += 1
    }
    // probe emission order is (b, a)-major — restore the deterministic
    // (id_a, id_b) order the all-pairs branch produces
    val arr = out.toArray
    java.util.Arrays.sort(arr, new java.util.Comparator[InternalRow] {
      override def compare(x: InternalRow, y: InternalRow): Int = {
        val c = java.lang.Long.compare(x.getLong(0), y.getLong(0))
        if (c != 0) c else java.lang.Long.compare(x.getLong(1), y.getLong(1))
      }
    })
    new GenericArrayData(arr.toArray[Any])
  }
}

/** (array<struct<jid bigint, sh array<bigint>, sz int, guest boolean>>,
  * threshold) → array<struct<id_a, id_b, jaccard>> — see
  * [[BucketJaccardKernel]]. Input MUST be id-sorted ascending (the caller's
  * sort_array over a jid-first struct) so id_a < id_b. The threshold rides
  * as a plain literal child → generic named-extension-function wire path.
  */
case class BucketJaccardPairs(left: Expression, right: Expression)
  extends BinaryExpression {
  override def prettyName: String = "bucket_jaccard_pairs"
  override def dataType: DataType = BucketJaccardKernel.outType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StructType(Array(
            StructField(_, LongType, _, _),
            StructField(_, ArrayType(LongType, _), _, _),
            StructField(_, IntegerType, _, _),
            StructField(_, BooleanType, _, _))), _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bucket_jaccard_pairs requires (ARRAY<STRUCT<BIGINT, ARRAY<BIGINT>, " +
          s"INT, BOOLEAN>>, DOUBLE), got $other")
    }

  override protected def nullSafeEval(items: Any, th: Any): Any =
    BucketJaccardKernel.pairs(items.asInstanceOf[ArrayData],
      th.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (items, th) =>
      s"${ev.value} = graft.functions.BucketJaccardKernel.pairs($items, $th);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
