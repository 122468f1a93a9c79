package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING (round 15): learn the merge table
  * from the corpus itself instead of fabricating it
  * (BpeV2.generateMerges is a synthetic construction — this is the real
  * pipeline step it stood in for).
  *
  * Classic iterative BPE (Sennrich-style), shaped for Spark:
  *   1. ONE corpus-sized pass builds the word-frequency table
  *     (`[a-z]+` over lowercased text, groupBy word). Everything after
  *     runs over the VOCABULARY (bounded: distinct words), never the
  *     corpus — the property that makes k merge rounds affordable at
  *     100 TB: round cost is O(|vocab| · avg word length), independent
  *     of corpus size.
  *   2. k rounds of: adjacent-symbol pair count (weighted by word freq,
  *      overlapping pairs counted — the standard counting rule) → argmax
  *      with a DETERMINISTIC tie-break (count desc, then left asc, right
  *      asc — binary string order, identical in Spark and DuckDB) → merge
  *      applied to every word.
  *
  * Determinism contract (what lets a SQL oracle replay training): each
  * word's segmentation is carried as a STRING of wrapped symbols,
  * `(h)(e)(l)(l)(o)` — wrapping makes symbols self-delimiting, so
  * applying a merge is a plain `replace(seg, "(a)(b)", "(ab)")`, and
  * both Spark's and DuckDB's `replace` scan left-to-right replacing
  * non-overlapping occurrences: exactly BPE's greedy merge-all rule,
  * with NO order-of-evaluation freedom left to either engine.
  *
  * The driver holds only the argmax row per round (one tiny collect per
  * round — the same bounded-fit pattern as IVF's Lloyd iterations); the
  * segmentations never leave the cluster.
  */
object BpeTrain {

  /** One learned merge: `rank` is the round it was learned in (lower =
    * earlier = higher priority when tokenizing), `cnt` the weighted pair
    * count that won the round. */
  final case class Merge(rank: Int, left: String, right: String, cnt: Long)

  private val SymbolRe = """\(([^()]+)\)"""

  /** Initial segmentation: every character self-wrapped. */
  private def charSeg(word: Column): Column =
    regexp_replace(word, "(.)", "($1)")

  /** Word-frequency table with initial segmentations: (word, freq, seg).
    * THE one corpus-sized job of training. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seg", charSeg(col("word")))

  /** Adjacent-pair counts over the current segmentations (freq-weighted,
    * overlapping pairs counted). Exposed for the plan gate. */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("syms",
        regexp_extract_all(col("seg"), lit(SymbolRe), lit(1)))
      .filter(size(col("syms")) >= 2)
      // sequence(1, n-1) needs n >= 2: Spark generates a DESCENDING
      // sequence for start > stop, so the filter above is load-bearing
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Learn `numMerges` merges from the corpus. Stops early (returning
    * fewer) only if the vocabulary fully coalesces — no adjacent pair
    * remains anywhere. */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var cur = wordFreq(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cur.count()
    val out = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val best = pairCounts(cur)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        out += Merge(r, a, b, best(0).getLong(2))
        val next = cur.withColumn("seg",
          replace(col("seg"), lit(s"($a)($b)"), lit(s"($a$b)")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        cur.unpersist(blocking = false)
        cur = next
        r += 1
      }
    }
    cur.unpersist(blocking = false)
    out.result()
  }

  /** The whole training LOOP as ONE wire artifact (round 15): init state,
    * the per-round plan — pair count, argmax, merge application, merge
    * append — and the round count ride as a single `Rel.ExtIteration`;
    * the consumer runs the loop. Where [[learnMerges]] collects one
    * argmax row per round to the driver, here the argmax is RELATIONAL
    * (sort + fetch-1, deterministic tie-break) and the winning pair
    * reaches the segmentations through a constant-key left join — no
    * driver round-trips, no host state in the artifact.
    *
    * State is one schema-preserving frame carrying BOTH populations:
    *   ('w', word, seg,  freq, 0)     — current segmentations
    *   ('m', left, right, cnt, rank)  — merges learned so far
    * Each round appends at most one 'm' row (rank = current merge count,
    * so ranks are 0-based in learn order) and rewrites every 'w' row's
    * seg. If the vocabulary fully coalesces the argmax goes empty, the
    * left join finds nothing and the remaining rounds are cheap no-ops —
    * the merge table equals the host loop's early-stopped one exactly
    * (the per-round fixpoint check would buy the early exit back at one
    * extra full-state job per round; numMerges bounds the loop either
    * way, so the check stays off).
    *
    * Returns the learned merge table (rk, lhs, rhs, cnt), rk ascending.
    * (The post-fixpoint projection is host-side: the consumed state is a
    * lineage-truncated snapshot, unproducible by design — t36 joins the
    * d08/d13/d14/d17 fixpoint-materializing family.)
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  stepThroughWire: Boolean = false): DataFrame = {
    if (!stepThroughWire) {
      val spark = docs.sparkSession
      import spark.implicits._
      return learnMerges(docs, textCol, numMerges)
        .map(m => (m.rank, m.left, m.right, m.cnt))
        .toDF("rk", "lhs", "rhs", "cnt").orderBy("rk")
    }
    learnMergesWire(docs, textCol, numMerges)
  }

  private def learnMergesWire(docs: DataFrame, textCol: String,
                              numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    val init = wordFreq(docs, textCol).select(
      lit("w").as("tag"), col("word").as("a"), col("seg").as("b"),
      col("freq").as("n1"), lit(0L).as("n2"))
    def body(state: DataFrame): DataFrame = {
      val words = state.filter(col("tag") === "w")
        .select(col("a").as("word"), col("b").as("seg"),
          col("n1").as("freq"))
      val merges = state.filter(col("tag") === "m")
      // relational argmax: the winning pair is a 0-or-1-row frame
      val win = pairCounts(words)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
      // 0-based rank of the new merge = how many exist already
      val winR = win.crossJoin(merges.agg(count(lit(1)).as("__rank")))
        .withColumn("__k", lit(1))
      val newMerge = winR.select(lit("m").as("tag"), col("a"), col("b"),
        col("cnt").as("n1"), col("__rank").as("n2"))
      val newWords = words.withColumn("__k", lit(1))
        .join(winR.select(col("__k"), col("a").as("__l"),
          col("b").as("__r")), Seq("__k"), "left")
        .select(lit("w").as("tag"), col("word").as("a"),
          when(col("__l").isNull, col("seg")).otherwise(
            replace(col("seg"),
              concat(lit("("), col("__l"), lit(")("), col("__r"), lit(")")),
              concat(lit("("), col("__l"), col("__r"), lit(")"))))
            .as("b"),
          col("freq").as("n1"), lit(0L).as("n2"))
      // Partition-growth cap, round-15 optimization pass: a union's
      // partition count is the SUM of its children's, and two of the
      // three branches derive from the state — uncapped, the state's
      // partition count ~doubles every round and the loop goes
      // exponential in TASKS (measured on the probe: 0.5 s rounds
      // becoming 19 s by round 12 with constant plans and constant
      // data). The build round capped it with a full-state hash
      // exchange; that re-shuffles the WHOLE vocabulary every round for
      // rows that never need to move — the 'w' branch is narrow (a
      // broadcast join + per-row replace preserves the initial wordFreq
      // partitioning), so only the TINY branches need placing. Squeezing
      // (merges ∪ newMerge) — ≤ numMerges+1 rows by construction, the
      // loop bound, not the data — through one repartition(1) caps
      // growth at +1 partition per round (bounded by maxIters) and
      // removes the vocab-scale exchange from the round's critical path
      // entirely: per round the state moves ≤ 13 rows instead of all of
      // it. guide §2.1 — remove the shuffle outright.
      newWords
        .unionByName(merges.select("tag", "a", "b", "n1", "n2")
          .unionByName(newMerge)
          .repartition(1))
    }
    // Double-hop rounds (the connectedComponents trick) REFUTED here, opt
    // round 15, measured: body∘body with half the iterations read 17.8 s
    // vs 9.6 s on the sf0.1 probe (2.5 s per materialization vs 2×0.65).
    // CC's body binds the state in cheap column-pruned joins; THIS body
    // binds it under a TakeOrdered+broadcast argmax subtree, and with no
    // materialization between hops the outer hop re-derives the whole
    // inner body once per state reference (4 binds) — the duplicated
    // argmax/broadcast stages cost far more than the saved checkpoint.
    val plan = graft.substrait.Producer.produceIteration(init, body,
      maxIters = numMerges, checkFixpoint = false)
    val decoded = graft.substrait.Wire.decode(
      graft.substrait.Wire.encode(plan))
    graft.substrait.Consumer.consume(spark, decoded,
        reliableIteration = Some(false))
      .toDF("tag", "a", "b", "n1", "n2")
      .filter(col("tag") === "m")
      .select(col("n2").cast("int").as("rk"), col("a").as("lhs"),
        col("b").as("rhs"), col("n1").as("cnt"))
      .orderBy("rk")
  }

  /** Final segmentations under a set of learned merges, replayed from
    * scratch (rank order, same replace semantics): (word, freq, n_tok).
    * This is tokenization-as-training-saw-it — the spec pins that the
    * greedy BpeLookup tokenizer reproduces it exactly. */
  def tokenizedWords(docs: DataFrame, textCol: String,
                     merges: Seq[Merge]): DataFrame = {
    val words = wordFreq(docs, textCol)
    val seg = merges.sortBy(_.rank).foldLeft(col("seg")) { (acc, m) =>
      replace(acc, lit(s"(${m.left})(${m.right})"),
        lit(s"(${m.left}${m.right})"))
    }
    words.withColumn("seg", seg)
      .withColumn("n_tok",
        size(regexp_extract_all(col("seg"), lit(SymbolRe), lit(1))))
      .select("word", "freq", "seg", "n_tok")
  }
}
