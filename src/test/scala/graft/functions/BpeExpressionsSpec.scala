package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The bpe_count kernel: known-value walks of the v1 merge table, the
  * batch-vs-sequential fixpoint equivalence the SQL oracle relies on, and
  * the codegen'd column path.
  */
class BpeExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference: one occurrence at a time — always re-pick the
    * globally lowest-rank pair and merge only its LEFTMOST occurrence.
    * This is exactly what the DuckDB recursive oracle does; under a
    * table's construction invariant it must agree with the kernel's
    * all-occurrences batch merge.
    */
  private def sequentialTokensWith(merges: Array[(String, String)],
                                   word: String): List[String] = {
    val rank = merges.zipWithIndex
      .map { case ((l, r), i) => (l, r) -> i }.toMap
    var syms = word.map(String.valueOf(_)).toList
    var done = false
    while (!done && syms.length > 1) {
      val cands = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(rk => (rk, i)) }
      if (cands.isEmpty) done = true
      else {
        val (rk, i) = cands.min
        val (l, r) = merges(rk)
        syms = syms.take(i) ++ List(l + r) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  private def sequentialTokens(word: String): List[String] =
    sequentialTokensWith(Bpe.mergesV1, word)

  test("known-value walks of the v1 table") {
    assert(Bpe.tokenizeWord("the") == List("the"))
    assert(Bpe.tokenizeWord("scan") == List("scan"))
    assert(Bpe.tokenizeWord("table") == List("ta", "ble"))
    assert(Bpe.tokenizeWord("customer") == List("c", "u", "st", "om", "er"))
    assert(Bpe.tokenizeWord("query") == List("q", "u", "ery"))
    assert(Bpe.tokenizeWord("data") == List("da", "ta"))
    assert(Bpe.tokenizeWord("agg") == List("a", "gg"))
    assert(Bpe.tokenizeWord("a") == List("a"))
    assert(Bpe.tokenizeWord("") == Nil)
    // overlapping same-pair runs merge left-to-right non-overlapping
    assert(Bpe.tokenizeWord("ggg") == List("gg", "g"))
    assert(Bpe.tokenizeWord("gggg") == List("gg", "gg"))
    // whole-text count sums words across whitespace runs
    assert(Bpe.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "the  table\tdata")) == 1 + 2 + 2)
  }

  test("batch merge == one-occurrence-at-a-time fixpoint (oracle equivalence)") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefghijklmnopqrstuvwy" // the table's character universe+
    for (_ <- 1 to 500) {
      val w = Seq.fill(rnd.nextInt(12) + 1)(alpha(rnd.nextInt(alpha.length)))
        .mkString
      assert(Bpe.tokenizeWord(w) == sequentialTokens(w), s"word=$w")
    }
    // and on the real corpus vocabulary
    for (w <- Seq("key", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "line", "merge",
      "order", "part", "query", "row", "scan", "slow", "small", "sort",
      "spark", "stream", "table", "the", "value", "vector", "window"))
      assert(Bpe.tokenizeWord(w) == sequentialTokens(w), s"word=$w")
  }

  test("column path computes through codegen and handles null") {
    val df = Seq(Some("the table"), Some(""), None).toDF("text")
    val got = df.select(BpeFunctions.bpeCount(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(got == Seq(3, 0, -1))
  }

  test("v2 generated table: size, rank rule, and construction invariant") {
    val m = BpeV2.merges
    assert(m.length == 50000)
    // level 1: rank(c1,c2) = i1*26 + i2 over all lowercase bigrams
    assert(m(0) == ("a", "a") && m(25) == ("a", "z") && m(26) == ("b", "a"))
    assert(m(675) == ("z", "z"))
    // level 2: rank 676 + idx1*676 + idx2 over (bigram, bigram)
    assert(m(676) == ("aa", "aa") && m(677) == ("aa", "ab"))
    assert(m(676 + 676) == ("ab", "aa"))
    // invariant re-checked (generateMerges already requires it at init)
    Bpe.checkInvariant(m)
    // duplicate-pair check built the 50k map without collision
    assert(BpeV2.lookup.rankOf.size == 50000)
  }

  test("v2 known-value walks (multi-level greedy, not positional pairing)") {
    def tok(w: String) = Bpe.tokenizeWordWith(BpeV2.lookup, w)
    // 'he' (rank 186) beats 'th' (501): greedy picks lowest rank anywhere
    assert(tok("the") == List("t", "he"))
    // 'ab' (rank 1) beats 'bc' (rank 28)
    assert(tok("abc") == List("ab", "c"))
    // bigram phase then the (aa,aa) level-2 merge at rank 676
    assert(tok("aaaa") == List("aaaa"))
    // (zz,zz) pair rank 676 + 675*676 + 675 ≥ 50000: no level-2 merge
    assert(tok("zzzz") == List("zz", "zz"))
    assert(tok("scanner") == List("sc", "an", "n", "er"))
    assert(tok("") == Nil)
    // non-letters never merge
    assert(tok("a·b") == List("a", "·", "b"))
  }

  test("v2 batch merge == one-occurrence fixpoint (oracle equivalence, 50k table)") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 300) {
      val w = Seq.fill(rnd.nextInt(14) + 1)(('a' + rnd.nextInt(26)).toChar)
        .mkString
      assert(Bpe.tokenizeWordWith(BpeV2.lookup, w) ==
        sequentialTokensWith(BpeV2.merges, w), s"word=$w")
    }
  }

  test("v2 column path: broadcast table reaches codegen; nulls pass through") {
    val df = Seq(Some("the scanner"), Some(""), None).toDF("text")
    val got = df.select(BpeFunctions.bpeCountV2(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(got == Seq(2 + 4, 0, -1))
    // the broadcast is shared per context, not rebuilt per call
    assert(BpeFunctions.tableV2(spark) eq BpeFunctions.tableV2(spark))
  }
}
