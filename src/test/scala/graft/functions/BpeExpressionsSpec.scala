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
    * This is exactly what the DuckDB recursive oracle does; under the v1
    * table's construction invariant it must agree with the kernel's
    * all-occurrences batch merge.
    */
  private def sequentialTokens(word: String): List[String] = {
    val rank = Bpe.mergesV1.zipWithIndex
      .map { case ((l, r), i) => (l, r) -> i }.toMap
    var syms = word.map(String.valueOf(_)).toList
    var done = false
    while (!done && syms.length > 1) {
      val cands = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(rk => (rk, i)) }
      if (cands.isEmpty) done = true
      else {
        val (rk, i) = cands.min
        val (l, r) = Bpe.mergesV1(rk)
        syms = syms.take(i) ++ List(l + r) ++ syms.drop(i + 2)
      }
    }
    syms
  }

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
}
