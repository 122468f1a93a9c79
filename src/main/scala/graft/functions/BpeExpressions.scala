package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic greedy byte-pair-encoding token counter — the subword
  * budgeting primitive behind sequence packing (t29): whitespace/char token
  * counts under-budget real tokenizers, so packSequences can take BPE counts
  * instead.
  *
  * Algorithm is the public GPT-2 merge procedure: a word starts as its
  * character sequence; repeatedly the adjacent pair with the LOWEST merge
  * rank is merged (all non-overlapping occurrences, left to right) until no
  * adjacent pair is in the table. Token count = sum over whitespace-split
  * words of the terminal symbol count.
  *
  * The merge table is a versioned literal constant (`mergesV1`) honoring
  * the BPE construction invariant — every merge's operands are single
  * characters or the product of an EARLIER merge. Under that invariant the
  * batch merge (all occurrences per chosen pair) and the
  * one-occurrence-at-a-time fixpoint reach the same terminal state, which
  * is what lets a SQL oracle replay the table as a recursive join-loop
  * (BpeSpec property-checks the equivalence on random words).
  *
  * Scale notes: the kernel is a static JVM method over the row's own text —
  * codegen'd call site, no per-row allocation beyond the symbol buffer, no
  * broadcast state, zero shuffle. The merge table is bounded (28 entries)
  * and compiled in, so 1000 executors need no side channel.
  */
object Bpe {

  /** v1 merge table, rank order. Pairs over lowercase ASCII; multi-level
    * (th+e, bl+e, in+e, sc+an, ar+k, er+y) so the greedy rank loop is
    * genuinely exercised, not just a bigram lookup.
    */
  val mergesV1: Array[(String, String)] = Array(
    "t" -> "h", "th" -> "e", "e" -> "r", "a" -> "n", "i" -> "n",
    "o" -> "w", "a" -> "r", "s" -> "t", "a" -> "l", "b" -> "l",
    "bl" -> "e", "u" -> "e", "d" -> "a", "t" -> "a", "k" -> "e",
    "in" -> "e", "j" -> "o", "h" -> "a", "s" -> "c", "sc" -> "an",
    "ar" -> "k", "er" -> "y", "g" -> "g", "r" -> "t", "o" -> "m",
    "r" -> "e", "o" -> "r", "g" -> "e")

  private val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](64)
    var i = 0
    while (i < mergesV1.length) {
      val (l, r) = mergesV1(i)
      val prev = m.put(l + " " + r, i)
      require(prev == null, s"duplicate merge pair ($l,$r)")
      i += 1
    }
    m
  }
  // construction invariant: operands are single chars or earlier products
  locally {
    val produced = scala.collection.mutable.Set[String]()
    mergesV1.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.length == 1 || produced.contains(l),
        s"merge $i left '$l' not produced by an earlier merge")
      require(r.length == 1 || produced.contains(r),
        s"merge $i right '$r' not produced by an earlier merge")
      produced += l + r
    }
  }

  /** Greedy BPE over one word: terminal symbols. Exposed for the spec. */
  def tokenizeWord(word: String): List[String] = {
    if (word.isEmpty) return Nil
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var n = word.length
    while (n > 1) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      i = 0
      while (i < n - 1) {
        val r = rankOf.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) return syms.take(n).toList
      // merge all non-overlapping occurrences of that pair, left to right
      val (bl, br) = mergesV1(best)
      val out = new Array[String](n)
      var o = 0
      i = 0
      while (i < n) {
        if (i < n - 1 && syms(i) == bl && syms(i + 1) == br) {
          out(o) = bl + br; o += 1; i += 2
        } else { out(o) = syms(i); o += 1; i += 1 }
      }
      syms = out; n = o
    }
    syms.take(n).toList
  }

  /** Terminal symbol count of one word (allocation-light hot path). */
  def wordTokenCount(word: String): Int = tokenizeWord(word).length

  /** BPE token count of a whole text: sum over whitespace-split words.
    * Static entry point for the codegen'd expression.
    */
  def countTokens(text: UTF8String): Int = {
    if (text == null) return 0
    val s = text.toString
    var total = 0
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) total += wordTokenCount(s.substring(start, i))
    }
    total
  }
}

/** string → int BPE token count under the compiled-in v1 merge table. */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bpe_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires STRING, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    Bpe.countTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-level entry point + idempotent session registration (the
  * VecFunctions convention; the substrait consumer calls the hook before
  * resolving foreign plans that name bpe_count).
  */
object BpeFunctions {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  def ensureSessionRegistered(): Unit = ensureRegistered()

  private def ensureRegistered(): Unit = synchronized {
    val spark = SparkSession.active
    val key = System.identityHashCode(spark).toString
    if (registered.add(key)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bpe_count", es => BpeCount(es(0)), "scala_udf")
    }
  }

  def bpeCount(text: Column): Column = {
    ensureRegistered(); call_function("bpe_count", text)
  }
}
