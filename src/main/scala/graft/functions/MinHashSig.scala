package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static hashing kernel, callable from generated Java (top-level object →
  * static forwarders). Each shingle hashes ONCE (FNV-1a 64 over UTF-8 bytes);
  * the k independent hash functions derive from that base via splitmix64
  * finalization of (base ^ seed_j·φ) — the standard "one hash + k mixes"
  * MinHash construction, avoiding k string traversals per element.
  */
object VecHash {
  final val GOLDEN = 0x9E3779B97F4A7C15L

  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001B3L; i += 1 }
    h
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + GOLDEN
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 64-bit SimHash over an array<string>: per non-null token, fnv1a hash
    * bits vote +1/−1 per position; bit b of the result is set when votes are
    * positive. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature of an array<string>: sig[j] = min over elements of
    * splitmix64(fnv1a(elem) ^ j·φ). Null elements are skipped.
    */
  def minhash(arr: ArrayData, numHashes: Int): Array[Long] = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = fnv1a(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < numHashes) {
          val h = splitmix64(base ^ (j.toLong * GOLDEN))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    sig
  }
}

/** array<string> → bigint 64-bit SimHash; single codegen'd pass: each
  * token's FNV-1a hash bits vote ±1 per position, fingerprint bit b set when
  * the vote is positive.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    VecHash.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecHash.simhash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<string> → array<bigint> MinHash signature; single codegen'd pass. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VecHash.minhash(v.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecHash.minhash($c, $numHashes))")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashFunctions {

  /** public hook: the substrait consumer registers the kernels before
    * resolving a foreign plan that names them as extension functions */
  def ensureSessionRegistered(): Unit = ensureRegistered()

  // once-per-live-session; synchronization lives in SessionRegistry
  private def ensureRegistered(): Unit =
    SessionRegistry.once("minhash") { spark =>
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction(
        "minhash_sig",
        es => MinHashSig(es(0), es(1) match {
          case Literal(n: Int, _) => n
          case other => throw model.badArg(other.toString)
        }),
        "scala_udf")
      reg.createOrReplaceTempFunction(
        "simhash64", es => SimHash64(es(0)), "scala_udf")
    }

  def minhashSig(shingles: Column, numHashes: Int): Column = {
    ensureRegistered()
    call_function("minhash_sig", shingles, org.apache.spark.sql.functions.lit(numHashes))
  }

  def simhash64(tokens: Column): Column = {
    ensureRegistered()
    call_function("simhash64", tokens)
  }

  private object model {
    def badArg(s: String) =
      new IllegalArgumentException(s"minhash_sig numHashes must be an int literal, got $s")
  }
}
