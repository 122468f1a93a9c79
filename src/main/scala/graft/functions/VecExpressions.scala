package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot paths.
  *
  * `Similarity.cosine` composed from `zip_with`/`aggregate` is correct but
  * interpreted (higher-order lambdas don't codegen) and traverses the arrays
  * three times (dot, |a|, |b|). These expressions run inside whole-stage
  * codegen as a single fused loop over primitive doubles — the preference
  * order of the build guide: built-ins first, a native Expression with
  * doGenCode when the built-ins can't deliver the hot-path shape.
  *
  * Numerics are kept bit-identical to the HOF formulation: the same
  * sequential IEEE fold order, `dot / (sqrt(na) * sqrt(nb))` — so swapping
  * implementations cannot move any oracle-checked value.
  */
abstract class VecBinaryExpression extends BinaryExpression {
  // ExpectsInputTypes is unusable outside the sql package in Spark 4
  // (AbstractDataType is private[sql]); check explicitly instead
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
}

/** sum(a[i] * b[i]) — sequential fold, identical to aggregate(zip_with(...)). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0d; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in ONE pass. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sum((a[i] - b[i])^2) — squared L2, for IVF cell assignment. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0d; var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level entry points: expressions register in the active session's
  * function registry (idempotent) and resolve through call_function — no
  * private Column constructors needed.
  */
object VecFunctions {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  /** public hook: the substrait consumer registers the kernels before
    * resolving a foreign plan that names them as extension functions */
  def ensureSessionRegistered(): Unit = ensureRegistered()

  // synchronized: a thread losing the registered.add race must BLOCK until
  // the winner finishes createOrReplaceTempFunction — otherwise a pooled
  // Verify query can analyze against a not-yet-registered name
  private def ensureRegistered(): Unit = synchronized {
    val spark = SparkSession.active
    val key = System.identityHashCode(spark).toString
    if (registered.add(key)) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vec_cosine", es => VecCosine(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vec_l2sq", es => VecL2Sq(es(0), es(1)), "scala_udf")
    }
  }

  def vecDot(a: Column, b: Column): Column = {
    ensureRegistered(); call_function("vec_dot", a, b)
  }
  def vecCosine(a: Column, b: Column): Column = {
    ensureRegistered(); call_function("vec_cosine", a, b)
  }
  def vecL2Sq(a: Column, b: Column): Column = {
    ensureRegistered(); call_function("vec_l2sq", a, b)
  }
}
