package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Grouped top-k as a FIXED-WIDTH DeclarativeAggregate (opt round 15).
  *
  * The kNN top-k was a row_number window (`rank <= k`): Spark's
  * WindowGroupLimit pushdown keeps the per-query exchange skinny, but its
  * Partial step still SORTS every candidate row per partition — at 100x
  * s20 that is a 424M-row local sort costing ~2/3 of the query while the
  * join+cosine work costs 1/3 (S20Probe, measured). A grouped top-k is an
  * O(n) streaming insert, not a sort: this aggregate keeps the k best
  * (key DESC NULLS LAST, id ASC — exactly the window's order) in 2k
  * mutable fixed-width buffer slots, so it hash-aggregates (never
  * ObjectHashAggregate's 128-group sort fallback, never SortAggregate)
  * and reduces map-side: each partition sends at most k slots per group
  * into the exchange, the same volume WindowGroupLimit shipped, minus
  * both of its sorts.
  *
  * Order contract (bit-identical to the window): doubles compare in
  * Spark's total order (NaN greatest, NaN = NaN, -0.0 < 0.0 — the same
  * SQLOrderingUtil comparison the sort uses), null keys rank last, ties
  * break on id ascending. Ids must be NON-NULL (a null id never enters —
  * the kNN join key contract); empty slots are null-id slots, always
  * trailing. Result: array<struct<key, id>> of length k, empty slots
  * null-id — callers posexplode and filter `id IS NOT NULL`, pos+1 being
  * exactly the window's row_number.
  *
  * k is a foldable literal child (it rides the wire as an argument) and
  * is capped small: the merge expression chains k inserts whose tree size
  * grows ~3^k per slot — k <= 4 keeps analysis/codegen sane (k = 8 was
  * MEASURED to hang the analyzer on the merge tree); the kNN entry points
  * dispatch to the window form above that.
  */
case class TopKByKey(key: Expression, id: Expression, kExpr: Expression)
    extends DeclarativeAggregate {
  override def prettyName: String = "topk_by_key"
  override def children: Seq[Expression] = Seq(key, id, kExpr)
  override def nullable: Boolean = false

  val k: Int = kExpr match {
    case Literal(n: Int, IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$prettyName k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || k > 4)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be in [1,4]: $k")
    else if (!RowOrdering.isOrderable(key.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName key type ${key.dataType} is not orderable")
    else if (!RowOrdering.isOrderable(id.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName id type ${id.dataType} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", key.dataType), StructField("id", id.dataType))))

  private lazy val ks: Seq[AttributeReference] = (0 until k).map(j =>
    AttributeReference(s"topk_key$j", key.dataType)())
  private lazy val ids: Seq[AttributeReference] = (0 until k).map(j =>
    AttributeReference(s"topk_id$j", id.dataType)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = ks ++ ids

  override lazy val initialValues: Seq[Expression] =
    ks.map(a => Literal.create(null, a.dataType)) ++
      ids.map(a => Literal.create(null, a.dataType))

  /** (aK, aI) strictly precedes (bK, bI) in (key DESC NULLS LAST, id ASC);
    * a null-id b is an empty slot (always loses), a null-id a never wins
    * (null ids don't enter). Comparisons are Catalyst's — doubles get the
    * total order the window's sort used. */
  private def better(aK: Expression, aI: Expression,
                     bK: Expression, bI: Expression): Expression =
    And(IsNotNull(aI), Or(IsNull(bI),
      CaseWhen(Seq(
        (And(IsNull(aK), IsNull(bK)), LessThan(aI, bI)),
        (IsNull(aK), Literal(false)),
        (IsNull(bK), Literal(true)),
        (GreaterThan(aK, bK), Literal(true)),
        (LessThan(aK, bK), Literal(false))),
        LessThan(aI, bI))))

  /** One sorted-insert step: candidate (cK, cI) into descending slots. */
  private def insert(state: Seq[(Expression, Expression)],
                     cK: Expression, cI: Expression)
      : Seq[(Expression, Expression)] =
    state.zipWithIndex.map { case ((sJ, iJ), j) =>
      val candBeatsJ = better(cK, cI, sJ, iJ)
      if (j == 0)
        (If(candBeatsJ, cK, sJ), If(candBeatsJ, cI, iJ))
      else {
        val (sP, iP) = state(j - 1)
        val candBeatsPrev = better(cK, cI, sP, iP)
        (If(candBeatsJ, If(candBeatsPrev, sP, cK), sJ),
         If(candBeatsJ, If(candBeatsPrev, iP, cI), iJ))
      }
    }

  override lazy val updateExpressions: Seq[Expression] = {
    val st = insert(ks.zip(ids).map { case (a, b) => (a: Expression, b: Expression) },
      key, id)
    st.map(_._1) ++ st.map(_._2)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    var st: Seq[(Expression, Expression)] =
      ks.zip(ids).map { case (a, b) => (a.left: Expression, b.left: Expression) }
    (0 until k).foreach { j => st = insert(st, ks(j).right, ids(j).right) }
    st.map(_._1) ++ st.map(_._2)
  }

  override lazy val evaluateExpression: Expression =
    CreateArray((0 until k).map(j => CreateNamedStruct(Seq(
      Literal("key"), ks(j), Literal("id"), ids(j)))))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKFunctions {
  def ensureSessionRegistered(): Unit =
    SessionRegistry.once("topk") { spark =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "topk_by_key",
        es => TopKByKey(es(0), es(1), es(2)).toAggregateExpression(),
        "scala_udf")
    }

  /** Top-k (id, key) pairs per group by (key DESC NULLS LAST, id ASC) —
    * the row_number-window order — as array<struct<key,id>> with null-id
    * trailing padding. */
  def topkByKey(key: Column, id: Column, k: Int): Column = {
    ensureSessionRegistered()
    call_function("topk_by_key", key, id, lit(k))
  }
}
