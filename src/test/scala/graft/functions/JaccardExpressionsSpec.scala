package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** SortedJaccardGe: the early-terminating verify kernel must be EXACT —
  * identical jaccards to array_intersect arithmetic, including pairs at
  * exactly the threshold (the early-exit bound may only delay the break,
  * never produce a wrong NULL).
  */
class JaccardExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def jac(a: Seq[Long], b: Seq[Long], t: Double): Option[Double] = {
    val df = Seq((a.sorted, b.sorted)).toDF("a", "b")
    Option(df.select(JaccardFunctions.sortedJaccardGe(col("a"), col("b"), t))
      .collect()(0)).filterNot(_.isNullAt(0)).map(_.getDouble(0))
  }

  test("matches array_intersect arithmetic on random sets") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(60).toLong).distinct
      val b = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(60).toLong).distinct
      val inter = a.toSet.intersect(b.toSet).size
      val expect = inter.toDouble / (a.size + b.size - inter)
      val t = 0.3
      assert(jac(a, b, t) == (if (expect >= t) Some(expect) else None),
        s"a=$a b=$b expect=$expect")
    }
  }

  test("exact-threshold pairs survive (early exit never overshoots)") {
    // |A∩B|=9, |A∪B|=10 → J=0.9 exactly, at threshold 0.9
    val shared = (1L to 9L).toSeq
    assert(jac(shared :+ 100L, shared, 0.9) == Some(0.9))
    // J=0.5 exactly at t=0.5: |A∩B|=2, |A∪B|=4
    assert(jac(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), 0.5) == Some(0.5))
  }

  test("disjoint sets return NULL fast at high thresholds") {
    assert(jac((1L to 1000L).toSeq, (2000L to 3000L).toSeq, 0.9).isEmpty)
  }

  private def cont(a: Seq[Long], b: Seq[Long], t: Double): Option[Double] = {
    val df = Seq((a.sorted, b.sorted)).toDF("a", "b")
    Option(df.select(JaccardFunctions.sortedContainmentGe(col("a"), col("b"), t))
      .collect()(0)).filterNot(_.isNullAt(0)).map(_.getDouble(0))
  }

  test("containment matches set arithmetic, is asymmetric, exact at the boundary") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(60).toLong).distinct
      val b = Seq.fill(rnd.nextInt(40) + 1)(rnd.nextInt(60).toLong).distinct
      val expect = a.toSet.intersect(b.toSet).size.toDouble / a.size
      assert(cont(a, b, 0.3) == (if (expect >= 0.3) Some(expect) else None),
        s"a=$a b=$b expect=$expect")
    }
    // a strict subset: containment(A→B)=1 regardless of how large B grows,
    // while jaccard sinks below any threshold — the case the kernel exists for
    val aSub = (1L to 10L).toSeq
    val bSup = (1L to 200L).toSeq
    assert(cont(aSub, bSup, 0.99) == Some(1.0))
    assert(jac(aSub, bSup, 0.3).isEmpty)
    assert(cont(bSup, aSub, 0.9).isEmpty, "reverse direction must not qualify")
    // |A∩B|=9, |A|=10 → containment 0.9 exactly at threshold 0.9
    assert(cont((1L to 10L).toSeq, (1L to 9L).toSeq :+ 99L, 0.9) == Some(0.9))
  }

  test("containment kernel runs inside whole-stage codegen") {
    val df = spark.range(5)
      .select(sequence(col("id"), col("id") + 3).as("a"),
        sequence(col("id") + 1, col("id") + 4).as("b"))
      .select(JaccardFunctions.sortedContainmentGe(col("a"), col("b"), 0.4).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("sorted_containment_ge") && l.trim.startsWith("*(")), plan)
  }

  test("kernel runs inside whole-stage codegen and rides the wire") {
    // range-backed (not literal) input so ConvertToLocalRelation can't fold
    // the kernel away before it reaches codegen
    val df = spark.range(5)
      .select(sequence(col("id"), col("id") + 3).as("a"),
        sequence(col("id") + 1, col("id") + 4).as("b"))
      .select(col("a"), col("b"),
        JaccardFunctions.sortedJaccardGe(col("a"), col("b"), 0.4).as("j"))
    // the `*(n)` prefix marks a WholeStageCodegen stage; the kernel's
    // project must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("sorted_jaccard_ge") && l.trim.startsWith("*(")), plan)
    // wire round-trip over a table-backed plan (Range isn't producible)
    graft.Tables.register(spark, sfDir)
    assertRoundtrip(spark.table("documents")
      .select(col("doc_id"), sequence(col("doc_id"), col("doc_id") + 3).as("a"),
        sequence(col("doc_id") + 1, col("doc_id") + 4).as("b"))
      .select(col("doc_id"), JaccardFunctions
        .sortedJaccardGe(col("a"), col("b"), 0.4).as("j")))
  }
}
