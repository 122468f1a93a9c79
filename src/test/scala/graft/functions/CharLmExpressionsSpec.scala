package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** charlm_fold must replay the SQL aggregate-HOF composition it replaced
  * BIT-IDENTICALLY: same HALF_UP-scaled long logs, same wrapping sum, same
  * NULL-on-missing-bigram, same code-point bigram semantics — asserted on
  * the corpus fixture and on adversarial strings (supplementary plane,
  * missing grams, minimal lengths).
  */
class CharLmExpressionsSpec extends SparkTestBase {

  private def sqlFold(textCol: String, modelMap: org.apache.spark.sql.Column) =
    aggregate(
      expr(s"""element_at(transform(array(lower($textCol)), tx ->
              |  transform(sequence(1, length(tx) - 1),
              |    i -> substring(tx, i, 2))), 1)""".stripMargin),
      lit(0L), (a, g) =>
        a + round(log(element_at(modelMap, g)) * 1e9).cast("long"))

  test("kernel == SQL composition on the corpus fixture, through codegen") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents").filter(length(col("text")) >= 2)
    // fit the same bigram model the op fits
    val scored = graft.ops.TextOps.charLmScore(docs)
    val grams = docs.select(col("doc_id"), explode(expr(
      """element_at(transform(array(lower(text)),
        |  tx -> transform(sequence(1, length(tx) - 1),
        |          i -> substring(tx, i, 2))), 1)""".stripMargin)).as("g"))
    val bc = grams.groupBy("g").agg(count(lit(1)).as("bc"))
    val pc = bc.groupBy(substring(col("g"), 1, 1).as("c1"))
      .agg(sum("bc").as("pc"))
    val entries = bc.join(pc, substring(col("g"), 1, 1) === col("c1"))
      .select(col("g"), (col("bc").cast("double") / col("pc")).as("p"))
      .collect()
    val modelMap = map(entries.toSeq.sortBy(_.getString(0)).flatMap(r =>
      Seq(lit(r.getString(0)), lit(r.getDouble(1)))): _*)
    val viaSql = docs.select(col("doc_id"),
      (length(lower(col("text"))) - 1).cast("long").as("n_bigrams"),
      round(sqlFold("text", modelMap).cast("double") / 1e9
        / (length(lower(col("text"))) - 1), 6).as("avg_logp"))
    val a = scored.orderBy("doc_id").collect().map(_.toSeq)
    val b = viaSql.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("adversarial strings: missing grams, code points, minimal lengths") {
    import spark.implicits._
    val model = map(lit("ab"), lit(0.5), lit("b𝄞"), lit(0.25),
      lit("𝄞c"), lit(0.125), lit("bc"), lit(0.5))
    def run(s: String): Option[(Long, Long)] = {
      val r = Seq(s).toDF("t")
        .select(CharLmFunctions.charlmFold(col("t"), model).as("f"))
        .select(col("f").getField("n_bigrams"), col("f").getField("slp"))
        .head()
      if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    }
    // supplementary-plane char counts as ONE code point (Spark substring
    // semantics): "ab𝄞c" has bigrams ab, b𝄞, 𝄞c
    assert(run("ab𝄞c") == Some((3L,
      CharLmFunctions.scaledLog(0.5) + CharLmFunctions.scaledLog(0.25)
        + CharLmFunctions.scaledLog(0.125))))
    assert(run("abc") == Some((2L,
      CharLmFunctions.scaledLog(0.5) + CharLmFunctions.scaledLog(0.5))))
    assert(run("ax") == None, "missing bigram must be NULL, not skipped")
    assert(run("a") == None && run("") == None,
      "fewer than 2 code points folds to NULL")
    // null text → null result (expression-level, not kernel-level)
    val nr = Seq(Option.empty[String]).toDF("t")
      .select(CharLmFunctions.charlmFold(col("t"), model).as("f")).head()
    assert(nr.isNullAt(0))
  }

  test("fit-agg overflow fallback: the distributed join path scores identically") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents").limit(100)
    val viaKernel = graft.ops.TextOps.charLmScore(docs)
      .orderBy("doc_id").collect().map(_.toSeq)
    // maxLiteralModel=1 overflows the fit aggregate immediately → the
    // explode-fit + broadcast-join branch runs instead; same values
    val viaJoin = graft.ops.TextOps.charLmScore(docs, maxLiteralModel = 1)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaKernel.length == viaJoin.length && viaKernel.length > 0)
    viaKernel.zip(viaJoin).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("scaled log replays Spark's HALF_UP round exactly") {
    import spark.implicits._
    for (p <- Seq(0.5, 1.0 / 3.0, 1e-9, 0.9999999)) {
      val sparkScaled = Seq(p).toDF("p")
        .select(round(log(col("p")) * 1e9).cast("long")).head().getLong(0)
      assert(sparkScaled == CharLmFunctions.scaledLog(p), s"p=$p")
    }
  }
}
