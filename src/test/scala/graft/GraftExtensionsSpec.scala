package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The session-extension surface: every graft kernel injects as a
  * permanent function and resolves from pure SQL. registerFunctions is
  * the exact hook SparkSession.applyExtensions drives at session build
  * (spark.sql.extensions=graft.GraftExtensions), exercised here against
  * the live session's registry — no fragile global-session juggling.
  */
class GraftExtensionsSpec extends SparkTestBase {

  /** registerFunctions is what SparkSession.applyExtensions calls at
    * session build; it is private[sql] in Scala but public in bytecode,
    * so the test drives the exact production path reflectively. */
  private def applyTo(ext: SparkSessionExtensions): Unit =
    classOf[SparkSessionExtensions]
      .getMethod("registerFunctions",
        classOf[org.apache.spark.sql.catalyst.analysis.FunctionRegistry])
      .invoke(ext, spark.sessionState.functionRegistry)

  test("every kernel injects and resolves; SQL computes through them") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    applyTo(ext)
    GraftExtensions.registrations.foreach { case (name, _) =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name did not register")
    }
    // scalar kernels from pure SQL
    assert(spark.sql(
      "SELECT vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D))")
      .head().getDouble(0) == 1.0)
    assert(spark.sql(
      "SELECT pq_adc(array(0), array(array(2.5D)))").head().getDouble(0) == 2.5)
    assert(spark.sql(
      "SELECT sorted_jaccard_ge(array(1L, 2L), array(1L, 2L), 0.5D)")
      .head().getDouble(0) == 1.0)
    assert(spark.sql(
      """SELECT pq_encode(array(0.9D, 0.1D),
        |  array(array(array(0.0D), array(1.0D)), array(array(0.0D), array(1.0D))))"""
        .stripMargin).head().getSeq[Int](0) == Seq(1, 0))
    // aggregates resolve and compute
    assert(spark.sql(
      """SELECT CAST(theta_estimate(theta_sketch_agg_long(x)) AS BIGINT)
        |FROM VALUES (1L), (2L), (2L) AS t(x)""".stripMargin)
      .head().getLong(0) == 2L)
    assert(spark.sql(
      """SELECT might_contain(bloom_filter_agg(xxhash64(x), 3L, 64L), xxhash64(2L))
        |FROM VALUES (1L), (2L), (3L) AS t(x)""".stripMargin)
      .head().getBoolean(0))
  }

  test("minhash_sig rejects a non-literal hash count loudly") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    applyTo(ext)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), CAST(rand() * 4 AS INT))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getMessage.toLowerCase.contains("minhash"), e.getMessage)
  }
}
