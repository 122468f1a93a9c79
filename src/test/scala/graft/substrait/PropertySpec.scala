package graft.substrait

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property round-trips: random typed expression trees over the reference
  * fixture produce→encode→decode→consume to identical results. Exercises the
  * producer/consumer far beyond the 28 fixed reference cases (SURVEY.md §5
  * port strategy — ScalaCheck "random literal/operator trees").
  *
  * Literal magnitudes are kept small: Spark 4 runs ANSI mode, so arithmetic
  * overflow / division are real runtime errors, not wraparound.
  */
class PropertySpec extends SparkTestBase {

  private lazy val fixture: Unit = {
    import spark.implicits._
    Seq((1L, 2.5d, true, "alpha"), (3L, 4.25d, false, "beta"),
      (7L, -1.75d, true, "gamma"), (-2L, 0.0d, false, "alpha delta"))
      .toDF("a", "b", "d", "s")
      // struct-typed column: random trees pick nested refs (st.x, st.inner.y)
      // so the DirectReference child-chain path is property-covered
      .select(col("a"), col("b"), col("d"), col("s"),
        struct(col("a").as("x"),
          struct(col("b").as("y")).as("inner")).as("st"))
      .createOrReplaceTempView("prop_data")
  }

  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit = {
    var i = 0
    while (i < n) {
      val a = gen.pureApply(Gen.Parameters.default, Seed(i.toLong), retries = 100)
      try check(a)
      catch { case e: Throwable => throw new AssertionError(s"seed $i", e) }
      i += 1
    }
  }

  private def numExpr(depth: Int): Gen[Column] = {
    val leaf = Gen.oneOf(
      Gen.const(col("a")), Gen.const(col("b")),
      Gen.const(col("st").getField("x")),
      Gen.const(col("st").getField("inner").getField("y")),
      Gen.choose(-50, 50).map(n => lit(n.toLong)),
      Gen.choose(-50.0, 50.0).map(lit(_)))
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> Gen.zip(numExpr(depth - 1), numExpr(depth - 1)).map { case (x, y) => x + y },
      2 -> Gen.zip(numExpr(depth - 1), numExpr(depth - 1)).map { case (x, y) => x - y },
      1 -> Gen.zip(numExpr(depth - 1), Gen.choose(-9, 9)).map { case (x, n) => x * lit(n.toLong) },
      1 -> numExpr(depth - 1).map(x => -x),
      1 -> Gen.zip(boolExpr(depth - 1), numExpr(depth - 1), numExpr(depth - 1))
        .map { case (c, t, f) => when(c, t.cast("double")).otherwise(f.cast("double")) })
  }

  private def boolExpr(depth: Int): Gen[Column] = {
    val leaf = Gen.oneOf(
      Gen.const(col("d")), Gen.const(!col("d")),
      Gen.const(col("s").like("%a%")), Gen.const(col("s").rlike("a.*a")),
      Gen.const(col("a").isNull), Gen.const(col("b").isNotNull))
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      2 -> Gen.zip(numExpr(depth - 1), numExpr(depth - 1), Gen.choose(0, 5)).map {
        case (x, y, 0) => x.cast("double") === y.cast("double")
        case (x, y, 1) => x.cast("double") =!= y.cast("double")
        case (x, y, 2) => x.cast("double") < y.cast("double")
        case (x, y, 3) => x.cast("double") <= y.cast("double")
        case (x, y, 4) => x.cast("double") > y.cast("double")
        case (x, y, _) => x.cast("double") >= y.cast("double")
      },
      1 -> Gen.zip(boolExpr(depth - 1), boolExpr(depth - 1)).map { case (x, y) => x && y },
      1 -> Gen.zip(boolExpr(depth - 1), boolExpr(depth - 1)).map { case (x, y) => x || y },
      1 -> boolExpr(depth - 1).map(x => !x))
  }

  test("random projection+filter trees round-trip to identical results") {
    fixture
    val gen = for {
      nCols <- Gen.choose(1, 4)
      exprs <- Gen.listOfN(nCols, numExpr(3))
      pred <- boolExpr(3)
      withFilter <- Gen.oneOf(true, false)
    } yield (exprs, pred, withFilter)

    forAllSeeded(gen, 80) { case (exprs, pred, withFilter) =>
      val base = spark.table("prop_data")
      val projected = base.select(
        exprs.zipWithIndex.map { case (e, i) => e.as(s"c$i") }: _*)
      val df = if (withFilter) base.filter(pred).select(
        exprs.zipWithIndex.map { case (e, i) => e.as(s"c$i") }: _*) else projected
      assertRoundtrip(df)
    }
  }

  test("random aggregates round-trip") {
    fixture
    val aggGen = for {
      grp <- Gen.oneOf(Seq(col("d")), Seq(col("s")), Seq(col("d"), col("s")))
      e <- numExpr(2)
      kind <- Gen.choose(0, 3)
    } yield (grp, e, kind)
    forAllSeeded(aggGen, 40) { case (grp, e, kind) =>
      val a = kind match {
        case 0 => sum(e.cast("double"))
        case 1 => max(e.cast("double"))
        case 2 => min(e.cast("double"))
        case _ => count(e)
      }
      assertRoundtrip(
        spark.table("prop_data").groupBy(grp: _*).agg(a.as("m")))
    }
  }

  test("random sort+offset+limit shapes round-trip in order") {
    fixture
    val sortKey: Gen[Column] = for {
      c <- Gen.oneOf(col("b"), col("s"), col("d"))
      dir <- Gen.choose(0, 3)
    } yield dir match {
      case 0 => c.asc_nulls_first
      case 1 => c.asc_nulls_last
      case 2 => c.desc_nulls_first
      case _ => c.desc_nulls_last
    }
    val gen = for {
      nk <- Gen.choose(1, 2)
      keys <- Gen.listOfN(nk, sortKey)
      off <- Gen.choose(0, 3)
      cnt <- Gen.choose(1, 4)
      withFetch <- Gen.oneOf(true, false)
    } yield (keys, off, cnt, withFetch)
    forAllSeeded(gen, 40) { case (keys, off, cnt, withFetch) =>
      // a unique final key ("a") totalizes the order, so ordered compare
      // is well-defined even when the random keys tie
      val sorted = spark.table("prop_data").select("a", "b", "d", "s")
        .orderBy(keys :+ col("a").asc: _*)
      val df = if (withFetch) sorted.offset(off).limit(cnt) else sorted
      assertRoundtrip(df, ordered = true)
    }
  }
}
