package graft.substrait

import graft.SparkTestBase

/** Roundtrip certification for the everyday-SQL scalar-function tail added
  * to Producer.namedScalarFns beyond the reference's operator set. Each
  * probe runs real SQL over a small fixture, rides the wire, and compares
  * result multisets — so a name whose Catalyst children order diverges from
  * its SQL argument order (the generic-case contract) fails loudly here
  * rather than silently producing wrong values for a foreign consumer.
  */
class ScalarFnProbeSpec extends SparkTestBase {

  private lazy val fixture: Unit = {
    import spark.implicits._
    Seq(
      (1L, "Hello World", 2.5, 10, "2024-03-15"),
      (2L, "spark,sql,engine", -0.5, 255, "2023-12-01"),
      (3L, "  padded  ", 0.0, 7, "2024-01-31"))
      .toDF("id", "s", "d", "n", "ds")
      .createOrReplaceTempView("fn_data")
  }

  private def probe(exprs: String*): Unit = {
    fixture
    val failures = exprs.flatMap { e =>
      try { assertRoundtrip(spark.sql(s"SELECT id, $e AS v FROM fn_data")); None }
      catch { case t: Throwable =>
        val at = t.getStackTrace.filter(f => f.getClassName.startsWith("graft"))
          .take(2).mkString(" @ ", " ; ", "")
        Some(s"$e -> ${t.getMessage.linesIterator.next()}$at") }
    }
    assert(failures.isEmpty, failures.mkString("\n  ", "\n  ", ""))
  }

  test("string function tail rides the wire") {
    probe(
      "translate(s, 'lo', '01')",
      "initcap(s)",
      "repeat(s, 2)",
      "ascii(s)",
      "chr(n + 60)",
      "base64(cast(s AS binary))",
      // unbase64 returns BINARY; Row.toString on byte arrays compares by
      // identity, so re-encode for the value comparison
      "base64(unbase64(base64(cast(s AS binary))))",
      "char_length(s)",
      "overlay(s PLACING 'XY' FROM 2 FOR 3)",
      "levenshtein(s, 'Hello Word')",
      "soundex(s)",
      "substring_index(s, ',', 2)",
      "find_in_set('sql', s)",
      "format_string('%s-%d', s, n)",
      "format_number(d * 1000, 2)",
      "elt(1 + n % 2, s, ds)",
      "locate('l', s, 2)",
      "bit_length(s)",
      "space(n % 4)",
      "contains(s, 'sql')",
      "startswith(s, 'He')",
      "endswith(s, 'ine')")
  }

  test("math function tail rides the wire") {
    probe(
      "asin(d / 10)", "acos(d / 10)",
      "sinh(d)", "cosh(d)", "tanh(d)",
      "asinh(d)", "acosh(n)", "atanh(d / 10)",
      "cot(d + 1.5)", "sec(d)", "csc(d + 0.5)",
      "cbrt(n)", "log2(n)", "log(2, n)",
      "degrees(d)", "radians(n)",
      "hypot(d, n)", "expm1(d)", "log1p(n)",
      "rint(d * 3)", "bround(d * 3.456, 2)",
      "factorial(n % 10)", "conv(n, 10, 16)",
      "hex(n)", "hex(unhex(hex(n)))", "bin(n)",
      "width_bucket(n, 0, 300, 6)")
  }

  test("date function tail rides the wire") {
    probe(
      "date_format(cast(ds AS date), 'yyyy/MM')",
      "add_months(cast(ds AS date), 3)",
      "months_between(cast(ds AS date), date'2024-01-01')",
      "last_day(cast(ds AS date))",
      "next_day(cast(ds AS date), 'Monday')",
      "weekday(cast(ds AS date))",
      "trunc(cast(ds AS date), 'MM')",
      "make_date(2024, n % 12 + 1, 5)",
      "to_unix_timestamp(cast(ds AS date))",
      "dayname(cast(ds AS date))",
      "monthname(cast(ds AS date))")
  }

  test("array/map function tail rides the wire") {
    probe(
      "arrays_zip(array(1, 2), array(s, ds))",
      "array_append(array(1, 2), n)",
      "array_prepend(array(1, 2), n)",
      "array_insert(array(1, 2, 3), 2, n)",
      "map_from_entries(array(named_struct('k', 1, 'v', s), named_struct('k', 2, 'v', ds)))",
      "str_to_map('a:1,b:2', ',', ':')")
  }

  test("misc function tail rides the wire") {
    probe(
      "sha1(cast(s AS binary))",
      "isnan(acos(n))",
      "nanvl(acos(n), 0.0)",
      "typeof(d)",
      "getbit(n, 2)")
  }

  test("RuntimeReplaceable functions ride as their desugared replacement") {
    // these analyze to RuntimeReplaceable wrappers; the producer emits the
    // replacement (Producer.scala rec(r.replacement)), so no allowlist entry
    // is needed — certify a representative set keeps working end-to-end
    probe(
      "try_divide(n, d)",
      "try_add(n, 2147483647)",
      "try_element_at(array(1, 2, 3), n % 3 + 1)",
      "btrim(s)",
      "position('l' IN s)",
      "left(s, 3)", "right(s, 3)")
    // split_part desugars through StringSplitSQL + ElementAt(failOnError=
    // false), whose no-error contract has no wire form — it must reject
    // loudly rather than ride as ANSI element_at and throw on the consumer
    fixture
    val err = intercept[Exception] {
      Serializer.roundtrip(spark,
        spark.sql("SELECT split_part(s, ',', 2) AS v FROM fn_data"))
    }
    assert(err.getMessage.contains("NotImplemented"), err.getMessage)
  }
}
