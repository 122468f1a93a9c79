package graft.substrait

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Foreign-bytes conformance (round-11 verdict task 4): the five golden
  * plans in FOREIGN_BYTES.md, hand-derived byte-by-byte from the PUBLIC
  * substrait v0.3 .proto definitions — independent of BOTH of this repo's
  * encoders (Wire and the test-only IndependentWire) — executed against the
  * reference's own CSV fixture schema (reference/tests/roundtrip.rs:284-299:
  * data(a BIGINT, b DECIMAL(5,2), c DATE, d BOOLEAN), two rows) and checked
  * against DuckDB's results for the same queries (recorded in the doc).
  *
  * The bytes use proto3-CANONICAL emission (zero-valued fields absent — the
  * policy prost, the reference's serializer, actually uses), so they also
  * regression-pin the round-10 default-omission decode fixes: column-0
  * field refs, anchor-0 functions, mask item 0.
  *
  * If one of these fails after a Wire change, the WIRE drifted from the
  * public spec — fix Wire, never the fixture (the derivation in
  * FOREIGN_BYTES.md is the authority, and it regenerates these hexes).
  */
class ConsumerCompatSpec extends SparkTestBase {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // the reference's create_context() fixture: tests/testdata/data.csv with
  // the explicit schema from roundtrip.rs:286-293
  private lazy val fixture: Unit = {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", DecimalType(5, 2)),
      StructField("c", DateType), StructField("d", BooleanType)))
    val rows = java.util.Arrays.asList(
      Row(1L, new java.math.BigDecimal("2.00"),
        java.sql.Date.valueOf("2020-01-01"), false),
      Row(3L, new java.math.BigDecimal("4.50"),
        java.sql.Date.valueOf("2020-01-01"), true))
    spark.createDataFrame(rows, schema).createOrReplaceTempView("data")
  }

  private def runGolden(hexFile: String): Seq[String] = {
    fixture
    val plan = Wire.decode(unhex(hexFile))
    assert(Validator.validate(plan).isEmpty,
      Validator.validate(plan).mkString("; "))
    Consumer.consume(spark, plan).collect().map(_.toString).toSeq.sorted
  }

  // FOREIGN_BYTES.md §G1 — SELECT a, b FROM data (ReadRel + canonical mask
  // with the field-0 StructItem encoded as an EMPTY message)
  private val g1 =
    "1a4c124a0a420a40122c0a01610a01620a01630a0164121e0a043a0210010a09c2010608" +
    "02100520010a0582010210010a040a02100122080a060a000a0208013a060a0464617461" +
    "120161120162"

  // FOREIGN_BYTES.md §G2 — SELECT a, b FROM data WHERE a > 1 (FilterRel;
  // anchor-0 "gt" function whose function_reference field is ABSENT)
  private val g2 =
    "120c1a0a08ffffffff0f1a0267741a6212600a58125612420a40122c0a01610a01620a01" +
    "630a0164121e0a043a0210010a09c201060802100520010a0582010210010a040a021001" +
    "22080a060a000a0208013a060a04646174611a101a0e120612040a02120012040a023801" +
    "120161120162"

  // FOREIGN_BYTES.md §G3 — SELECT a FROM data ORDER BY a DESC LIMIT 1
  // (SortRel direction DESC_NULLS_FIRST=3 + FetchRel count=1, offset absent)
  private val g3 =
    "1a5b12590a541a52124e2a4c123e0a3c122c0a01610a01620a01630a0164121e0a043a02" +
    "10010a09c201060802100520010a0582010210010a040a02100122040a020a003a060a04" +
    "646174611a0a0a0612040a02120010032001120161"

  // FOREIGN_BYTES.md §G4 — SELECT d, sum(b) AS s FROM data GROUP BY d
  // (AggregateRel; mask REORDERS columns to (d,b); INVOCATION_ALL=1)
  private val g4 =
    "120d1a0b08ffffffff0f1a0373756d1a6c126a0a62226012440a42122c0a01610a01620a" +
    "01630a0164121e0a043a0210010a09c201060802100520010a0582010210010a040a0210" +
    "01220a0a080a0208030a0208013a060a04646174611a080a0612040a021200220e0a0c12" +
    "0812060a04120208013001120164120173"

  // FOREIGN_BYTES.md §G5 — SELECT a FROM data WHERE b > 2.50
  // AND c = DATE '2020-01-01' (ProjectRel over FilterRel; 16-byte LE decimal
  // literal, date literal as epoch days, three-entry extension registry)
  private val g5 =
    "120d1a0b08ffffffff0f1a03616e64120e1a0c08ffffffff0f10011a02677412111a0f08" +
    "ffffffff0f10021a05657175616c1a9e01129b010a95013a92011287011284011238" +
    "0a36122c0a01610a01620a01630a0164121e0a043a0210010a09c20106080210052001" +
    "0a0582010210010a040a0210013a060a04646174611a481a46122b1a29080112081206" +
    "0a0412020801121b0a19c201160a10fa000000000000000000000000000000100518" +
    "0212171a150802120812060a041202080212070a058001d68e011a0612040a021200" +
    "120161"

  // FOREIGN_BYTES.md §G6 — SELECT d.a, d2.b FROM data d JOIN data d2
  // ON d.a = d2.a (JoinRel: left=2/right=3/expression=4/type=6, INNER=1;
  // the join condition's right-side FieldRef indexes the COMBINED 8-column
  // row; project takes fields 0 and 5)
  private val g6 =
    "120f1a0d08ffffffff0f1a05657175616c1ab30112b0010aa7013aa401128f01328c01" +
    "12380a36122c0a01610a01620a01630a0164121e0a043a0210010a09c2010608021005" +
    "20010a0582010210010a040a0210013a060a04646174611a380a36122c0a01610a0162" +
    "0a01630a0164121e0a043a0210010a09c201060802100520010a0582010210010a040a" +
    "0210013a060a046461746122141a12120612040a0212001208" +
    "12060a041202080430011a0612040a0212001a0812060a0412020805120161120162"

  test("G1: read + canonical mask (column-0 item is an empty message)") {
    // DuckDB: [(1, 2.00), (3, 4.50)]
    assert(runGolden(g1) == Seq("[1,2.00]", "[3,4.50]"))
  }

  test("G2: filter with an anchor-0 extension function") {
    // DuckDB: [(3, 4.50)]
    assert(runGolden(g2) == Seq("[3,4.50]"))
  }

  test("G3: sort DESC_NULLS_FIRST + fetch count=1 with offset absent") {
    // DuckDB: [(3,)]
    assert(runGolden(g3) == Seq("[3]"))
  }

  test("G4: aggregate over a column-REORDERING mask") {
    // DuckDB: [(false, 2.00), (true, 4.50)] — sum(decimal(5,2)) widens the
    // scale-preserved precision (Spark: decimal(15,2)); values must agree
    assert(runGolden(g4) == Seq("[false,2.00]", "[true,4.50]"))
  }

  test("G5: decimal + date literals under and/gt/equal, project over filter") {
    // DuckDB: [(3,)]
    assert(runGolden(g5) == Seq("[3]"))
  }

  // FOREIGN_BYTES.md §G7 — SELECT a FROM data UNION ALL SELECT a FROM data
  // (SetRel: inputs=2 repeated, op=3; SET_OP_UNION_ALL=6)
  private val g7 =
    "1a8e01128b010a8501428201123e0a3c122c0a01610a01620a01630a0164121e0a043a" +
    "0210010a09c201060802100520010a0582010210010a040a02100122040a020a003a06" +
    "0a0464617461123e0a3c122c0a01610a01620a01630a0164121e0a043a0210010a09c2" +
    "01060802100520010a0582010210010a040a02100122040a020a003a060a0464617461" +
    "1806120161"

  // FOREIGN_BYTES.md §G8 — SELECT a FROM data ORDER BY a OFFSET 1 with
  // FetchRel.count ABSENT: the reference encodes "no LIMIT" as count=0
  // (producer.rs:147-150), which canonical proto3 omits entirely — a
  // consumer that treats the absent count as LIMIT 0 returns zero rows
  private val g8 =
    "1a5b12590a541a52124e2a4c123e0a3c122c0a01610a01620a01630a0164121e0a043a" +
    "0210010a09c201060802100520010a0582010210010a040a02100122040a020a003a06" +
    "0a04646174611a0a0a0612040a02120010011801120161"

  test("G8: absent FetchRel.count means NO limit (the reference's quirk), not LIMIT 0") {
    // DuckDB: [(3,)] — offset 1 of the ascending 2-row table
    assert(runGolden(g8) == Seq("[3]"))
  }

  test("G7: SetRel UNION ALL duplicates survive") {
    // DuckDB: [(1,), (1,), (3,), (3,)]
    assert(runGolden(g7) == Seq("[1]", "[1]", "[3]", "[3]"))
  }

  test("G6: inner self-join with combined-row field refs") {
    // DuckDB: [(1, 2.00), (3, 4.50)]
    assert(runGolden(g6) == Seq("[1,2.00]", "[3,4.50]"))
  }

  test("golden bytes survive a graft re-encode round-trip") {
    // consuming foreign bytes is half the contract; the other half is that
    // graft's own encoding of the decoded plan decodes back unchanged
    for (g <- Seq(g1, g2, g3, g4, g5, g6, g7, g8)) {
      val plan = Wire.decode(unhex(g))
      assert(Wire.decode(Wire.encode(plan)) == plan)
    }
  }
}
