package graft.substrait

import org.scalatest.funsuite.AnyFunSuite

import model._

/** Golden wire-format fixtures: stored plan bytes are a PERSISTENCE format —
  * they must decode identically in every future version of this library. If
  * one of these fails, the wire format changed incompatibly: bump/branch the
  * format rather than editing the fixture.
  */
class GoldenWireSpec extends AnyFunSuite {

  private val filterAggPlan = Plan(
    Seq(ExtensionFunction(0xffffffffL, 0, "gt"), ExtensionFunction(0xffffffffL, 1, "sum")),
    Seq(PlanRel.Root(
      Rel.Aggregate(
        Rel.Filter(
          Rel.Read(
            NamedStruct(Seq("a", "b"), Seq((SType.SI64, true), (SType.SDecimal(5, 2), true))),
            Seq("data"), Some(Seq(0, 1))),
          SExpr.ScalarFn(0, Seq(SExpr.FieldRef(0), SExpr.Lit(LitVal.LI64(1))))),
        Seq(Seq(SExpr.FieldRef(0))),
        Seq(Measure(AggFunction(1, Seq(SExpr.FieldRef(1)), AggInvocation.All), None))),
      Seq("a", "total"))))

  private val filterAggHex =
    "120e1a0c08ffffffff0f10001a026774120f1a0d08ffffffff0f10011a0373756d1a7d127b0a" +
    "6f226d124b124912310a2f12190a01610a016212110a043a0210010a09c20106080210052001" +
    "220a0a080a0208000a0208013a060a04646174611a141a120800120812060a04120208001204" +
    "0a0238011a0a0a0812060a041202080022120a100801120812060a0412020801200030011201" +
    "611205746f74616c"

  private val windowPlan = Plan(Nil, Seq(PlanRel.RelOnly(
    Rel.Project(
      Rel.Read(NamedStruct(Seq("x"), Seq((SType.SFp64, true))), Seq("t"), None),
      Seq(SExpr.WindowFn(0, Seq(SExpr.FieldRef(0)), Seq(SExpr.FieldRef(0)),
        Seq(SortField(SExpr.FieldRef(0), SortDirection.AscNullsFirst)),
        WBound.Unbounded, WBound.CurrentRow, rowFrame = true))))))

  private val windowHex =
    "1a4c0a4a3a4812140a12120b0a017812060a045a0210013a030a01741a302a2e080012081206" +
    "0a04120208001a0c0a0812060a0412020800100122021a002a022200420812060a0412020800" +
    "4801"

  private val stagePlan = Plan(Nil, Seq(PlanRel.Root(
    Rel.ExtStage(
      Rel.Read(NamedStruct(Seq("doc_id", "media_type", "payload"),
        Seq((SType.SI64, true), (SType.SStr, true), (SType.SBin, true))),
        Seq("media"), None),
      "graft.media_features_v1"),
    Seq("doc_id", "media_type", "n_bytes", "feature"))))

  private val stageHex =
    "1aa40112a1010a794a77123e0a3c12310a06646f635f69640a0a6d656469615f747970650a07" +
    "7061796c6f616412120a043a0210010a04620210010a046a0210013a070a056d656469611a35" +
    "0a1867726166742e6465762f537461676552656c44657461696c12190a1767726166742e6d65" +
    "6469615f66656174757265735f76311206646f635f6964120a6d656469615f7479706512076e" +
    "5f6279746573120766656174757265"

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("filter+aggregate plan encodes to the golden bytes") {
    assert(hex(Wire.encode(filterAggPlan)) == filterAggHex)
  }

  test("golden filter+aggregate bytes decode to the same plan") {
    assert(hex(Wire.encode(Wire.decode(unhex(filterAggHex)))) == filterAggHex)
    val p = Wire.decode(unhex(filterAggHex))
    assert(p.extensions.map(_.name) == Seq("gt", "sum"))
    p.relations.head match {
      case PlanRel.Root(Rel.Aggregate(Rel.Filter(r: Rel.Read, _), gs, ms), names) =>
        assert(r.tableNames == Seq("data"))
        assert(gs == Seq(Seq(SExpr.FieldRef(0))))
        assert(ms.head.function.functionReference == 1)
        assert(names == Seq("a", "total"))
      case other => fail(s"unexpected structure: $other")
    }
  }

  test("window plan encodes to the golden bytes and decodes back") {
    assert(hex(Wire.encode(windowPlan)) == windowHex)
    assert(hex(Wire.encode(Wire.decode(unhex(windowHex)))) == windowHex)
  }

  // round-3 additions: extension rels + map/list literals. Golden bytes
  // frozen on first release of the message; self-consistency asserted the
  // same way (encode → decode → encode must be byte-stable).
  private val extPlan = Plan(Nil, Seq(PlanRel.RelOnly(
    Rel.ExtGenerate(
      Rel.ExtExchange(
        Rel.Read(NamedStruct(Seq("xs"), Seq((SType.SList(SType.SI32, true), true))),
          Seq("t"), None),
        Seq(SExpr.FieldRef(0)), 4),
      "explode", SExpr.FieldRef(0), outer = false, genArity = 1))))

  private val litPlan = Plan(Nil, Seq(PlanRel.RelOnly(
    Rel.Project(
      Rel.Read(NamedStruct(Seq("x"), Seq((SType.SI32, true))), Seq("t"), None),
      Seq(
        SExpr.Lit(LitVal.LList(SType.SI32, Seq(LitVal.LI32(1), LitVal.LI32(2)))),
        SExpr.Lit(LitVal.LList(SType.SFp64, Nil)),
        SExpr.Lit(LitVal.LMap(SType.SStr, SType.SI64,
          Seq((LitVal.LStr("k"), LitVal.LI64(9))))),
        SExpr.Lit(LitVal.LMap(SType.SStr, SType.SFp64, Nil)))))))

  test("extension rels and map/list literals are byte-stable across round-trips") {
    for (p <- Seq(extPlan, litPlan)) {
      val b1 = Wire.encode(p)
      assert(Wire.decode(b1) == p)
      assert(hex(Wire.encode(Wire.decode(b1))) == hex(b1))
    }
  }

  test("typed-stage plan encodes to the golden bytes and decodes back") {
    assert(hex(Wire.encode(stagePlan)) == stageHex)
    val p = Wire.decode(unhex(stageHex))
    assert(p == stagePlan)
    p.relations.head match {
      case PlanRel.Root(Rel.ExtStage(_, name), names) =>
        assert(name == "graft.media_features_v1")
        assert(names == Seq("doc_id", "media_type", "n_bytes", "feature"))
      case other => fail(s"unexpected shape $other")
    }
  }
}
