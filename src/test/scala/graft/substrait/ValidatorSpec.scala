package graft.substrait

import org.scalatest.funsuite.AnyFunSuite

import model._

class ValidatorSpec extends AnyFunSuite {

  private def read(cols: Int): Rel =
    Rel.Read(NamedStruct((0 until cols).map(i => s"c$i"),
      Seq.fill(cols)((SType.SI64, true))), Seq("t"), None)

  test("valid plan has no issues") {
    val p = Plan(
      Seq(ExtensionFunction(0xffffffffL, 0, "gt")),
      Seq(PlanRel.Root(
        Rel.Filter(read(2), SExpr.ScalarFn(0,
          Seq(SExpr.FieldRef(1), SExpr.Lit(LitVal.LI64(5))))),
        Seq("c0", "c1"))))
    assert(Validator.validate(p).isEmpty)
  }

  test("out-of-range field ref is reported with its path") {
    val p = Plan(Nil, Seq(PlanRel.RelOnly(
      Rel.Project(read(2), Seq(SExpr.FieldRef(7))))))
    val issues = Validator.validate(p)
    assert(issues.exists(i => i.msg.contains("field reference 7") &&
      i.path.contains("project")))
  }

  test("unregistered anchor, bad join type, arity-mismatched root all surface") {
    val p = Plan(Nil, Seq(PlanRel.Root(
      Rel.Join(read(2), read(1),
        SExpr.ScalarFn(9, Seq(SExpr.FieldRef(0), SExpr.FieldRef(2))), 42),
      Seq("only_one_name_for_three_cols"))))
    val msgs = Validator.validate(p).map(_.msg).mkString("\n")
    assert(msgs.contains("unregistered function anchor 9"), msgs)
    assert(msgs.contains("unsupported join type 42"), msgs)
    // root arity unknown after bad join type? join returns width regardless
    assert(msgs.contains("output names"), msgs)
  }

  test("projection mask bounds and grouping-set count") {
    val p = Plan(Nil, Seq(PlanRel.RelOnly(
      Rel.Aggregate(
        Rel.Read(NamedStruct(Seq("a"), Seq((SType.SI64, true))), Seq("t"), Some(Seq(0, 3))),
        Seq(Seq(SExpr.FieldRef(0)), Seq(SExpr.FieldRef(0))), Nil))))
    val msgs = Validator.validate(p).map(_.msg).mkString("\n")
    assert(msgs.contains("projection index 3"), msgs)
    assert(msgs.contains("grouping sets"), msgs)
  }

  test("random generated plans from WireSpec shapes never crash validation") {
    // validation must be total: any decodable plan gets a report, not a throw
    val weird = Plan(Nil, Seq(PlanRel.RelOnly(
      Rel.Set(Seq(read(2), read(3)), 99))))
    val msgs = Validator.validate(weird).map(_.msg).mkString("\n")
    assert(msgs.contains("bad set op 99"), msgs)
    assert(msgs.contains("differing arities"), msgs)
  }
}
