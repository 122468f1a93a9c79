package graft.substrait

import model._

/** A SECOND, test-only encoder for the substrait 0.3 message subset —
  * written against the public .proto field numbers independently of
  * `Wire`'s writer so a transcription slip in either implementation cannot
  * cancel itself out (the WireConformanceSpec fixtures are hand-assembled
  * by the same codebase that decodes them; this encoder re-encodes REAL
  * producer plans and `IndependentEncoderSpec` asserts
  * `Wire.decode(IndependentWire.encode(p)) == Wire.decode(Wire.encode(p))
  * == p`).
  *
  * Deliberately DIFFERENT construction style and emission policy:
  *  - bottom-up immutable byte-array combinators instead of Wire's
  *    push-writer;
  *  - proto3-CANONICAL default omission, exactly what prost/protobuf-java
  *    emit: zero-valued scalar fields, false bools, and empty strings are
  *    NOT written unless they are oneof members (presence-tracked).
  *    That makes every decode-equality assertion also a conformance test
  *    that Wire.decode tolerates default-omitted fields from a real
  *    protobuf encoder — the exact class of bytes the reference's prost
  *    serializer produces (serializer.rs uses prost::Message::encode).
  *
  * Field numbers quoted inline from plan.proto / algebra.proto /
  * type.proto / extensions.proto (substrait 0.3).
  */
object IndependentWire {

  // ------------------------------------------------------------ combinators
  private val empty = Array.emptyByteArray

  private def vint(v0: Long): Array[Byte] = {
    // collect 7-bit groups little-endian; high bit marks continuation
    val out = new scala.collection.mutable.ArrayBuffer[Byte](10)
    var v = v0
    var done = false
    while (!done) {
      val low = (v & 0x7fL).toInt
      v = v >>> 7
      if (v == 0L) { out += low.toByte; done = true }
      else out += (low | 0x80).toByte
    }
    out.toArray
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val n = parts.map(_.length).sum
    val out = new Array[Byte](n)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }

  private def key(f: Int, wt: Int): Array[Byte] = vint((f.toLong << 3) | wt)

  /** varint field, ALWAYS emitted (oneof member or known-nonzero) */
  private def vf(f: Int, v: Long): Array[Byte] = cat(key(f, 0), vint(v))
  /** varint field with proto3 default omission */
  private def vfOpt(f: Int, v: Long): Array[Byte] = if (v == 0L) empty else vf(f, v)
  private def boolOpt(f: Int, b: Boolean): Array[Byte] = if (b) vf(f, 1L) else empty
  private def f64(f: Int, bits: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
    cat(key(f, 1), b)
  }
  private def f32(f: Int, bits: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
    cat(key(f, 5), b)
  }
  private def lenf(f: Int, body: Array[Byte]): Array[Byte] =
    cat(key(f, 2), vint(body.length.toLong), body)
  private def strf(f: Int, s: String): Array[Byte] = lenf(f, s.getBytes("UTF-8"))
  /** string field with proto3 default omission (empty string = absent) */
  private def strOpt(f: Int, s: String): Array[Byte] =
    if (s.isEmpty) empty else strf(f, s)

  // ------------------------------------------------------------------ types
  /** Type{oneof kind}: bool=1 i8=2 i16=3 i32=5 i64=7 fp32=10 fp64=11
    * string=12 binary=13 timestamp=14 date=16 time=17 interval_year=19
    * interval_day=20 timestamp_tz=29 decimal=24 struct=25 list=27 map=28.
    * Simple kinds: {type_variation_reference=1, nullability=2};
    * NULLABILITY_NULLABLE=1, NULLABILITY_REQUIRED=2 (never 0 here, so the
    * enum is always on the wire).
    */
  private def nullability(nullable: Boolean): Array[Byte] =
    vf(2, if (nullable) 1L else 2L)

  private def typ(f: Int, t: SType, nullable: Boolean): Array[Byte] = {
    def simple(kind: Int): Array[Byte] = lenf(kind, nullability(nullable))
    val body = t match {
      case SType.SBool          => simple(1)
      case SType.SI8            => simple(2)
      case SType.SI16           => simple(3)
      case SType.SI32           => simple(5)
      case SType.SI64           => simple(7)
      case SType.SFp32          => simple(10)
      case SType.SFp64          => simple(11)
      case SType.SStr           => simple(12)
      case SType.SBin           => simple(13)
      case SType.STimestamp     => simple(14)
      case SType.SDate          => simple(16)
      case SType.STime          => simple(17)
      case SType.SIntervalYear  => simple(19)
      case SType.SIntervalDay   => simple(20)
      case SType.STimestampTz   => simple(29)
      case SType.SDecimal(p, s) =>
        // Decimal{scale=1, precision=2, tvr=3, nullability=4}
        lenf(24, cat(vfOpt(1, s.toLong), vfOpt(2, p.toLong),
          vf(4, if (nullable) 1L else 2L)))
      case SType.SList(e, en) =>
        // List{type=1, tvr=2, nullability=3}
        lenf(27, cat(typ(1, e, en), vf(3, if (nullable) 1L else 2L)))
      case SType.SMap(k, v, vn) =>
        // Map{key=1, value=2, tvr=3, nullability=4}; keys non-null
        lenf(28, cat(typ(1, k, nullable = false), typ(2, v, vn),
          vf(4, if (nullable) 1L else 2L)))
      case SType.SStruct(names, fields) =>
        // Struct{types=1 repeated, nullability=3}; graft carries in-struct
        // names in unused field 10 (documented beyond-reference extension)
        lenf(25, cat(
          cat(fields.map { case (ft, fn) => typ(1, ft, fn) }: _*),
          vf(3, if (nullable) 1L else 2L),
          cat(names.map(strf(10, _)): _*)))
    }
    lenf(f, body)
  }

  /** names of struct fields nested in t, depth-first (standard flattening) */
  private def flatNames(t: SType): Seq[String] = t match {
    case SType.SStruct(names, fields) =>
      names.zip(fields).flatMap { case (n, (ft, _)) => n +: flatNames(ft) }
    case SType.SList(e, _) => flatNames(e)
    case _ => Nil
  }

  /** NamedStruct{names=1 repeated, struct=2: Type.Struct} — nested struct
    * field names flatten depth-first into the root name list */
  private def namedStruct(f: Int, ns: NamedStruct): Array[Byte] = {
    val names = ns.names.zip(ns.types).flatMap { case (n, (t, _)) =>
      n +: flatNames(t)
    }
    val structBody = cat(
      cat(ns.types.map { case (t, n) => typ(1, t, n) }: _*))
    lenf(f, cat(
      cat(names.map(strf(1, _)): _*),
      lenf(2, structBody)))
  }

  // --------------------------------------------------------------- literals
  /** Literal{oneof literal_type} — oneof members are ALWAYS emitted, even
    * when the payload value is zero/false/empty (presence is semantic). */
  private def literal(f: Int, v: LitVal): Array[Byte] = {
    val body = v match {
      case LitVal.LBool(b)       => vf(1, if (b) 1L else 0L)
      case LitVal.LI8(i)         => vf(2, i.toLong)
      case LitVal.LI16(i)        => vf(3, i.toLong)
      case LitVal.LI32(i)        => vf(5, i.toLong)
      case LitVal.LI64(i)        => vf(7, i)
      case LitVal.LFp32(x)       => f32(10, java.lang.Float.floatToIntBits(x))
      case LitVal.LFp64(x)       => f64(11, java.lang.Double.doubleToLongBits(x))
      case LitVal.LStr(s)        => strf(12, s)
      case LitVal.LBin(b)        => lenf(13, b)
      case LitVal.LTimestamp(t)  => vf(14, t)
      case LitVal.LDate(d)       => vf(16, d.toLong)
      case LitVal.LTime(us)      => vf(17, us)
      case LitVal.LIntervalYear(y, m) =>
        // IntervalYearToMonth{years=1, months=2}
        lenf(19, cat(vfOpt(1, y.toLong), vfOpt(2, m.toLong)))
      case LitVal.LIntervalDay(d, s, us) =>
        // IntervalDayToSecond{days=1, seconds=2, microseconds=3}
        lenf(20, cat(vfOpt(1, d.toLong), vfOpt(2, s.toLong), vfOpt(3, us.toLong)))
      case LitVal.LTimestampTz(t) => vf(27, t)
      case LitVal.LDecimal(bytes, p, s) =>
        // Decimal{value=1 bytes (16-byte LE), precision=2, scale=3}
        lenf(24, cat(lenf(1, bytes), vfOpt(2, p.toLong), vfOpt(3, s.toLong)))
      case LitVal.LNull(t)       => typ(29, t, nullable = true)
      case LitVal.LList(et, vs)  =>
        if (vs.isEmpty)
          // empty_list=31: Type.List{type=1, nullability=3}
          lenf(31, cat(typ(1, et, nullable = true), vf(3, 1L)))
        else
          // list=30: List{values=1 repeated Literal} (element type inferred)
          lenf(30, cat(vs.map(literal(1, _)): _*))
      case LitVal.LMap(kt, vt, entries) =>
        if (entries.isEmpty)
          // empty_map=32: Type.Map{key=1, value=2, nullability=4}
          lenf(32, cat(typ(1, kt, nullable = false),
            typ(2, vt, nullable = true), vf(4, 1L)))
        else
          // map=26: Map{key_values=1 repeated KeyValue{key=1, value=2}}
          lenf(26, cat(entries.map { case (k, vv) =>
            lenf(1, cat(literal(1, k), literal(2, vv)))
          }: _*))
    }
    lenf(f, body)
  }

  // ------------------------------------------------------------ expressions
  /** Expression{oneof rex_type}: literal=1 selection=2 scalar_function=3
    * window_function=5 if_then=6 cast=11 */
  private def expr(f: Int, e: SExpr): Array[Byte] = {
    val body = e match {
      case SExpr.Lit(v) => literal(1, v)
      case SExpr.FieldRef(i) =>
        // FieldReference{direct_reference=1: ReferenceSegment{
        //   struct_field=2: StructField{field=1, child=2}}}
        // field 0 is OMITTED (proto3 default) — the conformance point
        lenf(2, lenf(1, lenf(2, vfOpt(1, i.toLong))))
      case SExpr.NestedRef(i, path) =>
        def seg(idxs: Seq[Int]): Array[Byte] =
          lenf(2, cat(vfOpt(1, idxs.head.toLong),
            if (idxs.tail.isEmpty) empty else lenf(2, seg(idxs.tail))))
        lenf(2, lenf(1, seg(i +: path)))
      case SExpr.ScalarFn(ref, args) =>
        // ScalarFunction{function_reference=1, args=2 repeated}; anchor 0
        // is OMITTED (proto3 default)
        lenf(3, cat(vfOpt(1, ref.toLong), cat(args.map(expr(2, _)): _*)))
      case SExpr.IfThen(clauses, els) =>
        // IfThen{ifs=1 repeated IfClause{if=1, then=2}, else=2}
        lenf(6, cat(
          cat(clauses.map(c => lenf(1, cat(expr(1, c.cond),
            c.thenExpr.map(expr(2, _)).getOrElse(empty)))): _*),
          els.map(expr(2, _)).getOrElse(empty)))
      case SExpr.Cast(t, nullable, in) =>
        // Cast{type=1, input=2}
        lenf(11, cat(typ(1, t, nullable), expr(2, in)))
      case SExpr.WindowFn(ref, args, parts, sorts, lower, upper, rowFrame) =>
        // WindowFunction{function_reference=1, partitions=2, sorts=3,
        // upper_bound=4, lower_bound=5, args=8, bounds_type(ROWS=1)=9}
        lenf(5, cat(
          vfOpt(1, ref.toLong),
          cat(parts.map(expr(2, _)): _*),
          cat(sorts.map(sortField(3, _)): _*),
          bound(4, upper),
          bound(5, lower),
          cat(args.map(expr(8, _)): _*),
          boolOpt(9, rowFrame)))
    }
    lenf(f, body)
  }

  /** WindowFunction.Bound{oneof kind}: preceding=1{offset=1},
    * following=2{offset=1}, current_row=3, unbounded=4 */
  private def bound(f: Int, b: WBound): Array[Byte] = {
    val body = b match {
      case WBound.Preceding(n) => lenf(1, vfOpt(1, n))
      case WBound.Following(n) => lenf(2, vfOpt(1, n))
      case WBound.CurrentRow   => lenf(3, empty)
      case WBound.Unbounded    => lenf(4, empty)
    }
    lenf(f, body)
  }

  /** SortField{expr=1, direction=2} — direction enum never 0 in practice */
  private def sortField(f: Int, s: SortField): Array[Byte] =
    lenf(f, cat(expr(1, s.expr), vfOpt(2, s.direction.toLong)))

  /** AggregateFunction{function_reference=1, args=2, phase=4,
    * invocation=6} — anchor 0 and phase UNSPECIFIED are omitted */
  private def aggFunction(f: Int, a: AggFunction): Array[Byte] =
    lenf(f, cat(vfOpt(1, a.functionReference.toLong),
      cat(a.args.map(expr(2, _)): _*),
      vfOpt(6, a.invocation.toLong)))

  // -------------------------------------------------------------- relations
  /** Rel{oneof rel_type}: read=1 filter=2 fetch=3 aggregate=4 sort=5
    * join=6 project=7 set=8 extension_single=9 cross=12 */
  private def rel(f: Int, r: Rel): Array[Byte] = {
    def extSingle(in: Rel, typeUrl: String, detail: Array[Byte]): Array[Byte] =
      // ExtensionSingleRel{input=2, detail=3: Any{type_url=1, value=2}}
      lenf(9, cat(rel(2, in),
        lenf(3, cat(strf(1, typeUrl), lenf(2, detail)))))
    val body = r match {
      case Rel.Read(schema, names, proj, filter, vrows, localFiles) =>
        // ReadRel{base_schema=2, filter=3, projection=4: MaskExpression{
        //   select=1: StructSelect{struct_items=1 repeated StructItem{
        //   field=1}}}, virtual_table=5, local_files=6, named_table=7{
        //   names=1 repeated}}
        val mask = proj.map(idxs => lenf(4, lenf(1,
          cat(idxs.map(i => lenf(1, vfOpt(1, i.toLong))): _*)))).getOrElse(empty)
        val readType = (vrows, localFiles) match {
          case (Some(rows), _) =>
            // VirtualTable{values=1 repeated Literal.Struct{fields=1}}
            lenf(5, cat(rows.map(row =>
              lenf(1, cat(row.map(literal(1, _)): _*))): _*))
          case (None, Some(items)) =>
            // LocalFiles{items=1 repeated FileOrFiles}; path oneof 1-4,
            // format oneof parquet=9/orc=11/text=14
            lenf(6, cat(items.map { it =>
              val fmt = it.format match {
                case "parquet" => lenf(9, empty)
                case "orc"     => lenf(11, empty)
                case "csv"     => lenf(14, cat(
                  it.csvDelimiter.map(strf(1, _)).getOrElse(empty),
                  vfOpt(4, it.csvHeaderLines)))
                case other => sys.error(s"independent encoder: format $other")
              }
              lenf(1, cat(strf(it.pathKind, it.path), fmt))
            }: _*))
          case (None, None) =>
            // NamedTable{names=1 repeated}
            lenf(7, cat(names.map(strf(1, _)): _*))
        }
        lenf(1, cat(namedStruct(2, schema),
          filter.map(expr(3, _)).getOrElse(empty), mask, readType))
      case Rel.Filter(in, cond) =>
        // FilterRel{input=2, condition=3}
        lenf(2, cat(rel(2, in), expr(3, cond)))
      case Rel.Fetch(in, off, cnt) =>
        // FetchRel{input=2, offset=3, count=4} — zero offset/count omitted
        // (count absent = the documented count-0 "no fetch" quirk)
        lenf(3, cat(rel(2, in), vfOpt(3, off), vfOpt(4, cnt)))
      case Rel.Aggregate(in, groupings, measures) =>
        // AggregateRel{input=2, groupings=3 repeated Grouping{
        //   grouping_expressions=1}, measures=4 repeated Measure{
        //   measure=1, filter=2}}
        lenf(4, cat(rel(2, in),
          cat(groupings.map(g =>
            lenf(3, cat(g.map(expr(1, _)): _*))): _*),
          cat(measures.map(m =>
            lenf(4, cat(aggFunction(1, m.function),
              m.filter.map(expr(2, _)).getOrElse(empty)))): _*)))
      case Rel.Sort(in, sorts) =>
        // SortRel{input=2, sorts=3 repeated}
        lenf(5, cat(rel(2, in), cat(sorts.map(sortField(3, _)): _*)))
      case Rel.Join(l, rr, e, jt) =>
        // JoinRel{left=2, right=3, expression=4, type=6}
        lenf(6, cat(rel(2, l), rel(3, rr), expr(4, e), vfOpt(6, jt.toLong)))
      case Rel.Project(in, exprs) =>
        // ProjectRel{input=2, expressions=3 repeated}
        lenf(7, cat(rel(2, in), cat(exprs.map(expr(3, _)): _*)))
      case Rel.Set(inputs, op) =>
        // SetRel{inputs=2 repeated, op=3}
        lenf(8, cat(cat(inputs.map(rel(2, _)): _*), vfOpt(3, op.toLong)))
      case Rel.Cross(l, rr) =>
        // CrossRel{left=2, right=3}
        lenf(12, cat(rel(2, l), rel(3, rr)))
      case Rel.ExtStage(in, stage) =>
        // StageRelDetail{stage=1}
        extSingle(in, Wire.stageDetailUrl, strOpt(1, stage))
      case Rel.ExtHint(in, hint) =>
        // HintRelDetail{hint=1}
        extSingle(in, Wire.hintDetailUrl, strOpt(1, hint))
      case Rel.ExtGenerate(in, gen, arg, outer, k) =>
        // GenerateRelDetail{generator=1, arg=2, outer=3, gen_arity=4}
        extSingle(in, Wire.generateDetailUrl, cat(strOpt(1, gen),
          expr(2, arg), boolOpt(3, outer), vfOpt(4, k.toLong)))
      case Rel.ExtExchange(in, exprs, num, shuffle, rangeDirs) =>
        // ExchangeRelDetail{exprs=1, num_partitions=2, shuffle=3,
        // range_directions=4}
        extSingle(in, Wire.exchangeDetailUrl, cat(
          cat(exprs.map(expr(1, _)): _*), vfOpt(2, num.toLong),
          boolOpt(3, shuffle),
          cat(rangeDirs.map(d => vfOpt(4, d.toLong)): _*)))
      case Rel.ExtSample(in, lo, hi, wr, seed) =>
        // SampleRelDetail{lower=1 fixed64, upper=2 fixed64,
        // with_replacement=3, seed=4}
        extSingle(in, Wire.sampleDetailUrl, cat(
          f64(1, java.lang.Double.doubleToLongBits(lo)),
          f64(2, java.lang.Double.doubleToLongBits(hi)),
          boolOpt(3, wr), vfOpt(4, seed)))
      case Rel.ExtSessionWindow(in, tsField, gapMicros, gapExpr) =>
        // SessionWindowRelDetail{ts_field=1, gap_micros=2, gap_expr=3}
        extSingle(in, Wire.sessionWindowDetailUrl, cat(
          vfOpt(1, tsField.toLong), vfOpt(2, gapMicros),
          gapExpr.map(expr(3, _)).getOrElse(empty)))
      case Rel.ExtIteration(in, bodyPlan, maxIters, checkFixpoint, reqFp) =>
        // IterationRelDetail{body_plan=1 bytes (nested Plan — encoded by
        // THIS encoder, keeping the cross-check independent all the way
        // down), max_iters=2, check_fixpoint=3, require_fixpoint=4}
        extSingle(in, Wire.iterationDetailUrl, cat(
          lenf(1, encode(bodyPlan)),
          vfOpt(2, maxIters.toLong), boolOpt(3, checkFixpoint),
          boolOpt(4, reqFp)))
    }
    lenf(f, body)
  }

  // ------------------------------------------------------------------- plan
  /** Plan{extensions=2 repeated SimpleExtensionDeclaration{
    *   extension_function=3: ExtensionFunction{extension_uri_reference=1,
    *   function_anchor=2, name=3}}, relations=3 repeated PlanRel{
    *   rel=1 | root=2: RelRoot{input=1, names=2 repeated}}}
    */
  def encode(plan: Plan): Array[Byte] = cat(
    cat(plan.extensions.map { ext =>
      lenf(2, lenf(3, cat(
        vfOpt(1, ext.extensionUriReference),
        vfOpt(2, ext.functionAnchor.toLong), // anchor 0 OMITTED (proto3)
        strOpt(3, ext.name))))
    }: _*),
    cat(plan.relations.map {
      case PlanRel.RelOnly(r)     => lenf(3, rel(1, r))
      case PlanRel.Root(in, names) => lenf(3, lenf(2, cat(
        rel(1, in), cat(names.map(strf(2, _)): _*))))
    }: _*))
}
