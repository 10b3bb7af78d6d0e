package graft

import graft.analytics.Shacl
import graft.analytics.Shacl.{NodeShape, PropShape}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property fuzz for the SHACL-lite validator: random stores (tiny vocab,
  * mixed kinds/datatypes) and random shape graphs run through the REAL
  * [[Shacl.validate]], compared against a brute-force evaluator written
  * directly from each constraint's definition. */
class ShaclFuzzSpec extends SparkTestBase {

  private type Row6 = (String, String, String, String, String, String)
  private val T = graft.analytics.KgQuery.RdfType
  private val XsdInt = "http://www.w3.org/2001/XMLSchema#integer"

  private def brute(store: Seq[Row6], shapes: Seq[NodeShape])
      : Set[(String, String, String, String, String, String)] =
    shapes.flatMap { ns =>
      val focus = store.collect {
        case (g, s, T, o, _, _) if o == ns.targetClass => (g, s) }.distinct
      ns.props.flatMap { p =>
        val vals = store.collect {
          case (g, s, pr, o, k, dt) if pr == p.path => ((g, s), (o, k, dt)) }
        focus.flatMap { case f @ (g, s) =>
          val vs = vals.collect { case (`f`, v) => v }
          val n = vs.size.toLong
          val cardinality =
            p.minCount.collect { case m if n < m =>
              (g, s, ns.id, p.path, "minCount", n.toString) } ++
            p.maxCount.collect { case m if n > m =>
              (g, s, ns.id, p.path, "maxCount", n.toString) }
          val valueLevel = vs.flatMap { case (o, k, dt) =>
            p.datatype.collect { case d if dt != d => (g, s, ns.id, p.path, "datatype", o) } ++
              p.nodeKind.collect { case nk if k != nk => (g, s, ns.id, p.path, "nodeKind", o) } ++
              p.pattern.collect { case rx if !rx.r.findFirstIn(o).isDefined =>
                (g, s, ns.id, p.path, "pattern", o) }
          }
          cardinality ++ valueLevel
        }
      }
    }.toSet

  private val rowGen: Gen[Row6] = for {
    g <- Gen.oneOf("g1", "g2")
    s <- Gen.oneOf("n1", "n2", "n3")
    (p, o, k, dt) <- Gen.frequency(
      2 -> (for { c <- Gen.oneOf("C1", "C2") } yield (T, c, "iri", "")),
      3 -> (for {
        p <- Gen.oneOf("p1", "p2")
        o <- Gen.oneOf("5", "x7", "ref1")
        k <- Gen.oneOf("literal", "iri")
        dt <- Gen.oneOf("", XsdInt)
      } yield (p, o, k, if (k == "iri") "" else dt)))
  } yield (g, s, p, o, k, dt)

  private val propGen: Gen[PropShape] = for {
    path <- Gen.oneOf("p1", "p2")
    minC <- Gen.option(Gen.choose(0L, 2L))
    maxC <- Gen.option(Gen.choose(0L, 2L))
    dt <- Gen.option(Gen.const(XsdInt))
    nk <- Gen.option(Gen.oneOf("literal", "iri"))
    rx <- Gen.option(Gen.oneOf("^[0-9]+$", "^x"))
    // at least one constraint, else the shape contributes nothing
    if minC.isDefined || maxC.isDefined || dt.isDefined || nk.isDefined || rx.isDefined
  } yield PropShape(path, minC, maxC, dt, nk, rx)

  private val shapesGen: Gen[Seq[NodeShape]] = for {
    n <- Gen.choose(1, 3)
    shapes <- Gen.listOfN(n, for {
      tc <- Gen.oneOf("C1", "C2")
      k <- Gen.choose(1, 2)
      props <- Gen.listOfN(k, propGen)
    } yield (tc, props))
  } yield shapes.zipWithIndex.map { case ((tc, ps), i) => NodeShape(s"s$i", tc, ps) }

  test("Shacl.validate matches the brute-force constraint evaluator") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen).map(_.distinct), shapesGen) {
      (rows, shapes) =>
        val df = rows.toDF("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")
        val got = Shacl.validate(df, shapes).collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4), r.getString(5))).toSeq
        // violations are a BAG (two identical values at one focus => two rows)
        val want = brute(rows, shapes)
        val gotSet = got.toSet
        if (gotSet != want) {
          println(s"SHACL MISMATCH\nROWS: $rows\nSHAPES: $shapes\n" +
            s"ONLY-GOT: ${gotSet -- want}\nONLY-WANT: ${want -- gotSet}")
          false
        } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
