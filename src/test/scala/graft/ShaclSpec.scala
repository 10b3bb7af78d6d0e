package graft

import graft.analytics.Shacl
import graft.analytics.Shacl.{NodeShape, PropShape}
import org.apache.spark.sql.DataFrame

/** Hand-computed pins for the SHACL-lite validator (q85's engine side):
  * each constraint kind violating and conforming, untyped nodes out of
  * scope, per-graph focus isolation, and the loud empty-shape-graph error. */
class ShaclSpec extends SparkTestBase {

  private val Ty = graft.analytics.KgQuery.RdfType

  private def df(rows: Seq[(String, String, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")
  }

  private def viols(store: DataFrame, shapes: Seq[NodeShape]): Set[(String, String, String, String, String)] =
    Shacl.validate(store, shapes)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5))).toSet

  test("every constraint kind: violation and conformance on one store") {
    val xsdInt = "http://www.w3.org/2001/XMLSchema#integer"
    val store = df(Seq(
      // n1 conforms fully: one integer literal value matching the pattern
      ("g", "n1", Ty, "C", "iri", ""),
      ("g", "n1", "p", "42", "literal", xsdInt),
      // n2: zero values -> minCount; n3: two values -> maxCount
      ("g", "n2", Ty, "C", "iri", ""),
      ("g", "n3", Ty, "C", "iri", ""),
      ("g", "n3", "p", "1", "literal", xsdInt),
      ("g", "n3", "p", "2", "literal", xsdInt),
      // n4: wrong datatype, wrong kind, pattern miss — one value, 3 rows
      ("g", "n4", Ty, "C", "iri", ""),
      ("g", "n4", "p", "x9", "iri", ""),
      // untyped node with horrible values: OUT OF SCOPE, no rows
      ("g", "free", "p", "zz", "iri", "")))
    val shapes = Seq(NodeShape("s", "C", Seq(PropShape("p",
      minCount = Some(1L), maxCount = Some(1L),
      datatype = Some(xsdInt), nodeKind = Some("literal"),
      pattern = Some("^[0-9]+$")))))
    assert(viols(store, shapes) == Set(
      ("n2", "s", "p", "minCount", "0"),
      ("n3", "s", "p", "maxCount", "2"),
      ("n4", "s", "p", "datatype", "x9"),
      ("n4", "s", "p", "nodeKind", "x9"),
      ("n4", "s", "p", "pattern", "x9")))
  }

  test("focus nodes are per-graph: same subject name, different graphs") {
    val store = df(Seq(
      ("g1", "n", Ty, "C", "iri", ""),
      ("g1", "n", "p", "v", "iri", ""),
      ("g2", "n", Ty, "C", "iri", ""))) // no p in g2 -> minCount there only
    val got = Shacl.validate(store,
      Seq(NodeShape("s", "C", Seq(PropShape("p", minCount = Some(1L))))))
      .collect().map(r => (r.getString(0), r.getString(4))).toSet
    assert(got == Set(("g2", "minCount")))
  }

  test("empty shape graph fails loudly") {
    val store = df(Seq(("g", "n", Ty, "C", "iri", "")))
    val e = intercept[IllegalArgumentException](Shacl.validate(store, Seq.empty))
    assert(e.getMessage.contains("no constraints"))
  }
}
