package graft

import graft.analytics.VoidStats
import org.apache.spark.sql.DataFrame

/** Hand-computed pins for the VoID description (q81's engine side) —
  * the driver oracle recomputes the counts over the golden store; this
  * spec pins the boundary shapes: a graph with no rdf:type triples
  * (classes = 0, NO class partitions), per-graph independence, and the
  * partition-node fusion rule. */
class VoidStatsSpec extends SparkTestBase {

  private val Ty = graft.analytics.KgQuery.RdfType
  private val V = VoidStats.VoidNs

  private def df(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj")
  }

  private def quads(d: DataFrame): Set[(String, String, String, String)] =
    d.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet

  test("core stats, property and class partitions on a 2-graph store") {
    val got = quads(VoidStats.describe(df(Seq(
      ("g1", "s1", Ty, "C"),
      ("g1", "s1", "p", "o1"),
      ("g1", "s2", "p", "o1"),
      ("g2", "s1", "q", "o2"))))) // no type triples in g2
    val ds1 = "urn:graft:void:g1"
    val ds2 = "urn:graft:void:g2"
    assert(got == Set(
      // g1 core: 3 triples, 2 subj, 2 pred, 2 obj, 1 class
      ("g1", ds1, Ty, V + "Dataset"),
      ("g1", ds1, V + "triples", "3"),
      ("g1", ds1, V + "distinctSubjects", "2"),
      ("g1", ds1, V + "properties", "2"),
      ("g1", ds1, V + "distinctObjects", "2"),
      ("g1", ds1, V + "classes", "1"),
      // g1 property partitions: rdf:type (1 triple, 1 subj), p (2 triples, 2 subj)
      ("g1", ds1, V + "propertyPartition", s"$ds1:prop:$Ty"),
      ("g1", s"$ds1:prop:$Ty", V + "property", Ty),
      ("g1", s"$ds1:prop:$Ty", V + "triples", "1"),
      ("g1", s"$ds1:prop:$Ty", V + "distinctSubjects", "1"),
      ("g1", ds1, V + "propertyPartition", s"$ds1:prop:p"),
      ("g1", s"$ds1:prop:p", V + "property", "p"),
      ("g1", s"$ds1:prop:p", V + "triples", "2"),
      ("g1", s"$ds1:prop:p", V + "distinctSubjects", "2"),
      // g1 class partition: C with 1 entity
      ("g1", ds1, V + "classPartition", s"$ds1:class:C"),
      ("g1", s"$ds1:class:C", V + "class", "C"),
      ("g1", s"$ds1:class:C", V + "entities", "1"),
      // g2 core: 1 triple, no classes, and NO class partition rows
      ("g2", ds2, Ty, V + "Dataset"),
      ("g2", ds2, V + "triples", "1"),
      ("g2", ds2, V + "distinctSubjects", "1"),
      ("g2", ds2, V + "properties", "1"),
      ("g2", ds2, V + "distinctObjects", "1"),
      ("g2", ds2, V + "classes", "0"),
      ("g2", ds2, V + "propertyPartition", s"$ds2:prop:q"),
      ("g2", s"$ds2:prop:q", V + "property", "q"),
      ("g2", s"$ds2:prop:q", V + "triples", "1"),
      ("g2", s"$ds2:prop:q", V + "distinctSubjects", "1")))
  }

  test("the description is itself SPARQL-queryable through the engine") {
    val desc = VoidStats.describe(df(Seq(
      ("g1", "s1", Ty, "C"), ("g1", "s1", "p", "o1"))))
    val got = graft.analytics.Sparql.query(desc,
      s"""SELECT ?n WHERE { ?ds a <${V}Dataset> ; <${V}triples> ?n }""")
      .select("n").collect().map(_.getString(0)).toSeq
    assert(got == Seq("2"))
  }
}
