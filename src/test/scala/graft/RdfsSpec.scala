package graft

import graft.analytics.{KgQuery, Rdfs}
import org.apache.spark.sql.DataFrame

class RdfsSpec extends SparkTestBase {

  private val T = KgQuery.RdfType
  private val SC = Rdfs.SubClassOf
  private val SP = Rdfs.SubPropertyOf
  private val DOM = Rdfs.Domain
  private val RNG = Rdfs.Range

  private def df(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj")
  }

  private def quads(d: DataFrame): Set[(String, String, String, String)] =
    d.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet

  test("rdfs9: type propagates up a multi-hop subclass chain") {
    val in = Seq(
      ("g", "Wall", SC, "Element"), ("g", "Element", SC, "Product"),
      ("g", "w1", T, "Wall"))
    val got = quads(Rdfs.entail(df(in)))
    assert(got == in.toSet ++ Set(
      ("g", "Wall", SC, "Product"), // rdfs11
      ("g", "w1", T, "Element"), ("g", "w1", T, "Product")))
  }

  test("rdfs7 before rdfs2/3: domain on a SUPER-property fires via sp+") {
    // hasNext sp linked sp related; domain sits on linked, range on related
    // — only the derived assertions expose them, the stratification test
    val in = Seq(
      ("g", "hasNext", SP, "linked"), ("g", "linked", SP, "related"),
      ("g", "linked", DOM, "Cell"), ("g", "related", RNG, "Node"),
      ("g", "c1", "hasNext", "c2"))
    val got = quads(Rdfs.entail(df(in)))
    assert(got == in.toSet ++ Set(
      ("g", "hasNext", SP, "related"),   // rdfs5
      ("g", "c1", "linked", "c2"),       // rdfs7
      ("g", "c1", "related", "c2"),      // rdfs7 via sp+
      ("g", "c1", T, "Cell"),            // rdfs2 on the derived assertion
      ("g", "c2", T, "Node")))           // rdfs3 on the derived assertion
  }

  test("dom/rng-derived types feed rdfs9 (subclass of the inferred class)") {
    val in = Seq(
      ("g", "p", DOM, "Cell"), ("g", "Cell", SC, "Node"),
      ("g", "a", "p", "b"))
    val got = quads(Rdfs.entail(df(in)))
    assert(got == in.toSet ++ Set(
      ("g", "a", T, "Cell"), ("g", "a", T, "Node")))
  }

  test("graphs entail independently; derived triples stay in their graph") {
    val in = Seq(
      ("g1", "Wall", SC, "Element"), ("g1", "w", T, "Wall"),
      ("g2", "w", T, "Wall")) // g2 has no schema — nothing derivable
    val got = quads(Rdfs.entail(df(in)))
    assert(got == in.toSet + (("g1", "w", T, "Element")))
  }

  test("entailment is idempotent (the output is a fixpoint)") {
    val in = df(Seq(
      ("g", "Wall", SC, "Element"), ("g", "Element", SC, "Product"),
      ("g", "hasNext", SP, "linked"), ("g", "linked", DOM, "Cell"),
      ("g", "Cell", SC, "Thing"),
      ("g", "w1", T, "Wall"), ("g", "c1", "hasNext", "c2")))
    val once = Rdfs.entail(in)
    assert(quads(Rdfs.entail(once)) == quads(once))
  }

  test("cyclic schema saturates instead of looping") {
    val in = Seq(
      ("g", "A", SC, "B"), ("g", "B", SC, "A"),
      ("g", "x", T, "A"))
    val got = quads(Rdfs.entail(df(in)))
    assert(got == in.toSet ++ Set(
      ("g", "A", SC, "A"), ("g", "B", SC, "B"), // the cycle's self-pairs
      ("g", "x", T, "B")))
  }

  test("plan pin: every rule join broadcasts the schema side") {
    // the instance table must never be shuffled by a rule — the only
    // acceptable joins in the entailment plan are broadcast-hash with the
    // TBox-sized closure/domain/range tables on the build side (the
    // closure's own internal self-joins run on those same tiny tables)
    val in = df(Seq(
      ("g", "Wall", SC, "Element"), ("g", "hasNext", SP, "linked"),
      ("g", "linked", DOM, "Cell"), ("g", "linked", RNG, "Node"),
      ("g", "w1", T, "Wall"), ("g", "c1", "hasNext", "c2")))
    val plan = Rdfs.entail(in).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join means an instance-side shuffle crept into a rule")
  }

  test("null graph/term schema rows: driver gate defers to the distributed path, identically") {
    // SQL joins never match NULL keys; the driver TBox composition must
    // refuse such rows so both paths stay output-identical
    val in = df(Seq(
      (null, "A", SC, "B"), ("g", "A", SC, "B"), ("g", "B", SC, "C"),
      ("g", null, SC, "D"), ("g", "x", T, "A")))
    assert(quads(Rdfs.entail(in)) ==
      quads(Rdfs.entail(in, "doc_id", tboxCap = -1L)))
  }

  test("withSchema replicates a graph-less TBox into every named graph") {
    import spark.implicits._
    val inst = df(Seq(("g1", "w", T, "Wall"), ("g2", "d", T, "Door")))
    val tbox = Seq(("Wall", SC, "Element"), ("Door", SC, "Element"))
      .toDF("subj", "pred", "obj")
    val got = quads(Rdfs.entail(Rdfs.withSchema(inst, tbox)))
    assert(got.contains(("g1", "w", T, "Element")))
    assert(got.contains(("g2", "d", T, "Element")))
    assert(got.contains(("g1", "Door", SC, "Element"))) // TBox rides each graph
    assert(!got.exists(q => q._1 == "g2" && q._2 == "w")) // instances do not
  }
}
