package graft

import graft.analytics.KgQuery
import graft.analytics.KgQuery.{I, V}
import org.apache.spark.sql.DataFrame

class KgQuerySpec extends SparkTestBase {

  private def triples(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj")
  }

  private def closure(edges: Seq[(String, String, String)]): Set[(String, String, String, Int)] = {
    import spark.implicits._
    KgQuery.transitiveClosure(edges.toDF("g", "src", "dst"), graph = Seq("g"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
  }

  // ------------------------------------------------------------ closure

  test("closure of a chain: all descendant pairs with hop distances") {
    val got = closure(Seq(("d", "a", "b"), ("d", "b", "c"), ("d", "c", "e")))
    assert(got == Set(
      ("d", "a", "b", 1), ("d", "a", "c", 2), ("d", "a", "e", 3),
      ("d", "b", "c", 1), ("d", "b", "e", 2), ("d", "c", "e", 1)))
  }

  test("closure takes the MIN distance over alternative paths") {
    // diamond plus a direct shortcut: 1->4 via 2 or 3 is 2 hops, direct is 1
    val got = closure(Seq(("d", "1", "2"), ("d", "1", "3"), ("d", "2", "4"),
      ("d", "3", "4"), ("d", "1", "4")))
    assert(got(("d", "1", "4", 1)) && got(("d", "2", "4", 1)) && !got.exists(
      t => t._2 == "1" && t._3 == "4" && t._4 != 1))
  }

  test("closure of a cycle saturates and terminates") {
    val got = closure(Seq(("d", "1", "2"), ("d", "2", "3"), ("d", "3", "1")))
    val nodes = Seq("1", "2", "3")
    assert(got.size == 9) // all ordered pairs incl. self-reachability
    for (u <- nodes) assert(got(("d", u, u, 3)))
    assert(got(("d", "1", "2", 1)) && got(("d", "1", "3", 2)))
  }

  test("closure never crosses graph boundaries") {
    val got = closure(Seq(("A", "a", "b"), ("B", "b", "c")))
    assert(got == Set(("A", "a", "b", 1), ("B", "b", "c", 1)))
  }

  test("closure of an empty edge list is empty") {
    assert(closure(Nil).isEmpty)
  }

  test("distributed doubling path (smallCap = 0) matches the driver fast path") {
    // the size gate routes TBox-scale inputs through driver-side BFS; pin
    // the distributed loop on the same fixtures by disabling the gate
    import spark.implicits._
    val edges = Seq(
      ("d", "a", "b"), ("d", "b", "c"), ("d", "c", "e"), // chain
      ("d", "1", "2"), ("d", "2", "3"), ("d", "3", "1"), // cycle
      ("B", "b", "c")) // second graph
    def run(cap: Long) =
      KgQuery.transitiveClosure(edges.toDF("g", "src", "dst"),
          graph = Seq("g"), smallCap = cap)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(run(0L) == run(100000L))
  }

  // ------------------------------------------------------------ bgp

  private val rdfType = KgQuery.RdfType
  private val kg = triples(Seq(
    ("d1", "w1", rdfType, "Wall"),
    ("d1", "w1", "hasHeight", "3.0"),
    ("d1", "w1", "inStorey", "s1"),
    ("d1", "s1", rdfType, "Storey"),
    ("d1", "w2", rdfType, "Wall"),
    ("d1", "w2", "inStorey", "s1"),
    ("d1", "loop", "knows", "loop"),
    ("d2", "w1", rdfType, "Wall"), // same IRIs, different graph
    ("d2", "w1", "inStorey", "s9"),
    ("d2", "s9", rdfType, "Storey")))

  private def rows(df: DataFrame, cols: String*): Set[Seq[String]] =
    df.select(cols.head, cols.tail: _*).collect().map(_.toSeq.map(_.asInstanceOf[String])).toSet

  test("bgp star + chain join, graph-scoped") {
    val got = KgQuery.bgp(kg, Seq(
      (V("w"), I(rdfType), I("Wall")),
      (V("w"), I("inStorey"), V("st")),
      (V("st"), I(rdfType), I("Storey"))))
    assert(rows(got, "graph", "w", "st") == Set(
      Seq("d1", "w1", "s1"), Seq("d1", "w2", "s1"), Seq("d2", "w1", "s9")))
  }

  test("bgp constant subject pins one entity") {
    val got = KgQuery.bgp(kg, Seq((I("w1"), I("hasHeight"), V("h"))))
    assert(rows(got, "graph", "h") == Set(Seq("d1", "3.0")))
  }

  test("bgp repeated variable within a pattern = intra-row equality") {
    val got = KgQuery.bgp(kg, Seq((V("x"), I("knows"), V("x"))))
    assert(rows(got, "graph", "x") == Set(Seq("d1", "loop")))
  }

  test("bgp variable predicate enumerates properties") {
    val got = KgQuery.bgp(kg, Seq((I("w1"), V("p"), V("o")), (V("o"), I(rdfType), I("Storey"))))
    assert(rows(got, "graph", "p", "o") == Set(
      Seq("d1", "inStorey", "s1"), Seq("d2", "inStorey", "s9")))
  }

  test("bgp disconnected patterns form a graph-scoped product, never cross-doc") {
    val got = KgQuery.bgp(kg, Seq(
      (V("w"), I(rdfType), I("Wall")),
      (V("st"), I(rdfType), I("Storey"))))
    assert(rows(got, "graph", "w", "st") == Set(
      Seq("d1", "w1", "s1"), Seq("d1", "w2", "s1"), Seq("d2", "w1", "s9")))
  }

  test("bgpOptional pads unmatched groups with NULL, graph-scoped") {
    val got = KgQuery.bgpOptional(kg,
      Seq((V("w"), I(rdfType), I("Wall"))),
      Seq((V("w"), I("hasHeight"), V("h"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("d1", "w1", "3.0"), ("d1", "w2", null), ("d2", "w1", null)))
  }

  test("bgpNotExists keeps solutions whose negated group has no match") {
    val got = KgQuery.bgpNotExists(kg,
      Seq((V("w"), I(rdfType), I("Wall"))),
      Seq((V("w"), I("hasHeight"), V("h"))))
    assert(rows(got, "graph", "w") == Set(Seq("d1", "w2"), Seq("d2", "w1")))
  }

  test("construct instantiates the template per solution with set semantics") {
    val got = KgQuery.construct(kg,
      Seq((V("w"), I(rdfType), I("Wall")), (V("w"), I("inStorey"), V("st"))),
      Seq((V("st"), I("hasWall"), V("w")), (V("st"), I(rdfType), I("OccupiedStorey"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("d1", "s1", "hasWall", "w1"), ("d1", "s1", "hasWall", "w2"),
      ("d1", "s1", rdfType, "OccupiedStorey"), // ONE row despite two solutions
      ("d2", "s9", "hasWall", "w1"), ("d2", "s9", rdfType, "OccupiedStorey")))
  }

  test("construct rejects unbound template variables") {
    intercept[IllegalArgumentException] {
      KgQuery.construct(kg, Seq((V("w"), I(rdfType), I("Wall"))),
        Seq((V("w"), I("p"), V("unbound"))))
    }
  }

  test("bgpUnion NULL-pads branch-only variables, bag semantics, graph-scoped") {
    val got = KgQuery.bgpUnion(kg, Seq(
      Seq((V("w"), I("hasHeight"), V("h"))),
      Seq((V("w"), I("inStorey"), V("st")))))
    // schema: graph first, then sorted union of branch vars
    assert(got.columns.toSeq == Seq("graph", "h", "st", "w"))
    val rows = got.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.length == 4) // bag: no dedup across or within branches
    assert(rows.toSet == Set(
      ("d1", "3.0", null, "w1"),
      ("d1", null, "s1", "w1"), ("d1", null, "s1", "w2"), ("d2", null, "s9", "w1")))
  }

  test("bgpUnion of one group is that group's bgp") {
    val got = KgQuery.bgpUnion(kg, Seq(Seq((V("x"), I(rdfType), I("Storey")))))
    assert(rows(got, "graph", "x") == Set(Seq("d1", "s1"), Seq("d2", "s9")))
  }

  test("describe returns the subject-star of every binding, graph-scoped") {
    // subjects in a storey: w1/w2 in d1, w1 in d2 — full rows, but only from
    // the binding's own graph (d2's w1 star must not leak d1's w1 triples)
    val got = KgQuery.describe(kg,
      Seq((V("w"), I("inStorey"), V("st"))), "w")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("d1", "w1", rdfType, "Wall"), ("d1", "w1", "hasHeight", "3.0"),
      ("d1", "w1", "inStorey", "s1"),
      ("d1", "w2", rdfType, "Wall"), ("d1", "w2", "inStorey", "s1"),
      ("d2", "w1", rdfType, "Wall"), ("d2", "w1", "inStorey", "s9")))
  }

  test("describe rejects an unbound variable") {
    intercept[IllegalArgumentException] {
      KgQuery.describe(kg, Seq((V("w"), I(rdfType), I("Wall"))), "nope")
    }
  }

  test("ask is an existence probe") {
    assert(KgQuery.ask(kg, Seq((V("x"), I(rdfType), I("Storey")))))
    assert(!KgQuery.ask(kg, Seq((V("x"), I(rdfType), I("Roof")))))
  }

  test("bgp constant positions reach a parquet scan as pushed filters") {
    // the 100-TB contract: a pattern's constants must prune at the scan, not
    // in a post-scan Filter over the full triples table
    val dir = java.nio.file.Files.createTempDirectory("kgq").toString + "/trip"
    kg.write.mode("overwrite").parquet(dir)
    val df = KgQuery.bgp(spark.read.parquet(dir), Seq(
      (V("w"), I(rdfType), I("Wall")),
      (V("w"), I("inStorey"), V("st"))))
    df.collect()
    // walk the AQE-final plan programmatically: the rendered string truncates
    // scan metadata, so assert on the scans' actual pushed data filters
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    val filters = scans(df.queryExecution.executedPlan)
      .flatMap(_.dataFilters).map(_.toString)
    withClue(filters.mkString("\n")) {
      assert(filters.exists(_.contains("= Wall")), "obj constant must be a pushed scan filter")
      assert(filters.exists(_.contains("= inStorey")), "pred constant must be a pushed scan filter")
      assert(filters.exists(_.contains("rdf-syntax-ns#type")), "type pred must be a pushed scan filter")
    }
  }

  // ------------------------------------------------------------ paths

  import KgQuery.{P, Pred, Inv, PathSeq, Alt, Plus, Star}

  private def edgeRows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("pathEdges sequence joins on the midpoint, graph-scoped") {
    val got = edgeRows(KgQuery.pathEdges(kg, PathSeq(Pred("inStorey"), Pred(rdfType))))
    assert(got == Set(("d1", "w1", "Storey"), ("d1", "w2", "Storey"), ("d2", "w1", "Storey")))
  }

  test("pathEdges alternation unions branches; inverse swaps endpoints") {
    val got = edgeRows(KgQuery.pathEdges(kg, Alt(Pred("hasHeight"), Inv(Pred("inStorey")))))
    assert(got == Set(("d1", "w1", "3.0"),
      ("d1", "s1", "w1"), ("d1", "s1", "w2"), ("d2", "s9", "w1")))
  }

  private val nxt = KgQuery.ListHasNext
  private val cts = KgQuery.ListHasContents
  private val listKg = triples(Seq(
    ("A", "c1", cts, "x1"), ("A", "c2", cts, "x2"), ("A", "c3", cts, "x3"),
    ("A", "c1", nxt, "c2"), ("A", "c2", nxt, "c3"),
    ("A", "c9", cts, "y"),
    ("B", "c1", cts, "z1"), ("B", "c2", cts, "z2"),
    ("B", "c1", nxt, "c2")))

  test("pathEdges Plus is the transitive closure, set semantics") {
    val got = edgeRows(KgQuery.pathEdges(listKg, Plus(Pred(nxt))))
    assert(got == Set(
      ("A", "c1", "c2"), ("A", "c1", "c3"), ("A", "c2", "c3"),
      ("B", "c1", "c2")))
  }

  test("pathEdges Star adds zero-length pairs for every term of the graph") {
    val got = edgeRows(KgQuery.pathEdges(listKg, Star(Pred(nxt))))
    val aTerms = Seq("c1", "c2", "c3", "x1", "x2", "x3", "c9", "y")
    val bTerms = Seq("c1", "c2", "z1", "z2")
    val zero = aTerms.map(t => ("A", t, t)) ++ bTerms.map(t => ("B", t, t))
    assert(got == (zero.toSet ++ Set(
      ("A", "c1", "c2"), ("A", "c1", "c3"), ("A", "c2", "c3"), ("B", "c1", "c2"))))
  }

  test("pathEdges Opt (zero-or-one) is one step plus zero-length pairs, no closure") {
    val got = edgeRows(KgQuery.pathEdges(listKg, KgQuery.Opt(Pred(nxt))))
    val aTerms = Seq("c1", "c2", "c3", "x1", "x2", "x3", "c9", "y")
    val bTerms = Seq("c1", "c2", "z1", "z2")
    val zero = aTerms.map(t => ("A", t, t)) ++ bTerms.map(t => ("B", t, t))
    // c1->c3 (two hops) must NOT appear
    assert(got == (zero.toSet ++ Set(
      ("A", "c1", "c2"), ("A", "c2", "c3"), ("B", "c1", "c2"))))
  }

  test("bgp accepts a property path in predicate position") {
    // hasNext*/hasContents — every content reachable from each cell
    val got = KgQuery.bgp(listKg, Seq(
      (V("cell"), P(PathSeq(Star(Pred(nxt)), Pred(cts))), V("content"))))
    assert(rows(got, "graph", "cell", "content") == Set(
      Seq("A", "c1", "x1"), Seq("A", "c1", "x2"), Seq("A", "c1", "x3"),
      Seq("A", "c2", "x2"), Seq("A", "c2", "x3"), Seq("A", "c3", "x3"),
      Seq("A", "c9", "y"),
      Seq("B", "c1", "z1"), Seq("B", "c1", "z2"), Seq("B", "c2", "z2")))
  }

  test("bgp rejects a property path outside predicate position") {
    intercept[IllegalArgumentException] {
      KgQuery.bgp(listKg, Seq((P(Pred(nxt)), V("p"), V("o")))).collect()
    }
  }

  test("Star on the RIGHT of a sequence: reach every cell from a content") {
    // ^hasContents / hasNext*: content -> its cell and all later cells
    val got = edgeRows(KgQuery.pathEdges(listKg, PathSeq(Inv(Pred(cts)), Star(Pred(nxt)))))
    assert(got == Set(
      ("A", "x1", "c1"), ("A", "x1", "c2"), ("A", "x1", "c3"),
      ("A", "x2", "c2"), ("A", "x2", "c3"), ("A", "x3", "c3"), ("A", "y", "c9"),
      ("B", "z1", "c1"), ("B", "z1", "c2"), ("B", "z2", "c2")))
  }

  test("Opt inside a sequence: contents of self or immediate successor") {
    val got = edgeRows(KgQuery.pathEdges(listKg, PathSeq(KgQuery.Opt(Pred(nxt)), Pred(cts))))
    assert(got == Set(
      ("A", "c1", "x1"), ("A", "c1", "x2"), ("A", "c2", "x2"), ("A", "c2", "x3"),
      ("A", "c3", "x3"), ("A", "c9", "y"),
      ("B", "c1", "z1"), ("B", "c1", "z2"), ("B", "c2", "z2")))
  }

  test("Star/Opt inside a sequence never materialize the graph's term set") {
    // the zero-length branch rewrites to the other side's own scan: the
    // final plan must contain NO distinct (Aggregate/Deduplicate) node —
    // a bare Star's all-terms distinct is the one corpus-scale trap here
    // the term-set materialization is a distinct over (graph, t) — TWO
    // columns; Opt's legitimate per-path edge dedup groups on three
    // (graph, src, dst), so any <3-column distinct is the trap
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate}
    for (p <- Seq(
        PathSeq(Star(Pred(nxt)), Pred(cts)),
        PathSeq(Inv(Pred(cts)), Star(Pred(nxt))),
        PathSeq(KgQuery.Opt(Pred(nxt)), Pred(cts)),
        PathSeq(Pred(nxt), KgQuery.Opt(Pred(nxt))))) {
      val plan = KgQuery.pathEdges(listKg, p).queryExecution.optimizedPlan
      val dedups = plan.collect {
        case a: Aggregate if a.groupingExpressions.size < 3 => a
        case d: Deduplicate if d.keys.size < 3 => d
      }
      assert(dedups.isEmpty,
        s"$p compiled with a distinct over the graph's term set:\n$plan")
    }
  }

  // ------------------------------------------------------------ term metadata

  test("bgp termMeta binds kind/datatype/lang companions, never as join keys") {
    import spark.implicits._
    val t = Seq(
      ("d1", "s1", "p", "chat", "literal", "", "en"),
      ("d1", "s1", "p", "chat", "literal", "", "fr"),
      ("d1", "s1", "p", "urn:o", "iri", "", ""),
      ("d1", "_:b", "q", "3.5", "literal", "http://www.w3.org/2001/XMLSchema#double", ""))
      .toDF("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang")
    val got = KgQuery.bgp(t, Seq((V("s"), V("pp"), V("o"))), termMeta = Set("s", "o"))
    assert(got.columns.toSet == Set("graph", "s", "pp", "o",
      "o#kind", "o#datatype", "o#lang", "s#kind"))
    val byRow = got.collect().map(r =>
      (r.getAs[String]("o"), r.getAs[String]("o#kind"), r.getAs[String]("o#lang"),
        r.getAs[String]("s"), r.getAs[String]("s#kind"))).toSet
    assert(byRow == Set(
      ("chat", "literal", "en", "s1", "iri"),
      ("chat", "literal", "fr", "s1", "iri"),
      ("urn:o", "iri", "", "s1", "iri"),
      ("3.5", "literal", "", "_:b", "bnode")))
    // a variable bound in two object positions: companions come from the
    // first binding and never become join keys (joining on obj_lang NULLs
    // would silently drop every solution)
    val two = KgQuery.bgp(t,
      Seq((V("s"), I("p"), V("o")), (V("s2"), I("p"), V("o"))),
      termMeta = Set("o"))
    assert(two.columns.count(_ == "o#kind") == 1)
    assert(two.filter(two("o") === "chat").count() == 4) // 2 x 2 lexical join
  }

  // ------------------------------------------------------------ lists

  test("listElements flattens chains per graph with dense positions") {
    val nxt = KgQuery.ListHasNext
    val cts = KgQuery.ListHasContents
    val t = triples(Seq(
      // doc A: c1 -> c2 -> c3, plus a single-cell list c9
      ("A", "c1", cts, "x1"), ("A", "c2", cts, "x2"), ("A", "c3", cts, "x3"),
      ("A", "c1", nxt, "c2"), ("A", "c2", nxt, "c3"),
      ("A", "c9", cts, "y"),
      // doc B reuses cell IRIs with a SHORTER chain — must not merge with A
      ("B", "c1", cts, "z1"), ("B", "c2", cts, "z2"),
      ("B", "c1", nxt, "c2"),
      // unrelated triples are ignored
      ("A", "c1", rdfType, "List")))
    val got = KgQuery.listElements(t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    assert(got == Set(
      ("A", "c1", 0, "x1"), ("A", "c1", 1, "x2"), ("A", "c1", 2, "x3"),
      ("A", "c9", 0, "y"),
      ("B", "c1", 0, "z1"), ("B", "c1", 1, "z2")))
  }
}
