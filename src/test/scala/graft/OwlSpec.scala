package graft

import graft.analytics.Owl
import org.apache.spark.sql.DataFrame

/** Hand-computed pins for the OWL property-characteristics materializer:
  * each rule alone, the inverse-feeds-transitive and inverse-of-closure
  * compositions, declaration symmetry, and per-graph isolation. */
class OwlSpec extends SparkTestBase {

  private val T = graft.analytics.KgQuery.RdfType

  private def df(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj")
  }

  private def quads(d: DataFrame): Set[(String, String, String, String)] =
    d.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet

  test("inverseOf derives both directions from one declaration") {
    val got = quads(Owl.entail(df(Seq(
      ("g", "p", Owl.InverseOf, "q"),
      ("g", "a", "p", "b"),     // => b q a
      ("g", "c", "q", "d")))))  // the declaration is symmetric => d p c
    assert(got.contains(("g", "b", "q", "a")))
    assert(got.contains(("g", "d", "p", "c")))
  }

  test("SymmetricProperty mirrors assertions; TransitiveProperty closes chains") {
    val got = quads(Owl.entail(df(Seq(
      ("g", "near", T, Owl.SymmetricProperty),
      ("g", "a", "near", "b"),
      ("g", "anc", T, Owl.TransitiveProperty),
      ("g", "x", "anc", "y"), ("g", "y", "anc", "z"), ("g", "z", "anc", "w")))))
    assert(got.contains(("g", "b", "near", "a")))
    assert(got.contains(("g", "x", "anc", "z")))
    assert(got.contains(("g", "x", "anc", "w")))
    assert(got.contains(("g", "y", "anc", "w")))
    // no over-derivation: near is not transitive, anc not symmetric
    assert(!got.contains(("g", "y", "anc", "x")))
  }

  test("inverse-derived edges feed a transitive property's closure, and back") {
    // only q is transitive; its edges arrive via `q inverseOf p`
    val got = quads(Owl.entail(df(Seq(
      ("g", "q", Owl.InverseOf, "p"),
      ("g", "q", T, Owl.TransitiveProperty),
      ("g", "a", "p", "b"), ("g", "b", "p", "c")))))
    // inv: b q a, c q b; closure: c q a; and the closed chain inverts BACK
    // onto p (c q a ∧ q inv p ⇒ a p c) — sound even though p itself is
    // not declared transitive
    assert(got.contains(("g", "c", "q", "a")))
    assert(got.contains(("g", "a", "p", "c")))
    // and the dual: p transitive, closure's chains invert onto q
    val got2 = quads(Owl.entail(df(Seq(
      ("g", "q", Owl.InverseOf, "p"),
      ("g", "p", T, Owl.TransitiveProperty),
      ("g", "a", "p", "b"), ("g", "b", "p", "c")))))
    assert(got2.contains(("g", "a", "p", "c")))
    assert(got2.contains(("g", "c", "q", "a"))) // inverse of the CLOSED chain
  }

  test("symmetric + transitive composes to full connectivity; graphs isolate") {
    val got = quads(Owl.entail(df(Seq(
      ("g1", "r", T, Owl.SymmetricProperty),
      ("g1", "r", T, Owl.TransitiveProperty),
      ("g1", "a", "r", "b"), ("g1", "b", "r", "c"),
      ("g2", "a", "r", "b"))))) // no declarations in g2
    // g1: {a,b,c} all mutually r-related (incl. self via the round trip)
    for (x <- Seq("a", "b", "c"); y <- Seq("a", "b", "c"))
      assert(got.contains(("g1", x, "r", y)), s"g1 $x r $y")
    assert(!got.contains(("g2", "b", "r", "a"))) // g2 inherits nothing
  }

  test("entailment is idempotent") {
    val in = df(Seq(
      ("g", "p", Owl.InverseOf, "q"),
      ("g", "anc", T, Owl.TransitiveProperty),
      ("g", "a", "p", "b"), ("g", "x", "anc", "y"), ("g", "y", "anc", "z")))
    val once = Owl.entail(in)
    assert(quads(Owl.entail(once)) == quads(once))
  }
}
