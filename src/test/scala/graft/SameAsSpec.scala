package graft

import graft.analytics.SameAs
import org.apache.spark.sql.DataFrame

class SameAsSpec extends SparkTestBase {

  private val SA = SameAs.OwlSameAs

  private def df(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj")
  }

  private def quads(d: DataFrame): Set[(String, String, String, String)] =
    d.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet

  test("canonicalMap: clique min wins across direction and transitivity") {
    // c —sameAs→ b, a —sameAs→ b : one clique {a,b,c}, canon = a
    val m = SameAs.canonicalMap(df(Seq(
      ("g", "c", SA, "b"), ("g", "a", SA, "b"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(m == Set(("g", "b", "a"), ("g", "c", "a")))
  }

  test("resolve rewrites subj and obj, collapses duplicates, keeps provenance") {
    val in = Seq(
      ("g", "b", SA, "a"),
      ("g", "b", "p", "x"), // subj rewrite: a p x
      ("g", "a", "p", "x"), // already canonical — collapses with the above
      ("g", "y", "q", "b"), // obj rewrite: y q a
      ("g", "z", "r", "z")) // untouched
    val got = quads(SameAs.resolve(df(in)))
    assert(got == Set(
      ("g", "a", "p", "x"), ("g", "y", "q", "a"), ("g", "z", "r", "z"),
      ("g", "b", SA, "a"))) // provenance triple for the merged alias
  }

  test("graphs resolve independently — the same IRIs, different cliques") {
    val in = Seq(
      ("g1", "b", SA, "a"), ("g1", "b", "p", "v"),
      ("g2", "b", "p", "v")) // no sameAs in g2 — b stays b
    val got = quads(SameAs.resolve(df(in)))
    assert(got == Set(
      ("g1", "a", "p", "v"), ("g1", "b", SA, "a"),
      ("g2", "b", "p", "v")))
  }

  test("chain of sameAs links collapses to one canon (transitive clique)") {
    val in = Seq(
      ("g", "d", SA, "c"), ("g", "c", SA, "b"), ("g", "b", SA, "a"),
      ("g", "d", "p", "c"))
    val got = quads(SameAs.resolve(df(in)))
    assert(got == Set(
      ("g", "a", "p", "a"), // both positions rewritten into the canon
      ("g", "b", SA, "a"), ("g", "c", SA, "a"), ("g", "d", SA, "a")))
  }

  test("resolve is idempotent (a smushed graph smushes to itself)") {
    val in = df(Seq(
      ("g", "b", SA, "a"), ("g", "c", SA, "b"),
      ("g", "b", "p", "c"), ("g", "x", "q", "b")))
    val once = SameAs.resolve(in)
    assert(quads(SameAs.resolve(once)) == quads(once))
  }

  test("no sameAs triples: resolve is identity (minus nothing)") {
    val in = Seq(("g", "s", "p", "o"), ("g", "s2", "p2", "o2"))
    assert(quads(SameAs.resolve(df(in))) == in.toSet)
  }
}
