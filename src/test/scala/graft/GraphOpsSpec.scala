package graft

import graft.functions.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkTestBase {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** driver-side reference: brute-force label propagation to fixpoint */
  private def bruteCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    var lbl = adj.keys.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      for (n <- adj.keys) {
        val m = (adj(n).map(lbl).toSet + lbl(n)).min
        if (m < lbl(n)) { lbl += n -> m; changed = true }
      }
    }
    lbl
  }

  test("two components, labels are component mins") {
    val got = cc(Seq((2L, 1L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges (pointer jumping beats diameter)") {
    val n = 64L // diameter 63; plain propagation would need 63 rounds > maxIter-free margin
    val got = cc((1L until n).map(i => (i, i + 1)))
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("self-loops and duplicate edges are harmless") {
    val got = cc(Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)))
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }

  test("empty edge list yields empty components") {
    import spark.implicits._
    val out = GraphOps.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.count() == 0)
  }

  test("matches brute-force closure on a deterministic random-ish graph") {
    // LCG-derived edges: multiple components of varying shape, no RNG state
    val edges = (0 until 120).map { i =>
      val u = (i * 1103515245L + 12345L) % 97
      val v = (u * 69069L + 1L) % 97
      (math.abs(u), math.abs(v))
    }.filter { case (u, v) => u != v }
    assert(cc(edges) == bruteCc(edges))
  }

  test("battery q31/q32 wiring returns clustered pairs at sf0.001") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$d/documents.parquet").exists())
    val comp = graft.analytics.Battery.queries("q31_dup_components")(spark, d)
    val rows = comp.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    // every component id is itself a member of the component (canonical min)
    val byComp = rows.groupMap(_._2)(_._1)
    byComp.foreach { case (c, members) => assert(members.min == c) }
    val reps = graft.analytics.Battery.queries("q32_dup_representative")(spark, d)
    assert(reps.count() == byComp.size)
  }
}
