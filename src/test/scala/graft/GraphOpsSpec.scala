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

  test("cached edge partitioning is reused by the round join (one exchange, labels side only)") {
    // The loop's 100-TB contract: sym is hash-partitioned by u once and
    // cached; every round's propagation join must see that partitioning from
    // the cache and exchange ONLY the labels side. Reproduce one round's join
    // shape and count the exchanges in the executed plan — a Spark upgrade
    // that stops forwarding cached partitioning would silently re-shuffle the
    // corpus-sized edge table every round and this pins it.
    import spark.implicits._
    // force the corpus-scale join path: at 100 TB neither side broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val e = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("u", "v")
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u")).persist()
    try {
      sym.count() // materialize the cache, as the loop does
      val labels = org.apache.spark.sql.GraftBridge.statsFreshCopy(
        sym.select(col("u").as("node")).distinct()
          .select(col("node"), col("node").as("lbl")).localCheckpoint(true))
      val joined = sym.join(labels, col("u") === col("node"))
        .groupBy(col("v")).agg(min(col("lbl")).as("nl"))
      joined.collect()
      // final AQE plan only (the cached relation's stored string embeds its
      // own initial/final plans, so cut before counting)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // demand-inserted shuffles are tagged ENSURE_REQUIREMENTS; the one
      // deliberate edge shuffle is tagged REPARTITION_BY_COL and lives
      // inside the cache. Expected: labels->join + groupBy(v) = 2. A third
      // means the cached sym partitioning was not reused and the
      // corpus-sized edge table would re-shuffle EVERY round.
      val demanded = "ENSURE_REQUIREMENTS".r.findAllIn(plan).size
      assert(demanded <= 2, s"sym side re-shuffled ($demanded demand exchanges):\n$plan")
      assert(plan.contains("InMemoryTableScan"), s"sym not read from cache:\n$plan")
    } finally {
      sym.unpersist()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
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

  test("distributed loop (gate forced off) agrees with the driver union-find gate") {
    // r6: edge lists at or under smallCap close driver-side; this pins the
    // two paths against each other (and brute force) on the same graph
    import spark.implicits._
    val edges = (0 until 120).map { i =>
      val u = (i * 48271L + 11L) % 89
      val v = (u * 16807L + 7L) % 89
      (math.abs(u), math.abs(v))
    }.filter { case (u, v) => u != v }
    val viaLoop = GraphOps.connectedComponents(
        edges.toDF("a", "b"), smallCap = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLoop == cc(edges) && viaLoop == bruteCc(edges))
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

  test("pageRank: hand-computed two rounds, dangling receiver, per-graph isolation") {
    import spark.implicits._
    // g1: a->b, a->c, b->c (c dangling); g2: reuses node names, b->a only
    val edges = Seq(
      ("g1", "a", "b"), ("g1", "a", "c"), ("g1", "b", "c"),
      ("g2", "b", "a")).toDF("g", "s", "d")
    val got = graft.functions.GraphOps.pageRank(edges, "g", "s", "d", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // g1 round1: pr(a)=150000, pr(b)=150000+85%*500000=575000,
    //            pr(c)=150000+85%*1500000=1425000
    //    round2: m(b)=150000/2=75000, m(c)=75000+575000=650000
    assert(got == Set(
      ("g1", "a", 150000L), ("g1", "b", 213750L), ("g1", "c", 702500L),
      ("g2", "b", 150000L), ("g2", "a", 277500L)))
  }

  test("pageRank matches a brute-force evaluator on random multigraphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    def brute(edges: Seq[(String, String, String)], iters: Int): Set[(String, String, Long)] = {
      edges.groupBy(_._1).flatMap { case (g, es) =>
        val e = es.map(t => (t._2, t._3)).distinct
        val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
        val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        var pr = nodes.map(_ -> 1000000L).toMap
        for (_ <- 0 until iters) {
          val m = e.groupBy(_._2).view.mapValues(
            _.map { case (u, _) => pr(u) / deg(u) }.sum).toMap
          pr = nodes.map(n => n -> (150000L + 85L * m.getOrElse(n, 0L) / 100L)).toMap
        }
        pr.map { case (n, v) => (g, n, v) }
      }.toSet
    }
    val edgeGen = for {
      g <- Gen.oneOf("g1", "g2")
      s <- Gen.choose(0, 6); d <- Gen.choose(0, 6) // self-loops + dups allowed
    } yield (g, s"n$s", s"n$d")
    val prop = Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { edges =>
      val got = graft.functions.GraphOps.pageRank(
          edges.toDF("g", "s", "d"), "g", "s", "d", 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = brute(edges, 2)
      if (got != want) { println(s"PR MISMATCH\nEDGES: $edges\nGOT: $got\nWANT: $want"); false }
      else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("triangleCount: direction/duplicate collapse, self-loop drop, graph isolation") {
    import spark.implicits._
    val edges = Seq(
      // g1: triangle a-b-c asserted with mixed directions and a duplicate,
      // plus a self-loop and a dangling edge — exactly ONE triangle
      ("g1", "a", "b"), ("g1", "c", "b"), ("g1", "a", "c"), ("g1", "b", "a"),
      ("g1", "x", "x"), ("g1", "c", "d"),
      // g2: a 4-cycle has no triangle
      ("g2", "a", "b"), ("g2", "b", "c"), ("g2", "c", "d"), ("g2", "d", "a"),
      // g3: K4 = 4 triangles
      ("g3", "1", "2"), ("g3", "1", "3"), ("g3", "1", "4"),
      ("g3", "2", "3"), ("g3", "2", "4"), ("g3", "3", "4")).toDF("g", "s", "d")
    val got = graft.functions.GraphOps.triangleCount(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g1" -> 1L, "g3" -> 4L)) // g2 absent: no row, not 0
  }

  test("triangleCount: degree orientation bounds wedges at a hub (star graph)") {
    // K1,n star with the hub LEXICOGRAPHICALLY SMALLEST ("a"): the old
    // id-ordered orientation generated all C(n,2) wedges AT THE HUB; degree
    // orientation points every edge leaf->hub (leaves have degree 1), so no
    // vertex has two out-edges and the wedge set is EMPTY (VERDICT r5 #2).
    import spark.implicits._
    val n = 40
    val edges = (1 to n).map(i => ("g", "a", f"leaf$i%03d")).toDF("g", "s", "d")
    val (wedges, _) = GraphOps.orientedWedges(edges, "g", "s", "d")
    assert(wedges.count() == 0,
      s"star hub generated wedges — degree orientation not applied")
    // and a star plus one leaf-leaf edge has exactly one triangle
    val withTri = edges.union(Seq(("g", "leaf001", "leaf002")).toDF("g", "s", "d"))
    val got = GraphOps.triangleCount(withTri)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g" -> 1L))
  }

  test("triangleCount matches a brute-force count on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    def brute(edges: Seq[(String, String, String)]): Map[String, Long] =
      edges.groupBy(_._1).view.mapValues { es =>
        val und = es.flatMap(t => Seq((t._2, t._3), (t._3, t._2)))
          .filter(e => e._1 != e._2).toSet
        val nodes = und.map(_._1).toSeq.sorted
        nodes.combinations(3).count { case Seq(x, y, z) =>
          und((x, y)) && und((y, z)) && und((x, z)) }.toLong
      }.toMap.filter(_._2 > 0)
    val edgeGen = for {
      g <- Gen.oneOf("g1", "g2")
      s <- Gen.choose(0, 7); d <- Gen.choose(0, 7)
    } yield (g, s"n$s", s"n$d")
    val prop = Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { edges =>
      // both the driver gate (default cap) and the distributed degree-
      // oriented plan (gate forced off) must match brute force
      val viaGate = GraphOps.triangleCount(edges.toDF("g", "s", "d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaPlan = GraphOps.triangleCount(edges.toDF("g", "s", "d"), smallCap = -1L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = brute(edges)
      if (viaGate != want || viaPlan != want) {
        println(s"TRI MISMATCH\nEDGES: $edges\nGATE: $viaGate\nPLAN: $viaPlan\nWANT: $want")
        false
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("RdfDiff: set semantics, both directions, identical stores diff empty") {
    import spark.implicits._
    val a = Seq(
      ("g", "s", "p", "o"), ("g", "s", "p", "o"), // duplicate row: ONE quad
      ("g", "s", "q", "o2")).toDF("doc_id", "subj", "pred", "obj")
    val b = Seq(
      ("g", "s", "p", "o"),
      ("g", "s", "r", "o3")).toDF("doc_id", "subj", "pred", "obj")
    val got = graft.analytics.RdfDiff.diff(a, b)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(got == Set(("s", "r", "o3", "+"), ("s", "q", "o2", "-")))
    assert(graft.analytics.RdfDiff.diff(a, a).count() == 0)
  }
}
