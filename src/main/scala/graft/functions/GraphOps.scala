package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators for the dedup "finishing" stage.
  *
  * Near-dup candidate generators (MinHash bands, banded sign-LSH, Jaccard
  * pair join — Battery q12/q13/q23/q27) emit PAIRS; an actual corpus clean
  * needs CLUSTERS: group mutually-similar documents into one component and
  * keep a single representative. The reference has no counterpart (it is a
  * per-file converter); this is the standard large-scale-training-data
  * operator (e.g. the dedup stage of C4/RefinedWeb-style pipelines).
  */
object GraphOps {

  /** Connected components of an undirected edge list.
    *
    * Input: a DataFrame with two integral node columns (`a`, `b`), one row
    * per edge. Output: (node, lbl) for every node that appears in an edge,
    * where lbl is the MINIMUM node id of the node's component — a canonical,
    * deterministic component id.
    *
    * Algorithm: alternating min-label propagation (each node takes the min
    * label over itself and its neighborhood) and pointer jumping
    * (lbl <- lbl(lbl)), iterated to a counted fixpoint. Labels are
    * monotonically non-increasing and bounded below by the component min, so
    * termination is guaranteed; the jump step doubles the label's reach per
    * round, giving O(log d) rounds on diameter-d components. Near-dup
    * components are additionally tiny by construction — every upstream
    * candidate generator is per-bucket capped — so in practice this runs
    * 2-4 rounds.
    *
    * 100-TB posture: each round is three keyed shuffles over (node, lbl)
    * longs — 16 B/node wire, no strings — plus one scalar aggregate for the
    * convergence check; nothing ever collects to the driver except that one
    * number per round. The symmetric edge list is persisted once and reused
    * by every round (at real scale: a staged parquet table). Lineage is cut
    * per round with localCheckpoint (swap for reliable checkpoint(dir) on a
    * cluster) AND the checkpoint leaf is re-rooted stats-fresh
    * ([[org.apache.spark.sql.GraftBridge.statsFreshCopy]]): without that,
    * the size-only join estimate snapshotted into each round's leaf
    * compounds ~quartically and the driver's stats walk degenerates into
    * multi-minute BigInteger arithmetic by round ~8.
    * The convergence sum runs in decimal(30,0): exact up to 10^30, far above
    * any sum of 10^12 node ids, where a raw long sum could wrap.
    */
  def connectedComponents(edges: DataFrame, a: String = "a", b: String = "b",
                          maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
    // The edge list is the largest table in the loop and every round joins it
    // on u. Hash-partition it by u ONCE before caching: the cached relation
    // reports that partitioning, so each round's propagation join exchanges
    // only the (much smaller) labels side — one edge shuffle total instead of
    // one per round.
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u")).persist()

    def checksum(labels: DataFrame): java.math.BigDecimal = {
      val v = labels.agg(sum(col("lbl").cast("decimal(30,0)"))).head().get(0)
      if (v == null) java.math.BigDecimal.ZERO
      else v.asInstanceOf[java.math.BigDecimal].stripTrailingZeros()
    }

    // cut() tracks the checkpoint's block-store RDD so each round can free
    // round k-1 once round k is materialized; without that (and the
    // stats-fresh re-rooting — see class doc) a fixpoint loop leaks memory
    // linearly in rounds and burns driver CPU on compounded size estimates.
    def cut(df: DataFrame): (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val ck = df.localCheckpoint(true)
      (org.apache.spark.sql.GraftBridge.statsFreshCopy(ck),
        org.apache.spark.sql.GraftBridge.checkpointedRdd(ck))
    }

    var (labels, labelsRdd) = cut(sym.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    var prev = checksum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min-label propagation: node <- min(own label, neighbors' labels)
      val msgs = sym.join(labels, col("u") === col("node"))
        .groupBy(col("v")).agg(min(col("lbl")).as("nl"))
        .withColumnRenamed("v", "node")
      val prop = labels.join(msgs, Seq("node"), "left")
        .select(col("node"), least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
      // pointer jump: lbl <- lbl(lbl) (labels only ever point at other nodes,
      // so the lookup is a self-join on the same frame)
      val lookup = prop.select(col("node").as("pnode"), col("lbl").as("plbl"))
      val (next, nextRdd) = cut(prop.join(lookup, col("lbl") === col("pnode"), "left")
        .select(col("node"), least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl")))
      val s = checksum(next)
      converged = s.compareTo(prev) == 0
      prev = s
      labelsRdd.foreach(_.unpersist(false)) // round k-1 no longer referenced
      labels = next
      labelsRdd = nextRdd
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Integer-exact PageRank over a per-graph directed edge list, a fixed
    * number of unrolled iterations (link-analysis centrality for KG nodes —
    * entity-importance ranking for summarization/sampling).
    *
    * Scores are scaled by 10^6 and every operation is integer (truncating
    * `div`), so the result is bitwise deterministic and cross-engine
    * oracle-able: pr0 = 1e6; each round pr' = 150000 + (85 * Σ incoming
    * (pr div outdeg)) div 100 — the standard d=0.85 update with dangling
    * mass dropped (dangling nodes keep receiving, never redistribute).
    *
    * 100-TB posture per round: one (g, src)-keyed join of the edge list
    * against the rank table, one (g, dst)-keyed map-side-combinable sum,
    * one left join back onto the node set — three keyed hash shuffles of
    * (node, long) pairs, nothing driver-side. A fixed iteration count
    * keeps the plan static (no convergence collect); the deduped edge
    * list recurs across rounds as a ReusedExchange (at real scale — or
    * for more rounds — stage it to parquet and localCheckpoint each pr,
    * as connectedComponents does). Long arithmetic holds to ~9e12
    * incoming mass per node (sum of 1e6-scaled ranks) — beyond that,
    * widen to decimal as connectedComponents' checksum does.
    */
  def pageRank(edges: DataFrame, g: String = "g", src: String = "s",
      dst: String = "d", iters: Int = 2): DataFrame = {
    val e = edges.select(col(g).as("g"), col(src).as("s"), col(dst).as("d"))
      .distinct()
    val out = e.groupBy(col("g"), col("s")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("g"), col("s").as("node"))
      .unionByName(e.select(col("g"), col("d").as("node"))).distinct()
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (_ <- 0 until iters) {
      val contrib = e.join(out, Seq("g", "s"))
        .join(pr.select(col("g"), col("node").as("s"), col("pr")), Seq("g", "s"))
        .select(col("g"), col("d").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("g"), col("node")).agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("g", "node"), "left")
        .select(col("g"), col("node"),
          (lit(150000L) + expr("(85 * coalesce(m, 0L)) div 100")).as("pr"))
    }
    pr.select(col("g"), col("node"), col("pr"))
  }

  /** Exact triangle count per graph over an undirected edge list (clustering
    * structure of the KG's entity graph — the standard cohesion statistic).
    *
    * Edges are canonicalized (self-loops dropped, both directions collapse
    * into src < dst), then triangles enumerate as the two-hop join
    * e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a < b < c — each triangle counted
    * exactly once by the ordering. 100-TB posture: the ordering IS the
    * classic orientation bound — every wedge (a<b<c) is generated once
    * from its smallest vertex and closed by one keyed hash join probe; both
    * joins are keyed on (graph, node) pairs, map-side combinable count at
    * the end, no driver involvement. For power-law graphs replace the
    * lexicographic order with a degree order (fewer wedges at hubs) — same
    * plan shape, one extra degree join.
    */
  def triangleCount(edges: DataFrame, g: String = "g", src: String = "s",
      dst: String = "d"): DataFrame = {
    val e = edges.select(col(g).as("g"), col(src).as("a"), col(dst).as("b"))
      .filter(col("a") =!= col("b"))
      .select(col("g"), least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.g") === col("e2.g") && col("e1.b") === col("e2.a"))
      .select(col("e1.g").as("g"), col("e1.a").as("a"),
        col("e1.b").as("b"), col("e2.b").as("c"))
    wedges.join(e.select(col("g").as("__g"), col("a").as("__a"), col("b").as("__c")),
        col("g") === col("__g") && col("a") === col("__a") && col("c") === col("__c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
