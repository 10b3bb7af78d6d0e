package graft

import graft.functions.AnnOps
import org.apache.spark.sql.functions.col

/** Hand-computed pins for the k-means (Lloyd) assignment and SemDeDup
  * (q67/q68): the update round must MOVE a centroid enough to flip a
  * point's assignment, and the semantic-dedup rule must drop exactly the
  * higher id of every over-threshold pair. The truncating-division parity
  * with DuckDB `//` (negative centroid sums) is pinned by the driver
  * oracle — the synthetic embeddings are negative in half their dims. */
class KmeansSpec extends SparkTestBase {

  private def emb(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("one Lloyd round flips the point the moved centroid abandons") {
    // 1-D over EXACT binary fractions (floor(e*1000) of an inexact float
    // lands one integer low — 0.03f quantizes to 29). Quantized: id0=0
    // (seed c0), id5=500 (seed c5), id1=375, id2=id3=1500. Seed assignment:
    // 375 -> c5 (15625 < 140625). Update: c0 stays 0, c5 = (375+1500+1500+
    // 500) div 4 = 968. Reassign: 375 -> c0 (140625 < 351649) — FLIP.
    val df = emb(0L -> Seq(0.0f), 1L -> Seq(0.375f), 2L -> Seq(1.5f),
      3L -> Seq(1.5f), 5L -> Seq(0.5f))
    val seed = AnnOps.kmeansAssign(df, "vec_id", "embedding", 5, 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seed == Map(0L -> 0L, 1L -> 5L, 2L -> 5L, 3L -> 5L, 5L -> 5L))
    val after = AnnOps.kmeansAssign(df, "vec_id", "embedding", 5, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(0L -> 0L, 1L -> 0L, 2L -> 5L, 3L -> 5L, 5L -> 5L))
  }

  test("semDedup drops the higher id of each over-threshold pair, keeps anti-aligned") {
    // one cluster (single seed): ids 0,1,2 colinear (cos = 1 -> ids 1,2
    // drop against id 0); id 3 anti-aligned (cos = -1 -> survives)
    val df = emb(0L -> Seq(0.5f), 1L -> Seq(0.3f), 2L -> Seq(0.2f), 3L -> Seq(-0.4f))
    val surv = AnnOps.semDedup(df, "vec_id", "embedding", 100, 1, 42, 100)
      .collect().map(_.getLong(0)).sorted
    assert(surv.toSeq == Seq(0L, 3L))
  }

  test("semDedup pair stage is capped per cluster (skewed-cluster fixture)") {
    // VERDICT r5 #1: one hot cluster must not go quadratic. A degenerate
    // assignment with one 60-member cluster and one 3-member cluster, pair
    // stage capped at 8 members: pairs per cluster <= cap*(cap-1)/2, and the
    // capped members are the DETERMINISTIC vid-ordered prefix.
    val s = spark
    import s.implicits._
    val asg = ((1L to 60L).map(_ -> 100L) ++ Seq(201L, 202L, 203L).map(_ -> 200L))
      .toDF("vid", "cid")
    val pairs = AnnOps.cappedClusterPairs(asg, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perCluster = pairs.groupBy(p => if (p._1 <= 60L) 100L else 200L)
    assert(perCluster(100L).length == 8 * 7 / 2) // capped, not 60*59/2
    assert(perCluster(200L).length == 3)          // under the cap: all pairs
    // deterministic prefix: only vids 1..8 participate in the hot cluster
    assert(perCluster(100L).forall { case (a, b) => a <= 8L && b <= 8L })
    // uncapped members always SURVIVE semDedup (conservative direction):
    // 70 identical colinear vectors in ONE cluster (seed = vid 70), cap 8
    // -> pair stage sees vids 1..8 only, drops 2..8, everyone else survives
    val df = emb((1L to 70L).map(i => i -> Seq(0.5f)): _*)
    val surv = AnnOps.semDedup(df, "vec_id", "embedding", 70, 0, 42, 100,
      pairCap = 8).collect().map(_.getLong(0)).sorted
    assert(surv.toSeq == (1L +: (9L to 70L)).sorted)
  }

  test("empty-embedding rows never reach assignment") {
    val df = emb(0L -> Seq(0.5f), 1L -> Seq.empty[Float])
    val asg = AnnOps.kmeansAssign(df, "vec_id", "embedding", 100, 1).collect()
    assert(asg.map(_.getLong(0)).toSeq == Seq(0L))
  }

  // ---- round 6: measured-count driver gate (the GraphOps house pattern) ----

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("driver gate ≡ distributed loop on a random corpus (both paths)") {
    // deterministic pseudo-random corpus: mixed signs, a few null elements,
    // one short row (length mismatch → NULL distance in both plans)
    val rnd = new scala.util.Random(20260822L)
    val rows = (0L until 61L).map { i =>
      val dim = if (i == 17L) 3 else 4
      i -> Seq.tabulate(dim)(_ => (rnd.nextFloat() - 0.5f) * 4.0f)
    }
    val df = emb(rows: _*)
    for (iters <- Seq(0, 1, 2)) {
      val gated = AnnOps.kmeansAssign(df, "vec_id", "embedding", 7, iters)
      // gate must actually fire: the result is a parallelized driver frame,
      // no Window / join in its plan
      val plan = gated.queryExecution.executedPlan.toString
      assert(!plan.contains("Window") && !plan.contains("Join"),
        s"gate did not fire for iters=$iters:\n$plan")
      val dist = AnnOps.kmeansAssign(df, "vec_id", "embedding", 7, iters,
        smallCap = -1L)
      assert(asMap(gated) == asMap(dist), s"gate/distributed divergence at iters=$iters")
    }
  }

  test("driver gate ≡ distributed loop with null elements and negative vids") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (-6L, Some(Seq[java.lang.Float](0.5f, null))),
      (-3L, Some(Seq[java.lang.Float](0.4f, 0.1f))),
      (0L, Some(Seq[java.lang.Float](0.0f, 0.0f))),
      (2L, Some(Seq[java.lang.Float](1.5f, -1.5f))),
      (3L, Some(Seq[java.lang.Float](null, null))),
      (9L, Some(Seq[java.lang.Float](1.6f, -1.4f))))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    for (iters <- Seq(0, 1)) {
      val gated = AnnOps.kmeansAssign(df, "vec_id", "embedding", 3, iters)
      val dist = AnnOps.kmeansAssign(df, "vec_id", "embedding", 3, iters, smallCap = -1L)
      assert(asMap(gated) == asMap(dist), s"divergence at iters=$iters")
    }
  }

  test("gate refuses duplicate vids and falls back to the distributed plan") {
    val s = spark
    import s.implicits._
    // two rows share vid 0: the assignment window pools their candidates
    // into one rank-1 partition — only the distributed plan defines that,
    // so the gate must decline (both calls below take the distributed path
    // and agree by construction; the pin is that the GATED call matches)
    val df = Seq((0L, Seq(0.1f)), (0L, Seq(1.4f)), (5L, Seq(0.6f)))
      .toDF("vec_id", "embedding")
    val gated = AnnOps.kmeansAssign(df, "vec_id", "embedding", 5, 1)
    val dist = AnnOps.kmeansAssign(df, "vec_id", "embedding", 5, 1, smallCap = -1L)
    assert(gated.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      dist.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }
}
