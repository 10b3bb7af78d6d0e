package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths: exact brute-force top-k (integer-quantized dot product —
  * deterministic across engines and summation orders) and a sign-LSH
  * bucketed variant (the scale path: candidates only meet within their
  * hyperplane-sign bucket, turning the O(n^2) join into per-bucket joins).
  * True float cosine is also provided for API completeness (Spark-side only;
  * float sums are aggregation-order-dependent, so it is not oracle-checked).
  */
object AnnOps {

  /** integer-quantized embedding elements: (id, pos, ei) — the exploded
    * building block of the relational cross-checks (and the literal mirror
    * of the DuckDB oracle CTEs); production paths score narrowly via the
    * native [[QuantDot]]/[[QuantNorm]]/[[QuantL2]] instead */
  def quantized(df: DataFrame, id: String, emb: String, scale: Int = 1000): DataFrame =
    df.select(col(id).as("vid"), posexplode(col(emb)).as(Seq("pos", "e")))
      .select(col("vid"), col("pos"), floor(col("e") * scale).cast("long").as("ei"))

  /** exact top-k neighbors by quantized dot product for the query ids.
    * CONTRACT: `isQuery` must select a SMALL query set (it is broadcast with
    * its arrays — a corpus-sized predicate belongs on [[bandedTopK]] /
    * [[ivfTopK]], whose candidate generation is sub-quadratic; this is the
    * exact/baseline path).
    * Narrow shape: the query set is broadcast WITH its
    * arrays and each corpus row scores all queries in one [[QuantDot]] pass —
    * n·|Q| rows instead of the exploded pos-join's n·|Q|·d, no pre-score
    * shuffle (the only shuffle left is the per-query top-k window). Empty
    * arrays are dropped on both sides, matching the exploded build where a
    * no-element vector never reaches the pos-join. */
  /** Fail-fast bound on the broadcast query set (rows). A corpus-sized
    * `isQuery` predicate would otherwise surface as an opaque broadcast OOM
    * mid-job; the `limit(max+1).count()` probe terminates early on huge sets
    * and costs one cheap scan of the filtered side. */
  val MaxBruteForceQueries: Long = 100000L

  def bruteForceTopK(df: DataFrame, id: String, emb: String, isQuery: Column, k: Int): DataFrame = {
    val nonEmpty = df.filter(size(col(emb)) > 0)
    val q = nonEmpty.filter(isQuery).select(col(id).as("q"), col(emb).as("_qe"))
    val probed = q.limit((MaxBruteForceQueries + 1).toInt).count()
    require(probed <= MaxBruteForceQueries,
      s"bruteForceTopK query set exceeds $MaxBruteForceQueries rows — it is " +
        "broadcast with its embedding arrays; use bandedTopK/ivfTopK for " +
        "corpus-sized query sets")
    val dots = nonEmpty.select(col(id).as("c"), col(emb).as("_ce"))
      .crossJoin(broadcast(q))
      .filter(col("q") =!= col("c"))
      .select(col("q"), col("c"), quantDot(col("_qe"), col("_ce")).as("dot"))
    val w = Window.partitionBy(col("q")).orderBy(col("dot").desc, col("c").asc)
    dots.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** integer-quantized dot product of two embedding columns, computed
    * narrowly per row (no posexplode, no pos-join, no shuffle) by the native
    * [[QuantDot]] codegen expression: identical arithmetic to joining two
    * `quantized` streams on pos and summing — quantization widens to DOUBLE
    * before multiplying (Spark 4 ANSI coercion for float·int, see
    * [[QuantOps.qz]]), the per-position product is exact in long, and the
    * fold runs in array order (deterministic).
    * Null / length-mismatch positions contribute 0 — except when EVERY
    * position is null, where the result is NULL: exactly SQL SUM-over-a-join
    * semantics, so the narrow path agrees with the exploded relational build
    * and the DuckDB oracle even on all-NULL garbage arrays (whose pairs then
    * fail any threshold filter instead of scoring 0 >= 0). NaN / ±Inf /
    * out-of-long-range positions quantize to 0 (the TOTAL-function guard:
    * under ANSI mode a bare CAST(Infinity AS BIGINT) would abort the whole
    * job on one garbage embedding). */
  def quantDot(a: Column, b: Column): Column = QuantDot(a, b)

  /** floor(|v|) over quantized elements, narrowly per row — the norm factor
    * of the q23 integer cosine rule (matches floor(sqrt(sum(ei*ei))), NULL
    * for empty / all-NULL arrays like SQL SUM). Native [[QuantNorm]]. */
  def quantNorm(a: Column): Column = QuantNorm(a)

  /** the same two primitives composed from built-in higher-order functions —
    * kept as the independent cross-check the suite pins the native
    * expressions against (FunctionsSpec), not as a production path: the
    * guard branches run through Catalyst trees and the NULL-iff-no-usable-
    * position rule re-evaluates the product array, ~3x slower per pair. */
  private def qzComposed(x: Column): Column = {
    val d = (x * lit(1000)).cast("double") // ANSI coercion multiplies float·int in DOUBLE (the quantized() arithmetic; the native qz widens identically)
    when(isnan(d) || d < lit(-9.223372036854775e18) || d > lit(9.223372036854775e18), lit(0L))
      .otherwise(floor(d).cast("long"))
  }

  def quantDotComposed(a: Column, b: Column): Column = {
    val prods = zip_with(a, b, (x, y) => qzComposed(x) * qzComposed(y))
    when(exists(prods, v => v.isNotNull),
      aggregate(prods, lit(0L), (acc, v) => acc + coalesce(v, lit(0L))))
  }

  def quantNormComposed(a: Column): Column = {
    val sq = transform(a, x => qzComposed(x) * qzComposed(x))
    when(exists(sq, v => v.isNotNull),
      floor(sqrt(aggregate(sq, lit(0L),
        (acc, v) => acc + coalesce(v, lit(0L))).cast("double"))).cast("long"))
  }

  /** score candidate pairs by exact quantized dot: fetch both embedding
    * arrays via two equi joins on the id (broadcast or shuffled — Catalyst's
    * choice from stats), then one narrow expression per pair. Replaces the
    * explode + pos-join + groupBy scoring pattern: per-pair cost is O(d) in a
    * map stage instead of O(d) shuffled rows. */
  private def scorePairs(cand: DataFrame, df: DataFrame, id: String, emb: String,
                         aCol: String, bCol: String): DataFrame = {
    val ea = df.select(col(id).as(aCol), col(emb).as("_ea"))
    val eb = df.select(col(id).as(bCol), col(emb).as("_eb"))
    cand.join(ea, aCol).join(eb, bCol)
      .select(col(aCol), col(bCol), quantDot(col("_ea"), col("_eb")).as("dot"))
  }

  // ------------------------------------------------------------------------
  // Banded multi-table sign-LSH (VERDICT r1 #5) — the 100-TB-shaped ANN /
  // near-dup path. q13's MinHash banding shape applied to embeddings:
  //   * nBands independent hash tables, each bucketed by bitsPerBand
  //     hyperplane signs computed over ALL dims (not a fixed prefix);
  //   * hyperplane weights are deterministic ±1 per (plane, dim), derived
  //     from the portable md5 hash — identical in Spark and DuckDB;
  //   * a per-(band, bucket) candidate cap bounds the in-bucket join
  //     quadratically no matter how the corpus grows (a fixed-bucket scheme
  //     degrades to all-pairs at 10^9 vectors; q16 runs this path at
  //     nBands = 1 as the single-table configuration);
  //   * candidates are then scored integer-exactly (quantized dot).
  // Raising bitsPerBand scales the bucket space with corpus size
  // (log2(n / target_bucket_load)); the cap is the hard worst-case guard.
  // ------------------------------------------------------------------------

  /** deterministic ±1 hyperplane weights (j, pos, w): w = +1 iff
    * h32("hp<j>:<pos>") is odd — reproducible in any engine with md5 */
  def planes(spark: org.apache.spark.sql.SparkSession, nPlanes: Int, dims: Int): DataFrame =
    spark.range(nPlanes).toDF("j").crossJoin(spark.range(dims).toDF("pos"))
      .select(col("j").cast("int").as("j"), col("pos").cast("int").as("pos"),
        when(TextOps.h32(concat(lit("hp"), col("j").cast("string"), lit(":"),
          col("pos").cast("string"))) % 2 === 1, lit(1L)).otherwise(lit(-1L)).as("w"))

  /** banded sign-LSH signature: one (vid, band, bucket) row per table.
    * bucket = bits of sign(sum_d w(j,d) * ei(d)) packed per band; all-integer
    * so the signature is aggregation-order-free. Computed NARROWLY by the
    * native [[BandedSig]] expression (one pass over the array per row, then
    * posexplode to rows) — no plane join, no pre-candidate shuffles; at
    * 10^9-vector scale the signature is a pure map stage. */
  def bandedSignature(df: DataFrame, id: String, emb: String,
                      nBands: Int, bitsPerBand: Int, dims: Int): DataFrame =
    // size > 0: an EMPTY embedding produces no signature rows in the
    // relational build (nothing to explode), so it must be absent here too;
    // all-NULL-element arrays match via BandedSig's zero-usable-elements rule
    df.filter(size(col(emb)) > 0)
      .select(col(id).as("vid"),
        posexplode(BandedSig(col(emb), nBands, bitsPerBand, dims)).as(Seq("band", "bucket")))

  /** the pre-round-3 relational signature build (posexplode → broadcast plane
    * join → two shuffled groupBys) — kept as the independent cross-check the
    * suite pins [[BandedSig]] against (it mirrors the DuckDB oracle CTE
    * literally), not as a production path. */
  def bandedSignatureRelational(df: DataFrame, id: String, emb: String,
                                nBands: Int, bitsPerBand: Int, dims: Int): DataFrame = {
    val el = quantized(df, id, emb)
    val pl = planes(df.sparkSession, nBands * bitsPerBand, dims)
    el.join(broadcast(pl), Seq("pos"))
      .groupBy(col("vid"), col("j"))
      .agg(sum(col("w") * col("ei")).as("proj"))
      .groupBy(col("vid"), expr(s"CAST(j div $bitsPerBand AS INT)").as("band"))
      .agg(sum(when(col("proj") >= 0,
        expr(s"CAST(pow(2, j % $bitsPerBand) AS LONG)")).otherwise(lit(0L))).as("bucket"))
  }

  /** candidate near-dup pairs (a < b) that share >= 1 (band, bucket), with a
    * deterministic per-bucket candidate cap (row_number by vid).
    * SHUFFLE_HASH hints on the self-join: left to stats, Catalyst broadcasts
    * one side, RECOMPUTING the signature + cap-window subtree to build the
    * hashed relation; shuffle-hashing both (identical) sides computes it
    * once — and a corpus-sized signature table could never broadcast at
    * scale anyway. */
  def bandedCandidatePairs(df: DataFrame, id: String, emb: String, nBands: Int,
                           bitsPerBand: Int, dims: Int, cap: Int): DataFrame = {
    val sig = bandedSignature(df, id, emb, nBands, bitsPerBand, dims)
    val w = Window.partitionBy(col("band"), col("bucket")).orderBy(col("vid"))
    val kept = sig.withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
      .select(col("vid"), col("band"), col("bucket"))
    kept.as("x").hint("shuffle_hash").join(kept.as("y").hint("shuffle_hash"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("a"), col("y.vid").as("b")).distinct()
  }

  /** banded-LSH approximate top-k: candidates share >= 1 (band, bucket) with
    * the query (candidate side capped per bucket; queries always probe),
    * scored by exact quantized dot product */
  def bandedTopK(df: DataFrame, id: String, emb: String, isQuery: Column, k: Int,
                 nBands: Int, bitsPerBand: Int, dims: Int, cap: Int): DataFrame = {
    val sig = bandedSignature(df, id, emb, nBands, bitsPerBand, dims)
    val bw = Window.partitionBy(col("band"), col("bucket")).orderBy(col("vid"))
    val kept = sig.withColumn("rn", row_number().over(bw)).filter(col("rn") <= cap)
    val q = df.filter(isQuery).select(col(id).as("qid"))
    val qsig = sig.join(q, sig("vid") === q("qid"))
      .select(col("vid").as("q"), col("band"), col("bucket"))
    val cand = qsig.join(
        kept.select(col("vid").as("c"), col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("q") =!= col("c")).select(col("q"), col("c")).distinct()
    val dots = scorePairs(cand, df, id, emb, "q", "c")
    val w = Window.partitionBy(col("q")).orderBy(col("dot").desc, col("c").asc)
    dots.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second scale path next to banded LSH.
  // Classic IVF trains centroids with k-means; a distributed, oracle-checkable
  // variant replaces training with DETERMINISTIC seed selection (every
  // `seedStride`-th vector is a centroid — a data-dependent pivot set, the
  // standard "random sample as centroids" initialization without the RNG):
  //   * assignment: integer-exact squared-L2 over 1e3-quantized elements,
  //     argmin with centroid-id tiebreak — O(n * K * d), the true IVF build
  //     cost (K = n/seedStride << n);
  //   * inverted lists: (centroid, member) pairs, optionally capped per list
  //     (row_number) so one degenerate hot cluster cannot go quadratic;
  //   * search: a query probes its `nProbe` nearest centroids and scores only
  //     those lists' members, integer-exact quantized dot, top-k.
  // At 10^9+ vectors: seedStride ~ sqrt(n) gives K ~ sqrt(n) lists of ~sqrt(n)
  // members — probe cost O(nProbe * sqrt(n) * d) per query vs O(n * d) brute.
  // ------------------------------------------------------------------------

  /** integer-exact squared-L2 assignment of every vector to its nearest
    * stride-seed centroid; returns (vid, cid, arank) where arank orders a
    * vector's centroids by distance (1 = nearest) up to `maxRank`.
    * Narrow shape: the K = n/seedStride centroids are broadcast WITH their
    * arrays (at seedStride ~ √n that is √n·d floats — megabytes at 10^9
    * vectors) and each vector computes all K distances in [[QuantL2]]
    * passes: n·K rows instead of the exploded pos-join's n·K·d, and no
    * pre-assignment shuffle. Empty arrays drop on both sides, matching the
    * exploded build where a no-element vector never reached the pos-join. */
  def ivfAssign(df: DataFrame, id: String, emb: String,
                seedStride: Int, maxRank: Int,
                subjects: Column = lit(true)): DataFrame = {
    val nonEmpty = df.filter(size(col(emb)) > 0)
    val seeds = nonEmpty.filter(col(id) % seedStride === 0)
      .select(col(id).as("cid"), col(emb).as("_ce"))
    // `subjects` restricts WHICH vectors get assigned (seeds always come
    // from the full table): probe-side assignment only needs the query set,
    // so the n·K distance pass shrinks to |Q|·K there
    val d2 = nonEmpty.filter(subjects)
      .select(col(id).as("vid"), col(emb).as("_e"))
      .crossJoin(broadcast(seeds))
      .select(col("vid"), col("cid"), QuantL2(col("_e"), col("_ce")).as("d2"))
    // asc_nulls_last: Spark's plain ASC is NULLS FIRST but DuckDB's default
    // is NULLS LAST — without this, an all-NULL-element CENTROID (d2 = NULL
    // against everything) would win arank 1 for the entire corpus in Spark
    // while ranking dead last in the oracle
    val w = Window.partitionBy(col("vid")).orderBy(col("d2").asc_nulls_last, col("cid").asc)
    d2.withColumn("arank", row_number().over(w)).filter(col("arank") <= maxRank)
      .select(col("vid"), col("cid"), col("arank"))
  }

  /** IVF approximate top-k: deterministic stride-seed centroids, integer-exact
    * L2 assignment, `nProbe` probed lists per query, per-list member cap,
    * exact quantized-dot scoring of probed members only */
  def ivfTopK(df: DataFrame, id: String, emb: String, isQuery: Column, k: Int,
              seedStride: Int, nProbe: Int, cap: Int): DataFrame = {
    val members0 = ivfAssign(df, id, emb, seedStride, 1).select(col("vid"), col("cid"))
    val lw = Window.partitionBy(col("cid")).orderBy(col("vid"))
    val members = members0.withColumn("rn", row_number().over(lw))
      .filter(col("rn") <= cap).select(col("vid"), col("cid"))
    val probes = ivfAssign(df, id, emb, seedStride, nProbe, subjects = isQuery)
      .select(col("vid").as("q"), col("cid"))
    val cand = probes.join(members.select(col("vid").as("c"), col("cid")), Seq("cid"))
      .filter(col("q") =!= col("c")).select(col("q"), col("c")).distinct()
    val dots = scorePairs(cand, df, id, emb, "q", "c")
    val w = Window.partitionBy(col("q")).orderBy(col("dot").desc, col("c").asc)
    dots.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** distributed k-means assignment (Lloyd), all-integer: stride-seeded
    * centroids, L2 over 1e3-quantized elements (the [[quantized]] rule,
    * kept per-row as a long array), centroid update by TRUNCATING integer
    * division — `div` here, `//` in DuckDB, both round toward zero, so a
    * negative-sum dimension means the same centroid in both engines.
    *
    * Scale posture: the K centroids broadcast every round (k-means'
    * defining trait — the corpus is never shuffled for assignment; each
    * row scores all K in one zip_with pass), and the update is one
    * (cid, pos)-keyed map-side-combinable aggregate whose output is
    * K·dims rows. `iters` full update+reassign rounds follow the seed
    * assignment; the battery unrolls 1 (oracle-able as two CTE layers).
    * Each round's assignment is MATERIALIZED stats-fresh (the GraphOps
    * cut: localCheckpoint + re-rooted leaf, prior round's blocks freed) —
    * it is consumed twice per round (update + next assign) and again by
    * every downstream reuse, so leaving it lazy recomputes the whole
    * chain per consumer, exponentially in `iters`; the quantized input
    * is persisted for the loop's lifetime and released before return. */
  def kmeansAssign(df: DataFrame, id: String, emb: String,
                   seedStride: Int, iters: Int, smallCap: Long = 10000L,
                   driverWorkBudget: Long = 200000000L): DataFrame = {
    val e = df.filter(size(col(emb)) > 0).select(col(id).as("vid"),
      expr(s"transform($emb, x -> CAST(FLOOR(x * 1000) AS BIGINT))").as("q"))
      .persist()
    // Measured-count gate (round 6; the GraphOps.connectedComponents /
    // smallTriangles / smallClosure house pattern, guide §1.2 "the
    // distributed algorithm" + §5 driver rules): a corpus at or under
    // `smallCap` rows (default 10k — ~10 MB of quantized arrays at d=1k,
    // the same envelope the default broadcast-join threshold ships) runs
    // Lloyd on the driver in ONE collect instead of ~3 driver-synchronized
    // jobs per round (centroid aggregate, assignment window, eager
    // checkpoint cut). The driver replica is arithmetic-identical to the
    // distributed plan (see [[smallKmeans]]); inputs it cannot faithfully
    // replicate (null/duplicate/non-integral vids) fall through to the
    // distributed loop, as does an estimated n·K·d distance workload above
    // `driverWorkBudget` (the smallClosure pair-budget pattern — a small
    // corpus with a dense seed stride must not pin the driver). The count
    // also materializes the persisted cache for the distributed path, whose
    // loop is untouched above the gate (its 100-TB posture is unchanged).
    if (smallCap >= 0 && e.count() <= smallCap) {
      smallKmeans(e, seedStride, iters, driverWorkBudget) match {
        case Some(out) => e.unpersist(); return out
        case None => // fall through to the distributed loop
      }
    }
    def assign(cents: DataFrame): DataFrame = {
      // native codegen distance (guide §4): the composed
      // aggregate(zip_with(...)) form is an interpreted CodegenFallback
      // tree allocating a zipped array per (row, centroid) pair — QuantL2Q
      // is its exact-semantics fused-loop replacement (length mismatch or
      // any null element → NULL; wrapping long arithmetic)
      val d2 = QuantL2Q(col("q"), col("c"))
      // NULLS LAST for the same reason as ivfAssign: DuckDB's default
      val w = Window.partitionBy(col("vid")).orderBy(col("d2").asc_nulls_last, col("cid").asc)
      e.crossJoin(broadcast(cents))
        .select(col("vid"), col("cid"), d2.as("d2"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("vid"), col("cid"))
    }
    def cut(d: DataFrame): (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val ck = d.localCheckpoint(true)
      (org.apache.spark.sql.GraftBridge.statsFreshCopy(ck),
        org.apache.spark.sql.GraftBridge.checkpointedRdd(ck))
    }
    val seeds = e.filter(col("vid") % seedStride === 0)
      .select(col("vid").as("cid"), col("q").as("c"))
    var (asg, asgRdd) = cut(assign(seeds))
    for (_ <- 0 until iters) {
      val cents = asg.join(e, "vid")
        .select(col("cid"), posexplode(col("q")).as(Seq("pos", "ei")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("ei")).as("sm"), count(lit(1)).as("cnt"))
        .select(col("cid"), col("pos"), expr("sm div cnt").as("ce"))
        .groupBy(col("cid"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, ce))), s -> s.ce)").as("c"))
      val (next, nextRdd) = cut(assign(cents))
      asgRdd.foreach(_.unpersist(false)) // round k-1 no longer referenced
      asg = next
      asgRdd = nextRdd
    }
    e.unpersist()
    asg
  }

  /** Driver-side Lloyd over a small collected (vid, q) frame — only
    * reachable through [[kmeansAssign]]'s measured-count gate. Replicates
    * the distributed plan's arithmetic EXACTLY, row for row:
    *   - seeds: `vid % seedStride == 0` (sign-preserving remainder, like
    *     SQL `%` on integral types);
    *   - distance: the zip_with/aggregate fold — NULL on length mismatch or
    *     any null element, wrapping long arithmetic, 0 for two empties;
    *   - assignment: rank-1 of ORDER BY d2 ASC NULLS LAST, cid ASC;
    *   - centroid update: per (cid, pos) `sum(ei) div count(*)` — sum skips
    *     null elements and is NULL when all are null; count counts every
    *     member covering the position; `div` truncates toward zero (Java /);
    *     positions sorted ascending into the next round's array.
    * Returns None (caller falls back to the distributed loop) for inputs
    * whose plan-level behavior a per-vid driver map cannot reproduce:
    * non-integral vid types, NULL vids (the assignment window would pool
    * them into one rank-1 partition), duplicate vids (ditto), or an
    * n·K·d workload above the driver budget. */
  private def smallKmeans(e: DataFrame, seedStride: Int, iters: Int,
                          workBudget: Long): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val vidType = e.schema("vid").dataType
    val integral = vidType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (!integral) return None
    val rows = e.collect()
    if (rows.exists(_.isNullAt(0))) return None
    def vidL(r: org.apache.spark.sql.Row): Long = r.get(0) match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
      case s: java.lang.Short => s.toLong
      case b: java.lang.Byte => b.toLong
    }
    // (orig vid value, vid as long, quantized elements with nulls kept)
    val vecs = rows.map { r =>
      (r.get(0), vidL(r), r.getSeq[java.lang.Long](1).toArray)
    }
    if (vecs.map(_._2).distinct.length != vecs.length) return None
    val seeds = vecs.filter(v => v._2 % seedStride == 0)
      .map { case (orig, l, q) => (orig, l, q) }
    val maxDim = if (vecs.isEmpty) 0 else vecs.map(_._3.length).max
    if (vecs.length.toLong * seeds.length * math.max(maxDim, 1) *
        (iters + 1L) > workBudget) return None

    def d2(a: Array[java.lang.Long], b: Array[java.lang.Long]): java.lang.Long = {
      if (a.length != b.length) return null
      var s = 0L
      var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i)
        if (x == null || y == null) return null
        val d = x.longValue - y.longValue
        s += d * d
        i += 1
      }
      java.lang.Long.valueOf(s)
    }
    // rank-1 of (d2 ASC NULLS LAST, cid ASC) per vector
    def assign(cents: Array[(Any, Long, Array[java.lang.Long])])
        : Array[((Any, Long, Array[java.lang.Long]), (Any, Long))] =
      vecs.flatMap { v =>
        var bestC: (Any, Long) = null
        var bestD: java.lang.Long = null
        cents.foreach { case (corig, cl, cq) =>
          val d = d2(v._3, cq)
          val better =
            if (bestC == null) true
            else if (d == null && bestD == null) cl < bestC._2
            else if (d == null) false
            else if (bestD == null) true
            else if (d.longValue != bestD.longValue) d.longValue < bestD.longValue
            else cl < bestC._2
          if (better) { bestC = (corig, cl); bestD = d }
        }
        if (bestC == null) None else Some((v, bestC))
      }
    def update(asg: Array[((Any, Long, Array[java.lang.Long]), (Any, Long))])
        : Array[(Any, Long, Array[java.lang.Long])] =
      asg.groupBy(_._2._2).toArray.sortBy(_._1).map { case (_, members) =>
        val (corig, cl) = members.head._2
        val qs = members.map(_._1._3)
        val len = qs.map(_.length).max
        val c = new Array[java.lang.Long](len)
        var p = 0
        while (p < len) {
          var sm = 0L
          var any = false
          var cnt = 0L
          qs.foreach { q =>
            if (p < q.length) {
              cnt += 1
              // addExact: the distributed plan's ANSI sum aborts loudly on
              // long overflow; the driver replica must not silently wrap
              // where the plan it stands in for would have thrown
              if (q(p) != null) { any = true; sm = Math.addExact(sm, q(p).longValue) }
            }
          }
          c(p) = if (!any) null else java.lang.Long.valueOf(sm / cnt)
          p += 1
        }
        (corig, cl, c)
      }

    var asg = assign(seeds)
    for (_ <- 0 until iters) asg = assign(update(asg))
    val spark = e.sparkSession
    val out = asg.map { case (v, (corig, _)) =>
      org.apache.spark.sql.Row(v._1, corig)
    }
    val schema = StructType(Seq(
      StructField("vid", vidType, nullable = true),
      StructField("cid", vidType, nullable = true)))
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq,
        GraphOps.sliceCount(out.length, spark)), schema))
  }

  /** SemDeDup semantic dedup: k-means cluster the corpus, score only
    * WITHIN-cluster pairs with the exact quantized-cosine decision rule
    * (`dot * thrDen >= |a| * |b| * thrNum`, the q23 arithmetic), and drop
    * the higher id of every pair above the threshold. Returns survivors
    * as (vid, cid). The "K ∝ corpus size" SemDeDup contract bounds the
    * AVERAGE cluster, but near-duplicate mass is exactly what clusters —
    * so the pair stage additionally carries the house per-bucket cap
    * (VERDICT r5 #1; same pattern as [[ivfTopK]]'s member cap): a
    * deterministic row_number over cid keeps at most `pairCap` members per
    * cluster for PAIR GENERATION, bounding the self-join at pairCap²/2 rows
    * per cluster no matter how degenerate the clustering. Members beyond
    * the cap take part in no pair, so they always survive — the
    * conservative direction for a dedup (never drops extra documents).
    * Scoring stays the narrow [[QuantDot]]/[[QuantNorm]] pass over two
    * id-keyed array fetches, same as q23. */
  def semDedup(df: DataFrame, id: String, emb: String, seedStride: Int,
               iters: Int, thrNum: Int, thrDen: Int,
               pairCap: Int = 1024): DataFrame = {
    val asg = kmeansAssign(df, id, emb, seedStride, iters)
    val withNorm = df.filter(size(col(emb)) > 0)
      .select(col(id).as("vid"), col(emb).as("_e"), QuantNorm(col(emb)).as("nrm"))
    val pairs = cappedClusterPairs(asg, pairCap)
    val drops = pairs
      .join(withNorm.select(col("vid").as("a"), col("_e").as("_ea"), col("nrm").as("na")), "a")
      .join(withNorm.select(col("vid").as("b"), col("_e").as("_eb"), col("nrm").as("nb")), "b")
      .filter(QuantDot(col("_ea"), col("_eb")) * thrDen >= col("na") * col("nb") * thrNum)
      .select(col("b").as("vid")).distinct()
    asg.join(drops, Seq("vid"), "left_anti")
  }

  /** Within-cluster candidate pairs (a < b) of a (vid, cid) assignment,
    * cluster membership capped at `cap` rows (deterministic vid order) for
    * the pair stage — the [[semDedup]] quadratic guard, factored out so the
    * skewed-cluster spec can pin the pair bound directly. */
  private[graft] def cappedClusterPairs(asg: DataFrame, cap: Int): DataFrame = {
    val cw = Window.partitionBy(col("cid")).orderBy(col("vid"))
    val kept = asg.withColumn("rn", row_number().over(cw))
      .filter(col("rn") <= cap).select(col("vid"), col("cid"))
    kept.as("x").join(kept.as("y"),
        col("x.cid") === col("y.cid") && col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("a"), col("y.vid").as("b"))
  }

  /** true float cosine similarity between two embedding columns (per-row;
    * zip_with + aggregate keep the summation order deterministic per row) */
  def cosine(a: Column, b: Column): Column = {
    val dot = expr(s"aggregate(zip_with(${a.toString}, ${b.toString}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)")
    val na = expr(s"sqrt(aggregate(${a.toString}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))")
    val nb = expr(s"sqrt(aggregate(${b.toString}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))")
    dot / (na * nb)
  }
}
