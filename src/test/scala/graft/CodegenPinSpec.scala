package graft

import graft.analytics.Battery
import graft.functions.{BandedSig, Fnv64, QuantDot, QuantL2, QuantNorm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Every native expression must actually COMPILE under codegen — not pass by
  * silently falling back to interpreted evaluation. Spark's default
  * `spark.sql.codegen.factoryMode=FALLBACK` swallows Janino failures (round 3
  * shipped 710 `CodeGenerator: Failed to compile` errors while the whole
  * suite stayed green), so these tests pin the codegen path hard:
  * CODEGEN_ONLY turns any `doGenCode` miscompile into a test failure.
  *
  * The second half re-runs the ANN battery queries whose hot scoring loop is
  * built from these expressions, so the pin covers the expressions *in situ*
  * (inside the real projections/joins), not just in isolation.
  */
class CodegenPinSpec extends SparkTestBase {

  private def withCodegenOnly[A](body: => A): A = {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(spark.conf.set("spark.sql.codegen.factoryMode", _))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  private def withInterpretedOnly[A](body: => A): A = {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(spark.conf.set("spark.sql.codegen.factoryMode", _))
  }

  /** adversarial embedding rows: normals, NaN/Inf, out-of-long-range,
    * per-element nulls, empty array, all-null array, null array */
  private def probe: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Some(Seq[java.lang.Float](0.9f, -0.4f, 0.2f, -0.7f, 0.1f, 0.6f, -0.3f, 0.8f))),
      (2L, Some(Seq[java.lang.Float](Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity, 1e30f, -1e30f, 0.0f, -0.0f, 0.0010000001f))),
      (3L, Some(Seq[java.lang.Float](null, 1.5f, null, -2.5f, null, null, null, null))),
      (4L, Some(Seq.empty[java.lang.Float])),
      (5L, Some(Seq[java.lang.Float](null, null, null, null, null, null, null, null))),
      (6L, None: Option[Seq[java.lang.Float]])
    ).toDF("id", "emb").select(col("id"), col("emb").cast("array<float>").as("emb"))
  }

  test("Quant/BandedSig/Fnv64 compile under CODEGEN_ONLY and match interpreted results") {
    def run(): Array[(Long, Any, Any, Any, Any, Any)] = {
      val a = probe.as("a")
      val b = probe.withColumnRenamed("emb", "emb2").as("b")
      a.join(b, col("a.id") === col("b.id"))
        .select(
          col("a.id"),
          QuantDot(col("a.emb"), col("b.emb2")).as("qd"),
          QuantL2(col("a.emb"), col("b.emb2")).as("ql2"),
          QuantNorm(col("a.emb")).as("qn"),
          BandedSig(col("a.emb"), 4, 8, 8).as("sig"),
          Fnv64(col("a.id").cast("string")).as("h"))
        .collect()
        .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5)))
        .sortBy(_._1)
    }
    val compiled = withCodegenOnly(run())
    val interpreted = withInterpretedOnly(run())
    assert(compiled.length == 6)
    compiled.zip(interpreted).foreach { case (c, i) =>
      assert(c == i, s"codegen/interpreted divergence for id=${c._1}: $c vs $i")
    }
    // sanity: the adversarial rows exercise the NULL-iff-no-usable-position rule
    val byId = compiled.map(t => t._1 -> t).toMap
    assert(byId(4L)._2 == null && byId(5L)._2 == null && byId(6L)._2 == null,
      "empty/all-null/null arrays must score NULL")
    assert(byId(1L)._2 != null && byId(3L)._2 != null)
  }

  test("ANN battery queries execute fully codegen'd (no silent fallback)") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    withCodegenOnly {
      for (q <- Seq("q23_dedup_embcos", "q27_ann_lsh_banded", "q28_ann_ivf", "q30_ivf_assign", "q15_ann_dot_topk")) {
        val n = Battery.queries(q)(spark, sf).collect().length
        assert(n >= 0, s"$q must run under CODEGEN_ONLY")
      }
    }
  }

  test("QuantL2Q matches the composed zip_with/aggregate fold (codegen + interpreted)") {
    import spark.implicits._
    // pre-quantized long arrays: equal/unequal lengths, per-element nulls,
    // empties, null arrays — the composed form's NULL rules must carry over
    // (length mismatch or ANY null element → NULL; two empties → 0)
    val rows = Seq(
      (1L, Some(Seq[java.lang.Long](900L, -400L, 200L)), Some(Seq[java.lang.Long](100L, 0L, -300L))),
      (2L, Some(Seq[java.lang.Long](900L, -400L)), Some(Seq[java.lang.Long](100L, 0L, -300L))),
      (3L, Some(Seq[java.lang.Long](900L, null, 200L)), Some(Seq[java.lang.Long](100L, 0L, -300L))),
      (4L, Some(Seq.empty[java.lang.Long]), Some(Seq.empty[java.lang.Long])),
      (5L, None: Option[Seq[java.lang.Long]], Some(Seq[java.lang.Long](1L))))
      .toDF("id", "qa", "qb")
      .select(col("id"), col("qa").cast("array<bigint>").as("qa"),
        col("qb").cast("array<bigint>").as("qb"))
    def run(): Array[(Long, Any, Any)] = rows.select(col("id"),
        graft.functions.QuantL2Q(col("qa"), col("qb")).as("n"),
        expr("aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)").as("c"))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).sortBy(_._1)
    val compiled = withCodegenOnly(run())
    val interpreted = withInterpretedOnly(run())
    compiled.zip(interpreted).foreach { case (c, i) =>
      assert(c == i, s"codegen/interpreted divergence: $c vs $i")
    }
    compiled.foreach { case (id, native, composed) =>
      assert(native == composed, s"id=$id: QuantL2Q=$native but composed fold=$composed")
    }
    val byId = compiled.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 != null && byId(4L)._2 == 0L, "equal-length and empty rows must score")
    assert(byId(2L)._2 == null && byId(3L)._2 == null && byId(5L)._2 == null,
      "mismatch/null-element/null-array rows must be NULL")
  }

  test("distributed k-means assignment executes fully codegen'd") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    withCodegenOnly {
      val df = spark.read.parquet(s"$sf/embeddings.parquet")
      val n = graft.functions.AnnOps.kmeansAssign(df, "vec_id", "embedding",
        50, 1, smallCap = -1L).collect().length
      assert(n >= 0, "distributed kmeansAssign must run under CODEGEN_ONLY")
    }
  }
}
