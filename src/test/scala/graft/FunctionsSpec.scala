package graft

import graft.functions.{AnnOps, Fnv64, GraftExtensions, TextOps}
import graft.operators.Emitter
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {

  test("Fnv64 expression matches the emitter's hash, interpreted and codegen") {
    import spark.implicits._
    val inputs = Seq("", "a", "IfcWall_42", "x" * 1000, "üñïçødé \u0000")
    // codegen path: whole-stage codegen over a DataFrame
    val df = inputs.toDF("s").select(col("s"), Fnv64(col("s")).as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s => assert(got(s) == Emitter.fnv64(s), s"mismatch for '$s'") }
  }

  test("graft_fnv64 registers as a SQL function via SparkSessionExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT graft_fnv64('IfcWall_42') AS h").collect().head.getLong(0)
    assert(r == Emitter.fnv64("IfcWall_42"))
  }

  test("graft_banded_sig SQL function agrees with the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val vecs = Seq((0L, Array(0.9f, -0.4f, 0.2f, -0.7f, 0.1f, 0.6f, -0.3f, 0.8f)))
      .toDF("vec_id", "embedding")
    vecs.createOrReplaceTempView("bsig_probe")
    val viaSql = spark.sql(
      "SELECT graft_banded_sig(embedding, 2, 4, 8) AS sig FROM bsig_probe")
      .collect().head.getSeq[Long](0)
    val viaApi = vecs.select(graft.functions.BandedSig(col("embedding"), 2, 4, 8).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaApi && viaSql.length == 2)
    // the quantized scoring primitives are registered too
    val qd = spark.sql(
      "SELECT graft_quant_dot(embedding, embedding) AS d, graft_quant_norm(embedding) AS n " +
        "FROM bsig_probe").collect().head
    val qdApi = vecs.select(
      graft.functions.AnnOps.quantDot(col("embedding"), col("embedding")),
      graft.functions.AnnOps.quantNorm(col("embedding"))).collect().head
    assert(qd.getLong(0) == qdApi.getLong(0) && qd.getLong(1) == qdApi.getLong(1))
    // shape params must be literals
    val e = intercept[Exception](spark.sql(
      "SELECT graft_banded_sig(embedding, vec_id, 4, 8) FROM bsig_probe").collect())
    assert(e.getMessage != null)
  }

  test("TextOps near-dup stack finds planted duplicates") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base),                             // exact dup
      (3L, base.replace("lazy", "sleepy")),   // near dup
      (4L, "completely different words entirely unrelated content here now ok")
    ).toDF("id", "text")
    val exact = TextOps.exactDuplicates(docs, "id", "text").where("n > 1").collect()
    assert(exact.length == 1 && exact.head.getAs[Long]("canonical") == 1L)
    val sh = TextOps.shingleHashes(docs, "id", "text")
    val pairs = TextOps.minhashPairs(sh, graft.analytics.Battery.MinhashParams)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val fp = TextOps.fingerprint(docs, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(4L))
  }

  test("MediaOps: binary payload plumbing with deterministic stub features") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("id", "text")
    val withPayload = graft.functions.MediaOps.attachPayload(docs, "id", "text")
    val feats = graft.functions.MediaOps.decodeStub(withPayload)(spark).collect()
      .map(f => f.id -> f).toMap
    assert(feats(1L).meta.n_bytes == 11)
    assert(feats(1L).meta.head_hex == "68656c6c") // "hell"
    assert(feats(1L).feature.length == 8)
    assert(feats(2L).feature.forall(_ == 0f))
    // deterministic across runs
    val again = graft.functions.MediaOps.decodeStub(withPayload)(spark).collect()
      .map(f => f.id -> f.feature.toSeq).toMap
    assert(again(1L) == feats(1L).feature.toSeq)
  }

  test("AnnOps brute force and LSH agree on self-similar vectors") {
    import spark.implicits._
    val a = Array(1.0f, 0.0f, 0.5f, 0.2f, 1.0f, 0.0f, 0.5f, 0.2f)
    val vecs = Seq(
      (0L, a),
      (1L, a.clone()), // exact duplicate — identical signature in ANY band
      (2L, Array(-1.0f, -0.5f, -0.2f, -0.1f, -1.0f, -0.5f, -0.2f, -0.1f))
    ).toDF("vec_id", "embedding")
    val bf = AnnOps.bruteForceTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, 1).collect()
    assert(bf.head.getAs[Long]("c") == 1L)
    // single-table LSH = the banded path at nBands = 1
    val lsh = AnnOps.bandedTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, 1,
      nBands = 1, bitsPerBand = 8, dims = 8, cap = 64).collect()
    assert(lsh.head.getAs[Long]("c") == 1L) // the duplicate shares the bucket
    val cos = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        AnnOps.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .where("a.vec_id = 0 and b.vec_id = 0").collect().head.getDouble(2)
    assert(math.abs(cos - 1.0) < 1e-9)
  }

  test("AnnOps banded sign-LSH: identical vectors always collide, cap bounds buckets") {
    import spark.implicits._
    val dims = 8
    val a = Array(1.0f, -0.3f, 0.5f, 0.2f, -1.0f, 0.1f, 0.5f, -0.2f)
    val vecs = (
      Seq(0L -> a, 1L -> a.clone()) ++ // exact duplicate pair
        (2L to 40L).map(i => i -> Array.tabulate(dims)(d =>
          (((i * 31 + d * 17) % 7).toFloat - 3f) / 3f)) // filler cloud
      ).toDF("vec_id", "embedding")

    // identical vectors share every (band, bucket) => always candidates
    val cand = AnnOps.bandedCandidatePairs(vecs, "vec_id", "embedding",
      nBands = 4, bitsPerBand = 4, dims = dims, cap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)))

    // per-bucket cap: with cap = c, each (band, bucket) contributes at most
    // c*(c-1)/2 pairs; total candidates must shrink monotonically with cap
    val full = AnnOps.bandedCandidatePairs(vecs, "vec_id", "embedding", 4, 4, dims, 64).count()
    val capped = AnnOps.bandedCandidatePairs(vecs, "vec_id", "embedding", 4, 4, dims, 2).count()
    assert(capped <= full)
    // candidates are a subset of all pairs (sanity: no fabricated ids)
    assert(cand.forall { case (x, y) => x < y && x >= 0 && y <= 40 })

    // bandedTopK ranks the exact duplicate first for the query
    val top = AnnOps.bandedTopK(vecs, "vec_id", "embedding",
      col("vec_id") === 0, 1, 4, 4, dims, 64).collect()
    assert(top.head.getAs[Long]("c") == 1L)

    // signature is deterministic across evaluations
    val s1 = AnnOps.bandedSignature(vecs, "vec_id", "embedding", 4, 4, dims)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val s2 = AnnOps.bandedSignature(vecs, "vec_id", "embedding", 4, 4, dims)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(s1 == s2)
  }

  test("minhashSig narrow signature matches the exploded min per hash function") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val params = graft.analytics.Battery.MinhashParams
    val narrow = TextOps.minhashSig(docs, "doc_id", "text", params)
      .collect().map(r => r.get(0) -> (1 to params.size).map(r.getLong).toSeq).toMap
    // relational reference: explode distinct shingle hashes, min per function
    val sh = TextOps.shingleHashes(docs, "doc_id", "text")
    val rel = sh.groupBy(col("doc"))
      .agg(params.zipWithIndex.map { case ((a, b), i) =>
        min((lit(a) * col("h") + lit(b)) % lit(4294967291L)).as(s"mh$i") }.head,
        params.zipWithIndex.drop(1).map { case ((a, b), i) =>
          min((lit(a) * col("h") + lit(b)) % lit(4294967291L)).as(s"mh$i") }: _*)
      .collect().map(r => r.get(0) -> (1 to params.size).map(r.getLong).toSeq).toMap
    assert(narrow == rel)
  }

  test("ShingleHashes/AffineMinMod match the composed HOF forms (incl null tokens)") {
    import spark.implicits._
    // adversarial token arrays (size >= n contract): null tokens (concat_ws
    // skips them), duplicate shingles (first-occurrence dedup), unicode,
    // single-char and empty-ish windows; plus a null array row
    val rows = Seq(
      (1L, Some(Seq[String]("a", "b", "c", "a", "b", "c", "a", "b", "c"))),
      (2L, Some(Seq[String]("x", null, "y", "z", null, "x", "y"))),
      (3L, Some(Seq[String](null, null, null, "q"))),
      (4L, Some(Seq[String]("ü", "中", "é", "ü", "中", "é"))),
      (5L, Some(Seq[String]("t1", "t2", "t3"))),
      (6L, None: Option[Seq[String]]))
      .toDF("id", "tk").select(col("id"), col("tk").cast("array<string>").as("tk"))
      .filter(col("tk").isNull || size(col("tk")) >= 3)
    val composedHs = transform(TextOps.shingleSet(col("tk"), 3), s => TextOps.h32Composed(s))
    val params = Seq((1000003L, 17L), (998244353L, 5L), (3L, 0L))
    val got = rows.select(col("id") +: (graft.functions.ShingleHashes(col("tk"), 3).as("hs") +:
        params.map { case (a, b) => graft.functions.AffineMinMod(
          graft.functions.ShingleHashes(col("tk"), 3), a, b, 4294967291L) }): _*)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4)))
    val want = rows.select(col("id") +: (composedHs.as("hs") +:
        params.map { case (a, b) =>
          array_min(transform(composedHs, h => (lit(a) * h + lit(b)) % lit(4294967291L))) }): _*)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4)))
    got.zip(want).foreach { case (g, w) => assert(g == w, s"native $g != composed $w") }
    // ShingleArray (raw gram strings, duplicates + empties preserved) vs the
    // composed shingles() HOF chain on the same adversarial arrays
    val gotArr = rows.select(col("id"), graft.functions.ShingleArray(col("tk"), 3))
      .collect().map(r => (r.getLong(0), r.get(1)))
    val wantArr = rows.select(col("id"), TextOps.shingles(col("tk"), 3))
      .collect().map(r => (r.getLong(0), r.get(1)))
    gotArr.zip(wantArr).foreach { case (g, w) => assert(g == w, s"native $g != composed $w") }
    // strided form (the q71 fixed-chunk split) vs the composed
    // transform/sequence/slice/array_join chain, window width 2 / stride 2
    val gotChunk = rows.filter(col("tk").isNotNull)
      .select(col("id"), graft.functions.ShingleArray(col("tk"), 2, 2))
      .collect().map(r => (r.getLong(0), r.get(1)))
    val wantChunk = rows.filter(col("tk").isNotNull)
      .select(col("id"), expr("transform(sequence(0, size(tk) div 2 - 1), " +
        "i -> array_join(slice(tk, i*2+1, 2), ' '))"))
      .collect().map(r => (r.getLong(0), r.get(1)))
    gotChunk.zip(wantChunk).foreach { case (g, w) => assert(g == w, s"native $g != composed $w") }
  }

  test("Tokens byte scan matches the composed split+filter chain") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some("a b c")), (2L, Some("  leading  and   runs ")), (3L, Some("")),
      (4L, Some("   ")), (5L, Some("one")), (6L, Some("ü 中文  é")),
      (7L, None: Option[String]), (8L, Some("tab\tstays one token")),
      (9L, Some("x " * 5000)))
      .toDF("id", "s")
    val got = rows.select(col("id"), TextOps.tokens(col("s")))
      .collect().map(r => (r.getLong(0), r.get(1)))
    val want = rows.select(col("id"), TextOps.tokensComposed(col("s")))
      .collect().map(r => (r.getLong(0), r.get(1)))
    got.zip(want).foreach { case (g, w) => assert(g == w, s"native $g != composed $w") }
  }

  test("BandedSig narrow signature is bit-identical to the relational build") {
    // the real sf embeddings exercise quantization edge cases (negative
    // values, float rounding near integers) far better than synthetic rows
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def sigSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val narrow = sigSet(AnnOps.bandedSignature(emb, "vec_id", "embedding", 16, 8, 64))
    val relational = sigSet(AnnOps.bandedSignatureRelational(emb, "vec_id", "embedding", 16, 8, 64))
    assert(narrow == relational)
  }

  test("quantDot/quantNorm narrow expressions match the exploded quantized path") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").filter(col("vec_id") < 50)
    // exploded reference: join two quantized streams on pos, sum products
    val el = AnnOps.quantized(emb, "vec_id", "embedding")
    val refDots = el.select(col("vid").as("a"), col("pos"), col("ei").as("ea"))
      .join(el.select(col("vid").as("b"), col("pos"), col("ei").as("eb")), Seq("pos"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("ea") * col("eb")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val narrow = emb.select(col("vec_id").as("a"), col("embedding").as("_ea"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("_eb")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), AnnOps.quantDot(col("_ea"), col("_eb")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(narrow == refDots)
    val refNorms = el.groupBy(col("vid")).agg(
      floor(sqrt(sum(col("ei") * col("ei")).cast("double"))).cast("long").as("nrm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val narrowNorms = emb.select(col("vec_id"), AnnOps.quantNorm(col("embedding")).as("nrm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(narrowNorms == refNorms)
  }

  test("BandedSig == relational build on adversarial floats (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // finite adversarial values (±0, subnormals, near-integer products) never
    // appear in the committed test tables — the property pins that the native
    // expression and the relational path agree on them. NaN/±Inf are excluded
    // HERE because the paths deliberately differ there: under ANSI mode the
    // relational CAST(Infinity AS BIGINT) ABORTS the job, while BandedSig
    // saturates like a Java cast (total function — one garbage embedding must
    // not kill a 10^12-row run); the next test pins that totality.
    val special = Gen.oneOf(-0.0f, 0.0f, Float.MinPositiveValue,
      0.0009999999f, -0.0010000001f, 123.4567f, -999.999f)
    val anyF = Gen.frequency(3 -> Gen.choose(-2.0f, 2.0f), 1 -> special)
    val vecGen = Gen.listOfN(8, anyF).map(_.toArray)
    val prop = Prop.forAll(Gen.listOfN(6, vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      def sigSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // the native quantized scorers must agree with the composed-builtins
      // forms on the same adversarial floats (q23's decision rule inputs)
      val scores = df.as("a").crossJoin(df.as("b"))
        .select(
          AnnOps.quantDot(col("a.embedding"), col("b.embedding")).as("nd"),
          AnnOps.quantDotComposed(col("a.embedding"), col("b.embedding")).as("cd"),
          AnnOps.quantNorm(col("a.embedding")).as("nn"),
          AnnOps.quantNormComposed(col("a.embedding")).as("cn"))
        .collect()
      scores.forall(r => r.get(0) == r.get(1) && r.get(2) == r.get(3)) &&
      (sigSet(AnnOps.bandedSignature(df, "vec_id", "embedding", 2, 4, 8)) ==
        sigSet(AnnOps.bandedSignatureRelational(df, "vec_id", "embedding", 2, 4, 8)))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("BandedSig is total on NaN/Infinity (garbage embeddings cannot abort a job)") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity, 1f, 0f, -1f, 2f, -2f)),
      (1L, Array.fill(8)(Float.NaN))
    ).toDF("vec_id", "embedding")
    // must not throw; NaN elements quantize to 0, ±Inf saturate like a Java
    // long cast — deterministic buckets either way
    val sig = AnnOps.bandedSignature(vecs, "vec_id", "embedding", 2, 4, 8).collect()
    assert(sig.length == 4) // 2 vecs × 2 bands
    val again = AnnOps.bandedSignature(vecs, "vec_id", "embedding", 2, 4, 8).collect()
    assert(sig.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("float*int coerces to DOUBLE (the arithmetic the native quantizers mirror)") {
    import spark.implicits._
    // QuantOps.qz / BandedSig widen to double before multiplying because
    // Spark 4's ANSI coercion types float*int as DOUBLE (and DuckDB agrees).
    // If this session ever ran with the legacy tightest-common-type rule
    // (float multiply), the relational builds and oracles would round
    // differently near integer boundaries — catch that here, not in a
    // hash-mismatch three layers up.
    val t = Seq(0.5f).toDF("x").select(col("x") * lit(1000)).schema.head.dataType
    assert(t == org.apache.spark.sql.types.DoubleType,
      s"float*int coerced to $t — native quantizers assume DOUBLE (ANSI rule)")
    // and the value-level consequence on a boundary float:
    val q = Seq(-0.0010000001f).toDF("x")
      .select(floor(col("x") * lit(1000)).cast("long")).collect().head.getLong(0)
    assert(q == -2L && graft.functions.QuantOps.qz(-0.0010000001f) == -2L)
  }

  test("quantDot/quantNorm are NULL on all-NULL or empty arrays (SQL SUM semantics)") {
    import spark.implicits._
    // the relational build and the DuckDB oracle compute SUM over a pos-join:
    // an all-NULL (or empty) array yields NULL, and a NULL score FAILS the
    // q23 threshold filter. The narrow path must agree, or a pair of garbage
    // embeddings would score dot=0, na=nb=0 and pass 0 >= 0.
    val rows = Seq(
      (0L, Array[java.lang.Float](null, null, null, null)),
      (1L, Array[java.lang.Float](null, null, null, null)),
      (2L, Array[java.lang.Float]()),
      (3L, Array[java.lang.Float](1.0f, null, 2.0f, null))
    ).toDF("vec_id", "embedding")
    // the native expression and the composed-builtins cross-check must agree
    // on every edge case (native is the production path)
    for (dot <- Seq(AnnOps.quantDot _, AnnOps.quantDotComposed _)) {
      val out = rows.as("a").crossJoin(rows.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
          dot(col("a.embedding"), col("b.embedding")).as("dot"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2))).toMap
      assert(out((0L, 1L)).isEmpty)            // all-NULL x all-NULL -> NULL
      assert(out((0L, 2L)).isEmpty)            // vs empty -> NULL
      assert(out((0L, 3L)).isEmpty)            // null positions meet non-null -> still no usable product
      assert(out((1L, 3L)).isEmpty)
      // mixed arrays with >= 1 aligned non-null position still score
      val d33 = rows.filter(col("vec_id") === 3)
        .select(dot(col("embedding"), col("embedding"))).collect().head.getLong(0)
      assert(d33 == 1000L * 1000L + 2000L * 2000L)
    }
    for (nrm <- Seq(AnnOps.quantNorm _, AnnOps.quantNormComposed _)) {
      val norms = rows.select(col("vec_id"), nrm(col("embedding")).as("n"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(norms(0L).isEmpty && norms(2L).isEmpty)
      assert(norms(3L).contains(2236L)) // floor(sqrt(1000^2 + 2000^2))
    }
    // NaN / ±Inf positions are usable (quantize to 0), not job-aborting
    val garbage = Seq((9L, Array(Float.NaN, Float.PositiveInfinity, 1.5f))).toDF("vec_id", "embedding")
    val g = garbage.select(
      AnnOps.quantDot(col("embedding"), col("embedding")).as("d"),
      AnnOps.quantNorm(col("embedding")).as("n")).collect().head
    assert(g.getLong(0) == 1500L * 1500L && g.getLong(1) == 1500L)
  }

  test("IVF: an all-NULL-element centroid ranks last (NULLS LAST like the oracle), not first") {
    import spark.implicits._
    // Spark's plain ASC window ordering is NULLS FIRST; the DuckDB oracle's
    // ORDER BY d2 ASC is NULLS LAST. Without asc_nulls_last a garbage
    // centroid whose distances are all NULL would win arank 1 for EVERY
    // vector, capturing the whole corpus into one capped list.
    val dims = 8
    val a = Array(1.0f, -0.3f, 0.5f, 0.2f, -1.0f, 0.1f, 0.5f, -0.2f)
    val nullVec: Array[java.lang.Float] = Array.fill[java.lang.Float](dims)(null)
    val rows: Seq[(Long, Array[java.lang.Float])] =
      Seq(0L -> a.map(java.lang.Float.valueOf), 6L -> a.map(java.lang.Float.valueOf)) ++
        (1L to 5L).map(i => i -> Array.tabulate(dims)(d =>
          java.lang.Float.valueOf((((i * 31 + d * 17) % 7).toFloat - 3f) / 3f))) ++
        Seq(10L -> nullVec) ++ // a CENTROID position (10 % 10 == 0), all-NULL
        (11L to 30L).filter(_ != 20).map(i => i -> Array.tabulate(dims)(d =>
          java.lang.Float.valueOf((((i * 13 + d * 29) % 11).toFloat - 5f) / 5f))) ++
        Seq(20L -> Array.tabulate(dims)(d =>
          java.lang.Float.valueOf((((20 * 13 + d * 29) % 11).toFloat - 5f) / 5f)))
    val vecs = rows.toDF("vec_id", "embedding")
    // with NULLS FIRST the garbage centroid's NULL distance would beat every
    // real distance and win arank 1 for EVERY vector; with the oracle's
    // NULLS LAST it must win none (vectors with at least one real centroid
    // distance always prefer the real one)
    val nearest = AnnOps.ivfAssign(vecs, "vec_id", "embedding", 10, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!nearest.exists { case (vid, cid) => cid == 10L && vid != 10L },
      s"garbage centroid 10 captured real vectors: $nearest")
    assert(nearest(0L) == 0L && nearest(6L) == 0L) // the duplicate pair shares its real list
  }

  test("AnnOps IVF: exact duplicate lands in the same list and ranks first") {
    import spark.implicits._
    val dims = 8
    val a = Array(1.0f, -0.3f, 0.5f, 0.2f, -1.0f, 0.1f, 0.5f, -0.2f)
    val vecs = (
      Seq(0L -> a.clone(), 6L -> a.clone()) ++ // duplicate pair, non-seed ids
        (1L to 5L).map(i => i -> Array.tabulate(dims)(d =>
          (((i * 31 + d * 17) % 7).toFloat - 3f) / 3f)) ++
        (7L to 30L).map(i => i -> Array.tabulate(dims)(d =>
          (((i * 13 + d * 29) % 11).toFloat - 5f) / 5f))
      ).toDF("vec_id", "embedding")

    // stride 10 => centroids {0,10,20,30}; identical vectors get identical
    // integer L2 to every centroid => same assignment => same inverted list
    val top = AnnOps.ivfTopK(vecs, "vec_id", "embedding",
      col("vec_id") === 0, 1, seedStride = 10, nProbe = 2, cap = 64).collect()
    assert(top.head.getAs[Long]("c") == 6L)

    // per-list cap only ever shrinks the candidate set
    val full = AnnOps.ivfTopK(vecs, "vec_id", "embedding", col("vec_id") < 5, 100, 10, 2, 64).count()
    val capped = AnnOps.ivfTopK(vecs, "vec_id", "embedding", col("vec_id") < 5, 100, 10, 2, 2).count()
    assert(capped <= full)

    // deterministic across evaluations
    val r1 = AnnOps.ivfTopK(vecs, "vec_id", "embedding", col("vec_id") < 5, 3, 10, 2, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val r2 = AnnOps.ivfTopK(vecs, "vec_id", "embedding", col("vec_id") < 5, 3, 10, 2, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(r1 == r2)
  }
}
