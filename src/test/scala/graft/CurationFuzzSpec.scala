package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property fuzz for the corpus-curation battery (q63-q66): random small-
  * vocabulary corpora (forcing gram collisions, repeats and ties) run
  * through the REAL battery queries on a parquet table, compared against
  * independent brute-force evaluators written directly from each op's
  * definition (sliding-window grams, multiplicity counts, sorted-list
  * median, tf-idf sort). One corpus per case exercises all four ops. */
class CurationFuzzSpec extends SparkTestBase {

  private type Doc = (Long, String, String, String, Long) // id, text, lang, source, n_chars

  private def toksOf(text: String): Seq[String] = text.split(" ").filter(_.nonEmpty).toSeq

  private def grams(ws: Seq[String], n: Int): Seq[String] =
    if (ws.size < n) Seq.empty else ws.sliding(n).map(_.mkString(" ")).toSeq

  // ---- brute-force evaluators (no Spark, no shared code with Battery) ----

  private def bruteQ63(docs: Seq[Doc]): Set[(Long, String)] = {
    val ev = docs.filter(_._1 % 97 == 0).flatMap(d => grams(toksOf(d._2), 5)).toSet
    docs.filter(_._1 % 97 != 0)
      .filter(d => grams(toksOf(d._2), 5).forall(g => !ev.contains(g)))
      .map(d => (d._1, d._3)).toSet
  }

  private def bruteQ64(docs: Seq[Doc]): Set[(Long, Long, Long, Long, Long, Boolean)] =
    docs.flatMap { d =>
      val ws = toksOf(d._2)
      if (ws.size < 2) None // no 2-gram row -> inner join drops the doc
      else {
        val g2 = grams(ws, 2)
        val n2 = g2.size.toLong
        val dup2 = n2 - g2.distinct.size
        val n1 = ws.size.toLong
        val topN = ws.groupBy(identity).values.map(_.size).max.toLong
        Some((d._1, n1, topN, n2, dup2, dup2 * 5 <= n2 && topN * 5 <= n1))
      }
    }.toSet

  private def bruteQ65(docs: Seq[Doc]): Set[(String, Long, Long, Long, Long, Long)] =
    docs.groupBy(_._3).map { case (lang, ds) =>
      val lens = ds.map(_._5).sorted
      val n = lens.size
      val medianLo = lens((n + (n % 2)) / 2 - 1)
      (lang, n.toLong, ds.map(d => toksOf(d._2).size.toLong).sum,
        lens.head, lens.last, medianLo)
    }.toSet

  private def bruteQ66(docs: Seq[Doc]): Set[(Long, String, Long, Long, Long, Int)] = {
    val n = docs.size.toLong
    val tf = docs.flatMap(d => toksOf(d._2).groupBy(identity).map {
      case (w, occ) => (d._1, w, occ.size.toLong) })
    val df = tf.groupBy(_._2).map { case (w, rows) => w -> rows.size.toLong }
    tf.groupBy(_._1).flatMap { case (id, rows) =>
      rows.map { case (_, w, f) => (w, f, df(w), f * ((n * 1000) / df(w))) }
        .sortBy { case (w, _, _, score) => (-score, w) }
        .take(3).zipWithIndex
        .map { case ((w, f, d, score), i) => (id, w, f, d, score, i + 1) }
    }.toSet
  }

  // ---- generator: small vocab + short docs force collisions and ties ----

  private val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")

  private val docGen: Gen[(String, String)] = for {
    len <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.choose(1, 4), 3 -> Gen.choose(5, 14))
    ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    lang <- Gen.oneOf("en", "fr", "zh")
  } yield (ws.mkString(" "), lang)

  private val corpusGen: Gen[Seq[Doc]] = for {
    k <- Gen.choose(2, 10)
    base <- Gen.listOfN(k, docGen)
    extraEval <- Gen.option(docGen) // a second eval doc at id 97
  } yield {
    val b = base.zipWithIndex.map { case ((t, l), i) =>
      (i.toLong, t, l, s"s$i", t.length.toLong) }
    extraEval.fold(b)(d => b :+ ((97L, d._1, d._2, "s97", d._1.length.toLong)))
  }

  test("q63-q66 match brute-force evaluators on random corpora") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(corpusGen) { docs =>
      val dir = Files.createTempDirectory("curfuzz").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      def run(q: String) = graft.analytics.Battery.queries(q)(spark, dir).collect()

      val got63 = run("q63_decontaminate").map(r => (r.getLong(0), r.getString(1))).toSet
      val got64 = run("q64_repetition").map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      val got65 = run("q65_corpus_stats").map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      val got66 = run("q66_tfidf_topk").map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toSet

      val checks = Seq(
        ("q63", got63 == bruteQ63(docs), got63, bruteQ63(docs)),
        ("q64", got64 == bruteQ64(docs), got64, bruteQ64(docs)),
        ("q65", got65 == bruteQ65(docs), got65, bruteQ65(docs)),
        ("q66", got66 == bruteQ66(docs), got66, bruteQ66(docs)))
      checks.find(!_._2) match {
        case Some((q, _, got, want)) =>
          println(s"$q MISMATCH\nDOCS: $docs\nGOT:  $got\nWANT: $want"); false
        case None => true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- q80 exact-substring spans: 3-word vocab so cross-doc 5-gram ----
  // ---- collisions are common (3^5 = 243 possible grams)            ----

  private def bruteQ80(docs: Seq[Doc]): Set[(Long, Long, Long, Long)] = {
    val k = 5
    val gs = docs.map(d => (d._1, toksOf(d._2)))
    val dupGrams = gs.flatMap { case (id, ws) => grams(ws, k).distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (g, xs) if xs.map(_._2).distinct.size >= 2 => g }
      .toSet
    gs.flatMap { case (id, ws) =>
      val starts = grams(ws, k).zipWithIndex.collect {
        case (g, p) if dupGrams(g) => p }
      val spans = starts.foldLeft(List.empty[(Int, Int)]) {
        case ((s0, e0) :: rest, p) if p <= e0 + 1 => (s0, p + k - 1) :: rest
        case (acc, p) => (p, p + k - 1) :: acc
      }.reverse
      spans.map { case (s0, e0) => (id, s0.toLong, (e0 - s0 + 1).toLong, ws.size.toLong) }
    }.toSet
  }

  private val collisionCorpusGen: Gen[Seq[Doc]] = for {
    k <- Gen.choose(2, 10)
    base <- Gen.listOfN(k, for {
      len <- Gen.frequency(1 -> Gen.choose(0, 4), 4 -> Gen.choose(5, 16))
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" "))
  } yield base.zipWithIndex.map { case (t, i) =>
    (i.toLong, t, "en", s"s$i", t.length.toLong) }

  test("q80 matches the brute-force interval-merge evaluator on random corpora") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(collisionCorpusGen) { docs =>
      val dir = Files.createTempDirectory("q80fuzz").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.analytics.Battery.queries("q80_exact_substr")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = bruteQ80(docs)
      if (got != want) { println(s"q80 MISMATCH\nDOCS: $docs\nGOT:  $got\nWANT: $want"); false }
      else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- q82 DSIR importance weights ----

  private def md5h32(s: String): Long =
    java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  private def bruteQ82(docs: Seq[Doc]): Set[(Long, Long, Long, Boolean)] = {
    val tok = docs.flatMap(d => toksOf(d._2).map(w => (d._1, md5h32(w) % 64)))
    val model = tok.groupBy(_._2).map { case (b, xs) =>
      b -> ((xs.count(_._1 % 7 == 0).toLong + 1) * 100000) / (xs.size.toLong + 1)
    }
    tok.groupBy(_._1).map { case (id, xs) =>
      val n = xs.size.toLong
      (id, n, xs.map(x => model(x._2)).sum / n, id % 7 == 0)
    }.toSet
  }

  test("q82 matches the brute-force hashed-bucket importance model") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(corpusGen) { docs =>
      val dir = Files.createTempDirectory("q82fuzz").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.analytics.Battery.queries("q82_dsir_weights")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
      val want = bruteQ82(docs)
      if (got != want) { println(s"q82 MISMATCH\nDOCS: $docs\nGOT:  $got\nWANT: $want"); false }
      else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
