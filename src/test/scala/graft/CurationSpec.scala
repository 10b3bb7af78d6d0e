package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Edge-case pins for the round-5 corpus-curation battery ops
  * (q63 decontamination, q64 repetition signals, q65 data-card stats,
  * q66 TF-IDF keywords) on a hand-built documents table — the driver
  * oracle checks them against DuckDB on the synthetic corpus; this spec
  * pins the boundary semantics the corpus doesn't exercise: documents
  * shorter than the gram width, the exact-width document, a fully
  * repetitive document, and the even/odd lower-median picks.
  */
class CurationSpec extends SparkTestBase {

  import graft.analytics.Battery

  /** write a documents table with the battery's expected schema */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("curation").toString
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    Battery.queries(name)(spark, dir)

  test("q63: eval doc excluded, 5-gram overlap contaminates, short docs survive") {
    // doc 0  -> eval split (0 % 97 == 0)
    // doc 1  -> shares the 5-gram "a b c d e" with the eval doc -> dropped
    // doc 2  -> clean train doc
    // doc 3  -> 4 tokens (below gram width): can never be contaminated
    // doc 97 -> eval split too (97 % 97 == 0)
    val d = docsDir(Seq(
      (0L, "a b c d e f", "en", "s", 11L),
      (1L, "x a b c d e", "en", "s", 11L),
      (2L, "u v w x y z", "en", "s", 11L),
      (3L, "a b c d", "en", "s", 7L),
      (97L, "q r s t u", "en", "s", 9L)))
    val got = run("q63_decontaminate", d).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("q64: fully repetitive doc has all-duplicate 2-grams and fails keep") {
    val d = docsDir(Seq(
      (1L, "x x x x x x x x x x", "en", "s", 19L), // top_n=10/10, dup2=8/9
      (2L, "a b c d e f g h i j", "en", "s", 19L), // all distinct
      (3L, "solo", "en", "s", 4L))) // 1 token: no 2-gram row -> dropped
    val got = run("q64_repetition", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 10L, 10L, 9L, 8L, false),
      (2L, 10L, 1L, 9L, 0L, true)))
  }

  test("q65: exact lower median for even and odd language groups") {
    // en: lengths 1,5,9,13 (even n=4) -> lower median = 5
    // fr: lengths 2,4,6   (odd  n=3) -> median = 4
    val d = docsDir(Seq(
      (1L, "a", "en", "s", 1L), (2L, "a b", "en", "s", 5L),
      (3L, "a b c", "en", "s", 9L), (4L, "a b c d", "en", "s", 13L),
      (5L, "a", "fr", "s", 2L), (6L, "a b", "fr", "s", 4L), (7L, "a b c", "fr", "s", 6L)))
    val got = run("q65_corpus_stats", d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("en", 4L, 10L, 1L, 13L, 5L),
      ("fr", 3L, 6L, 2L, 6L, 4L)))
  }

  test("q66: rarer token outranks frequent-but-common token; token tiebreak") {
    // 4 docs; "rare" appears in 1 doc (idf 4000), "the" in all 4 (idf 1000).
    // doc 1: tf(the)=3 -> 3000 < tf(rare)=1 -> 4000: rare ranks first.
    val d = docsDir(Seq(
      (1L, "the the the rare", "en", "s", 16L),
      (2L, "the b b", "en", "s", 7L),
      (3L, "the c", "en", "s", 5L),
      (4L, "the d", "en", "s", 5L)))
    val got = run("q66_tfidf_topk", d)
      .filter("doc_id = 1").orderBy("rk")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      ("rare", 1L, 1L, 4000L, 1),
      ("the", 3L, 4L, 3000L, 2)))
  }

  test("q70: organic + appended PII both counted; boundary non-matches stay") {
    // doc 7 appends user7@mail.example.com / 10.7.7.7 / +1-555-1007.
    // Organic text adds one more of each class, plus two MUST-NOT-match
    // decoys: "1234.5.6.7" (first octet 4 digits — \b kills every start)
    // and "a@b" (no dot-TLD after the host).
    val d = docsDir(Seq(
      (7L, "ping 1.2.3.4 write bob@x.co or 1234.5.6.7 maybe a@b", "en", "s", 51L)))
    val got = run("q70_pii_redact", d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq((7L, 2, 2, 1)))
  }

  test("q70: redaction hash equals the hash of the hand-redacted text") {
    val s = spark
    import s.implicits._
    val d = docsDir(Seq((7L, "mail bob@x.co ip 1.2.3.4", "en", "s", 24L)))
    val gotH = run("q70_pii_redact", d).collect()(0).getLong(4)
    val expText = "mail <EMAIL> ip <IP> contact <EMAIL> or <IP> tel <PHONE>"
    val expH = Seq(expText).toDF("t")
      .select(graft.functions.TextOps.h32(org.apache.spark.sql.functions.col("t")))
      .collect()(0).getLong(0)
    assert(gotH == expH)
  }

  test("q71: cross-doc chunk dedup keeps first (doc_id, idx); partial chunks drop") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val ten2 = (11 to 20).map(i => s"w$i").mkString(" ")
    val d = docsDir(Seq(
      (1L, ten, "en", "s", 10L),                       // chunk0 = canonical
      (2L, ten, "en", "s", 10L),                       // exact dup of doc 1
      (3L, s"$ten $ten2 tail tail tail", "en", "s", 10L), // chunk0 dup + fresh chunk1; 3 leftovers drop
      (4L, "a b c d e f g h i", "en", "s", 9L)))       // 9 tokens: below width
    val got = run("q71_paragraph_dedup", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq((1L, 0L, 3L), (3L, 1L, 1L)))
  }

  test("q72: integer surprise arithmetic on a hand-computed corpus") {
    // corpus: doc1 "a a b", doc2 "a c". T=5; cf a=3,b=1,c=1.
    // surprise a = 5000 div 3 = 1666, b = c = 5000.
    // doc1: ntok 3, bits 2*1666+5000 = 8332, score 8332 div 3 = 2777
    // doc2: ntok 2, bits 1666+5000 = 6666, score 3333
    val d = docsDir(Seq(
      (1L, "a a b", "en", "s", 5L),
      (2L, "a c", "en", "s", 3L)))
    val got = run("q72_unigram_quality", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3L, 2777L), (2L, 2L, 3333L)))
  }

  test("q73: organic + appended URLs roll into per-host rows; .net blocked") {
    // doc 7: 7%5=2 -> gamma, 7%3=1 -> org; appended mirror.example.org;
    // organic evil.example.net must flag blocked.
    val d = docsDir(Seq(
      (7L, "go https://evil.example.net/x now", "en", "s", 33L)))
    val got = run("q73_url_domains", d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("evil.example.net", "net", 1L, 1L, 7L, true),
      ("gamma.example.org", "org", 1L, 1L, 7L, false),
      ("mirror.example.org", "org", 1L, 1L, 7L, false)))
  }

  private def spans(d: String): Seq[(Long, Long, Long, Long)] =
    run("q80_exact_substr", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("q80: overlapping shared 5-grams merge into one maximal span") {
    // c1..c7 shared across docs 1 and 2: three overlapping gram starts in
    // doc 1 (0,1,2) merge to span (0, len 7); doc 2 shifted by one.
    val d = docsDir(Seq(
      (1L, "c1 c2 c3 c4 c5 c6 c7 z1 z2", "en", "s", 1L),
      (2L, "y1 c1 c2 c3 c4 c5 c6 c7 y2", "en", "s", 1L)))
    assert(spans(d) == Seq((1L, 0L, 7L, 9L), (2L, 1L, 7L, 9L)))
  }

  test("q80: adjacent spans merge; gapped spans split") {
    // doc 1 carries d0..d9 contiguously (shared starts 0 and 5, adjacent:
    // 5 = 0 + k -> ONE span of len 10); doc 2 carries the same two blocks
    // split by X (starts 0 and 6, gap -> TWO spans of len 5).
    val d = docsDir(Seq(
      (1L, "d0 d1 d2 d3 d4 d5 d6 d7 d8 d9", "en", "s", 1L),
      (2L, "d0 d1 d2 d3 d4 X d5 d6 d7 d8 d9", "en", "s", 1L)))
    assert(spans(d) == Seq(
      (1L, 0L, 10L, 10L),
      (2L, 0L, 5L, 11L), (2L, 6L, 5L, 11L)))
  }

  test("q80: within-doc repetition and sub-width docs never flag") {
    // doc 1 repeats its own 5-gram (1 distinct doc -> not duplicated);
    // doc 2 is below the gram width entirely.
    val d = docsDir(Seq(
      (1L, "r1 r2 r3 r4 r5 q q q q r1 r2 r3 r4 r5", "en", "s", 1L),
      (2L, "s1 s2 s3", "en", "s", 1L)))
    assert(spans(d).isEmpty)
  }

  test("q89: bin boundaries, multi-bin spans, empty-doc drop, cross-shard prefix") {
    // L = 256. doc 0: 256 tokens -> exactly bin 0 (end_bin = (255)//256 = 0,
    // no cross). doc 1: 300 tokens from offset 256 -> bins 1..2, crosses.
    // doc 2: empty -> dropped. doc 999 (shard 0) and doc 1000 (shard 1)
    // pin the two-level prefix sum across the shard seam: 1000's offset
    // must include ALL of shard 0 (256+300+10 = 566).
    def w(n: Int) = (0 until n).map(i => s"t$i").mkString(" ")
    val d = docsDir(Seq(
      (0L, w(256), "en", "s", 1L),
      (1L, w(300), "en", "s", 1L),
      (2L, "", "en", "s", 0L),
      (999L, w(10), "en", "s", 1L),
      (1000L, w(5), "en", "s", 1L)))
    val got = run("q89_seq_pack", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 256L, 0L, 0L, 0L, false),
      (1L, 300L, 256L, 1L, 2L, true),
      (999L, 10L, 556L, 2L, 2L, false),
      (1000L, 5L, 566L, 2L, 2L, false)))
  }
}
