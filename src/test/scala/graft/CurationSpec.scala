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
}
