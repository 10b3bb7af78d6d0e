package graft

import graft.golden.Golden
import graft.model.FinalTriple
import graft.operators.Pipeline
import graft.sources.FixtureDocs

import java.nio.file.Files

/** End-to-end correctness against the reference's own golden corpus:
  * 19 fixtures, triple P/R >= 0.95 required (BASELINE.json), expected 1.0 on
  * every fixture after canonicalization of intermediate IRIs.
  */
class GoldenSpec extends SparkTestBase {

  assume(FixtureDocs.available(), "reference golden corpus not present")

  private lazy val result = {
    import spark.implicits._
    val docs = spark.createDataset(FixtureDocs.docs())
    val r = Pipeline.run(docs, FixtureDocs.BaseURI)
    r.triples.as[FinalTriple].collect().groupBy(_.doc_id)
  }

  FixtureDocs.fixtureIds.foreach { n =>
    test(s"fixture $n matches golden (P/R >= 0.95)") {
      val mineRows = result.getOrElse(FixtureDocs.docId(n), Array.empty[FinalTriple]).toSeq
      val goldenText = Files.readString(FixtureDocs.ttlPath(n))
      val ifcText = Files.readString(FixtureDocs.ifcPath(n))
      val base = FixtureDocs.BaseURI
      val fixed = Golden.namedInstances(ifcText, base)
      val mine = Golden.canonicalize(Golden.fromTripleRows(mineRows), base, fixed)
      val gold = Golden.canonicalize(Golden.fromTurtle(goldenText), base, fixed)
      val s = Golden.score(mine, gold)
      info(f"fixture $n: P=${s.precision}%.3f R=${s.recall}%.3f (${s.common}/${s.golden})")
      withClue(s"fixture $n: $s\nmine-only:\n${(mine -- gold).take(8).mkString("\n")}\n" +
        s"golden-only:\n${(gold -- mine).take(8).mkString("\n")}\n") {
        assert(s.precision >= 0.95 && s.recall >= 0.95)
      }
    }
  }
}
