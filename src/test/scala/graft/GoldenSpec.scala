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
    test(s"fixture $n matches golden exactly (P = R = 1.0)") {
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
        // the 19 fixtures are known to canonicalize exactly (round-1 result);
        // the contract floor is 0.95, but a silent drop below 1.0 would hide
        // a real regression (e.g. the empty-literal class of bug), so the
        // gate pins exact equality
        assert(s.precision == 1.0 && s.recall == 1.0)
      }
    }
  }
}
