package graft

/** Staleness gate for the committed flagship expectation tables
  * (expected/kg_*.parquet, the driver's kg oracle): re-derives the
  * golden-corpus pipeline output and requires exact row-set equality with the
  * committed tables. A semantic change to the emitter that forgets
  * `sbt "runMain graft.ExpectedGen"` fails HERE, not at the driver. */
class ExpectedSpec extends SparkTestBase {

  // \u0001 separator prevents field-boundary aliasing ("ab"+"c" vs "a"+"bc");
  // sorted Seq (not Set) keeps row multiplicities comparable
  private def rowSet(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("\u0001")).toSeq.sorted

  private lazy val result = {
    assume(graft.sources.FixtureDocs.available(), "reference fixtures not mounted")
    graft.operators.Pipeline.run(
      SparkEntry.goldenDocs(spark), graft.sources.FixtureDocs.BaseURI,
      graft.operators.Pipeline.Options(persistEmitted = true))
  }

  test("kg_triples matches the committed expectation table") {
    assume(new java.io.File(ExpectedGen.TriplesFile).exists(), "expected table missing")
    val actual = rowSet(result.triples)
    val expected = rowSet(spark.read.parquet(ExpectedGen.TriplesFile))
    withClue(s"stale expected/kg_triples.parquet? missing=${expected.diff(actual).take(3)} " +
        s"extra=${actual.diff(expected).take(3)} — regenerate with `sbt \"runMain graft.ExpectedGen\"`\n") {
      assert(actual == expected)
    }
  }

  test("kg_markers matches the committed expectation table") {
    assume(new java.io.File(ExpectedGen.MarkersFile).exists(), "expected table missing")
    val actual = rowSet(result.markersDF)
    val expected = rowSet(spark.read.parquet(ExpectedGen.MarkersFile))
    withClue("stale expected/kg_markers.parquet? regenerate with `sbt \"runMain graft.ExpectedGen\"`\n") {
      assert(actual == expected)
    }
  }
}
