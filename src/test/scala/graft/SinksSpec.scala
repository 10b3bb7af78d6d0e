package graft

import graft.golden.Golden
import graft.model.{Doc, FinalTriple}
import graft.operators.Pipeline
import graft.sinks.TurtleSink
import graft.sources.FixtureDocs
import graft.streaming.StreamingPipeline

import java.nio.file.Files

class SinksSpec extends SparkTestBase {

  assume(FixtureDocs.available())

  private val ontNS = "http://standards.buildingsmart.org/IFC/DEV/IFC4/ADD2_TC1/OWL#"

  test("TurtleSink output re-parses to the identical triple set") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(FixtureDocs.doc(12)))
    val r = Pipeline.run(docs, FixtureDocs.BaseURI)
    val rows = r.triples.as[FinalTriple].collect().toSeq
    assert(rows.nonEmpty)
    val ttl = TurtleSink.serialize(rows, FixtureDocs.BaseURI, ontNS)
    val reparsed = Golden.fromTurtle(ttl)
    val asT = Golden.fromTripleRows(rows)
    assert(reparsed.toSet == asT.toSet)
    r.unpersist()
  }

  test("NTriplesSink: expression path == driver path, round-trips, and escapes") {
    import graft.sinks.NTriplesSink
    import graft.model.FinalTriple
    import spark.implicits._
    val docs = spark.createDataset(Seq(FixtureDocs.doc(12)))
    val r = Pipeline.run(docs, FixtureDocs.BaseURI)
    val rows = r.triples.as[FinalTriple].collect().toSeq
    assert(rows.nonEmpty)
    // distributed (Catalyst-expression) serialization == driver-side serialization
    val distLines = r.triples.select(NTriplesSink.line().as("l")).as[String].collect().toSet
    val serLines = NTriplesSink.serialize(rows).split('\n').toSet
    assert(distLines == serLines)
    // every line is grammar-shaped
    distLines.foreach { l =>
      assert(l.startsWith("<") && l.endsWith(" ."), l)
    }
    r.unpersist()
    // escape edge cases, both paths
    val nasty = FinalTriple("d", "http://x/s", "http://x/p",
      "a\"b\\c\nd\re\tf", "literal", "", 1L, 0)
    val expected = "<http://x/s> <http://x/p> \"a\\\"b\\\\c\\nd\\re\\tf\" ."
    assert(NTriplesSink.serialize(Seq(nasty)).trim == expected)
    val one = spark.createDataset(Seq(nasty)).toDF()
    assert(one.select(NTriplesSink.line()).as[String].head() == expected)
    // full-IRI rendering with datatype
    val typed = FinalTriple("d", "http://x/s", "http://x/p", "42", "literal",
      "http://www.w3.org/2001/XMLSchema#integer", 1L, 0)
    assert(NTriplesSink.serialize(Seq(typed)).trim ==
      "<http://x/s> <http://x/p> \"42\"^^<http://www.w3.org/2001/XMLSchema#integer> .")
    // distributed write: one text file per partition, re-readable
    val tmp = Files.createTempDirectory("graft-nt").toString
    NTriplesSink.write(spark.createDataset(rows).toDF().repartition(3), s"$tmp/out")
    val back = spark.read.text(s"$tmp/out").as[String].collect().toSet
    assert(back == distLines)
  }

  test("NTriplesSink: language tags and blank nodes survive the wire") {
    import graft.sinks.NTriplesSink
    import graft.sources.NTriplesSource
    import spark.implicits._
    // a foreign (NT-loaded) store carries tags and bnodes the pipeline's
    // own output never has — exporting it must not alter the data
    val src = Seq(
      "<urn:s> <urn:p> \"chat\"@en .",
      "<urn:s> <urn:p> \"chat\"@fr .",
      "<urn:s> <urn:p> \"plain\" .",
      "<urn:s> <urn:p> \"3\"^^<http://www.w3.org/2001/XMLSchema#integer> .",
      "_:b1 <urn:p> _:b2 .",
      "<urn:s> <urn:p> <urn:o> .")
    val store = NTriplesSource.parse(spark.createDataset(src))
    val lines = store.select(NTriplesSink.line(withLang = true).as("l"))
      .as[String].collect().toSet
    assert(lines == src.toSet)
    // write() auto-detects the obj_lang column; parse(write(x)) == x
    val tmp = Files.createTempDirectory("graft-nt-lang").toString
    NTriplesSink.write(store, s"$tmp/out")
    val back = NTriplesSource.parse(spark.read.text(s"$tmp/out").as[String])
    assert(back.collect().toSet == store.collect().toSet)
    // the default line() never touches obj_lang, so the pipeline's own
    // 5-column (untagged) schema serializes without the column
    val untagged = store.drop("obj_lang")
    assert(untagged.select(NTriplesSink.line().as("l")).count() == src.size)
  }

  test("streaming variant produces the same triples as batch") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream").toString
    val docs = spark.createDataset(FixtureDocs.docs())
    docs.write.parquet(s"$tmp/docs")
    val q = StreamingPipeline.start(spark, s"$tmp/docs", s"$tmp/triples", s"$tmp/ckpt",
      FixtureDocs.BaseURI)
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$tmp/triples")
      .select("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")
      .collect().map(_.toSeq).toSet
    val batch = Pipeline.run(docs, FixtureDocs.BaseURI)
    val expected = batch.triples
      .select("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")
      .collect().map(_.toSeq).toSet
    assert(streamed == expected)
    batch.unpersist()
  }

  test("lineage rows are collected per stage and partition") {
    import spark.implicits._
    val docs = spark.createDataset(FixtureDocs.docs())
    // staged path: per-stage rows from Stages A and C
    val r = Pipeline.run(docs, FixtureDocs.BaseURI,
      Pipeline.Options(fusedPipeline = Some(false)))
    r.triples.count()
    val rows = r.lineage.collect()
    val stages = rows.map(_.getString(0)).toSet
    assert(stages.contains("A_tokenize") && stages.contains("C_emit"))
    val aIn = rows.filter(_.getString(0) == "A_tokenize").map(_.getLong(2)).sum
    assert(aIn == 19L) // one row per fixture doc
    r.unpersist()
    // fused (default) path: the overall F_fused row set PLUS per-phase
    // rows, so ops introspection survives the fused default
    val rf = Pipeline.run(docs, FixtureDocs.BaseURI)
    rf.triples.count()
    val frows = rf.lineage.collect()
    val fstages = frows.map(_.getString(0)).toSet
    assert(Set("F_fused", "F1_tokenize", "F2_link", "F3_emit", "F4_dedup")
      .subsetOf(fstages), fstages.toString)
    def sum(stage: String, col: Int) =
      frows.filter(_.getString(0) == stage).map(_.getLong(col)).sum
    assert(sum("F_fused", 2) == 19L)
    assert(sum("F1_tokenize", 2) == 19L) // rows_in = docs
    // the phase chain: tokenize out = link in; link out = emit in; emit out
    // (minus markers=errors) = dedup in; dedup out + markers = F_fused out
    assert(sum("F1_tokenize", 3) == sum("F2_link", 2))
    assert(sum("F2_link", 3) == sum("F3_emit", 2))
    assert(sum("F3_emit", 3) - sum("F3_emit", 4) == sum("F4_dedup", 2))
    assert(sum("F4_dedup", 3) + sum("F3_emit", 4) == sum("F_fused", 3))
    assert(sum("F3_emit", 3) > 0 && sum("F4_dedup", 3) > 0)
    rf.unpersist()
  }

  test("goldens still match with duplicate-removal enabled (no dups present)") {
    import spark.implicits._
    // these fixtures contain no duplicate bodies, so D1 must be a no-op
    // (fixture 12 intentionally NOT used: its four identical
    // IFCCARTESIANPOINT($) lines are true duplicates that D1 collapses)
    val docs = spark.createDataset(Seq(FixtureDocs.doc(1), FixtureDocs.doc(10)))
    val base = Pipeline.run(docs, FixtureDocs.BaseURI)
    val withD1 = Pipeline.run(docs, FixtureDocs.BaseURI, Pipeline.Options(removeDuplicates = true))
    val a = base.triples.select("doc_id", "subj", "pred", "obj").collect().map(_.toSeq).toSet
    val b = withD1.triples.select("doc_id", "subj", "pred", "obj").collect().map(_.toSeq).toSet
    assert(a == b)
    base.unpersist(); withD1.unpersist()
  }

  test("D1 dedup through the full pipeline redirects refs to the canonical line") {
    import spark.implicits._
    val text = "ISO-10303-21;\nHEADER;\nFILE_SCHEMA(('IFC4'));\nENDSEC;\nDATA;\n" +
      "#1= IFCAPPLICATION(#3,$,$,$);\n" +
      "#2= IFCORGANIZATION($,$,$,$,$);\n" +
      "#3= IFCORGANIZATION($,$,$,$,$);\nENDSEC;\n"
    val docs = spark.createDataset(Seq(graft.model.Doc("dd", Seq(graft.model.Span("text", text, "", 0)))))
    val r = Pipeline.run(docs, "http://b/", Pipeline.Options(removeDuplicates = true))
    val rows = r.triples.collect().map(x => (x.getAs[String]("subj"), x.getAs[String]("pred"), x.getAs[String]("obj")))
    // the duplicate #3 collapses onto #2: the applicationDeveloper edge targets IfcOrganization_2
    assert(rows.exists { case (s, p, o) =>
      s.endsWith("IfcApplication_1") && p.endsWith("applicationDeveloper_IfcApplication") && o.endsWith("IfcOrganization_2") })
    assert(!rows.exists(_._1.endsWith("IfcOrganization_3")))
    r.unpersist()
  }

  test("resume: checkpointed stages are not recomputed") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    val docs = spark.createDataset(FixtureDocs.docs())
    val r1 = Pipeline.run(docs, FixtureDocs.BaseURI, Pipeline.Options(checkpointDir = Some(tmp)))
    val n1 = r1.triples.count()
    // second run resumes from the stage tables: lineage stays empty because
    // stages A and C never execute
    val r2 = Pipeline.run(docs, FixtureDocs.BaseURI, Pipeline.Options(checkpointDir = Some(tmp)))
    val n2 = r2.triples.count()
    assert(n1 == n2)
    assert(r2.lineage.where("stage = 'C_emit'").count() == 0)
  }
}
