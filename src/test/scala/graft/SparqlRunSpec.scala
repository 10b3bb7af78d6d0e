package graft

import java.nio.file.Files

class SparqlRunSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-sparqlrun-$name").toString

  private val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  private def writeTriples(): String = {
    import spark.implicits._
    val dir = tmp("triples") + "/t"
    Seq(
      ("d1", "w1", rdfType, "urn:Wall"),
      ("d1", "w2", rdfType, "urn:Wall"),
      ("d1", "d7", rdfType, "urn:Door"))
      .toDF("doc_id", "subj", "pred", "obj")
      .write.parquet(dir)
    dir
  }

  test("SELECT writes the solution table to parquet") {
    val out = tmp("select")
    SparqlRun.run(spark, writeTriples(),
      s"SELECT ?x WHERE { ?x <$rdfType> <urn:Wall> }", out)
    val got = spark.read.parquet(out).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("d1", "w1"), ("d1", "w2")))
  }

  test("ASK writes a one-row boolean table") {
    val triples = writeTriples()
    val out = tmp("ask")
    SparqlRun.run(spark, triples, s"ASK { ?x <$rdfType> <urn:Door> }", out)
    assert(spark.read.parquet(out).collect().map(_.getBoolean(0)).toSeq == Seq(true))
    SparqlRun.run(spark, triples, s"ASK { ?x <$rdfType> <urn:Roof> }", out)
    assert(spark.read.parquet(out).collect().map(_.getBoolean(0)).toSeq == Seq(false))
  }

  test("csv format writes a header for human-read results") {
    val out = tmp("csv")
    SparqlRun.run(spark, writeTriples(),
      s"SELECT ?x WHERE { ?x <$rdfType> <urn:Door> }", out, format = "csv")
    val lines = Files.list(java.nio.file.Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".csv")).flatMap(p =>
        scala.io.Source.fromFile(p).getLines().toList)
    assert(lines.head == "graph,x")
    assert(lines.toSet.contains("d1,d7"))
  }

  test("results-* formats render W3C serializations; non-SELECT refuses loudly") {
    val triples = writeTriples()
    def textLines(out: String): List[String] =
      Files.list(java.nio.file.Paths.get(out)).toArray.map(_.toString)
        .filter(_.endsWith(".txt")).toList.flatMap(p =>
          scala.io.Source.fromFile(p).getLines().toList)
    val tsvOut = tmp("rtsv")
    SparqlRun.run(spark, triples,
      s"SELECT ?x WHERE { ?x <$rdfType> <urn:Door> }", tsvOut, format = "results-tsv")
    val tsv = textLines(tsvOut)
    assert(tsv.head == "?graph\t?x")
    // subject position derives iri kind structurally
    assert(tsv.tail == List("\"d1\"\t<d7>"))
    val xmlOut = tmp("rxml")
    SparqlRun.run(spark, triples,
      s"SELECT ?x WHERE { ?x <$rdfType> <urn:Door> }", xmlOut, format = "results-xml")
    val xml = textLines(xmlOut)
    assert(xml.head.startsWith("<?xml version=\"1.0\"?><sparql"))
    assert(xml.last == "</results></sparql>")
    val jsonOut = tmp("rjson")
    SparqlRun.run(spark, triples,
      s"SELECT ?x WHERE { ?x <$rdfType> <urn:Door> }", jsonOut, format = "results-json")
    assert(textLines(jsonOut).exists(_.contains("\"x\":{\"type\":\"uri\",\"value\":\"d7\"}")))
    val e = intercept[IllegalArgumentException] {
      SparqlRun.run(spark, triples, s"ASK { ?x <$rdfType> <urn:Door> }",
        tmp("rask"), format = "results-csv")
    }
    assert(e.getMessage.contains("no boolean form"))
    val e2 = intercept[IllegalArgumentException] {
      SparqlRun.run(spark, triples,
        s"CONSTRUCT WHERE { ?x <$rdfType> <urn:Door> }",
        tmp("rcons"), format = "results-json")
    }
    assert(e2.getMessage.contains("SELECT"))
  }

  test("ASK renders the W3C boolean documents through results-json/results-xml") {
    val triples = writeTriples()
    def textLines(out: String): List[String] =
      Files.list(java.nio.file.Paths.get(out)).toArray.map(_.toString)
        .filter(_.endsWith(".txt")).toList.flatMap(p =>
          scala.io.Source.fromFile(p).getLines().toList)
    val jsonOut = tmp("askjson")
    SparqlRun.run(spark, triples, s"ASK { ?x <$rdfType> <urn:Door> }",
      jsonOut, format = "results-json")
    assert(textLines(jsonOut) == List("""{"head":{},"boolean":true}"""))
    val xmlOut = tmp("askxml")
    SparqlRun.run(spark, triples, s"ASK { ?x <$rdfType> <urn:Roof> }",
      xmlOut, format = "results-xml")
    assert(textLines(xmlOut) == List("<?xml version=\"1.0\"?>" +
      "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">" +
      "<head/><boolean>false</boolean></sparql>"))
  }

  test("CLI end-to-end over the committed pipeline expectation table") {
    val out = tmp("kg")
    SparqlRun.run(spark, ExpectedGen.TriplesFile,
      """PREFIX list: <https://w3id.org/list#>
         SELECT ?cell ?v WHERE { ?cell list:hasContents ?v }""", out)
    // one row per contents cell — the same population q38's oracle pins (56)
    assert(spark.read.parquet(out).count() == 56)
  }

  test("isAsk spots the query form through prologue, comments, and IRIs") {
    assert(SparqlRun.isAsk("PREFIX p: <urn:select/x#> ASK { ?s ?p ?o }"))
    assert(!SparqlRun.isAsk("# ask in a comment\nSELECT ?s WHERE { ?s ?p ?o }"))
    assert(!SparqlRun.isAsk("PREFIX ask: <urn:ask#>\nCONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }"))
    assert(SparqlRun.form("PREFIX p: <urn:x#> DELETE WHERE { ?s ?p ?o }") == "DELETE")
    assert(SparqlRun.form("INSERT DATA { GRAPH <g> { <a> <b> <c> } }") == "INSERT")
    // graph-management forms route to the update writer; keywords inside
    // IRIs must not misroute a query
    assert(SparqlRun.form("CLEAR GRAPH <urn:g>") == "CLEAR")
    assert(SparqlRun.form("LOAD </tmp/x.nt> INTO GRAPH <urn:g>") == "LOAD")
    assert(SparqlRun.form("MOVE <urn:a> TO <urn:b>") == "MOVE")
    assert(SparqlRun.form("SELECT ?x WHERE { ?x <urn:add/load> ?y }") == "SELECT")
  }

  test("an UPDATE request writes the updated triples table") {
    val out = tmp("upd")
    SparqlRun.run(spark, writeTriples(),
      s"DELETE WHERE { ?s <$rdfType> <urn:Door> }", out)
    val upd = spark.read.parquet(out)
    assert(upd.filter(upd("pred") === rdfType && upd("obj") === "urn:Door").count() == 0)
    assert(upd.count() > 0)
  }
}
