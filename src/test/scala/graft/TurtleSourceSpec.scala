package graft

import graft.schema.Turtle
import graft.sources.TurtleSource
import java.nio.file.{Files, Paths}

class TurtleSourceSpec extends SparkTestBase {

  private def write(dir: String, name: String, text: String): Unit =
    Files.write(Paths.get(dir, name), text.getBytes("UTF-8"))

  test("reads a directory of .ttl files: one file = one doc_id") {
    val dir = Files.createTempDirectory("graft-ttl-src").toString
    write(dir, "modelA.ttl",
      """@prefix ex: <urn:ex#> .
        |ex:w1 a ex:Wall ; ex:height "3.5"^^<http://www.w3.org/2001/XMLSchema#double> ;
        |      ex:label "hé\nllo" , "salut"@fr .
        |""".stripMargin)
    write(dir, "modelB.ttl",
      """@prefix ex: <urn:ex#> .
        |ex:d1 ex:parts ( ex:p1 ex:p2 ) .
        |""".stripMargin)
    write(dir, "notes.txt", "not turtle — must be glob-filtered out")

    val got = TurtleSource.read(spark, dir)
    val byDoc = got.collect().groupBy(_.getString(0))
    assert(byDoc.keySet == Set("modelA", "modelB"))

    val a = byDoc("modelA").map(r => (r.getString(1), r.getString(2), r.getString(3),
      r.getString(4), r.getString(5), r.getString(6))).toSet
    assert(a == Set(
      ("urn:ex#w1", Turtle.RDF_NS + "type", "urn:ex#Wall", "iri", "", ""),
      ("urn:ex#w1", "urn:ex#height", "3.5", "literal",
        "http://www.w3.org/2001/XMLSchema#double", ""),
      ("urn:ex#w1", "urn:ex#label", "hé\nllo", "literal", "", ""),
      ("urn:ex#w1", "urn:ex#label", "salut", "literal", "", "fr")))

    // the collection expands to the rdf:first/rest chain with bnode cells
    val b = byDoc("modelB")
    assert(b.length == 5) // parts->cell, 2x first, 2x rest (last rest = nil)
    assert(b.count(_.getString(4) == "bnode") == 2) // obj bnodes: cell1 from parts, cell2 from cell1's rest (nil is an IRI)
  }

  test("reads the reference golden corpus files byte-for-byte like the driver parser") {
    val refDir = "/root/reference/src/test/resources/convertIFCFileToOutputTTL"
    assume(new java.io.File(refDir).isDirectory)
    val got = TurtleSource.read(spark, refDir)
    val counts = got.groupBy("doc_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // driver-side truth: same files through the same parser, no Spark
    val want = new java.io.File(refDir).listFiles().filter(_.getName.endsWith(".ttl"))
      .map { f =>
        val text = new String(Files.readAllBytes(f.toPath), "UTF-8")
        f.getName.stripSuffix(".ttl") -> Turtle.parse(text).size.toLong
      }.toMap
    // zero-triple goldens (header-only fixtures) produce no rows, so they
    // have no groupBy key — compare the non-empty documents
    assert(counts == want.filter(_._2 > 0))
    assert(want.values.sum > 250, "corpus should be non-trivial") // 304 golden triples
  }

  test("pipeline TTL export reads back through TurtleSource (sink-source compat)") {
    import graft.model.FinalTriple
    import graft.sources.FixtureDocs
    import org.apache.spark.sql.Encoders
    assume(FixtureDocs.available())
    val ontNS = "http://standards.buildingsmart.org/IFC/DEV/IFC4/ADD2_TC1/OWL#"
    val docs = spark.createDataset(Seq(FixtureDocs.doc(12), FixtureDocs.doc(13)))(
      Encoders.product[graft.model.Doc])
    val r = graft.operators.Pipeline.run(docs, FixtureDocs.BaseURI)(spark)
    val byDoc = r.triples.as[FinalTriple](Encoders.product[FinalTriple])
      .collect().toSeq.groupBy(_.doc_id)
    assert(byDoc.nonEmpty && byDoc.values.forall(_.nonEmpty))
    val dir = Files.createTempDirectory("graft-ttl-compat").toString
    byDoc.foreach { case (doc, ts) =>
      write(dir, s"$doc.ttl", graft.sinks.TurtleSink.serialize(ts, FixtureDocs.BaseURI, ontNS))
    }
    val got = TurtleSource.read(spark, dir)
      .select("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")
      .collect().map(r0 => (r0.getString(0), r0.getString(1), r0.getString(2),
        r0.getString(3), r0.getString(4), r0.getString(5))).toSet
    val want = byDoc.values.flatten.map { t =>
      // the sink omits xsd:string (RDF 1.1 implicit), the source reads "" back
      val dt = if (t.obj_datatype.endsWith("#string")) "" else t.obj_datatype
      (t.doc_id, t.subj, t.pred, t.obj, t.obj_kind, dt)
    }.toSet
    assert(got == want)
    r.unpersist()
  }

  test("docIdOf: percent-decodes, keeps literal '+' (file URIs are not form-encoded)") {
    assert(TurtleSource.docIdOf("file:///a/b/model.ttl") == "model")
    assert(TurtleSource.docIdOf("file:/x/a%20b.ttl") == "a b")
    assert(TurtleSource.docIdOf("file:/x/a+b.ttl") == "a+b")
    assert(TurtleSource.docIdOf("file:/x/caf%C3%A9.ttl") == "café")
    assert(TurtleSource.docIdOf("plain.ttl") == "plain")
    // a literal '%' not followed by two hex digits stays literal (filename
    // encoding is not guaranteed across filesystems) — never a raw
    // NumberFormatException that crashes the corpus read unnamed
    assert(TurtleSource.docIdOf("file:/x/50%off.ttl") == "50%off")
    assert(TurtleSource.docIdOf("file:/x/a%zz.ttl") == "a%zz")
    assert(TurtleSource.docIdOf("file:/x/tail%2.ttl") == "tail%2")
  }

  test("malformed turtle fails loudly naming the document") {
    val dir = Files.createTempDirectory("graft-ttl-bad").toString
    write(dir, "broken.ttl", "@prefix ex: <urn:ex#> .\nex:a ex:b .\n")
    val e = intercept[Exception](TurtleSource.read(spark, dir).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("[broken]")), msgs(e).toString)
  }
}
