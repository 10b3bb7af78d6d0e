package graft

import graft.model.FinalTriple
import graft.sinks.NTriplesSink
import graft.sources.NTriplesSource

class NTriplesSourceSpec extends SparkTestBase {

  private def ft(subj: String, pred: String, obj: String,
                 kind: String = "literal", dt: String = ""): FinalTriple =
    FinalTriple("d", subj, pred, obj, kind, dt, 0L, 0)

  test("parses every term form: iri, bnode, plain/typed/tagged literals") {
    val rows = Seq(
      """<urn:s> <urn:p> <urn:o> .""",
      """_:b1 <urn:p> _:b2 .""",
      """<urn:s> <urn:p> "plain" .""",
      """<urn:s> <urn:p> "3.5"^^<http://www.w3.org/2001/XMLSchema#double> .""",
      """<urn:s> <urn:p> "bonjour"@fr-BE .""",
      "   # a comment line",
      "",
      """<urn:s> <urn:p> "trailing" . # inline comment"""
    ).flatMap(NTriplesSource.parseLine)
    assert(rows.map(r => (r.subj, r.obj, r.obj_kind, r.obj_datatype, r.obj_lang)) == Seq(
      ("urn:s", "urn:o", "iri", "", ""),
      ("_:b1", "_:b2", "bnode", "", ""),
      ("urn:s", "plain", "literal", "", ""),
      ("urn:s", "3.5", "literal", "http://www.w3.org/2001/XMLSchema#double", ""),
      ("urn:s", "bonjour", "literal", "", "fr-BE"),
      ("urn:s", "trailing", "literal", "", "")))
  }

  test("ECHAR and UCHAR escapes, including an astral \\U surrogate pair") {
    val r = NTriplesSource.parseLine(
      """<urn:s> <urn:p> "tab\there\nq\"uote\\backé\U0001F600" .""").get
    assert(r.obj == "tab\there\nq\"uote\\backé" + new String(Character.toChars(0x1F600)))
  }

  test("no-space terminator: _:b1. ends the statement, label excludes the dot") {
    // grammatically valid NT (BLANK_NODE_LABEL cannot end with '.')
    val r = NTriplesSource.parseLine("""<urn:s> <urn:p> _:b1.""").get
    assert(r.obj == "_:b1" && r.obj_kind == "bnode")
    val r2 = NTriplesSource.parseLine("""_:a.b <urn:p> <urn:o> .""").get
    assert(r2.subj == "_:a.b") // internal dots stay in the label
  }

  test("malformed lines fail loudly with position") {
    def bad(line: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](NTriplesSource.parseLine(line))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !contains '$frag'")
    }
    bad("""<urn:s> <urn:p> <urn:o .""", "unterminated IRI")
    bad("""<urn:s> <urn:p> <urn:o>""", "expected terminating '.'")
    bad("""<urn:s> <urn:p> <urn:o> . junk""", "trailing content")
    bad("""<urn:s> <urn:p> "x\z" .""", "unknown escape")
    bad("""<urn:s> <urn:p> "open .""", "unterminated literal")
    bad("""42 <urn:p> <urn:o> .""", "expected IRI or blank node subject")
    // the positioned-error contract holds for malformed escapes and
    // truncated terms too — never a raw NumberFormatException /
    // StringIndexOutOfBoundsException
    bad("<urn:s> <urn:p> \"x\\" + "uZZZZ\" .", "non-hex digits")
    bad("""<urn:s> <urn:p> "x"^^""", "truncated line")
  }

  test("sink -> source roundtrip is exact, driver-side (gnarly strings)") {
    val triples = Seq(
      ft("urn:a", "urn:p", "urn:b", kind = "iri"),
      ft("urn:a", "urn:p", "line\nbreak\ttab\r\"quotes\" \\slash"),
      ft("urn:a", "urn:q", "typed",
        dt = "http://www.w3.org/2001/XMLSchema#decimal"),
      // xsd:string is omitted on the wire, reads back as "" (RDF 1.1 implicit)
      ft("urn:a", "urn:q", "stringly",
        dt = "http://www.w3.org/2001/XMLSchema#string"))
    val nt = NTriplesSink.serialize(triples)
    val got = nt.linesIterator.flatMap(NTriplesSource.parseLine).toSeq
    val want = triples.map(t => (t.subj, t.pred, t.obj, t.obj_kind,
      if (t.obj_datatype == "http://www.w3.org/2001/XMLSchema#string") "" else t.obj_datatype))
    assert(got.map(r => (r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype)).sorted ==
      want.sorted)
  }

  test("sink -> source roundtrip is exact, distributed (write.text -> read)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nt-src").toString + "/nt"
    val triples = (1 to 500).map(i =>
      ft(s"urn:s$i", "urn:p", if (i % 3 == 0) s"urn:o$i" else s"v\n$i\t\"x\\",
        kind = if (i % 3 == 0) "iri" else "literal",
        dt = if (i % 5 == 0 && i % 3 != 0) "urn:dt" else ""))
    NTriplesSink.write(triples.toDF(), dir)
    val got = NTriplesSource.read(spark, dir)
      .select("subj", "pred", "obj", "obj_kind", "obj_datatype")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    assert(got == triples.map(t => (t.subj, t.pred, t.obj, t.obj_kind, t.obj_datatype)).toSet)
    assert(NTriplesSource.read(spark, dir).count() == 500)
  }

  test("directory read scopes blank-node labels per source file") {
    // bnode scope is per-document in RDF: two files may both say _:b1 and
    // mean different nodes — read() must not conflate them
    val dir = java.nio.file.Files.createTempDirectory("graft-nt-bnode")
    java.nio.file.Files.write(dir.resolve("a.nt"),
      "_:b1 <urn:p> \"x\" .\n_:b1 <urn:p> _:c .\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.nt"),
      "_:b1 <urn:p> \"y\" .\n".getBytes("UTF-8"))
    val got = NTriplesSource.read(spark, dir.toString)
    assert(got.count() == 3)
    val subs = got.select("subj").collect().map(_.getString(0)).toSet
    assert(subs.size == 2, s"labels from different files must stay distinct: $subs")
    assert(subs.forall(s => s.startsWith("_:f") && s.endsWith("_b1")))
    // within one file the subject and object labels share the same scope tag
    val aRows = got.filter(got("obj_kind") === "bnode").collect()
    assert(aRows.length == 1)
    val (s, o) = (aRows(0).getAs[String]("subj"), aRows(0).getAs[String]("obj"))
    assert(s.substring(0, s.lastIndexOf('_')) == o.substring(0, o.lastIndexOf('_')))
    // parse() keeps labels verbatim — pre-split line streams own their scope
    assert(NTriplesSource.parseLine("_:b1 <urn:p> \"x\" .").get.subj == "_:b1")
  }

  test("streaming NT ingest: readStream text -> parse -> triples table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nt-stream").toString + "/in"
    val triples = (1 to 40).map(i => ft(s"urn:s$i", "urn:p", s"v$i"))
    NTriplesSink.write(triples.toDF(), dir)
    // the parse is a narrow per-line flatMap, so it composes with a file
    // stream unchanged — continuous NT ingest is the same one-liner as batch
    val q = graft.sources.NTriplesSource.parse(spark.readStream.text(dir).as[String])
      .writeStream.format("memory").queryName("nt_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("nt_stream").count() == 40)
    assert(spark.table("nt_stream").select("subj").as[String].collect().toSet ==
      triples.map(_.subj).toSet)
  }

  test("scalacheck: arbitrary literal strings survive the wire") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val strGen = Gen.listOf(Gen.frequency(
      6 -> Gen.asciiPrintableChar,
      1 -> Gen.oneOf('\n', '\r', '\t', '"', '\\'),
      1 -> Gen.choose(0x80.toChar, 0x2FFF.toChar))).map(_.mkString)
    val prop = Prop.forAll(strGen) { s =>
      val nt = NTriplesSink.serialize(Seq(ft("urn:s", "urn:p", s)))
      val parsed = nt.linesIterator.flatMap(NTriplesSource.parseLine).toSeq
      parsed.sizeIs == 1 && parsed.head.obj == s
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
