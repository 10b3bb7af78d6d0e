package graft

import graft.model._
import graft.operators.{Linker, Tokenizer}
import graft.sources.FixtureDocs
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TokenizerSpec extends SparkTestBase {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val header =
    "ISO-10303-21;\nHEADER;\nFILE_SCHEMA(('IFC4'));\nENDSEC;\nDATA;\n"

  private def docOf(body: String, id: String = "d1"): Doc =
    Doc(id, Seq(Span("text", header + body + "\nENDSEC;\nEND-ISO-10303-21;", "", 0)))

  test("schema sniff matches reference substring chain") {
    assert(Tokenizer.sniffSchema("FILE_SCHEMA(('IFC4'));") == "IFC4_ADD2_TC1")
    assert(Tokenizer.sniffSchema("FILE_SCHEMA(('IFC2X3'));") == "IFC2X3_TC1")
    assert(Tokenizer.sniffSchema("FILE_SCHEMA(('IFC4X1'));") == "IFC4x1")
    assert(Tokenizer.sniffSchema("FILE_SCHEMA(('IFC4X3_RC1'));") == "IFC4x3_RC1")
    assert(Tokenizer.sniffSchema("FILE_SCHEMA(('NONSENSE'));") == "")
    assert(Tokenizer.sniffSchema("no schema line at all") == "")
  }

  test("statement spanning physical lines is reassembled") {
    val d = docOf("#1= IFCAPPLICATION(#2,\n   $,$,\n$);\n#2= IFCORGANIZATION($,$,$,$,$);")
    val st = Tokenizer.tokenizeDoc(d).toVector.filter(_.line_id >= 0)
    assert(st.map(_.line_id) == Vector(1L, 2L))
    import spark.implicits._
    val tt = Tokenizer.tokenTable(spark.createDataset(Seq(d))).collect().sortBy(_.line_id)
    assert(tt.head.args.length == 4)
    assert(st.head.refs == Seq(2L))
  }

  test("quoted strings protect commas, parens and escaped quotes") {
    val st = Tokenizer.parseStatement("d1", "IFC4_ADD2_TC1", 0,
      "2= IFCORGANIZATION($,'Ghent, Uni (BE)''s',$,$,$);")
    // reference keeps the opening quote, drops the closing one, and collapses
    // '' to ' (IfcSpfParser.java:96-137)
    assert(st.args(1) == Tok0("S", "'Ghent, Uni (BE)'s", Nil))
  }

  test("statements split mid-token across spans reassemble") {
    val full = header + "#29= IFCMEASUREWITHUNIT(IFCLENGTHMEASURE(0.0254),$);\nENDSEC;\n"
    val chunks = full.grouped(17).toSeq
    val spans = chunks.zipWithIndex.map { case (c, i) => Span("text", c, "", i) }
    val flat = Tokenizer.tokenizeDoc(Doc("d", spans)).toVector.filter(_.line_id >= 0).head
    assert(flat.keyword == "IFCMEASUREWITHUNIT")
    val st = Tokenizer.parseStatement("d", flat.schema, 0, flat.line_id.toString + "=" + flat.body)
    assert(st.args == Seq(
      Tok0("S", "IFCLENGTHMEASURE", Nil),
      Tok0("L", "", Seq(Tok1("S", "0.0254", Nil))),
      Tok0("S", "$", Nil)))
  }

  test("refs collected at depths 0..2 only; deeper '#' stays a string") {
    val d = docOf("#1= IFCX(#2,(#3,(#4,(#5))),$);")
    val flat = Tokenizer.tokenizeDoc(d).toVector.filter(_.line_id >= 0).head
    assert(flat.refs.sorted == Seq(2L, 3L, 4L))
    val st = Tokenizer.parseStatement("d1", "x", 0, "1= IFCX(#2,(#3,(#4,(#5))),$);")
    val deep = st.args(1).sub(1).sub(1)
    assert(deep == Tok2("L", "", Seq(Tok3("S", "#5"))))
  }

  test("span sequence is never perturbed (per-row invariant)") {
    import spark.implicits._
    val docs = spark.createDataset(FixtureDocs.docs())
    val before = docs.collect().map(d => d.doc_id -> d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))).toMap
    // run the full tokenize stage, then re-read the same dataset
    Tokenizer.stmts(docs).count()
    val after = docs.collect().map(d => d.doc_id -> d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))).toMap
    assert(before == after)
    // and assembled text round-trips the original file for line-packed fixtures
    val d1 = FixtureDocs.doc(1)
    val orig = java.nio.file.Files.readString(FixtureDocs.ifcPath(1))
    assert(Tokenizer.assembleText(d1) == orig)
  }

  test("IFC4x1 and IFC4x3_RC1 dictionaries convert simple documents") {
    import spark.implicits._
    for ((decl, ns) <- Seq("IFC4X1" -> "IFC4_1/", "IFC4X3_RC1" -> "IFC4_3/RC1/")) {
      val d = Doc(s"v-$decl", Seq(Span("text",
        s"ISO-10303-21;\nHEADER;\nFILE_SCHEMA(('$decl'));\nENDSEC;\nDATA;\n" +
          "#2= IFCORGANIZATION($,'Org',$,$,$);\nENDSEC;\n", "", 0)))
      val r = graft.operators.Pipeline.run(spark.createDataset(Seq(d)), "http://b/")
      val rows = r.triples.collect()
      assert(rows.exists(_.getAs[String]("obj").contains(ns)), s"$decl ontology NS")
      assert(rows.exists(_.getAs[String]("pred").endsWith("name_IfcOrganization")), s"$decl literal attr")
      r.unpersist()
    }
  }

  test("duplicate line number: last parse wins (linemap.put overwrite)") {
    import spark.implicits._
    val d = docOf("#2= IFCORGANIZATION($,'first',$,$,$);\n#2= IFCORGANIZATION($,'second',$,$,$);")
    val stmts = spark.createDataset(Seq(d)).transform(ds => Tokenizer.stmts(ds))
    val linked = Linker.link(stmts).collect().filter(_.line_id >= 0)
    assert(linked.length == 1)
    assert(linked.head.body.contains("'second'"))
  }

  test("D1 dedup removes duplicate bodies and re-aliases refs") {
    import spark.implicits._
    val d = docOf(
      "#1= IFCAPPLICATION(#3,$,$,$);\n" +
        "#2= IFCORGANIZATION($,$,$,$,$);\n" +
        "#3= IFCORGANIZATION($,$,$,$,$);")
    val stmts = Tokenizer.stmts(spark.createDataset(Seq(d)))
    val linked = Linker.link(stmts, removeDuplicates = true).collect()
      .filter(_.line_id >= 0).sortBy(_.line_id)
    assert(linked.map(_.line_id).toSeq == Seq(1L, 2L)) // #3 removed as dup of #2
    val t = linked.head.targets
    assert(t.length == 1 && t.head.ref == 3L && t.head.line == 2L) // re-aliased
    assert(t.forall(_.keyword != null))
  }

  test("dangling ref produces a doc-abort marker") {
    import spark.implicits._
    val d = docOf("#1= IFCAPPLICATION(#99,$,$,$);")
    val r = graft.operators.Pipeline.run(spark.createDataset(Seq(d)), "http://b/")
    assert(r.triples.count() == 0) // whole doc aborted, headers included
    val ms = r.markers.collect()
    assert(ms.exists(_.kind == "dangling_ref"))
  }

  // property: parse(render(tree)) == tree for well-formed statements
  private val leafGen: Gen[String] =
    Gen.oneOf(Gen.choose(0, 999999).map(_.toString),
      Gen.alphaNumStr.map(s => "'" + s.take(12) + "'"),
      Gen.const("$"), Gen.const(".T."), Gen.const(".STEEL."))
  private def listGen(depth: Int): Gen[Seq[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, elemGen(depth)))
  private def elemGen(depth: Int): Gen[String] =
    if (depth >= 3) leafGen
    else Gen.frequency(
      4 -> leafGen,
      2 -> Gen.choose(1, 99).map("#" + _),
      1 -> listGen(depth + 1).map(_.mkString("(", ",", ")")))

  test("property: tokenizer accepts arbitrary nested well-formed statements") {
    check(Prop.forAll(listGen(1), Gen.choose(1L, 9999L)) { (els, id) =>
      val stmt = s"$id= IFCWALL(${els.mkString(",")});"
      val st = Tokenizer.parseStatement("d", "IFC4_ADD2_TC1", 0, stmt)
      st.stmt.line_id == id && st.stmt.keyword == "IFCWALL" && st.args.length == els.length
    })
  }

  // round 6: Stage A's allocation-lean scanRefs must agree with the full
  // parse tree (parseStatement still builds it) on keyword and ordered refs
  // — compared through the public surfaces (tokenizeDoc vs parseStatement)
  private def scanVsTree(id: Long, body: String): Prop = {
    val stmtText = s"$id=$body"
    val doc = Doc("d", Seq(Span("text", "#" + stmtText, "", 0)))
    val scanned = Tokenizer.tokenizeDoc(doc).filter(_.line_id != -1L).toList
    val tree = Tokenizer.parseStatement("d", "", 0, stmtText).stmt
    Prop(scanned.length == 1 &&
      scanned.head.keyword == tree.keyword &&
      scanned.head.refs == tree.refs) :| s"body=<$body> scanned=${scanned.headOption
        .map(s => (s.keyword, s.refs))} tree=${(tree.keyword, tree.refs)}"
  }

  test("property: scanRefs ≡ parse tree on well-formed statements") {
    check(Prop.forAll(listGen(1), Gen.choose(1L, 9999L)) { (els, id) =>
      scanVsTree(id, s" IFCWALL(${els.mkString(",")});")
    })
  }

  test("property: scanRefs ≡ parse tree on adversarial bodies") {
    // hostile alphabet: quotes, refs, unbalanced parens, stray semicolons,
    // whitespace runs, '=' and '#' in odd places, unparseable ref ids
    val hostile = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("#12", "#", "#x", "# 3", "'a'", "''", "'#7'", "ab", "1",
        ".T.", "$", " ", "\t", "-", "+9"),
      3 -> Gen.oneOf("(", ")", ",", ";", "'", "="),
      1 -> Gen.oneOf("#92233720368547758079", "#-4", "(#8", "))", "( '", "#1'z'")))
      .map(_.mkString)
    check(Prop.forAll(hostile, Gen.choose(1L, 9999L)) { (body, id) =>
      scanVsTree(id, body)
    })
  }
}
