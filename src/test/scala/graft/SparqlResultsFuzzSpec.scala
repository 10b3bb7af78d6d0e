package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property fuzz for the SPARQL Results serializers: random typed stores
  * whose values are stuffed with every escapable character (quote,
  * backslash, tab, CR, LF, comma, backspace, &, <, >, unicode) run through
  * the REAL column-expression renderers (csv/tsv/jsonLines/xml over
  * selectTerms), compared against brute-force Scala renderers written
  * directly from the W3C format rules (RFC 4180 quoting, Turtle escapes,
  * JSON escapes, XML entities) — no shared code with SparqlResults. */
class SparqlResultsFuzzSpec extends SparkTestBase {

  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  private val XsdInt = "http://www.w3.org/2001/XMLSchema#integer"

  // id, subj, pred, obj, obj_kind, obj_datatype, obj_lang
  private type Row7 = (String, String, String, String, String, String, String)

  // ---- brute-force renderers (straight from the specs) ----

  private def csvField(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def turtleEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  private def jsonEsc(s: String): String =
    turtleEsc(s).replace("\b", "\\b")

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def tsvTerm(v: String, kind: String, dt: String, lang: String): String =
    kind match {
      case "iri" => s"<$v>"
      case "bnode" => v
      case _ =>
        val suffix =
          if (lang.nonEmpty) "@" + lang
          else if (dt.nonEmpty && dt != XsdString) s"^^<$dt>"
          else ""
        "\"" + turtleEsc(v) + "\"" + suffix
    }

  private def jsonTerm(name: String, v: String, kind: String, dt: String, lang: String): String =
    kind match {
      case "iri" => s""""$name":{"type":"uri","value":"${jsonEsc(v)}"}"""
      case "bnode" => s""""$name":{"type":"bnode","value":"${jsonEsc(v.drop(2))}"}"""
      case _ =>
        val suffix =
          if (lang.nonEmpty) "\",\"xml:lang\":\"" + lang
          else if (dt.nonEmpty && dt != XsdString) "\",\"datatype\":\"" + jsonEsc(dt)
          else ""
        "\"" + name + "\":{\"type\":\"literal\",\"value\":\"" + jsonEsc(v) + suffix + "\"}"
    }

  private def xmlTerm(name: String, v: String, kind: String, dt: String, lang: String): String = {
    val inner = kind match {
      case "iri" => s"<uri>${xmlEsc(v)}</uri>"
      case "bnode" => s"<bnode>${xmlEsc(v.drop(2))}</bnode>"
      case _ =>
        val open =
          if (lang.nonEmpty) s"""<literal xml:lang="${xmlEsc(lang).replace("\"", "&quot;")}">"""
          else if (dt.nonEmpty && dt != XsdString)
            s"""<literal datatype="${xmlEsc(dt).replace("\"", "&quot;")}">"""
          else "<literal>"
        open + xmlEsc(v) + "</literal>"
    }
    s"""<binding name="$name">$inner</binding>"""
  }

  private def subjKind(s: String): String = if (s.startsWith("_:")) "bnode" else "iri"

  // ---- generator ----

  private val nasty: Gen[String] = {
    val ch = Gen.frequency(
      4 -> Gen.alphaNumChar,
      1 -> Gen.oneOf(',', '"', '\\', '\n', '\r', '\t', '\b', '&', '<', '>', '@', 'é', '本'))
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, ch).map(_.mkString))
  }

  private val rowGen: Gen[Row7] = for {
    g <- Gen.oneOf("g0", "g1")
    subj <- Gen.oneOf(Gen.const("http://e/s1"), Gen.const("http://e/s2"),
      Gen.alphaLowerStr.map(l => "_:b" + l.take(4)))
    pred <- Gen.oneOf("http://e/p1", "http://e/p2")
    kind <- Gen.frequency(3 -> Gen.const("literal"), 1 -> Gen.const("iri"),
      1 -> Gen.const("bnode"))
    obj <- kind match {
      case "iri" => Gen.const("http://e/o1")
      case "bnode" => Gen.alphaLowerStr.map(l => "_:o" + l.take(4))
      case _ => nasty
    }
    dt <- Gen.oneOf("", XsdString, XsdInt)
    lang <- Gen.oneOf("", "en", "fr-CA")
  } yield (g, subj, pred, obj, kind, if (kind == "literal") dt else "",
    if (kind == "literal") lang else "")

  private val storeGen: Gen[List[Row7]] =
    Gen.choose(1, 12).flatMap(Gen.listOfN(_, rowGen))

  test("csv/tsv/json/xml match brute-force spec renderers on random stores") {
    val s = spark
    import s.implicits._
    val prop = Prop.forAll(storeGen) { rows =>
      val store = rows.toDF("doc_id", "subj", "pred", "obj",
        "obj_kind", "obj_datatype", "obj_lang")
      val b = graft.analytics.Sparql.selectTerms(store,
        "SELECT ?s ?p ?v WHERE { ?s ?p ?v }")

      def sortedLines(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(r => r.getLong(0) + "|" + r.getString(1)).toSeq.sorted

      val gotCsv = sortedLines(graft.analytics.SparqlResults.csv(b))
      val gotTsv = sortedLines(graft.analytics.SparqlResults.tsv(b))
      val gotXml = sortedLines(graft.analytics.SparqlResults.xml(b))
      val gotJson = graft.analytics.SparqlResults.jsonLines(b)
        .collect().map(_.getString(0)).toSeq.sorted

      val wantCsv = ("0|graph,s,p,v" +: rows.map { case (g, s0, p, o, _, _, _) =>
        "1|" + Seq(g, s0, p, o).map(csvField).mkString(",") }).sorted
      val wantTsv = ("0|?graph\t?s\t?p\t?v" +: rows.map { case (g, s0, p, o, k, dt, lg) =>
        "1|" + Seq("\"" + turtleEsc(g) + "\"", tsvTerm(s0, subjKind(s0), "", ""),
          s"<$p>", tsvTerm(o, k, dt, lg)).mkString("\t") }).sorted
      val wantJson = rows.map { case (g, s0, p, o, k, dt, lg) =>
        "{" + Seq(jsonTerm("graph", g, "literal", "", ""),
          jsonTerm("s", s0, subjKind(s0), "", ""), jsonTerm("p", p, "iri", "", ""),
          jsonTerm("v", o, k, dt, lg)).mkString(",") + "}" }.sorted
      val xmlHead = "0|<?xml version=\"1.0\"?>" +
        "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\"><head>" +
        "<variable name=\"graph\"/><variable name=\"s\"/><variable name=\"p\"/>" +
        "<variable name=\"v\"/></head><results>"
      val wantXml = (xmlHead +: "2|</results></sparql>" +:
        rows.map { case (g, s0, p, o, k, dt, lg) =>
          "1|<result>" + xmlTerm("graph", g, "literal", "", "") +
            xmlTerm("s", s0, subjKind(s0), "", "") + xmlTerm("p", p, "iri", "", "") +
            xmlTerm("v", o, k, dt, lg) + "</result>" }).sorted

      val checks = Seq(("csv", gotCsv, wantCsv), ("tsv", gotTsv, wantTsv),
        ("json", gotJson, wantJson), ("xml", gotXml, wantXml))
      checks.find(c => c._2 != c._3) match {
        case Some((fmt, got, want)) =>
          println(s"$fmt MISMATCH\nROWS: $rows\nGOT:  $got\nWANT: $want"); false
        case None => true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
