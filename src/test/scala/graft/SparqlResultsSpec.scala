package graft

import graft.analytics.{Sparql, SparqlResults}
import org.apache.spark.sql.DataFrame

/** W3C SPARQL 1.1 Results serializers over term-retaining SELECT frames:
  * CSV (plain lexical + RFC 4180 quoting), TSV (full term syntax with
  * lang/datatype suffixes and Turtle escapes), JSON (typed binding objects,
  * unbound omission, document assembly with the fail-fast cap). */
class SparqlResultsSpec extends SparkTestBase {

  /** typed store: the NT-source schema (obj_kind/obj_datatype/obj_lang) */
  private def typedStore(rows: Seq[(String, String, String, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang")
  }

  private val xsdInt = "http://www.w3.org/2001/XMLSchema#integer"
  private val xsdStr = "http://www.w3.org/2001/XMLSchema#string"
  private val store = typedStore(Seq(
    ("g1", "http://e/s1", "http://e/name", "chat", "literal", "", "en"),
    ("g1", "http://e/s1", "http://e/size", "42", "literal", xsdInt, ""),
    ("g1", "http://e/s1", "http://e/ref", "http://e/s2", "iri", "", ""),
    ("g1", "http://e/s1", "http://e/plain", "x,\"y\"\nz", "literal", xsdStr, ""),
    ("g1", "_:b0", "http://e/name", "anon", "literal", "", "")))

  private def terms(text: String): DataFrame = Sparql.selectTerms(store, text)

  private def lines(df: DataFrame): Seq[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(x => (x._1, x._2))

  test("selectTerms keeps kind/datatype/lang companions for projected vars") {
    val got = terms("SELECT ?s ?v WHERE { ?s <http://e/name> ?v }")
    assert(got.columns.toSet ==
      Set("graph", "s", "v", "s#kind", "v#kind", "v#datatype", "v#lang"))
    val byV = got.collect().map(r => (r.getAs[String]("v"),
      r.getAs[String]("s#kind"), r.getAs[String]("v#kind"), r.getAs[String]("v#lang"))).toSet
    assert(byV == Set(("chat", "iri", "literal", "en"), ("anon", "bnode", "literal", "")))
  }

  test("selectTerms renames companions through a (?v AS ?w) variable alias") {
    val got = terms("SELECT (?v AS ?w) WHERE { ?s <http://e/size> ?v }")
    assert(got.columns.contains("w#kind") && got.columns.contains("w#datatype"))
    val r = got.collect().map(x => (x.getAs[String]("w"),
      x.getAs[String]("w#kind"), x.getAs[String]("w#datatype"))).toSet
    assert(r == Set(("42", "literal", xsdInt)))
  }

  test("CSV: header + plain lexical fields, RFC 4180 quoting") {
    val got = lines(SparqlResults.csv(
      terms("SELECT ?p ?v WHERE { <http://e/s1> ?p ?v }").drop("graph")))
    assert(got.head == (0L, "p,v"))
    val data = got.filter(_._1 == 1L).map(_._2).toSet
    assert(data == Set(
      "http://e/name,chat",
      "http://e/size,42",
      "http://e/ref,http://e/s2",
      "http://e/plain,\"x,\"\"y\"\"\nz\""))
  }

  test("TSV: full term syntax — IRIs <>, lang @, typed ^^, xsd:string bare, bnode bare") {
    val got = lines(SparqlResults.tsv(
      terms("SELECT ?s ?v WHERE { ?s ?p ?v }").drop("graph")))
    assert(got.head == (0L, "?s\t?v"))
    val data = got.filter(_._1 == 1L).map(_._2).toSet
    assert(data == Set(
      "<http://e/s1>\t\"chat\"@en",
      "<http://e/s1>\t\"42\"^^<" + xsdInt + ">",
      "<http://e/s1>\t<http://e/s2>",
      "<http://e/s1>\t\"x,\\\"y\\\"\\nz\"",
      "_:b0\t\"anon\""))
  }

  test("TSV: unbound OPTIONAL variable renders as an empty field") {
    val got = lines(SparqlResults.tsv(terms(
      """SELECT ?s ?r WHERE { ?s <http://e/name> ?v
         OPTIONAL { ?s <http://e/ref> ?r } }""").drop("graph")))
    val data = got.filter(_._1 == 1L).map(_._2).toSet
    assert(data == Set("<http://e/s1>\t<http://e/s2>", "_:b0\t"))
  }

  test("JSON lines: typed bindings, lang/datatype fields, bnode label, unbound omitted") {
    val got = SparqlResults.jsonLines(terms(
      """SELECT ?s ?v ?r WHERE { ?s <http://e/name> ?v
         OPTIONAL { ?s <http://e/ref> ?r } }""").drop("graph"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set(
      """{"s":{"type":"uri","value":"http://e/s1"},"v":{"type":"literal","value":"chat","xml:lang":"en"},"r":{"type":"uri","value":"http://e/s2"}}""",
      """{"s":{"type":"bnode","value":"b0"},"v":{"type":"literal","value":"anon"}}"""))
  }

  test("JSON lines: string escapes and numeric datatype annotation") {
    val got = SparqlResults.jsonLines(terms(
      "SELECT ?v WHERE { ?s <http://e/plain> ?v }").drop("graph"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("""{"v":{"type":"literal","value":"x,\"y\"\nz"}}"""))
    val typed = SparqlResults.jsonLines(terms(
      "SELECT ?v WHERE { ?s <http://e/size> ?v }").drop("graph"))
      .collect().map(_.getString(0)).toSet
    assert(typed == Set(
      s"""{"v":{"type":"literal","value":"42","datatype":"$xsdInt"}}"""))
  }

  test("jsonDocument assembles head+bindings; cap fail-fasts with a named error") {
    val doc = SparqlResults.jsonDocument(
      terms("SELECT ?v WHERE { ?s <http://e/size> ?v }").drop("graph"))
    assert(doc.startsWith("""{"head":{"vars":["v"]},"results":{"bindings":["""))
    assert(doc.contains("\"value\":\"42\""))
    assert(doc.endsWith("]}}"))
    val e = intercept[IllegalArgumentException] {
      SparqlResults.jsonDocument(
        terms("SELECT ?s ?p ?v WHERE { ?s ?p ?v }").drop("graph"), maxRows = 2)
    }
    assert(e.getMessage.contains("maxRows"))
  }

  test("SELECT * under selectTerms carries companions for every bound variable") {
    val got = terms("SELECT * WHERE { ?s <http://e/name> ?v }")
    assert(got.columns.contains("s#kind") && got.columns.contains("v#kind")
      && got.columns.contains("v#lang"))
  }

  test("XML: document structure, typed bindings, entity escapes, unbound omitted") {
    val esc = typedStore(Seq(
      ("g1", "http://e/s1", "http://e/name", "a<b>&c", "literal", "", "en"),
      ("g1", "http://e/s1", "http://e/size", "42", "literal", xsdInt, ""),
      ("g1", "_:b0", "http://e/name", "anon", "literal", "", "")))
    val got = lines(SparqlResults.xml(Sparql.selectTerms(esc,
      """SELECT ?s ?v ?r WHERE { ?s <http://e/name> ?v
         OPTIONAL { ?s <http://e/size> ?r } }""").drop("graph")))
    assert(got.head == (0L, "<?xml version=\"1.0\"?>" +
      "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\"><head>" +
      "<variable name=\"s\"/><variable name=\"v\"/><variable name=\"r\"/>" +
      "</head><results>"))
    assert(got.last == (2L, "</results></sparql>"))
    val data = got.filter(_._1 == 1L).map(_._2).toSet
    assert(data == Set(
      "<result><binding name=\"s\"><uri>http://e/s1</uri></binding>" +
        "<binding name=\"v\"><literal xml:lang=\"en\">a&lt;b&gt;&amp;c</literal></binding>" +
        "<binding name=\"r\"><literal datatype=\"" + xsdInt + "\">42</literal></binding></result>",
      "<result><binding name=\"s\"><bnode>b0</bnode></binding>" +
        "<binding name=\"v\"><literal>anon</literal></binding></result>"))
  }

  test("grouped SELECT: group-key term kinds survive aggregation (min facet)") {
    val got = terms(
      """SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s ?p ?v } GROUP BY ?s""")
    assert(got.columns.contains("s#kind"))
    val m = got.collect().map(r => (r.getAs[String]("s"),
      r.getAs[String]("s#kind"), r.getAs[Long]("n"))).toSet
    assert(m == Set(("http://e/s1", "iri", 4L), ("_:b0", "bnode", 1L)))
    // and the TSV renderer uses it: the key renders as a term, the count
    // (aggregate, no companion) as a plain literal
    val t = lines(SparqlResults.tsv(got)).filter(_._1 == 1L).map(_._2).toSet
    assert(t == Set("<http://e/s1>\t\"4\"", "_:b0\t\"1\""))
  }

  test("serializers degrade to plain literals on a kind-less store") {
    import spark.implicits._
    val bare = Seq(("g1", "s1", "p1", "o1")).toDF("doc_id", "subj", "pred", "obj")
    val got = lines(SparqlResults.tsv(
      Sparql.selectTerms(bare, "SELECT ?o WHERE { ?s ?p ?o }").drop("graph")))
    // object position without obj_kind: no companion -> quoted literal
    assert(got.filter(_._1 == 1L).map(_._2) == Seq("\"o1\""))
  }
}
