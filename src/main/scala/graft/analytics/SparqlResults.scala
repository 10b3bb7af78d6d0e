package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** W3C SPARQL 1.1 Query Results serializers — CSV/TSV
  * (https://www.w3.org/TR/sparql11-results-csv-tsv/) and JSON
  * (https://www.w3.org/TR/sparql11-results-json/) — over the term-retaining
  * frames [[Sparql.selectTerms]] produces. The reference stack (Jena
  * ResultSetFormatter, IFCtoRDF's query-side companion) serializes result
  * sets on the driver; here every row renders through pure Column
  * expressions (concat / regexp_replace chains — whole-stage codegen'd), so
  * serialization is a narrow map stage that scales with the result set and
  * never collects. Only [[jsonDocument]] assembles a single in-memory
  * document, and it fail-fasts over an explicit row cap — the distributed
  * exports are the line forms.
  *
  * Term-kind fidelity: a column with a `name#kind` companion renders true
  * RDF term syntax (IRIs in `<>`, bnodes bare `_:`, literals quoted with
  * `@lang` / `^^<datatype>` suffixes in TSV, typed objects in JSON). A
  * column without companions (expression/aggregate projections, the graph
  * column) renders as a plain literal — all the engine's lexical data model
  * can claim for it. xsd:string datatypes are omitted per RDF 1.1 (they ARE
  * the plain literal type), matching the N-Triples sink's canonical rule.
  */
object SparqlResults {

  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  /** the result variables of a bindings frame: every non-companion column */
  def vars(df: DataFrame): Seq[String] = df.columns.filterNot(KgQuery.isMetaCol).toSeq

  private def kindOf(df: DataFrame, n: String): Column =
    if (df.columns.contains(KgQuery.metaCol(n, "kind"))) col(KgQuery.metaCol(n, "kind"))
    else lit("literal")
  // datatype/lang companions are OPTIONAL: an absent column means "no such
  // metadata" and its render branch is dropped at BUILD time — threading a
  // lit("") placeholder instead would plan a constant-false compare per
  // term and spam Spark's trivially-true-equals warning on every render
  private def dtOf(df: DataFrame, n: String): Option[Column] =
    if (df.columns.contains(KgQuery.metaCol(n, "datatype")))
      Some(col(KgQuery.metaCol(n, "datatype"))) else None
  private def langOf(df: DataFrame, n: String): Option[Column] =
    if (df.columns.contains(KgQuery.metaCol(n, "lang")))
      Some(col(KgQuery.metaCol(n, "lang"))) else None

  /** first-match when-chain over the present branches; `dflt` when none */
  private def chain(branches: Seq[(Column, Column)], dflt: Column): Column =
    branches.foldRight(dflt) { case ((c, v), acc) => when(c, v).otherwise(acc) }

  // ------------------------------------------------------------------ CSV

  /** RFC 4180 field: quote iff the value contains comma/quote/CR/LF, with
    * inner quotes doubled. Per the CSV results spec, terms render in plain
    * lexical form — IRIs bare, literals untagged, bnodes keep `_:` (which
    * the store's value columns already carry). Unbound → empty field. */
  private def csvField(c: Column): Column = {
    val v = coalesce(c.cast("string"), lit(""))
    when(v.rlike("[,\"\r\n]"),
      concat(lit("\""), regexp_replace(v, "\"", "\"\""), lit("\""))).otherwise(v)
  }

  /** one `(ord, line)` row per solution (ord 1) plus the header (ord 0);
    * `df.orderBy` survives into the line frame if the caller sorted */
  def csv(df: DataFrame): DataFrame = {
    val vs = vars(df)
    val header = df.sparkSession.range(1)
      .select(lit(0L).as("ord"), lit(vs.mkString(",")).as("line"))
    header.unionByName(df.select(lit(1L).as("ord"),
      concat_ws(",", vs.map(n => csvField(col(n))): _*).as("line")))
  }

  // ------------------------------------------------------------------ TSV

  /** TSV literal escapes (the spec reuses Turtle's): \ " \n \r \t */
  private def tsvEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")

  /** full SPARQL term syntax for one column (the TSV results rule) */
  private def tsvTerm(df: DataFrame, n: String): Column = {
    // cast up front: typed result columns (aggregates, xsd casts) render
    // their lexical form, and CaseWhen branch unification stays STRING
    val v = col(n).cast("string")
    val suffix = chain(
      langOf(df, n).map(l => (l =!= "", concat(lit("@"), l))).toSeq ++
        dtOf(df, n).map(d => (d =!= "" && d =!= XsdString,
          concat(lit("^^<"), d, lit(">")))).toSeq,
      lit(""))
    when(v.isNull, lit(""))
      .when(kindOf(df, n) === "iri", concat(lit("<"), v, lit(">")))
      .when(kindOf(df, n) === "bnode", v)
      .otherwise(concat(lit("\""), tsvEscape(v), lit("\""), suffix))
  }

  /** one `(ord, line)` row per solution plus the `?var` header (ord 0) */
  def tsv(df: DataFrame): DataFrame = {
    val vs = vars(df)
    val header = df.sparkSession.range(1)
      .select(lit(0L).as("ord"), lit(vs.map("?" + _).mkString("\t")).as("line"))
    header.unionByName(df.select(lit(1L).as("ord"),
      concat_ws("\t", vs.map(n => tsvTerm(df, n)): _*).as("line")))
  }

  // ----------------------------------------------------------------- JSON

  /** JSON string escapes: \ " and the named control chars (the stores carry
    * no other control characters — the tokenizer rejects them upstream) */
  private def jsonEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t"), "[\b]", "\\\\b")

  /** `"name":{"type":…,"value":…}` fragment, NULL when unbound (unbound
    * variables are omitted from a JSON binding per the spec) */
  private def jsonBinding(df: DataFrame, n: String): Column = {
    val v = col(n).cast("string")
    val tpe = when(kindOf(df, n) === "iri", lit("uri"))
      .when(kindOf(df, n) === "bnode", lit("bnode"))
      .otherwise(lit("literal"))
    val litSuffix = chain(
      langOf(df, n).map(l => (l =!= "", concat(lit("\",\"xml:lang\":\""), l))).toSeq ++
        dtOf(df, n).map(d => (d =!= "" && d =!= XsdString,
          concat(lit("\",\"datatype\":\""), jsonEscape(d)))).toSeq,
      lit(""))
    val suffix = when(tpe =!= "literal", lit("")).otherwise(litSuffix)
    // bnode JSON values drop the `_:` prefix (the label alone is the value)
    val value = when(tpe === "bnode", v.substr(lit(3), length(v))).otherwise(v)
    when(v.isNull, lit(null).cast("string"))
      .otherwise(concat(lit("\"" + n + "\":{\"type\":\""), tpe,
        lit("\",\"value\":\""), jsonEscape(value), suffix, lit("\"}")))
  }

  /** one solution per row: the `{…}` binding object of the JSON results
    * format, emitted as JSON-lines (the distributed export shape) */
  def jsonLines(df: DataFrame): DataFrame = {
    val vs = vars(df)
    df.select(concat(lit("{"),
      concat_ws(",", vs.map(n => jsonBinding(df, n)): _*), lit("}")).as("line"))
  }

  // ------------------------------------------------------------------ XML

  /** XML text-node escapes (attribute positions add the quote) */
  private def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
  private def xmlAttrEscape(c: Column): Column =
    regexp_replace(xmlEscape(c), "\"", "&quot;")

  /** `<binding name="v">…</binding>` fragment, NULL when unbound (unbound
    * variables are omitted from a result element per the XML results spec) */
  private def xmlBinding(df: DataFrame, n: String): Column = {
    val v = col(n).cast("string")
    val kind = kindOf(df, n)
    val openTag = chain(
      langOf(df, n).map(l => (l =!= "",
        concat(lit("<literal xml:lang=\""), xmlAttrEscape(l), lit("\">")))).toSeq ++
        dtOf(df, n).map(d => (d =!= "" && d =!= XsdString,
          concat(lit("<literal datatype=\""), xmlAttrEscape(d), lit("\">")))).toSeq,
      lit("<literal>"))
    val term = when(kind === "iri", concat(lit("<uri>"), xmlEscape(v), lit("</uri>")))
      .when(kind === "bnode",
        concat(lit("<bnode>"), xmlEscape(v.substr(lit(3), length(v))), lit("</bnode>")))
      .otherwise(concat(openTag, xmlEscape(v), lit("</literal>")))
    when(v.isNull, lit(null).cast("string"))
      .otherwise(concat(lit("<binding name=\"" + n + "\">"), term, lit("</binding>")))
  }

  /** W3C SPARQL Results XML as `(ord, line)` rows: ord 0 = the document
    * head through `<results>`, ord 1 = one `<result>` element per solution,
    * ord 2 = the closing tags — sort by ord (solutions in any order, RDF
    * result sets are unordered unless the query sorted) to reassemble. */
  def xml(df: DataFrame): DataFrame = {
    val vs = vars(df)
    val headLine = "<?xml version=\"1.0\"?>" +
      "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\"><head>" +
      vs.map(v => s"""<variable name="$v"/>""").mkString + "</head><results>"
    val header = df.sparkSession.range(1)
      .select(lit(0L).as("ord"), lit(headLine).as("line"))
    val footer = df.sparkSession.range(1)
      .select(lit(2L).as("ord"), lit("</results></sparql>").as("line"))
    header.unionByName(df.select(lit(1L).as("ord"),
      concat(lit("<result>"),
        concat_ws("", vs.map(n => xmlBinding(df, n)): _*),
        lit("</result>")).as("line"))).unionByName(footer)
  }

  // -------------------------------------------------------- ASK (boolean)

  /** W3C JSON boolean result document for an ASK answer — the results-JSON
    * spec's scalar form (`{"head":{},"boolean":…}`). Boolean results are
    * driver-sized by construction; no distributed form exists or is needed.
    * CSV/TSV define no boolean form (their spec covers SELECT only), so ASK
    * has exactly these two documents. */
  def askJson(answer: Boolean): String =
    s"""{"head":{},"boolean":$answer}"""

  /** W3C XML boolean result document for an ASK answer
    * (`<sparql…><head/><boolean>…</boolean></sparql>`). */
  def askXml(answer: Boolean): String =
    "<?xml version=\"1.0\"?>" +
      "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">" +
      s"<head/><boolean>$answer</boolean></sparql>"

  /** the complete `{"head":…,"results":…}` document — DRIVER-SIDE assembly
    * of a result set that must fit in memory; refuses result sets over
    * `maxRows` with a named error instead of an opaque OOM (the same
    * fail-fast contract as AnnOps.bruteForceTopK). */
  def jsonDocument(df: DataFrame, maxRows: Int = 100000): String = {
    val lines = jsonLines(df).limit(maxRows + 1).collect().map(_.getString(0))
    require(lines.length <= maxRows,
      s"jsonDocument: result set exceeds maxRows=$maxRows — " +
        "use jsonLines for a distributed export")
    val head = vars(df).map(v => "\"" + v + "\"").mkString(",")
    s"""{"head":{"vars":[$head]},"results":{"bindings":[${lines.mkString(",")}]}}"""
  }
}
