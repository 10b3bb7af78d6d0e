package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-Triples serializer — the scale-grade RDF export format.
  *
  * Turtle (the reference's presentation format, IfcSpfReader.java:312-315) needs
  * per-document prefix blocks and grouping, so a Turtle corpus export funnels
  * through a per-doc collect. N-Triples is line-oriented and self-contained:
  * one triple per line, full IRIs, no document state — so a 100-TB corpus
  * exports as a narrow per-partition `write.text` with no shuffle, and the
  * output is splittable for whatever loads it next (every bulk loader —
  * Jena tdbloader, Virtuoso, Blazegraph — ingests N-Triples in parallel).
  *
  * The whole serialization is built from Catalyst expressions (concat /
  * regexp_replace), so it stays inside whole-stage codegen; no UDF.
  */
object NTriplesSink {

  /** Escape per N-Triples grammar (https://www.w3.org/TR/n-triples/#canonical-ntriples):
    * backslash first, then quote, LF, CR, TAB. */
  private def esc(c: Column): Column = {
    val s0 = regexp_replace(c, "\\\\", "\\\\\\\\")
    val s1 = regexp_replace(s0, "\"", "\\\\\"")
    val s2 = regexp_replace(s1, "\n", "\\\\n")
    val s3 = regexp_replace(s2, "\r", "\\\\r")
    regexp_replace(s3, "\t", "\\\\t")
  }

  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  /** One N-Triples line per row; input needs columns
    * (subj, pred, obj, obj_kind, obj_datatype) — plus obj_lang when
    * `withLang` (stores loaded from foreign NT/Turtle carry tags; the
    * pipeline's own output has none). A lang-tagged literal serializes as
    * `"lex"@tag` with NO datatype suffix (rdf:langString is implied by the
    * grammar); silently dropping the tag would alter the data — the same
    * loud-vs-lossy contract LOAD enforces on the way in. Blank-node terms
    * (`_:` subjects, obj_kind "bnode") serialize verbatim, not as IRIs. */
  def line(withLang: Boolean = false): Column =
    concat(tripleTerms(withLang), lit(" ."))

  /** The `<s> <p> o` term chain without the terminator — shared with the
    * N-Quads serializer, which appends a graph label before the '.'. */
  private[graft] def tripleTerms(withLang: Boolean): Column = {
    // xsd:string is the implicit datatype in RDF 1.1 — canonical N-Triples omits it
    val dtSuffix =
      when(col("obj_datatype") === "" || col("obj_datatype") === XsdString, lit(""))
        .otherwise(concat(lit("^^<"), col("obj_datatype"), lit(">")))
    val suffix =
      if (!withLang) dtSuffix // no lang column: no dead `lit("")` comparison
      else {
        val lang = coalesce(col("obj_lang"), lit(""))
        when(lang =!= "", concat(lit("@"), lang)).otherwise(dtSuffix)
      }
    val litTerm = concat(lit("\""), esc(col("obj")), lit("\""), suffix)
    val objTerm = when(col("obj_kind") === "iri", concat(lit("<"), col("obj"), lit(">")))
      .when(col("obj_kind") === "bnode", col("obj"))
      .otherwise(litTerm)
    val subjTerm = when(col("subj").startsWith("_:"), col("subj"))
      .otherwise(concat(lit("<"), col("subj"), lit(">")))
    concat(subjTerm, lit(" <"), col("pred"), lit("> "), objTerm)
  }

  /** Distributed export: one text part-file per partition, no shuffle.
    * Pass a pre-`repartition`ed frame to control output file count.
    * Language tags are emitted whenever the frame carries an obj_lang
    * column. */
  def write(triples: DataFrame, path: String): Unit =
    triples.select(line(withLang = triples.columns.contains("obj_lang")).as("value"))
      .write.mode("overwrite").text(path)

  /** Driver-side serialization of a small triple set (tests / CLI). */
  def serialize(triples: Seq[graft.model.FinalTriple]): String = {
    val sw = new java.io.StringWriter
    writeTo(triples, sw)
    sw.toString
  }

  /** Stream serialization into `w` (sorted per doc; the row Seq is the only
    * thing held — no whole-payload string next to it). */
  def writeTo(triples: Seq[graft.model.FinalTriple], w: java.io.Writer): Unit =
    triples.sortBy(t => (t.subj, t.pred, t.obj)).foreach(t => writeOne(t, w))

  /** One line in caller-supplied order — the O(1)-state streaming unit the
    * corpus export loops over (same bytes as `writeTo`, which sorts first). */
  def writeOne(t: graft.model.FinalTriple, w: java.io.Writer): Unit =
    w.write(s"${termsOf(t)} .\n")

  /** the `<s> <p> o` term chain, shared with the N-Quads driver-side writer */
  private[sinks] def termsOf(t: graft.model.FinalTriple): String = {
    def escS(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }
    val o =
      if (t.obj_kind == "iri") s"<${t.obj}>"
      else if (t.obj_datatype.isEmpty || t.obj_datatype == XsdString) s""""${escS(t.obj)}""""
      else s""""${escS(t.obj)}"^^<${t.obj_datatype}>"""
    s"<${t.subj}> <${t.pred}> $o"
  }
}
