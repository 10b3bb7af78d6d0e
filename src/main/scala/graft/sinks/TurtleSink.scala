package graft.sinks

import graft.model.FinalTriple

/** Turtle serializer for per-document triple sets (SURVEY.md §2 S6).
  *
  * The reference streams Turtle through Jena's TURTLE_BLOCKS writer
  * (RDFWriter.java:95-99) with a raw comment header (IfcSpfReader.java:312-315).
  * Here Turtle is a presentation sink only — the system of record is the
  * partitioned triples table — so this serializer is deliberately simple:
  * prefixed names where possible, one triple per line, stable sort.
  */
object TurtleSink {

  private val prefixes = Seq(
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#",
    "owl" -> "http://www.w3.org/2002/07/owl#",
    "list" -> "https://w3id.org/list#",
    "express" -> "https://w3id.org/express#")

  def serialize(triples: Seq[FinalTriple], baseURI: String, ontNS: String): String = {
    val sw = new java.io.StringWriter
    writeTo(triples, sw, baseURI, ontNS)
    sw.toString
  }

  /** Incremental Turtle writer: one triple at a time in caller-supplied
    * order, O(1) state. The comment header is written on construction; the
    * `@base`/`@prefix` block lazily on the first triple (so an empty doc
    * produces only the comment header — same bytes `writeTo` always
    * emitted). This is what lets the corpus export stream a mega-doc
    * without ever holding its triple set on one heap. */
  final class Streamed(w: java.io.Writer, baseURI: String, ontNS: String) {
    w.write(s"# baseURI: $baseURI\r\n")
    w.write(s"# imports: ${ontNS.stripSuffix("#")}\r\n\r\n")
    private var started = false
    private val all = ("ifc" -> ontNS) +: ("inst" -> baseURI) +: prefixes

    private def term(iri: String): String =
      all.collectFirst {
        case (p, ns) if iri.startsWith(ns) && isLocal(iri.substring(ns.length)) =>
          s"$p:${iri.substring(ns.length)}"
      }.getOrElse(s"<$iri>")

    private def obj(t: FinalTriple): String =
      if (t.obj_kind == "iri") term(t.obj)
      else {
        val lex = t.obj.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case c => c.toString
        }
        if (t.obj_datatype.isEmpty || t.obj_datatype.endsWith("#string")) s""""$lex""""
        else s""""$lex"^^${term(t.obj_datatype)}"""
      }

    def write(t: FinalTriple): Unit = {
      if (!started) {
        w.write(s"@base <$baseURI> .\n")
        w.write(s"@prefix ifc: <$ontNS> .\n")
        w.write(s"@prefix inst: <$baseURI> .\n")
        prefixes.foreach { case (p, ns) => w.write(s"@prefix $p: <$ns> .\n") }
        w.write("\n")
        started = true
      }
      w.write(s"${term(t.subj)} ${term(t.pred)} ${obj(t)} .\n")
    }
  }

  /** Driver-side serialization of an in-memory triple set (tests / single-file
    * CLI): sorts, then streams through [[Streamed]]. */
  def writeTo(triples: Seq[FinalTriple], w: java.io.Writer,
              baseURI: String, ontNS: String): Unit = {
    val s = new Streamed(w, baseURI, ontNS)
    triples.sortBy(t => (t.subj, t.pred, t.obj)).foreach(s.write)
  }

  private def isLocal(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_' || c == '-')
}
