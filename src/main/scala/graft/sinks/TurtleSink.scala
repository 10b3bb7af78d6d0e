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

  /** Stream the serialization into `w` instead of building the whole payload
    * string (the per-doc sort still needs the rows in memory — that envelope
    * is bounded by the tokenizer's maxDocChars guard — but a mega-doc export
    * no longer holds rows + full payload text simultaneously). */
  def writeTo(triples: Seq[FinalTriple], w: java.io.Writer,
              baseURI: String, ontNS: String): Unit = {
    def append(x: String): Unit = w.write(x)
    append(s"# baseURI: $baseURI\r\n")
    append(s"# imports: ${ontNS.stripSuffix("#")}\r\n\r\n")
    if (triples.isEmpty) return
    append(s"@base <$baseURI> .\n")
    append(s"@prefix ifc: <$ontNS> .\n")
    append(s"@prefix inst: <$baseURI> .\n")
    prefixes.foreach { case (p, ns) => append(s"@prefix $p: <$ns> .\n") }
    append("\n")
    val all = ("ifc" -> ontNS) +: ("inst" -> baseURI) +: prefixes

    def term(iri: String): String =
      all.collectFirst {
        case (p, ns) if iri.startsWith(ns) && isLocal(iri.substring(ns.length)) =>
          s"$p:${iri.substring(ns.length)}"
      }.getOrElse(s"<$iri>")

    def obj(t: FinalTriple): String =
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

    triples.sortBy(t => (t.subj, t.pred, t.obj)).foreach { t =>
      append(s"${term(t.subj)} ${term(t.pred)} ${obj(t)} .\n")
    }
  }

  private def isLocal(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_' || c == '-')
}
