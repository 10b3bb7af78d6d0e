package graft.schema

import scala.collection.mutable.ArrayBuffer

/** Minimal Turtle subset reader.
  *
  * Parses exactly the Turtle subset used by (a) the machine-generated ifcOWL
  * ontology files (reference: /root/reference/src/main/resources/IFC4_ADD2_TC1.ttl)
  * and (b) the golden regression outputs
  * (reference: src/test/resources/convertIFCFileToOutputTTL/PiPauwel_IFCtoRDF_testN.ttl).
  * No Jena is available in this sandbox, so the dictionary compiler and the
  * golden-correctness harness share this reader.
  *
  * Supported: @prefix/@base (and SPARQL-style PREFIX/BASE), IRIREFs, prefixed
  * names, `a`, string literals (short/long, with escapes), numeric literals,
  * language tags, datatype suffixes, blank-node property lists `[...]`,
  * collections `(...)`, and `;` / `,` continuation. Comments (`# ...`) are
  * skipped outside of literals.
  */
object Turtle {

  sealed trait Term
  final case class Iri(value: String) extends Term
  final case class BNode(id: String) extends Term
  /** dt is the full datatype IRI; lang nonempty for language-tagged strings. */
  final case class Lit(lex: String, dt: String, lang: String = "") extends Term

  final case class Triple(s: Term, p: Term, o: Term)

  val RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val XSD_NS = "http://www.w3.org/2001/XMLSchema#"
  val rdfType: Iri = Iri(RDF_NS + "type")
  val rdfFirst: Iri = Iri(RDF_NS + "first")
  val rdfRest: Iri = Iri(RDF_NS + "rest")
  val rdfNil: Iri = Iri(RDF_NS + "nil")

  def parse(input: String): Vector[Triple] = new Parser(input).parseAll()

  private final class Parser(in: String) {
    private var pos = 0
    private var base = ""
    private val prefixes = scala.collection.mutable.HashMap[String, String]()
    private var bnodeCounter = 0
    private val out = ArrayBuffer[Triple]()

    def parseAll(): Vector[Triple] = {
      skipWs()
      while (pos < in.length) {
        if (peekDirective()) parseDirective()
        else {
          val s = parseSubject()
          parsePredicateObjectList(s)
          expect('.')
        }
        skipWs()
      }
      out.toVector
    }

    private def err(msg: String): Nothing = {
      val ctx = in.substring(math.max(0, pos - 40), math.min(in.length, pos + 40))
      throw new IllegalArgumentException(s"Turtle parse error at $pos: $msg near ...$ctx...")
    }

    private def skipWs(): Unit = {
      var done = false
      while (!done && pos < in.length) {
        val c = in.charAt(pos)
        if (c == '#') { while (pos < in.length && in.charAt(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else done = true
      }
    }

    private def peekDirective(): Boolean = {
      in.startsWith("@prefix", pos) || in.startsWith("@base", pos) ||
        in.regionMatches(true, pos, "PREFIX ", 0, 7) || in.regionMatches(true, pos, "BASE ", 0, 5)
    }

    private def parseDirective(): Unit = {
      val atStyle = in.charAt(pos) == '@'
      if (in.regionMatches(true, pos, if (atStyle) "@prefix" else "PREFIX", 0, if (atStyle) 7 else 6)) {
        pos += (if (atStyle) 7 else 6)
        skipWs()
        val pname = readUntil(':'); expect(':'); skipWs()
        val iri = parseIriRef()
        prefixes(pname.trim) = iri
        skipWs()
        if (atStyle) expect('.')
      } else {
        pos += (if (atStyle) 5 else 4)
        skipWs()
        base = parseIriRef()
        skipWs()
        if (atStyle) expect('.')
      }
    }

    private def readUntil(stop: Char): String = {
      val sb = new StringBuilder
      while (pos < in.length && in.charAt(pos) != stop) { sb.append(in.charAt(pos)); pos += 1 }
      sb.toString
    }

    private def expect(c: Char): Unit = {
      skipWs()
      if (pos >= in.length || in.charAt(pos) != c) err(s"expected '$c'")
      pos += 1
    }

    private def parseIriRef(): String = {
      expect('<')
      val sb = new StringBuilder
      while (pos < in.length && in.charAt(pos) != '>') { sb.append(in.charAt(pos)); pos += 1 }
      expect('>')
      val raw = sb.toString
      if (raw.startsWith("http") || raw.startsWith("urn") || base.isEmpty) raw else base + raw
    }

    private def freshBNode(): BNode = { bnodeCounter += 1; BNode("_:b" + bnodeCounter) }

    private def parseSubject(): Term = {
      skipWs()
      in.charAt(pos) match {
        case '<' => Iri(parseIriRef())
        case '[' => parseBlankNodePropertyList()
        case '(' => parseCollection()
        case '_' => parseBNodeLabel()
        case _   => parsePrefixedName()
      }
    }

    private def parseBNodeLabel(): BNode = {
      // _:label
      pos += 2
      val sb = new StringBuilder
      while (pos < in.length && (in.charAt(pos).isLetterOrDigit || in.charAt(pos) == '_' || in.charAt(pos) == '-')) {
        sb.append(in.charAt(pos)); pos += 1
      }
      BNode("_:" + sb.toString)
    }

    private def isLocalChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.' || c == '%'

    private def parsePrefixedName(): Iri = {
      val sb = new StringBuilder
      while (pos < in.length && in.charAt(pos) != ':' && !in.charAt(pos).isWhitespace) {
        sb.append(in.charAt(pos)); pos += 1
      }
      if (pos >= in.length || in.charAt(pos) != ':') err(s"expected prefixed name, got '$sb'")
      pos += 1
      val prefix = sb.toString
      val local = new StringBuilder
      while (pos < in.length && isLocalChar(in.charAt(pos))) { local.append(in.charAt(pos)); pos += 1 }
      // PN_LOCAL must not end with '.': a trailing dot is the statement terminator.
      var l = local.toString
      var trimmed = 0
      while (l.endsWith(".")) { l = l.dropRight(1); trimmed += 1 }
      pos -= trimmed
      val ns = prefixes.getOrElse(prefix, err(s"unknown prefix '$prefix'"))
      Iri(ns + l)
    }

    private def parsePredicate(): Iri = {
      skipWs()
      if (in.charAt(pos) == '<') Iri(parseIriRef())
      else if (in.charAt(pos) == 'a' && pos + 1 < in.length &&
        (in.charAt(pos + 1).isWhitespace)) { pos += 1; rdfType }
      else parsePrefixedName()
    }

    private def parsePredicateObjectList(s: Term): Unit = {
      var more = true
      while (more) {
        val p = parsePredicate()
        var moreObj = true
        while (moreObj) {
          val o = parseObject()
          out += Triple(s, p, o)
          skipWs()
          if (pos < in.length && in.charAt(pos) == ',') { pos += 1; skipWs() } else moreObj = false
        }
        skipWs()
        if (pos < in.length && in.charAt(pos) == ';') {
          // consume one or more ';' (empty items are legal Turtle)
          while (pos < in.length && in.charAt(pos) == ';') { pos += 1; skipWs() }
          // trailing ';' before '.' or ']' is legal
          if (pos < in.length && (in.charAt(pos) == '.' || in.charAt(pos) == ']')) more = false
        } else more = false
      }
    }

    private def parseBlankNodePropertyList(): BNode = {
      expect('[')
      val b = freshBNode()
      skipWs()
      if (in.charAt(pos) != ']') parsePredicateObjectList(b)
      expect(']')
      b
    }

    private def parseCollection(): Term = {
      expect('(')
      skipWs()
      if (in.charAt(pos) == ')') { pos += 1; return rdfNil }
      val head = freshBNode()
      var cur = head
      var first = true
      while (in.charAt(pos) != ')') {
        if (!first) {
          val nxt = freshBNode()
          out += Triple(cur, rdfRest, nxt)
          cur = nxt
        }
        val o = parseObject()
        out += Triple(cur, rdfFirst, o)
        first = false
        skipWs()
      }
      out += Triple(cur, rdfRest, rdfNil)
      pos += 1
      head
    }

    private def parseObject(): Term = {
      skipWs()
      in.charAt(pos) match {
        case '<' => Iri(parseIriRef())
        case '[' => parseBlankNodePropertyList()
        case '(' => parseCollection()
        case '_' => parseBNodeLabel()
        case '"' | '\'' => parseLiteral()
        case c if c.isDigit || c == '-' || c == '+' => parseNumber()
        case 't' if in.startsWith("true", pos) && boundaryAt(pos + 4) =>
          pos += 4; Lit("true", XSD_NS + "boolean")
        case 'f' if in.startsWith("false", pos) && boundaryAt(pos + 5) =>
          pos += 5; Lit("false", XSD_NS + "boolean")
        case _ => parsePrefixedName()
      }
    }

    private def boundaryAt(p: Int): Boolean =
      p >= in.length || !in.charAt(p).isLetterOrDigit

    private def parseNumber(): Lit = {
      val sb = new StringBuilder
      while (pos < in.length && (in.charAt(pos).isDigit || "+-.eE".indexOf(in.charAt(pos)) >= 0)) {
        sb.append(in.charAt(pos)); pos += 1
      }
      var s = sb.toString
      // a trailing '.' belongs to the statement terminator
      if (s.endsWith(".")) { s = s.dropRight(1); pos -= 1 }
      val dt =
        if (s.exists(c => c == 'e' || c == 'E')) XSD_NS + "double"
        else if (s.contains('.')) XSD_NS + "decimal"
        else XSD_NS + "integer"
      Lit(s, dt)
    }

    private def parseLiteral(): Lit = {
      val quote = in.charAt(pos)
      val long = in.startsWith(quote.toString * 3, pos)
      val lex = new StringBuilder
      if (long) {
        pos += 3
        while (!(in.startsWith(quote.toString * 3, pos))) {
          if (in.charAt(pos) == '\\') { lex.append(unescape()) }
          else { lex.append(in.charAt(pos)); pos += 1 }
        }
        pos += 3
      } else {
        pos += 1
        while (in.charAt(pos) != quote) {
          if (in.charAt(pos) == '\\') { lex.append(unescape()) }
          else { lex.append(in.charAt(pos)); pos += 1 }
        }
        pos += 1
      }
      // suffix
      if (pos < in.length && in.charAt(pos) == '@') {
        pos += 1
        val sb = new StringBuilder
        while (pos < in.length && (in.charAt(pos).isLetterOrDigit || in.charAt(pos) == '-')) {
          sb.append(in.charAt(pos)); pos += 1
        }
        Lit(lex.toString, RDF_NS + "langString", sb.toString)
      } else if (pos + 1 < in.length && in.charAt(pos) == '^' && in.charAt(pos + 1) == '^') {
        pos += 2
        val dt = if (in.charAt(pos) == '<') parseIriRef() else parsePrefixedName().value
        Lit(lex.toString, dt)
      } else Lit(lex.toString, XSD_NS + "string")
    }

    private def unescape(): String = {
      pos += 1 // consume backslash
      val c = in.charAt(pos); pos += 1
      c match {
        case 'n' => "\n"
        case 't' => "\t"
        case 'r' => "\r"
        case 'b' => "\b"
        case 'f' => "\f"
        case '"' => "\""
        case '\'' => "'"
        case '\\' => "\\"
        case 'u' =>
          val hex = in.substring(pos, pos + 4); pos += 4
          Integer.parseInt(hex, 16).toChar.toString
        case 'U' =>
          val hex = in.substring(pos, pos + 8); pos += 8
          new String(Character.toChars(Integer.parseInt(hex, 16)))
        case other => other.toString
      }
    }
  }
}
