package graft.operators

import graft.model._
import graft.schema.SchemaDict
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Stage A — spans → statements → token trees (SURVEY.md §2 S2/S5/P1).
  *
  * A whole document arrives as one input row (interleaved `spans`), so
  * statement re-assembly and tokenization are a narrow, shuffle-free typed
  * `flatMap` over `Dataset[Doc]` — each document is independent, which is what
  * makes Stage A embarrassingly parallel at 10^12-document scale. The span
  * sequence itself is never modified (per-row invariant).
  *
  * Semantics reproduced from the reference (fresh implementation):
  *  - schema sniff: first FILE_SCHEMA line, ordered substring matches
  *    (IfcSpfReader.getExpressSchema, IfcSpfReader.java:186-223);
  *  - statement assembly: lines starting with '#', physical lines concatenated
  *    (trimmed) until one contains ';' (IfcSpfParser.readModel,
  *    IfcSpfParser.java:24-58);
  *  - char-level state machine with paren stack and quote state; tokens are
  *    trimmed; the opening quote of a string is kept and the closing quote
  *    dropped ('' collapses to ') so that the writer-side filterExtras
  *    reproduces the reference lexical forms exactly
  *    (IfcSpfParser.parseIfcLineStatement, IfcSpfParser.java:60-145);
  *  - unparseable line numbers map to Long.MinValue (IfcSpfParser.java:261-267);
  *  - '#' tokens are reference tokens only at nesting depths 0..2 — deeper
  *    ones stay strings (IfcSpfParser.mapEntries resolves exactly three
  *    levels, IfcSpfParser.java:167-259).
  */
object Tokenizer {

  /** One parsed statement + its token tree. */
  final case class Parsed(stmt: Stmt, args: Seq[Tok0])

  def stmts(docs: Dataset[Doc])(implicit spark: SparkSession): Dataset[Stmt] = {
    import spark.implicits._
    docs.flatMap(tokenizeDoc _)
  }

  /** Structured candidate-mention table (token trees included) — the
    * judge-facing Stage A view; the hot path ships only the flat [[Stmt]]. */
  def tokenTable(docs: Dataset[Doc])(implicit spark: SparkSession): Dataset[TokStmt] = {
    import spark.implicits._
    docs.flatMap { d =>
      tokenizeDoc(d).filter(_.line_id >= 0).map { st =>
        TokStmt(st.doc_id, st.schema, st.line_id, st.keyword,
          parseStatement(st.doc_id, st.schema, st.seq, st.line_id.toString + "=" + st.body).args)
      }
    }
  }

  /** Reference: IfcSpfReader.getExpressSchema substring-match chain. */
  def sniffSchema(text: String): String = {
    text.linesIterator.foreach { line =>
      if (line.startsWith("FILE_SCHEMA")) {
        if (line.contains("IFC2X3")) return "IFC2X3_TC1"
        if (line.contains("IFC4x3")) return "IFC4x3_RC1"
        if (line.contains("IFC4X3")) return "IFC4x3_RC1"
        if (line.contains("IFC4X1")) return "IFC4x1"
        if (line.contains("IFC4x1")) return "IFC4x1"
        if (line.contains("IFC4")) return "IFC4_ADD2_TC1"
        return ""
      }
    }
    ""
  }

  /** Ordered concatenation of the text spans; media spans are skipped but
    * never disturb text order (offset-ordered). */
  def assembleText(doc: Doc): String = {
    // single-text-span fast path: the common shape needs no copy at all
    var only: String = null
    var nText = 0
    doc.spans.foreach { s =>
      if (s.kind == "text") { nText += 1; only = s.text }
    }
    if (nText == 1 && only != null) return only
    val sb = new StringBuilder
    doc.spans.sortBy(_.offset).foreach(s => if (s.kind == "text") sb.append(s.text))
    sb.toString
  }

  /** Sentinel statement emitted once per document (line_id = -1): carries the
    * sniffed schema so Stage C can emit the per-document ontology header
    * triples (RDFWriter.java:121-122) without a second scan of the input. */
  val DocSentinel = "<DOC>"

  def tokenizeDoc(doc: Doc): Iterator[Stmt] = tokenizeDoc(doc, None)

  /** Mega-doc guard default: a document is ONE input row, so its assembled
    * text (plus the parsed linemap) lives in a single task's heap — the same
    * whole-file envelope as the reference (README.md:34: 400 MB files, "often
    * twice" in memory). 512M chars ≈ 1 GiB of String heap before parse
    * buffers; beyond that the doc aborts with an `oversize_doc` marker
    * instead of risking an executor OOM that would fail the whole task. */
  val DefaultMaxDocChars: Long = 512L * 1024 * 1024

  /** `schemaOverride` mirrors the reference's explicit-schema entry point
    * (`convert(path, out, schema)`, IfcSpfReader.java:243-245, which accepts
    * the 4 non-sniffable versions IFC2X3_Final / IFC4 / IFC4_ADD1 / IFC4_ADD2
    * as well): when set, the FILE_SCHEMA sniff is bypassed entirely. */
  def tokenizeDoc(doc: Doc, schemaOverride: Option[String],
                  maxDocChars: Long = DefaultMaxDocChars): Iterator[Stmt] =
    tokenizeDocImpl(doc, schemaOverride, maxDocChars, keepTrees = false).map(_._1)

  /** Fused-path memory bound for kept parse trees: above this many assembled
    * chars a document's statements fall back to the re-parse path (tree
    * null) — the tree is a small constant factor over the text, but the
    * 512M-char oversize envelope times that factor is not a per-task
    * allowance worth granting for one mega-doc. 16M chars ≈ tens of MB of
    * tree per in-flight task at worst. */
  private[operators] val TreeKeepMaxChars: Long = 16L * 1024 * 1024

  /** Fused-path variant (round 6, guide §1.2 step 2): ONE automaton pass per
    * statement — each Stmt arrives with its parsed top-level nodes, the SAME
    * tree [[parseArgs]] would build in Stage C, so the fused loop never
    * re-tokenizes the body (the staged path keeps the two-pass split: the
    * tree is not shuffle-encodable, and Stage A only needs keyword + refs
    * there). Tree is null for sentinels, no-'='-statements (whose keyword ""
    * never reaches emission anyway — the emitter re-parses if asked) and
    * every statement of a doc above [[TreeKeepMaxChars]]. Statement-level
    * equivalence with [[tokenizeDoc]] is pinned by TokenizerSpec. */
  private[operators] def tokenizeDocParsed(doc: Doc, schemaOverride: Option[String],
      maxDocChars: Long = DefaultMaxDocChars): Iterator[(Stmt, ArrayBuffer[Node])] =
    tokenizeDocImpl(doc, schemaOverride, maxDocChars, keepTrees = true)

  /** The oversize-doc sentinel entry (shared with the InternalRow fused
    * path, which computes docChars without building Span objects). */
  private[operators] def oversizeEntry(docId: String, docChars: Long,
      maxDocChars: Long): Iterator[(Stmt, ArrayBuffer[Node])] =
    Iterator.single((Stmt(docId, "", -1L, -1L, DocSentinel,
      s"oversize_doc:$docChars chars > $maxDocChars", Nil, abort = true, -1L), null))

  private def tokenizeDocImpl(doc: Doc, schemaOverride: Option[String],
      maxDocChars: Long, keepTrees: Boolean): Iterator[(Stmt, ArrayBuffer[Node])] = {
    // oversize guard BEFORE text assembly (the span sizes are already known;
    // assembling would double the heap first). The sentinel rides the normal
    // in-band abort channel; Stage C surfaces it as an `oversize_doc` marker.
    // Exact bound: assembleText concatenates text-kind spans with NO
    // separator, so summing text-span lengths IS the assembled length.
    val docChars = doc.spans.iterator.map(s =>
      (if (s.kind == "text" && s.text != null) s.text.length.toLong else 0L)).sum
    if (docChars > maxDocChars)
      return oversizeEntry(doc.doc_id, docChars, maxDocChars)
    val keep = keepTrees && docChars <= TreeKeepMaxChars
    tokenizeText(doc.doc_id, assembleText(doc), schemaOverride, keep)
  }

  /** Statement scan over the assembled text — the shared core of the Doc
    * path and the InternalRow fused path (which assembles text itself). */
  private[operators] def tokenizeText(docId: String, text: String,
      schemaOverride: Option[String], keep: Boolean): Iterator[(Stmt, ArrayBuffer[Node])] = {
    val schema = schemaOverride.getOrElse(sniffSchema(text))
    // last-write-wins per line number, locally per doc — the whole document
    // is one input row, so the reference's linemap.put overwrite semantics
    // (IfcSpfParser.java:143) need no shuffle.
    // Index scan, not split("\n"): split copies every line and trim copies
    // each again — this walk allocates exactly ONE string per statement
    // (the scanStatement input), byte-identical to the split+trim result.
    val linemap = scala.collection.mutable.LinkedHashMap[Long, (Stmt, ArrayBuffer[Node])]()
    val n = text.length
    var pos = 0
    var seq = 0L
    @inline def trimStart(from: Int, to: Int): Int = {
      var a = from; while (a < to && text.charAt(a) <= ' ') a += 1; a
    }
    @inline def trimEnd(from: Int, to: Int): Int = {
      var b = to; while (b > from && text.charAt(b - 1) <= ' ') b -= 1; b
    }
    @inline def contains(from: Int, to: Int, c: Char): Boolean = {
      var k = from; while (k < to && text.charAt(k) != c) k += 1; k < to
    }
    while (pos < n) {
      var eol = text.indexOf('\n', pos)
      if (eol < 0) eol = n
      // statements start with '#' on the RAW line (pre-trim), as the
      // reference's linemap scan does
      if (eol > pos && text.charAt(pos) == '#') {
        val stmtText =
          if (contains(pos, eol, ';')) {
            // single-line fast path: one substring of the trimmed range,
            // leading '#' dropped (trim cannot remove it — it IS charAt(pos))
            text.substring(pos + 1, trimEnd(pos, eol))
          } else {
            // multi-line statement: append trimmed continuation lines until
            // one contains ';' (inclusive) or the document ends.
            // java.lang.StringBuilder: the scala one lacks the 3-arg slice
            // append, and auto-tupling silently turns it into append(Any)
            val sb = new java.lang.StringBuilder
            sb.append(text, pos + 1, trimEnd(pos, eol))
            var more = true
            while (more && eol < n) {
              val lineStart = eol + 1
              eol = text.indexOf('\n', lineStart)
              if (eol < 0) eol = n
              val ts = trimStart(lineStart, eol)
              sb.append(text, ts, trimEnd(ts, eol)) // ts-anchored: all-ws line appends ""
              more = !contains(lineStart, eol, ';')
            }
            sb.toString
          }
        val entry =
          if (keep) parseStatementNodes(docId, schema, seq, stmtText)
          else (scanStatement(docId, schema, seq, stmtText), null)
        linemap(entry._1.line_id) = entry
        seq += 1L
      }
      pos = eol + 1
    }

    // Per-document error flags, decided here (the whole document is local):
    //  - dangling refs (*ERROR 6/7/8*, IfcSpfParser.java:189-247) — any ref id
    //    absent from the final linemap — abort the document (the reference's
    //    file sink flushes nothing; goldens test6/test15 are empty);
    //  - an unrecognized or uncompiled schema version aborts too (the
    //    reference dies loading its dictionaries);
    //  - the first unknown keyword (*ERROR 2*, RDFWriter.java:160-163) sets
    //    the truncation line: statements at/after it emit nothing while
    //    earlier lines (and the pre-parse header triples) survive.
    val dangling = linemap.valuesIterator.flatMap(_._1.refs).find(r => !linemap.contains(r))
    val unsupported = schema.nonEmpty && !SchemaDict.available(schema)
    val abort = dangling.isDefined || unsupported
    val badLine: Long =
      if (schema.isEmpty || unsupported) -1L
      else {
        val dict = SchemaDict.load(schema)
        val bad = linemap.valuesIterator.filter { case (st, _) =>
          val k = SchemaDict.formatClassName(st.keyword)
          !dict.entities.contains(k) && !dict.types.contains(k)
        }.map(_._1.line_id)
        if (bad.isEmpty) -1L else bad.min
      }
    val detail =
      if (dangling.isDefined) "dangling_ref:#" + dangling.get
      else if (unsupported) "unsupported_schema:" + schema
      else ""
    Iterator.single((Stmt(docId, schema, -1L, -1L, DocSentinel, detail, Nil, abort, badLine), null: ArrayBuffer[Node])) ++
      linemap.valuesIterator.map { case (st, tree) =>
        (if (abort || badLine >= 0) st.copy(abort = abort, bad_line = badLine) else st, tree)
      }
  }

  private def toLong(s: String): Long =
    try s.toLong catch { case _: NumberFormatException => Long.MinValue }

  // mutable parse tree — Stage C's emitter walks these nodes DIRECTLY
  // (converting to the immutable Tok0..Tok3 encoding copied the whole tree
  // per statement; the Tok view remains for tokenTable / tests)
  private[operators] sealed trait Node
  private[operators] final case class SNode(v: String) extends Node
  private[operators] final case class RNode(id: Long, raw: String) extends Node
  private[operators] final class LNode(val children: ArrayBuffer[Node] = ArrayBuffer()) extends Node

  /** States 1..3 of the statement automaton (keyword, args with paren/comma
    * structure, quote bodies) over the text AFTER '='. Returns the raw
    * keyword and the top-level argument nodes.
    *
    * Span-based (round 6, the [[scanRefs]] trick applied to the tree build):
    * tokens are tracked as [start, end) spans of `body` and materialize as
    * ONE substring of the trimmed span — no char-by-char StringBuilder copy.
    * Only quote-bearing tokens rebuild through the collapse rules (opening
    * quote kept, closing dropped, '' collapses) — byte-identical content to
    * the former builder path, pinned by the round-trip / scanRefs / parsed-
    * variant property suites. */
  private[operators] def parseArgs(body: String): (String, ArrayBuffer[Node]) = {
    var keyword = ""
    val root = new LNode()
    var current = root
    val stack = ArrayBuffer[LNode]()
    var state = 1
    val n = body.length
    // keyword accumulator: contiguous fast path + builder fallback for
    // whitespace-split keywords (the automaton appends every non-ws char)
    var kwStart = -1
    var kwEnd = -1
    var kwSb: java.lang.StringBuilder = null
    // current token span; hasQuote forces the exact collapse rebuild
    var tokStart = -1
    var tokEnd = -1
    var hasQuote = false

    /** the former builder content of span [from, to): every char except each
      * quote section's CLOSING quote (opening kept, '' collapses) */
    def rebuilt(from: Int, to: Int): String = {
      val sb = new java.lang.StringBuilder(to - from)
      var i = from
      var inQ = false
      while (i < to) {
        val ch = body.charAt(i)
        if (inQ) { if (ch == '\'') inQ = false else sb.append(ch) }
        else { sb.append(ch); if (ch == '\'') inQ = true }
        i += 1
      }
      sb.toString
    }

    def flush(): Unit = {
      if (tokStart >= 0) {
        val t =
          if (!hasQuote) {
            var a = tokStart
            var b = tokEnd
            while (a < b && body.charAt(a) <= ' ') a += 1
            while (b > a && body.charAt(b - 1) <= ' ') b -= 1
            if (b > a) body.substring(a, b) else null
          } else {
            val s0 = rebuilt(tokStart, tokEnd)
            var a = 0
            var b = s0.length
            while (a < b && s0.charAt(a) <= ' ') a += 1
            while (b > a && s0.charAt(b - 1) <= ' ') b -= 1
            if (b == 0) null
            else if (a == 0 && b == s0.length) s0
            else if (b > a) s0.substring(a, b)
            else null
          }
        if (t != null) {
          // refs resolve at depths 0..2 (top-level, list, list-of-list) only
          if (t.charAt(0) == '#' && stack.length <= 2)
            current.children += RNode(toLong(t.substring(1)), t)
          else current.children += SNode(t)
        }
        tokStart = -1; hasQuote = false
      }
    }
    def kwDone(): Unit = {
      keyword =
        if (kwSb != null) kwSb.toString
        else if (kwStart >= 0) body.substring(kwStart, kwEnd)
        else ""
    }

    var i = 0
    var end = false
    while (i < n && !end) {
      val ch = body.charAt(i)
      state match {
        case 1 =>
          if (ch == '(') { kwDone(); state = 2 }
          else if (ch == ';') { kwDone(); end = true }
          else if (!ch.isWhitespace) {
            if (kwSb != null) kwSb.append(ch)
            else if (kwStart < 0) { kwStart = i; kwEnd = i + 1 }
            else if (kwEnd == i) kwEnd = i + 1
            else { kwSb = new java.lang.StringBuilder(); kwSb.append(body, kwStart, kwEnd); kwSb.append(ch) }
          }
        case 2 =>
          if (ch == '\'') {
            if (tokStart < 0) tokStart = i
            tokEnd = i + 1; hasQuote = true; state = 3
          } else if (ch == '(') {
            flush()
            val tmp = new LNode()
            current.children += tmp
            stack += current
            current = tmp
          } else if (ch == ')') {
            flush()
            if (stack.isEmpty) end = true
            else { current = stack.remove(stack.length - 1) }
          } else if (ch == ',') flush()
          else { if (tokStart < 0) tokStart = i; tokEnd = i + 1 }
        case _ => // 3: inside quotes — closing quote skipped in content,
          // but the span still covers it (rebuilt() drops it again)
          tokEnd = i + 1
          if (ch == '\'') state = 2
      }
      i += 1
    }
    (keyword, root.children)
  }

  /** pre-order RNode ids (all RNodes sit at depths 0..2 by construction) */
  private def collectRefs(nodes: ArrayBuffer[Node], out: ArrayBuffer[Long]): Unit = {
    var i = 0
    while (i < nodes.length) {
      nodes(i) match {
        case RNode(id, _) => out += id
        case l: LNode     => collectRefs(l.children, out)
        case _            => ()
      }
      i += 1
    }
  }

  /** Allocation-lean Stage-A scan: keyword + ordered ref ids of a statement
    * body, NO node tree, no per-token strings (round 6, guide §1.2 step 2:
    * Stage A only needs the refs for the dangling-doc decision and the
    * keyword for the line→keyword map; the full parse tree is built once,
    * in Stage C, by [[parseArgs]]). Replicates the parseArgs automaton
    * EXACTLY — same states, same flush points, same depth rule (refs at
    * stack depth 0..2 only), same trim — but tracks each token as a
    * [start, end) span of `body` and materializes nothing unless the token
    * both starts with '#' and contains a quote (the collapsed-quote content
    * then rebuilds through the same append rules). Equivalence with
    * parseArgs + ref collection is property-pinned by TokenizerSpec. */
  private[operators] def scanRefs(body: String): (String, ArrayBuffer[Long]) = {
    val refs = ArrayBuffer[Long]()
    var keyword = ""
    val n = body.length
    var state = 1
    var depth = 0
    // keyword accumulator: contiguous fast path + builder fallback for
    // whitespace-split keywords (parseArgs appends every non-ws char)
    var kwStart = -1
    var kwEnd = -1
    var kwSb: java.lang.StringBuilder = null
    // current token span (state 2/3); hasQuote forces the exact rebuild
    var tokStart = -1
    var tokEnd = -1
    var hasQuote = false
    @inline def trimStart(from: Int, to: Int): Int = {
      var a = from; while (a < to && body.charAt(a) <= ' ') a += 1; a
    }
    @inline def trimEnd(from: Int, to: Int): Int = {
      var b = to; while (b > from && body.charAt(b - 1) <= ' ') b -= 1; b
    }
    /** the parseArgs sb content of span [from, to): every char except each
      * quote section's CLOSING quote (opening kept, '' collapses) */
    def rebuilt(from: Int, to: Int): String = {
      val sb = new java.lang.StringBuilder(to - from)
      var i = from
      var inQ = false
      while (i < to) {
        val ch = body.charAt(i)
        if (inQ) { if (ch == '\'') inQ = false else sb.append(ch) }
        else { sb.append(ch); if (ch == '\'') inQ = true }
        i += 1
      }
      sb.toString
    }
    def flushTok(): Unit = {
      if (tokStart >= 0) {
        if (!hasQuote) {
          val a = trimStart(tokStart, tokEnd)
          val b = trimEnd(a, tokEnd)
          if (b > a && body.charAt(a) == '#' && depth <= 2)
            refs += (try java.lang.Long.parseLong(body, a + 1, b, 10)
                     catch { case _: NumberFormatException => Long.MinValue })
        } else {
          val t = rebuilt(tokStart, tokEnd).trim
          if (t.nonEmpty && t.charAt(0) == '#' && depth <= 2)
            refs += toLong(t.substring(1))
        }
        tokStart = -1; hasQuote = false
      }
    }
    def kwDone(): Unit = {
      keyword =
        if (kwSb != null) kwSb.toString
        else if (kwStart >= 0) body.substring(kwStart, kwEnd)
        else ""
    }
    var i = 0
    var end = false
    while (i < n && !end) {
      val ch = body.charAt(i)
      state match {
        case 1 =>
          if (ch == '(') { kwDone(); state = 2 }
          else if (ch == ';') { kwDone(); end = true }
          else if (!ch.isWhitespace) {
            if (kwSb != null) kwSb.append(ch)
            else if (kwStart < 0) { kwStart = i; kwEnd = i + 1 }
            else if (kwEnd == i) kwEnd = i + 1
            else { kwSb = new java.lang.StringBuilder(); kwSb.append(body, kwStart, kwEnd); kwSb.append(ch) }
          }
        case 2 =>
          if (ch == '\'') {
            if (tokStart < 0) tokStart = i
            tokEnd = i + 1; hasQuote = true; state = 3
          } else if (ch == '(') { flushTok(); depth += 1 }
          else if (ch == ')') { flushTok(); if (depth == 0) end = true else depth -= 1 }
          else if (ch == ',') flushTok()
          else { if (tokStart < 0) tokStart = i; tokEnd = i + 1 }
        case _ => // 3: inside quotes — closing quote skipped in content,
          // but the span still covers it (rebuilt() drops it again)
          tokEnd = i + 1
          if (ch == '\'') state = 2
      }
      i += 1
    }
    (keyword, refs)
  }

  /** digits before the first '=' (the reference collects every digit it sees
    * in line-number state, IfcSpfParser.java:73); Long.MinValue when
    * unparseable (IfcSpfParser.java:261-267) */
  private def scanLineNum(line: String, eqIdx: Int): Long = {
    val sb = new StringBuilder
    var i = 0
    while (i < eqIdx) { val ch = line.charAt(i); if (ch.isDigit) sb.append(ch); i += 1 }
    toLong(sb.toString)
  }

  /** Stage-A statement scan: the flat [[Stmt]] only — no Tok tree copy, and
    * (round 6) no node tree at all: [[scanRefs]] extracts keyword + refs
    * span-wise, so the full parse happens exactly once, in Stage C. */
  private def scanStatement(docId: String, schema: String, seq: Long, line: String): Stmt = {
    val eqIdx = line.indexOf('=')
    if (eqIdx < 0) // no '=': the automaton never leaves line-number state
      return Stmt(docId, schema, seq, Long.MinValue, "", line, Nil, abort = false, bad_line = -1L)
    val body = line.substring(eqIdx + 1)
    val (keyword, refs) = scanRefs(body)
    Stmt(docId, schema, seq, scanLineNum(line, eqIdx), keyword, body,
      refs.distinct.toSeq, abort = false, bad_line = -1L)
  }

  /** Single-parse Stage-A scan (fused path): the SAME flat [[Stmt]] as
    * [[scanStatement]] — keyword/refs equivalence between [[scanRefs]] and
    * [[parseArgs]]+collectRefs is property-pinned by TokenizerSpec — plus the
    * parse tree the emitter would otherwise rebuild. The no-'=' statement
    * keeps a null tree: its body was never split at '=' and its keyword ""
    * only ever reaches the emitter's unknown-keyword marker arm, so the
    * emitter's own parse (of the identical body) remains the source of truth
    * there. */
  private def parseStatementNodes(docId: String, schema: String, seq: Long,
      line: String): (Stmt, ArrayBuffer[Node]) = {
    val eqIdx = line.indexOf('=')
    if (eqIdx < 0)
      return (Stmt(docId, schema, seq, Long.MinValue, "", line, Nil, abort = false, bad_line = -1L), null)
    val body = line.substring(eqIdx + 1)
    val (keyword, nodes) = parseArgs(body)
    val refs = ArrayBuffer[Long]()
    collectRefs(nodes, refs)
    (Stmt(docId, schema, seq, scanLineNum(line, eqIdx), keyword, body,
      refs.distinct.toSeq, abort = false, bad_line = -1L), nodes)
  }

  def parseStatement(docId: String, schema: String, seq: Long, line: String): Parsed = {
    val eqIdx = line.indexOf('=')
    if (eqIdx < 0)
      return Parsed(Stmt(docId, schema, seq, Long.MinValue, "", line, Nil,
        abort = false, bad_line = -1L), Nil)
    val body = line.substring(eqIdx + 1)
    val (keyword, nodes) = parseArgs(body)

    // convert: root children are the top-level objectList elements (depth 0)
    def leaf3(n: Node): Tok3 = n match {
      case SNode(v) => Tok3("S", v)
      case RNode(_, raw) => Tok3("S", raw) // depth-3 refs stay strings
      case _: LNode => Tok3("X", "")       // over-deep list: flagged
    }
    def tok2(n: Node): Tok2 = n match {
      case SNode(v) => Tok2("S", v, Nil)
      case RNode(id, _) => Tok2("R", id.toString, Nil)
      case l: LNode => Tok2("L", "", l.children.map(leaf3).toSeq)
    }
    def tok1(n: Node): Tok1 = n match {
      case SNode(v) => Tok1("S", v, Nil)
      case RNode(id, _) => Tok1("R", id.toString, Nil)
      case l: LNode => Tok1("L", "", l.children.map(tok2).toSeq)
    }
    def tok0(n: Node): Tok0 = n match {
      case SNode(v) => Tok0("S", v, Nil)
      case RNode(id, _) => Tok0("R", id.toString, Nil)
      case l: LNode => Tok0("L", "", l.children.map(tok1).toSeq)
    }
    val args = nodes.map(tok0).toSeq

    val refs = ArrayBuffer[Long]()
    collectRefs(nodes, refs)

    Parsed(Stmt(docId, schema, seq, scanLineNum(line, eqIdx), keyword, body,
      refs.distinct.toSeq, abort = false, bad_line = -1L), args)
  }
}
