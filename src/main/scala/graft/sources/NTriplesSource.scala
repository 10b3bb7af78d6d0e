package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** N-Triples reader — the scale-grade RDF ingest complement of
  * [[graft.sinks.NTriplesSink]].
  *
  * N-Triples is line-oriented and self-contained (one triple per line, no
  * document state), so the parse is an embarrassingly parallel per-line
  * `flatMap` over `spark.read.textFile`: the text source splits large files
  * on line boundaries, every partition parses independently, and no shuffle
  * exists anywhere. That is the property that makes NT the bulk-exchange
  * format (the reference's ecosystem ingests it in parallel the same way —
  * Jena tdbloader, Virtuoso, Blazegraph); this reader gives the other
  * direction: load a 100-TB NT dump straight into the triples-table shape
  * that [[graft.analytics.KgQuery]] / [[graft.analytics.Sparql]] query.
  *
  * Grammar coverage (https://www.w3.org/TR/n-triples/):
  *   - `<iri>` subject/predicate/object terms; `_:label` blank nodes in
  *     subject/object position (kept lexically, kind `bnode` — this
  *     pipeline's own output never contains them, §content-hash
  *     skolemization, but foreign dumps do);
  *   - literals `"…"`, `"…"^^<datatype>`, `"…"@lang`;
  *   - ECHAR escapes \\t \\b \\n \\r \\f \\" \\' \\\\ and UCHAR \\uXXXX /
  *     \\U000XXXXX (surrogate pairs for astral code points);
  *   - comment lines (`# …`), blank lines, trailing whitespace/comments
  *     after the terminating `.`.
  * Malformed input fails LOUDLY with the line text and column — a silent
  * drop would corrupt a corpus-scale load invisibly.
  *
  * Plain literals parse with `obj_datatype = ""` — the same convention the
  * pipeline's own triples table uses; RDF 1.1 makes xsd:string implicit, and
  * canonical N-Triples (what the sink emits) omits it.
  */
object NTriplesSource {

  /** One parsed triple; matches the pipeline triples-table column names so
    * the result drops straight into KgQuery/Sparql (obj_lang added — the
    * pipeline never emits language tags but foreign NT carries them). */
  final case class NtRow(subj: String, pred: String, obj: String,
      obj_kind: String, obj_datatype: String, obj_lang: String)

  /** Read an NT file/directory into a triples DataFrame
    * (subj, pred, obj, obj_kind, obj_datatype, obj_lang).
    *
    * Blank-node scope is per-document in RDF, so a directory-scale read
    * must not conflate identically-labeled bnodes from different files:
    * labels are namespaced with an FNV-64 hash of their source file
    * (`_:b1` → `_:f<hex>_b1`). Any distinctness-preserving relabeling
    * yields an isomorphic graph; single-file reads are relabeled the same
    * way so a file's triples are stable regardless of its directory's
    * other contents. [[parse]] leaves labels verbatim — pre-split line
    * streams carry their own scoping. */
  def read(spark: SparkSession, path: String): DataFrame = {
    implicit val enc2 = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val enc = Encoders.product[NtRow]
    import org.apache.spark.sql.functions.{col, input_file_name}
    spark.read.textFile(path)
      .select(col("value"), input_file_name().as("__f"))
      .as[(String, String)]
      .flatMap { case (line, f) => parseLine(line).map(scopeBnodes(_, f)) }
      .toDF()
  }

  private def scopeBnodes(r: NtRow, file: String): NtRow = {
    if (!r.subj.startsWith("_:") && !(r.obj_kind == "bnode")) r
    else {
      val tag = "_:f" + java.lang.Long.toHexString(
        graft.functions.Fnv64.hashBytes(file.getBytes("UTF-8"))) + "_"
      r.copy(
        subj = if (r.subj.startsWith("_:")) tag + r.subj.substring(2) else r.subj,
        obj = if (r.obj_kind == "bnode") tag + r.obj.substring(2) else r.obj)
    }
  }

  /** Parse pre-loaded NT lines (e.g. from a different source or a stream). */
  def parse(lines: Dataset[String]): DataFrame = {
    implicit val enc = Encoders.product[NtRow]
    lines.flatMap(parseLine(_)).toDF()
  }

  /** Parse one line; None for blank/comment lines. Hand-rolled index scan —
    * no regex, no split — so the per-line cost is one pass over the bytes. */
  def parseLine(line: String): Option[NtRow] = parseCore(line, allowGraph = false).map(_._1)

  /** Shared NT/NQ statement core: with `allowGraph` an optional graph label
    * (IRI or blank node — the N-Quads grammar) may precede the terminating
    * '.'; returns it verbatim, "" when absent (= the default graph). */
  private[sources] def parseCore(line: String, allowGraph: Boolean): Option[(NtRow, String)] = {
    val n = line.length
    var i = skipWs(line, 0)
    if (i >= n || line.charAt(i) == '#') return None

    def err(msg: String, at: Int): Nothing =
      throw new IllegalArgumentException(
        s"N-Triples parse error at col ${at + 1}: $msg in line: $line")

    // <iri> — IRIREF has no escapes beyond UCHAR; > cannot appear inside
    def iri(from: Int): (String, Int) = {
      // bounds-check first: a truncated term (e.g. `"x"^^` at end of line)
      // must fail through the positioned reporter, not charAt's raw
      // StringIndexOutOfBoundsException
      if (from >= n) err("truncated line: expected '<'", from)
      if (line.charAt(from) != '<') err("expected '<'", from)
      val close = line.indexOf('>', from + 1)
      if (close < 0) err("unterminated IRI", from)
      val raw = line.substring(from + 1, close)
      (if (raw.indexOf('\\') >= 0) unescape(raw, err) else raw, close + 1)
    }

    def bnode(from: Int): (String, Int) = {
      // _:label — label runs to whitespace; BLANK_NODE_LABEL may contain '.'
      // internally but cannot END with one (W3C grammar), so trailing dots
      // are the statement terminator — `<s> <p> _:b1.` is valid NT with no
      // space before the '.'
      var j = from + 2
      while (j < n && !isWs(line.charAt(j))) j += 1
      while (j > from + 2 && line.charAt(j - 1) == '.') j -= 1
      if (j == from + 2) err("empty blank-node label", from)
      (line.substring(from, j), j)
    }

    // subject
    val (subj, afterSubj) = line.charAt(i) match {
      case '<' => iri(i)
      case '_' => bnode(i)
      case _ => err("expected IRI or blank node subject", i)
    }
    i = skipWs(line, afterSubj)

    // predicate
    if (i >= n) err("missing predicate", i)
    val (pred, afterPred) = iri(i)
    i = skipWs(line, afterPred)

    // object
    if (i >= n) err("missing object", i)
    var kind = ""
    var obj = ""
    var dt = ""
    var lang = ""
    line.charAt(i) match {
      case '<' =>
        val (v, j) = iri(i); kind = "iri"; obj = v; i = j
      case '_' =>
        val (v, j) = bnode(i); kind = "bnode"; obj = v; i = j
      case '"' =>
        kind = "literal"
        var j = i + 1
        var sawEsc = false
        var closed = false
        while (j < n && !closed) line.charAt(j) match {
          case '\\' => sawEsc = true; j += 2 // escape consumes the next char
          case '"' => closed = true
          case _ => j += 1
        }
        if (!closed) err("unterminated literal", i)
        val raw = line.substring(i + 1, j)
        obj = if (sawEsc) unescape(raw, err) else raw
        i = j + 1
        if (i + 1 < n && line.charAt(i) == '^' && line.charAt(i + 1) == '^') {
          val (v, k) = iri(i + 2); dt = v; i = k
        } else if (i < n && line.charAt(i) == '@') {
          var k = i + 1
          while (k < n && !isWs(line.charAt(k)) && line.charAt(k) != '.') k += 1
          if (k == i + 1) err("empty language tag", i)
          lang = line.substring(i + 1, k); i = k
        }
      case _ => err("expected IRI, blank node or literal object", i)
    }

    // optional graph label (N-Quads only), then terminating '.' and only
    // whitespace/comment
    i = skipWs(line, i)
    var graph = ""
    if (allowGraph && i < n && (line.charAt(i) == '<' || line.charAt(i) == '_')) {
      val (gv, j) = if (line.charAt(i) == '<') iri(i) else bnode(i)
      graph = gv
      i = skipWs(line, j)
    }
    if (i >= n || line.charAt(i) != '.') err("expected terminating '.'", i)
    i = skipWs(line, i + 1)
    if (i < n && line.charAt(i) != '#') err("trailing content after '.'", i)

    Some((NtRow(subj, pred, obj, kind, dt, lang), graph))
  }

  @inline private def isWs(c: Char): Boolean = c == ' ' || c == '\t'
  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && isWs(s.charAt(i))) i += 1
    i
  }

  /** ECHAR + UCHAR unescape; `err` reports against the original line. */
  private def unescape(raw: String, err: (String, Int) => Nothing): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c != '\\') { out.append(c); i += 1 }
      else {
        if (i + 1 >= raw.length) err("dangling backslash", i)
        raw.charAt(i + 1) match {
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '"' => out.append('"'); i += 2
          case '\'' => out.append('\''); i += 2
          case '\\' => out.append('\\'); i += 2
          case 'u' =>
            if (i + 6 > raw.length) err("truncated \\u escape", i)
            out.append(hex(raw.substring(i + 2, i + 6), i, err).toChar)
            i += 6
          case 'U' =>
            if (i + 10 > raw.length) err("truncated \\U escape", i)
            out.appendCodePoint(hex(raw.substring(i + 2, i + 10), i, err))
            i += 10
          case other => err(s"unknown escape \\$other", i)
        }
      }
    }
    out.toString
  }

  /** hex parse through the positioned reporter — non-hex digits in a UCHAR
    * must not escape as a raw NumberFormatException. */
  private def hex(s: String, at: Int, err: (String, Int) => Nothing): Int =
    try Integer.parseInt(s, 16)
    catch { case _: NumberFormatException => err(s"non-hex digits '$s' in unicode escape", at) }
}
