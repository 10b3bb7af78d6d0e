package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL 1.1 text front-end over the pipeline's triples table.
  *
  * The reference (pipauwel/IFCtoRDF) emits Turtle that its users load into a
  * triple store and query with SPARQL text. This module closes that last gap
  * in "a user of the reference could switch": the same query TEXT runs
  * directly on Spark, parsed by a from-scratch recursive-descent parser
  * (same in-house approach as `schema.Turtle`) and compiled onto the
  * [[KgQuery]] algebra — pushed-down pattern scans, (graph, shared-var)
  * equi-joins, left/anti joins for OPTIONAL/MINUS/NOT EXISTS, and the
  * iterative-doubling closure for `+`/`*` property paths. Nothing here
  * collects to the driver; a query plans as one declarative DataFrame.
  *
  * Supported subset (grammar in [[parse]]):
  *  - Query forms: SELECT [DISTINCT] (vars, `*`, and `(aggregate AS ?alias)`
  *    projections), ASK, CONSTRUCT { template } / CONSTRUCT WHERE,
  *    DESCRIBE ?var WHERE / DESCRIBE <iri>.
  *  - Update forms ([[update]]): INSERT DATA / DELETE DATA (ground quads in
  *    GRAPH blocks), DELETE WHERE, [WITH <g>] DELETE { } INSERT { }
  *    [USING [NAMED] <g>]* WHERE { } with quad templates (GRAPH <iri>/?var
  *    blocks inside DELETE/INSERT templates),
  *    `;`-separated sequences — compiled to keyed anti joins + unions over
  *    the store (copy-on-write: the result is the next table snapshot);
  *    graph management CLEAR/DROP (coincide: graphs exist implicitly),
  *    CREATE (no-op), ADD/COPY/MOVE <g1> TO <g2>, and LOAD <path> [INTO
  *    GRAPH <g>] (.nt splittable / .nq splittable-with-graphs / .ttl
  *    file-per-doc sources; INTO GRAPH is mandatory except for .nq, whose
  *    own graph labels are kept — or overridden when given). DEFAULT-graph
  *    forms fail loudly — the store is named-graphs-only.
  *  - Patterns: basic graph patterns with `;`/`,` shorthand and `a`,
  *    property paths (`/`, `|`, `^`, `+`, `*`, `?`, parentheses, negated
  *    property sets `!p` / `!(p1|^p2|…)` incl. inverse members), nested
  *    groups, subqueries
  *    `{ SELECT … }` (joined on shared projected variables), OPTIONAL,
  *    UNION, MINUS, FILTER [NOT] EXISTS, FILTER exprs, BIND(expr AS ?v),
  *    VALUES (inline data, in-group and as the trailing ValuesClause —
  *    the latter joins after grouping/HAVING per §18.2.4),
  *    GRAPH ?g / GRAPH <iri> (the named graphs ARE
  *    the documents: ?g binds the group's graph column, <iri> pins it).
  *  - Filter expressions: `&&  ||  !`, comparisons, arithmetic `+ - * /`,
  *    IN / NOT IN, REGEX, BOUND, STR, STRLEN, LCASE, UCASE, CONTAINS,
  *    STRSTARTS, STRENDS, STRBEFORE, STRAFTER, SUBSTR, REPLACE, CONCAT,
  *    IF, COALESCE, ABS, CEIL, FLOOR, ROUND, ENCODE_FOR_URI, MD5, SHA1,
  *    SHA256/384/512, IRI/URI (identity — the store is untyped strings), ISNUMERIC,
  *    the xsd:dateTime accessors YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS/TZ/
  *    TIMEZONE (over the ISO-8601 lexical form; non-dateTime argument →
  *    NULL, the relational image of the SPARQL type error),
  *    the §17.4 constructors BNODE (deterministic content-hash mint, same
  *    arg within one solution → same node), NOW (query-constant, not
  *    run-constant), UUID/STRUUID/RAND (nondeterministic by definition),
  *    the §17.5 XPath constructor casts xsd:integer/decimal/float/double/
  *    string/boolean/dateTime/date (uncastable lexical form → NULL; any
  *    other function IRI is a loud parse error),
  *    and the term inspectors LANG, DATATYPE, LANGMATCHES, isIRI/isURI,
  *    isLiteral, isBlank, sameTerm (read [[KgQuery.metaCol]] companions bound from
  *    the store's obj_kind/obj_datatype/obj_lang columns — matching stays
  *    lexical, but tags and kinds are fully inspectable; loud error when
  *    the store carries no metadata or the variable is path/BIND-bound).
  *  - Dataset clauses: FROM <g> restricts patterns outside GRAPH clauses,
  *    FROM NAMED <g> restricts GRAPH clauses — both compile to pushed-down
  *    graph-column membership filters (absent clauses leave all graphs
  *    visible; this store has no default/named dataset split — delta).
  *    Top-level queries only, as the SPARQL grammar requires.
  *  - Solution modifiers: GROUP BY (vars, `(expr AS ?v)` — the alias is
  *    projectable/HAVING-visible — and bare BuiltInCall conditions),
  *    HAVING, ORDER BY (vars, ASC/DESC(expr),
  *    bare constraints; non-grouped queries may order by NON-projected
  *    variables — the sort runs on the pre-projection frame, as SPARQL
  *    evaluates OrderBy before Project — except under DISTINCT, where the
  *    key must survive projection), LIMIT, OFFSET.
  *  - Aggregates: COUNT(*) / COUNT([DISTINCT] ?v), SUM/AVG [DISTINCT],
  *    MIN, MAX, SAMPLE (deterministic: min), GROUP_CONCAT([DISTINCT] ?v [;
  *    SEPARATOR="…"]) (deterministic: sorted).
  *
  * Semantics over THIS data model (documented deltas from the rec):
  *  - Terms are matched by lexical form: the triples table stores
  *    `subj/pred/obj` lexically (datatype in `obj_datatype`), so
  *    `"3."^^xsd:double` matches lexical "3." — a literal's `^^type` /
  *    `@lang` suffix is parsed and ignored for matching. Term KIND,
  *    datatype and language tag remain fully INSPECTABLE via
  *    LANG/DATATYPE/LANGMATCHES/isIRI/isLiteral/isBlank, which read the
  *    store's metadata columns; a variable bound in several positions
  *    reads the metadata of its first binding pattern.
  *  - Comparisons are numeric when either operand is a numeric literal
  *    (both sides cast to double; uncastable → NULL → row dropped),
  *    lexical otherwise. SUM/AVG/MIN/MAX cast to double the same way.
  *  - Solutions are graph-scoped (named graph = doc_id) exactly as
  *    [[KgQuery.bgp]]: no solution spans documents; VALUES joins are the
  *    exception (inline data is graph-free, as in SPARQL).
  *  - Joins after UNION/OPTIONAL treat an unbound (NULL) shared variable as
  *    non-matching, where SPARQL's compatibility would let it join; MINUS
  *    is an anti join on the shared variables. Exact when groups bind their
  *    variables — the overwhelmingly common shape.
  *  - An OPTIONAL group's own top-level FILTERs follow the LeftJoin(Ω1, Ω2,
  *    expr) rule: filters referencing OUTER variables ride the join
  *    condition (evaluated over the merged binding, non-matches NULL-pad);
  *    inner-bound filters apply inside the group (equivalent per spec).
  *  - SELECT projections may be plain variables, `(aggregate AS ?a)`, or
  *    `(expression AS ?a)` — expressions may mix aggregates with arithmetic
  *    and builtins in grouped queries (compiled as synthetic agg columns,
  *    the HAVING mechanism).
  *  - GRAPH ?g binds the doc_id (the store's graph names are document ids,
  *    not IRIs — the documented data-model delta); GRAPH <iri> compiles to
  *    a pushed-down graph-column filter.
  *  - Blank nodes in patterns (`_:label`, `[ … ]` property lists, and
  *    collections `( … )` expanded to rdf:first/rest chains) are scoped
  *    non-projectable variables (SELECT * hides them); in CONSTRUCT/INSERT
  *    templates a bnode label mints a FRESH node per solution
  *    (deterministic content hash); DELETE templates reject them loudly.
  *    Delta: a label reused across two separate groups joins like a
  *    variable where the spec scopes labels to one BGP.
  *  - Unsupported (loud parse errors, never silent): SERVICE (no
  *    federation).
  */
object Sparql {

  import KgQuery.{Term, V, I, P, Path, Pred, Inv, PathSeq, Alt, Plus, Star, Opt, Nps, GraphCol}

  // ===================================================================
  // Lexer
  // ===================================================================

  private[analytics] sealed trait Tok { def pos: Int }
  private final case class TIri(iri: String, pos: Int) extends Tok
  private final case class TPName(pfx: String, local: String, pos: Int) extends Tok
  private final case class TVar(name: String, pos: Int) extends Tok
  private final case class TStr(value: String, pos: Int) extends Tok
  private final case class TNum(lex: String, pos: Int) extends Tok
  private final case class TWord(word: String, pos: Int) extends Tok // keyword / bareword, original case
  private final case class TPunct(s: String, pos: Int) extends Tok
  private final case class TEof(pos: Int) extends Tok

  private def fail(msg: String, text: String, pos: Int): Nothing = {
    val upto = text.take(pos)
    val line = upto.count(_ == '\n') + 1
    val col = pos - (upto.lastIndexOf('\n') + 1) + 1
    throw new IllegalArgumentException(s"SPARQL parse error at line $line col $col: $msg")
  }

  private val IriRe = """<[^<>"{}|^`\\\s]*>""".r
  private val NumRe = """[0-9]+(\.[0-9]*)?([eE][+-]?[0-9]+)?|\.[0-9]+([eE][+-]?[0-9]+)?""".r
  private val Punct2 = Seq("&&", "||", "!=", "<=", ">=", "^^")
  private val Punct1 = "{}().;,|/^*+?=<>!-@[]"

  private def isNameStart(c: Char) = c.isLetter || c == '_'
  private def isNameChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

  private[analytics] def lex(text: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && text(i) != '\n') i += 1 }
      else if (c == '<') {
        IriRe.findPrefixOf(text.substring(i)) match {
          case Some(m) => out += TIri(m.substring(1, m.length - 1), i); i += m.length
          case None =>
            if (i + 1 < n && text(i + 1) == '=') { out += TPunct("<=", i); i += 2 }
            else { out += TPunct("<", i); i += 1 }
        }
      } else if ((c == '?' || c == '$') && i + 1 < n && (isNameStart(text(i + 1)) || text(i + 1).isDigit)) {
        var j = i + 1
        while (j < n && (text(j).isLetterOrDigit || text(j) == '_')) j += 1
        out += TVar(text.substring(i + 1, j), i); i = j
      } else if (c == '"' || c == '\'') {
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < n && !closed) text(j) match {
          case '\\' if j + 1 < n =>
            sb += (text(j + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case 'b' => '\b'; case 'f' => '\f'; case other => other
            }); j += 2
          case `c` => closed = true; j += 1
          case ch => sb += ch; j += 1
        }
        if (!closed) fail("unterminated string literal", text, i)
        out += TStr(sb.toString, i); i = j
      } else if (c.isDigit || (c == '.' && i + 1 < n && text(i + 1).isDigit)) {
        val m = NumRe.findPrefixOf(text.substring(i)).get
        out += TNum(m, i); i += m.length
      } else if (isNameStart(c)) {
        var j = i
        while (j < n && isNameChar(text(j))) j += 1
        // PN_LOCAL must not END with '.' — trailing dots are statement dots
        while (text(j - 1) == '.') j -= 1
        val word = text.substring(i, j)
        if (j < n && text(j) == ':') {
          // prefixed name: pfx ':' local?
          var k = j + 1
          while (k < n && isNameChar(text(k))) k += 1
          while (k > j + 1 && text(k - 1) == '.') k -= 1
          out += TPName(word, text.substring(j + 1, k), i); i = k
        } else { out += TWord(word, i); i = j }
      } else if (c == ':') { // default-prefix name
        var k = i + 1
        while (k < n && isNameChar(text(k))) k += 1
        while (k > i + 1 && text(k - 1) == '.') k -= 1
        out += TPName("", text.substring(i + 1, k), i); i = k
      } else {
        val two = if (i + 1 < n) text.substring(i, i + 2) else ""
        if (Punct2.contains(two)) { out += TPunct(two, i); i += 2 }
        else if (Punct1.indexOf(c) >= 0) { out += TPunct(c.toString, i); i += 1 }
        else fail(s"unexpected character '$c'", text, i)
      }
    }
    out += TEof(n)
    out.result()
  }

  // ===================================================================
  // AST
  // ===================================================================

  private[analytics] sealed trait Expr
  private[analytics] final case class ExVar(name: String) extends Expr
  private[analytics] final case class ExStr(v: String) extends Expr
  private[analytics] final case class ExNum(lex: String) extends Expr
  private[analytics] final case class ExBool(b: Boolean) extends Expr
  private[analytics] final case class ExIri(iri: String) extends Expr
  private[analytics] final case class ExCmp(op: String, l: Expr, r: Expr) extends Expr
  private[analytics] final case class ExArith(op: String, l: Expr, r: Expr) extends Expr
  private[analytics] final case class ExAnd(l: Expr, r: Expr) extends Expr
  private[analytics] final case class ExOr(l: Expr, r: Expr) extends Expr
  private[analytics] final case class ExNot(e: Expr) extends Expr
  private[analytics] final case class ExIn(e: Expr, set: Seq[Expr], neg: Boolean) extends Expr
  private[analytics] final case class ExFn(name: String, args: Seq[Expr]) extends Expr
  private[analytics] final case class ExExists(g: Group, neg: Boolean) extends Expr
  /** aggregate call inside a HAVING constraint (substituted pre-compile). */
  private[analytics] final case class ExAgg(fn: String, arg: Option[String],
      distinct: Boolean, sep: Option[String]) extends Expr

  private[analytics] sealed trait Element
  private[analytics] final case class EBlock(pats: Seq[(Term, Term, Term)]) extends Element
  private[analytics] final case class EOptional(g: Group) extends Element
  private[analytics] final case class EUnion(branches: Seq[Group]) extends Element
  private[analytics] final case class EMinus(g: Group) extends Element
  private[analytics] final case class EFilter(e: Expr) extends Element
  private[analytics] final case class EBind(e: Expr, v: String) extends Element
  private[analytics] final case class EValues(vars: Seq[String], rows: Seq[Seq[Option[String]]]) extends Element
  private[analytics] final case class EGroup(g: Group) extends Element
  private[analytics] final case class ESubSelect(q: QSelect) extends Element
  /** GRAPH clause: Left(var) binds the graph column, Right(iri) filters it. */
  private[analytics] final case class EGraph(name: Either[String, String], g: Group) extends Element
  private[analytics] final case class Group(elems: Seq[Element])

  private[analytics] sealed trait ProjValue
  private[analytics] final case class PVar(name: String) extends ProjValue
  private[analytics] final case class PAgg(fn: String, arg: Option[String],
      distinct: Boolean, sep: Option[String] = None) extends ProjValue
  /** general `(expression AS ?alias)` projection; may contain ExAgg nodes. */
  private[analytics] final case class PExpr(e: Expr) extends ProjValue
  private[analytics] final case class Projection(alias: String, value: ProjValue)

  /** one GROUP BY key: a plain variable (expr None) or a GroupCondition
    * expression — `(expr AS ?v)` / bare builtin — materialized as a column
    * named `name` before aggregation (§18.2.4 Group(exprlist)). */
  private[analytics] final case class GroupKey(name: String, expr: Option[Expr] = None)

  private[analytics] sealed trait Query
  private[analytics] final case class QSelect(distinct: Boolean, star: Boolean,
      projs: Seq[Projection], where: Group, groupBy: Seq[GroupKey], having: Seq[Expr],
      orderBy: Seq[(Expr, Boolean)], limit: Option[Int], offset: Option[Int],
      postValues: Option[EValues] = None) extends Query
  private[analytics] final case class QAsk(where: Group) extends Query
  private[analytics] final case class QConstruct(template: Seq[(Term, Term, Term)], where: Group) extends Query
  private[analytics] final case class QDescribe(variable: String, where: Group) extends Query
  private[analytics] final case class QDescribeIri(iri: String) extends Query

  /** SPARQL 1.1 Update operations (a request is a `;`-separated sequence). */
  private[analytics] sealed trait Update
  /** ground quads: (graph, subj, pred, obj) — GRAPH block mandatory. */
  private[analytics] final case class UInsertData(quads: Seq[(String, String, String, String)]) extends Update
  private[analytics] final case class UDeleteData(quads: Seq[(String, String, String, String)]) extends Update
  /** one DELETE/INSERT template quad: the optional graph target is an IRI
    * (`I`) or a WHERE-bound variable (`V`); `None` falls back to the WITH
    * graph when one was given, else to the matched solution's own graph
    * (the store has no default graph to fall back to). */
  private[analytics] type TQuad = (Option[Term], Term, Term, Term)
  private[analytics] final case class UModify(del: Seq[TQuad], ins: Seq[TQuad],
      where: Group, withGraph: Option[String] = None,
      using: Seq[String] = Nil, usingNamed: Seq[String] = Nil) extends Update
  /** CLEAR/DROP (they coincide here: graphs exist implicitly, so there is no
    * empty-graph state to distinguish): Some(g) clears one graph, None is
    * NAMED/ALL. */
  private[analytics] final case class UClear(graph: Option[String]) extends Update
  /** CREATE GRAPH — a no-op for the same implicit-existence reason. */
  private[analytics] case object UCreate extends Update
  /** ADD/COPY/MOVE from → to (SILENT accepted; these never fail on a missing
    * graph anyway). */
  private[analytics] final case class UGraphOp(kind: String, from: String, to: String) extends Update
  /** LOAD <path> INTO GRAPH <g>: .nt via the splittable NTriplesSource, .ttl
    * via TurtleSource. */
  private[analytics] final case class ULoad(path: String, graph: String) extends Update

  // ===================================================================
  // Parser
  // ===================================================================

  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private final class Parser(text: String) {
    private val toks = lex(text)
    private var i = 0
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private var base = ""

    /** FROM / FROM NAMED graphs of the (one, top-level) query — the store's
      * named graphs ARE the documents, so these compile to pushed-down
      * graph-column membership filters: FROM restricts patterns outside
      * GRAPH clauses, FROM NAMED restricts GRAPH clauses; absent clauses
      * leave all graphs visible (this store has no default-graph/named split
      * to make empty — documented data-model delta). */
    private[Sparql] var fromGraphs: Seq[String] = Nil
    private[Sparql] var fromNamed: Seq[String] = Nil

    /** DatasetClause* ::= ('FROM' ('NAMED'? SourceSelector))* */
    private def datasetClauses(allowed: Boolean): Unit =
      while (isWord(peek, "FROM")) {
        val at = peek.pos; i += 1
        if (!allowed) fail("FROM/FROM NAMED is only valid on the top-level query", text, at)
        if (takeWord("NAMED")) fromNamed :+= graphIri()
        else fromGraphs :+= graphIri()
      }

    private def peek: Tok = toks(i)
    private def next(): Tok = { val t = toks(i); i += 1; t }
    private def err(msg: String): Nothing = fail(msg, text, peek.pos)

    private def isWord(t: Tok, w: String): Boolean = t match {
      case TWord(x, _) => x.equalsIgnoreCase(w)
      case _ => false
    }
    private def takeWord(w: String): Boolean =
      if (isWord(peek, w)) { i += 1; true } else false
    private def expectWord(w: String): Unit =
      if (!takeWord(w)) err(s"expected $w")
    private def takePunct(p: String): Boolean = peek match {
      case TPunct(`p`, _) => i += 1; true
      case _ => false
    }
    private def expectPunct(p: String): Unit =
      if (!takePunct(p)) err(s"expected '$p'")

    private def resolve(t: TPName): String = prefixes.get(t.pfx) match {
      case Some(ns) => ns + t.local
      case None => fail(s"undeclared prefix '${t.pfx}:'", text, t.pos)
    }

    private def prologue(): Unit = {
      var more = true
      while (more) {
        if (takeWord("PREFIX")) next() match {
          case p: TPName =>
            next() match {
              case TIri(iri, _) => prefixes(p.pfx) = base + iri
              case _ => err("expected IRI after PREFIX")
            }
          case _ => err("expected prefix name after PREFIX")
        } else if (takeWord("BASE")) next() match {
          case TIri(iri, _) => base = iri
          case _ => err("expected IRI after BASE")
        } else more = false
      }
    }

    // ---------------- terms ----------------

    /** graph term in subject/object position, or a variable. */
    // ------- blank nodes in patterns: scoped, non-projectable variables.
    // `_:label` → V("_:u"+label), `[ … ]` / collections mint V("_:g"+n) —
    // the two spaces are disjoint (user labels can't start a fresh "g" id
    // because the prefix is ours), and no user ?var can collide ('_:' has a
    // ':' which VARNAME forbids). Bracket/collection expansions accumulate
    // in `pending`; triplesBlock drains it per statement.
    private var anonN = 0
    private val pending = scala.collection.mutable.ArrayBuffer.empty[(Term, Term, Term)]
    private var lastTermWasBracket = false
    private def freshAnon(): Term = { anonN += 1; V("_:g" + anonN) }

    private def term(): Term = { lastTermWasBracket = false; term0() }

    private def term0(): Term = next() match {
      case TVar(n, _) => V(n)
      case TIri(iri, _) => I(base + iri)
      // SPARQL forbids '_' as a declared prefix (PN_PREFIX can't start with
      // '_'), so pfx=="_" is unambiguously a blank-node label
      case TPName("_", local, _) => V("_:u" + local)
      case p: TPName => I(resolve(p))
      case TStr(v, _) =>
        // swallow an optional ^^datatype / @lang — matching is lexical
        if (takePunct("^^")) next() match {
          case TIri(_, _) | TPName(_, _, _) => ()
          case _ => err("expected datatype IRI after ^^")
        } else if (takePunct("@")) next() match {
          case TWord(_, _) => ()
          case _ => err("expected language tag after @")
        }
        I(v)
      case TNum(lex, _) => I(lex)
      case TPunct("-", p) => next() match {
        // negative numeric literal in term position (object of a pattern,
        // VALUES handles its own) — lexical form keeps the sign
        case TNum(lex, _) => I("-" + lex)
        case _ => fail("expected a number after '-'", text, p)
      }
      case t if isWord(t, "true") => I("true")
      case t if isWord(t, "false") => I("false")
      case TPunct("(", _) =>
        // RDF collection: expand to the rdf:first/rdf:rest chain over fresh
        // anon bnodes (SPARQL 1.1 §4.2.3); `()` is rdf:nil
        if (takePunct(")")) I(RdfNs + "nil")
        else {
          val items = Seq.newBuilder[Term]
          while (!takePunct(")")) items += term0()
          val cells = items.result().map(it => (freshAnon(), it))
          cells.zipWithIndex.foreach { case ((cell, it), k) =>
            pending += ((cell, I(RdfNs + "first"), it))
            pending += ((cell, I(RdfNs + "rest"),
              if (k == cells.size - 1) I(RdfNs + "nil") else cells(k + 1)._1))
          }
          lastTermWasBracket = true // TriplesNode: PropertyList may be empty
          cells.head._1
        }
      case TPunct("[", _) =>
        // blankNodePropertyList: a fresh anon bnode carrying the bracketed
        // predicate-object list (SPARQL 1.1 §4.2.2)
        val v = freshAnon()
        if (!takePunct("]")) {
          var moreVerbs = true
          while (moreVerbs) {
            val pd = verb()
            var moreObjs = true
            while (moreObjs) {
              pending += ((v, pd, term0()))
              moreObjs = takePunct(",")
            }
            moreVerbs = takePunct(";") &&
              (peek match { case TPunct("]", _) => false; case _ => true })
          }
          expectPunct("]")
        }
        lastTermWasBracket = true
        v
      case t => fail(s"expected an RDF term or variable", text, t.pos)
    }

    // ---------------- property paths ----------------

    private def pathPrimary(): Path = next() match {
      case TIri(iri, _) => Pred(base + iri)
      case p: TPName => Pred(resolve(p))
      case t if isWord(t, "a") => Pred(RdfNs + "type")
      case TPunct("(", _) =>
        val p = pathAlt(); expectPunct(")"); p
      case TPunct("!", _) =>
        // negated property set: !iri, !^iri, or !(p1|^p2|…) — SPARQL 1.1
        // §18.4 splits the member list, !(F|^I) ≡ alt(NPS(F), inv(NPS(I))):
        // forward members exclude preds from one forward scan, inverse
        // members from a second, reversed scan
        def member(): (String, Boolean) = {
          val inv = takePunct("^")
          next() match {
            case TIri(iri, _) => (base + iri, inv)
            case p: TPName => (resolve(p), inv)
            case t if isWord(t, "a") => (RdfNs + "type", inv)
            case t => fail("expected an IRI in the negated property set", text, t.pos)
          }
        }
        val members = Seq.newBuilder[(String, Boolean)]
        if (takePunct("(")) {
          members += member()
          while (takePunct("|")) members += member()
          expectPunct(")")
        } else members += member()
        val (invM, fwdM) = members.result().partition(_._2)
        Nps(fwdM.map(_._1), invM.map(_._1))
      case t => fail("expected a path element", text, t.pos)
    }

    private def pathElt(): Path = {
      val inv = takePunct("^")
      var p = pathPrimary()
      peek match {
        case TPunct("*", _) => i += 1; p = Star(p)
        case TPunct("+", _) => i += 1; p = Plus(p)
        case TPunct("?", _) => i += 1; p = Opt(p)
        case _ =>
      }
      if (inv) Inv(p) else p
    }

    private def pathSeq(): Path = {
      var p = pathElt()
      while (takePunct("/")) p = PathSeq(p, pathElt())
      p
    }

    private def pathAlt(): Path = {
      var p = pathSeq()
      while (takePunct("|")) p = Alt(p, pathSeq())
      p
    }

    /** predicate position: variable, or a path (a bare IRI stays a plain I
      * constant so bgp's selectivity weighting sees it). */
    private def verb(): Term = peek match {
      case TVar(n, _) => i += 1; V(n)
      case _ => pathAlt() match {
        case Pred(iri) => I(iri)
        case p => P(p)
      }
    }

    // ---------------- triple blocks ----------------

    private def triplesBlock(): Seq[(Term, Term, Term)] = {
      val pats = Seq.newBuilder[(Term, Term, Term)]
      var more = true
      while (more) {
        val s = term()
        // a bracket/collection subject may stand alone (`[ p o ] .` —
        // TriplesNode with an empty PropertyList); everything else needs verbs
        var moreVerbs = !(lastTermWasBracket && startsTerminator)
        while (moreVerbs) {
          val p = verb()
          var moreObjs = true
          while (moreObjs) {
            pats += ((s, p, term()))
            moreObjs = takePunct(",")
          }
          moreVerbs = takePunct(";") && !startsTerminator
        }
        pats ++= pending
        pending.clear()
        takePunct(".")
        more = startsTriple
      }
      pats.result()
    }

    private def startsTerminator: Boolean = peek match {
      case TPunct("}", _) | TPunct(".", _) | TEof(_) => true
      case t => isGroupKeyword(t)
    }

    private def isGroupKeyword(t: Tok): Boolean =
      Seq("OPTIONAL", "FILTER", "BIND", "VALUES", "MINUS", "UNION").exists(isWord(t, _))

    private def startsTriple: Boolean = peek match {
      case TVar(_, _) | TIri(_, _) | TPName(_, _, _) | TStr(_, _) | TNum(_, _) => true
      case TPunct("[" | "(", _) => true
      case t if isWord(t, "true") || isWord(t, "false") => !isGroupKeyword(t)
      case _ => false
    }

    // ---------------- expressions ----------------

    private def exprPrimary(): Expr = peek match {
      case TPunct("(", _) => i += 1; val e = exprOr(); expectPunct(")"); e
      case TPunct("!", _) => i += 1; ExNot(exprPrimary())
      case TPunct("-", _) => i += 1
        next() match {
          case TNum(lex, _) => ExNum("-" + lex)
          case t => fail("expected a number after unary '-'", text, t.pos)
        }
      case TVar(n, _) => i += 1; ExVar(n)
      case TStr(v, _) => i += 1
        if (takePunct("^^")) next() // lexical matching: drop the datatype
        else if (takePunct("@")) next()
        ExStr(v)
      case TNum(lex, _) => i += 1; ExNum(lex)
      case TIri(iri, pos) => i += 1; iriOrCast(base + iri, pos)
      case p: TPName => i += 1; iriOrCast(resolve(p), p.pos)
      case t if isWord(t, "true") => i += 1; ExBool(true)
      case t if isWord(t, "false") => i += 1; ExBool(false)
      case t if isWord(t, "EXISTS") => i += 1; ExExists(group(), neg = false)
      case t if isWord(t, "NOT") => i += 1; expectWord("EXISTS"); ExExists(group(), neg = true)
      case TWord(w, _) if AggNames.contains(w.toUpperCase) => i += 1
        val a = aggTail(w)
        ExAgg(a.fn, a.arg, a.distinct, a.sep)
      case TWord(w, _) if FnNames.contains(w.toUpperCase) => i += 1
        expectPunct("(")
        val args = Seq.newBuilder[Expr]
        if (!takePunct(")")) {
          args += exprOr()
          while (takePunct(",")) args += exprOr()
          expectPunct(")")
        }
        ExFn(w.toUpperCase, args.result())
      case t => fail("expected an expression", text, t.pos)
    }

    /** §17.5 XPath constructor casts: an IRI followed by an argument list in
      * expression position. Only the xsd:* constructors are callable — any
      * other function IRI fails loudly (no extensible function registry). */
    private def iriOrCast(iri: String, pos: Int): Expr = peek match {
      case TPunct("(", _) =>
        if (!CastIris.contains(iri))
          fail(s"unsupported function IRI <$iri> (only the xsd:* constructor " +
            "casts are callable)", text, pos)
        expectPunct("(")
        val a = exprOr()
        expectPunct(")")
        ExFn("CAST:" + iri, Seq(a))
      case _ => ExIri(iri)
    }

    private val CastIris = Set("integer", "decimal", "float", "double",
      "string", "boolean", "dateTime", "date")
      .map("http://www.w3.org/2001/XMLSchema#" + _)

    private val FnNames = Set("REGEX", "BOUND", "STR", "STRLEN", "LCASE", "UCASE",
      "CONTAINS", "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER", "SUBSTR",
      "REPLACE", "CONCAT", "IF", "COALESCE", "ABS", "CEIL", "FLOOR", "ROUND",
      "ENCODE_FOR_URI", "MD5", "SHA1", "SHA256", "SHA384", "SHA512", "IRI", "URI", "ISNUMERIC",
      "LANG", "DATATYPE", "LANGMATCHES", "ISIRI", "ISURI", "ISLITERAL", "ISBLANK",
      "STRLANG", "STRDT", "SAMETERM",
      "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TZ", "TIMEZONE",
      "BNODE", "NOW", "UUID", "STRUUID", "RAND")

    private def exprMul(): Expr = {
      var e = exprPrimary()
      var go = true
      while (go) peek match {
        case TPunct("*", _) => i += 1; e = ExArith("*", e, exprPrimary())
        case TPunct("/", _) => i += 1; e = ExArith("/", e, exprPrimary())
        case _ => go = false
      }
      e
    }

    private def exprAdd(): Expr = {
      var e = exprMul()
      var go = true
      while (go) peek match {
        case TPunct("+", _) => i += 1; e = ExArith("+", e, exprMul())
        case TPunct("-", _) => i += 1; e = ExArith("-", e, exprMul())
        case _ => go = false
      }
      e
    }

    private def exprRel(): Expr = {
      val l = exprAdd()
      peek match {
        case TPunct(op, _) if Seq("=", "!=", "<", "<=", ">", ">=").contains(op) =>
          i += 1; ExCmp(op, l, exprAdd())
        case t if isWord(t, "IN") => i += 1; ExIn(l, exprList(), neg = false)
        case t if isWord(t, "NOT") => i += 1; expectWord("IN"); ExIn(l, exprList(), neg = true)
        case _ => l
      }
    }

    private def exprList(): Seq[Expr] = {
      expectPunct("(")
      val es = Seq.newBuilder[Expr]
      if (!takePunct(")")) {
        es += exprOr()
        while (takePunct(",")) es += exprOr()
        expectPunct(")")
      }
      es.result()
    }

    private def exprAnd(): Expr = {
      var e = exprRel()
      while (takePunct("&&")) e = ExAnd(e, exprRel())
      e
    }

    private def exprOr(): Expr = {
      var e = exprAnd()
      while (takePunct("||")) e = ExOr(e, exprAnd())
      e
    }

    // ---------------- group graph pattern ----------------

    private def group(): Group = {
      expectPunct("{")
      val elems = Seq.newBuilder[Element]
      while (!takePunct("}")) {
        peek match {
          case t if isWord(t, "OPTIONAL") => i += 1; elems += EOptional(group())
          case t if isWord(t, "MINUS") => i += 1; elems += EMinus(group())
          case t if isWord(t, "FILTER") => i += 1; elems += EFilter(exprOr())
          case t if isWord(t, "BIND") => i += 1
            expectPunct("(")
            val e = exprOr()
            expectWord("AS")
            val v = next() match {
              case TVar(n, _) => n
              case tk => fail("expected variable after AS", text, tk.pos)
            }
            expectPunct(")")
            elems += EBind(e, v)
          case t if isWord(t, "VALUES") => i += 1; elems += values()
          case TPunct("{", _) =>
            var g = EGroup(group()): Element
            // { A } UNION { B } UNION { C } …
            if (isWord(peek, "UNION")) {
              val branches = Seq.newBuilder[Group]
              branches += g.asInstanceOf[EGroup].g
              while (takeWord("UNION")) branches += group()
              g = EUnion(branches.result())
            }
            elems += g
          case t if isWord(t, "GRAPH") =>
            i += 1
            val gname = next() match {
              case TVar(n, _) => Left(n)
              case TIri(iri, _) => Right(base + iri)
              case p: TPName => Right(resolve(p))
              case tk => fail("expected ?var or graph IRI after GRAPH", text, tk.pos)
            }
            elems += EGraph(gname, group())
          case t if isWord(t, "SERVICE") =>
            fail("SERVICE is not supported (no federation)", text, t.pos)
          case t if isWord(t, "SELECT") =>
            i += 1; elems += ESubSelect(selectQuery())
          case _ => elems += EBlock(triplesBlock())
        }
        takePunct(".")
      }
      Group(elems.result())
    }

    private def values(): EValues = {
      // VALUES ?v { lit … }  |  VALUES (?a ?b) { (l1 l2) (l3 l4) … }
      def row1(): Option[String] = next() match {
        case TStr(v, _) =>
          if (takePunct("^^")) next()
          else if (takePunct("@")) next()
          Some(v)
        case TNum(lex, _) => Some(lex)
        case TPunct("-", p) => next() match {
          case TNum(lex, _) => Some("-" + lex)
          case _ => fail("expected a number after '-'", text, p)
        }
        case TIri(iri, _) => Some(base + iri)
        case p: TPName => Some(resolve(p))
        case t if isWord(t, "UNDEF") => None
        case t if isWord(t, "true") => Some("true")
        case t if isWord(t, "false") => Some("false")
        case t => fail("expected a VALUES data term", text, t.pos)
      }
      peek match {
        case TVar(v, _) =>
          i += 1
          expectPunct("{")
          val rows = Seq.newBuilder[Seq[Option[String]]]
          while (!takePunct("}")) rows += Seq(row1())
          EValues(Seq(v), rows.result())
        case TPunct("(", _) =>
          i += 1
          val vars = Seq.newBuilder[String]
          while (!takePunct(")")) next() match {
            case TVar(v, _) => vars += v
            case t => fail("expected variable in VALUES header", text, t.pos)
          }
          val vs = vars.result()
          expectPunct("{")
          val rows = Seq.newBuilder[Seq[Option[String]]]
          while (!takePunct("}")) {
            expectPunct("(")
            val r = Seq.newBuilder[Option[String]]
            while (!takePunct(")")) r += row1()
            val row = r.result()
            if (row.size != vs.size)
              err(s"VALUES row has ${row.size} terms for ${vs.size} variables")
            rows += row
          }
          EValues(vs, rows.result())
        case t => fail("expected ?var or (…) after VALUES", text, t.pos)
      }
    }

    // ---------------- query forms ----------------

    def query(): Query = {
      prologue()
      val q = peek match {
        case t if isWord(t, "SELECT") => i += 1; selectQuery(top = true)
        case t if isWord(t, "ASK") => i += 1
          datasetClauses(allowed = true)
          takeWord("WHERE")
          QAsk(group())
        case t if isWord(t, "CONSTRUCT") => i += 1
          datasetClauses(allowed = true)
          if (isWord(peek, "WHERE")) {
            // CONSTRUCT WHERE { … } shorthand: the pattern is the template,
            // so it must be a plain triples block (no paths/filters/groups)
            i += 1
            val g = group()
            val pats = g.elems.collect { case EBlock(ps) => ps }.flatten
            require(g.elems.forall(_.isInstanceOf[EBlock]) && pats.nonEmpty,
              "CONSTRUCT WHERE requires a plain triples block (no FILTER/OPTIONAL/…)")
            QConstruct(pats, g)
          } else {
            val tmpl = { expectPunct("{"); val b = triplesBlock(); expectPunct("}"); b }
            datasetClauses(allowed = true)
            expectWord("WHERE")
            QConstruct(tmpl, group())
          }
        case t if isWord(t, "DESCRIBE") => i += 1
          next() match {
            case TVar(n, _) =>
              datasetClauses(allowed = true)
              expectWord("WHERE")
              QDescribe(n, group())
            case TIri(iri, _) => datasetClauses(allowed = true); QDescribeIri(base + iri)
            case p: TPName => datasetClauses(allowed = true); QDescribeIri(resolve(p))
            case tk => fail("DESCRIBE supports the ?var WHERE and <iri> forms", text, tk.pos)
          }
        case t => fail("expected SELECT, ASK, CONSTRUCT or DESCRIBE", text, t.pos)
      }
      peek match {
        case TEof(_) => q
        case t => fail("trailing tokens after query", text, t.pos)
      }
    }

    private val AggNames = Set("COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT")

    /** the rest of an aggregate call after its name: optional DISTINCT, a
      * star or variable argument, and an optional `; SEPARATOR="…"` clause.
      * Shared by projection and HAVING positions. */
    private def aggTail(w: String): PAgg = {
      expectPunct("(")
      val d = takeWord("DISTINCT")
      val arg = peek match {
        case TPunct("*", _) => i += 1; None
        case TVar(n, _) => i += 1; Some(n)
        case t => fail("expected * or ?var in aggregate", text, t.pos)
      }
      var sep: Option[String] = None
      if (takePunct(";")) {
        expectWord("SEPARATOR")
        expectPunct("=")
        next() match {
          case TStr(s, _) => sep = Some(s)
          case t => fail("expected a string after SEPARATOR=", text, t.pos)
        }
      }
      expectPunct(")")
      PAgg(w.toUpperCase, arg, d, sep)
    }

    private def selectQuery(top: Boolean = false): QSelect = {
      val distinct = takeWord("DISTINCT")
      takeWord("REDUCED") // DISTINCT-compatible here: projections are sets per driver compare
      var star = false
      val projs = Seq.newBuilder[Projection]
      var more = true
      while (more) peek match {
        case TPunct("*", _) => i += 1; star = true
        case TVar(n, _) => i += 1; projs += Projection(n, PVar(n))
        case TPunct("(", _) =>
          i += 1
          val p = exprOr() match {
            case ExAgg(fn, arg, d, sep) => PAgg(fn, arg, d, sep)
            case ExVar(n) => PVar(n)
            case e => PExpr(e)
          }
          expectWord("AS")
          val alias = next() match {
            case TVar(n, _) => n
            case t => fail("expected variable after AS", text, t.pos)
          }
          expectPunct(")")
          projs += Projection(alias, p)
        case _ => more = false
      }
      datasetClauses(allowed = top)
      takeWord("WHERE")
      val where = group()
      // GroupCondition ::= Var | '(' Expression ('AS' Var)? ')' | BuiltInCall
      val groupBy = Seq.newBuilder[GroupKey]
      if (takeWord("GROUP")) {
        expectWord("BY")
        var m = true
        var k = 0
        while (m) peek match {
          case TVar(n, _) => i += 1; groupBy += GroupKey(n)
          case TPunct("(", _) =>
            i += 1
            val e = exprOr()
            val alias =
              if (takeWord("AS")) next() match {
                case TVar(n, _) => n
                case t => fail("expected a variable after AS", text, t.pos)
              } else { k += 1; s"__gk$k" }
            expectPunct(")")
            groupBy += GroupKey(alias, Some(e))
          case TWord(w, _) if FnNames.contains(w.toUpperCase) =>
            k += 1; groupBy += GroupKey(s"__gk$k", Some(exprPrimary()))
          case _ => m = false
        }
      }
      val having = Seq.newBuilder[Expr]
      if (takeWord("HAVING")) {
        // HavingCondition+ — bracketted expressions, conjunction overall
        having += exprOr()
        while (peek match { case TPunct("(", _) => true; case _ => false })
          having += exprOr()
      }
      // OrderCondition ::= (ASC|DESC) BrackettedExpression | Constraint | Var
      // (order keys are compiled against the PROJECTED solution, so they may
      // reference projected aliases; a var must survive projection)
      val orderBy = Seq.newBuilder[(Expr, Boolean)]
      if (takeWord("ORDER")) {
        expectWord("BY")
        var m = true
        while (m) peek match {
          case TVar(n, _) => i += 1; orderBy += ((ExVar(n), true))
          case t if isWord(t, "ASC") || isWord(t, "DESC") =>
            val asc = isWord(t, "ASC"); i += 1
            expectPunct("(")
            orderBy += ((exprOr(), asc))
            expectPunct(")")
          case TWord(w, _) if FnNames.contains(w.toUpperCase) =>
            orderBy += ((exprPrimary(), true)) // bare Constraint, e.g. STRLEN(?x)
          case _ => m = false
        }
      }
      var limit: Option[Int] = None
      var offset: Option[Int] = None
      var m2 = true
      while (m2) {
        if (takeWord("LIMIT")) next() match {
          case TNum(lex, _) => limit = Some(lex.toInt)
          case t => fail("expected number after LIMIT", text, t.pos)
        } else if (takeWord("OFFSET")) next() match {
          case TNum(lex, _) => offset = Some(lex.toInt)
          case t => fail("expected number after OFFSET", text, t.pos)
        } else m2 = false
      }
      // trailing ValuesClause (grammar: SolutionModifier ValuesClause) —
      // joins the solutions AFTER grouping/HAVING, before projection
      val postVals = if (takeWord("VALUES")) Some(values()) else None
      val ps = projs.result()
      if (!star && ps.isEmpty) err("SELECT needs a projection (or *)")
      QSelect(distinct, star, ps, where, groupBy.result(), having.result(),
        orderBy.result(), limit, offset, postVals)
    }

    // ---------------- update request ----------------

    def updateRequest(): Seq[Update] = {
      prologue()
      val ops = Seq.newBuilder[Update]
      ops += update1()
      while (takePunct(";")) {
        prologue() // SPARQL allows a fresh prologue between operations
        if (!peek.isInstanceOf[TEof]) ops += update1()
      }
      peek match {
        case TEof(_) => ops.result()
        case t => fail("trailing tokens after update operation", text, t.pos)
      }
    }

    /** quad template: plain triples interleaved with `GRAPH (?v|<iri>) { … }`
      * blocks (SPARQL 1.1 grammar `Quads`). */
    private def template(): Seq[TQuad] = {
      expectPunct("{")
      val out = Seq.newBuilder[TQuad]
      while (!takePunct("}")) {
        if (takeWord("GRAPH")) {
          val g = next() match {
            case TVar(n, _) => V(n)
            case TIri(iri, _) => I(base + iri)
            case p: TPName => I(resolve(p))
            case t => fail("expected ?var or graph IRI after GRAPH", text, t.pos)
          }
          expectPunct("{")
          if (!takePunct("}")) {
            triplesBlock().foreach { case (s, p, o) => out += ((Some(g), s, p, o)) }
            expectPunct("}")
          }
          takePunct(".")
        } else triplesBlock().foreach { case (s, p, o) => out += ((None, s, p, o)) }
      }
      out.result()
    }

    /** `( USING [NAMED] <iri> )*` — the WHERE-clause dataset of a
      * DELETE/INSERT operation, mirroring FROM / FROM NAMED. */
    private def usingClauses(): (Seq[String], Seq[String]) = {
      val u = Seq.newBuilder[String]; val un = Seq.newBuilder[String]
      while (takeWord("USING")) {
        if (takeWord("NAMED")) un += graphIri() else u += graphIri()
      }
      (u.result(), un.result())
    }

    /** DELETE WHERE { quads }: rebuild the WHERE group from the template
      * quads, preserving adjacency — consecutive same-graph quads form one
      * BGP block, GRAPH-targeted runs wrap in an EGraph element. */
    private def groupOfQuads(quads: Seq[TQuad]): Group = {
      val runs = quads.foldLeft(Vector.empty[(Option[Term], Vector[(Term, Term, Term)])]) {
        case (acc, (g, s, p, o)) =>
          if (acc.nonEmpty && acc.last._1 == g) acc.init :+ ((g, acc.last._2 :+ ((s, p, o))))
          else acc :+ ((g, Vector((s, p, o))))
      }
      Group(runs.map {
        case (Some(V(n)), ts) => EGraph(Left(n), Group(Seq(EBlock(ts))))
        case (Some(I(g)), ts) => EGraph(Right(g), Group(Seq(EBlock(ts))))
        case (_, ts) => EBlock(ts)
      })
    }

    private def update1(): Update = {
      val withAt = peek.pos
      val withG = if (takeWord("WITH")) Some(graphIri()) else None
      def noWith(form: String): Unit =
        if (withG.isDefined)
          fail(s"WITH applies only to DELETE/INSERT … WHERE, not $form", text, withAt)
      if (takeWord("INSERT")) {
        if (takeWord("DATA")) { noWith("INSERT DATA"); UInsertData(quadData()) }
        else {
          val ins = template()
          val (u, un) = usingClauses()
          expectWord("WHERE")
          UModify(Nil, ins, group(), withG, u, un)
        }
      } else if (takeWord("DELETE")) {
        if (takeWord("DATA")) { noWith("DELETE DATA"); UDeleteData(quadData()) }
        else if (isWord(peek, "WHERE")) {
          // DELETE WHERE { pattern }: the pattern is both template and WHERE
          i += 1
          val pats = template()
          UModify(pats, Nil, groupOfQuads(pats), withG)
        } else {
          val del = template()
          val ins = if (takeWord("INSERT")) template() else Nil
          val (u, un) = usingClauses()
          expectWord("WHERE")
          UModify(del, ins, group(), withG, u, un)
        }
      } else { noWith("graph management"); update1Rest() }
    }

    private def update1Rest(): Update =
      if (takeWord("CLEAR") || takeWord("DROP")) {
        takeWord("SILENT")
        if (takeWord("GRAPH")) UClear(Some(graphIri()))
        else if (takeWord("NAMED") || takeWord("ALL")) UClear(None)
        else if (isWord(peek, "DEFAULT"))
          fail("the store has no default graph (named graphs only)", text, peek.pos)
        else fail("expected GRAPH <iri>, NAMED, ALL or DEFAULT", text, peek.pos)
      } else if (takeWord("CREATE")) {
        takeWord("SILENT"); expectWord("GRAPH"); graphIri(); UCreate
      } else if (isWord(peek, "ADD") || isWord(peek, "COPY") || isWord(peek, "MOVE")) {
        val kind = peek match { case TWord(w, _) => w.toUpperCase; case _ => "" }
        i += 1
        takeWord("SILENT")
        def graphOrDefault(): String =
          if (isWord(peek, "DEFAULT"))
            fail("the store has no default graph (named graphs only)", text, peek.pos)
          else { takeWord("GRAPH"); graphIri() }
        val from = graphOrDefault()
        expectWord("TO")
        UGraphOp(kind, from, graphOrDefault())
      } else if (takeWord("LOAD")) {
        takeWord("SILENT")
        val path = next() match {
          case TIri(v, _) => v
          case t => fail("expected a <file-or-dir-path> after LOAD", text, t.pos)
        }
        // no default graph to load into, so INTO GRAPH is mandatory —
        // except for N-Quads, which carry their own graph labels
        if (takeWord("INTO")) { expectWord("GRAPH"); ULoad(path, graphIri()) }
        else if (path.toLowerCase.endsWith(".nq")) ULoad(path, "")
        else err("LOAD needs INTO GRAPH <g> (only .nq sources carry their own graphs)")
      } else err("expected INSERT, DELETE, CLEAR, DROP, CREATE, ADD, COPY, MOVE or LOAD")

    private def graphIri(): String = next() match {
      case TIri(iri, _) => base + iri
      case p: TPName => resolve(p)
      case t => fail("expected a graph IRI", text, t.pos)
    }

    /** ground quad data for INSERT/DELETE DATA. The store is a union of
      * named graphs with no default graph, so every triple must sit inside
      * a `GRAPH <g> { … }` block; variables and paths are parse errors. */
    private def quadData(): Seq[(String, String, String, String)] = {
      def ground(t: Term, at: Int): String = t match {
        case I(v) => v
        case V(n) => fail(s"variable ?$n cannot appear in ground quad data", text, at)
        case P(_) => fail("property paths cannot appear in ground quad data", text, at)
      }
      expectPunct("{")
      val out = Seq.newBuilder[(String, String, String, String)]
      while (!takePunct("}")) {
        val at = peek.pos
        if (takeWord("GRAPH")) {
          val g = next() match {
            case TIri(iri, _) => base + iri
            case p: TPName => resolve(p)
            case t => fail("expected a graph IRI after GRAPH", text, t.pos)
          }
          expectPunct("{")
          val pats = triplesBlock()
          expectPunct("}")
          pats.foreach { case (s, p, o) =>
            out += ((g, ground(s, at), ground(p, at), ground(o, at)))
          }
        } else fail("quad data needs GRAPH <g> { … } blocks " +
          "(the store is graph-scoped with no default graph)", text, at)
        takePunct(".")
      }
      out.result()
    }
  }

  private[analytics] def parse(text: String): Query = new Parser(text).query()

  // ---- which variables need term-metadata companions --------------------
  // Walked once per request: a variable referenced by a term-inspector
  // builtin anywhere in the query gets KgQuery.metaCol companions bound at
  // its pattern scans. LANGMATCHES is not listed: its arguments are plain
  // expressions (the variables surface through the nested LANG call).
  private val TermFns = Set("LANG", "DATATYPE", "ISIRI", "ISURI", "ISLITERAL", "ISBLANK",
    "SAMETERM")

  private def exprMeta(e: Expr): Set[String] = e match {
    case ExFn(f, args) =>
      val own =
        if (TermFns(f)) args.collect { case ExVar(n) => n }.toSet
        else Set.empty[String]
      own ++ args.flatMap(exprMeta)
    case ExCmp(_, l, r) => exprMeta(l) ++ exprMeta(r)
    case ExArith(_, l, r) => exprMeta(l) ++ exprMeta(r)
    case ExAnd(l, r) => exprMeta(l) ++ exprMeta(r)
    case ExOr(l, r) => exprMeta(l) ++ exprMeta(r)
    case ExNot(x) => exprMeta(x)
    case ExIn(x, set, _) => exprMeta(x) ++ set.flatMap(exprMeta)
    case ExExists(g, _) => groupMeta(g)
    case _ => Set.empty
  }
  private def groupMeta(g: Group): Set[String] = g.elems.flatMap {
    case EFilter(e) => exprMeta(e)
    case EBind(e, _) => exprMeta(e)
    case EOptional(s) => groupMeta(s)
    case EMinus(s) => groupMeta(s)
    case EGroup(s) => groupMeta(s)
    case EGraph(_, s) => groupMeta(s)
    case EUnion(bs) => bs.flatMap(groupMeta)
    case ESubSelect(q) => selectMeta(q)
    case _ => Set.empty[String]
  }.toSet
  private def selectMeta(q: QSelect): Set[String] =
    groupMeta(q.where) ++
      q.projs.flatMap { case Projection(_, PExpr(e)) => exprMeta(e); case _ => Nil } ++
      q.having.flatMap(exprMeta) ++ q.orderBy.flatMap(o => exprMeta(o._1))
  private def queryMeta(q: Query): Set[String] = q match {
    case s: QSelect => selectMeta(s)
    case QAsk(w) => groupMeta(w)
    case QConstruct(_, w) => groupMeta(w)
    case QDescribe(_, w) => groupMeta(w)
    case QDescribeIri(_) => Set.empty
  }
  private def updateMeta(u: Update): Set[String] = u match {
    case UModify(_, _, w, _, _, _) => groupMeta(w)
    case _ => Set.empty
  }

  // ===================================================================
  // Compiler — AST → DataFrame over the KgQuery algebra
  // ===================================================================

  private final class Compiler(triples: DataFrame, graphCol: String,
      from: Seq[String] = Nil, fromNamed: Seq[String] = Nil,
      metaVars: Set[String] = Set.empty, retainMeta: Boolean = false) {
    private val spark = triples.sparkSession
    /** per-call-site salt for argless BNODE() — each occurrence mints its own
      * node within a solution (compiled once per occurrence). */
    private var bnodeCallN = 0
    /** BIND-derived column names — excluded from the bnode-mint solution
      * fingerprint so BNODE(?x) hashes the same frame at every call site
      * (§17.4.1.9: same arg within one solution → same node) regardless of
      * how many BINDs preceded it. Pattern/VALUES bindings stay in. */
    private val derivedCols = scala.collection.mutable.Set.empty[String]

    private def graphRestrict(store: DataFrame, graphs: Seq[String]): DataFrame =
      if (graphs.isEmpty) store
      else if (graphs.size == 1) store.filter(col(graphCol) === lit(graphs.head))
      else store.filter(col(graphCol).isInCollection(graphs))

    /** FROM-restricted store for patterns outside GRAPH clauses (the full
      * store when no FROM clause was given) — a pushed-down graph-column
      * membership filter, same shape as GRAPH <iri>. */
    private val defaultStore = graphRestrict(triples, from)
    /** FROM NAMED-restricted store for GRAPH clauses. */
    private val namedStore = graphRestrict(triples, fromNamed)

    /** shared-variable join keys; the graph column joins too when BOTH sides
      * carry it (an aggregating subquery projects it away). Term-metadata
      * companions never join — matching stays lexical (documented delta). */
    private def joinKeys(a: DataFrame, b: DataFrame): Seq[String] = {
      val shared = a.columns.toSet.intersect(b.columns.toSet)
      (if (shared(GraphCol)) Seq(GraphCol) else Nil) ++
        (shared - GraphCol).filterNot(KgQuery.isMetaCol).toSeq.sorted
    }

    /** drop from `b` any term-metadata companion `a` already carries (same
      * variable ⇒ same term ⇒ same metadata; first binding wins) so joins
      * never produce ambiguous duplicate companion columns. */
    private def dropDupMeta(a: DataFrame, b: DataFrame): DataFrame = {
      val dup = b.columns.filter(c => KgQuery.isMetaCol(c) && a.columns.contains(c))
      if (dup.isEmpty) b else b.drop(dup.toIndexedSeq: _*)
    }

    private def joinOn(a: DataFrame, b0: DataFrame): DataFrame = {
      val b = dropDupMeta(a, b0)
      val keys = joinKeys(a, b)
      if (keys.isEmpty) a.crossJoin(b) else a.join(b, keys)
    }

    /** entry for ASK: the WHERE group against the FROM-visible store. */
    def compileWhere(g: Group): DataFrame = compileGroup(g, defaultStore)

    def compileGroup(g: Group, store: DataFrame): DataFrame = {
      var acc: DataFrame = null
      val filters = Seq.newBuilder[Expr]
      def need(what: String): DataFrame = {
        require(acc != null, s"$what must follow a pattern that binds solutions")
        acc
      }
      g.elems.foreach {
        case EBlock(pats) =>
          val df = KgQuery.bgp(store, pats, graphCol, metaVars)
          acc = if (acc == null) df else joinOn(acc, df)
        case EGroup(sub) =>
          val df = compileGroup(sub, store)
          acc = if (acc == null) df else joinOn(acc, df)
        case EGraph(gname, sub) =>
          // the store's named graphs are the documents: every group already
          // carries GraphCol, so GRAPH only exposes (var) or pins (iri) it —
          // the iri filter pushes down through the group's pattern scans;
          // FROM NAMED restricts which graphs GRAPH ranges over
          val inner = compileGroup(sub, namedStore)
          val df = gname match {
            case Right(iri) => inner.filter(col(GraphCol) === lit(iri))
            case Left(v) =>
              require(v != GraphCol, s"GRAPH variable ?$v shadows the graph column")
              require(!inner.columns.contains(v),
                s"GRAPH variable ?$v is already bound inside the group")
              inner.withColumn(v, col(GraphCol))
          }
          acc = if (acc == null) df else joinOn(acc, df)
        case ESubSelect(q) =>
          val df = selectDF(q, store)
          acc = if (acc == null) df else joinOn(acc, df)
        case EUnion(branches) =>
          val sols = branches.map(compileGroup(_, store))
          val allVars = sols.flatMap(_.columns).distinct.filterNot(_ == GraphCol).sorted
          val df = sols.map { s =>
            val have = s.columns.toSet
            s.select(col(GraphCol) +:
              allVars.map(v => if (have(v)) col(v) else lit(null).cast("string").as(v)): _*)
          }.reduce(_.unionByName(_))
          acc = if (acc == null) df else joinOn(acc, df)
        case EOptional(sub) =>
          val a = need("OPTIONAL")
          // SPARQL LeftJoin(Ω1, Ω2, expr): the optional group's own top-level
          // FILTERs are the left-join condition, evaluated over the MERGED
          // binding — so a filter referencing an OUTER variable must ride the
          // join, not apply inside Ω2 (where the var is unbound). A filter
          // whose vars the inner group itself binds is equivalent either way
          // (false ⇒ the merge fails ⇒ μ1 survives NULL-padded), so those —
          // and EXISTS constraints, which compile to joins — stay inside.
          val innerNoF = compileGroup(Group(sub.elems.filterNot(_.isInstanceOf[EFilter])), store)
          val innerCols = innerNoF.columns.toSet
          val (hoisted, kept) = sub.elems.collect { case EFilter(e) => e }.partition { e =>
            val fv = freeVars(e)
            !fv.contains(ExistsMarker) && !fv.forall(innerCols.contains)
          }
          if (hoisted.isEmpty) {
            val df = dropDupMeta(a, kept.foldLeft(innerNoF)((d, e) => applyFilter(d, e, store)))
            acc = a.join(df, joinKeys(a, df), "left")
          } else {
            val inner = dropDupMeta(a, kept.foldLeft(innerNoF)((d, e) => applyFilter(d, e, store)))
            val keys = joinKeys(a, inner)
            val suffix = "__opt"
            val renamed = inner.columns.foldLeft(inner)((d, c) =>
              d.withColumnRenamed(c, c + suffix))
            // schema probe for unbound-var checks; col() stays unresolved
            // until the real join, so the Columns transfer
            val probe = a.crossJoin(renamed)
            def subst(e: Expr): Expr = e match {
              case ExVar(n) if innerCols.contains(n) && !keys.contains(n) => ExVar(n + suffix)
              case ExCmp(op, l, r) => ExCmp(op, subst(l), subst(r))
              case ExArith(op, l, r) => ExArith(op, subst(l), subst(r))
              case ExAnd(l, r) => ExAnd(subst(l), subst(r))
              case ExOr(l, r) => ExOr(subst(l), subst(r))
              case ExNot(x) => ExNot(subst(x))
              case ExIn(x, s, n) => ExIn(subst(x), s, n)
              case ExFn(n, args) => ExFn(n, args.map(subst))
              case other => other
            }
            val eqCond = keys.map(k => col(k) === col(k + suffix)).reduceOption(_ && _)
            val fCond = hoisted.map(e => compileExpr(subst(e), probe)).reduce(_ && _)
            var joined = a.join(renamed, eqCond.map(_ && fCond).getOrElse(fCond), "left")
            keys.foreach(k => joined = joined.drop(k + suffix))
            innerCols.filterNot(keys.contains).foreach(c =>
              joined = joined.withColumnRenamed(c + suffix, c))
            acc = joined
          }
        case EMinus(sub) =>
          val a = need("MINUS")
          val df = compileGroup(sub, store)
          val shared = (a.columns.toSet.intersect(df.columns.toSet) - GraphCol)
            .filterNot(KgQuery.isMetaCol)
          // SPARQL MINUS with disjoint domains removes nothing
          if (shared.nonEmpty)
            acc = a.join(df, joinKeys(a, df), "left_anti")
        case EFilter(e) => filters += e
        case EBind(e, v) =>
          val a = need("BIND")
          require(!a.columns.contains(v), s"BIND target ?$v is already bound")
          acc = a.withColumn(v, compileExpr(e, a))
          derivedCols += v
          // an inspected BIND target gets companion columns when its
          // expression's facets are derivable (STRLANG/STRDT tags, simple
          // literals, IRI()); otherwise the inspector fails loudly later
          if (metaVars(v)) termFacetsOpt(e, a).foreach { case (k, dt, lg) =>
            acc = acc.withColumn(KgQuery.metaCol(v, "kind"), k)
              .withColumn(KgQuery.metaCol(v, "datatype"), dt)
              .withColumn(KgQuery.metaCol(v, "lang"), lg)
          }
        case ev: EValues =>
          acc =
            if (acc == null)
              // leading VALUES: cross-extend the unit solution per graph
              store.select(col(graphCol).as(GraphCol)).distinct()
                .crossJoin(valuesFrame(ev))
            else joinValues(acc, ev)
      }
      val a = need("the group")
      filters.result().foldLeft(a)((d, e) => applyFilter(d, e, store))
    }

    /** an EValues inline-data table as a one-string-column-per-var frame
      * (UNDEF lands as NULL — which, per the engine's documented equi-join
      * compilation of VALUES, matches nothing). */
    private def valuesFrame(ev: EValues): DataFrame = {
      import scala.jdk.CollectionConverters._
      val schema = org.apache.spark.sql.types.StructType(
        ev.vars.map(v => org.apache.spark.sql.types.StructField(v, org.apache.spark.sql.types.StringType)))
      spark.createDataFrame(
        ev.rows.map(r => org.apache.spark.sql.Row.fromSeq(r.map(_.orNull))).asJava, schema)
    }

    /** Join(acc, data): equi join on shared vars, cross-extend when none. */
    private def joinValues(acc: DataFrame, ev: EValues): DataFrame = {
      val df = valuesFrame(ev)
      val shared = acc.columns.toSet.intersect(df.columns.toSet) - GraphCol
      if (shared.isEmpty) acc.crossJoin(df) else acc.join(df, shared.toSeq.sorted)
    }

    /** sentinel in freeVars marking an EXISTS constraint (join-compiled, so
      * never hoistable into an OPTIONAL's left-join condition). */
    private val ExistsMarker = "?__exists__"

    /** variables an expression references (plus [[ExistsMarker]]). */
    private def freeVars(e: Expr): Set[String] = e match {
      case ExVar(n) => Set(n)
      case ExCmp(_, l, r) => freeVars(l) ++ freeVars(r)
      case ExArith(_, l, r) => freeVars(l) ++ freeVars(r)
      case ExAnd(l, r) => freeVars(l) ++ freeVars(r)
      case ExOr(l, r) => freeVars(l) ++ freeVars(r)
      case ExNot(x) => freeVars(x)
      case ExIn(x, set, _) => freeVars(x) ++ set.flatMap(freeVars)
      case ExFn(_, args) => args.flatMap(freeVars).toSet
      case ExAgg(_, arg, _, _) => arg.toSet
      case ExExists(_, _) => Set(ExistsMarker)
      case _ => Set.empty
    }

    private def applyFilter(df: DataFrame, e: Expr, store: DataFrame): DataFrame = e match {
      // EXISTS compiles to a semi/anti join, not a boolean column
      case ExExists(g, neg) =>
        val sub = compileGroup(g, store)
        df.join(sub, joinKeys(df, sub), if (neg) "left_anti" else "left_semi")
      case ExAnd(l, r) => applyFilter(applyFilter(df, l, store), r, store)
      case _ => df.filter(compileExpr(e, df))
    }

    /** numeric when either side is a numeric literal or arithmetic,
      * lexical otherwise. try_cast, not cast: a non-numeric binding under a
      * numeric comparison is a SPARQL type error whose solution drops —
      * under Spark's ANSI mode a plain cast would ABORT the whole query on
      * the first such row (found by SparqlFuzzSpec). */
    private def cmp(op: String, le: Expr, re: Expr, df: DataFrame): Column = {
      def isNum(e: Expr) = e.isInstanceOf[ExNum] || e.isInstanceOf[ExArith]
      val numeric = isNum(le) || isNum(re)
      def side(e: Expr): Column = {
        val c = compileExpr(e, df)
        if (numeric) c.try_cast("double") else c
      }
      val (l, r) = (side(le), side(re))
      op match {
        case "=" => l === r
        case "!=" => l =!= r
        case "<" => l < r
        case "<=" => l <= r
        case ">" => l > r
        case ">=" => l >= r
      }
    }

    private def compileExpr(e: Expr, df: DataFrame): Column = e match {
      case ExVar(n) =>
        require(df.columns.contains(n), s"filter variable ?$n is not bound")
        col(n)
      case ExStr(v) => lit(v)
      case ExNum(lex) => lit(lex.toDouble)
      case ExBool(b) => lit(if (b) "true" else "false")
      case ExIri(iri) => lit(iri)
      case ExCmp(op, l, r) => cmp(op, l, r, df)
      case ExArith(op, l, r) =>
        // try_cast: arithmetic over a non-numeric binding yields NULL (the
        // solution drops at the consuming filter), never an ANSI abort
        val (a, b) = (compileExpr(l, df).try_cast("double"), compileExpr(r, df).try_cast("double"))
        op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "/" => a / b
        }
      case ExAnd(l, r) => compileExpr(l, df) && compileExpr(r, df)
      case ExOr(l, r) => compileExpr(l, df) || compileExpr(r, df)
      case ExNot(x) => !compileExpr(x, df)
      case ExIn(x, set, neg) =>
        val c = compileExpr(x, df).isInCollection(set.map {
          case ExNum(lex) => lex
          case ExStr(v) => v
          case ExIri(iri) => iri
          case other => throw new IllegalArgumentException(s"IN supports constants only, got $other")
        })
        if (neg) !c else c
      case ExFn("REGEX", args) =>
        require(args.size == 2 || args.size == 3, "REGEX(text, pattern[, flags])")
        val pat = args(1) match {
          case ExStr(p) => p
          case _ => throw new IllegalArgumentException("REGEX pattern must be a string literal")
        }
        val flags = args.lift(2).map {
          case ExStr(f) => f
          case _ => throw new IllegalArgumentException("REGEX flags must be a string literal")
        }.getOrElse("")
        val p = if (flags.contains("i")) "(?i)" + pat else pat
        compileExpr(args.head, df).rlike(p)
      case ExFn("BOUND", Seq(ExVar(n))) =>
        require(df.columns.contains(n), s"BOUND variable ?$n is not in scope")
        col(n).isNotNull
      case ExFn("STR", Seq(a)) => compileExpr(a, df)
      case ExFn("STRLEN", Seq(a)) => length(compileExpr(a, df))
      case ExFn("LCASE", Seq(a)) => lower(compileExpr(a, df))
      case ExFn("UCASE", Seq(a)) => upper(compileExpr(a, df))
      case ExFn("CONTAINS", Seq(a, b)) => compileExpr(a, df).contains(compileExpr(b, df))
      case ExFn("STRSTARTS", Seq(a, b)) => compileExpr(a, df).startsWith(compileExpr(b, df))
      case ExFn("STRENDS", Seq(a, b)) => compileExpr(a, df).endsWith(compileExpr(b, df))
      case ExFn("STRBEFORE", Seq(a, b)) =>
        // SPARQL: "" when the needle does not occur (instr is 1-based, 0 = miss)
        val (s, sep) = (compileExpr(a, df), compileExpr(b, df))
        val pos = instr(s, sep)
        when(pos > 0, s.substr(lit(1), pos - 1)).otherwise(lit(""))
      case ExFn("STRAFTER", Seq(a, b)) =>
        // FIRST occurrence (substring_index(-1) would take the last)
        val (s, sep) = (compileExpr(a, df), compileExpr(b, df))
        val pos = instr(s, sep)
        when(pos > 0, s.substr(pos + length(sep), length(s))).otherwise(lit(""))
      case ExFn("SUBSTR", args) if args.size == 2 || args.size == 3 =>
        // SPARQL and Spark substr are both 1-based; 2-arg form runs to the end
        val s = compileExpr(args.head, df)
        val start = compileExpr(args(1), df).try_cast("int")
        val len = args.lift(2).map(e => compileExpr(e, df).try_cast("int"))
          .getOrElse(length(s))
        s.substr(start, len)
      case ExFn("REPLACE", args) if args.size == 3 || args.size == 4 =>
        val pat = args(1) match {
          case ExStr(p) => p
          case _ => throw new IllegalArgumentException("REPLACE pattern must be a string literal")
        }
        val flags = args.lift(3).map {
          case ExStr(f) => f
          case _ => throw new IllegalArgumentException("REPLACE flags must be a string literal")
        }.getOrElse("")
        val p = if (flags.contains("i")) "(?i)" + pat else pat
        regexp_replace(compileExpr(args.head, df), p, args(2) match {
          case ExStr(r) => r
          case _ => throw new IllegalArgumentException("REPLACE replacement must be a string literal")
        })
      case ExFn("CONCAT", args) if args.nonEmpty =>
        concat(args.map(compileExpr(_, df)): _*)
      case ExFn("IF", Seq(c, t, f)) =>
        when(compileExpr(c, df), compileExpr(t, df)).otherwise(compileExpr(f, df))
      case ExFn("COALESCE", args) if args.nonEmpty =>
        coalesce(args.map(compileExpr(_, df)): _*)
      // numeric builtins follow the comparison rule: try_cast, a non-numeric
      // binding yields NULL and the solution drops at the consuming filter
      case ExFn("ENCODE_FOR_URI", Seq(a)) =>
        // url_encode is application/x-www-form-urlencoded; RFC 3986 differs
        // on exactly three outputs: space (+ vs %20), '*' (bare vs %2A) and
        // '~' (%7E vs bare). url_encode never emits a bare '+' or '*' for any
        // other input byte, so three replaces make it exact.
        replace(replace(replace(url_encode(compileExpr(a, df)),
          lit("+"), lit("%20")), lit("*"), lit("%2A")), lit("%7E"), lit("~"))
      case ExFn("MD5", Seq(a)) => md5(compileExpr(a, df).cast("binary"))
      case ExFn("SHA1", Seq(a)) => sha1(compileExpr(a, df).cast("binary"))
      case ExFn("SHA256", Seq(a)) => sha2(compileExpr(a, df).cast("binary"), 256)
      case ExFn("SHA384", Seq(a)) => sha2(compileExpr(a, df).cast("binary"), 384)
      case ExFn("SHA512", Seq(a)) => sha2(compileExpr(a, df).cast("binary"), 512)
      // the store is untyped strings, so IRI/URI construction is identity
      // (like STR); relative-IRI resolution would need a typed term model
      case ExFn("IRI" | "URI", Seq(a)) => compileExpr(a, df)
      case ExFn("ISNUMERIC", Seq(a)) =>
        compileExpr(a, df).try_cast("double").isNotNull
      // ---- RDF term inspectors: the store matches lexically, but term
      // KIND/DATATYPE/LANG ride as KgQuery.metaCol companions bound by bgp
      // for exactly the variables these builtins reference (collectMeta) —
      // so a "chat"@en vs "chat"@fr store is fully distinguishable even
      // though pattern matching stays lexical. Type errors (LANG of an IRI)
      // yield NULL and the solution drops at the consuming filter, per spec.
      case ExFn("LANG", Seq(a)) =>
        val (kind, _, lang) = termFacets(a, df, "LANG")
        when(kind === "literal", coalesce(lang, lit(""))).otherwise(lit(null).cast("string"))
      case ExFn("DATATYPE", Seq(a)) =>
        val (kind, dt, lang) = termFacets(a, df, "DATATYPE")
        when(kind === "literal",
          when(lang.isNotNull && lang =!= "", lit(RdfNs + "langString"))
            .when(dt.isNotNull && dt =!= "", dt)
            .otherwise(lit(XsdString)))
          .otherwise(lit(null).cast("string"))
      case ExFn("LANGMATCHES", Seq(t, r)) =>
        // RFC 4647 basic filtering: "*" matches any tagged literal; else
        // case-insensitive exact match or prefix at a '-' subtag boundary
        val tag = lower(compileExpr(t, df))
        val range = lower(compileExpr(r, df))
        when(range === "*", tag.isNotNull && tag =!= "")
          .otherwise(tag === range || tag.startsWith(concat(range, lit("-"))))
      case ExFn("ISIRI" | "ISURI", Seq(a)) => termFacets(a, df, "isIRI")._1 === "iri"
      case ExFn("ISLITERAL", Seq(a)) => termFacets(a, df, "isLiteral")._1 === "literal"
      case ExFn("ISBLANK", Seq(a)) => termFacets(a, df, "isBlank")._1 === "bnode"
      case ExFn("SAMETERM", Seq(a, b)) =>
        // RDF term identity: same kind, same lexical form, and for literals
        // the same effective datatype (xsd:string default, rdf:langString
        // when tagged) and case-normalized language tag — strictly finer
        // than `=` on a metadata-carrying store
        val (ka, da, la) = termFacets(a, df, "sameTerm")
        val (kb, db, lb) = termFacets(b, df, "sameTerm")
        def effDt(k: Column, d: Column, l: Column) =
          when(k === "literal",
            when(l.isNotNull && l =!= "", lit(RdfNs + "langString"))
              .when(d.isNotNull && d =!= "", d)
              .otherwise(lit(XsdString)))
            .otherwise(lit(""))
        def effLang(k: Column, l: Column) =
          when(k === "literal", lower(coalesce(l, lit("")))).otherwise(lit(""))
        (compileExpr(a, df) === compileExpr(b, df)) && (ka <=> kb) &&
          (effDt(ka, da, la) <=> effDt(kb, db, lb)) &&
          (effLang(ka, la) <=> effLang(kb, lb))
      // the constructed term's VALUE is its lexical form; the tag/datatype
      // surface through termFacetsOpt (BIND binds them as companions)
      case ExFn("STRLANG" | "STRDT", Seq(a, _)) => compileExpr(a, df)
      // xsd:dateTime accessors over the ISO-8601 lexical form (values are
      // lexical in this store); a non-dateTime argument extracts nothing →
      // NULL, the relational image of the SPARQL type error
      case ExFn("YEAR", Seq(a)) =>
        regexp_extract(compileExpr(a, df), "^(-?\\d{4,})-", 1).try_cast("int")
      case ExFn("MONTH", Seq(a)) =>
        regexp_extract(compileExpr(a, df), "^-?\\d{4,}-(\\d{2})-", 1).try_cast("int")
      case ExFn("DAY", Seq(a)) =>
        regexp_extract(compileExpr(a, df), "^-?\\d{4,}-\\d{2}-(\\d{2})", 1).try_cast("int")
      case ExFn("HOURS", Seq(a)) =>
        regexp_extract(compileExpr(a, df), "T(\\d{2}):", 1).try_cast("int")
      case ExFn("MINUTES", Seq(a)) =>
        regexp_extract(compileExpr(a, df), "T\\d{2}:(\\d{2})", 1).try_cast("int")
      case ExFn("SECONDS", Seq(a)) =>
        regexp_extract(compileExpr(a, df),
          "T\\d{2}:\\d{2}:(\\d{2}(?:\\.\\d+)?)", 1).try_cast("double")
      case ExFn("TZ", Seq(a)) =>
        // "Z", "+05:30", … ; "" when the lexical form carries no offset
        regexp_extract(compileExpr(a, df), "(Z|[+-]\\d{2}:\\d{2})$", 1)
      case ExFn("TIMEZONE", Seq(a)) =>
        // xsd:dayTimeDuration of the offset ("PT0S", "-PT8H", "PT5H30M");
        // no offset → SPARQL type error → NULL
        val tzs = regexp_extract(compileExpr(a, df), "(Z|[+-]\\d{2}:\\d{2})$", 1)
        val hh = substring(tzs, 2, 2).cast("int")
        val mm = substring(tzs, 5, 2).cast("int")
        val sign = when(substring(tzs, 1, 1) === "-" && (hh > 0 || mm > 0), lit("-"))
          .otherwise(lit(""))
        val body = when(hh === 0 && mm === 0, lit("0S")).otherwise(concat(
          when(hh > 0, concat(hh.cast("string"), lit("H"))).otherwise(lit("")),
          when(mm > 0, concat(mm.cast("string"), lit("M"))).otherwise(lit(""))))
        when(tzs === "Z", lit("PT0S"))
          .when(tzs =!= "", concat(sign, lit("PT"), body))
          .otherwise(lit(null))
      // ---- §17.4 constructors. BNODE is deterministic (content-hash mint,
      // keeping the engine's two-run determinism contract); NOW is constant
      // across one query (Spark folds current_timestamp per plan) but not
      // across runs; UUID/STRUUID/RAND are nondeterministic by definition.
      case ExFn("BNODE", args) if args.size <= 1 =>
        // same argument within one solution → same bnode (§17.4.1.9);
        // argless calls salt per call site so each mints its own node
        val salt = args.headOption.map(compileExpr(_, df))
          .getOrElse { bnodeCallN += 1; lit("()#" + bnodeCallN) }
        mintBnode(df, lit("BNODE"), salt)
      case ExFn("NOW", Seq()) =>
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      case ExFn("UUID", Seq()) => concat(lit("urn:uuid:"), expr("uuid()"))
      case ExFn("STRUUID", Seq()) => expr("uuid()")
      case ExFn("RAND", Seq()) => rand()
      // ---- §17.5 XPath constructor casts. Uncastable lexical form → NULL
      // (the relational image of the cast error). Numeric casts return
      // typed columns (comparisons/sorts go numeric); dateTime/date
      // validate the lexical shape and keep the canonical string form.
      case ExFn(n, Seq(a)) if n.startsWith("CAST:") =>
        val c = compileExpr(a, df)
        n.stripPrefix("CAST:http://www.w3.org/2001/XMLSchema#") match {
          case "integer" => c.try_cast("bigint")
          case "decimal" | "double" | "float" => c.try_cast("double")
          case "string" => c.cast("string")
          case "boolean" =>
            when(c.cast("string").isin("true", "1"), lit(true))
              .when(c.cast("string").isin("false", "0"), lit(false))
              .otherwise(lit(null).cast("boolean"))
          case "dateTime" => when(c.rlike(
            "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})?$"), c)
          case "date" => when(c.rlike("^\\d{4}-\\d{2}-\\d{2}(Z|[+-]\\d{2}:\\d{2})?$"), c)
        }
      case ExFn("ABS", Seq(a)) => abs(compileExpr(a, df).try_cast("double"))
      case ExFn("CEIL", Seq(a)) => ceil(compileExpr(a, df).try_cast("double")).cast("double")
      case ExFn("FLOOR", Seq(a)) => floor(compileExpr(a, df).try_cast("double")).cast("double")
      case ExFn("ROUND", Seq(a)) => round(compileExpr(a, df).try_cast("double")).cast("double")
      case ExFn(n, args) => throw new IllegalArgumentException(s"$n/${args.size} is not supported")
      case ExExists(_, _) =>
        throw new IllegalArgumentException(
          "EXISTS may appear only as a top-level FILTER conjunct (it compiles to a join)")
      case ExAgg(fn, _, _, _) =>
        throw new IllegalArgumentException(
          s"aggregate $fn may appear only in a projection or HAVING constraint")
    }

    private val XsdString = "http://www.w3.org/2001/XMLSchema#string"
    private val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"

    /** (kind, datatype, lang) columns of an inspector builtin's argument.
      * A variable reads its metadata companions (bound by bgp because
      * [[collectMeta]] saw the inspector); constants and computed
      * expressions are simple literals / IRIs by construction. */
    private def termFacets(e: Expr, df: DataFrame, fn: String): (Column, Column, Column) = {
      termFacetsOpt(e, df).getOrElse(e match {
        case ExVar(n) => throw new IllegalArgumentException(
          s"$fn(?$n): term metadata is unavailable — ?$n must be bound in a plain triple " +
            "pattern (not a property path or aggregate) of a store that carries an " +
            "obj_kind column, or by a BIND with derivable facets (e.g. STRLANG/STRDT); " +
            "pipeline output and NT/Turtle-loaded stores carry metadata")
        case _ => throw new IllegalArgumentException(
          s"$fn: term metadata is not derivable for a branching expression " +
            "(IF/COALESCE facets may differ per branch) — BIND the branches separately")
      })
    }

    /** (kind, datatype, lang) of an expression when statically derivable;
      * None for an uncompanioned variable or a branching expression. Used
      * both by the inspectors (via [[termFacets]], which turns None into a
      * loud error) and by BIND, which binds companion columns for inspected
      * variables whose expression has derivable facets. */
    private def termFacetsOpt(e: Expr, df: DataFrame): Option[(Column, Column, Column)] = {
      val nul = lit(null).cast("string")
      e match {
        case ExVar(n) =>
          val kindName = KgQuery.metaCol(n, "kind")
          if (!df.columns.contains(kindName)) None
          else {
            def facet(f: String) = {
              val c = KgQuery.metaCol(n, f)
              if (df.columns.contains(c)) col(c) else nul
            }
            Some((col(kindName), facet("datatype"), facet("lang")))
          }
        // STRLANG/STRDT construct tagged/typed literals: the VALUE column
        // stays the lexical form (matching is lexical — documented delta),
        // the tag/datatype ride as facets readable by LANG()/DATATYPE()
        case ExFn("STRLANG", Seq(_, t)) => Some((lit("literal"), nul, compileExpr(t, df)))
        case ExFn("STRDT", Seq(_, t)) => Some((lit("literal"), compileExpr(t, df), nul))
        case ExFn("IF" | "COALESCE", _) => None // branch facets may differ
        case ExFn("IRI" | "URI" | "UUID", _) => Some((lit("iri"), nul, nul))
        case ExFn("BNODE", _) => Some((lit("bnode"), nul, nul))
        case ExFn("NOW", _) =>
          Some((lit("literal"), lit("http://www.w3.org/2001/XMLSchema#dateTime"), nul))
        case ExFn("RAND", _) => Some((lit("literal"), lit(XsdDouble), nul))
        case ExFn("TIMEZONE", _) => Some((lit("literal"),
          lit("http://www.w3.org/2001/XMLSchema#dayTimeDuration"), nul))
        case ExIri(_) => Some((lit("iri"), nul, nul))
        case ExFn(n, _) if n.startsWith("CAST:") =>
          Some((lit("literal"), lit(n.stripPrefix("CAST:")), nul))
        case ExNum(_) | ExArith(_, _, _) => Some((lit("literal"), lit(XsdDouble), nul))
        case _ => Some((lit("literal"), nul, nul)) // string builtins: simple literals
      }
    }

    /** one aggregate column. SPARQL leaves SAMPLE's choice and GROUP_CONCAT's
      * order implementation-defined; both are made deterministic here (min /
      * sorted concat) so results are stable across partitionings. */
    private def aggColumn(fn: String, arg: Option[String], d: Boolean,
                          sep: Option[String]): Column = {
      def a = col(arg.getOrElse(
        throw new IllegalArgumentException(s"$fn requires a variable argument")))
      fn match {
        case "COUNT" if arg.isEmpty => count(lit(1))
        case "COUNT" if d => countDistinct(a)
        case "COUNT" => count(a)
        case "SUM" if d => sum_distinct(a.try_cast("double"))
        case "SUM" => sum(a.try_cast("double"))
        case "AVG" if d => // avg(DISTINCT) by definition; no functions._ variant
          sum_distinct(a.try_cast("double")) / countDistinct(a.try_cast("double"))
        case "AVG" => avg(a.try_cast("double"))
        case "MIN" => min(a.try_cast("double")) // DISTINCT is a no-op on MIN/MAX
        case "MAX" => max(a.try_cast("double"))
        case "SAMPLE" => min(a)
        case "GROUP_CONCAT" =>
          array_join(array_sort(if (d) collect_set(a) else collect_list(a)),
            sep.getOrElse(" "))
      }
    }

    /** fresh blank node per (solution, template label) — SPARQL template
      * bnode semantics, deterministically: a 64-bit content hash over the
      * solution's lexical bindings plus the label. Distinct solutions get
      * distinct labels up to the hash width (collisions astronomically
      * unlikely and harmless at query granularity). */
    private def mintBnode(sol: DataFrame, salt: Column*): Column = {
      // fingerprint = pattern/VALUES bindings only: BIND-derived columns are
      // functions of those (so add no distinctness) and their presence varies
      // by call site, which would break BNODE(?x)'s same-arg-same-node rule
      val parts = salt.toIndexedSeq ++ sol.columns
        .filterNot(KgQuery.isMetaCol).filterNot(derivedCols).sorted.map(col)
      concat(lit("_:m"), lower(hex(xxhash64(parts: _*))))
    }

    def compile(q: Query): DataFrame = q match {
      case QAsk(_) => throw new IllegalArgumentException("use Sparql.ask for ASK queries")
      case s: QSelect => selectDF(s, defaultStore)
      case QConstruct(template, where) =>
        val sol = compileGroup(where, defaultStore)
        val bound = sol.columns.toSet
        def t(x: Term): Column = x match {
          // template bnode labels always denote FRESH bnodes per solution
          // (never the pattern's binding, per the spec's template scope)
          case V(n) if n.startsWith("_:") => mintBnode(sol, lit(n))
          case V(n) =>
            require(bound.contains(n), s"template variable ?$n not bound by WHERE")
            col(n)
          case I(v) => lit(v)
          case _ => throw new IllegalArgumentException("paths cannot appear in a CONSTRUCT template")
        }
        template.map { case (s, p, o) =>
          sol.select(col(GraphCol).as(graphCol), t(s).as("subj"), t(p).as("pred"), t(o).as("obj"))
        }.reduce(_.unionByName(_)).distinct()
      case QDescribe(v, where) =>
        val sol = compileGroup(where, defaultStore)
        require(sol.columns.contains(v), s"DESCRIBE variable ?$v not bound by WHERE")
        val subs = sol.select(col(GraphCol).as("__g"), col(v).as("__s")).distinct()
        defaultStore.join(subs,
          col(graphCol) === col("__g") && col("subj") === col("__s"), "left_semi")
      case QDescribeIri(iri) =>
        // subject-star of a constant across all (FROM-visible) graphs:
        // one pushed-down filter
        defaultStore.filter(col("subj") === lit(iri))
    }

    /** does the expression contain an aggregate call anywhere? (decides
      * whether a `(expr AS ?a)` projection forces the grouped compile path) */
    private def hasAgg(e: Expr): Boolean = e match {
      case _: ExAgg => true
      case ExCmp(_, l, r) => hasAgg(l) || hasAgg(r)
      case ExArith(_, l, r) => hasAgg(l) || hasAgg(r)
      case ExAnd(l, r) => hasAgg(l) || hasAgg(r)
      case ExOr(l, r) => hasAgg(l) || hasAgg(r)
      case ExNot(x) => hasAgg(x)
      case ExIn(x, _, _) => hasAgg(x)
      case ExFn(_, args) => args.exists(hasAgg)
      case _ => false
    }

    /** (ASC|DESC) order keys compiled against `df`. */
    private def orderCols(orderBy: Seq[(Expr, Boolean)], df: DataFrame): Seq[Column] =
      orderBy.map { case (e, asc) =>
        val c = compileExpr(e, df)
        if (asc) c.asc else c.desc
      }

    private def selectDF(q: QSelect, store: DataFrame): DataFrame = {
      val QSelect(distinct, star, projs, where, groupBy, having, orderBy, limit, offset,
        postValues) = q;
      {
        var df = compileGroup(where, store)
        val grouped = groupBy.nonEmpty || having.nonEmpty || projs.exists {
          case Projection(_, _: PAgg) => true
          case Projection(_, PExpr(e)) => hasAgg(e)
          case _ => false
        }
        if (grouped) {
          // HAVING aggregates — and aggregates nested inside `(expr AS ?a)`
          // projections — become synthetic agg columns (__h0…); the HAVING
          // constraint / projection expression is then a plain post-aggregate
          // expression over them
          val hAggs = scala.collection.mutable.LinkedHashMap[ExAgg, String]()
          def subst(e: Expr): Expr = e match {
            case a: ExAgg => ExVar(hAggs.getOrElseUpdate(a, s"__h${hAggs.size}"))
            case ExCmp(op, l, r) => ExCmp(op, subst(l), subst(r))
            case ExArith(op, l, r) => ExArith(op, subst(l), subst(r))
            case ExAnd(l, r) => ExAnd(subst(l), subst(r))
            case ExOr(l, r) => ExOr(subst(l), subst(r))
            case ExNot(x) => ExNot(subst(x))
            case ExIn(x, s, n) => ExIn(subst(x), s, n)
            case ExFn(n, args) => ExFn(n, args.map(subst))
            case other => other
          }
          val havingSub = having.map(subst)
          val projSub = projs.map {
            case Projection(alias, PExpr(e)) => Projection(alias, PExpr(subst(e)))
            case p => p
          }
          val aggs = projs.collect { case Projection(alias, PAgg(fn, arg, d, sep)) =>
            aggColumn(fn, arg, d, sep).as(alias)
          } ++ hAggs.map { case (ExAgg(fn, arg, d, sep), alias) =>
            aggColumn(fn, arg, d, sep).as(alias)
          }
          require(aggs.nonEmpty, "GROUP BY without an aggregate projection")
          // expression group keys (GroupCondition ::= '(' expr [AS ?v] ')' |
          // BuiltInCall) materialize as columns BEFORE aggregation —
          // §18.2.4's Group(exprlist) — and are then plain keys; an alias
          // must not shadow a bound variable
          groupBy.foreach {
            case GroupKey(name, Some(e)) =>
              require(!df.columns.contains(name),
                s"GROUP BY alias ?$name collides with a bound variable")
              df = df.withColumn(name, compileExpr(e, df))
            case GroupKey(name, None) =>
              require(df.columns.contains(name),
                s"GROUP BY variable ?$name is not bound")
          }
          val keys = groupBy.map(g => col(g.name))
          // retainMeta (the serializer entry): group-key term metadata rides
          // the aggregate as a deterministic min — grouping itself stays
          // LEXICAL (the engine's documented matching delta), so a key whose
          // occurrences mix kinds picks the lexicographically least facet
          val metaAggs =
            if (!retainMeta) Nil
            else groupBy.flatMap(g => Seq("kind", "datatype", "lang")
              .map(KgQuery.metaCol(g.name, _)).filter(df.columns.contains)
              .map(m => min(col(m)).as(m)))
          val allAggs = aggs ++ metaAggs
          df = df.groupBy(keys: _*).agg(allAggs.head, allAggs.tail: _*)
          havingSub.foreach(e => df = df.filter(compileExpr(e, df)))
          // trailing VALUES joins the grouped solutions (spec §18.2.4: after
          // aggregation/HAVING, before projection/ORDER BY)
          postValues.foreach(ev => df = joinValues(df, ev))
          projSub.foreach {
            case Projection(_, PVar(n)) =>
              require(groupBy.exists(_.name == n) || postValues.exists(_.vars.contains(n)),
                s"projected ?$n is neither grouped nor aggregated")
            case _ => ()
          }
          val out = df
          val projCols = projSub.map {
            case Projection(alias, PVar(n)) => col(n).as(alias)
            case Projection(alias, PExpr(e)) =>
              // compileExpr's unbound-var check enforces "grouped or
              // aggregated" for variables inside the expression
              compileExpr(e, out).as(alias)
            case Projection(alias, _) => col(alias)
          }
          val metaProjCols =
            if (!retainMeta) Nil
            else projSub.collect { case Projection(alias, PVar(n)) =>
              Seq("kind", "datatype", "lang").map(f =>
                (KgQuery.metaCol(n, f), KgQuery.metaCol(alias, f)))
                .filter(p => out.columns.contains(p._1))
                .map { case (src, dst) => col(src).as(dst) }
            }.flatten
          df = df.select(projCols ++ metaProjCols: _*)
          if (distinct) df = df.distinct()
          // grouped order keys compile against the projected solution
          // (group keys and aggregate aliases — all that exists post-agg)
          if (orderBy.nonEmpty) df = df.orderBy(orderCols(orderBy, df): _*)
        } else {
          // trailing VALUES joins the pattern solutions before projection
          postValues.foreach(ev => df = joinValues(df, ev))
          // Non-grouped: ORDER BY may reference non-projected variables
          // (SPARQL ORDER BY runs before projection). Sort the WIDE frame —
          // every bound variable plus the computed projection aliases —
          // then project; a projection over Sort preserves the order. Under
          // DISTINCT the key must survive projection (which row's key would
          // order a collapsed group is undefined), so there the keys
          // compile against the projected solution as before.
          var wide =
            if (star) df
            else projs.foldLeft(df) {
              case (d, Projection(alias, PVar(n))) =>
                require(d.columns.contains(n), s"projected variable ?$n is not bound")
                if (alias == n) d
                else {
                  require(!d.columns.contains(alias),
                    s"projection alias ?$alias collides with a bound variable")
                  d.withColumn(alias, col(n))
                }
              case (d, Projection(alias, PExpr(e))) =>
                require(!d.columns.contains(alias),
                  s"projection alias ?$alias collides with a bound variable")
                d.withColumn(alias, compileExpr(e, d))
              case (_, Projection(_, _: PAgg)) =>
                throw new IllegalStateException("unreachable")
            }
          // term-metadata companions are internal — never user-visible
          // (except under retainMeta, the serializers' entry: each projected
          // plain variable keeps its `alias#kind/#datatype/#lang` companions
          // so CSV/TSV/JSON results can render true RDF term syntax); and
          // blank-node pattern variables are existential (SPARQL §16.2:
          // SELECT * projects named variables only)
          if (retainMeta && !star) projs.foreach {
            case Projection(alias, PVar(n)) if alias != n =>
              Seq("kind", "datatype", "lang").foreach { f =>
                if (wide.columns.contains(KgQuery.metaCol(n, f)))
                  wide = wide.withColumn(KgQuery.metaCol(alias, f),
                    col(KgQuery.metaCol(n, f)))
              }
            case _ => ()
          }
          val visible0 =
            if (star) df.columns
              .filterNot(KgQuery.isMetaCol).filterNot(_.startsWith("_:")).toSeq
            else GraphCol +: projs.map(_.alias)
          val visible =
            if (!retainMeta) visible0
            else visible0 ++ visible0.flatMap(n => Seq("kind", "datatype", "lang")
              .map(KgQuery.metaCol(n, _)).filter(wide.columns.contains))
          if (distinct) {
            df = wide.select(visible.map(col): _*).distinct()
            if (orderBy.nonEmpty) df = df.orderBy(orderCols(orderBy, df): _*)
          } else if (orderBy.nonEmpty) {
            df = wide.orderBy(orderCols(orderBy, wide): _*).select(visible.map(col): _*)
          } else df = wide.select(visible.map(col): _*)
        }
        offset.foreach(o => df = df.offset(o))
        limit.foreach(l => df = df.limit(l))
        df
      }
    }

    // ---------------- update application ----------------

    private val QuadKey = Seq(graphCol, "subj", "pred", "obj")

    /** template instantiation per solution — the CONSTRUCT projection,
      * deduplicated (RDF set semantics). Each quad's graph target: explicit
      * GRAPH IRI/var wins, else the WITH graph, else the solution's own
      * graph column (the store has no default graph). */
    private def instantiate(sol: DataFrame, tmpl: Seq[TQuad],
        withGraph: Option[String]): DataFrame = {
      val bound = sol.columns.toSet
      def t(x: Term): Column = x match {
        case V(n) if n.startsWith("_:") => mintBnode(sol, lit(n)) // fresh per solution
        case V(n) =>
          require(bound.contains(n), s"template variable ?$n not bound by WHERE")
          col(n)
        case I(v) => lit(v)
        case _ => throw new IllegalArgumentException("paths cannot appear in an update template")
      }
      tmpl.map { case (g, s, p, o) =>
        val gc = g.map(t).getOrElse(withGraph.map(lit).getOrElse(col(GraphCol)))
        sol.select(gc.as(graphCol), t(s).as("subj"), t(p).as("pred"), t(o).as("obj"))
      }.reduce(_.unionByName(_)).distinct()
    }

    private def quadDF(quads: Seq[(String, String, String, String)]): DataFrame = {
      import scala.jdk.CollectionConverters._
      val schema = org.apache.spark.sql.types.StructType(QuadKey.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
      spark.createDataFrame(
        quads.map(q => org.apache.spark.sql.Row(q._1, q._2, q._3, q._4)).asJava, schema)
    }

    /** store ∖ rows: one keyed anti join on the quad; extra store columns
      * (obj_kind, src_line, …) ride through untouched. */
    private def deleteRows(store: DataFrame, rows: DataFrame): DataFrame =
      store.join(rows, QuadKey, "left_anti")

    /** store ∪ (rows ∖ store): set semantics kept INCREMENTALLY — only the
      * genuinely new quads are appended, so no whole-store distinct ever
      * runs (the two shuffles are keyed on the quad and sized by the smaller
      * side under AQE). Inserted rows NULL-fill any extra store columns. */
    private def insertRows(store: DataFrame, rows: DataFrame): DataFrame =
      store.unionByName(
        rows.join(store.select(QuadKey.map(col): _*), QuadKey, "left_anti"),
        allowMissingColumns = true)

    /** one update operation against the compiler's store. Both the DELETE
      * and INSERT templates are instantiated against the ORIGINAL store's
      * solutions (SPARQL 1.1 Update §3.1.3), then deletes apply before
      * inserts. */
    def applyUpdate(u: Update): DataFrame = u match {
      case UInsertData(quads) => insertRows(triples, quadDF(quads))
      case UDeleteData(quads) => deleteRows(triples, quadDF(quads))
      case UModify(del, ins, where, withG, _, _) =>
        // WHERE matches the dataset-restricted view (WITH/USING — wired into
        // defaultStore by Sparql.update); deletes/inserts apply to the STORE
        require(!del.exists { case (g, s, p, o) =>
          (Seq(s, p, o) ++ g).exists {
            case V(n) => n.startsWith("_:"); case _ => false }
        }, "blank nodes cannot appear in a DELETE template (SPARQL 1.1 Update §3.1.3.2)")
        val sol = compileGroup(where, defaultStore)
        val afterDel =
          if (del.isEmpty) triples else deleteRows(triples, instantiate(sol, del, withG))
        if (ins.isEmpty) afterDel else insertRows(afterDel, instantiate(sol, ins, withG))
      case UClear(Some(g)) => triples.filter(col(graphCol) =!= lit(g))
      case UClear(None) => triples.limit(0)
      case UCreate => triples
      case UGraphOp(kind, from, to) =>
        if (from == to) triples // spec: same-graph ADD/COPY/MOVE is a no-op
        else {
          // full rows ride: extra store columns survive the retagging
          val src = triples.filter(col(graphCol) === lit(from))
            .withColumn(graphCol, lit(to))
          kind match {
            case "ADD" => insertRows(triples, src) // set semantics vs dest
            case "COPY" => triples.filter(col(graphCol) =!= lit(to)).unionByName(src)
            case "MOVE" => triples
              .filter(col(graphCol) =!= lit(to) && col(graphCol) =!= lit(from))
              .unionByName(src)
          }
        }
      case ULoad(path, g) =>
        val lower = path.toLowerCase
        val loaded =
          if (lower.endsWith(".nt"))
            graft.sources.NTriplesSource.read(spark, path).withColumn(graphCol, lit(g))
          else if (lower.endsWith(".ttl"))
            graft.sources.TurtleSource.read(spark, path).withColumn(graphCol, lit(g))
          else if (lower.endsWith(".nq")) {
            // quads carry their own graphs; INTO GRAPH <g> overrides them.
            // Without an override, default-graph lines (doc_id "") have no
            // home in this named-graphs-only store — fail loudly rather
            // than invent a graph name.
            val q = graft.sources.NQuadsSource.read(spark, path)
              .withColumnRenamed("doc_id", graphCol)
            if (g.nonEmpty) q.withColumn(graphCol, lit(g))
            else {
              // ADVICE r5: without the cut, the default-graph check and the
              // insert union each re-read and re-parse the whole file — the
              // lazy localCheckpoint parses once (the count materializes it)
              val qc = q.localCheckpoint(false)
              val dflt = qc.filter(col(graphCol) === "").count()
              require(dflt == 0, s"LOAD <$path>: $dflt default-graph line(s) — " +
                "this store is named-graphs-only; use LOAD ... INTO GRAPH <g> " +
                "to assign them")
              qc
            }
          } else throw new IllegalArgumentException(
            s"LOAD supports .nt, .nq and .ttl sources, got: $path")
        // project to the store's shape (never widen the store schema) and
        // dedup the file's own lines — RDF load is set semantics
        val metaCols = Seq("obj_kind", "obj_datatype", "obj_lang")
        val cols = QuadKey ++ metaCols
          .filter(c => triples.columns.contains(c) && loaded.columns.contains(c))
        // Dropping a metadata column the store lacks must never ALTER the
        // data: a store without obj_lang cannot represent "x"@en vs
        // "x"@fr, and the load's distinct() would silently collapse them
        // into one plain literal. Fail loudly exactly when distinct terms
        // of the loaded data would conflate under the store's schema (two
        // distinct counts over the load — cheap next to the load itself);
        // the caller can widen the store (withColumn) or strip explicitly.
        val dropped = metaCols
          .filter(c => loaded.columns.contains(c) && !triples.columns.contains(c))
        val projected = loaded.select(cols.map(col): _*).distinct()
        if (dropped.nonEmpty) {
          val full = loaded.select((cols ++ dropped).map(col): _*).distinct()
          require(projected.count() == full.count(),
            s"LOAD <$path>: the data contains terms distinguished only by metadata " +
              s"(${dropped.mkString("/")}) the store's schema cannot represent — " +
              "loading would silently conflate them; widen the store (e.g. " +
              ".withColumn(\"obj_lang\", lit(\"\"))) or strip the metadata explicitly")
        }
        insertRows(triples, projected)
    }
  }

  /** Parse and plan a SPARQL SELECT/CONSTRUCT/DESCRIBE query over the triples
    * table. SELECT returns one column per projected variable (plus `graph`
    * for non-aggregating queries); CONSTRUCT returns new triple rows;
    * DESCRIBE returns rows of the input table. */
  def query(triples: DataFrame, text: String, graphCol: String = "doc_id"): DataFrame = {
    val p = new Parser(text)
    p.query() match {
      case QAsk(_) => throw new IllegalArgumentException("use Sparql.ask for ASK queries")
      case q => new Compiler(triples, graphCol, p.fromGraphs, p.fromNamed,
        queryMeta(q)).compile(q)
    }
  }

  /** Parse and plan a SPARQL SELECT retaining RDF-term metadata: each
    * projected plain variable `?v` keeps `v#kind` / `v#datatype` / `v#lang`
    * companion columns where the store can derive them (object positions
    * need `obj_kind`-family columns; subjects/predicates derive kind
    * structurally; expression and aggregate projections carry none and
    * serialize as plain literals). This is the result-serializer entry —
    * [[SparqlResults]] renders these frames as W3C SPARQL 1.1 Results
    * CSV/TSV/JSON. Note DISTINCT under this entry deduplicates over TERMS
    * (value + kind/datatype/lang), not the engine's usual lexical form. */
  def selectTerms(triples: DataFrame, text: String, graphCol: String = "doc_id"): DataFrame = {
    val p = new Parser(text)
    p.query() match {
      case q: QSelect =>
        val projVars: Set[String] =
          if (q.star) Set("*")
          else q.projs.collect { case Projection(_, PVar(n)) => n }.toSet
        new Compiler(triples, graphCol, p.fromGraphs, p.fromNamed,
          queryMeta(q) ++ projVars, retainMeta = true).compile(q)
      case _ => throw new IllegalArgumentException("selectTerms requires a SELECT query")
    }
  }

  /** Parse and evaluate a SPARQL ASK query (existence probe, limit-1 plan). */
  def ask(triples: DataFrame, text: String, graphCol: String = "doc_id"): Boolean = {
    val p = new Parser(text)
    p.query() match {
      case QAsk(where) =>
        !new Compiler(triples, graphCol, p.fromGraphs, p.fromNamed,
          groupMeta(where)).compileWhere(where).isEmpty
      case _ => throw new IllegalArgumentException("not an ASK query")
    }
  }

  /** Parse and apply a SPARQL 1.1 Update request (INSERT DATA, DELETE DATA,
    * DELETE WHERE, DELETE/INSERT … WHERE; `;`-separated sequences run left
    * to right, each against the previous operation's result). Returns the
    * updated triples table — the store is never mutated in place; at scale
    * the caller writes the result as the table's next snapshot (the
    * copy-on-write model parquet/Iceberg tables already use). Every
    * operation plans as keyed anti joins + a union: no whole-store distinct,
    * no collect. Ground quad data must sit inside `GRAPH <g> { … }` blocks
    * (the store is a union of named graphs, one per document — there is no
    * default graph to insert into); extra non-quad columns survive deletes
    * and NULL-fill on inserted rows. */
  def update(triples: DataFrame, text: String, graphCol: String = "doc_id"): DataFrame = {
    val ops = new Parser(text).updateRequest()
    ops.zipWithIndex.foldLeft(triples) { case (store0, (op, i)) =>
      // An intermediate store (op 2+ of a `;` sequence) is consumed several
      // times by the next op (WHERE compile, delete anti join, insert anti
      // join + union) — a LAZY localCheckpoint computes it once and lets
      // every consumer read the blocks, instead of stacking op k-1's whole
      // plan into op k three times (round 6, guide §5; no extra job — the
      // first action materializes). The input store and the final result
      // stay untouched (callers own their lineage).
      val store = if (i == 0) store0 else store0.localCheckpoint(false)
      // WITH/USING shape the WHERE clause's dataset exactly like FROM /
      // FROM NAMED shape a query's: USING graphs (when any) are the default
      // graph, else the WITH graph, else the whole store; USING NAMED
      // restricts which graphs GRAPH clauses range over (SPARQL 1.1 Update
      // §3.1.3). Templates resolve their graph in `instantiate`.
      val (from, named) = op match {
        case UModify(_, _, _, withG, u, un) =>
          (if (u.nonEmpty) u else withG.toSeq, un)
        case _ => (Nil, Nil)
      }
      new Compiler(store, graphCol, from, named, updateMeta(op)).applyUpdate(op)
    }
  }
}
