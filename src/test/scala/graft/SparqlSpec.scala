package graft

import graft.analytics.Sparql
import org.apache.spark.sql.DataFrame

class SparqlSpec extends SparkTestBase {

  private def triples(rows: Seq[(String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "subj", "pred", "obj")
  }

  private val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val ifc = "http://example.org/ifc#"
  private val kg = triples(Seq(
    ("d1", "w1", rdfType, s"${ifc}Wall"),
    ("d1", "w1", s"${ifc}hasHeight", "3.0"),
    ("d1", "w1", s"${ifc}inStorey", "s1"),
    ("d1", "s1", rdfType, s"${ifc}Storey"),
    ("d1", "w2", rdfType, s"${ifc}Wall"),
    ("d1", "w2", s"${ifc}hasHeight", "12.5"),
    ("d1", "w2", s"${ifc}inStorey", "s1"),
    ("d1", "d7", rdfType, s"${ifc}Door"),
    ("d2", "w1", rdfType, s"${ifc}Wall"), // same IRI, other graph
    ("d2", "w1", s"${ifc}inStorey", "s9"),
    ("d2", "s9", rdfType, s"${ifc}Storey")))

  private val P = s"PREFIX ifc: <$ifc>\nPREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"

  private def rows(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet

  private def q(text: String): DataFrame = Sparql.query(kg, text)

  // ------------------------------------------------------------ SELECT + BGP

  test("SELECT with a two-pattern BGP, prefixed names, and 'a'") {
    val got = q(P + "SELECT ?w ?st WHERE { ?w a ifc:Wall . ?w ifc:inStorey ?st }")
    assert(rows(got, "graph", "w", "st") == Set(
      Seq("d1", "w1", "s1"), Seq("d1", "w2", "s1"), Seq("d2", "w1", "s9")))
  }

  test("';' and ',' predicate-object shorthand parse into one subject's patterns") {
    val got = q(P + "SELECT ?w ?h ?st WHERE { ?w a ifc:Wall ; ifc:hasHeight ?h ; ifc:inStorey ?st . }")
    assert(rows(got, "w", "h", "st") == Set(Seq("w1", "3.0", "s1"), Seq("w2", "12.5", "s1")))
  }

  test("SELECT * projects every bound variable") {
    val got = q(P + "SELECT * WHERE { ?s a ifc:Storey }")
    assert(got.columns.toSet == Set("graph", "s"))
    assert(rows(got, "graph", "s") == Set(Seq("d1", "s1"), Seq("d2", "s9")))
  }

  test("solutions never span graphs") {
    // w1 is a Wall in both graphs but s9 is only d2's storey
    val got = q(P + "SELECT ?w WHERE { ?w ifc:inStorey ?st . ?st a ifc:Storey }")
    assert(rows(got, "graph", "w") == Set(
      Seq("d1", "w1"), Seq("d1", "w2"), Seq("d2", "w1")))
  }

  test("constant object patterns filter; full IRIs in <>") {
    val got = q(s"SELECT ?x WHERE { ?x <$rdfType> <${ifc}Door> }")
    assert(rows(got, "x") == Set(Seq("d7")))
  }

  // ------------------------------------------------------------ FILTER

  test("numeric FILTER casts both sides to double") {
    val got = q(P + "SELECT ?w WHERE { ?w ifc:hasHeight ?h . FILTER (?h > 4) }")
    assert(rows(got, "w") == Set(Seq("w2"))) // "12.5" > 4 numerically, not lexically
  }

  test("string FILTER functions and boolean connectives") {
    val got = q(P + """SELECT ?w WHERE { ?w a ifc:Wall .
      FILTER (STRSTARTS(?w, "w") && (?w = "w1" || ?w = "w2") && !(?w = "w2")) }""")
    assert(rows(got, "graph", "w") == Set(Seq("d1", "w1"), Seq("d2", "w1")))
  }

  test("REGEX with the i flag; IN lists") {
    val g1 = q(P + """SELECT ?c WHERE { ?x a ?c . FILTER REGEX(?c, "WALL$", "i") }""")
    assert(rows(g1, "c").map(_.head) == Set(s"${ifc}Wall"))
    val g2 = q(P + """SELECT ?w WHERE { ?w a ifc:Wall . FILTER (?w IN ("w2", "w9")) }""")
    assert(rows(g2, "w") == Set(Seq("w2")))
  }

  // ------------------------------------------------------------ OPTIONAL / UNION / MINUS / EXISTS

  test("OPTIONAL NULL-pads where the group has no match") {
    val got = q(P + "SELECT ?w ?h WHERE { ?w a ifc:Wall . OPTIONAL { ?w ifc:hasHeight ?h } }")
    assert(rows(got, "graph", "w", "h") == Set(
      Seq("d1", "w1", "3.0"), Seq("d1", "w2", "12.5"), Seq("d2", "w1", null)))
  }

  test("BOUND distinguishes OPTIONAL matches") {
    val got = q(P + """SELECT ?w WHERE { ?w a ifc:Wall .
      OPTIONAL { ?w ifc:hasHeight ?h } FILTER (!BOUND(?h)) }""")
    assert(rows(got, "graph", "w") == Set(Seq("d2", "w1")))
  }

  test("OPTIONAL filter referencing outer variables is the left-join condition") {
    // ?h is bound OUTSIDE the optional group: the filter must evaluate over
    // the merged binding (LeftJoin expr), keeping non-matching rows NULL-padded
    val got = q(P + """SELECT ?w ?h ?st WHERE { ?w ifc:hasHeight ?h .
      OPTIONAL { ?w ifc:inStorey ?st FILTER (?h > 4) } }""")
    assert(rows(got, "w", "h", "st") == Set(
      Seq("w1", "3.0", null), Seq("w2", "12.5", "s1")))
    // mixed outer + inner vars in one conjunction
    val mixed = q(P + """SELECT ?w ?h ?st WHERE { ?w ifc:hasHeight ?h .
      OPTIONAL { ?w ifc:inStorey ?st FILTER (?h > 4 && ?st = "s1") } }""")
    assert(rows(mixed, "w", "h", "st") == Set(
      Seq("w1", "3.0", null), Seq("w2", "12.5", "s1")))
    // inner-only filters keep the inside-apply path (equivalent per spec)
    val innerOnly = q(P + """SELECT ?w ?h WHERE { ?w a ifc:Wall .
      OPTIONAL { ?w ifc:hasHeight ?h FILTER (?h > 4) } }""")
    assert(rows(innerOnly, "graph", "w", "h") == Set(
      Seq("d1", "w1", null), Seq("d1", "w2", "12.5"), Seq("d2", "w1", null)))
  }

  test("UNION concatenates branches with NULL-padded branch-only variables") {
    val got = q(P + "SELECT ?x ?st WHERE { { ?x a ifc:Door } UNION { ?x ifc:inStorey ?st } }")
    assert(rows(got, "x", "st") == Set(
      Seq("d7", null), Seq("w1", "s1"), Seq("w2", "s1"), Seq("w1", "s9")))
  }

  test("MINUS removes solutions matching the subtracted group") {
    val got = q(P + "SELECT ?w WHERE { ?w a ifc:Wall . MINUS { ?w ifc:hasHeight ?h } }")
    assert(rows(got, "graph", "w") == Set(Seq("d2", "w1")))
  }

  test("FILTER NOT EXISTS compiles to an anti join; EXISTS to a semi join") {
    val g1 = q(P + "SELECT ?w WHERE { ?w a ifc:Wall . FILTER NOT EXISTS { ?w ifc:hasHeight ?h } }")
    assert(rows(g1, "graph", "w") == Set(Seq("d2", "w1")))
    val g2 = q(P + "SELECT ?w WHERE { ?w a ifc:Wall . FILTER EXISTS { ?w ifc:hasHeight ?h } }")
    assert(rows(g2, "w") == Set(Seq("w1"), Seq("w2")))
  }

  // ------------------------------------------------------------ BIND / VALUES

  test("BIND extends solutions with a computed column") {
    val got = q(P + "SELECT ?w ?len WHERE { ?w a ifc:Wall . BIND (STRLEN(?w) AS ?len) }")
    assert(rows(got, "w", "len") == Set(Seq("w1", 2), Seq("w2", 2)))
  }

  test("VALUES constrains via an inline-data join") {
    val got = q(P + """SELECT ?w ?h WHERE { ?w ifc:hasHeight ?h . VALUES ?w { "w2" "w9" } }""")
    assert(rows(got, "w", "h") == Set(Seq("w2", "12.5")))
  }

  test("multi-variable VALUES rows") {
    val got = q(P + """SELECT ?w ?st WHERE { ?w ifc:inStorey ?st .
      VALUES (?w ?st) { ("w1" "s1") ("w1" "s9") } }""")
    assert(rows(got, "graph", "w", "st") == Set(Seq("d1", "w1", "s1"), Seq("d2", "w1", "s9")))
  }

  test("trailing VALUES clause joins the query solutions") {
    // grammar: SolutionModifier ValuesClause — after the WHERE group
    val got = q(P + """SELECT ?w ?h WHERE { ?w ifc:hasHeight ?h } VALUES ?w { "w2" "w9" }""")
    assert(rows(got, "w", "h") == Set(Seq("w2", "12.5")))
    // with solution modifiers in between
    val ord = q(P + """SELECT ?w ?st WHERE { ?w ifc:inStorey ?st }
      ORDER BY ?w LIMIT 10 VALUES (?w ?st) { ("w1" "s1") ("w1" "s9") }""")
    assert(rows(ord, "graph", "w", "st") == Set(Seq("d1", "w1", "s1"), Seq("d2", "w1", "s9")))
  }

  test("trailing VALUES joins AFTER grouping (spec §18.2.4)") {
    // the VALUES var is the group key: restricts the aggregated solutions
    val got = q(P + """SELECT ?cls (COUNT(?i) AS ?n) WHERE { ?i a ?cls }
      GROUP BY ?cls VALUES ?cls { <http://example.org/ifc#Wall> }""")
    assert(rows(got, "cls", "n") == Set(Seq(s"${ifc}Wall", 3L)))
    // no shared var: cross-extends each aggregated row (a post-grouping
    // VALUES var is projectable even though it is neither grouped nor
    // aggregated — the join runs after aggregation)
    val cross = q(P + """SELECT ?cls (COUNT(?i) AS ?n) ?tag
      WHERE { ?i a ?cls . VALUES ?cls { <http://example.org/ifc#Door> } }
      GROUP BY ?cls VALUES ?tag { "a" "b" }""")
    assert(rows(cross, "cls", "n", "tag") ==
      Set(Seq(s"${ifc}Door", 1L, "a"), Seq(s"${ifc}Door", 1L, "b")))
  }

  // ------------------------------------------------------------ paths

  test("property path: sequence and inverse") {
    val got = q(P + "SELECT ?w ?c WHERE { ?w ifc:inStorey/a ?c }")
    assert(rows(got, "w", "c").map(_.last).toSet == Set(s"${ifc}Storey"))
    val inv = q(P + "SELECT ?st ?w WHERE { ?st ^ifc:inStorey ?w }")
    assert(rows(inv, "st", "w") == Set(Seq("s1", "w1"), Seq("s1", "w2"), Seq("s9", "w1")))
  }

  test("property path: alternation and zero-or-one") {
    val alt = q(P + "SELECT ?s ?o WHERE { ?s ifc:hasHeight|ifc:inStorey ?o }")
    assert(rows(alt, "s", "o") == Set(
      Seq("w1", "3.0"), Seq("w2", "12.5"), Seq("w1", "s1"), Seq("w2", "s1"), Seq("w1", "s9")))
    // zero-or-one from a fixed subject: itself plus its storey
    val opt = q(P + """SELECT ?o WHERE { ?s ifc:inStorey? ?o . FILTER (?s = "w2") }""")
    assert(rows(opt, "o") == Set(Seq("w2"), Seq("s1")))
  }

  test("negated property set: everything but the listed predicates") {
    val got = q(P + "SELECT ?s ?o WHERE { ?s !rdf:type ?o }")
    assert(rows(got, "graph", "s", "o") == Set(
      Seq("d1", "w1", "3.0"), Seq("d1", "w1", "s1"),
      Seq("d1", "w2", "12.5"), Seq("d1", "w2", "s1"), Seq("d2", "w1", "s9")))
    val multi = q(P + "SELECT ?s ?o WHERE { ?s !(rdf:type|ifc:hasHeight) ?o }")
    assert(rows(multi, "s", "o") == Set(Seq("w1", "s1"), Seq("w2", "s1"), Seq("w1", "s9")))
  }

  test("negated property set: inverse members get a reversed scan") {
    // !(^rdf:type): every REVERSE edge whose predicate is not rdf:type
    val invOnly = q(P + "SELECT ?s ?o WHERE { ?s !(^rdf:type) ?o }")
    assert(rows(invOnly, "graph", "s", "o") == Set(
      Seq("d1", "3.0", "w1"), Seq("d1", "s1", "w1"),
      Seq("d1", "12.5", "w2"), Seq("d1", "s1", "w2"),
      Seq("d2", "s9", "w1")))
    // bare !^iri form (no parentheses)
    val bare = q(P + """SELECT ?o WHERE { ?s !^rdf:type ?o . FILTER (?s = "3.0") }""")
    assert(rows(bare, "o") == Set(Seq("w1")))
    // mixed members split per SPARQL 1.1 §18.4: the forward branch excludes
    // only the forward members, the reversed branch only the inverse ones
    val mixed = q(P + "SELECT ?s ?o WHERE { ?s !(rdf:type|^rdf:type|^ifc:hasHeight) ?o }")
    assert(rows(mixed, "s", "o") == Set(
      Seq("w1", "3.0"), Seq("w1", "s1"), Seq("w2", "12.5"), Seq("w2", "s1"),
      Seq("w1", "s9"), Seq("s1", "w1"), Seq("s1", "w2"), Seq("s9", "w1")))
  }

  test("subquery joins on its projected variables") {
    // per-storey wall count computed in the subquery, joined to each wall
    val got = q(P + """SELECT ?w ?n WHERE {
      ?w a ifc:Wall .
      { SELECT ?st (COUNT(?w2) AS ?n) WHERE { ?w2 ifc:inStorey ?st } GROUP BY ?st }
      ?w ifc:inStorey ?st .
    }""")
    assert(rows(got, "graph", "w", "n") == Set(
      Seq("d1", "w1", 2L), Seq("d1", "w2", 2L), Seq("d2", "w1", 1L)))
  }

  test("DESCRIBE <iri> returns the constant's subject-star across graphs") {
    val got = q(P + "DESCRIBE <w1>")
    assert(got.count() == 5) // d1: type+height+storey, d2: type+storey
    assert(rows(got, "subj").map(_.head).toSet == Set("w1"))
  }

  test("property path: closure over a chain table") {
    val chain = triples(Seq(
      ("A", "c1", "nxt", "c2"), ("A", "c2", "nxt", "c3"), ("A", "c9", "x", "y")))
    val got = Sparql.query(chain, "SELECT ?a ?b WHERE { ?a <nxt>+ ?b }")
    assert(rows(got, "a", "b") == Set(Seq("c1", "c2"), Seq("c1", "c3"), Seq("c2", "c3")))
  }

  // ------------------------------------------------------------ aggregates / modifiers

  test("GROUP BY with COUNT and AVG aggregates") {
    val got = q(P + """SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x a ?c } GROUP BY ?c""")
    assert(rows(got, "c", "n") == Set(
      Seq(s"${ifc}Wall", 3L), Seq(s"${ifc}Storey", 2L), Seq(s"${ifc}Door", 1L)))
    val avg = q(P + "SELECT (AVG(?h) AS ?m) WHERE { ?w ifc:hasHeight ?h }")
    assert(rows(avg, "m") == Set(Seq(7.75)))
  }

  test("GROUP BY expressions: (expr AS ?v) projectable, bare builtin, loud errors") {
    // group Walls and Doors by the last path segment's FIRST letter:
    // w1/w2 -> "w" (x3 incl. d2's w1), s1/s9 -> "s", d7 -> "d"
    val got = q(P + """SELECT ?k (COUNT(*) AS ?n) WHERE { ?x a ?c }
      GROUP BY (SUBSTR(STR(?x), 1, 1) AS ?k)""")
    assert(rows(got, "k", "n") == Set(Seq("w", 3L), Seq("s", 2L), Seq("d", 1L)))
    // a bare BuiltInCall group condition has no name — only aggregates project
    val bare = q(P + """SELECT (COUNT(*) AS ?n) WHERE { ?x a ?c }
      GROUP BY STRLEN(?x)""") // lengths 2 -> one group of 6
    assert(rows(bare, "n") == Set(Seq(6L)))
    // HAVING sees the expression key through its alias
    val hav = q(P + """SELECT ?k (COUNT(*) AS ?n) WHERE { ?x a ?c }
      GROUP BY (SUBSTR(STR(?x), 1, 1) AS ?k) HAVING (COUNT(*) > 1)""")
    assert(rows(hav, "k", "n") == Set(Seq("w", 3L), Seq("s", 2L)))
    def bad(text: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](q(P + text).collect())
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !contains '$frag'")
    }
    bad("""SELECT (COUNT(*) AS ?n) WHERE { ?x a ?c } GROUP BY (STR(?x) AS ?c)""",
      "collides with a bound variable")
    bad("""SELECT (COUNT(*) AS ?n) WHERE { ?x a ?c } GROUP BY ?nope""",
      "is not bound")
  }

  test("COUNT(DISTINCT ?x) and COUNT(*)") {
    val got = q(P + """SELECT (COUNT(*) AS ?rows) (COUNT(DISTINCT ?w) AS ?walls)
      WHERE { ?w a ifc:Wall }""")
    assert(rows(got, "rows", "walls") == Set(Seq(3L, 2L)))
  }

  test("arithmetic in FILTER and BIND, with precedence") {
    val got = q(P + "SELECT ?w WHERE { ?w ifc:hasHeight ?h . FILTER (?h * 2 > 7) }")
    assert(rows(got, "w") == Set(Seq("w2"))) // 3.0*2=6 fails, 12.5*2=25 passes
    val prec = q(P + "SELECT ?w WHERE { ?w ifc:hasHeight ?h . FILTER (?h + 2 * 3 > 10) }")
    assert(rows(prec, "w") == Set(Seq("w2"))) // 3+6=9 fails, 12.5+6=18.5 passes
    val bind = q(P + "SELECT ?w ?half WHERE { ?w ifc:hasHeight ?h . BIND (?h / 2 AS ?half) }")
    assert(rows(bind, "w", "half") == Set(Seq("w1", 1.5), Seq("w2", 6.25)))
  }

  test("HAVING filters aggregated groups; aggregates allowed in the constraint") {
    val got = q(P + """SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x a ?c }
      GROUP BY ?c HAVING (COUNT(?x) > 1)""")
    assert(rows(got, "c", "n") == Set(
      Seq(s"${ifc}Wall", 3L), Seq(s"${ifc}Storey", 2L)))
    // two constraints conjoin; an un-projected aggregate may drive HAVING
    val two = q(P + """SELECT ?c (COUNT(?x) AS ?n) WHERE { ?x a ?c }
      GROUP BY ?c HAVING (COUNT(?x) > 1) (COUNT(DISTINCT ?x) < 3)""")
    assert(rows(two, "c", "n") == Set(Seq(s"${ifc}Wall", 3L), Seq(s"${ifc}Storey", 2L)))
  }

  test("SAMPLE and GROUP_CONCAT are deterministic (min / sorted)") {
    val got = q(P + """SELECT ?c (SAMPLE(?x) AS ?one)
      (GROUP_CONCAT(DISTINCT ?x; SEPARATOR="|") AS ?all)
      WHERE { ?x a ?c } GROUP BY ?c""")
    assert(rows(got, "c", "one", "all") == Set(
      Seq(s"${ifc}Wall", "w1", "w1|w2"),
      Seq(s"${ifc}Storey", "s1", "s1|s9"),
      Seq(s"${ifc}Door", "d7", "d7")))
  }

  test("DISTINCT, ORDER BY, LIMIT, OFFSET") {
    val got = q(P + "SELECT DISTINCT ?st WHERE { ?w ifc:inStorey ?st } ORDER BY DESC(?st) LIMIT 1")
    assert(rows(got, "st") == Set(Seq("s9")))
    val page = q(P + "SELECT DISTINCT ?st WHERE { ?w ifc:inStorey ?st } ORDER BY ?st LIMIT 1 OFFSET 1")
    assert(rows(page, "st") == Set(Seq("s9")))
  }

  // ------------------------------------------------------------ other forms

  test("ASK is an existence probe") {
    assert(Sparql.ask(kg, P + "ASK { ?x a ifc:Door }"))
    assert(!Sparql.ask(kg, P + "ASK { ?x a ifc:Roof }"))
  }

  test("CONSTRUCT materializes template triples with set semantics") {
    val got = q(P + """CONSTRUCT { ?st <urn:hasWall> ?w . ?st a <urn:Host> }
      WHERE { ?w a ifc:Wall ; ifc:inStorey ?st }""")
    assert(rows(got, "doc_id", "subj", "pred", "obj") == Set(
      Seq("d1", "s1", "urn:hasWall", "w1"), Seq("d1", "s1", "urn:hasWall", "w2"),
      Seq("d2", "s9", "urn:hasWall", "w1"),
      Seq("d1", "s1", rdfType, "urn:Host"), Seq("d2", "s9", rdfType, "urn:Host")))
  }

  test("DESCRIBE returns the subject-star of each binding") {
    val got = q(P + "DESCRIBE ?w WHERE { ?w a ifc:Door }")
    assert(rows(got, "doc_id", "subj", "pred", "obj") ==
      Set(Seq("d1", "d7", rdfType, s"${ifc}Door")))
  }

  // ------------------------------------------------------------ expression builtins

  test("string builtins: SUBSTR, STRBEFORE, STRAFTER, REPLACE, CONCAT") {
    val got = q(P + """SELECT ?w ?pre ?post ?sub ?rep ?cat WHERE {
        ?w a ifc:Wall ; ifc:hasHeight ?h .
        BIND(STRBEFORE(?h, ".") AS ?pre)
        BIND(STRAFTER(?h, ".") AS ?post)
        BIND(SUBSTR(?h, 1, 2) AS ?sub)
        BIND(REPLACE(?h, "\\.", "_") AS ?rep)
        BIND(CONCAT(?w, "@", ?h) AS ?cat)
      }""")
    assert(rows(got, "w", "pre", "post", "sub", "rep", "cat") == Set(
      Seq("w1", "3", "0", "3.", "3_0", "w1@3.0"),
      Seq("w2", "12", "5", "12", "12_5", "w2@12.5")))
  }

  test("STRBEFORE/STRAFTER return empty string on a miss (SPARQL, not substring_index)") {
    val got = q(P + """SELECT ?w ?b ?a WHERE {
        ?w a ifc:Wall ; ifc:hasHeight ?h .
        BIND(STRBEFORE(?h, "x") AS ?b)
        BIND(STRAFTER(?h, "x") AS ?a)
      }""")
    assert(rows(got, "b", "a") == Set(Seq("", "")))
  }

  test("IF and COALESCE") {
    val got = q(P + """SELECT ?w ?sz ?fb WHERE {
        ?w a ifc:Wall ; ifc:hasHeight ?h .
        OPTIONAL { ?w ifc:noSuch ?m }
        BIND(IF(?h > 10, "tall", "short") AS ?sz)
        BIND(COALESCE(?m, ?h, "none") AS ?fb)
      }""")
    assert(rows(got, "w", "sz", "fb") == Set(
      Seq("w1", "short", "3.0"), Seq("w2", "tall", "12.5")))
  }

  test("numeric builtins ABS/CEIL/FLOOR/ROUND follow the try_cast rule") {
    val got = q(P + """SELECT ?w ?c ?f ?r ?ab WHERE {
        ?w a ifc:Wall ; ifc:hasHeight ?h .
        BIND(CEIL(?h) AS ?c) BIND(FLOOR(?h) AS ?f)
        BIND(ROUND(?h) AS ?r) BIND(ABS(0 - ?h) AS ?ab)
      }""")
    assert(rows(got, "w", "c", "f", "r", "ab") == Set(
      Seq("w1", 3.0, 3.0, 3.0, 3.0), Seq("w2", 13.0, 12.0, 13.0, 12.5)))
    // a non-numeric binding under a numeric builtin yields NULL, never an abort
    val nn = q(P + """SELECT ?w ?c WHERE {
        ?w a ifc:Wall ; ifc:inStorey ?st . BIND(CEIL(?st) AS ?c) }""")
    assert(nn.collect().forall(_.isNullAt(nn.columns.indexOf("c"))))
  }

  test("SUM and AVG honor DISTINCT") {
    // heights bag: 3.0, 12.5 (all walls) plus a second 3.0 from the <4 branch
    val got = q(P + """SELECT (SUM(?h) AS ?s) (SUM(DISTINCT ?h) AS ?sd)
      (AVG(?h) AS ?a) (AVG(DISTINCT ?h) AS ?ad) WHERE {
        { ?w ifc:hasHeight ?h } UNION { ?w2 ifc:hasHeight ?h . FILTER (?h < 4) } }""")
    assert(rows(got, "s", "sd", "a", "ad") == Set(
      Seq(18.5, 15.5, 18.5 / 3, 15.5 / 2)))
  }

  test("ORDER BY accepts ASC/DESC(expression) and bare constraints") {
    val g1 = q(P + "SELECT ?w ?h WHERE { ?w ifc:hasHeight ?h } ORDER BY DESC(?h + 0)")
    assert(g1.select("w").collect().map(_.getString(0)).toSeq == Seq("w2", "w1"))
    val g2 = q(P + "SELECT ?w ?h WHERE { ?w ifc:hasHeight ?h } ORDER BY STRLEN(?h)")
    assert(g2.select("w").collect().map(_.getString(0)).toSeq == Seq("w1", "w2"))
  }

  test("CONSTRUCT WHERE shorthand: the pattern is the template") {
    val got = q(P + "CONSTRUCT WHERE { ?w a ifc:Wall }")
    assert(rows(got, "doc_id", "subj", "pred", "obj") == Set(
      Seq("d1", "w1", rdfType, s"${ifc}Wall"),
      Seq("d1", "w2", rdfType, s"${ifc}Wall"),
      Seq("d2", "w1", rdfType, s"${ifc}Wall")))
    val e = intercept[IllegalArgumentException](
      q(P + "CONSTRUCT WHERE { ?w a ifc:Wall . FILTER (?w = \"w1\") }"))
    assert(e.getMessage.contains("plain triples block"))
  }

  test("ENCODE_FOR_URI (RFC 3986), MD5/SHA1, IRI identity, ISNUMERIC") {
    val got = q(P + """SELECT ?e ?m ?s ?i WHERE { ?x a ifc:Door .
      BIND(ENCODE_FOR_URI("a b*c~d/é") AS ?e)
      BIND(MD5("abc") AS ?m) BIND(SHA1("abc") AS ?s)
      BIND(IRI(CONCAT("urn:", ?x)) AS ?i) }""")
    assert(rows(got, "e", "m", "s", "i") == Set(Seq(
      "a%20b%2Ac~d%2F%C3%A9",
      "900150983cd24fb0d6963f7d28e17f72",
      "a9993e364706816aba3e25717850c26c9cd0d89d",
      "urn:d7")))
    val num = q(P + "SELECT ?w WHERE { ?w ifc:hasHeight ?h . FILTER ISNUMERIC(?h) }")
    assert(rows(num, "w") == Set(Seq("w1"), Seq("w2")))
    val non = q(P + "SELECT ?w WHERE { ?w a ifc:Wall . FILTER (!ISNUMERIC(?w)) }")
    assert(rows(non, "graph", "w") == Set(Seq("d1", "w1"), Seq("d1", "w2"), Seq("d2", "w1")))
  }

  test("SHA256/SHA384/SHA512 hash builtins (RFC test vectors for \"abc\")") {
    val got = q(P + """SELECT ?h2 ?h3 ?h5 WHERE { ?x a ifc:Door .
      BIND(SHA256("abc") AS ?h2) BIND(SHA384("abc") AS ?h3)
      BIND(SHA512("abc") AS ?h5) }""")
    assert(rows(got, "h2", "h3", "h5") == Set(Seq(
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
      "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed" +
        "8086072ba1e7cc2358baeca134c825a7",
      "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
        "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f")))
  }

  // ------------------------------------------------------------ GRAPH

  test("GRAPH ?g binds the graph name (doc_id) of the group's solutions") {
    val got = q(P + "SELECT ?g ?w WHERE { GRAPH ?g { ?w a ifc:Wall } }")
    assert(rows(got, "g", "w") == Set(
      Seq("d1", "w1"), Seq("d1", "w2"), Seq("d2", "w1")))
  }

  test("GRAPH <iri> pins the group to one named graph") {
    val got = q(P + "SELECT ?w WHERE { GRAPH <d2> { ?w a ifc:Wall } }")
    assert(rows(got, "graph", "w") == Set(Seq("d2", "w1")))
  }

  test("GRAPH composes with surrounding patterns (same-graph join)") {
    val got = q(P + """SELECT ?g ?w ?st WHERE {
      ?w ifc:inStorey ?st . GRAPH ?g { ?st a ifc:Storey } }""")
    assert(rows(got, "g", "w", "st") == Set(
      Seq("d1", "w1", "s1"), Seq("d1", "w2", "s1"), Seq("d2", "w1", "s9")))
  }

  test("GRAPH loud errors: variable already bound inside the group") {
    val e = intercept[IllegalArgumentException](
      q(P + "SELECT ?x WHERE { GRAPH ?x { ?x a ifc:Wall } }").collect())
    assert(e.getMessage.contains("already bound"))
  }

  // ------------------------------------------------------------ expression projections

  test("(expression AS ?alias) without aggregates is a computed projection") {
    val got = q(P + """SELECT ?w (CONCAT(?w, "@", ?st) AS ?tag)
      WHERE { ?w a ifc:Wall ; ifc:inStorey ?st }""")
    assert(rows(got, "w", "tag") == Set(
      Seq("w1", "w1@s1"), Seq("w2", "w2@s1"), Seq("w1", "w1@s9")))
  }

  test("(expression over aggregates AS ?alias) compiles via synthetic agg columns") {
    val got = q(P + """SELECT ?st ((MAX(?h) - MIN(?h)) AS ?range)
      WHERE { ?w ifc:hasHeight ?h ; ifc:inStorey ?st } GROUP BY ?st""")
    assert(rows(got, "st", "range") == Set(Seq("s1", 9.5)))
  }

  test("aggregate expressions may mix builtins and group keys") {
    val got = q(P + """SELECT ?st (CONCAT(?st, "#", STR(COUNT(?w))) AS ?lbl)
      WHERE { ?w a ifc:Wall ; ifc:inStorey ?st } GROUP BY ?st""")
    assert(rows(got, "st", "lbl") == Set(Seq("s1", "s1#2"), Seq("s9", "s9#1")))
  }

  test("expression projections over ungrouped variables fail loudly") {
    val e = intercept[IllegalArgumentException](
      q(P + """SELECT ?st ((MAX(?h) + STRLEN(?w)) AS ?x)
        WHERE { ?w ifc:hasHeight ?h ; ifc:inStorey ?st } GROUP BY ?st""").collect())
    assert(e.getMessage.contains("?w is not bound"))
  }

  // ------------------------------------------------------------ update

  private def all(df: DataFrame): Set[Seq[Any]] =
    df.select("doc_id", "subj", "pred", "obj").collect().map(_.toSeq).toSet

  test("INSERT DATA appends only genuinely new quads (set semantics, graph-scoped)") {
    val got = Sparql.update(kg, P + s"""INSERT DATA {
        GRAPH <d1> { <w9> a ifc:Wall . <w1> rdf:type ifc:Wall }
      }""")
    // <w1> a Wall already exists in d1 → no duplicate row appears
    assert(got.count() == kg.count() + 1)
    assert(all(got).contains(Seq("d1", "w9", rdfType, s"${ifc}Wall")))
  }

  test("DELETE DATA removes exactly the named quads in the named graph") {
    val got = Sparql.update(kg, P + s"""DELETE DATA {
        GRAPH <d1> { <w1> rdf:type ifc:Wall } .
        GRAPH <d9> { <w1> rdf:type ifc:Wall }
      }""")
    assert(all(got) == all(kg) - Seq("d1", "w1", rdfType, s"${ifc}Wall"))
  }

  test("DELETE WHERE uses the pattern as both template and constraint") {
    val got = Sparql.update(kg, P + "DELETE WHERE { ?w ifc:hasHeight ?h }")
    assert(all(got) == all(kg).filterNot(_(2) == s"${ifc}hasHeight"))
  }

  test("DELETE/INSERT WHERE rewrites against the ORIGINAL store's solutions") {
    val got = Sparql.update(kg, P + """DELETE { ?w ifc:inStorey ?st }
        INSERT { ?st <urn:hosts> ?w } WHERE { ?w ifc:inStorey ?st }""")
    val expectGone = all(kg).filterNot(_(2) == s"${ifc}inStorey")
    val expectNew = Set(Seq("d1", "s1", "urn:hosts", "w1"): Seq[Any],
      Seq("d1", "s1", "urn:hosts", "w2"), Seq("d2", "s9", "urn:hosts", "w1"))
    assert(all(got) == expectGone ++ expectNew)
  }

  test("';'-separated update sequence runs left to right") {
    val got = Sparql.update(kg, P + s"""
      INSERT DATA { GRAPH <d3> { <x> a ifc:Door } } ;
      DELETE WHERE { ?d a ifc:Door }""")
    // the freshly inserted d3 door is visible to (and deleted by) op 2
    assert(all(got) == all(kg) - Seq("d1", "d7", rdfType, s"${ifc}Door"))
  }

  test("update keeps extra store columns: deletes preserve, inserts NULL-fill") {
    import org.apache.spark.sql.functions.lit
    val wide = kg.withColumn("src_line", lit(7L))
    val got = Sparql.update(wide, P + """DELETE { ?w ifc:hasHeight ?h }
        INSERT { ?w <urn:h> ?h } WHERE { ?w ifc:hasHeight ?h }""")
    val bySrc = got.collect().groupBy(r => r.isNullAt(r.fieldIndex("src_line")))
    assert(bySrc(false).length == kg.count() - 2) // survivors keep src_line=7
    assert(bySrc(true).map(_.getString(got.columns.indexOf("pred"))).toSet == Set("urn:h"))
  }

  test("graph management: CLEAR/DROP, CREATE, ADD/COPY/MOVE") {
    def upd(text: String) = Sparql.update(kg, P + text)
    assert(upd("CLEAR GRAPH <d1>").select("doc_id").distinct()
      .collect().map(_.getString(0)).toSet == Set("d2"))
    assert(upd("DROP SILENT GRAPH <d2>").filter("doc_id = 'd2'").count() == 0)
    assert(upd("CLEAR ALL").count() == 0)
    assert(upd("CREATE GRAPH <d9>").count() == kg.count())
    // ADD keeps both graphs, set semantics on the dest: of d2's 3 triples,
    // (w1 a Wall) already exists in d1 — 8 + 2 new = 10 in d1, 3 in d2
    val added = upd("ADD <d2> TO <d1>")
    assert(added.filter("doc_id = 'd1'").count() == 10)
    assert(added.count() == 13)
    // COPY replaces the dest graph outright
    val copied = upd("COPY <d2> TO <d1>")
    assert(copied.filter("doc_id = 'd1'").count() == 3)
    assert(copied.count() == 6)
    // MOVE = COPY + drop the source; same-graph MOVE is a no-op
    val moved = upd("MOVE <d2> TO <d1>")
    assert(moved.count() == 3)
    assert(moved.filter("doc_id = 'd2'").count() == 0)
    assert(upd("MOVE <d1> TO <d1>").count() == kg.count())
    // sequences compose left to right
    assert(upd("CLEAR GRAPH <d2> ; CLEAR GRAPH <d1>").count() == 0)
  }

  test("LOAD reads .nt and .ttl files into a named graph (set semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sparql-load")
    val nt = dir.resolve("data.nt")
    java.nio.file.Files.write(nt,
      ("<urn:x> <urn:p> \"v\" .\n<urn:x> <urn:p> <urn:y> .\n" +
       "<urn:x> <urn:p> \"v\" .\n").getBytes("UTF-8")) // dup line → one row
    val afterNt = Sparql.update(kg, s"LOAD <${nt}> INTO GRAPH <dx>")
    assert(afterNt.filter("doc_id = 'dx'").count() == 2)
    assert(afterNt.count() == kg.count() + 2)

    val ttl = dir.resolve("data.ttl")
    java.nio.file.Files.write(ttl,
      "@prefix ex: <urn:ex#> .\nex:a ex:p ex:b ; ex:q \"lit\" .\n".getBytes("UTF-8"))
    val afterTtl = Sparql.update(kg, s"LOAD SILENT <${ttl}> INTO GRAPH <dy>")
    assert(afterTtl.filter("doc_id = 'dy'").count() == 2)

    def bad(text: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](Sparql.update(kg, text).collect())
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !contains '$frag'")
    }
    bad(s"LOAD <${nt}>", "LOAD needs INTO GRAPH")
    bad(s"LOAD <${dir.resolve("x.json")}> INTO GRAPH <dz>", ".nt, .nq and .ttl")
    bad("CLEAR DEFAULT", "no default graph")
    bad("ADD DEFAULT TO <d1>", "no default graph")
  }

  test("LOAD .nq keeps its own graphs, INTO GRAPH overrides, default-graph lines loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sparql-loadnq")
    val nq = dir.resolve("data.nq")
    java.nio.file.Files.write(nq,
      ("<urn:x> <urn:p> \"v\" <urn:gA> .\n" +
       "<urn:x> <urn:p> <urn:y> <urn:gB> .\n" +
       "<urn:x> <urn:p> \"v\" <urn:gA> .\n").getBytes("UTF-8")) // dup line → one row
    val kept = Sparql.update(kg, s"LOAD <${nq}>")
    assert(kept.filter("doc_id = 'urn:gA'").count() == 1)
    assert(kept.filter("doc_id = 'urn:gB'").count() == 1)
    assert(kept.count() == kg.count() + 2)
    // INTO GRAPH overrides the file's labels (and collapses the set further)
    val forced = Sparql.update(kg, s"LOAD <${nq}> INTO GRAPH <dz>")
    assert(forced.filter("doc_id = 'dz'").count() == 2)
    assert(forced.filter("doc_id = 'urn:gA'").count() == 0)
    // a default-graph line has no home without an override
    val mixed = dir.resolve("mixed.nq")
    java.nio.file.Files.write(mixed,
      "<urn:x> <urn:p> \"v\" .\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      Sparql.update(kg, s"LOAD <${mixed}>").collect())
    assert(e.getMessage.contains("default-graph"))
    // ... but loads fine with one
    assert(Sparql.update(kg, s"LOAD <${mixed}> INTO GRAPH <dw>")
      .filter("doc_id = 'dw'").count() == 1)
  }

  test("update loud errors: variables in ground data, bare triples without GRAPH") {
    def bad(text: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](Sparql.update(kg, text).collect())
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !contains '$frag'")
    }
    bad(P + "INSERT DATA { GRAPH <d1> { ?v a ifc:Wall } }", "variable ?v")
    bad(P + "INSERT DATA { <a> <b> <c> }", "GRAPH")
    bad(P + "SELECT ?x WHERE { ?x ?p ?o }", "expected INSERT, DELETE, CLEAR")
    bad(P + "WITH <d1> INSERT DATA { GRAPH <d1> { <a> <b> <c> } }", "WITH applies only")
    bad(P + "WITH <d1> CLEAR GRAPH <d1>", "WITH applies only")
  }

  test("WITH scopes both the WHERE match and unGRAPHed template quads") {
    val got = Sparql.update(kg, P + """WITH <d1> DELETE { ?w ifc:inStorey ?st }
        INSERT { ?st <urn:hosts> ?w } WHERE { ?w ifc:inStorey ?st }""")
    // d2's inStorey row survives untouched; d1's two are rewritten in d1
    val expect = all(kg).filterNot(r => r(0) == "d1" && r(2) == s"${ifc}inStorey") ++
      Set(Seq("d1", "s1", "urn:hosts", "w1"): Seq[Any], Seq("d1", "s1", "urn:hosts", "w2"))
    assert(all(got) == expect)
  }

  test("WITH <g> DELETE WHERE shorthand scopes pattern and template to the graph") {
    val got = Sparql.update(kg, P + "WITH <d1> DELETE WHERE { ?w ifc:inStorey ?st }")
    assert(all(got) == all(kg)
      - Seq("d1", "w1", s"${ifc}inStorey", "s1") - Seq("d1", "w2", s"${ifc}inStorey", "s1"))
  }

  test("GRAPH <iri> template blocks direct inserted quads to that graph") {
    val got = Sparql.update(kg, P + """INSERT { GRAPH <summary> { ?w a ifc:Wall } }
        WHERE { ?w a ifc:Wall }""")
    assert(all(got).filter(_(0) == "summary") == Set(
      Seq("summary", "w1", rdfType, s"${ifc}Wall"): Seq[Any],
      Seq("summary", "w2", rdfType, s"${ifc}Wall")))
    assert(got.count() == kg.count() + 2)
  }

  test("GRAPH ?var template blocks follow the solution's graph binding") {
    val got = Sparql.update(kg, P + """INSERT { GRAPH ?g { ?w <urn:isWall> "y" } }
        WHERE { GRAPH ?g { ?w a ifc:Wall } }""")
    assert(all(got).filter(_(2) == "urn:isWall") == Set(
      Seq("d1", "w1", "urn:isWall", "y"): Seq[Any],
      Seq("d1", "w2", "urn:isWall", "y"),
      Seq("d2", "w1", "urn:isWall", "y")))
  }

  test("DELETE WHERE accepts GRAPH blocks as quad patterns") {
    val got = Sparql.update(kg, P + "DELETE WHERE { GRAPH <d2> { ?w ifc:inStorey ?st } }")
    assert(all(got) == all(kg) - Seq("d2", "w1", s"${ifc}inStorey", "s9"))
  }

  test("USING restricts the WHERE dataset like FROM; the delete hits the store") {
    val got = Sparql.update(kg, P + """DELETE { ?w ifc:inStorey ?st }
        USING <d2> WHERE { ?w ifc:inStorey ?st }""")
    assert(all(got) == all(kg) - Seq("d2", "w1", s"${ifc}inStorey", "s9"))
  }

  test("§17.4 constructors: BNODE, NOW, TIMEZONE, UUID, STRUUID, RAND") {
    // BNODE(?x): same arg in one solution → same node; distinct solutions → distinct
    val g1 = q(P + """SELECT ?w ?a ?b ?c WHERE { ?w a ifc:Wall .
        BIND(BNODE(?w) AS ?a) BIND(BNODE(?w) AS ?b) BIND(BNODE() AS ?c) }""")
    val r1 = g1.collect()
    assert(r1.length == 3)
    assert(r1.forall(r => r.getString(2) == r.getString(3))) // a == b
    assert(r1.forall(r => r.getString(2) != r.getString(4))) // a != c (argless salt)
    assert(r1.map(_.getString(2)).distinct.length == 3) // distinct per solution
    assert(r1.forall(_.getString(2).startsWith("_:m")))
    // TIMEZONE: dayTimeDuration forms, NULL when no offset; DATATYPE facet
    val tzStore = triples(Seq(
      ("d1", "e1", "urn:at", "2024-03-01T10:00:00Z"),
      ("d1", "e2", "urn:at", "2024-03-01T10:00:00+05:30"),
      ("d1", "e3", "urn:at", "2024-03-01T10:00:00-08:00"),
      ("d1", "e4", "urn:at", "2024-03-01T10:00:00")))
    val g2 = Sparql.query(tzStore,
      "SELECT ?s (TIMEZONE(?t) AS ?z) WHERE { ?s <urn:at> ?t }")
    assert(rows(g2, "s", "z") == Set(
      Seq("e1", "PT0S"), Seq("e2", "PT5H30M"), Seq("e3", "-PT8H"), Seq("e4", null)))
    // NOW is query-constant and ISO-shaped; UUID/STRUUID/RAND are well-formed
    val g3 = q(P + """SELECT ?w ?n ?u ?su ?r WHERE { ?w a ifc:Wall .
        BIND(NOW() AS ?n) BIND(UUID() AS ?u) BIND(STRUUID() AS ?su) BIND(RAND() AS ?r) }""")
    val r3 = g3.collect()
    assert(r3.map(_.getString(2)).distinct.length == 1) // one NOW per query
    assert(r3.head.getString(2).matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}.*"""))
    assert(r3.forall(_.getString(3).startsWith("urn:uuid:")))
    assert(r3.forall(_.getString(4).matches("[0-9a-fA-F-]{36}")))
    assert(r3.forall { r => val d = r.getDouble(5); d >= 0.0 && d < 1.0 })
  }

  // ------------------------------------------------ blank nodes in patterns

  test("_:label and [ … ] act as scoped non-projectable variables") {
    // _:w joins across the two patterns of one BGP like a variable
    val g1 = q(P + "SELECT ?st WHERE { _:w a ifc:Wall . _:w ifc:inStorey ?st }")
    assert(rows(g1, "graph", "st") == Set(Seq("d1", "s1"), Seq("d2", "s9")))
    // bracket property list: same solutions via an anon subject
    val g2 = q(P + "SELECT ?st WHERE { [ a ifc:Wall ; ifc:inStorey ?st ] }")
    assert(rows(g2, "graph", "st") == Set(Seq("d1", "s1"), Seq("d2", "s9")))
    // SELECT * hides the existential: only named variables project
    val g3 = q(P + "SELECT * WHERE { [ a ifc:Wall ; ifc:inStorey ?st ] }")
    assert(g3.columns.toSet == Set("graph", "st"))
    // nested bracket as object
    val g4 = q(P + "SELECT ?h WHERE { ?w ifc:inStorey [ a ifc:Storey ] . ?w ifc:hasHeight ?h }")
    assert(rows(g4, "h") == Set(Seq("3.0"), Seq("12.5")))
    // standalone bracket statement (TriplesNode with empty PropertyList)
    val g5 = q(P + "SELECT ?g WHERE { GRAPH ?g { [ a ifc:Door ] . } }")
    assert(rows(g5, "g") == Set(Seq("d1")))
  }

  test("collections expand to rdf:first/rest chains; () is rdf:nil") {
    val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val listStore = triples(Seq(
      ("d1", "x", s"${ifc}items", "c1"),
      ("d1", "c1", s"${rdfNs}first", "a"),
      ("d1", "c1", s"${rdfNs}rest", "c2"),
      ("d1", "c2", s"${rdfNs}first", "b"),
      ("d1", "c2", s"${rdfNs}rest", s"${rdfNs}nil"),
      ("d1", "y", s"${ifc}items", s"${rdfNs}nil")))
    val g1 = Sparql.query(listStore, P + """SELECT ?s WHERE { ?s ifc:items ("a" "b") }""")
    assert(rows(g1, "s") == Set(Seq("x")))
    val g2 = Sparql.query(listStore, P + "SELECT ?s WHERE { ?s ifc:items () }")
    assert(rows(g2, "s") == Set(Seq("y")))
  }

  test("CONSTRUCT/INSERT template bnodes mint fresh nodes per solution; DELETE rejects") {
    val g1 = Sparql.query(kg, P + """CONSTRUCT { ?w <urn:hasSlot> _:s . _:s <urn:of> ?st }
        WHERE { ?w ifc:inStorey ?st }""")
    val minted = g1.collect().filter(_.getString(2) == "urn:hasSlot")
      .map(r => (r.getString(0), r.getString(1), r.getString(3)))
    // three solutions → three distinct minted subjects, shared with the ?st edge
    assert(minted.length == 3 && minted.map(_._3).distinct.length == 3)
    assert(minted.forall(_._3.startsWith("_:m")))
    val ofEdges = g1.collect().filter(_.getString(2) == "urn:of").map(_.getString(1)).toSet
    assert(ofEdges == minted.map(_._3).toSet) // same label ⇒ same mint per solution
    // determinism: the mint is a content hash, not RNG
    val g1b = Sparql.query(kg, P + """CONSTRUCT { ?w <urn:hasSlot> _:s . _:s <urn:of> ?st }
        WHERE { ?w ifc:inStorey ?st }""")
    assert(g1.collect().map(_.toSeq).toSet == g1b.collect().map(_.toSeq).toSet)
    // INSERT mints too; DELETE refuses loudly
    val ins = Sparql.update(kg, P + """INSERT { ?w <urn:tag> _:t }
        WHERE { ?w a ifc:Wall }""")
    assert(ins.filter("pred = 'urn:tag'").count() == 3)
    val e = intercept[IllegalArgumentException](
      Sparql.update(kg, P + "DELETE { ?w <urn:x> _:t } WHERE { ?w a ifc:Wall }").collect())
    assert(e.getMessage.contains("DELETE template"))
  }

  test("USING NAMED restricts which graphs GRAPH ranges over in update WHERE") {
    val got = Sparql.update(kg, P + """DELETE { ?w ifc:inStorey ?st }
        USING NAMED <d1> WHERE { GRAPH ?g { ?w ifc:inStorey ?st } }""")
    assert(all(got) == all(kg)
      - Seq("d1", "w1", s"${ifc}inStorey", "s1") - Seq("d1", "w2", s"${ifc}inStorey", "s1"))
  }

  // ------------------------------------------------------------ errors

  test("loud errors: undeclared prefix, unsupported syntax, unbound projection") {
    def bad(text: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](q(text) match {
        case df => df.collect()
      })
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !contains '$frag'")
    }
    bad("SELECT ?x WHERE { ?x foo:bar ?y }", "undeclared prefix")
    bad(P + "SELECT ?x WHERE { ?x ifc:p [ ifc:q ?y }", "expected ']'")
    bad(P + "SELECT ?x WHERE { SERVICE <http://x> { ?x ?p ?o } }", "SERVICE")
    bad(P + "SELECT ?z WHERE { ?x a ifc:Wall }", "?z is not bound")
    val e = intercept[IllegalArgumentException](q(P + "ASK { ?x a ifc:Wall }"))
    assert(e.getMessage.contains("Sparql.ask"))
  }

  test("parse error reports line and column") {
    val e = intercept[IllegalArgumentException](q("SELECT ?x WHERE\n{ ?x ?? ?y }"))
    assert(e.getMessage.contains("line 2"))
  }

  // ------------------------------------------------------------ typed terms

  /** NT-shaped store (obj_kind/obj_datatype/obj_lang columns) in graph g1. */
  private def ntStore(lines: String*): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    graft.sources.NTriplesSource.parse(spark.createDataset(lines.toSeq))
      .withColumn("doc_id", lit("g1"))
  }

  private lazy val langKg = ntStore(
    "<urn:s1> <urn:label> \"chat\"@en .",
    "<urn:s1> <urn:label> \"chat\"@fr .",
    "<urn:s2> <urn:label> \"cat\"@en-US .",
    "<urn:s3> <urn:label> \"gato\" .",
    "<urn:s4> <urn:label> <urn:thing> .",
    "<urn:s5> <urn:label> _:b1 .",
    "_:b2 <urn:label> \"bl\" .",
    "<urn:s6> <urn:size> \"3.5\"^^<http://www.w3.org/2001/XMLSchema#double> .")

  test("LANG() distinguishes literals a lexical store would conflate") {
    val got = Sparql.query(langKg,
      """SELECT ?s ?v WHERE { ?s <urn:label> ?v FILTER (LANG(?v) = "en") }""")
    assert(rows(got, "s", "v") == Set(Seq("urn:s1", "chat")))
    // as a projection expression; plain literal → ""; duplicates per tag
    val tags = Sparql.query(langKg,
      """SELECT ?s (LANG(?v) AS ?tag) WHERE { ?s <urn:label> ?v FILTER ISLITERAL(?v) }""")
    assert(rows(tags, "s", "tag") == Set(
      Seq("urn:s1", "en"), Seq("urn:s1", "fr"), Seq("urn:s2", "en-US"),
      Seq("urn:s3", ""), Seq("_:b2", "")))
  }

  test("sameTerm: RDF term identity, strictly finer than lexical '='") {
    // "chat"@en vs "chat"@fr: equal lexically, different terms — the
    // self-join keeps only the matching-tag pairs ('=' would keep all 4)
    val self = Sparql.query(langKg,
      """SELECT ?a ?b WHERE { <urn:s1> <urn:label> ?a . <urn:s1> <urn:label> ?b .
         FILTER SAMETERM(?a, ?b) }""")
    assert(self.count() == 2)
    // a plain-literal constant matches only the untagged literal
    assert(rows(Sparql.query(langKg,
      """SELECT ?s WHERE { ?s <urn:label> ?v FILTER SAMETERM(?v, "gato") }"""), "s") ==
      Set(Seq("urn:s3")))
    assert(Sparql.query(langKg,
      """SELECT ?s WHERE { ?s <urn:label> ?v FILTER SAMETERM(?v, "chat") }""").count() == 0)
    // constructed tagged term matches only the same-tag row
    assert(rows(Sparql.query(langKg,
      """SELECT ?s (LANG(?v) AS ?tag) WHERE { ?s <urn:label> ?v
         FILTER SAMETERM(?v, STRLANG("chat", "en")) }"""), "s", "tag") ==
      Set(Seq("urn:s1", "en")))
    // IRI object: kind-distinct from any literal of the same lexical form
    assert(rows(Sparql.query(langKg,
      """SELECT ?s WHERE { ?s <urn:label> ?v FILTER SAMETERM(?v, <urn:thing>) }"""), "s") ==
      Set(Seq("urn:s4")))
  }

  test("xsd:dateTime accessors over the lexical form") {
    val dtKg = ntStore(
      "<urn:e1> <urn:at> \"2011-01-10T14:45:13.815-05:00\"^^<http://www.w3.org/2001/XMLSchema#dateTime> .",
      "<urn:e2> <urn:at> \"1999-12-31T23:59:07Z\"^^<http://www.w3.org/2001/XMLSchema#dateTime> .",
      "<urn:e3> <urn:at> \"2020-06-01T08:30:00\"^^<http://www.w3.org/2001/XMLSchema#dateTime> .",
      "<urn:e4> <urn:at> \"not a date\" .")
    val got = Sparql.query(dtKg,
      """SELECT ?s (YEAR(?t) AS ?y) (MONTH(?t) AS ?mo) (DAY(?t) AS ?d)
                (HOURS(?t) AS ?h) (MINUTES(?t) AS ?mi) (SECONDS(?t) AS ?sec)
                (TZ(?t) AS ?tz)
         WHERE { ?s <urn:at> ?t }""")
    assert(rows(got, "s", "y", "mo", "d", "h", "mi", "sec", "tz") == Set(
      Seq("urn:e1", 2011, 1, 10, 14, 45, 13.815, "-05:00"),
      Seq("urn:e2", 1999, 12, 31, 23, 59, 7.0, "Z"),
      Seq("urn:e3", 2020, 6, 1, 8, 30, 0.0, ""),
      Seq("urn:e4", null, null, null, null, null, null, ""))) // type error → NULL
    // FILTER use: numeric comparison on an accessor
    assert(rows(Sparql.query(dtKg,
      "SELECT ?s WHERE { ?s <urn:at> ?t FILTER (YEAR(?t) > 2000) }"), "s") ==
      Set(Seq("urn:e1"), Seq("urn:e3")))
  }

  test("§17.5 XSD constructor casts; unknown function IRI fails loudly") {
    val st = triples(Seq(
      ("d1", "e1", "urn:v", "42"),
      ("d1", "e2", "urn:v", "3.5"),
      ("d1", "e3", "urn:v", "true"),
      ("d1", "e4", "urn:v", "nope"),
      ("d1", "e5", "urn:v", "2024-03-01T10:00:00Z")))
    val pre = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
    val g = Sparql.query(st, pre +
      """SELECT ?s (xsd:integer(?v) AS ?i) (xsd:double(?v) AS ?d)
                (xsd:boolean(?v) AS ?b) (xsd:dateTime(?v) AS ?t)
         WHERE { ?s <urn:v> ?v }""")
    assert(rows(g, "s", "i", "d", "b", "t") == Set(
      Seq("e1", 42L, 42.0, null, null),
      Seq("e2", null, 3.5, null, null), // xsd:integer("3.5") is a cast error
      Seq("e3", null, null, true, null),
      Seq("e4", null, null, null, null),
      Seq("e5", null, null, null, "2024-03-01T10:00:00Z")))
    // FILTER over a cast: numeric comparison after xsd:integer
    assert(rows(Sparql.query(st, pre +
      "SELECT ?s WHERE { ?s <urn:v> ?v FILTER (xsd:integer(?v) = 42) }"), "s") ==
      Set(Seq("e1")))
    // DATATYPE of a cast-bound variable reports the constructor's type
    assert(rows(Sparql.query(st, pre +
      """SELECT ?s (DATATYPE(?i) AS ?dt) WHERE { ?s <urn:v> ?v . ?s <urn:v> "42"
         BIND(xsd:integer(?v) AS ?i) }"""), "s", "dt") ==
      Set(Seq("e1", "http://www.w3.org/2001/XMLSchema#integer")))
    // any non-xsd function IRI is a loud parse error, never a silent NULL
    val ex = intercept[IllegalArgumentException] {
      Sparql.query(st, "SELECT ?s WHERE { ?s <urn:v> ?v FILTER (<urn:fn>(?v)) }")
    }
    assert(ex.getMessage.contains("unsupported function IRI"))
  }

  test("LANGMATCHES: exact, subtag-prefix and '*' ranges (RFC 4647 basic)") {
    val en = Sparql.query(langKg,
      """SELECT ?s WHERE { ?s <urn:label> ?v FILTER LANGMATCHES(LANG(?v), "en") }""")
    assert(rows(en, "s") == Set(Seq("urn:s1"), Seq("urn:s2"))) // en, en-US; not fr
    val any = Sparql.query(langKg,
      """SELECT ?s ?v WHERE { ?s <urn:label> ?v FILTER LANGMATCHES(LANG(?v), "*") }""")
    // '*' = any TAGGED literal: not plain "gato"/"bl", not IRI/bnode objects
    assert(rows(any, "s", "v") == Set(
      Seq("urn:s1", "chat"), Seq("urn:s2", "cat")))
  }

  test("DATATYPE(): typed, plain (xsd:string), tagged (rdf:langString), IRI → type error") {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    val rdfLang = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    val got = Sparql.query(langKg,
      "SELECT ?s (DATATYPE(?v) AS ?dt) WHERE { ?s ?p ?v }")
    assert(rows(got, "s", "dt") == Set(
      Seq("urn:s1", rdfLang), Seq("urn:s2", rdfLang),
      Seq("urn:s3", s"${xsd}string"), Seq("_:b2", s"${xsd}string"),
      Seq("urn:s6", s"${xsd}double"),
      Seq("urn:s4", null), Seq("urn:s5", null))) // IRI/bnode: type error → NULL
  }

  test("isIRI/isLiteral/isBlank in object and subject position") {
    def s(text: String) = rows(Sparql.query(langKg, text), "s")
    assert(s("SELECT ?s WHERE { ?s <urn:label> ?v FILTER ISIRI(?v) }") ==
      Set(Seq("urn:s4")))
    assert(s("SELECT ?s WHERE { ?s <urn:label> ?v FILTER ISBLANK(?v) }") ==
      Set(Seq("urn:s5")))
    assert(s("""SELECT ?s WHERE { ?s <urn:label> ?v
                FILTER (ISLITERAL(?v) && LANG(?v) = "") }""") ==
      Set(Seq("urn:s3"), Seq("_:b2")))
    // subject kind derives from the _: prefix
    assert(s("SELECT ?s WHERE { ?s <urn:label> ?v FILTER ISBLANK(?s) }") ==
      Set(Seq("_:b2")))
  }

  test("term-metadata companions never leak into SELECT * or joins") {
    val star = Sparql.query(langKg,
      """SELECT * WHERE { ?s <urn:label> ?v FILTER (LANG(?v) = "fr") }""")
    assert(star.columns.forall(!_.contains("#")), star.columns.mkString(","))
    assert(rows(star, "s", "v") == Set(Seq("urn:s1", "chat")))
    // the same variable in two object positions: lexical join, companions
    // from the first binding — joining on NULL-able metadata would drop rows
    val join = Sparql.query(langKg,
      """SELECT ?a ?b ?v WHERE { ?a <urn:label> ?v . ?b <urn:label> ?v
         FILTER (LANG(?v) = "en" && ?a = ?b) }""")
    assert(rows(join, "a") == Set(Seq("urn:s1")))
    // UNION branches with inspectors on each side
    val u = Sparql.query(langKg,
      """SELECT ?s ?v WHERE {
           { ?s <urn:label> ?v FILTER ISIRI(?v) }
           UNION { ?s <urn:label> ?v FILTER (LANG(?v) = "fr") } }""")
    assert(rows(u, "s") == Set(Seq("urn:s4"), Seq("urn:s1")))
  }

  test("term inspectors fail loudly where metadata cannot exist") {
    def bad(text: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](q(text).collect())
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !contains '$frag'")
    }
    // a 4-column lexical store has no obj_kind to read
    bad(P + """SELECT ?w WHERE { ?w ifc:hasHeight ?h FILTER (LANG(?h) = "") }""",
      "term metadata is unavailable")
    // a BIND passing through a metadata-less variable cannot derive facets
    bad(P + """SELECT ?w WHERE { ?w ifc:hasHeight ?h .
               BIND(?h AS ?u) FILTER ISLITERAL(?u) }""",
      "term metadata is unavailable")
    // branching expressions have no single facet set
    bad("""SELECT ?s WHERE { ?s <urn:label> ?v
           FILTER ISLITERAL(IF(BOUND(?v), ?v, "x")) }""",
      "branching")
  }

  test("STRLANG/STRDT construct inspectable terms; BIND facets are derivable") {
    // constructed tags are readable back via LANG/LANGMATCHES even though
    // the value column stays the lexical form
    val got = Sparql.query(langKg,
      """SELECT ?s ?w WHERE { ?s <urn:label> ?v FILTER ISLITERAL(?v)
           BIND(STRLANG(?v, "de") AS ?w)
           FILTER LANGMATCHES(LANG(?w), "de") }""")
    assert(rows(got, "s") ==
      Set(Seq("urn:s1"), Seq("urn:s2"), Seq("urn:s3"), Seq("_:b2")))
    val dt = Sparql.query(langKg,
      """SELECT ?s (DATATYPE(?w) AS ?d) WHERE { ?s <urn:size> ?v
           BIND(STRDT(?v, <urn:my:type>) AS ?w) }""")
    assert(rows(dt, "s", "d") == Set(Seq("urn:s6", "urn:my:type")))
    // BIND of a plain string builtin: a simple literal (lang "", xsd:string)
    val simple = Sparql.query(langKg,
      """SELECT ?s WHERE { ?s <urn:label> ?v FILTER ISBLANK(?v)
           BIND(CONCAT(?v, "!") AS ?u)
           FILTER (ISLITERAL(?u) && LANG(?u) = "") }""")
    assert(rows(simple, "s") == Set(Seq("urn:s5")))
  }

  // ------------------------------------------------------------ FROM / FROM NAMED

  test("FROM restricts pattern graphs; FROM NAMED restricts GRAPH clauses") {
    val one = q(P + "SELECT ?w FROM <d1> WHERE { ?w a ifc:Wall }")
    assert(rows(one, "graph", "w") == Set(Seq("d1", "w1"), Seq("d1", "w2")))
    val two = q(P + "SELECT ?w FROM <d1> FROM <d2> WHERE { ?w a ifc:Wall }")
    assert(rows(two, "graph", "w") ==
      Set(Seq("d1", "w1"), Seq("d1", "w2"), Seq("d2", "w1")))
    val named = q(P + "SELECT ?g ?w FROM NAMED <d2> WHERE { GRAPH ?g { ?w a ifc:Wall } }")
    assert(rows(named, "g", "w") == Set(Seq("d2", "w1")))
    // solutions stay graph-scoped (documented delta), so FROM and FROM NAMED
    // of the same graph compose with a shared-graph join
    val both = q(P + """SELECT ?w ?g FROM <d1> FROM NAMED <d1>
      WHERE { ?w a ifc:Wall . GRAPH ?g { ?w ifc:inStorey ?st } }""")
    assert(rows(both, "g", "w") == Set(Seq("d1", "w1"), Seq("d1", "w2")))
    // DESCRIBE <iri> honors FROM
    assert(Sparql.query(kg, "DESCRIBE <w1> FROM <d2>").count() == 2)
    // ASK honors FROM
    assert(!Sparql.ask(kg, P + "ASK FROM <d2> { <w2> a ifc:Wall }"))
    assert(Sparql.ask(kg, P + "ASK FROM <d1> { <w2> a ifc:Wall }"))
  }

  test("dataset clauses are rejected in subqueries") {
    val e = intercept[IllegalArgumentException](q(P +
      "SELECT ?w WHERE { { SELECT ?w FROM <d1> WHERE { ?w a ifc:Wall } } }"))
    assert(e.getMessage.contains("top-level"))
  }

  // ------------------------------------------------------------ ORDER BY / negatives

  test("ORDER BY may reference non-projected variables (without DISTINCT)") {
    // lexical order (documented): "12.5" < "3.0"
    val got = q(P + "SELECT ?w WHERE { ?w ifc:hasHeight ?h } ORDER BY ?h")
    assert(got.select("w").collect().map(_.getString(0)).toSeq == Seq("w2", "w1"))
    val desc = q(P + "SELECT ?w WHERE { ?w ifc:hasHeight ?h } ORDER BY DESC(?h)")
    assert(desc.select("w").collect().map(_.getString(0)).toSeq == Seq("w1", "w2"))
    // with DISTINCT the key must survive projection — loud error
    val e = intercept[IllegalArgumentException](
      q(P + "SELECT DISTINCT ?w WHERE { ?w ifc:hasHeight ?h } ORDER BY ?h").collect())
    assert(e.getMessage.contains("not bound"))
  }

  test("negative numeric literals in term position, VALUES and FILTER") {
    val t = triples(Seq(
      ("d1", "a", "urn:temp", "-3.5"), ("d1", "b", "urn:temp", "2"),
      ("d1", "c", "urn:temp", "-10")))
    assert(rows(Sparql.query(t, "SELECT ?x WHERE { ?x <urn:temp> -3.5 }"), "x") ==
      Set(Seq("a")))
    assert(rows(Sparql.query(t,
      "SELECT ?x WHERE { ?x <urn:temp> ?t . VALUES ?t { -3.5 2 } }"), "x") ==
      Set(Seq("a"), Seq("b")))
    assert(rows(Sparql.query(t,
      "SELECT ?x WHERE { ?x <urn:temp> ?t FILTER (?t < -1) }"), "x") ==
      Set(Seq("a"), Seq("c")))
  }

  test("LOAD refuses to conflate tag-distinct literals; widened stores keep tags") {
    val dir = java.nio.file.Files.createTempDirectory("graft-load-lang")
    val nt = dir.resolve("lang.nt")
    java.nio.file.Files.write(nt,
      ("<urn:x> <urn:p> \"chat\"@en .\n<urn:x> <urn:p> \"chat\"@fr .\n")
        .getBytes("UTF-8"))
    // into the 4-column lexical store: the two literals differ only by a
    // column the store lacks — loading must fail loudly, not collapse them
    val e = intercept[IllegalArgumentException](
      Sparql.update(kg, s"LOAD <${nt}> INTO GRAPH <dl>"))
    assert(e.getMessage.contains("conflate"))
    // into an NT-shaped store: lossless, and LANG() reaches the tags
    val loaded = Sparql.update(ntStore("<urn:a> <urn:q> \"x\" ."),
      s"LOAD <${nt}> INTO GRAPH <dl>")
    assert(loaded.filter("doc_id = 'dl'").count() == 2)
    val en = Sparql.query(loaded,
      """SELECT ?s WHERE { ?s <urn:p> ?v FILTER (LANG(?v) = "en") }""")
    assert(rows(en, "graph", "s") == Set(Seq("dl", "urn:x")))
  }
}
