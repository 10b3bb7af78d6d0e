package graft

import graft.analytics.Sparql
import org.apache.spark.sql.DataFrame

/** Property fuzz for the SPARQL text path: random graphs x random
  * BGP+FILTER queries, rendered to TEXT, planned by the parser+compiler,
  * and compared — as BAGS, per SPARQL's solution-multiset semantics —
  * against an independent brute-force evaluator written directly from the
  * spec (sequential binding extension per graph). Catches join/projection/
  * filter-compilation bugs the hand-written examples can't enumerate. */
class SparqlFuzzSpec extends SparkTestBase {

  private type Triple = (String, String, String, String) // graph, s, p, o
  private type Binding = Map[String, String]

  // ---- independent evaluator (no Spark, no shared code with the compiler)

  private def matchPattern(t: Triple, pat: (String, String, String),
                           b: Binding): Option[Binding] = {
    def unify(term: String, value: String, acc: Binding): Option[Binding] =
      if (term.startsWith("?")) acc.get(term.drop(1)) match {
        case Some(bound) => if (bound == value) Some(acc) else None
        case None => Some(acc + (term.drop(1) -> value))
      }
      else if (term == value) Some(acc)
      else None
    for {
      b1 <- unify(pat._1, t._2, b)
      b2 <- unify(pat._2, t._3, b1)
      b3 <- unify(pat._3, t._4, b2)
    } yield b3
  }

  /** all solution bindings of the BGP, bag semantics, graph-scoped */
  private def bruteBgp(triples: Seq[Triple], pats: Seq[(String, String, String)]): Seq[(String, Binding)] =
    triples.map(_._1).distinct.flatMap { g =>
      val inG = triples.filter(_._1 == g)
      pats.foldLeft(Seq(Map.empty[String, String])) { (solutions, pat) =>
        solutions.flatMap(b => inG.flatMap(t => matchPattern(t, pat, b)))
      }.map(g -> _)
    }

  /** the compiler's documented comparison rule: numeric when the constant
    * side is numeric (uncastable binding -> dropped), lexical otherwise */
  private def bruteFilter(sols: Seq[(String, Binding)],
                          f: Option[(String, String, String)]): Seq[(String, Binding)] =
    f match {
      case None => sols
      case Some((v, op, const)) => sols.filter { case (_, b) =>
        val value = b(v)
        op match {
          case "=" => value == const
          case "strstarts" => value.startsWith(const)
          case ">" => value.toDoubleOption.exists(_ > const.toDouble)
          case "<" => value.toDoubleOption.exists(_ < const.toDouble)
        }
      }
    }

  private def bag[T](xs: Seq[T]): Map[T, Int] = xs.groupBy(identity).map { case (k, v) => k -> v.size }

  test("random BGP+FILTER queries: text plan == brute-force evaluator (bag semantics)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val subjects = Gen.oneOf("s0", "s1", "s2", "s3", "s4")
    val preds = Gen.oneOf("urn:p0", "urn:p1", "urn:p2")
    val objects = Gen.frequency(
      2 -> subjects,                       // entity refs -> join-able chains
      2 -> Gen.oneOf("l0", "l1", "l2"),    // plain literals
      1 -> Gen.choose(1, 9).map(_.toString)) // numerics -> numeric FILTERs
    val graphs = Gen.oneOf("d0", "d1")
    val tripleGen = for { g <- graphs; s <- subjects; p <- preds; o <- objects } yield (g, s, p, o)

    val vars = Seq("?a", "?b", "?c")
    def term(constGen: Gen[String]): Gen[String] =
      Gen.frequency(2 -> Gen.oneOf(vars), 1 -> constGen)
    val patGen = for {
      s <- term(subjects)
      p <- Gen.frequency(4 -> preds, 1 -> Gen.const("?p")) // occasional var pred
      o <- term(Gen.frequency(2 -> Gen.oneOf("l0", "l1", "l2"), 1 -> subjects))
    } yield (s, p, o)

    val queryGen = for {
      nPat <- Gen.choose(1, 3)
      pats <- Gen.listOfN(nPat, patGen)
      filt <- Gen.option(for {
        op <- Gen.oneOf("=", "strstarts", ">", "<")
        const <- op match {
          case "=" => Gen.oneOf("l0", "s1", "3")
          case "strstarts" => Gen.oneOf("s", "l", "urn:")
          case _ => Gen.choose(1, 9).map(_.toString)
        }
      } yield (op, const))
    } yield (pats, filt)

    def render(term: String): String =
      if (term.startsWith("?")) term
      else if (term.forall(_.isDigit)) term // bare numeric literal
      else s"<$term>" // IRI token; base is empty so <s0> matches lexical "s0"

    val prop = Prop.forAll(Gen.listOfN(14, tripleGen), queryGen) { (triples, q) =>
      val (pats, filtRaw) = q
      val usedVars = pats.flatMap(p => Seq(p._1, p._2, p._3)).filter(_.startsWith("?")).distinct
      (usedVars.isEmpty || triples.isEmpty) || {
        // FILTER only on a var the patterns bind
        val filt = filtRaw.map { case (op, const) => (usedVars.head.drop(1), op, const) }
        val filterText = filt.map { case (v, op, const) =>
          val rendered = op match {
            case "strstarts" => s"""STRSTARTS(?$v, "$const")"""
            case "=" => if (const.forall(_.isDigit)) s"?$v = $const" else s"""?$v = "$const""""
            case o => s"?$v $o $const"
          }
          s" FILTER ($rendered)"
        }.getOrElse("")
        val text = s"SELECT ${usedVars.mkString(" ")} WHERE { " +
          pats.map(p => s"${render(p._1)} ${render(p._2)} ${render(p._3)} .").mkString(" ") +
          s"$filterText }"

        val df: DataFrame = Sparql.query(
          triples.toDF("doc_id", "subj", "pred", "obj"), text)
        val got = bag(df.collect().toSeq.map(_.toSeq.map(_.asInstanceOf[String])))

        val wantSols = bruteFilter(
          bruteBgp(triples, pats.map(p => (p._1, p._2, p._3))), filt)
        val want = bag(wantSols.map { case (g, b) =>
          g +: usedVars.map(v => b(v.drop(1)))
        })
        if (got != want) {
          println(s"QUERY: $text\nTRIPLES: $triples\nGOT: $got\nWANT: $want")
          false
        } else true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- property paths: random path AST vs brute-force closure ----

  private sealed trait BPath
  private case class BPred(p: String) extends BPath
  private case class BInv(p: BPath) extends BPath
  private case class BSeq(a: BPath, b: BPath) extends BPath
  private case class BAlt(a: BPath, b: BPath) extends BPath
  private case class BPlus(p: BPath) extends BPath
  private case class BStar(p: BPath) extends BPath
  private case class BOpt(p: BPath) extends BPath
  private case class BNps(ps: Seq[String], inv: Seq[String] = Nil) extends BPath

  private def renderPath(p: BPath): String = p match {
    case BPred(x) => s"<$x>"
    case BInv(x) => s"^(${renderPath(x)})"
    case BSeq(a, b) => s"(${renderPath(a)})/(${renderPath(b)})"
    case BAlt(a, b) => s"(${renderPath(a)})|(${renderPath(b)})"
    case BPlus(x) => s"(${renderPath(x)})+"
    case BStar(x) => s"(${renderPath(x)})*"
    case BOpt(x) => s"(${renderPath(x)})?"
    case BNps(ps, inv) =>
      s"!(${(ps.map(x => s"<$x>") ++ inv.map(x => s"^<$x>")).mkString("|")})"
  }

  private def closure(edges: Set[(String, String)]): Set[(String, String)] = {
    var acc = edges
    var grew = true
    while (grew) {
      val next = acc ++ (for ((a, b) <- acc; (c, d) <- acc if b == c) yield (a, d))
      grew = next.size > acc.size
      acc = next
    }
    acc
  }

  /** SPARQL 1.1 path evaluation over one graph's triples, set semantics
    * (the query wraps in SELECT DISTINCT). Zero-length pairs range over ALL
    * terms of the graph, per spec sec 9.3. */
  private def brutePath(inG: Seq[Triple], p: BPath): Set[(String, String)] = {
    lazy val terms: Set[String] = inG.flatMap(t => Seq(t._2, t._4)).toSet
    p match {
      case BPred(x) => inG.collect { case (_, s, pp, o) if pp == x => (s, o) }.toSet
      case BInv(x) => brutePath(inG, x).map(_.swap)
      case BSeq(a, b) =>
        val bs = brutePath(inG, b)
        for ((x, y) <- brutePath(inG, a); (y2, z) <- bs if y == y2) yield (x, z)
      case BAlt(a, b) => brutePath(inG, a) ++ brutePath(inG, b)
      case BPlus(x) => closure(brutePath(inG, x))
      case BStar(x) => closure(brutePath(inG, x)) ++ terms.map(t => (t, t))
      case BOpt(x) => brutePath(inG, x) ++ terms.map(t => (t, t))
      case BNps(ps, inv) =>
        // SPARQL 1.1 sec 18.4: the member list splits — forward edges dodge
        // the forward members, reverse edges the inverse members; an empty
        // side contributes no scan at all
        (if (ps.isEmpty) Set.empty[(String, String)]
         else inG.collect { case (_, s, pp, o) if !ps.contains(pp) => (s, o) }.toSet) ++
        (if (inv.isEmpty) Set.empty[(String, String)]
         else inG.collect { case (_, s, pp, o) if !inv.contains(pp) => (o, s) }.toSet)
    }
  }

  test("random property paths: text plan == brute-force closure (set semantics)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val preds = Seq("urn:p0", "urn:p1", "urn:p2")
    val nodes = Gen.oneOf("n0", "n1", "n2", "n3")
    val tripleGen = for {
      g <- Gen.oneOf("d0", "d1"); s <- nodes; p <- Gen.oneOf(preds); o <- nodes
    } yield (g, s, p, o)

    def pathGen(depth: Int): Gen[BPath] =
      if (depth <= 0) Gen.frequency(
        4 -> Gen.oneOf(preds).map(BPred),
        1 -> Gen.zip(Gen.someOf(preds), Gen.someOf(preds))
          .suchThat(t => t._1.nonEmpty || t._2.nonEmpty)
          .map(t => BNps(t._1.toSeq, t._2.toSeq)))
      else Gen.frequency(
        3 -> pathGen(0),
        1 -> pathGen(depth - 1).map(BInv),
        2 -> Gen.zip(pathGen(depth - 1), pathGen(depth - 1)).map(t => BSeq(t._1, t._2)),
        2 -> Gen.zip(pathGen(depth - 1), pathGen(depth - 1)).map(t => BAlt(t._1, t._2)),
        1 -> pathGen(depth - 1).map(BPlus),
        1 -> pathGen(depth - 1).map(BStar),
        1 -> pathGen(depth - 1).map(BOpt))

    val prop = Prop.forAll(Gen.listOfN(10, tripleGen), pathGen(2)) { (triples, path) =>
      triples.isEmpty || {
        val text = s"SELECT DISTINCT ?x ?y WHERE { ?x ${renderPath(path)} ?y }"
        val got = Sparql.query(triples.toDF("doc_id", "subj", "pred", "obj"), text)
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
        val want = triples.map(_._1).distinct.flatMap { g =>
          brutePath(triples.filter(_._1 == g), path).map { case (x, y) => (g, x, y) }
        }.toSet
        if (got != want) {
          println(s"PATH: $text\nTRIPLES: $triples\nGOT-WANT: ${got -- want}\nWANT-GOT: ${want -- got}")
          false
        } else true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- group composition: OPTIONAL / MINUS / (NOT) EXISTS ----

  private def compatible(b1: Binding, b2: Binding): Boolean =
    b1.keySet.intersect(b2.keySet).forall(k => b1(k) == b2(k))

  test("random OPTIONAL/MINUS/EXISTS groups: text plan == brute-force algebra") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val subjects = Gen.oneOf("s0", "s1", "s2", "s3")
    val preds = Seq("urn:p0", "urn:p1", "urn:p2")
    val objects = Gen.oneOf("s0", "s1", "l0", "l1")
    val graphs = Gen.oneOf("d0", "d1")
    val tripleGen = for { g <- graphs; s <- subjects; p <- Gen.oneOf(preds); o <- objects }
      yield (g, s, p, o)

    // BGP1 binds ?a (and maybe ?b); BGP2 shares ?a and may add ?c
    val bgp1Gen = for {
      p1 <- Gen.oneOf(preds)
      o1 <- Gen.frequency(2 -> Gen.const("?b"), 1 -> objects)
    } yield Seq(("?a", p1, o1))
    val bgp2Gen = for {
      p2 <- Gen.oneOf(preds)
      s2 <- Gen.frequency(3 -> Gen.const("?a"), 1 -> subjects)
      o2 <- Gen.frequency(2 -> Gen.const("?c"), 1 -> objects)
    } yield Seq((s2, p2, o2))
    val clauseGen = Gen.oneOf("none", "optional", "minus", "exists", "notexists")

    def render(t: String): String = if (t.startsWith("?")) t else s"<$t>"
    def renderBgp(b: Seq[(String, String, String)]): String =
      b.map(p => s"${render(p._1)} ${render(p._2)} ${render(p._3)} .").mkString(" ")

    val prop = Prop.forAll(Gen.listOfN(12, tripleGen), bgp1Gen, bgp2Gen, clauseGen) {
      (triples, bgp1, bgp2, clause) =>
      triples.isEmpty || {
        val vars1 = bgp1.flatMap(p => Seq(p._1, p._3)).filter(_.startsWith("?")).map(_.drop(1)).distinct
        val vars2 = bgp2.flatMap(p => Seq(p._1, p._3)).filter(_.startsWith("?")).map(_.drop(1)).distinct
        val outVars = clause match {
          case "optional" => (vars1 ++ vars2).distinct.sorted
          case _ => vars1.sorted
        }
        val clauseText = clause match {
          case "none" => ""
          case "optional" => s" OPTIONAL { ${renderBgp(bgp2)} }"
          case "minus" => s" MINUS { ${renderBgp(bgp2)} }"
          case "exists" => s" FILTER EXISTS { ${renderBgp(bgp2)} }"
          case "notexists" => s" FILTER NOT EXISTS { ${renderBgp(bgp2)} }"
        }
        val text = s"SELECT ${outVars.map("?" + _).mkString(" ")} WHERE { ${renderBgp(bgp1)}$clauseText }"

        val df = Sparql.query(triples.toDF("doc_id", "subj", "pred", "obj"), text)
        val got = bag(df.select(("graph" +: outVars).map(org.apache.spark.sql.functions.col): _*)
          .collect().toSeq.map(_.toSeq.map(v => Option(v).map(_.toString).orNull)))

        val sols1 = bruteBgp(triples, bgp1)
        val sols2 = bruteBgp(triples, bgp2).groupBy(_._1) // per graph
        def exts(g: String, b: Binding) =
          sols2.getOrElse(g, Nil).map(_._2).filter(compatible(b, _))
        val wantSols: Seq[(String, Binding)] = clause match {
          case "none" => sols1
          case "optional" => sols1.flatMap { case (g, b) =>
            val es = exts(g, b)
            if (es.isEmpty) Seq(g -> b) else es.map(e => g -> (b ++ e))
          }
          case "minus" =>
            // disjoint domains remove nothing (our MINUS requires shared vars)
            if (vars1.intersect(vars2).isEmpty) sols1
            else sols1.filterNot { case (g, b) => exts(g, b).nonEmpty }
          case "exists" => sols1.filter { case (g, b) => exts(g, b).nonEmpty }
          case "notexists" => sols1.filterNot { case (g, b) => exts(g, b).nonEmpty }
        }
        val want = bag(wantSols.map { case (g, b) => g +: outVars.map(v => b.getOrElse(v, null)) })
        if (got != want) {
          println(s"QUERY: $text\nTRIPLES: $triples\nGOT: $got\nWANT: $want")
          false
        } else true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- OPTIONAL with outer-referencing filters: the LeftJoin expr ----

  test("random OPTIONAL groups with outer-referencing filters == brute-force left join") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val subjects = Gen.oneOf("s0", "s1", "s2", "s3")
    val preds = Seq("urn:p0", "urn:p1", "urn:p2")
    val objects = Gen.oneOf("s0", "s1", "l0", "3", "7")
    val tripleGen = for { g <- Gen.oneOf("d0", "d1"); s <- subjects; p <- Gen.oneOf(preds); o <- objects }
      yield (g, s, p, o)

    // bgp1 always binds ?a and ?b; bgp2 shares ?a and may bind ?c
    val bgp1Gen = Gen.oneOf(preds).map(p1 => Seq(("?a", p1, "?b")))
    val bgp2Gen = for {
      p2 <- Gen.oneOf(preds)
      o2 <- Gen.frequency(2 -> Gen.const("?c"), 1 -> objects)
    } yield Seq(("?a", p2, o2))
    // filter over the MERGED binding: outer ?b against a const, a number, or
    // the inner ?c (lexical — neither side numeric)
    val filtGen = Gen.oneOf("b=l0", "b=s1", "b>2", "b=c")

    def render(t: String): String =
      if (t.startsWith("?")) t
      else if (t.forall(_.isDigit)) t
      else s"<$t>"
    def renderBgp(b: Seq[(String, String, String)]): String =
      b.map(p => s"${render(p._1)} ${render(p._2)} ${render(p._3)} .").mkString(" ")

    val prop = Prop.forAll(Gen.listOfN(12, tripleGen), bgp1Gen, bgp2Gen, filtGen) {
      (triples, bgp1, bgp2, filt) =>
      val innerBindsC = bgp2.exists(_._3 == "?c")
      triples.isEmpty || (filt == "b=c" && !innerBindsC) || {
        val filterText = filt match {
          case "b=l0" => """?b = "l0""""
          case "b=s1" => """?b = "s1""""
          case "b>2" => "?b > 2"
          case "b=c" => "?b = ?c"
        }
        val outVars = (Seq("a", "b") ++ (if (innerBindsC) Seq("c") else Nil)).sorted
        val text = s"SELECT ${outVars.map("?" + _).mkString(" ")} WHERE { " +
          s"${renderBgp(bgp1)} OPTIONAL { ${renderBgp(bgp2)} FILTER ($filterText) } }"

        val df = Sparql.query(triples.toDF("doc_id", "subj", "pred", "obj"), text)
        val got = bag(df.select(("graph" +: outVars).map(org.apache.spark.sql.functions.col): _*)
          .collect().toSeq.map(_.toSeq.map(v => Option(v).map(_.toString).orNull)))

        def cond(m: Binding): Boolean = filt match {
          case "b=l0" => m("b") == "l0"
          case "b=s1" => m("b") == "s1"
          case "b>2" => m("b").toDoubleOption.exists(_ > 2)
          case "b=c" => m("b") == m("c")
        }
        val sols1 = bruteBgp(triples, bgp1)
        val sols2 = bruteBgp(triples, bgp2).groupBy(_._1)
        val wantSols = sols1.flatMap { case (g, b) =>
          val es = sols2.getOrElse(g, Nil).map(_._2)
            .filter(e => compatible(b, e) && cond(b ++ e))
          if (es.isEmpty) Seq(g -> b) else es.map(e => g -> (b ++ e))
        }
        val want = bag(wantSols.map { case (g, b) => g +: outVars.map(v => b.getOrElse(v, null)) })
        if (got != want) {
          println(s"QUERY: $text\nTRIPLES: $triples\nGOT: $got\nWANT: $want")
          false
        } else true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- GRAPH groups: same-graph join, var binds / iri pins the graph ----

  test("random GRAPH groups: text plan == brute-force same-graph join") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val subjects = Gen.oneOf("s0", "s1", "s2", "s3")
    val preds = Seq("urn:p0", "urn:p1", "urn:p2")
    val objects = Gen.oneOf("s0", "s1", "l0", "l1")
    val tripleGen = for { g <- Gen.oneOf("d0", "d1"); s <- subjects; p <- Gen.oneOf(preds); o <- objects }
      yield (g, s, p, o)

    val bgp1Gen = for {
      p1 <- Gen.oneOf(preds)
      o1 <- Gen.frequency(2 -> Gen.const("?b"), 1 -> objects)
    } yield Seq(("?a", p1, o1))
    val bgp2Gen = for {
      p2 <- Gen.oneOf(preds)
      s2 <- Gen.frequency(3 -> Gen.const("?a"), 1 -> subjects)
      o2 <- Gen.frequency(2 -> Gen.const("?c"), 1 -> objects)
    } yield Seq((s2, p2, o2))
    val modeGen = Gen.oneOf("var", "d0", "d1")

    def render(t: String): String = if (t.startsWith("?")) t else s"<$t>"
    def renderBgp(b: Seq[(String, String, String)]): String =
      b.map(p => s"${render(p._1)} ${render(p._2)} ${render(p._3)} .").mkString(" ")

    val prop = Prop.forAll(Gen.listOfN(12, tripleGen), bgp1Gen, bgp2Gen, modeGen) {
      (triples, bgp1, bgp2, mode) =>
      triples.isEmpty || {
        val vars1 = bgp1.flatMap(p => Seq(p._1, p._3)).filter(_.startsWith("?")).map(_.drop(1)).distinct
        val vars2 = bgp2.flatMap(p => Seq(p._1, p._3)).filter(_.startsWith("?")).map(_.drop(1)).distinct
        val outVars = (vars1 ++ vars2).distinct.sorted
        val (graphClause, proj) = mode match {
          case "var" =>
            (s"GRAPH ?g { ${renderBgp(bgp2)} }",
             s"""?g ${outVars.map("?" + _).mkString(" ")} (CONCAT(?g, "!") AS ?gx)""")
          case iri =>
            (s"GRAPH <$iri> { ${renderBgp(bgp2)} }",
             outVars.map("?" + _).mkString(" "))
        }
        val text = s"SELECT $proj WHERE { ${renderBgp(bgp1)} $graphClause }"

        val df = Sparql.query(triples.toDF("doc_id", "subj", "pred", "obj"), text)
        val cols = "graph" +: (if (mode == "var") Seq("g") else Nil) ++: outVars ++:
          (if (mode == "var") Seq("gx") else Nil)
        val got = bag(df.select(cols.map(org.apache.spark.sql.functions.col): _*)
          .collect().toSeq.map(_.toSeq.map(v => Option(v).map(_.toString).orNull)))

        val sols1 = bruteBgp(triples, bgp1)
        val sols2 = bruteBgp(triples, bgp2).groupBy(_._1)
        val joined = sols1.flatMap { case (g, b) =>
          sols2.getOrElse(g, Nil).map(_._2).filter(compatible(b, _)).map(e => g -> (b ++ e))
        }
        val kept = mode match {
          case "var" => joined
          case iri => joined.filter(_._1 == iri)
        }
        val want = bag(kept.map { case (g, b) =>
          val vs = outVars.map(v => b(v))
          if (mode == "var") (g +: g +: vs) :+ (g + "!") else g +: vs
        })
        if (got != want) {
          println(s"QUERY: $text\nTRIPLES: $triples\nGOT: $got\nWANT: $want")
          false
        } else true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- grouped aggregates: random data vs a brute-force fold ----

  test("random GROUP BY aggregates (+ HAVING) == brute-force fold") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val subjects = Gen.oneOf("s0", "s1", "s2", "s3")
    val preds = Seq("urn:p0", "urn:p1")
    // mix of numerics (exact in double) and non-castable literals
    val objects = Gen.oneOf("l0", "l1", "2", "5", "9")
    val tripleGen = for { g <- Gen.oneOf("d0", "d1"); s <- subjects; p <- Gen.oneOf(preds); o <- objects }
      yield (g, s, p, o)

    val prop = Prop.forAll(Gen.listOfN(14, tripleGen), Gen.oneOf(preds), Gen.oneOf(true, false)) {
      (triples, p1, withHaving) =>
      triples.isEmpty || {
        val having = if (withHaving) " HAVING (COUNT(?b) >= 2)" else ""
        val text = s"""SELECT ?a (COUNT(?b) AS ?n) (COUNT(DISTINCT ?b) AS ?nd)
          (SUM(?b) AS ?s) (MIN(?b) AS ?mn) (MAX(?b) AS ?mx)
          WHERE { ?a <$p1> ?b } GROUP BY ?a$having"""

        val df = Sparql.query(triples.toDF("doc_id", "subj", "pred", "obj"), text)
        val got = bag(df.collect().toSeq.map(_.toSeq.map(Option(_).orNull)))

        // grouped queries pool solutions ACROSS graphs (no graph column)
        val byA = bruteBgp(triples, Seq(("?a", p1, "?b"))).map(_._2)
          .groupBy(_("a"))
        val wantRows = byA.toSeq.map { case (a, bs) =>
          val vals = bs.map(_("b"))
          val nums = vals.flatMap(_.toDoubleOption)
          def agg(f: Seq[Double] => Double): Any =
            if (nums.isEmpty) null else java.lang.Double.valueOf(f(nums))
          Seq[Any](a, java.lang.Long.valueOf(vals.size.toLong),
            java.lang.Long.valueOf(vals.distinct.size.toLong),
            agg(_.sum), agg(_.min), agg(_.max))
        }.filter(r => !withHaving || r(1).asInstanceOf[java.lang.Long] >= 2L)
        val want = bag(wantRows)
        if (got != want) {
          println(s"QUERY: $text\nTRIPLES: $triples\nGOT: $got\nWANT: $want")
          false
        } else true
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- trailing VALUES: random data clauses vs brute-force post-join ----

  test("random trailing VALUES clauses == brute-force post-join (bag semantics)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val subjects = Seq("s0", "s1", "s2", "s3")
    val objCands = Seq("l0", "l1", "s0", "s1")
    val tripleGen = for {
      g <- Gen.oneOf("d0", "d1"); s <- Gen.oneOf(subjects)
      p <- Gen.oneOf("urn:p0", "urn:p1"); o <- Gen.oneOf(objCands)
    } yield (g, s, p, o)
    // values rows mix hits and guaranteed misses ("zz"); a ?z var tests the
    // cross-extension (no shared var) and mixed shared+fresh shapes
    val valCands = Seq("s0", "s1", "s2", "l0", "l1", "zz")
    val qGen = for {
      vvars <- Gen.oneOf(Seq("a"), Seq("b"), Seq("a", "b"), Seq("a", "z"), Seq("z"))
      n <- Gen.choose(1, 3)
      rows <- Gen.listOfN(n, Gen.listOfN(vvars.size, Gen.oneOf(valCands)))
      twoPat <- Gen.oneOf(true, false)
    } yield (vvars, rows, twoPat)

    val prop = Prop.forAll(Gen.listOfN(14, tripleGen), qGen) { (triples, q) =>
      val (vvars, vrows, twoPat) = q
      val pats = Seq(("?a", "urn:p0", "?b")) ++
        (if (twoPat) Seq(("?b", "urn:p1", "?c")) else Nil)
      val usedVars = if (twoPat) Seq("a", "b", "c") else Seq("a", "b")
      val projVars = (usedVars ++ vvars).distinct

      val valuesText =
        if (vvars.size == 1)
          s"VALUES ?${vvars.head} { ${vrows.map(r => s""""${r.head}"""").mkString(" ")} }"
        else
          s"VALUES (${vvars.map("?" + _).mkString(" ")}) { " +
            vrows.map(r => s"(${r.map(x => s""""$x"""").mkString(" ")})").mkString(" ") + " }"
      val text = s"SELECT ${projVars.map("?" + _).mkString(" ")} WHERE { " +
        pats.map(p => s"${p._1} <${p._2}> ${p._3} .").mkString(" ") +
        s" } $valuesText"

      val df = Sparql.query(triples.toDF("doc_id", "subj", "pred", "obj"), text)
      val got = bag(df.collect().toSeq.map(_.toSeq.map(_.asInstanceOf[String])))

      // brute: BGP solutions joined with the data rows AFTER evaluation —
      // compatible iff every shared var agrees; fresh vars extend the binding
      val joined = bruteBgp(triples, pats).flatMap { case (g, b) =>
        vrows.flatMap { r =>
          val rb = vvars.zip(r).toMap
          if (vvars.filter(b.contains).forall(v => b(v) == rb(v))) Some((g, b ++ rb))
          else None
        }
      }
      val want = bag(joined.map { case (g, b) => g +: projVars.map(b) })
      if (got != want) {
        println(s"QUERY: $text\nTRIPLES: $triples\nGOT: $got\nWANT: $want")
        false
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- UPDATE: random modify requests vs brute-force set algebra ----

  test("random DELETE/INSERT WHERE requests: update == (store ∖ del) ∪ ins") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._

    val subjects = Seq("s0", "s1", "s2")
    val preds = Seq("urn:p0", "urn:p1")
    val objects = Seq("s0", "s1", "l0", "l1")
    val tripleGen = for {
      g <- Gen.oneOf("d0", "d1")
      s <- Gen.oneOf(subjects); p <- Gen.oneOf(preds); o <- Gen.oneOf(objects)
    } yield (g, s, p, o)

    val vars = Seq("?a", "?b")
    def wTerm(consts: Seq[String]): Gen[String] =
      Gen.frequency(2 -> Gen.oneOf(vars), 1 -> Gen.oneOf(consts))
    val patGen = for {
      s <- wTerm(subjects); p <- Gen.oneOf(preds); o <- wTerm(objects)
    } yield (s, p, o)

    def render(t: String): String = if (t.startsWith("?")) t else s"<$t>"
    def renderPats(ps: Seq[(String, String, String)]): String =
      ps.map(p => s"${render(p._1)} ${render(p._2)} ${render(p._3)} .").mkString(" ")

    val reqGen = for {
      nPat <- Gen.choose(1, 2)
      where <- Gen.listOfN(nPat, patGen)
      bound = where.flatMap(p => Seq(p._1, p._3)).filter(_.startsWith("?")).distinct
      // template terms: bound vars or fresh constants (urn:new marks inserts)
      tTerm = Gen.frequency(
        (if (bound.nonEmpty) 2 else 0) -> Gen.oneOf(if (bound.nonEmpty) bound else Seq("?x")),
        1 -> Gen.oneOf("s0", "urn:new", "l9"))
      tmplGen = for { s <- tTerm; p <- Gen.oneOf(preds :+ "urn:pnew"); o <- tTerm } yield (s, p, o)
      form <- Gen.oneOf("del", "ins", "both")
      del <- Gen.listOfN(1, tmplGen)
      ins <- Gen.listOfN(1, tmplGen)
    } yield (where, form, del, ins)

    val prop = Prop.forAll(Gen.listOfN(12, tripleGen), reqGen) { (raw, req) =>
      val store = raw.distinct // RDF stores are sets; update preserves set-ness
      val (where, form, del, ins) = req
      store.isEmpty || {
        val text = form match {
          case "del" => s"DELETE { ${renderPats(del)} } WHERE { ${renderPats(where)} }"
          case "ins" => s"INSERT { ${renderPats(ins)} } WHERE { ${renderPats(where)} }"
          case "both" => s"DELETE { ${renderPats(del)} } INSERT { ${renderPats(ins)} } " +
            s"WHERE { ${renderPats(where)} }"
        }
        val got = Sparql.update(store.toDF("doc_id", "subj", "pred", "obj"), text)
          .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))

        val sols = bruteBgp(store, where)
        def inst(tmpl: Seq[(String, String, String)]): Set[Triple] =
          (for ((g, b) <- sols; (s, p, o) <- tmpl) yield {
            def sub(t: String) = if (t.startsWith("?")) b(t.drop(1)) else t
            (g, sub(s), sub(p), sub(o))
          }).toSet
        val delRows = if (form == "ins") Set.empty[Triple] else inst(del)
        val insRows = if (form == "del") Set.empty[Triple] else inst(ins)
        val want = (store.toSet -- delRows) ++ insRows
        val gotSet = got.toSet
        val ok = gotSet == want && got.size == gotSet.size // set result, no dup rows
        if (!ok) println(s"UPDATE: $text\nSTORE: $store\nGOT: $gotSet\nWANT: $want")
        ok
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
