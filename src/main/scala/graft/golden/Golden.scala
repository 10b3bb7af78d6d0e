package graft.golden

import graft.model.FinalTriple
import graft.schema.{SchemaDict, Turtle}

import scala.collection.mutable

/** Golden-corpus scorer: canonicalizes intermediate IRIs on both sides via
  * Weisfeiler-Lehman color refinement (with individualization for residual
  * symmetric groups) and compares triple sets. The reference's own regression
  * test judges by Jena graph isomorphism (TestIfcSpfReader.java:118), which is
  * exactly what this canonical comparison decides — the counter-based
  * intermediate IRIs are not part of the contract (SURVEY.md §7.4.1).
  */
object Golden {

  /** Canonical string form of a triple: subject/pred/object with node IRIs
    * replaced by canonical colors. Literals: "L|dt|lex"; IRIs: "I|iri". */
  type CTriple = (String, String, String)

  final case class Score(precision: Double, recall: Double, mine: Int, golden: Int, common: Int)

  /** One parsed triple: o is either Right(iriOrCanon) or Left((lex, dt)). */
  final case class T(s: String, p: String, o: Either[(String, String), String])

  def fromTripleRows(rows: Seq[FinalTriple]): Seq[T] =
    rows.map { r =>
      if (r.obj_kind == "literal") T(r.subj, r.pred, Left((r.obj, r.obj_datatype)))
      else T(r.subj, r.pred, Right(r.obj))
    }

  def fromTurtle(text: String): Seq[T] =
    Turtle.parse(text).map {
      case Turtle.Triple(Turtle.Iri(s), Turtle.Iri(p), Turtle.Iri(o)) => T(s, p, Right(o))
      case Turtle.Triple(Turtle.Iri(s), Turtle.Iri(p), l: Turtle.Lit) => T(s, p, Left((l.lex, l.dt)))
      case Turtle.Triple(s, Turtle.Iri(p), o) =>
        val ss = s match { case Turtle.Iri(v) => v; case Turtle.BNode(id) => id; case _ => "?" }
        val oo = o match {
          case Turtle.Iri(v) => Right(v)
          case Turtle.BNode(id) => Right(id)
          case l: Turtle.Lit => Left((l.lex, l.dt))
        }
        T(ss, p, oo)
      case other => throw new IllegalArgumentException(s"unexpected triple $other")
    }

  /** Canonicalize: every IRI starting with `base` that is not in `fixed` (and
    * is not `base` itself) is renamed to a structural color. */
  def canonicalize(triples: Seq[T], base: String, fixed: Set[String]): Set[CTriple] = {
    def isNode(iri: String): Boolean =
      iri != base && iri.startsWith(base) && !fixed.contains(iri)

    val nodes = mutable.LinkedHashSet[String]()
    triples.foreach { t =>
      if (isNode(t.s)) nodes += t.s
      t.o match { case Right(o) if isNode(o) => nodes += o; case _ => () }
    }

    // adjacency with fixed-term context
    val colors = mutable.HashMap[String, Long]()
    nodes.foreach(n => colors(n) = 0L)

    def h(s: String): Long = graft.operators.Emitter.fnv64(s)

    def refine(): Boolean = {
      val next = mutable.HashMap[String, Long]()
      nodes.foreach { n =>
        val sig = mutable.ArrayBuffer[String]()
        triples.foreach { t =>
          val oTerm: String = t.o match {
            case Left((lex, dt)) => s"L|$dt|$lex"
            case Right(o) => if (isNode(o)) "N" + colors(o) else "I|" + o
          }
          val sTerm = if (isNode(t.s)) "N" + colors(t.s) else "I|" + t.s
          if (t.s == n) sig += s">|${t.p}|$oTerm"
          t.o match {
            case Right(o) if o == n => sig += s"<|${t.p}|$sTerm"
            case _ => ()
          }
        }
        val sorted = sig.sorted.mkString("")
        next(n) = h(colors(n) + "|" + sorted)
      }
      val changed = partitionCount(next) != partitionCount(colors)
      nodes.foreach(n => colors(n) = next(n))
      changed
    }

    def partitionCount(c: mutable.HashMap[String, Long]): Int = c.values.toSet.size

    var guard = 0
    while (refine() && guard < 12) guard += 1

    // individualize residual symmetric classes (safe for true automorphisms;
    // near-misses are absorbed by the P/R >= 0.95 tolerance)
    var classes = nodes.groupBy(colors).filter(_._2.size > 1)
    var guard2 = 0
    while (classes.nonEmpty && guard2 < 64) {
      val (_, members) = classes.minBy(_._1)
      colors(members.head) = h("ind|" + colors(members.head) + "|" + guard2)
      var g3 = 0
      while (refine() && g3 < 12) g3 += 1
      classes = nodes.groupBy(colors).filter(_._2.size > 1)
      guard2 += 1
    }

    triples.map { t =>
      val s = if (isNode(t.s)) "N" + colors(t.s) else t.s
      val o = t.o match {
        case Left((lex, dt)) => s"L|$dt|$lex"
        case Right(oi) => if (isNode(oi)) "N" + colors(oi) else "I|" + oi
      }
      (s, t.p, o)
    }.toSet
  }

  def score(mine: Set[CTriple], golden: Set[CTriple]): Score = {
    val common = mine.intersect(golden).size
    Score(
      if (mine.isEmpty) 1.0 else common.toDouble / mine.size,
      if (golden.isEmpty) { if (mine.isEmpty) 1.0 else 0.0 } else common.toDouble / golden.size,
      mine.size, golden.size, common)
  }

  /** The fixed ("named") instance IRIs of a document: base + CamelName + "_" +
    * lineNum for every parsed source line — identical in the reference output
    * and in ours (RDFWriter.java:159). */
  def namedInstances(docText: String, base: String): Set[String] = {
    val doc = graft.model.Doc("x", Seq(graft.model.Span("text", docText, "", 0)))
    graft.operators.Tokenizer.tokenizeDoc(doc).flatMap { st =>
      if (st.schema.nonEmpty && SchemaDict.available(st.schema)) {
        val d = SchemaDict.load(st.schema)
        val k = SchemaDict.formatClassName(st.keyword)
        d.entities.get(k).map(_.name).orElse(d.types.get(k).map(_.name))
          .map(n => base + n + "_" + st.line_id)
      } else None
    }.toSet
  }
}
