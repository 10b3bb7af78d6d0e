package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPARQL-style query layer over the materialized triples table.
  *
  * The reference is a converter: users load its Turtle into a triple store
  * and query it there (basic graph patterns, property paths — the canonical
  * downstream queries over ifcOWL data, e.g. "follow list#hasNext chains to
  * recover ordered attribute values that RDFWriter.java:690-780 expanded
  * into linked cells"). This module keeps those queries INSIDE Spark, over
  * the (doc_id, subj, pred, obj, …) table the pipeline writes, so a corpus-
  * scale KG never has to round-trip through a single-node store.
  *
  * Named-graph scoping: minted IRIs are only unique per document (two docs
  * with identical content mint identical content-hash IRIs — by design, see
  * Emitter), so every join this module emits carries the graph column
  * (doc_id) in its key. That is also the 100-TB skew story: all join keys
  * contain doc_id, so a hot subject can never concentrate more than one
  * document's rows on a key; AQE skew-split handles mega-documents like the
  * D2 link join does.
  *
  * 100-TB posture, per operator:
  *  - [[bgp]]: each triple pattern compiles to a pushed-down filter on the
  *    constant positions (pred/obj constants reach the parquet scan as
  *    PushedFilters), then patterns join on (graph ++ shared vars) —
  *    plain equi-joins Catalyst is free to reorder/broadcast, AQE re-plans
  *    at runtime. Pattern order seeds the join tree most-selective-first
  *    using a constants-count proxy (no stats needed; AQE refines).
  *  - [[transitiveClosure]]: min-plus iterative doubling — O(log diameter)
  *    rounds, each one equi-join + one min aggregate; per-round lineage is
  *    cut with a stats-fresh localCheckpoint and round k-1's blocks are
  *    freed (same traps and fixes as GraphOps.connectedComponents).
  *    Materializing a closure is inherently |pairs|-sized: intended for
  *    bounded-diameter, bounded-fanout relations (RDF list chains, type
  *    hierarchies), with maxIter as the backstop.
  *  - [[listElements]]: three pred-filtered scans of the same table + the
  *    chain closure; every join key is (doc_id, cell IRI).
  */
object KgQuery {

  /** A term of a triple pattern: variable or constant (IRI / literal lexical
    * form, matched against the lexical `subj`/`pred`/`obj` columns). */
  sealed trait Term
  /** Variable — binds a result column named `name` ("graph" is reserved). */
  final case class V(name: String) extends Term
  /** Constant — compiled to a pushed-down equality filter. */
  final case class I(value: String) extends Term
  /** Property-path expression — predicate position only (SPARQL 1.1 paths). */
  final case class P(path: Path) extends Term

  /** SPARQL 1.1 property-path algebra. Compiled by [[pathEdges]] to a
    * (graph, src, dst) edge table: `Pred` is one pushed-down pred-filtered
    * scan; `Inv` swaps endpoints; `PathSeq` is an equi-join on the midpoint
    * (+ graph); `Alt` a union; `Plus` the transitive closure (min-plus
    * iterative doubling — set semantics, as SPARQL requires for closures);
    * `Star` adds the zero-length pairs (t, t) for every term in the graph.
    * Bag/set contract: Pred/Inv/PathSeq/Alt preserve bags (SPARQL algebra
    * translation); Plus/Star return distinct pairs. */
  sealed trait Path
  final case class Pred(iri: String) extends Path
  final case class Inv(p: Path) extends Path
  final case class PathSeq(a: Path, b: Path) extends Path
  final case class Alt(a: Path, b: Path) extends Path
  final case class Plus(p: Path) extends Path
  final case class Star(p: Path) extends Path
  /** Zero-or-one (`?`): the path's edges plus the zero-length pairs. */
  final case class Opt(p: Path) extends Path
  /** Negated property set `!(p1|…|^q1|…)`: forward members compile to one
    * scan with a pushed-down NOT-IN predicate filter; inverse members
    * (`^q`) to a second, REVERSED NOT-IN scan. SPARQL 1.1 §18.4 splits the
    * set — `!(F|^I)` ≡ `alt(NPS(F), inv(NPS(I)))` — so each branch excludes
    * only its own members, and a side with no members contributes no scan. */
  final case class Nps(preds: Seq[String], invPreds: Seq[String] = Nil) extends Path

  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val ListHasNext = "https://w3id.org/list#hasNext"
  val ListHasContents = "https://w3id.org/list#hasContents"

  /** Output column carrying the named-graph (doc_id) value. */
  val GraphCol = "graph"

  /** Companion-column name carrying a bound variable's term metadata
    * (facet ∈ kind/datatype/lang). '#' cannot appear in a SPARQL variable
    * name, so companions never collide with solution variables; they are
    * excluded from every join key (same-lexical matching stays the
    * documented contract) and dropped from user-visible projections. */
  def metaCol(v: String, facet: String): String = v + "#" + facet

  /** Is this column a term-metadata companion (never a join key)? */
  def isMetaCol(name: String): Boolean = name.indexOf('#') >= 0

  /** Compile a property-path expression to its (graph, src, dst) edge table.
    * Each `Pred` leaf is a pred-filtered scan (the constant reaches the
    * parquet scan as a pushed filter); `PathSeq` joins on
    * (graph, midpoint) — the same skew-guarded key shape as every other
    * KG join; `Plus`/`Star` reuse [[transitiveClosure]]'s O(log diameter)
    * doubling. A BARE `Star`'s zero-length pairs are, per the SPARQL 1.1
    * spec, all RDF terms of the graph — one distinct over the table's
    * subjects and objects; but a `Star`/`Opt` inside a sequence (the common
    * `p✶ then q` shape) is rewritten algebraically (q ⊎ Plus(p)∖id / q) so the
    * term set never materializes. At corpus scale prefer `Plus` over a
    * BARE `Star` unless zero-length solutions are genuinely wanted. */
  def pathEdges(triples: DataFrame, path: Path,
                graphCol: String = "doc_id"): DataFrame = {
    // zero-length pairs: (t, t) for every RDF term of the graph (SPARQL 1.1
    // sec 9.3 — evaluated over the graph's term set, not the path's)
    def zeroLength: DataFrame =
      triples.select(col(graphCol).as(GraphCol), col("subj").as("t"))
        .unionByName(triples.select(col(graphCol).as(GraphCol), col("obj").as("t")))
        .distinct()
        .select(col(GraphCol), col("t").as("src"), col("t").as("dst"))
    // midpoint equi-join of two edge tables (+ graph) — the PathSeq primitive
    def seqJoin(l: DataFrame, rIn: DataFrame): DataFrame = {
      val r = rIn.select(col(GraphCol).as("__g"), col("src").as("__mid"),
        col("dst").as("__dst"))
      l.join(r, col(GraphCol) === col("__g") && col("dst") === col("__mid"))
        .select(col(GraphCol), col("src"), col("__dst").as("dst"))
    }
    def edges(p: Path): DataFrame = p match {
      case Pred(iri) =>
        triples.filter(col("pred") === lit(iri))
          .select(col(graphCol).as(GraphCol), col("subj").as("src"), col("obj").as("dst"))
      case Inv(q) =>
        edges(q).select(col(GraphCol), col("dst").as("src"), col("src").as("dst"))
      case Alt(a, b) => edges(a).unionByName(edges(b))
      // Sequences THROUGH a Star/Opt never materialize the graph's term set:
      // Star(p) = id ∪ (Plus(p) minus its self-pairs) — every (x,x) in
      // Plus(p) is already in id, so the distinct union splits exactly —
      // and joining q onto the id side yields q itself (q's endpoints are
      // terms of the graph by construction). Exact bag equivalence, zero
      // all-terms distinct: the corpus-scale path for `p✶ then q` patterns.
      case PathSeq(Star(a), b) =>
        val nonTrivial = edges(Plus(a)).filter(col("src") =!= col("dst"))
        edges(b).unionByName(seqJoin(nonTrivial, edges(b)))
      case PathSeq(a, Star(b)) =>
        val nonTrivial = edges(Plus(b)).filter(col("src") =!= col("dst"))
        edges(a).unionByName(seqJoin(edges(a), nonTrivial))
      case PathSeq(Opt(a), b) =>
        val nonTrivial = edges(a).distinct().filter(col("src") =!= col("dst"))
        edges(b).unionByName(seqJoin(nonTrivial, edges(b)))
      case PathSeq(a, Opt(b)) =>
        val nonTrivial = edges(b).distinct().filter(col("src") =!= col("dst"))
        edges(a).unionByName(seqJoin(edges(a), nonTrivial))
      case PathSeq(a, b) => seqJoin(edges(a), edges(b))
      case Plus(q) =>
        transitiveClosure(edges(q), graph = Seq(GraphCol)).drop("dist")
      case Star(q) =>
        edges(Plus(q)).unionByName(zeroLength).distinct()
      case Opt(q) =>
        edges(q).unionByName(zeroLength).distinct()
      case Nps(preds, invPreds) =>
        require(preds.nonEmpty || invPreds.nonEmpty, "empty negated property set")
        def scan(excl: Seq[String]): DataFrame =
          triples.filter(!col("pred").isInCollection(excl))
            .select(col(graphCol).as(GraphCol), col("subj").as("src"), col("obj").as("dst"))
        val fwd = if (preds.nonEmpty) Some(scan(preds)) else None
        val rev =
          if (invPreds.isEmpty) None
          else Some(scan(invPreds)
            .select(col(GraphCol), col("dst").as("src"), col("src").as("dst")))
        (fwd, rev) match {
          case (Some(f), Some(r)) => f.unionByName(r)
          case (Some(f), None) => f
          case (None, r) => r.get
        }
    }
    edges(path)
  }

  /** Match a basic graph pattern (conjunction of triple patterns) against a
    * triples table; returns one row per solution with a column per variable
    * plus [[GraphCol]]. Patterns are implicitly scoped to one named graph:
    * solutions never span documents. A [[P]] property-path in predicate
    * position matches via [[pathEdges]]; subject/object terms behave as for
    * a plain pattern.
    *
    * `termMeta`: variables whose RDF-term metadata the caller needs (the
    * SPARQL front-end's LANG/DATATYPE/isIRI… builtins). Each such variable
    * additionally binds [[metaCol]] companion columns: object-position
    * bindings carry the store's `obj_kind`/`obj_datatype`/`obj_lang`
    * columns where present; subject bindings derive kind from the `_:`
    * blank-node prefix; predicate bindings are IRIs by grammar. Companions
    * never join (matching stays lexical — the documented delta) and are
    * absent for property-path bindings (paths lose term kinds).
    */
  def bgp(triples: DataFrame, patterns: Seq[(Term, Term, Term)],
          graphCol: String = "doc_id",
          termMeta: Set[String] = Set.empty): DataFrame = {
    require(patterns.nonEmpty, "empty basic graph pattern")

    // one filtered+projected scan per pattern; constant positions filter,
    // variable positions project (a variable repeated WITHIN a pattern
    // becomes an intra-row equality filter and binds once)
    def scan(pat: (Term, Term, Term)): (DataFrame, Set[String]) = {
      require(!pat._1.isInstanceOf[P] && !pat._3.isInstanceOf[P],
        "property paths are only valid in predicate position")
      val base = pat._2 match {
        case P(path) => pathEdges(triples, path, graphCol)
          .select(col(GraphCol).as(graphCol), col("src").as("subj"), col("dst").as("obj"))
        case _ => triples
      }
      val positions = pat._2 match {
        case P(_) => Seq("subj" -> pat._1, "obj" -> pat._3)
        case _ => Seq("subj" -> pat._1, "pred" -> pat._2, "obj" -> pat._3)
      }
      var df = base
      positions.foreach {
        case (c, I(v)) => df = df.filter(col(c) === lit(v))
        case _ =>
      }
      val varPos = positions.collect { case (c, V(n)) =>
        require(n != GraphCol, s"variable name '$GraphCol' is reserved")
        require(!isMetaCol(n), s"variable name '$n' may not contain '#'")
        (c, n)
      }
      varPos.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
        dup.map(_._1).sliding(2).foreach {
          case Seq(c1, c2) => df = df.filter(col(c1) === col(c2))
          case _ =>
        }
      }
      val bind = varPos.distinctBy(_._2)
      // term-metadata companions for requested variables (isMetaCol names,
      // excluded from all join keys). A path pattern rebinds subj/obj from
      // the edge table, which has no kind columns — no companions there.
      val isPath = pat._2.isInstanceOf[P]
      // "*" in termMeta = every bound variable (SELECT * under retainMeta)
      val metaSel = bind.filter { case (_, n) => termMeta(n) || termMeta("*") }.flatMap {
        case ("obj", n) if !isPath && base.columns.contains("obj_kind") =>
          col("obj_kind").as(metaCol(n, "kind")) +:
            Seq("datatype", "lang").collect {
              case f if base.columns.contains(s"obj_$f") =>
                col(s"obj_$f").as(metaCol(n, f))
            }
        case ("subj", n) if !isPath =>
          Seq(when(col("subj").startsWith("_:"), lit("bnode"))
            .otherwise(lit("iri")).as(metaCol(n, "kind")))
        case ("pred", n) => Seq(lit("iri").as(metaCol(n, "kind")))
        case _ => Nil
      }
      val out = df.select(col(graphCol).as(GraphCol) +:
        (bind.map { case (c, n) => col(c).as(n) } ++ metaSel): _*)
      (out, bind.map(_._2).toSet)
    }

    // constants-count selectivity proxy: a bound subject pins one entity
    // (most selective), a bound object is next (rdf:type <Class> style),
    // a bound predicate alone is a property scan
    def weight(pat: (Term, Term, Term)): Int = {
      def w(t: Term, v: Int) = t match { case I(_) => v; case _ => 0 }
      w(pat._1, 4) + w(pat._3, 2) + w(pat._2, 1)
    }

    val scans = patterns.map(p => (scan(p), weight(p)))
    val remaining = scala.collection.mutable.ArrayBuffer(scans: _*)

    def takeBest(connectedTo: Set[String]): ((DataFrame, Set[String]), Int) = {
      val candidates =
        if (connectedTo.isEmpty) remaining
        else {
          val c = remaining.filter(_._1._2.intersect(connectedTo).nonEmpty)
          if (c.nonEmpty) c else remaining // disconnected: graph-scoped product
        }
      val best = candidates.maxBy(_._2)
      remaining -= best
      best
    }

    var ((acc, bound), _) = takeBest(Set.empty)
    while (remaining.nonEmpty) {
      val ((next0, vars), _) = takeBest(bound)
      // a variable bound in several object positions carries its companions
      // from the FIRST binding pattern (same term ⇒ same metadata)
      val dupMeta = next0.columns.filter(c => isMetaCol(c) && acc.columns.contains(c))
      val next = if (dupMeta.isEmpty) next0 else next0.drop(dupMeta.toIndexedSeq: _*)
      val keys = GraphCol +: vars.intersect(bound).toSeq.sorted
      acc = acc.join(next, keys)
      bound = bound ++ vars
    }
    acc
  }

  /** SPARQL OPTIONAL: solutions of `required` extended with the variables of
    * `optional` where the optional group matches (same graph, shared vars),
    * NULL-padded where it does not. One left equi-join per call — chain
    * calls for several independent OPTIONAL groups. The optional group is
    * matched as its own BGP first, so its internal joins stay inner.
    */
  def bgpOptional(triples: DataFrame, required: Seq[(Term, Term, Term)],
                  optional: Seq[(Term, Term, Term)],
                  graphCol: String = "doc_id"): DataFrame = {
    val req = bgp(triples, required, graphCol)
    val opt = bgp(triples, optional, graphCol)
    val shared = req.columns.toSet.intersect(opt.columns.toSet) - GraphCol
    val keys = GraphCol +: shared.toSeq.sorted
    req.join(opt, keys, "left")
  }

  /** SPARQL FILTER NOT EXISTS: solutions of `patterns` for which `absent`
    * has NO match in the same graph with the same shared-variable bindings.
    * One left-anti equi-join — the distributed form of negation, and the
    * KG-side primitive for "entities missing a required property" audits.
    */
  def bgpNotExists(triples: DataFrame, patterns: Seq[(Term, Term, Term)],
                   absent: Seq[(Term, Term, Term)],
                   graphCol: String = "doc_id"): DataFrame = {
    val pos = bgp(triples, patterns, graphCol)
    val neg = bgp(triples, absent, graphCol)
    val shared = pos.columns.toSet.intersect(neg.columns.toSet) - GraphCol
    val keys = GraphCol +: shared.toSeq.sorted
    pos.join(neg, keys, "left_anti")
  }

  /** SPARQL CONSTRUCT: instantiate `template` once per solution of `where`,
    * producing new (graphCol, subj, pred, obj) triple rows with set
    * semantics (CONSTRUCT yields a graph, so duplicates collapse — one
    * distinct per call). The KG-to-KG transform primitive: materialized
    * inference rules, edge derivation, graph reshaping — all staying
    * distributed. Template variables must be bound by `where`.
    */
  def construct(triples: DataFrame, where: Seq[(Term, Term, Term)],
                template: Seq[(Term, Term, Term)],
                graphCol: String = "doc_id"): DataFrame = {
    require(template.nonEmpty, "empty CONSTRUCT template")
    val sol = bgp(triples, where, graphCol)
    val bound = sol.columns.toSet
    def term(t: Term): Column = t match {
      case V(n) =>
        require(bound.contains(n), s"template variable '$n' not bound by the WHERE patterns")
        col(n)
      case I(v) => lit(v)
      case P(_) => throw new IllegalArgumentException(
        "property paths cannot appear in a CONSTRUCT template")
    }
    template.map { case (s, p, o) =>
      sol.select(col(GraphCol).as(graphCol),
        term(s).as("subj"), term(p).as("pred"), term(o).as("obj"))
    }.reduce(_.unionByName(_)).distinct()
  }

  /** SPARQL UNION: solutions of any of the alternative groups, bag semantics
    * (SPARQL UNION does not deduplicate). The result schema is the union of
    * the branches' variables — [[GraphCol]] first, then variable names
    * sorted — with variables a branch does not bind NULL-padded, exactly the
    * SPARQL solution-sequence rule. Each branch plans as its own BGP
    * (pushed-down scans, local join order); the union is a zero-shuffle
    * concatenation Catalyst unions partition-wise.
    */
  def bgpUnion(triples: DataFrame, groups: Seq[Seq[(Term, Term, Term)]],
               graphCol: String = "doc_id"): DataFrame = {
    require(groups.nonEmpty, "empty UNION")
    val sols = groups.map(g => bgp(triples, g, graphCol))
    val allVars = sols.flatMap(_.columns).distinct.filterNot(_ == GraphCol).sorted
    sols.map { s =>
      val have = s.columns.toSet
      s.select(col(GraphCol) +:
        allVars.map(v => if (have(v)) col(v) else lit(null).cast("string").as(v)): _*)
    }.reduce(_.unionByName(_))
  }

  /** SPARQL DESCRIBE (concise-bounded-description form): every triple row
    * whose subject is a binding of `subjectVar` in some solution of
    * `patterns`, in that solution's graph. The pipeline skolemizes every
    * node to a content-hash IRI (no blank nodes survive), so the
    * subject-star IS the full CBD — there is no anonymous closure to chase.
    * Planned as distinct bindings → one left-semi equi-join on
    * (graph, subj); a selective pattern gives a small build side AQE
    * broadcasts at runtime.
    */
  def describe(triples: DataFrame, patterns: Seq[(Term, Term, Term)],
               subjectVar: String, graphCol: String = "doc_id"): DataFrame = {
    val sol = bgp(triples, patterns, graphCol)
    require(sol.columns.contains(subjectVar),
      s"DESCRIBE variable '$subjectVar' not bound by the patterns")
    val subs = sol.select(col(GraphCol).as("__g"), col(subjectVar).as("__s")).distinct()
    triples.join(subs,
      col(graphCol) === col("__g") && col("subj") === col("__s"), "left_semi")
  }

  /** SPARQL ASK: does the pattern have at least one solution? Planned as an
    * existence probe (isEmpty = limit-1 collect), not a full count. */
  def ask(triples: DataFrame, patterns: Seq[(Term, Term, Term)],
          graphCol: String = "doc_id"): Boolean =
    !bgp(triples, patterns, graphCol).isEmpty

  /** Reachability with minimal hop count over an edge list: returns
    * (graph…, src, dst, dist) for every ordered pair with a directed path,
    * dist = fewest edges. Min-plus iterative doubling (R ← R ∪ R∘R with a
    * min-dist aggregate), so a diameter-d relation converges in ⌈log₂ d⌉
    * rounds; cycles saturate (the pair set is finite) and terminate on the
    * (count, Σdist) fixpoint. `graph` columns ride every join key.
    * A base relation measuring ≤ `smallCap` distinct edges (the first
    * convergence probe's count — schema/TBox/list-chain scale) instead
    * closes driver-side in one collect ([[smallClosure]]); the distributed
    * doubling runs above the gate.
    */
  def transitiveClosure(edges: DataFrame, src: String = "src", dst: String = "dst",
                        graph: Seq[String] = Nil, maxIter: Int = 20,
                        smallCap: Long = 100000L): DataFrame = {
    val base = edges.select(
        graph.map(col) ++ Seq(col(src).as("src"), col(dst).as("dst"), lit(1).as("dist")): _*)
      .distinct()

    def cut(df: DataFrame): (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val ck = df.localCheckpoint(true)
      (org.apache.spark.sql.GraftBridge.statsFreshCopy(ck),
        org.apache.spark.sql.GraftBridge.checkpointedRdd(ck))
    }
    // convergence signature: pair count + exact dist sum (decimal(30,0) —
    // a long sum could wrap on 10^12-node inputs)
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)), sum(col("dist").cast("decimal(30,0)"))).head()
      (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[java.math.BigDecimal].stripTrailingZeros())
          .getOrElse(java.math.BigDecimal.ZERO))
    }

    // Stats-gated small-relation fast path — the closure analogue of the
    // broadcast-join decision: a base relation at or under `smallCap`
    // measured pairs (schema/TBox/list-chain scale — the size envelope a
    // broadcast join would ship to every executor anyway) closes on the
    // driver with per-source BFS, replacing ~2 jobs per doubling round
    // (eager checkpoint + convergence probe) with ONE collect. Identical
    // semantics: BFS shortest hop-count = the min-plus doubling's minimal
    // dist on unit edges. Larger relations run the distributed loop below.
    // (An alternative probe — persist + plain count before the checkpoint —
    // was measured SLOWER on the golden-store battery despite one fewer
    // job: the columnar cache build costs more than the saved job. The
    // eager-checkpoint probe stays.)
    var (r, rRdd) = cut(base)
    var prev = sig(r)
    if (prev._1 > 0 && prev._1 <= smallCap) {
      smallClosure(r, graph) match { // collects eagerly — safe to free base after
        case Some(closed) =>
          rRdd.foreach(_.unpersist(false))
          return closed
        case None => () // closure blew the driver pair budget mid-BFS
          // (ADVICE r5: a 100k-edge chain closes to ~5e9 pairs — quadratic
          // in the worst case, far beyond driver heap even when the BASE
          // passed the gate) — fall through to the distributed loop, whose
          // per-round pairs live in executors and spill
      }
    }
    var iter = 0
    var converged = prev._1 == 0
    while (!converged && iter < maxIter) {
      // right side renamed wholesale: no alias-resolution ambiguity in the
      // self-join (same LogicalRDD leaf on both sides)
      val rr = r.select(
        graph.map(g => col(g).as(s"__r_$g")) ++ Seq(col("src").as("__rsrc"),
          col("dst").as("__rdst"), col("dist").as("__rdist")): _*)
      val cond = graph.foldLeft(col("dst") === col("__rsrc")) {
        (acc, g) => acc && col(g) === col(s"__r_$g")
      }
      val step = r.join(rr, cond).select(
        graph.map(col) ++ Seq(col("src"),
          col("__rdst").as("dst"), (col("dist") + col("__rdist")).as("dist")): _*)
      val keyCols = graph ++ Seq("src", "dst")
      val (next, nextRdd) = cut(
        r.unionByName(step).groupBy(keyCols.map(col): _*).agg(min(col("dist")).as("dist")))
      val s = sig(next)
      converged = s == prev
      prev = s
      rRdd.foreach(_.unpersist(false))
      r = next
      rRdd = nextRdd
      iter += 1
    }
    r
  }

  /** The closure-PAIR budget of the driver fast path. The base-edge gate
    * (smallCap) bounds the input, but the closure itself is O(n²) pairs in
    * the worst case (ADVICE r5: a single 100k-edge chain closes to ~5e9
    * pairs); the BFS aborts once the emitted pair count crosses this bound
    * and [[transitiveClosure]] falls back to the distributed loop. 2M pairs
    * of small Rows is comfortably driver-sized. */
  private val MaxDriverClosurePairs = 2000000L

  /** Driver-side closure of a small edge frame (graph…, src, dst, dist=1):
    * per-graph adjacency + BFS from every source; one collect in, schema
    * preserved, output slice count scaled to the row count (a fixed 1 slice
    * would single-task every downstream join over an all-pairs-sized
    * closure — ADVICE r5). Only reachable through [[transitiveClosure]]'s
    * measured-count gate; returns None when the emitted pair count exceeds
    * [[MaxDriverClosurePairs]] (caller then runs the distributed loop). */
  private def smallClosure(r: DataFrame, graph: Seq[String]): Option[DataFrame] = {
    import scala.collection.mutable
    val schema = r.schema
    val g = graph.size
    val byGraph = r.collect().groupBy(row => (0 until g).map(row.get(_)).toSeq)
    val out = mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    byGraph.foreach { case (gk, rows) =>
      val adj = rows.groupMap(_.get(g))(_.get(g + 1))
      adj.keysIterator.foreach { s =>
        val dist = mutable.LinkedHashMap[Any, Int]() // insertion-ordered, deterministic
        var frontier: List[Any] = List(s)
        var d = 0
        while (frontier.nonEmpty) {
          d += 1
          val next = mutable.ListBuffer[Any]()
          frontier.foreach { u =>
            adj.getOrElse(u, Array.empty[Any]).foreach { v =>
              // s itself is only reachable via a cycle (dist >= 1, Plus semantics)
              if (!dist.contains(v)) { dist(v) = d; next += v }
            }
          }
          frontier = next.toList
        }
        if (out.length + dist.size > MaxDriverClosurePairs) return None
        dist.foreach { case (t, dd) =>
          out += org.apache.spark.sql.Row.fromSeq(gk ++ Seq(s, t, dd)) }
      }
    }
    Some(r.sparkSession.createDataFrame(
      r.sparkSession.sparkContext.parallelize(out.toIndexedSeq,
        graft.functions.GraphOps.sliceCount(out.length, r.sparkSession)), schema))
  }

  /** Flatten the RDF linked lists the emitter expands STEP aggregates into
    * (list#hasNext / list#hasContents cells — RDFWriter.java:690-780's
    * expansion, run backwards): one row per (graph, list head, 0-based
    * position, content). A head is a cell that carries contents and is not
    * any cell's hasNext target. Well-formed pipeline output has exactly one
    * hasContents per cell and cells are per-doc unique (Stage-D dedup), so
    * chains are simple paths and positions are dense.
    */
  def listElements(triples: DataFrame, graphCol: String = "doc_id"): DataFrame = {
    val nextE = triples.filter(col("pred") === ListHasNext)
      .select(col(graphCol).as("g"), col("subj"), col("obj"))
    val contents = triples.filter(col("pred") === ListHasContents)
      .select(col(graphCol).as("g"), col("subj").as("cell"), col("obj").as("content"))
    val heads = contents.select(col("g"), col("cell"))
      .join(nextE.select(col("g"), col("obj").as("cell")), Seq("g", "cell"), "left_anti")
      .select(col("g"), col("cell").as("head"))
    val chain = transitiveClosure(
      nextE.select(col("g"), col("subj").as("src"), col("obj").as("dst")),
      graph = Seq("g"))
    val reach = heads.select(col("g"), col("head"), col("head").as("cell"), lit(0).as("pos"))
      .unionByName(heads.join(chain.withColumnRenamed("src", "head"), Seq("g", "head"))
        .select(col("g"), col("head"), col("dst").as("cell"), col("dist").as("pos")))
    reach.join(contents, Seq("g", "cell"))
      .select(col("g").as(graphCol), col("head"), col("pos"), col("content"))
  }
}
