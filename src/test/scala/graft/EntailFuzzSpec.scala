package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property fuzz for the entailment materializers: random small TBox+ABox
  * graphs (tiny vocab forcing chains, diamonds, cycles and rule overlap)
  * run through the REAL [[graft.analytics.Rdfs]] / [[graft.analytics.Owl]]
  * operators, compared against naive ITERATE-UNTIL-FIXPOINT evaluators
  * written directly from the rule definitions — the ground truth the
  * one-pass stratifications (pre-composed effective maps, closure-then-
  * invert) claim to equal. */
class EntailFuzzSpec extends SparkTestBase {

  private type Quad = (String, String, String, String)

  private val T = graft.analytics.KgQuery.RdfType
  private val SC = graft.analytics.Rdfs.SubClassOf
  private val SP = graft.analytics.Rdfs.SubPropertyOf
  private val DM = graft.analytics.Rdfs.Domain
  private val RG = graft.analytics.Rdfs.Range

  private def fix(start: Set[Quad])(step: Set[Quad] => Set[Quad]): Set[Quad] = {
    var cur = start
    var next = step(cur)
    while (next != cur) { cur = next; next = step(cur) }
    cur
  }

  /** naive ρdf fixpoint: re-fire every rule until nothing new appears */
  private def bruteRdfs(in: Set[Quad]): Set[Quad] = fix(in) { s =>
    val sc = s.collect { case (g, a, SC, b) => (g, a, b) }
    val sp = s.collect { case (g, a, SP, b) => (g, a, b) }
    val dm = s.collect { case (g, p, DM, c) => (g, p, c) }
    val rg = s.collect { case (g, p, RG, c) => (g, p, c) }
    s ++
      sc.flatMap { case (g, a, b) => sc.collect { case (`g`, `b`, c) => (g, a, SC, c) } } ++
      sp.flatMap { case (g, a, b) => sp.collect { case (`g`, `b`, c) => (g, a, SP, c) } } ++
      s.collect { case (g, x, p, y) if p != T => (g, x, p, y) }.flatMap { case (g, x, p, y) =>
        sp.collect { case (`g`, `p`, q) => (g, x, q, y) } } ++
      s.collect { case (g, x, p, y) if p != T => (g, x, p, y) }.flatMap { case (g, x, p, y) =>
        dm.collect { case (`g`, `p`, c) => (g, x, T, c) } ++
          rg.collect { case (`g`, `p`, c) => (g, y, T, c) } } ++
      s.collect { case (g, x, T, c) => (g, x, c) }.flatMap { case (g, x, c) =>
        sc.collect { case (`g`, `c`, d) => (g, x, T, d) } }
  }

  private val IO = graft.analytics.Owl.InverseOf
  private val SY = graft.analytics.Owl.SymmetricProperty
  private val TR = graft.analytics.Owl.TransitiveProperty

  /** naive OWL property-characteristics fixpoint */
  private def bruteOwl(in: Set[Quad]): Set[Quad] = fix(in) { s =>
    val inv = s.collect { case (g, p, IO, q) => (g, p, q) }
    val invBoth = inv ++ inv.map { case (g, p, q) => (g, q, p) }
    val sym = s.collect { case (g, p, T, SY) => (g, p) }
    val trans = s.collect { case (g, p, T, TR) => (g, p) }
    s ++
      s.flatMap { case (g, x, p, y) =>
        invBoth.collect { case (`g`, `p`, q) => (g, y, q, x) } } ++
      s.collect { case (g, x, p, y) if sym((g, p)) => (g, y, p, x) } ++
      s.flatMap { case (g, x, p, y) if trans((g, p)) =>
        s.collect { case (`g`, `y`, `p`, z) => (g, x, p, z) }
      case _ => Set.empty[Quad] }
  }

  private def runOp(op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      in: Set[Quad]): Set[Quad] = {
    import spark.implicits._
    op(in.toSeq.toDF("doc_id", "subj", "pred", "obj"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
  }

  // small vocab: 4 classes/props, 4 instances, 2 graphs — dense overlap
  private val cls = Gen.oneOf("C1", "C2", "C3", "C4")
  private val prp = Gen.oneOf("p1", "p2", "p3", "p4")
  private val ind = Gen.oneOf("a", "b", "c", "d")
  private val gr = Gen.oneOf("g1", "g2")

  private val rdfsQuad: Gen[Quad] = Gen.frequency(
    2 -> (for { g <- gr; a <- cls; b <- cls } yield (g, a, SC, b)),
    2 -> (for { g <- gr; a <- prp; b <- prp } yield (g, a, SP, b)),
    1 -> (for { g <- gr; p <- prp; c <- cls } yield (g, p, DM, c)),
    1 -> (for { g <- gr; p <- prp; c <- cls } yield (g, p, RG, c)),
    3 -> (for { g <- gr; x <- ind; p <- prp; y <- ind } yield (g, x, p, y)),
    2 -> (for { g <- gr; x <- ind; c <- cls } yield (g, x, T, c)))

  private val owlQuad: Gen[Quad] = Gen.frequency(
    1 -> (for { g <- gr; p <- prp; q <- prp if p != q } yield (g, p, IO, q)),
    1 -> (for { g <- gr; p <- prp } yield (g, p, T, SY)),
    1 -> (for { g <- gr; p <- prp } yield (g, p, T, TR)),
    4 -> (for { g <- gr; x <- ind; p <- prp; y <- ind } yield (g, x, p, y)))

  test("Rdfs.entail equals the naive rule fixpoint on random graphs") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(rdfsQuad).map(_.toSet)) { in =>
      val got = runOp(graft.analytics.Rdfs.entail(_), in)
      val want = bruteRdfs(in)
      if (got != want) {
        println(s"RDFS MISMATCH\nIN: $in\nONLY-GOT: ${got -- want}\nONLY-WANT: ${want -- got}")
        false
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("Rdfs.entail distributed TBox path (tboxCap = -1) equals the driver gate path") {
    // round 6: the TBox side composes on the driver under a measured gate;
    // the distributed composition must stay output-identical (and equal to
    // the brute fixpoint) — pinned on the same random webs
    val prop = Prop.forAll(Gen.nonEmptyListOf(rdfsQuad).map(_.toSet)) { in =>
      val dist = runOp(graft.analytics.Rdfs.entail(_, "doc_id", tboxCap = -1L), in)
      val drv = runOp(graft.analytics.Rdfs.entail(_), in)
      val want = bruteRdfs(in)
      if (dist != drv || drv != want) {
        println(s"RDFS PATH MISMATCH\nIN: $in\nDIST-ONLY: ${dist -- drv}\nDRV-ONLY: ${drv -- dist}\nWANT-DELTA: ${want -- drv}")
        false
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("SameAs.resolve equals a brute-force union-find smush on random graphs") {
    val SA = graft.analytics.SameAs.OwlSameAs
    def brute(in: Set[Quad]): Set[Quad] = {
      in.groupBy(_._1).flatMap { case (g, qs) =>
        val edges = qs.collect { case (_, s, SA, o) => (s, o) }
        val nodes = edges.flatMap(e => Seq(e._1, e._2))
        // union-find by repeated min-label sweep
        var canon = nodes.map(n => n -> n).toMap
        var changed = true
        while (changed) {
          changed = false
          edges.foreach { case (a, b) =>
            val m = Seq(canon(a), canon(b)).min
            if (canon(a) != m) { canon += a -> m; changed = true }
            if (canon(b) != m) { canon += b -> m; changed = true }
          }
          // path-compress through representatives
          canon.foreach { case (n, c) =>
            if (canon.getOrElse(c, c) != c) { canon += n -> canon(c); changed = true } }
        }
        def c(n: String) = canon.getOrElse(n, n)
        qs.collect { case (_, s, p, o) if p != SA => (g, c(s), p, c(o)) } ++
          canon.collect { case (n, m) if n != m => (g, n, SA, m) }
      }.toSet
    }
    val saQuad: Gen[Quad] = Gen.frequency(
      2 -> (for { g <- gr; x <- ind; y <- ind } yield (g, x, SA, y)),
      3 -> (for { g <- gr; x <- ind; p <- prp; y <- ind } yield (g, x, p, y)))
    val prop = Prop.forAll(Gen.nonEmptyListOf(saQuad).map(_.toSet)) { in =>
      val got = runOp(graft.analytics.SameAs.resolve(_), in)
      val want = brute(in)
      if (got != want) {
        println(s"SAMEAS MISMATCH\nIN: $in\nONLY-GOT: ${got -- want}\nONLY-WANT: ${want -- got}")
        false
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("Owl.entail equals the naive rule fixpoint on random graphs") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(owlQuad).map(_.toSet)) { in =>
      val got = runOp(graft.analytics.Owl.entail(_), in)
      val want = bruteOwl(in)
      if (got != want) {
        println(s"OWL MISMATCH\nIN: $in\nONLY-GOT: ${got -- want}\nONLY-WANT: ${want -- got}")
        false
      } else true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
