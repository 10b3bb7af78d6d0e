package graft.operators

import graft.model.{Doc, Span}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 single-parse pin: the fused path's [[Tokenizer.tokenizeDocParsed]]
  * must produce EXACTLY the statements of the two-pass [[Tokenizer.tokenizeDoc]]
  * (same Stmt rows, same order) and, for every statement that carries a tree,
  * that tree must be structurally identical to what the emitter's own
  * re-parse ([[Tokenizer.parseArgs]]) would build — the invariant that makes
  * passing the tree to `Emitter.emit(ls, tree)` output-identical to the
  * re-parse path. Lives in graft.operators to reach the private surfaces. */
class TokenizerParsedSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def sameTree(a: scala.collection.Seq[Tokenizer.Node],
                       b: scala.collection.Seq[Tokenizer.Node]): Boolean =
    a.length == b.length && a.zip(b).forall {
      case (Tokenizer.SNode(x), Tokenizer.SNode(y)) => x == y
      case (Tokenizer.RNode(i, r), Tokenizer.RNode(j, s)) => i == j && r == s
      case (x: Tokenizer.LNode, y: Tokenizer.LNode) => sameTree(x.children, y.children)
      case _ => false
    }

  private def docOf(lines: Seq[String]): Doc =
    Doc("d", Seq(Span("text",
      "ISO-10303-21;\nHEADER;\nFILE_SCHEMA(('IFC4'));\nENDSEC;\nDATA;\n" +
        lines.mkString("\n") + "\nENDSEC;\nEND-ISO-10303-21;", "", 0)))

  private def parsedEquiv(doc: Doc): Prop = {
    val twoPass = Tokenizer.tokenizeDoc(doc).toList
    val onePass = Tokenizer.tokenizeDocParsed(doc, None).toList
    val stmtsEq = twoPass == onePass.map(_._1)
    val treesEq = onePass.forall { case (st, tree) =>
      tree == null || {
        val (kw, nodes) = Tokenizer.parseArgs(st.body)
        kw == st.keyword && sameTree(nodes, tree)
      }
    }
    // every real (line-numbered, '='-split) statement must actually carry a
    // tree under the size bound — the fast path, not an accidental fallback
    val treesPresent = onePass.forall { case (st, tree) =>
      tree != null || st.line_id == -1L || st.line_id == Long.MinValue
    }
    Prop(stmtsEq && treesEq && treesPresent) :|
      s"stmtsEq=$stmtsEq treesEq=$treesEq treesPresent=$treesPresent doc=${doc.doc_id}"
  }

  private val leafGen: Gen[String] =
    Gen.oneOf(Gen.choose(0, 999999).map(_.toString),
      Gen.alphaNumStr.map(s => "'" + s.take(12) + "'"),
      Gen.const("$"), Gen.const(".T."), Gen.const(".STEEL."))
  private def listGen(depth: Int): Gen[Seq[String]] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, elemGen(depth)))
  private def elemGen(depth: Int): Gen[String] =
    if (depth >= 3) leafGen
    else Gen.frequency(
      4 -> leafGen,
      2 -> Gen.choose(1, 99).map("#" + _),
      1 -> listGen(depth + 1).map(_.mkString("(", ",", ")")))

  test("property: parsed variant ≡ two-pass tokenizer on well-formed docs") {
    val stmtGen = for {
      els <- listGen(1)
      id <- Gen.choose(1L, 9999L)
    } yield s"#$id= IFCWALL(${els.mkString(",")});"
    check(Prop.forAll(Gen.nonEmptyListOf(stmtGen)) { lines =>
      parsedEquiv(docOf(lines))
    })
  }

  test("property: parsed variant ≡ two-pass tokenizer on adversarial bodies") {
    val hostile = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("#12", "#", "#x", "# 3", "'a'", "''", "'#7'", "ab", "1",
        ".T.", "$", " ", "\t", "-", "+9"),
      3 -> Gen.oneOf("(", ")", ",", ";", "'", "="),
      1 -> Gen.oneOf("#92233720368547758079", "#-4", "(#8", "))", "( '", "#1'z'")))
      .map(_.mkString)
    val stmtGen = for {
      body <- hostile
      id <- Gen.choose(1L, 9999L)
    } yield s"#$id=$body;"
    check(Prop.forAll(Gen.nonEmptyListOf(stmtGen)) { lines =>
      parsedEquiv(docOf(lines))
    })
  }

  test("multi-line statements and the no-'=' arm carry the right trees") {
    // multi-line continuation + a no-'=' statement (null tree, keyword "")
    val d = docOf(Seq("#1= IFCWALL('a',\n  #2, (1,2));", "#2= IFCORGANIZATION($);", "#3 junk"))
    check(parsedEquiv(d))
    val parsed = Tokenizer.tokenizeDocParsed(d, None).toList
    val noEq = parsed.find(_._1.line_id == Long.MinValue)
    assert(noEq.nonEmpty && noEq.get._2 == null)
  }

  test("docs above the tree-keep bound fall back to null trees, same stmts") {
    // one statement whose quoted literal pushes the doc over TreeKeepMaxChars
    val big = "#1= IFCWALL('" + "x" * (Tokenizer.TreeKeepMaxChars.toInt + 64) + "');"
    val d = docOf(Seq(big, "#2= IFCORGANIZATION($);"))
    val parsed = Tokenizer.tokenizeDocParsed(d, None).toList
    assert(parsed.forall(_._2 == null), "all trees must fall back to null")
    assert(parsed.map(_._1) == Tokenizer.tokenizeDoc(d).toList)
  }
}
