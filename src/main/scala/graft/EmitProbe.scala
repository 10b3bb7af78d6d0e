package graft

import graft.model.{LinkedStmt, RefTarget}
import graft.operators.{Emitter, Tokenizer}
import graft.schema.SchemaDict
import graft.sources.SynthCorpus

/** Diagnostic microbench: single-threaded tokenize + link-emulate + emit over
  * synthetic docs, NO Spark — isolates per-triple emitter cost from plan
  * overhead. Not part of the driver contract.
  *
  * Usage: runMain graft.EmitProbe [nDocs] [lines]
  */
object EmitProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 200
    val lines = if (args.length > 1) args(1).toInt else 100

    val docs = (0 until nDocs).map(i => SynthCorpus.genDoc(i.toLong, lines, skew = false, seed = 42L))

    // tokenize (Stage A)
    var t0 = System.nanoTime()
    val stmtsByDoc = docs.map(d => Tokenizer.tokenizeDoc(d).toVector)
    val nStmts = stmtsByDoc.map(_.size).sum
    val tokSec = (System.nanoTime() - t0) / 1e9

    // link-emulate (Stage B, doc-local): line_id -> keyword
    t0 = System.nanoTime()
    val linked = stmtsByDoc.map { stmts =>
      val kw = stmts.iterator.filter(_.line_id >= 0).map(s => s.line_id -> s.keyword).toMap
      stmts.map { s =>
        val tgts = s.refs.map(r =>
          RefTarget(r, if (kw.contains(r)) r else -1L, kw.getOrElse(r, null)))
        LinkedStmt(s.doc_id, s.schema, s.line_id, s.keyword, s.body, s.abort, s.bad_line, tgts)
      }
    }
    val linkSec = (System.nanoTime() - t0) / 1e9

    // emit (Stage C)
    t0 = System.nanoTime()
    val dict = SchemaDict.load(linked.head.head.schema)
    var nTriples = 0L
    var warm = 0
    while (warm < 2) { // rep 1 warms JIT, rep 2 measures
      t0 = System.nanoTime()
      nTriples = 0L
      linked.foreach { stmts =>
        val em = new Emitter(dict, SynthCorpus.BaseURI)
        stmts.foreach { ls => nTriples += em.emit(ls)._1.size }
      }
      warm += 1
    }
    val emitSec = (System.nanoTime() - t0) / 1e9

    println(f"docs=$nDocs stmts=$nStmts candidateTriples=$nTriples")
    println(f"tokenize: $tokSec%6.2fs  (${(nStmts / tokSec).round} stmts/s)")
    println(f"link:     $linkSec%6.2fs")
    println(f"emit:     $emitSec%6.2fs  (${(nTriples / emitSec).round} triples/s single-thread, " +
      f"${emitSec / nTriples * 1e6}%.1f us/triple)")
  }
}
