package graft.operators

import graft.model.{LinkedStmt, RefTarget}
import graft.schema.SchemaDict
import graft.sources.SynthCorpus

/** Diagnostic microbench for the FUSED per-doc loop (round 6): single-
  * threaded tokenize → doc-local link → emit → DocDedup over synthetic docs,
  * NO Spark — the phase split of the kg flagship's per-task work, free of
  * plan/scheduler overhead and 32-thread memory contention. Unlike
  * [[graft.EmitProbe]] it reuses emitters across documents (the fused
  * mapPartitions does), runs warm-up reps before measuring, and includes the
  * DocDedup accumulator. Not part of the driver contract.
  *
  * Usage: runMain graft.operators.FusedProbe [nDocs] [lines] [reps]
  */
object FusedProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 2000
    val lines = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 5

    val docs = (0 until nDocs).map(i =>
      SynthCorpus.genDoc(i.toLong, lines, skew = false, seed = 42L)).toArray

    var tokNs, linkNs, emitNs, dedupNs, parseNs = 0L
    var nStmts, nTriples, nDedup = 0L
    for (rep <- 1 to reps) {
      tokNs = 0L; linkNs = 0L; emitNs = 0L; dedupNs = 0L; parseNs = 0L
      nStmts = 0L; nTriples = 0L; nDedup = 0L
      val emitters = scala.collection.mutable.HashMap[String, Emitter]()
      docs.foreach { doc =>
        val t0 = System.nanoTime()
        // single-parse path (round 6): statements arrive with their trees,
        // mirroring Pipeline.runFused
        val stmts = Tokenizer.tokenizeDocParsed(doc, None).toArray
        val t1 = System.nanoTime(); tokNs += t1 - t0; nStmts += stmts.length
        val kw = new scala.collection.mutable.LongMap[String](math.max(8, stmts.length))
        stmts.foreach { case (s, _) => if (s.line_id >= 0) kw.update(s.line_id, s.keyword) }
        val linked = stmts.map { case (s, tree) =>
          val targets = s.refs.map { r =>
            kw.get(r) match {
              case Some(k) => RefTarget(r, r, k)
              case None => RefTarget(r, -1L, null)
            }
          }
          (LinkedStmt(s.doc_id, s.schema, s.line_id, s.keyword, s.body,
            s.abort, s.bad_line, targets), tree)
        }
        val t2 = System.nanoTime(); linkNs += t2 - t1
        // sink form mirroring runFused: emit streams fields into DocDedup,
        // no TripleRow per candidate (emit+dedup merge into the emit column;
        // the dedup column keeps only the flush)
        val dedup = new Pipeline.DocDedup
        var nT = 0L
        val sink = new Emitter.TripleSink {
          def add(doc_id: String, subj: String, pred_id: Int, obj: String,
                  so_tag: Int, subj_val: Long, obj_val: Long, kd: Int,
                  src_line: Long, slot: Int, wcls: Int): Unit = {
            nT += 1
            dedup.add(doc_id, subj, pred_id, obj, so_tag, subj_val, obj_val,
              kd, src_line, slot, wcls)
          }
        }
        linked.foreach { case (ls, tree) =>
          val e0 = System.nanoTime()
          val em = emitters.getOrElseUpdate(ls.schema,
            new Emitter(SchemaDict.load(if (ls.schema.isEmpty) "IFC2X3_TC1" else ls.schema), SynthCorpus.BaseURI))
          em.emitInto(ls, tree, sink)
          emitNs += System.nanoTime() - e0
        }
        nTriples += nT
        val d0 = System.nanoTime()
        nDedup += dedup.flush(doc.doc_id).size
        dedupNs += System.nanoTime() - d0
        // parse-only column (extra pass, not counted in emit): what the
        // single-parse path SAVES — the former Stage-C re-tokenization
        val p0 = System.nanoTime()
        linked.foreach { case (ls, _) =>
          if (ls.keyword != Tokenizer.DocSentinel) Tokenizer.parseArgs(ls.body)
        }
        parseNs += System.nanoTime() - p0
      }
      println(f"[rep $rep] stmts=$nStmts triples=$nTriples deduped=$nDedup  " +
        f"tok=${tokNs / 1e9}%6.2fs link=${linkNs / 1e9}%5.2fs " +
        f"emit=${emitNs / 1e9}%6.2fs dedup=${dedupNs / 1e9}%6.2fs " +
        f"parseOnly=${parseNs / 1e9}%5.2fs  " +
        f"(${tokNs / 1000.0 / nStmts}%.2f/${emitNs / 1000.0 / nStmts}%.2f us/stmt tok/emit, " +
        f"${dedupNs / 1000.0 / nTriples}%.3f us/triple dedup)")
    }
  }
}
