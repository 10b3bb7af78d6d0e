package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-Quads serializer — the named-graph export format
  * (https://www.w3.org/TR/n-quads/): [[NTriplesSink]]'s line with the
  * store's graph column as the fourth term, so a multi-document store
  * dumps to ONE splittable file set without losing document identity
  * (the NT export flattens graphs away; the reference's per-file Turtle
  * keeps them only as separate files).
  *
  * Same scale posture as the NT sink: the whole serialization is a
  * codegen'd Column chain, written per-partition with no shuffle.
  */
object NQuadsSink {

  /** doc_id → graph label term. A doc_id that is already an absolute IRI
    * (has a ':', e.g. a store loaded from foreign N-Quads) or a blank-node
    * label is used verbatim; bare pipeline document ids (e.g. "test1") get
    * the `urn:graft:graph:` namespace — the documented naming convention
    * (the reader keeps whatever it finds verbatim; roundtripping a bare-id
    * store yields the namespaced IRIs). */
  def graphTerm: Column =
    when(col("doc_id").startsWith("_:"), col("doc_id"))
      .when(col("doc_id").contains(":"), concat(lit("<"), col("doc_id"), lit(">")))
      .otherwise(concat(lit("<urn:graft:graph:"), col("doc_id"), lit(">")))

  /** One N-Quads line per row; input needs (doc_id, subj, pred, obj,
    * obj_kind, obj_datatype) plus obj_lang when `withLang`. */
  def line(withLang: Boolean = false): Column =
    concat(NTriplesSink.tripleTerms(withLang), lit(" "), graphTerm, lit(" ."))

  /** Distributed export: one text part-file per partition, no shuffle. */
  def write(quads: DataFrame, path: String): Unit =
    quads.select(line(withLang = quads.columns.contains("obj_lang")).as("value"))
      .write.mode("overwrite").text(path)

  /** doc_id → graph label, driver-side (same convention as [[graphTerm]]) */
  def graphTermStr(docId: String): String =
    if (docId.startsWith("_:")) docId
    else if (docId.contains(":")) s"<$docId>"
    else s"<urn:graft:graph:$docId>"

  /** One N-Quads line in caller-supplied order — the O(1)-state streaming
    * unit (the CLI's per-doc export loop). */
  def writeOne(t: graft.model.FinalTriple, w: java.io.Writer): Unit =
    w.write(s"${NTriplesSink.termsOf(t)} ${graphTermStr(t.doc_id)} .\n")
}
