package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** N-Quads reader — the named-graph form of [[NTriplesSource]], sharing its
  * statement parser (https://www.w3.org/TR/n-quads/): each line is an NT
  * statement with an optional graph label (IRI or blank node) before the
  * terminating '.'. A line without a graph label belongs to the default
  * graph and parses with `doc_id = ""` — this store models graphs as the
  * non-empty doc_id column, so downstream named-graph semantics treat ""
  * as "no graph" (the same delta the SPARQL layer documents).
  *
  * The graph label is kept VERBATIM in doc_id (no prefix stripping — a
  * reader that rewrote graph names would silently alter data; the sink's
  * doc_id → IRI convention is documented at
  * [[graft.sinks.NQuadsSink.graphTerm]]).
  *
  * Same scale shape as NT: line-oriented, self-contained, splittable —
  * one narrow flatMap over textFile, no shuffle anywhere. Malformed input
  * fails loudly with line text and column, like the NT reader.
  */
object NQuadsSource {

  /** One parsed quad; doc_id is the graph label ("" = default graph). */
  final case class NqRow(doc_id: String, subj: String, pred: String, obj: String,
      obj_kind: String, obj_datatype: String, obj_lang: String)

  /** Read an NQ file/directory into a quads DataFrame. Blank-node labels
    * (subject/object/graph position) are namespaced per source file, the
    * same per-document scoping rule [[NTriplesSource.read]] applies. */
  def read(spark: SparkSession, path: String): DataFrame = {
    implicit val enc2 = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val enc = Encoders.product[NqRow]
    import org.apache.spark.sql.functions.{col, input_file_name}
    spark.read.textFile(path)
      .select(col("value"), input_file_name().as("__f"))
      .as[(String, String)]
      .flatMap { case (line, f) => parseLine(line).map(scopeBnodes(_, f)) }
      .toDF()
  }

  private def scopeBnodes(r: NqRow, file: String): NqRow = {
    if (!r.subj.startsWith("_:") && r.obj_kind != "bnode" &&
      !r.doc_id.startsWith("_:")) r
    else {
      val tag = "_:f" + java.lang.Long.toHexString(
        graft.functions.Fnv64.hashBytes(file.getBytes("UTF-8"))) + "_"
      def scope(t: String) = if (t.startsWith("_:")) tag + t.substring(2) else t
      r.copy(doc_id = scope(r.doc_id), subj = scope(r.subj),
        obj = if (r.obj_kind == "bnode") tag + r.obj.substring(2) else r.obj)
    }
  }

  /** Parse pre-loaded NQ lines (labels verbatim — pre-split streams carry
    * their own bnode scoping). */
  def parse(lines: Dataset[String]): DataFrame = {
    implicit val enc = Encoders.product[NqRow]
    lines.flatMap(parseLine(_)).toDF()
  }

  /** Parse one line; None for blank/comment lines. */
  def parseLine(line: String): Option[NqRow] =
    NTriplesSource.parseCore(line, allowGraph = true).map { case (t, g) =>
      NqRow(g, t.subj, t.pred, t.obj, t.obj_kind, t.obj_datatype, t.obj_lang)
    }
}
