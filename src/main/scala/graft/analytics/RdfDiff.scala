package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDF store delta: the set difference between two quad snapshots, the
  * operation behind dataset versioning / incremental re-publication (the
  * reference's users regenerate whole Turtle dumps per IFC revision and
  * diff them textually; set-semantic diff is the scalable form —
  * serialization order can never fake a change).
  *
  * 100-TB posture: two keyed LEFT ANTI hash joins on the full quad (the
  * natural Catalyst plan for EXCEPT over deduplicated inputs) — each
  * shuffles both snapshots once on the quad hash, no sort, no window;
  * identical snapshots produce zero rows without any driver-side compare.
  */
object RdfDiff {

  /** Quads in `b` but not `a` (op '+') and in `a` but not `b` (op '-').
    * Inputs are treated as RDF graphs, i.e. deduplicated quad SETS. */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val cols = Seq("doc_id", "subj", "pred", "obj")
    val av = a.select(cols.map(col): _*).distinct()
    val bv = b.select(cols.map(col): _*).distinct()
    bv.join(av, cols, "left_anti").withColumn("op", lit("+"))
      .unionByName(av.join(bv, cols, "left_anti").withColumn("op", lit("-")))
  }
}
