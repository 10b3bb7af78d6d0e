package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** owl:sameAs identity resolution ("smushing") over the triples table.
  *
  * KG construction at corpus scale mints one IRI per (document, entity);
  * cross-references between sources land as `owl:sameAs` links (the output
  * of any entity-resolution stage, incl. this engine's own near-dup
  * finishing — GraphOps turns LSH pairs into components the same way).
  * Querying a graph where one real-world entity hides behind five aliases
  * undercounts everything; the standard fix is to rewrite every alias to a
  * canonical member of its identity clique. The reference has no
  * counterpart (per-file converter, no cross-document identity) — its
  * users do this in the triple store; this keeps it on the cluster.
  *
  * Semantics:
  *  - identity cliques = connected components of the symmetric-closed
  *    sameAs edge set, per named graph (sameAs is reflexive/symmetric/
  *    transitive — components ARE its equivalence classes);
  *  - canonical member = lexicographic MIN IRI of the clique
  *    (deterministic, needs no ordering column);
  *  - [[resolve]] rewrites subj and obj of every non-sameAs triple to the
  *    canonical member and keeps one `member owl:sameAs canon` triple per
  *    non-canonical member (the provenance of the merge — a consumer can
  *    still reach the original IRIs), distinct overall (merging aliases
  *    routinely makes duplicate triples — that collapse is the point).
  *
  * 100-TB posture: cliques are closed with [[KgQuery.transitiveClosure]]
  * (O(log diameter) rounds over the sameAs edge set only — the instance
  * table is not touched by the loop). The closure materializes all-pairs
  * per clique: identity cliques are small by nature (a handful of aliases
  * per entity); a degenerate million-member clique should go through
  * [[graft.functions.GraphOps.connectedComponents]]'s long-id label
  * propagation instead — same output contract. The rewrite itself is two
  * graph-keyed equi joins of the instance table against the mapping
  * (mapping rows exist ONLY for non-canonical members, so untouched IRIs
  * stream through a left join with no fan-out), then the set-semantics
  * distinct — the same one wide edge Rdfs.entail pays.
  */
object SameAs {

  val OwlSameAs = "http://www.w3.org/2002/07/owl#sameAs"

  /** (graph, member, canon) for every non-canonical member of a sameAs
    * clique — the rewrite dictionary. Canonical members have no row. */
  def canonicalMap(triples: DataFrame, graphCol: String = "doc_id"): DataFrame = {
    val e = triples.filter(col("pred") === OwlSameAs)
      .select(col(graphCol).as("g"), col("subj").as("src"), col("obj").as("dst"))
    val sym = e.unionByName(
      e.select(col("g"), col("dst").as("src"), col("src").as("dst")))
    val reach = KgQuery.transitiveClosure(sym, graph = Seq("g")).drop("dist")
    // min over reachable ∪ self; keep only members the min actually renames
    reach.groupBy(col("g"), col("src").as("member"))
      .agg(min(col("dst")).as("canon"))
      .filter(col("canon") < col("member"))
      .select(col("g").as(graphCol), col("member"), col("canon"))
  }

  /** The smushed graph: every non-sameAs triple with subj/obj rewritten to
    * the canonical clique member, plus one `member owl:sameAs canon` triple
    * per merged alias, distinct per (graph, subj, pred, obj). */
  def resolve(triples: DataFrame, graphCol: String = "doc_id"): DataFrame = {
    // (A lazy localCheckpoint of the dict — consumed 3x below — was measured
    // SLOWER on the golden-store battery: the closure's driver fast path
    // already returns a materialized LogicalRDD, so the re-derived subtree
    // is one groupBy over it and the cut's extra stage barrier costs more.
    // At corpus scale, where the dict descends from the distributed loop,
    // the loop's own per-round checkpoint plays that role.)
    val dict = canonicalMap(triples, graphCol)
      .select(col(graphCol).as("__g"), col("member"), col("canon"))
    val t = triples.filter(col("pred") =!= OwlSameAs)
      .select(col(graphCol).as("g"), col("subj"), col("pred"), col("obj"))
    val subjFixed = t.join(dict,
        col("g") === col("__g") && col("subj") === col("member"), "left")
      .select(col("g"), coalesce(col("canon"), col("subj")).as("subj"),
        col("pred"), col("obj"))
    val bothFixed = subjFixed.join(dict,
        col("g") === col("__g") && col("obj") === col("member"), "left")
      .select(col("g"), col("subj"), col("pred"),
        coalesce(col("canon"), col("obj")).as("obj"))
    val provenance = dict.select(col("__g").as("g"), col("member").as("subj"),
      lit(OwlSameAs).as("pred"), col("canon").as("obj"))
    bothFixed.unionByName(provenance).distinct()
      .withColumnRenamed("g", graphCol)
  }
}
