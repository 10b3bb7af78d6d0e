package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VoID dataset descriptions (W3C "Describing Linked Datasets with the VoID
  * Vocabulary") computed over a triples store — the statistical self-
  * description every published knowledge graph ships alongside its dumps.
  * The reference's users hand their generated Turtle to `void-impl`-style
  * tooling for exactly this report; here it is three map-side-combinable
  * aggregates over the store, emitted AS TRIPLES so the description is
  * itself queryable/serializable through the same engine (Sparql/
  * SparqlResults run on the output unchanged).
  *
  * Per graph (doc_id) the description carries the core VoID statistics
  * (void:triples, void:distinctSubjects, void:properties,
  * void:distinctObjects, void:classes) plus one void:propertyPartition
  * node per predicate and one void:classPartition node per asserted class,
  * each with its own void:triples / void:entities count.
  *
  * 100-TB posture: every output row descends from a hash aggregate keyed by
  * (doc_id) / (doc_id, pred) / (doc_id, class) — all partial-aggregated
  * map-side; the distinct counts run as one grouped pass (Catalyst expands
  * the multi-distinct into an Expand over (doc_id, term) pairs, still
  * keyed and combinable — never a global sort or a driver collect). The
  * store text crosses the shuffle once, as terms inside the count keys.
  */
object VoidStats {

  val VoidNs = "http://rdfs.org/ns/void#"
  val DatasetCls: String = VoidNs + "Dataset"

  /** dataset node IRI for a graph */
  private def dsNode = concat(lit("urn:graft:void:"), col("doc_id"))

  /** VoID description triples (doc_id, subj, pred, obj) for a store with
    * columns (doc_id, subj, pred, obj). Counts are emitted as decimal
    * lexical forms (the store's untyped-lexical model). */
  def describe(store: DataFrame): DataFrame = {
    val t = store.select(col("doc_id"), col("subj"), col("pred"), col("obj"))

    def row(s: org.apache.spark.sql.Column, p: String, o: org.apache.spark.sql.Column) =
      Seq(s.as("subj"), lit(p).as("pred"), o.as("obj"))

    val core = t.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("subj")).as("ns"),
        countDistinct(col("pred")).as("np"),
        countDistinct(col("obj")).as("no"),
        countDistinct(when(col("pred") === KgQuery.RdfType, col("obj"))).as("nc"))
    val coreTriples = Seq(
      ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", lit(DatasetCls)),
      (VoidNs + "triples", col("n").cast("string")),
      (VoidNs + "distinctSubjects", col("ns").cast("string")),
      (VoidNs + "properties", col("np").cast("string")),
      (VoidNs + "distinctObjects", col("no").cast("string")),
      (VoidNs + "classes", col("nc").cast("string"))
    ).map { case (p, o) => core.select(col("doc_id") +: row(dsNode, p, o): _*) }
      .reduce(_ unionByName _)

    // property partitions: node identity is the predicate itself, URI-fused
    // onto the dataset node (deterministic, oracle-mirrorable by concat)
    val pp = t.groupBy(col("doc_id"), col("pred").as("p"))
      .agg(count(lit(1)).as("n"), countDistinct(col("subj")).as("ns"))
    val pNode = concat(dsNode, lit(":prop:"), col("p"))
    val propTriples =
      pp.select(col("doc_id") +: row(dsNode, VoidNs + "propertyPartition", pNode): _*)
        .unionByName(pp.select(col("doc_id") +: row(pNode, VoidNs + "property", col("p")): _*))
        .unionByName(pp.select(col("doc_id") +: row(pNode, VoidNs + "triples",
          col("n").cast("string")): _*))
        .unionByName(pp.select(col("doc_id") +: row(pNode, VoidNs + "distinctSubjects",
          col("ns").cast("string")): _*))

    // class partitions over asserted rdf:type objects
    val cp = t.filter(col("pred") === KgQuery.RdfType)
      .groupBy(col("doc_id"), col("obj").as("c"))
      .agg(countDistinct(col("subj")).as("ne"))
    val cNode = concat(dsNode, lit(":class:"), col("c"))
    val classTriples =
      cp.select(col("doc_id") +: row(dsNode, VoidNs + "classPartition", cNode): _*)
        .unionByName(cp.select(col("doc_id") +: row(cNode, VoidNs + "class", col("c")): _*))
        .unionByName(cp.select(col("doc_id") +: row(cNode, VoidNs + "entities",
          col("ne").cast("string")): _*))

    coreTriples.unionByName(propTriples).unionByName(classTriples)
  }
}
