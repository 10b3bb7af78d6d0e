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
    * lexical forms (the store's untyped-lexical model).
    *
    * Round 6 (guide §2.4 "remove shuffles outright"): each aggregate used to
    * fan out into one union branch PER EMITTED TRIPLE (6 core + 4 property +
    * 3 class = 13 branches re-reading 3 aggregate subtrees — Catalyst reuses
    * the exchanges but still runs every final-aggregation + projection
    * branch). Each aggregate now runs ONCE and emits its triples through a
    * single inline-array explode — 13 aggregate branches → 3 aggregates +
    * 3 generates, identical output bag (sf0.1 bench: q81 2.42 s → see
    * OPTIMIZATION_r06.md). */
  def describe(store: DataFrame): DataFrame = {
    val t = store.select(col("doc_id"), col("subj"), col("pred"), col("obj"))

    def kv(s: org.apache.spark.sql.Column, p: String, o: org.apache.spark.sql.Column) =
      struct(s.as("subj"), lit(p).as("pred"), o.as("obj"))
    def emit(df: DataFrame, rows: Seq[org.apache.spark.sql.Column]): DataFrame =
      df.select(col("doc_id"), explode(array(rows: _*)).as("kv"))
        .select(col("doc_id"), col("kv.subj").as("subj"),
          col("kv.pred").as("pred"), col("kv.obj").as("obj"))

    val core = t.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("subj")).as("ns"),
        countDistinct(col("pred")).as("np"),
        countDistinct(col("obj")).as("no"),
        countDistinct(when(col("pred") === KgQuery.RdfType, col("obj"))).as("nc"))
    val coreTriples = emit(core, Seq(
      kv(dsNode, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", lit(DatasetCls)),
      kv(dsNode, VoidNs + "triples", col("n").cast("string")),
      kv(dsNode, VoidNs + "distinctSubjects", col("ns").cast("string")),
      kv(dsNode, VoidNs + "properties", col("np").cast("string")),
      kv(dsNode, VoidNs + "distinctObjects", col("no").cast("string")),
      kv(dsNode, VoidNs + "classes", col("nc").cast("string"))))

    // property partitions: node identity is the predicate itself, URI-fused
    // onto the dataset node (deterministic, oracle-mirrorable by concat)
    val pp = t.groupBy(col("doc_id"), col("pred").as("p"))
      .agg(count(lit(1)).as("n"), countDistinct(col("subj")).as("ns"))
    val pNode = concat(dsNode, lit(":prop:"), col("p"))
    val propTriples = emit(pp, Seq(
      kv(dsNode, VoidNs + "propertyPartition", pNode),
      kv(pNode, VoidNs + "property", col("p")),
      kv(pNode, VoidNs + "triples", col("n").cast("string")),
      kv(pNode, VoidNs + "distinctSubjects", col("ns").cast("string"))))

    // class partitions over asserted rdf:type objects
    val cp = t.filter(col("pred") === KgQuery.RdfType)
      .groupBy(col("doc_id"), col("obj").as("c"))
      .agg(countDistinct(col("subj")).as("ne"))
    val cNode = concat(dsNode, lit(":class:"), col("c"))
    val classTriples = emit(cp, Seq(
      kv(dsNode, VoidNs + "classPartition", cNode),
      kv(cNode, VoidNs + "class", col("c")),
      kv(cNode, VoidNs + "entities", col("ne").cast("string"))))

    coreTriples.unionByName(propTriples).unionByName(classTriples)
  }
}
