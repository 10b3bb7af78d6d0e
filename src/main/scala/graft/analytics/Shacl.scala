package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SHACL-lite shape validation over the triples store — the W3C Shapes
  * Constraint Language core constraints a KG publisher actually gates dumps
  * on: per-target-class property shapes with sh:minCount / sh:maxCount /
  * sh:datatype / sh:nodeKind / sh:pattern. The reference's ecosystem
  * validates generated ifcOWL against shape graphs with single-node
  * engines (TopBraid/Jena); here each constraint compiles to one keyed
  * join/aggregate and the validation REPORT is a DataFrame (one row per
  * violation, SHACL results-vocabulary-shaped columns).
  *
  * 100-TB posture: the focus-node set of each shape is one pushed-down
  * scan filter (pred = rdf:type AND obj = targetClass); cardinality
  * constraints are a (doc_id, focus)-keyed LEFT join + map-side-combinable
  * count; value constraints are per-row predicates on the joined value
  * frame — no window, no sort, no driver loop over data (the loop below is
  * over the SHAPE list, which is configuration, not data). Constraints on
  * the same path share the one value-frame join through Catalyst's
  * ReusedExchange.
  */
object Shacl {

  /** one property shape: constraints on the values of `path` at each focus */
  final case class PropShape(path: String,
      minCount: Option[Long] = None, maxCount: Option[Long] = None,
      datatype: Option[String] = None, nodeKind: Option[String] = None,
      pattern: Option[String] = None)

  /** one node shape: class-targeted (sh:targetClass) */
  final case class NodeShape(id: String, targetClass: String, props: Seq[PropShape])

  /** Validation report: (doc_id, focus, shape, path, constraint, detail) —
    * one row per violation; an empty frame means the store conforms.
    * `store` needs (doc_id, subj, pred, obj, obj_kind, obj_datatype). */
  def validate(store: DataFrame, shapes: Seq[NodeShape]): DataFrame = {
    val t = store.select(col("doc_id"), col("subj"), col("pred"), col("obj"),
      col("obj_kind"), col("obj_datatype"))

    def report(shape: String, path: String, constraint: String,
        focus: Column, detail: Column): Seq[Column] =
      Seq(col("doc_id"), focus.as("focus"), lit(shape).as("shape"),
        lit(path).as("path"), lit(constraint).as("constraint"), detail.as("detail"))

    val perShape = shapes.flatMap { ns =>
      val focus = t.filter(col("pred") === KgQuery.RdfType && col("obj") === ns.targetClass)
        .select(col("doc_id"), col("subj").as("focus")).distinct()
      ns.props.flatMap { p =>
        val vals = t.filter(col("pred") === p.path)
          .select(col("doc_id"), col("subj").as("focus"),
            col("obj"), col("obj_kind"), col("obj_datatype"))
        val withVals = focus.join(vals, Seq("doc_id", "focus"))
        val counts = focus.join(vals, Seq("doc_id", "focus"), "left")
          .groupBy(col("doc_id"), col("focus"))
          .agg(count(col("obj")).as("n"))
        val cardinality = Seq(
          p.minCount.map(m => counts.filter(col("n") < m)
            .select(report(ns.id, p.path, "minCount", col("focus"),
              col("n").cast("string")): _*)),
          p.maxCount.map(m => counts.filter(col("n") > m)
            .select(report(ns.id, p.path, "maxCount", col("focus"),
              col("n").cast("string")): _*))).flatten
        val valueLevel = Seq(
          p.datatype.map(dt => withVals.filter(col("obj_datatype") =!= dt)
            .select(report(ns.id, p.path, "datatype", col("focus"), col("obj")): _*)),
          p.nodeKind.map(nk => withVals.filter(col("obj_kind") =!= nk)
            .select(report(ns.id, p.path, "nodeKind", col("focus"), col("obj")): _*)),
          p.pattern.map(rx => withVals.filter(!col("obj").rlike(rx))
            .select(report(ns.id, p.path, "pattern", col("focus"), col("obj")): _*))).flatten
        cardinality ++ valueLevel
      }
    }
    require(perShape.nonEmpty, "Shacl.validate: no constraints in the shape graph")
    perShape.reduce(_ unionByName _)
  }
}
