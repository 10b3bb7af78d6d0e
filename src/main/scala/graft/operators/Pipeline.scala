package graft.operators

import graft.model._
import graft.schema.SchemaDict
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end four-stage KG-construction job (SURVEY.md §3.4):
  * Stage A tokenize (narrow flatMap) → Stage B link (the one wide join) →
  * Stage C canonicalize+materialize candidates (narrow flatMap) → Stage D
  * relational finishing: per-document aborts, *ERROR 2* truncation,
  * literal-wrapper canonical typing (E6), global rdf:type dedup (E9), header
  * triples, and the final dropDuplicates.
  */
object Pipeline {

  /** Stage C emission wrapper row (a union of triple and marker). */
  final case class Emitted(t: Option[TripleRow], m: Option[Marker])

  final case class Result(triples: DataFrame, markers: Dataset[Marker])

  val OWL_ONTOLOGY: String = Emitter.OWL_NS + "Ontology"
  val OWL_IMPORTS: String = Emitter.OWL_NS + "imports"

  def run(docs: Dataset[Doc], baseURI: String, removeDuplicates: Boolean = false,
          salt: Int = 8)(implicit spark: SparkSession): Result = {
    import spark.implicits._

    // ---- Stage A ----
    val stmts = Tokenizer.stmts(docs)

    // ---- Stage B ----
    val Linker.LinkResult(linked, linkMarkers) = Linker.link(stmts, removeDuplicates, salt)

    // ---- Stage C ---- narrow; dictionaries load from the executor classpath
    val base = baseURI
    val emitted: Dataset[Emitted] = linked.mapPartitions { it =>
      val emitters = scala.collection.mutable.HashMap[String, Emitter]()
      it.flatMap { ls0 =>
        val ls = if (ls0.targets == null) ls0.copy(targets = Nil) else ls0
        if (ls.schema.isEmpty || !SchemaDict.available(ls.schema)) {
          Iterator.single(Emitted(None, Some(Marker(ls.doc_id, "unsupported_schema", ls.line_id, ls.schema))))
        } else {
          val em = emitters.getOrElseUpdate(ls.schema, new Emitter(SchemaDict.load(ls.schema), base))
          val (ts, ms) = em.emit(ls)
          ts.iterator.map(t => Emitted(Some(t), None)) ++ ms.iterator.map(m => Emitted(None, Some(m)))
        }
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)

    val tripleRows = emitted.flatMap(_.t)
    val markers = emitted.flatMap(_.m).union(linkMarkers).persist(StorageLevel.MEMORY_AND_DISK)

    // ---- Stage D ----
    // per-document aborts: dangling refs (ERROR 6/7/8 — the file sink flushes
    // nothing, goldens test6/test15 are empty) and reference-crash paths
    val aborts = markers
      .filter(m => m.kind == "dangling_ref" || m.kind == "crash" || m.kind == "unsupported_schema")
      .toDF.select($"doc_id").distinct()

    // ERROR 2 truncation: all statements at/after the first unknown keyword
    // (in ascending line order — see SURVEY.md §7.4.4) emit nothing
    val err2 = markers.filter(_.kind == "unknown_entity").toDF
      .groupBy($"doc_id").agg(min($"line_id").as("bad_line"))

    // header triples (RDFWriter.java:121-122): emitted before parsing, so they
    // survive ERROR 2 but not the file-sink abort
    val docSchemas = docs.map(d => (d.doc_id, Tokenizer.sniffSchema(Tokenizer.assembleText(d))))
      .toDF("doc_id", "schema")
      .filter($"schema" =!= "")
    val headers = docSchemas
      .withColumn("ontns", schemaOntNsCol($"schema"))
      .filter($"ontns".isNotNull)
      .select($"doc_id", $"ontns")
      .flatMap { r =>
        val doc = r.getString(0); val ontns = r.getString(1)
        Seq(
          TripleRow(doc, base, Emitter.RDF_TYPE, OWL_ONTOLOGY, "iri", "", -1L, -1, "", wsel = false),
          TripleRow(doc, base, OWL_IMPORTS, ontns, "iri", "", -1L, -1, "", wsel = false))
      }.toDF

    val all = tripleRows.toDF.unionByName(headers)
      .join(aborts.withColumnRenamed("doc_id", "abort_doc"),
        $"doc_id" === $"abort_doc", "left_anti")
      .join(err2, Seq("doc_id"), "left")
      .filter($"bad_line".isNull || $"src_line" < $"bad_line")
      .drop("bad_line")

    // E6 canonical wrapper typing: of the per-use candidate rdf:type rows of a
    // shared literal wrapper, keep the first in document order (the
    // reference's propertyResourceMap keeps the first-minted resource,
    // RDFWriter.java:807-819)
    val wWrap = Window.partitionBy($"doc_id", $"subj", $"wsel").orderBy($"src_line", $"slot", $"obj")
    val canonical = all
      .withColumn("wrn", when($"wsel", row_number().over(wWrap)).otherwise(lit(1)))
      .filter($"wrn" === 1)
      .drop("wrn", "wkey", "wsel")

    // E9 global dedup (resourceMap/type triples; RDF graphs are triple sets)
    val finalTriples = canonical
      .dropDuplicates("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")

    Result(finalTriples, markers)
  }

  /** schema version → ontology namespace (with '#'), as a Column expression. */
  private def schemaOntNsCol(schema: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.schema.DictGen.ontAlt
    val pairs = ontAlt.toSeq
    pairs.foldLeft(lit(null).cast("string")) { case (acc, (ver, alt)) =>
      when(schema === ver, lit("http://standards.buildingsmart.org/IFC/DEV/" + alt + "OWL#")).otherwise(acc)
    }
  }
}
