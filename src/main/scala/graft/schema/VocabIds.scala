package graft.schema

/** Global integer ids for every STATIC-vocabulary IRI that can appear in a
  * triple's object position: ontology class IRIs, enum individuals,
  * express:TRUE/FALSE/UNKNOWN, owl:Ontology, and the per-schema ontology
  * namespaces themselves (the owl:imports object). Everything else in the
  * object position is either instance-space (minted under the run's baseURI
  * — shipped as a baseURI-relative local name) or a literal lexical form.
  *
  * Together with [[PredIds]] this completes the Stage-C→D dictionary
  * encoding: candidate rows cross the pipeline's one wide shuffle with NO
  * redundant namespace bytes — vocab objects as a 4-byte id, instance IRIs
  * as their local suffix — and the full IRIs are restored after the fused
  * aggregate from broadcast dimensions. Deterministic: ids are ranks in the
  * sorted IRI universe.
  */
object VocabIds {

  import SchemaDict._

  lazy val (iriToId: Map[String, Int], idToIri: Array[String]) = {
    val dicts = DictGen.ontAlt.keys.filter(SchemaDict.available).toSeq.sorted
      .map(SchemaDict.load)
    val fixed = Seq(
      EXPRESS_NS + "TRUE", EXPRESS_NS + "FALSE", EXPRESS_NS + "UNKNOWN",
      OWL_NS + "Ontology")
    val classIris = dicts.flatMap(d => d.classes.keysIterator.map(d.classIri))
    // entity/type names qualified per schema (rdf:type objects minted as
    // ontNS + name at several Emitter sites; overcomplete vs classIris is fine)
    val namedIris = dicts.flatMap(d =>
      d.entities.valuesIterator.map(e => d.ontNS + e.name) ++
        d.types.valuesIterator.map(t => d.ontNS + t.name))
    val enumIris = dicts.flatMap(d =>
      d.enumLabels.valuesIterator.flatMap(_.valuesIterator).map(d.ontNS + _))
    val nsIris = dicts.map(_.ontNS)
    val iris = (fixed ++ classIris ++ namedIris ++ enumIris ++ nsIris).distinct.sorted
    (iris.zipWithIndex.toMap, iris.toArray)
  }

  /** Loud on miss: an unmapped vocab object is a universe-derivation bug. */
  def id(iri: String): Int = iriToId.getOrElse(iri,
    throw new IllegalStateException(s"object IRI not in VocabIds universe: $iri"))
}
