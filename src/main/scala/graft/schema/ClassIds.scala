package graft.schema

/** Global integer ids for every ontology class IRI across the compiled
  * schema dictionaries. Lets Stage D's fused dedup/canonicalization
  * aggregate carry the candidate wrapper class inside a single LONG buffer
  * (HashAggregate-able) instead of a struct/string (which would demote the
  * aggregate to SortAggregate — two full sorts of the triple stream).
  * Deterministic: ids are ranks in the sorted IRI universe.
  */
object ClassIds {

  lazy val (iriToId: Map[String, Int], idToIri: Array[String]) = {
    val iris = DictGen.ontAlt.keys.filter(SchemaDict.available).toSeq.sorted.flatMap { v =>
      val d = SchemaDict.load(v)
      d.classes.keysIterator.map(d.classIri).toSeq
    }.distinct.sorted
    require(iris.size < 16384, s"class-id space overflow: ${iris.size}")
    (iris.zipWithIndex.toMap, iris.toArray)
  }

  def id(iri: String): Int = iriToId.getOrElse(iri, 0)
}
