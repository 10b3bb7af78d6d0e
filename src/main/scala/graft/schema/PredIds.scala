package graft.schema

/** Global integer ids for every predicate IRI the emitter can mint, plus the
  * (tiny, closed) literal-datatype universe — the dictionary encoding that
  * lets Stage C→D rows carry `pred_id: Int` + `kd: Int` instead of three
  * strings (`pred`, `obj_kind`, `obj_datatype`).
  *
  * Why: the Stage-D fused dedup aggregate is the pipeline's one wide edge;
  * every candidate triple crosses the shuffle with its full group key. A
  * predicate IRI is 50–90 bytes and drawn from a vocabulary that is a static
  * function of the compiled schema dictionaries (attribute properties,
  * express:hasX value properties, rdf:type, owl:imports, list:hasContents/
  * hasNext — see Emitter's tri() call sites); shipping a 4-byte id instead
  * cuts shuffle bytes and group-key hashing on 10^12-doc runs, and the IRI
  * is restored after the aggregate through a small broadcast dimension
  * (same pattern as [[ClassIds]]).
  *
  * Deterministic: ids are ranks in the sorted IRI universe.
  */
object PredIds {

  import SchemaDict._

  lazy val (iriToId: Map[String, Int], idToIri: Array[String]) = {
    val dicts = DictGen.ontAlt.keys.filter(SchemaDict.available).toSeq.sorted
      .map(SchemaDict.load)
    val fixed = Seq(
      RDF_TYPE,
      OWL_NS + "imports",
      LIST_NS + "hasContents",
      LIST_NS + "hasNext")
    // express:hasX value properties — X ranges over the dictionaries' literal
    // xsd kinds (wrapperFor builds EXPRESS_NS + "has" + capitalized(xsd))
    val valueProps = dicts.flatMap(_.classes.valuesIterator.map(_.xsd))
      .filter(_.nonEmpty).distinct
      .map(x => EXPRESS_NS + "has" + x.substring(0, 1).toUpperCase + x.substring(1))
    // attribute properties, fully qualified per schema ontology namespace
    val attrProps = dicts.flatMap(d =>
      d.entities.valuesIterator.flatMap(_.attrs.iterator.map(a => d.ontNS + a.prop)))
    val iris = (fixed ++ valueProps ++ attrProps).distinct.sorted
    (iris.zipWithIndex.toMap, iris.toArray)
  }

  /** Loud on miss: an unmapped predicate is a universe-derivation bug, not a
    * data condition (every tri() pred is built from the same dict facts). */
  def id(iri: String): Int = iriToId.getOrElse(iri,
    throw new IllegalStateException(s"predicate not in PredIds universe: $iri"))

  // ---- kd: obj_kind + obj_datatype in one small int -------------------------
  // kd = -1           -> marker row (never reaches Stage D)
  // kd = 0            -> obj is an IRI (datatype "")
  // kd = 1 + dtIndex  -> obj is a literal with Datatypes(dtIndex)

  val MarkerKd: Int = -1
  val IriKd: Int = 0

  /** Closed literal-datatype universe (Emitter's addLiteralToResource arms;
    * index 0 = plain literal, kept for synthetic/battery inputs). */
  val Datatypes: Array[String] = Array(
    "",
    XSD_NS + "string",
    XSD_NS + "integer",
    XSD_NS + "double",
    XSD_NS + "hexBinary",
    XSD_NS + "boolean")

  /** obj is a FULL absolute IRI shipped verbatim (outside the VocabIds
    * universe and not instance-space, e.g. a urn: or an unknown http IRI
    * in caller-built frames) — restored as-is, no baseURI prefix.
    * (Defined after Datatypes: a forward reference here reads null.) */
  val AbsIriKd: Int = Datatypes.length + 1

  private val dtToIdx: Map[String, Int] = Datatypes.zipWithIndex.toMap

  def kdOf(kind: String, dt: String): Int = kind match {
    case "iri"    => IriKd
    case "marker" => MarkerKd
    case _ => 1 + dtToIdx.getOrElse(dt,
      throw new IllegalStateException(s"datatype not in PredIds universe: $dt"))
  }
}
