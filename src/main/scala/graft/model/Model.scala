package graft.model

/** Core row types of the pipeline. All are Catalyst-encodable case classes
  * (fixed-depth nesting; Catalyst has no recursive types, and observed IFC-SPF
  * nesting is bounded at three list levels — deeper input is flagged, matching
  * the reference's *ERROR 19* behavior, RDFWriter.java:478).
  */

/** One interleaved span of a document (BASELINE.json input_hint). */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** Input row: a whole interleaved document. */
final case class Doc(doc_id: String, spans: Seq[Span])

/** Token kinds:
  *  "S" — string/scalar token (verbatim, as the reference's parser produces it:
  *        leading quote kept, closing quote dropped, '' collapsed to ',
  *        trimmed; IfcSpfParser.java:96-137)
  *  "R" — entity reference `#n` (resolvable at depths 0..2 only, mirroring
  *        IfcSpfParser.mapEntries which rewrites exactly three levels,
  *        IfcSpfParser.java:167-259)
  *  "L" — nested list
  *  "X" — over-deep list (depth > 3), contents dropped
  */
final case class Tok3(k: String, v: String)
final case class Tok2(k: String, v: String, sub: Seq[Tok3])
final case class Tok1(k: String, v: String, sub: Seq[Tok2])
final case class Tok0(k: String, v: String, sub: Seq[Tok1])

/** One parsed `#id = KEYWORD(...)` statement (flat hot-path row).
  * seq is the parse ordinal within the doc (used to replicate the reference's
  * last-write-wins linemap semantics for duplicated line numbers,
  * IfcSpfParser.java:143). body is everything after '=', the dedup key
  * (fullLineAfterNum, IfcSpfParser.java:62). refs collects all R-token ids.
  * The nested token tree is deliberately NOT part of this row — it is derived
  * deterministically from body wherever needed (Stage C re-tokenizes; the
  * structured view is available as [[TokStmt]] via Tokenizer.tokenTable).
  */
final case class Stmt(
    doc_id: String,
    schema: String,
    seq: Long,
    line_id: Long,
    keyword: String,
    body: String,
    refs: Seq[Long],
    /** whole-document abort (dangling ref / unsupported schema), decided
      * locally in Stage A — a document is one input row, so *ERROR 6/7/8*
      * is a per-row fact, not a join result */
    abort: Boolean,
    /** first line with an unknown keyword (*ERROR 2* truncation point), or -1 */
    bad_line: Long)

/** Structured candidate-mention row: the statement plus its full fixed-depth
  * token tree (the "flattened pre-order token table" view of SURVEY.md §1.2). */
final case class TokStmt(
    doc_id: String,
    schema: String,
    line_id: Long,
    keyword: String,
    args: Seq[Tok0])

/** Resolved reference target (Stage B join output). */
final case class RefTarget(ref: Long, line: Long, keyword: String)

/** Stmt + resolved intra-document references. The token tree is NOT carried
  * across the join — only the flat `body` string moves through the shuffle
  * (≈60% smaller rows, no nested-struct encoder work); Stage C re-tokenizes
  * locally, which costs ~5μs/statement. */
final case class LinkedStmt(
    doc_id: String,
    schema: String,
    line_id: Long,
    keyword: String,
    body: String,
    abort: Boolean,
    bad_line: Long,
    targets: Seq[RefTarget])

/** One emitted RDF triple (or candidate; Stage D filters/dedups).
  * FULLY dictionary-encoded for the Stage-D shuffle (the pipeline's one wide
  * edge): pred_id is the global predicate id (schema.PredIds — the
  * predicate vocabulary is a static function of the compiled dictionaries),
  * kd packs obj_kind + obj_datatype (-1 marker / 0 iri / 1+dtIdx literal,
  * PredIds.kdOf).
  *
  * Subject and object each travel as a (tag, long) pair — see [[TripleRow$]]
  * for the tag codes — so the common instance-IRI forms
  * (`<CamelName>_<line>` and the content-hash `n<hex16>` mints) cross the
  * wire as fixed-width longs instead of strings; so_tag packs both tags
  * (subjTag * 8 + objTag). The string columns carry only what cannot encode:
  * `subj` holds Raw subject locals (and the marker kind on marker rows),
  * `obj` holds literal lexical forms, absolute IRIs (AbsIriKd) and Raw
  * object locals. All IRIs are restored after the fused aggregate via
  * broadcast dimensions; the reference's typed-literal emission is
  * RDFWriter.java:674-704.
  * wcls: >= 0 marks the per-use candidate rdf:type row of a literal wrapper
  * (E6, RDFWriter.java:807-819) and carries the global class id of its obj
  * (schema.ClassIds); Stage D keeps the first candidate per (doc_id, subj)
  * in (src_line, slot, class) order inside a single-long hash aggregate.
  * -1 for all other rows. */
final case class TripleRow(
    doc_id: String,
    subj: String,
    pred_id: Int,
    obj: String,
    so_tag: Int,
    subj_val: Long,
    obj_val: Long,
    kd: Int,
    src_line: Long,
    slot: Int,
    wcls: Int)

/** Subject/object encoding tags of [[TripleRow]] (so_tag = subjTag * 8 +
  * objTag). `Named` packs (VocabIds id of the instance's ontology-class IRI,
  * line) into one long — valid only for 0 <= line < 2^40 and id < 2^23, both
  * far beyond the compiled universes; anything else ships Raw. `Mint` carries
  * the 64-bit FNV content hash whose local form is `n` + unsigned hex. */
object TripleRow {
  /** payload in the string column (subj/obj local, literal lexical, abs IRI) */
  val Raw = 0
  /** val = (VocabIds id of ontNS#Name) << LineBits | line — local `Name_line` */
  val Named = 1
  /** val = 64-bit FNV-1a content hash — local `n<hex>` */
  val Mint = 2
  /** subject only: the baseURI itself (header triples) */
  val Base = 3
  /** object only: val = VocabIds id of a static-vocabulary IRI */
  val Vocab = 4
  val LineBits = 40
  val LineMask: Long = (1L << LineBits) - 1
  @inline def tag(subjTag: Int, objTag: Int): Int = subjTag * 8 + objTag
}

/** Final output row of the pipeline (Stage D), lineage columns included. */
final case class FinalTriple(
    doc_id: String,
    subj: String,
    pred: String,
    obj: String,
    obj_kind: String,
    obj_datatype: String,
    src_line: Long,
    slot: Int)

/** Non-triple outcomes: per-doc aborts, per-line truncations, skipped slots.
  * kind ∈ {"dangling_ref", "unknown_entity", "enum_miss", "attr_overflow",
  *         "unsupported_schema", "oversize_doc", "warn"} — mirroring the
  * reference's ERROR 6/7/8 (doc abort), ERROR 2 (truncate), ERROR 9, ERROR 4,
  * plus the mega-doc size guard (Tokenizer.DefaultMaxDocChars).
  */
final case class Marker(doc_id: String, kind: String, line_id: Long, detail: String)

/** Per-partition lineage/metrics row (north rule). */
final case class LineageRow(stage: String, partition_id: Int, rows_in: Long,
    rows_out: Long, errors: Long, wall_ms: Long)
