package graft.operators

import graft.model._
import graft.schema.{AttrSlot, SchemaDict, TypeDef}

import scala.collection.mutable.ArrayBuffer

/** Stage C — canonicalization + triple materialization (SURVEY.md §2 E1-E9,
  * L1-L9). One linked statement in, a deterministic set of candidate triples
  * and markers out. Pure local computation (narrow stage): every global
  * concern — literal-wrapper sharing (E6), rdf:type dedup (E9), per-document
  * aborts and truncation — is deferred to the relational Stage D.
  *
  * Semantics follow be.ugent.RDFWriter (createInstances :147-176,
  * fillProperties :180-245, fillPropertiesHandleStringObject :251-300,
  * fillPropertiesHandleIfcObject :302-321, fillPropertiesHandleListObject
  * :323-557 and the list helpers :634-980), re-expressed as a fresh
  * implementation with content-hash skolemization replacing the reference's
  * HashMap-iteration-order-dependent idCounter (see SURVEY.md §7.4.1 — the
  * reference's own test judges by graph isomorphism, so counter values are not
  * part of the contract).
  */
final class Emitter(dict: SchemaDict, baseURI: String,
                    /** reference graph-API parity (parseModelToGraph keeps the
                      * 2 ontology header triples even when reference resolution
                      * fails, RDFWriter.java:121-132); default false = the file
                      * sink's flush-nothing abort (goldens test6/test15) */
                    headerOnAbort: Boolean = false) extends Serializable {
  import SchemaDict.{EXPRESS_NS, LIST_NS, formatClassName}
  import Emitter._

  private val ontNS = dict.ontNS
  private val HAS_CONTENTS = LIST_NS + "hasContents"
  private val HAS_NEXT = LIST_NS + "hasNext"

  /** Per-schema dictionary-encoding cache (shared per JVM): every predicate
    * and static-vocabulary object the emitter can produce is a static
    * function of the dictionary, so the int ids are resolved ONCE here
    * instead of per triple (the old path built `ontNS + prop` / `classIri`
    * strings and hashed them through PredIds/VocabIds maps on every tri()
    * call — measured as a top allocation + hashing cost of the Stage-C
    * profile at 26M triples). */
  private val ids = Emitter.idCache(dict)

  def classIri(key: String): String = dict.classIri(key)

  // ---------------------------------------------------------------- helpers

  /** Allocation-free char strip: most literals contain none of the stripped
    * chars, so return the SAME string unless something must go (String
    * .filterNot boxes every char — Function1 is not specialized on Char —
    * and always allocates; this is a Stage-C per-literal hot path). */
  private def strip(s: String, b1: Char, b2: Char): String = {
    var i = 0
    val n = s.length
    while (i < n && { val c = s.charAt(i); c != b1 && c != b2 }) i += 1
    if (i == n) return s
    val sb = new java.lang.StringBuilder(n - 1)
    sb.append(s, 0, i)
    i += 1
    while (i < n) { val c = s.charAt(i); if (c != b1 && c != b2) sb.append(c); i += 1 }
    sb.toString
  }
  /** strip quote and '=' characters (reference RDFWriter.filterExtras :983-997) */
  private def filterExtras(s: String): String = strip(s, '\'', '=')
  /** strip '.' (reference RDFWriter.filterPoints :999-1011) */
  private def filterPoints(s: String): String = strip(s, '.', '.')

  /** Content-hash IRI for a synthesized intermediate — returned as the
    * baseURI-relative LOCAL name (TripleRow ships locals across the Stage-D
    * shuffle; the prefix is restored post-aggregate). The hash input never
    * included baseURI, so minted names are unchanged.
    *
    * This is the CANONICAL definition; the hot path uses the incremental
    * equivalents (mint3/mint4/mintW in the companion, pinned byte-identical
    * by MintHashSpec) that skip the concat + getBytes per call. */
  private[operators] def mint(docId: String, parts: String): String =
    "n" + java.lang.Long.toUnsignedString(fnv64(docId + "\u0000" + parts), 16)

  // ---------------------------------------------------------------- emit

  def emit(ls: LinkedStmt): (Seq[TripleRow], Seq[Marker]) = emit(ls, null)

  /** `preArgs`: pre-parsed top-level nodes from the fused single-parse path
    * (identical to `parseArgs(ls.body)._2` — Tokenizer builds both from one
    * automaton); null → parse here (staged Stage C, re-parse fallback). */
  def emit(ls: LinkedStmt,
           preArgs: scala.collection.Seq[Tokenizer.Node]): (Seq[TripleRow], Seq[Marker]) = {
    val buf = new Emitter.RowBuffer
    val ms = emitInto(ls, preArgs, buf)
    (buf.rows.toSeq, ms)
  }

  /** Sink form (round 6): candidate rows stream straight into `sink` — the
    * fused path's DocDedup consumes the 11 fields without ever allocating a
    * [[TripleRow]] (one short-lived object per candidate at ~13 rows per
    * statement was a measured slice of the per-doc loop); the staged path
    * collects through [[Emitter.RowBuffer]], restoring the old (rows,
    * markers) pair byte-for-byte. Returns the statement's markers. */
  def emitInto(ls: LinkedStmt, preArgs: scala.collection.Seq[Tokenizer.Node],
               sink: Emitter.TripleSink): Seq[Marker] = {
    // per-document abort (dangling ref / unsupported schema, decided in
    // Stage A): nothing is emitted for the document at all — the reference's
    // file sink flushes nothing (goldens test6/test15); the sentinel carries
    // a single diagnostic marker
    if (ls.abort) {
      return if (ls.keyword == Tokenizer.DocSentinel) {
        val parts = ls.body.split(":", 2)
        // graph-API parity option: the reference's parseModelToGraph has
        // already emitted the 2 ontology header triples when D2 fails
        // (RDFWriter.java:121-132), unlike its file sink which flushes nothing
        if (headerOnAbort) headerTriplesInto(ls.doc_id, sink)
        Seq(Marker(ls.doc_id, parts(0), -1L, if (parts.length > 1) parts(1) else ""))
      } else Nil
    }
    // *ERROR 2* truncation: statements at/after the first unknown keyword
    // emit nothing (headers at line -1 survive)
    if (ls.bad_line >= 0 && ls.line_id >= ls.bad_line) {
      return if (ls.line_id == ls.bad_line)
        Seq(Marker(ls.doc_id, "unknown_entity", ls.line_id, ls.keyword))
      else Nil
    }
    // re-tokenize the flat body locally (the token tree is deliberately not
    // shuffled through Stage B; see LinkedStmt). The emitter walks the
    // parser's mutable Node tree DIRECTLY — converting it to the immutable
    // Tok0..Tok3 encoding copied the whole tree per statement (measured in
    // the Stage-C profile); the Tok view remains for tokenTable / tests.
    val st =
      if (ls.keyword == Tokenizer.DocSentinel) EmitStmt(ls, Nil)
      else if (preArgs != null) EmitStmt(ls, preArgs)
      else EmitStmt(ls, Tokenizer.parseArgs(ls.body)._2)
    emitTokens(st, sink)
  }

  /** the 2 per-document ontology header triples (RDFWriter.java:121-122);
    * subject tag Base = the baseURI itself after prefix restoration */
  private def headerTriplesInto(doc: String, sink: Emitter.TripleSink): Unit = {
    val bt = TripleRow.tag(TripleRow.Base, TripleRow.Vocab)
    sink.add(doc, "", ids.rdfTypeId, "", bt, -1L, ids.owlOntologyVid, graft.schema.PredIds.IriKd, -1L, -1, -1)
    sink.add(doc, "", ids.owlImportsId, "", bt, -1L, ids.ontNSVid, graft.schema.PredIds.IriKd, -1L, -1, -1)
  }

  private final case class EmitStmt(ls: LinkedStmt, args: scala.collection.Seq[Tokenizer.Node]) {
    def doc_id: String = ls.doc_id
    def line_id: Long = ls.line_id
    def keyword: String = ls.keyword
    def targets: Seq[RefTarget] = ls.targets
  }

  private def emitTokens(st: EmitStmt, sink: Emitter.TripleSink): Seq[Marker] = {
    var markers: ArrayBuffer[Marker] = null // lazily allocated — most statements mark nothing
    val doc = st.doc_id
    val line = st.line_id
    val IriKd = graft.schema.PredIds.IriKd
    // doc prefix of every mint hash, computed once per statement
    val mintBase = mintBaseOf(doc)

    import TripleRow.{Base => TBase, Mint => TMint, Named => TNamed, Raw => TRaw, Vocab => TVocab}

    // ---- fully-encoded row builders: subjects and objects travel as
    // (tag, long) pairs — the common instance forms (<Name>_<line>, minted
    // n<hex>) never materialize as strings in Stage C at all; the Stage-D
    // decode restores them after the wide edge.

    /** append one row; subject and object pre-encoded by the caller */
    def row(stg: Int, sv: Long, sraw: String, predId: Int, otg: Int, ov: Long,
            oraw: String, okd: Int, slot: Int, wcls: Int): Unit =
      sink.add(doc, sraw, predId, oraw, TripleRow.tag(stg, otg), sv, ov, okd, line, slot, wcls)

    /** generic fallback for predicates/objects outside the id caches. An
      * ABSOLUTE IRI object outside the compiled VocabIds universe (or a
      * urn:-shaped one — the same schemes Turtle.parseIriRef recognizes) is
      * shipped whole under AbsIriKd and restored verbatim — a data
      * condition, not a task-aborting bug (one odd IRI must not kill a
      * 10^12-doc job, and it must NOT be corrupted into baseURI +
      * "urn:..."). */
    def gen(stg: Int, sv: Long, sraw: String, pred: String, obj: String,
            kind: String, dt: String, slot: Int, wcls: Int = -1): Unit = {
      val absolute = kind == "iri" && (obj.startsWith("http") || obj.startsWith("urn:"))
      val vid = if (absolute) graft.schema.VocabIds.iriToId.get(obj) else None
      val kd =
        if (absolute && vid.isEmpty) graft.schema.PredIds.AbsIriKd
        else graft.schema.PredIds.kdOf(kind, dt)
      if (vid.isDefined)
        row(stg, sv, sraw, graft.schema.PredIds.id(pred), TVocab, vid.get.toLong, "", kd, slot, wcls)
      else
        row(stg, sv, sraw, graft.schema.PredIds.id(pred), TRaw, -1L, obj, kd, slot, wcls)
    }

    /** does (vid, ln) pack into one Named long? (ln < 2^40; ids are small) */
    @inline def inR(ln: Long): Boolean = ln >= 0 && ln < (1L << TripleRow.LineBits)
    @inline def pk(vid: Integer, ln: Long): Long = (vid.longValue << TripleRow.LineBits) | ln

    /** rdf:type row for instance (nm, ln): subj nm_ln, obj ontNS#nm */
    def typeRow(nm: String, ln: Long, slot: Int): Unit = {
      val vid = ids.localVid.get(nm)
      if (vid == null) gen(TRaw, -1L, nm + "_" + ln, RDF_TYPE, ontNS + nm, "iri", "", slot)
      else if (inR(ln)) row(TNamed, pk(vid, ln), "", ids.rdfTypeId, TVocab, vid.longValue, "", IriKd, slot, -1)
      else row(TRaw, -1L, nm + "_" + ln, ids.rdfTypeId, TVocab, vid.longValue, "", IriKd, slot, -1)
    }

    /** rdf:type row for a MINTED subject with a dict local-name object
      * (typed-run heads, RDFWriter.java:431) */
    def mintTypeRow(h: Long, local: String, slot: Int): Unit = {
      val vid = ids.localVid.get(local)
      if (vid != null) row(TMint, h, "", ids.rdfTypeId, TVocab, vid.longValue, "", IriKd, slot, -1)
      else gen(TMint, h, "", RDF_TYPE, ontNS + local, "iri", "", slot)
    }

    /** rdf:type row for a MINTED subject with a class-key object (list cells) */
    def mintClassTypeRow(h: Long, rangeKey: String, slot: Int): Unit = {
      val t = ids.classVid.get(rangeKey)
      if (t != null) row(TMint, h, "", ids.rdfTypeId, TVocab, t._1.longValue, "", IriKd, slot, -1)
      else gen(TMint, h, "", RDF_TYPE, classIri(rangeKey), "iri", "", slot)
    }

    /** list:hasContents from a minted cell to an instance ref (nm, ln) */
    def contentsRef(cell: Long, nm: String, ln: Long, slot: Int): Unit = {
      val vid = ids.localVid.get(nm)
      if (vid != null && inR(ln)) row(TMint, cell, "", ids.hasContentsId, TNamed, pk(vid, ln), "", IriKd, slot, -1)
      else row(TMint, cell, "", ids.hasContentsId, TRaw, -1L, nm + "_" + ln, IriKd, slot, -1)
    }

    /** mint -> mint link (hasContents to wrappers, hasNext chains) */
    def mintLink(cell: Long, predId: Int, objH: Long, slot: Int): Unit =
      row(TMint, cell, "", predId, TMint, objH, "", IriKd, slot, -1)

    def mark(kind: String, detail: String): Unit = {
      if (markers == null) markers = new ArrayBuffer[Marker](4)
      markers += Marker(doc, kind, line, detail)
    }
    def markersOut: Seq[Marker] = if (markers == null) Nil else markers.toSeq

    if (st.keyword == Tokenizer.DocSentinel) {
      // per-document ontology header triples (RDFWriter.java:121-122) —
      // emitted before parsing in the reference, so they survive *ERROR 2*
      // truncation but (by default) not the dangling-ref file-sink abort
      headerTriplesInto(doc, sink)
      return markersOut
    }

    val kwKey = formatClassName(st.keyword)
    val entOpt = dict.entities.get(kwKey)
    val typOpt = dict.types.get(kwKey)
    if (entOpt.isEmpty && typOpt.isEmpty) {
      // unreachable: Stage A truncates documents at the first unknown keyword
      mark("unknown_entity", st.keyword)
      return markersOut
    }
    val typeName = entOpt.map(_.name).getOrElse(typOpt.get.name)
    // the statement subject (the reference's typeName_line local), encoded once
    val sjVid = ids.localVid.get(typeName)
    val (sjTag, sjVal, sjRaw) =
      if (sjVid != null && inR(line)) (TNamed, pk(sjVid, line), "")
      else (TRaw, -1L, typeName + "_" + line)
    typeRow(typeName, line, -1)

    // primitive-key lookup (round 6): the immutable Map boxed every Long ref
    // per statement on the fused hot path; LongMap keeps toMap's last-wins
    // duplicate semantics and the same Option-returning get
    val targets = new scala.collection.mutable.LongMap[RefTarget](
      math.max(8, st.targets.size))
    st.targets.foreach(t => if (t.keyword != null) targets.update(t.ref, t))

    // per-line mutable walk state (the reference's typeRemembrance field,
    // RDFWriter.java:178, reset per line at :195/:219)
    var remembrance: Option[TypeDef] = None
    var armCounter = 0

    /** attribute property row (ontNS + prop) from the statement subject */
    def propRow(propLocal: String, otg: Int, ov: Long, oraw: String, slot: Int): Unit = {
      val pid = ids.propPredId.get(propLocal)
      if (pid != null) row(sjTag, sjVal, sjRaw, pid.intValue, otg, ov, oraw, IriKd, slot, -1)
      else row(sjTag, sjVal, sjRaw, graft.schema.PredIds.id(ontNS + propLocal), otg, ov, oraw, IriKd, slot, -1)
    }
    /** prop row to an instance ref (nm, ln) */
    def propRef(propLocal: String, nm: String, ln: Long, slot: Int): Unit = {
      val vid = ids.localVid.get(nm)
      if (vid != null && inR(ln)) propRow(propLocal, TNamed, pk(vid, ln), "", slot)
      else propRow(propLocal, TRaw, -1L, nm + "_" + ln, slot)
    }
    /** prop row to a minted node */
    def propMint(propLocal: String, h: Long, slot: Int): Unit =
      propRow(propLocal, TMint, h, "", slot)

    // ------------------------------------------------------------ wrappers

    /** E6 literal-wrapper mint with doc-global sharing. The reference keys its
      * propertyResourceMap on (valueProp, xsdType, lexical) — NOT the range
      * class (RDFWriter.java:807) — so two ranges sharing a value share one
      * wrapper typed with the first-seen range; Stage D picks that canonical
      * rdf:type row. Returns the wrapper IRI.
      */
    def wrapperFor(rangeKey: String, xsd: String, lexical: String, slot: Int): Option[Long] = {
      val (valueProp, valuePredId) = ids.valueProp.get(xsd) match {
        case null => // not derivable from dict.classes xsd kinds — loud, like PredIds.id
          val iri = EXPRESS_NS + "has" + xsd.substring(0, 1).toUpperCase + xsd.substring(1)
          (iri, Integer.valueOf(graft.schema.PredIds.id(iri)))
        case t => t
      }
      // the reference's propertyResourceMap key (RDFWriter.java:807): the
      // range class is deliberately NOT part of it — wrappers are shared
      // across ranges with the same value property + lexical form
      val wiri = mintW(mintBase, valueProp, xsd, lexical)
      val cv = ids.classVid.get(rangeKey)
      if (cv != null) row(TMint, wiri, "", ids.rdfTypeId, TVocab, cv._1.longValue, "", IriKd, slot, cv._2)
      else gen(TMint, wiri, "", RDF_TYPE, classIri(rangeKey), "iri", "", slot,
        graft.schema.ClassIds.id(classIri(rangeKey)))
      def lit(lex: String, kd: Int): Unit = row(TMint, wiri, "", valuePredId, TRaw, -1L, lex, kd, slot, -1)
      def voc(vid: Int): Unit = row(TMint, wiri, "", valuePredId, TVocab, vid, "", IriKd, slot, -1)
      // addLiteralToResource (RDFWriter.java:674-704)
      xsd match {
        case "integer"   => lit(lexical, ids.kdInteger)
        case "double"    => lit(lexical, ids.kdDouble)
        case "hexBinary" => lit(lexical, ids.kdHexBinary)
        case "boolean" =>
          if (lexical.equalsIgnoreCase(".F.")) lit("false", ids.kdBoolean)
          else if (lexical.equalsIgnoreCase(".T.")) lit("true", ids.kdBoolean)
          else mark("warn", s"odd boolean: $lexical")
        case "logical" =>
          if (lexical.equalsIgnoreCase(".F.")) voc(ids.exprFalseVid)
          else if (lexical.equalsIgnoreCase(".T.")) voc(ids.exprTrueVid)
          else if (lexical.equalsIgnoreCase(".U.")) voc(ids.exprUnknownVid)
          else mark("warn", s"odd logical: $lexical")
        case _ => lit(lexical, ids.kdString)
      }
      Some(wiri)
    }

    /** createLiteralProperty (RDFWriter.java:799-827); subject is always the
      * statement subject. */
    def createLiteralProperty(propLocal: String, rangeKey: String,
                              lexical: String, slot: Int): Unit = {
      val xsd = dict.classInfo(rangeKey).xsd
      if (xsd.isEmpty) {
        // *ERROR 1*: no XSD type derivable for the range — triple skipped
        mark("warn", s"ERROR1 no xsd for $rangeKey")
      } else {
        wrapperFor(rangeKey, xsd, lexical, slot).foreach { wiri =>
          propMint(propLocal, wiri, slot)
        }
      }
    }

    /** addEnumProperty (RDFWriter.java:659-672): case-insensitive rdfs:label
      * match among the range's individuals; miss → *ERROR 9*, skip + continue. */
    def addEnum(propLocal: String, rangeKey: String, lit: String, slot: Int): Unit = {
      val lbl = filterPoints(lit).toUpperCase(java.util.Locale.ROOT)
      dict.enumLabels.get(rangeKey).flatMap(_.get(lbl)) match {
        case Some(local) =>
          val pid = ids.propPredId.get(propLocal)
          val vid = ids.localVid.get(local)
          if (pid != null && vid != null) row(sjTag, sjVal, sjRaw, pid.intValue, TVocab, vid.longValue, "", IriKd, slot, -1)
          else gen(sjTag, sjVal, sjRaw, ontNS + propLocal, ontNS + local, "iri", "", slot)
        case None => mark("enum_miss", s"$lit in ${dict.classLocal(rangeKey)}")
      }
    }

    /** addSinglePropertyFromTypeRemembrance (RDFWriter.java:634-657). */
    def addSingleFromRemembrance(propLocal: String, rem: TypeDef,
                                 lit: String, slot: Int): Unit = {
      val rangeKey = "i:" + rem.name
      val ci = dict.classInfo(rangeKey)
      if (ci.isEnum) addEnum(propLocal, rangeKey, lit, slot)
      else if (ci.isSelect) createLiteralProperty(propLocal, rangeKey, lit, slot)
      else if (ci.isList) mark("warn", "WARNING24 list range in single-from-remembrance")
      else createLiteralProperty(propLocal, rangeKey, lit, slot)
    }

    // ------------------------------------------------------------ lists

    /** addListInstanceProperties (RDFWriter.java:938-980): hasContents to
      * shared wrappers + hasNext chain over pre-minted cells. */
    def listInstanceProps(cells: IndexedSeq[Long], els: IndexedSeq[String],
                          contentKey: String, slot: Int): Unit = {
      val xsd = dict.classInfo(contentKey).xsd
      if (xsd.isEmpty) { mark("warn", s"ERROR5 no xsd for list content $contentKey"); return }
      var i = 0
      while (i < cells.length) {
        wrapperFor(contentKey, xsd, els(i), slot).foreach { wiri =>
          mintLink(cells(i), ids.hasContentsId, wiri, slot)
        }
        if (i < els.length - 1) mintLink(cells(i), ids.hasNextId, cells(i + 1), slot)
        i += 1
      }
    }

    /** Resolve a reference target to (CamelName, line): entity first, then
      * type (reference addClassInstanceListProperties fallback,
      * RDFWriter.java:907-926). None → the reference would NPE-crash. */
    def targetName(t: RefTarget): Option[String] = {
      val k = formatClassName(t.keyword)
      dict.entities.get(k).map(_.name).orElse(dict.types.get(k).map(_.name))
    }

    /** addDirectRegularListProperty (RDFWriter.java:707-761): head cell given,
      * extra cells minted, contents are literals (sw=0) or entity refs (sw=1). */
    def directRegularList(head: Long, rangeKey: String, contentKey: String,
                          litEls: IndexedSeq[String], refEls: IndexedSeq[RefTarget],
                          sw: Int, arm: Int, slot: Int): Unit = {
      if (contentKey.isEmpty) { mark("warn", "null listrange"); return }
      if (dict.classInfo(contentKey).isList) { mark("warn", "WARNING27 unhandled ListOfList"); return }
      val n = if (sw == 0) litEls.length else refEls.length
      val cells = (0 until n).map { i =>
        if (i == 0) head
        else {
          val c = mint4(mintBase, "dl", line, slot, arm, i)
          mintClassTypeRow(c, rangeKey, slot)
          c
        }
      }
      if (sw == 0) listInstanceProps(cells, litEls, contentKey, slot)
      else {
        var i = 0
        while (i < cells.length) {
          targetName(refEls(i)) match {
            case Some(nm) =>
              typeRow(nm, refEls(i).line, slot)
              contentsRef(cells(i), nm, refEls(i).line, slot)
            case None => mark("crash", s"list ref to unknown ${refEls(i).keyword}")
          }
          if (i < n - 1) mintLink(cells(i), ids.hasNextId, cells(i + 1), slot)
          i += 1
        }
      }
    }

    /** addRegularListProperty (RDFWriter.java:763-797): all cells minted,
      * first linked from the subject. */
    def regularList(attr: AttrSlot, els: IndexedSeq[String],
                    overrideRem: Option[TypeDef], slot: Int): Unit = {
      val rangeKey = attr.rangeKey
      val contentKey = overrideRem.map("i:" + _.name)
        .getOrElse(dict.classInfo(rangeKey).listContentKey)
      if (contentKey.isEmpty) { mark("warn", "ERROR14 unknown list content"); return }
      if (dict.classInfo(contentKey).isList) { mark("warn", "WARNING28 unhandled ListOfList"); return }
      val cells = els.indices.map { ii =>
        val c = mint4(mintBase, "rl", line, slot, armCounter, ii)
        mintClassTypeRow(c, rangeKey, slot)
        if (ii == 0) propMint(attr.prop, c, slot)
        c
      }
      armCounter += 1
      listInstanceProps(cells, els, contentKey, slot)
    }

    /** fillClassInstanceList + addClassInstanceListProperties
      * (RDFWriter.java:876-936): one cell per IFCVO member of the slot list. */
    def classInstanceList(attr: AttrSlot, members: IndexedSeq[RefTarget], slot: Int): Unit = {
      val rangeKey = attr.rangeKey
      val cells = members.indices.map { i =>
        val c = mint3(mintBase, "cl", line, slot, i)
        mintClassTypeRow(c, rangeKey, slot)
        if (i == 0) propMint(attr.prop, c, slot)
        c
      }
      var i = 0
      while (i < cells.length) {
        targetName(members(i)) match {
          case Some(nm) =>
            typeRow(nm, members(i).line, slot)
            contentsRef(cells(i), nm, members(i).line, slot)
          case None => mark("crash", s"list ref to unknown ${members(i).keyword}")
        }
        if (i < cells.length - 1) mintLink(cells(i), ids.hasNextId, cells(i + 1), slot)
        i += 1
      }
    }

    /** addListPropertyToGivenEntities (RDFWriter.java:829-874): outer
      * list-of-list chain over previously built inner-list heads. */
    def listPropertyToEntities(attr: AttrSlot, heads: IndexedSeq[Long], slot: Int): Unit = {
      val rangeKey = attr.rangeKey
      val content = dict.classInfo(rangeKey).listContentKey
      if (content.isEmpty) return // reference skips silently when no content type
      heads.indices.foreach { i =>
        val r2 = mint3(mintBase, "ol", line, slot, i)
        mintClassTypeRow(r2, rangeKey, slot)
        if (i == 0) propMint(attr.prop, r2, slot)
        mintLink(r2, ids.hasContentsId, heads(i), slot)
        if (i < heads.length - 1)
          mintLink(r2, ids.hasNextId, mint3(mintBase, "ol", line, slot, i + 1), slot)
      }
    }

    // ------------------------------------------------------------ slots

    /** fillPropertiesHandleStringObject (RDFWriter.java:251-300). */
    def handleString(evoAttrs: Vector[AttrSlot], v: String, ptr: Int): Int = {
      if (v == "$" || v == "*") return ptr + 1
      dict.types.get(formatClassName(v)) match {
        case Some(t) =>
          remembrance = Some(t) // wrapper keyword: value list follows in-slot
          ptr
        case None =>
          if (evoAttrs.size <= ptr) {
            // *ERROR 4*: more attributes than allowed; slot skipped
            mark("attr_overflow", v)
            return ptr + 1
          }
          val attr = evoAttrs(ptr)
          val lit = filterExtras(v)
          val ci = dict.classInfo(attr.rangeKey)
          if (attr.rangeKey.isEmpty) mark("warn", s"no range for ${attr.prop}")
          else if (ci.isEnum) addEnum(attr.prop, attr.rangeKey, lit, ptr)
          else if (ci.isSelect) createLiteralProperty(attr.prop, attr.rangeKey, lit, ptr) // *OK 25*
          else if (ci.isList) mark("warn", s"WARNING5 bare literal for LIST ${attr.prop}") // dropped
          else createLiteralProperty(attr.prop, attr.rangeKey, lit, ptr)
          ptr + 1
      }
    }

    /** fillPropertiesHandleIfcObject (RDFWriter.java:302-321). */
    def handleRef(evoAttrs: Vector[AttrSlot], refId: Long, ptr: Int): Int = {
      if (evoAttrs.size > ptr) {
        val attr = evoAttrs(ptr)
        targets.get(refId) match {
          case Some(t) =>
            dict.entities.get(formatClassName(t.keyword)) match {
              case Some(e) =>
                typeRow(e.name, t.line, ptr)
                propRef(attr.prop, e.name, t.line, ptr)
              case None =>
                // reference would NPE (ent.get(...).getName(), :306-309) → abort
                mark("crash", s"ref to non-entity ${t.keyword}")
            }
          case None => mark("crash", s"unresolved ref #$refId") // guarded upstream
        }
      } else mark("warn", "WARNING3 ref beyond attribute list")
      ptr + 1
    }

    /** fillPropertiesHandleListObject(evo) (RDFWriter.java:323-557). */
    def handleList(evoAttrs: Vector[AttrSlot], subIdx: scala.collection.Seq[Tokenizer.Node],
                   ptr: Int): Int = {
      import Tokenizer.{LNode, RNode, SNode}
      val literals = ArrayBuffer[String]()
      val ifcVOs = ArrayBuffer[RefTarget]()
      val listHeads = ArrayBuffer[Long]()
      var j = 0
      var break = false
      while (j < subIdx.length && !break) {
        subIdx(j) match {
          case SNode(v) =>
            dict.types.get(formatClassName(v)) match {
              case Some(t) if remembrance.isEmpty => remembrance = Some(t)
              case Some(t) =>
                if (remembrance.get.name != t.name)
                  mark("warn", "WARNING37 two types in one list")
              case None => literals += filterExtras(v)
            }
          case RNode(rid, _) =>
            if (evoAttrs.size > ptr) {
              val attr = evoAttrs(ptr)
              val ci = dict.classInfo(attr.rangeKey)
              if (ci.isList) {
                // EXPRESS LIST of entities: consume the whole slot list
                val inner = dict.classInfo(ci.listContentKey)
                if (inner.isList) mark("warn", "ERROR22 unexpected ListOfList")
                else {
                  val members = subIdx.collect { case RNode(rv, _) =>
                    targets.getOrElse(rv, RefTarget(rv, rv, ""))
                  }.toIndexedSeq
                  classInstanceList(attr, members, ptr)
                }
                break = true // reference: j = tmpList.size()-1 (RDFWriter.java:375)
              } else {
                // EXPRESS SET: one direct triple per member (RDFWriter.java:377-389)
                targets.get(rid).foreach { t =>
                  dict.entities.get(formatClassName(t.keyword)) match {
                    case Some(e) =>
                      typeRow(e.name, t.line, ptr)
                      propRef(attr.prop, e.name, t.line, ptr)
                    case None => mark("crash", s"set ref to non-entity ${t.keyword}")
                  }
                }
              }
            } else mark("warn", "WARNING13 list ref beyond attribute list")
          case l1: LNode =>
            val sub2 = l1.children
            if (remembrance.isDefined) {
              // typed-wrapper runs (RDFWriter.java:394-464, golden test19).
              // Depth-3 refs stay strings (the reference resolves exactly
              // three levels), so RNode at depth 3 contributes its raw form.
              sub2.foreach {
                case SNode(v2)   => literals += filterExtras(v2)
                case RNode(_, _) => mark("warn", "WARNING30 entity in typed list")
                case l2: LNode =>
                  l2.children.foreach {
                    case SNode(v3)     => literals += filterExtras(v3)
                    case RNode(_, raw) => literals += filterExtras(raw)
                    case _: LNode      => mark("warn", "WARNING31/35 over-deep content")
                  }
                  if (evoAttrs.size > ptr) {
                    val rem = remembrance.get
                    val head = mint3(mintBase, "run", line, ptr, armCounter)
                    mintTypeRow(head, rem.name, ptr)
                    // listrange from the last token of the EXPRESS underlying
                    // type (RDFWriter.java:446-448)
                    val contentKey =
                      if (dict.classes.contains("i:" + rem.primLast)) "i:" + rem.primLast
                      else if (dict.classes.contains("x:" + rem.primLast)) "x:" + rem.primLast
                      else ""
                    directRegularList(head, "i:" + rem.name, contentKey,
                      literals.toIndexedSeq, IndexedSeq.empty, 0, armCounter, ptr)
                    armCounter += 1
                    listHeads += head
                  }
                  remembrance = None
                  literals.clear()
              }
            } else {
              // untyped inner list (RDFWriter.java:465-512)
              sub2.foreach {
                case SNode(v2) => literals += filterExtras(v2)
                case RNode(rv, _) =>
                  targets.get(rv).foreach(ifcVOs += _)
                case _: LNode => mark("warn", "ERROR19 list of list of list")
              }
              if (evoAttrs.size > ptr) {
                val attr = evoAttrs(ptr)
                val ci = dict.classInfo(attr.rangeKey)
                if (ci.isList) {
                  val innerKey = ci.listContentKey // <X>_List_List → <X>_List
                  val head = mint3(mintBase, "in", line, ptr, armCounter)
                  mintClassTypeRow(head, innerKey, ptr)
                  val contentKey = dict.classInfo(innerKey).listContentKey
                  if (ifcVOs.nonEmpty)
                    directRegularList(head, innerKey, contentKey, IndexedSeq.empty,
                      ifcVOs.toIndexedSeq, 1, armCounter, ptr)
                  else if (literals.nonEmpty)
                    directRegularList(head, innerKey, contentKey, literals.toIndexedSeq,
                      IndexedSeq.empty, 0, armCounter, ptr)
                  armCounter += 1
                  listHeads += head
                } else mark("warn", "ERROR23 list that is not a list")
              }
              literals.clear()
              ifcVOs.clear()
            }
        }
        j += 1
      }

      // "interpret parse" (RDFWriter.java:518-553)
      if (literals.nonEmpty) {
        if (evoAttrs.size <= ptr) {
          // the reference dereferences the attribute before its bounds check
          // (RDFWriter.java:520) → IndexOutOfBounds → file conversion dies
          mark("crash", "list literals beyond attribute list")
        } else {
          val attr = evoAttrs(ptr)
          val ci = dict.classInfo(attr.rangeKey)
          remembrance match {
            case Some(rem) =>
              if (ci.isList) regularList(attr, literals.toIndexedSeq, Some(rem), ptr)
              else {
                addSingleFromRemembrance(attr.prop, rem, literals.head, ptr)
                if (literals.size > 1) mark("warn", "WARNING37 extra literals ignored")
              }
              remembrance = None
            case None =>
              if (ci.isList) regularList(attr, literals.toIndexedSeq, None, ptr)
              else literals.foreach(createLiteralProperty(attr.prop, attr.rangeKey, _, ptr))
          }
        }
      }
      if (listHeads.nonEmpty && evoAttrs.size > ptr)
        listPropertyToEntities(evoAttrs(ptr), listHeads.toIndexedSeq, ptr)
      ptr + 1
    }

    // ------------------------------------------------------------ walk

    entOpt match {
      case Some(evo) =>
        // ENTITY line (RDFWriter.java:215-244)
        var ptr = 0
        st.args.foreach {
          case Tokenizer.SNode(v)     => ptr = handleString(evo.attrs, v, ptr)
          case Tokenizer.RNode(id, _) => ptr = handleRef(evo.attrs, id, ptr)
          case l: Tokenizer.LNode     => ptr = handleList(evo.attrs, l.children, ptr)
        }
      case None =>
        // standalone TYPE line (RDFWriter.java:192-213): string/ref args are
        // warnings; list args collect literals but emit nothing (the
        // "interpret parse" block at :599-627 only acts on an EMPTY literal
        // list, where it expands an empty list — i.e., no value triples).
        st.args.foreach {
          case l: Tokenizer.LNode =>
            l.children.foreach {
              case Tokenizer.SNode(v) =>
                if (dict.types.contains(formatClassName(v)) && remembrance.isEmpty)
                  remembrance = dict.types.get(formatClassName(v))
              case _ => ()
            }
          case _ => mark("warn", "WARNING1/2 unhandled type property")
        }
    }

    markersOut
  }
}

object Emitter {

  /** Candidate-row consumer (round 6): field order mirrors [[TripleRow]].
    * The fused pipeline's DocDedup implements this directly, so the hot path
    * never allocates a TripleRow per candidate; [[RowBuffer]] restores the
    * collected form for the staged path and tests. */
  trait TripleSink {
    def add(doc_id: String, subj: String, pred_id: Int, obj: String, so_tag: Int,
            subj_val: Long, obj_val: Long, kd: Int, src_line: Long, slot: Int,
            wcls: Int): Unit
  }

  /** Collecting sink — the emit() compatibility surface. */
  final class RowBuffer extends TripleSink {
    val rows = new ArrayBuffer[TripleRow]()
    def add(doc_id: String, subj: String, pred_id: Int, obj: String, so_tag: Int,
            subj_val: Long, obj_val: Long, kd: Int, src_line: Long, slot: Int,
            wcls: Int): Unit =
      rows += TripleRow(doc_id, subj, pred_id, obj, so_tag, subj_val, obj_val,
        kd, src_line, slot, wcls)
  }

  val RDF_TYPE: String = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val XSD_NS: String = "http://www.w3.org/2001/XMLSchema#"
  val OWL_NS: String = "http://www.w3.org/2002/07/owl#"

  /** Precomputed int ids for every predicate / static-vocab object /
    * kd value an Emitter over this dictionary can mint. Keys are the dict's
    * own locals (attribute prop names, class keys, CamelCase names, enum
    * individual locals), so the per-triple hot path does a single small-map
    * lookup instead of building and hashing a 50-90 byte IRI string.
    * All ids come from the same PredIds/VocabIds/ClassIds universes the
    * generic path uses — outputs are bit-identical. */
  private[operators] final class IdCache(dict: graft.schema.SchemaDict) {
    import graft.schema.{ClassIds, PredIds, VocabIds}
    import graft.schema.SchemaDict.{EXPRESS_NS, LIST_NS}
    private val ontNS = dict.ontNS

    val rdfTypeId: Int = PredIds.id(RDF_TYPE)
    val owlImportsId: Int = PredIds.id(OWL_NS + "imports")
    val hasContentsId: Int = PredIds.id(LIST_NS + "hasContents")
    val hasNextId: Int = PredIds.id(LIST_NS + "hasNext")
    val owlOntologyVid: Int = VocabIds.id(OWL_NS + "Ontology")
    val ontNSVid: Int = VocabIds.id(ontNS)
    val exprTrueVid: Int = VocabIds.id(EXPRESS_NS + "TRUE")
    val exprFalseVid: Int = VocabIds.id(EXPRESS_NS + "FALSE")
    val exprUnknownVid: Int = VocabIds.id(EXPRESS_NS + "UNKNOWN")

    // kd codes of the closed literal-datatype universe (addLiteralToResource arms)
    val kdString: Int = PredIds.kdOf("literal", XSD_NS + "string")
    val kdInteger: Int = PredIds.kdOf("literal", XSD_NS + "integer")
    val kdDouble: Int = PredIds.kdOf("literal", XSD_NS + "double")
    val kdHexBinary: Int = PredIds.kdOf("literal", XSD_NS + "hexBinary")
    val kdBoolean: Int = PredIds.kdOf("literal", XSD_NS + "boolean")

    /** attr prop local -> PredIds id of ontNS + prop */
    val propPredId: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      dict.entities.valuesIterator.foreach(_.attrs.foreach { a =>
        if (!m.containsKey(a.prop)) m.put(a.prop, PredIds.id(ontNS + a.prop))
      })
      m
    }
    /** xsd kind -> (express:hasX IRI, its PredIds id) — wrapperFor needs the
      * IRI string too (it is part of the wrapper mint hash input). */
    val valueProp: java.util.HashMap[String, (String, Integer)] = {
      val m = new java.util.HashMap[String, (String, Integer)]()
      dict.classes.valuesIterator.map(_.xsd).filter(_.nonEmpty).foreach { x =>
        if (!m.containsKey(x)) {
          val iri = EXPRESS_NS + "has" + x.substring(0, 1).toUpperCase + x.substring(1)
          m.put(x, (iri, PredIds.id(iri)))
        }
      }
      m
    }
    /** class key -> (VocabIds id of classIri(key), ClassIds id of classIri(key)) */
    val classVid: java.util.HashMap[String, (Integer, Integer)] = {
      val m = new java.util.HashMap[String, (Integer, Integer)]()
      dict.classes.keysIterator.foreach { k =>
        val iri = dict.classIri(k)
        m.put(k, (VocabIds.id(iri), ClassIds.id(iri)))
      }
      m
    }
    /** local name (entity/type CamelName or enum individual) -> VocabIds id
      * of ontNS + local */
    val localVid: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      def add(l: String): Unit = if (!m.containsKey(l)) m.put(l, VocabIds.id(ontNS + l))
      dict.entities.valuesIterator.foreach(e => add(e.name))
      dict.types.valuesIterator.foreach(t => add(t.name))
      dict.enumLabels.valuesIterator.foreach(_.valuesIterator.foreach(add))
      m
    }
  }

  private val idCaches = new java.util.concurrent.ConcurrentHashMap[String, IdCache]()
  private[operators] def idCache(dict: graft.schema.SchemaDict): IdCache =
    idCaches.computeIfAbsent(dict.version, _ => new IdCache(dict))

  /** FNV-1a 64-bit over UTF-8 bytes — stable, dependency-free content hash. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  // ---- incremental FNV-1a mint hashing (Stage-C hot path) ----
  // The old mint path built `docId + "\u0000" + parts` (parts itself an
  // s-interpolation) and then re-encoded the whole concat to a byte[] per
  // call. These helpers hash the same byte stream incrementally — the doc
  // prefix once per statement, components without any intermediate string.
  // MintHashSpec pins byte-for-byte equivalence against the concat form.

  private[operators] val FnvBasis = 0xcbf29ce484222325L

  @inline private def fnvByte(h0: Long, b: Int): Long = (h0 ^ (b & 0xffL)) * 0x100000001b3L

  /** Continue h0 over the UTF-8 bytes of s — identical to hashing
    * s.getBytes(UTF_8), including the '?' replacement Java's encoder applies
    * to unpaired surrogates. */
  private[operators] def fnvStr(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x80) h = fnvByte(h, c)
      else if (c < 0x800) {
        h = fnvByte(h, 0xc0 | (c >> 6))
        h = fnvByte(h, 0x80 | (c & 0x3f))
      } else if (Character.isHighSurrogate(c) && i + 1 < n && Character.isLowSurrogate(s.charAt(i + 1))) {
        val cp = Character.toCodePoint(c, s.charAt(i + 1))
        h = fnvByte(h, 0xf0 | (cp >> 18))
        h = fnvByte(h, 0x80 | ((cp >> 12) & 0x3f))
        h = fnvByte(h, 0x80 | ((cp >> 6) & 0x3f))
        h = fnvByte(h, 0x80 | (cp & 0x3f))
        i += 1
      } else if (Character.isSurrogate(c)) {
        h = fnvByte(h, '?')
      } else {
        h = fnvByte(h, 0xe0 | (c >> 12))
        h = fnvByte(h, 0x80 | ((c >> 6) & 0x3f))
        h = fnvByte(h, 0x80 | (c & 0x3f))
      }
      i += 1
    }
    h
  }

  /** Continue h0 over the decimal digits of v (== fnvStr(h0, v.toString)). */
  private[operators] def fnvLong(h0: Long, v: Long): Long = {
    if (v < 0) return fnvStr(h0, java.lang.Long.toString(v)) // Long.MinValue line ids etc.
    var div = 1L
    while (v / div >= 10) div *= 10
    var h = h0
    var rest = v
    while (div > 0) {
      h = fnvByte(h, '0' + (rest / div).toInt)
      rest %= div
      div /= 10
    }
    h
  }

  /** fnv state after `docId + "\u0000"` — computed once per statement. */
  private[operators] def mintBaseOf(docId: String): Long = fnvByte(fnvStr(FnvBasis, docId), 0)

  /** hash -> baseURI-relative local form (what mint() returns; the Stage-D
    * decode reproduces this with concat('n', lower(hex(subj_val)))) */
  private[operators] def mintLocal(h: Long): String = "n" + java.lang.Long.toUnsignedString(h, 16)

  /** hash of mint(doc, s"$tag|$a|$b|$c") */
  private[operators] def mint3(base: Long, tag: String, a: Long, b: Long, c: Long): Long = {
    var h = fnvStr(base, tag)
    h = fnvByte(h, '|'); h = fnvLong(h, a)
    h = fnvByte(h, '|'); h = fnvLong(h, b)
    h = fnvByte(h, '|'); h = fnvLong(h, c)
    h
  }

  /** hash of mint(doc, s"$tag|$a|$b|$c|$d") */
  private[operators] def mint4(base: Long, tag: String, a: Long, b: Long, c: Long, d: Long): Long = {
    var h = fnvStr(base, tag)
    h = fnvByte(h, '|'); h = fnvLong(h, a)
    h = fnvByte(h, '|'); h = fnvLong(h, b)
    h = fnvByte(h, '|'); h = fnvLong(h, c)
    h = fnvByte(h, '|'); h = fnvLong(h, d)
    h
  }

  /** hash of mint(doc, "w|" + valueProp + ":" + xsd + ":" + lexical) — the E6
    * shared-wrapper key (RDFWriter.java:807). */
  private[operators] def mintW(base: Long, valueProp: String, xsd: String, lexical: String): Long = {
    var h = fnvStr(base, "w|")
    h = fnvStr(h, valueProp); h = fnvByte(h, ':')
    h = fnvStr(h, xsd); h = fnvByte(h, ':')
    h = fnvStr(h, lexical)
    h
  }
}
