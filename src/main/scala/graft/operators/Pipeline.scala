package graft.operators

import graft.model._
import graft.schema.{PredIds, SchemaDict}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** End-to-end KG-construction job (SURVEY.md §3.4), two execution forms
  * over the same four-stage semantics:
  *
  * FUSED (default, Options.fusedPipeline): documents are self-contained, so
  * tokenize (A) → reference resolution (B: the doc's own line→keyword map)
  * → canonicalize/emit (C) → dedup/E6 (D: per-doc hash map) all run inside
  * ONE narrow mapPartitions over the docs table — docs in, triples out,
  * ZERO wide edges; only the broadcast-dim IRI decode follows. Measured
  * 11.0M/8.0M triples/s uniform/skewed at 10k docs × 32 cores
  * (graft.FinishBench) — 2.8x the staged form.
  *
  * STAGED (checkpoint mode and explicit opt-in): Stage A tokenize (narrow
  * flatMap) → Stage B link (the salted (doc_id, local_id) hash join under
  * AQE skew splitting) → Stage C emit (narrow flatMap; markers ride in-band
  * as sentinel rows) → Stage D finishing (doc-local dedup by default, or
  * the spill-safe global fused hash aggregate). This is the resumable
  * (stage tables), introspectable (per-stage lineage), skew-splittable form
  * — and the public operator seam (q24/q25/q26 oracles). Its shuffle
  * budget: per-doc abort flags decided in Stage A (no flag joins); `stmts`
  * materialized once for the D2 join's three sides; the emitted stream
  * consumed exactly once; statements co-locate by doc_id BEFORE the ~13x
  * triple fan-out so the triple stream never crosses the network.
  *
  * Output identity between the forms is pinned by StageDSpec (triples AND
  * markers, both removeDuplicates settings, golden corpus included).
  * Per-partition lineage rows (stage, partition, rows in/out, errors,
  * wall_ms) are collected by accumulator: Stages A and C on the staged
  * path; on the fused path the overall F_fused row plus per-phase
  * F1_tokenize/F2_link/F3_emit/F4_dedup rows, so ops introspection
  * survives the fused default.
  */
object Pipeline {

  final case class Result(triples: DataFrame, markers: Dataset[Marker],
                          private val cached: Seq[Dataset[_]],
                          private val lineageAcc: org.apache.spark.util.CollectionAccumulator[LineageRow]) {
    def markersDF: DataFrame = markers.toDF
    /** per-partition lineage/metrics observed so far (populate by running an
      * action on `triples` first); retried tasks deduped per (stage, partition) */
    def lineage(implicit spark: SparkSession): DataFrame = {
      import spark.implicits._
      import scala.jdk.CollectionConverters._
      spark.createDataset(lineageAcc.value.asScala.toSeq).toDF
        .groupBy($"stage", $"partition_id")
        .agg(max($"rows_in").as("rows_in"), max($"rows_out").as("rows_out"),
          max($"errors").as("errors"), max($"wall_ms").as("wall_ms"))
    }
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  /** Production write path for the triples table: range-clustered on
    * (doc_id, subj) — keeps a document's triples together for downstream
    * per-doc reads while still splitting mega-documents across partition
    * boundaries (the subj component prevents single-doc hotspots). */
  def writeTriples(triples: DataFrame, path: String)(implicit spark: SparkSession): Unit = {
    import spark.implicits._
    graft.sources.TableIO.write(triples.repartitionByRange($"doc_id", $"subj"), path)
  }

  /** Wrap a partition function with lineage counting. */
  private def instrumented[T, U](stage: String,
      acc: org.apache.spark.util.CollectionAccumulator[LineageRow],
      isError: U => Boolean)(f: Iterator[T] => Iterator[U]): Iterator[T] => Iterator[U] = { it =>
    val pid = org.apache.spark.TaskContext.getPartitionId()
    val t0 = System.currentTimeMillis()
    var nIn = 0L
    var nOut = 0L
    var nErr = 0L
    var reported = false
    val out = f(it.map { x => nIn += 1; x })
      .map { u => nOut += 1; if (isError(u)) nErr += 1; u }
    new Iterator[U] {
      def hasNext: Boolean = {
        val h = out.hasNext
        if (!h && !reported) {
          reported = true
          acc.add(LineageRow(stage, pid, nIn, nOut, nErr, System.currentTimeMillis() - t0))
        }
        h
      }
      def next(): U = out.next()
    }
  }

  /** in-band marker encoding (Stage C → Stage D): marker rows carry no
    * decodable predicate (their payload lives in subj/obj) */
  private val MARKER_PRED_ID = -1

  /** Per-statement Stage-C dispatch shared by the staged and fused paths:
    * the marker surface for oversize/unsupported-schema docs, per-schema
    * Emitter reuse. Candidate rows stream into `sink`; the statement's
    * markers come back as [[Marker]]s — the caller picks its own in-band
    * encoding (TripleRow sentinel rows on the staged path, marker
    * DedupedRows on the fused path). */
  private def emitCore(emitters: scala.collection.mutable.HashMap[String, Emitter],
                       base: String, hdrOnAbort: Boolean)(ls0: LinkedStmt,
                       preArgs: scala.collection.Seq[Tokenizer.Node],
                       sink: Emitter.TripleSink): Seq[Marker] = {
    val ls = if (ls0.targets == null) ls0.copy(targets = Nil) else ls0
    if (ls.schema.isEmpty) {
      // the oversize mega-doc guard fires BEFORE the FILE_SCHEMA sniff,
      // so its marker must surface from here; every OTHER schema-less
      // document produces no output at all (reference behavior) — keyed
      // on the marker kind, not on abort, so a schema-less doc that also
      // happens to have dangling refs stays silent like the reference
      if (ls.keyword == Tokenizer.DocSentinel && ls.body.startsWith("oversize_doc:")) {
        val parts = ls.body.split(":", 2)
        Seq(Marker(ls.doc_id, parts(0), -1L, parts(1)))
      } else Nil
    }
    else if (!SchemaDict.available(ls.schema)) {
      if (ls.keyword == Tokenizer.DocSentinel)
        Seq(Marker(ls.doc_id, "unsupported_schema", ls.line_id, ls.schema))
      else Nil
    } else {
      val em = emitters.getOrElseUpdate(ls.schema,
        new Emitter(SchemaDict.load(ls.schema), base, hdrOnAbort))
      em.emitInto(ls, preArgs, sink)
    }
  }

  /** Staged-path form: rows collected, markers encoded in-band as sentinel
    * TripleRows (no decodable predicate; payload in subj/obj). */
  private def emitOne(emitters: scala.collection.mutable.HashMap[String, Emitter],
                      base: String, hdrOnAbort: Boolean)(ls0: LinkedStmt,
                      preArgs: scala.collection.Seq[Tokenizer.Node] = null): Iterator[TripleRow] = {
    val buf = new Emitter.RowBuffer
    val ms = emitCore(emitters, base, hdrOnAbort)(ls0, preArgs, buf)
    buf.rows.iterator ++ ms.iterator.map(m =>
      TripleRow(m.doc_id, m.kind, MARKER_PRED_ID, m.detail, 0, -1L, -1L, PredIds.MarkerKd, m.line_id, -1, -1))
  }

  /** Stage-D finishing pass over the emitted candidate-triple stream
    * (columns: doc_id, subj, pred_id, obj, kd, src_line, slot, wcls —
    * pred/kind/datatype are dictionary-encoded by Stage C, schema.PredIds,
    * so the one wide edge shuffles two ints instead of three IRI strings).
    * Public seam: battery query q26 oracle-checks it against DuckDB on a
    * deterministic synthetic input.
    *
    * E6 canonical wrapper typing + E9 global dedup in ONE TRUE hash
    * aggregate: the per-use candidate rdf:type rows of a shared literal
    * wrapper (wcls >= 0) collapse into a single group; the minimized value
    * is a single LONG encoding (src_line, slot, classId) — min picks the
    * first-in-document-order class, reproducing the reference's
    * propertyResourceMap first-mint behavior (RDFWriter.java:807-819) —
    * and a fixed-width buffer keeps the aggregate in HashAggregateExec
    * (a struct/string buffer would demote it to SortAggregate = two full
    * sorts of the triple stream). For all other rows the group key includes
    * the object: plain triple-set dedup (RDF graphs are sets;
    * resourceMap/getResource, RDFWriter.java:1092-1105). The canonical
    * class IRI is decoded through a tiny broadcast dimension.
    */
  def finish(data: DataFrame, baseURI: String)(implicit spark: SparkSession): DataFrame =
    decode(dedupAgg(data), baseURI)

  /** The E6+E9 fused hash aggregate (see [[finish]]): encoded candidate rows
    * in, one deduped encoded row per triple out (`m` = min priority). */
  private[graft] def dedupAgg(data: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // m = ((src_line + 2) * 2^12 + (slot + 1)) * 2^14 + classId  (< 2^63:
    // src_line clamps to 2^36 - 1, so the product stays below Long.MaxValue;
    // the 14-bit class field fits the 8-schema-dictionary class universe)
    val prio = (least(greatest($"src_line", lit(-1L)) + 2L, lit((1L << 36) - 1)) * 4096L +
      least(greatest($"slot", lit(-1)) + 1, lit(4095))) * 16384L +
      when($"wcls" >= 0, $"wcls").otherwise(0)
    // wrapper rdf:type candidate rows are keyed by an EXPLICIT boolean flag,
    // never by an obj sentinel: a real empty-string IFC literal ('' is common
    // in real files) must keep obj = "" and not be rewritten to a class IRI
    // group on the fully-encoded key (tag + long pairs + the residual
    // strings; no namespace bytes, no instance-local strings).
    // NOTE the wrapper-row group key neutralizes ALL THREE obj carriers
    // (og, otg, ov): candidate classes differ per use, and the canonical one
    // is re-derived from min(prio)'s class field — not from the group key
    data
      .groupBy($"doc_id", $"subj", shiftright($"so_tag", 3).as("stg"), $"subj_val",
        $"pred_id", ($"wcls" >= 0).as("is_wtype"),
        when($"wcls" >= 0, lit("")).otherwise($"obj").as("og"),
        when($"wcls" >= 0, lit(0)).otherwise($"so_tag" % 8).as("otg"),
        when($"wcls" >= 0, lit(-1L)).otherwise($"obj_val").as("ov"), $"kd")
      .agg(min(prio).as("m"))
  }

  /** IRI restoration over the deduped encoded rows (columns doc_id, subj,
    * stg, subj_val, pred_id, is_wtype, og, otg, ov, kd, m): subj = baseURI +
    * decoded local; obj = wrapper class IRI (classArr), static-vocab IRI
    * (vocabArr), baseURI + decoded instance local, or the literal lexical
    * form as-is. `n` + lower(hex()) reproduces
    * Long.toUnsignedString(h, 16) exactly (no zero-padding on positives, 16
    * digits on negatives — pinned by StageDSpec).
    *
    * Round 6 (guide §2.4/§4): the five dictionary decodes are FOLDABLE
    * LITERAL-ARRAY lookups (`element_at` over a constant array, like the kd
    * datatype decode always was), not broadcast hash joins. The universes
    * are compile-time constants of a few MB — exactly what was broadcast
    * anyway — but as expressions the flagship path keeps ZERO join
    * operators after the fused map stage: no broadcast exchanges, no
    * driver-side relation builds, no per-row probe/copy through five BHJ
    * operators, and consumers that don't read the decoded strings (counts,
    * filters on doc_id, …) prune the lookup entirely. Out-of-universe ids
    * decode to NULL exactly like the former left joins (bounds-guarded —
    * ANSI would otherwise abort on a garbage id from a caller-built frame);
    * an unmapped pred_id still raises loudly below. */
  private[graft] def decode(deduped: DataFrame, baseURI: String)
                           (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    import graft.model.{TripleRow => TR}
    import graft.schema.{ClassIds, PredIds, VocabIds}
    val classArr = typedlit(ClassIds.idToIri.toSeq)
    val predArr = typedlit(PredIds.idToIri.toSeq)
    val vocabArr = typedlit(VocabIds.idToIri.toSeq)
    // Named-tag decode: VocabIds id -> IRI local name. The Named encoding
    // packs (id of ontNS#CamelName, line); the local after '#'/'/' IS that
    // CamelName, so one static array serves both sides of the triple.
    val localArr = typedlit(VocabIds.idToIri.toSeq.map { iri =>
      iri.substring(math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/')) + 1)
    })
    // NULL-on-miss lookup (the left-join contract): guard the 1-based index
    // into [1, len] so ANSI element_at can never abort on garbage ids
    def dim(arr: org.apache.spark.sql.Column, len: Int,
            idx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(idx >= 0 && idx < len, element_at(arr, (idx + 1).cast("int")))
    val wIri = dim(classArr, ClassIds.idToIri.length, ($"m" % 16384).cast("int"))
    // loud decode: an unmapped pred_id must SURFACE (this is a public seam
    // fed caller-built frames), consistent with PredIds.id's loud-on-miss
    // posture — a silent null would drop the IRI, not the row
    val pIri = dim(predArr, PredIds.idToIri.length, $"pred_id")
    val vIri = dim(vocabArr, VocabIds.idToIri.length, $"ov")
    val slLocal = dim(localArr, VocabIds.idToIri.length, shiftright($"subj_val", TR.LineBits))
    val olmLocal = dim(localArr, VocabIds.idToIri.length, shiftright($"ov", TR.LineBits))
    // kd decode is a pure expression (6-entry closed datatype universe)
    val dtArr = array(PredIds.Datatypes.map(lit): _*)
    deduped
      .withColumn("w_iri", when($"is_wtype", wIri))
      .withColumn("p_iri", pIri)
      .withColumn("v_iri", when($"otg" === TR.Vocab, vIri))
      .withColumn("sl_local", when($"stg" === TR.Named, slLocal))
      .withColumn("olm_local", when($"otg" === TR.Named, olmLocal))
      .select($"doc_id",
        concat(lit(baseURI),
          when($"stg" === TR.Named,
            concat($"sl_local", lit("_"), $"subj_val".bitwiseAND(TR.LineMask).cast("string")))
            .when($"stg" === TR.Mint, concat(lit("n"), graft.functions.LowerHex($"subj_val")))
            // Base rows ship subj = "" (the baseURI itself), so the Raw
            // fallthrough covers them too
            .otherwise($"subj")).as("subj"),
        when($"p_iri".isNull, raise_error(concat(lit("pred_id not in PredIds universe: "),
          $"pred_id".cast("string")))).otherwise($"p_iri").as("pred"),
        when($"is_wtype", $"w_iri")
          .otherwise(when($"otg" === TR.Vocab, $"v_iri")
            .otherwise(when($"kd" === PredIds.IriKd,
              concat(lit(baseURI),
                when($"otg" === TR.Named,
                  concat($"olm_local", lit("_"), $"ov".bitwiseAND(TR.LineMask).cast("string")))
                  .when($"otg" === TR.Mint, concat(lit("n"), graft.functions.LowerHex($"ov")))
                  .otherwise($"og")))
              .otherwise($"og"))).as("obj"),
        when($"kd" === PredIds.IriKd || $"kd" === PredIds.AbsIriKd, "iri")
          .otherwise("literal").as("obj_kind"),
        when($"kd" === PredIds.IriKd || $"kd" === PredIds.AbsIriKd, "")
          .otherwise(element_at(dtArr, $"kd")).as("obj_datatype"),
        // decode with integer bit-shifts: `/` on longs is DOUBLE division,
        // which rounds once m exceeds 2^53
        (shiftright($"m", 26) - 2L).as("src_line"),
        ((shiftright($"m", 14) % 4096L).cast("int") - 1).as("slot"))
  }

  /** One deduped encoded row: the [[dedupAgg]] output schema, column-for-
    * column, so [[decode]] accepts either producer. */
  private[graft] final case class DedupedRow(doc_id: String, subj: String, stg: Int,
      subj_val: Long, pred_id: Int, is_wtype: Boolean, og: String, otg: Int,
      ov: Long, kd: Int, m: Long)

  /** The fused stage's row schema — BY CONSTRUCTION the [[DedupedRow]]
    * product-encoder schema, so the InternalRow form is column-identical to
    * the former Dataset[DedupedRow] form. */
  private val FusedSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[DedupedRow].schema
  private val FusedKdOrdinal = FusedSchema.fieldIndex("kd")

  private val EmptyUtf8 = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8

  /** Write one fused-stage row into the reused writer; null-safe on the
    * string columns, [[EmptyUtf8]] fast path for the common "" subject. */
  private[operators] def writeFusedRow(
      writer: org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter,
      doc: org.apache.spark.unsafe.types.UTF8String, subj: String, stg: Int,
      sv: Long, pid: Int, w: Boolean, og: String, otg: Int, ov: Long, kd: Int,
      m: Long): org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    writer.reset()
    writer.zeroOutNullBytes()
    writer.write(0, doc)
    if (subj == null) writer.setNullAt(1)
    else writer.write(1, if (subj.isEmpty) EmptyUtf8 else UTF8String.fromString(subj))
    writer.write(2, stg)
    writer.write(3, sv)
    writer.write(4, pid)
    writer.write(5, w)
    if (og == null) writer.setNullAt(6)
    else writer.write(6, if (og.isEmpty) EmptyUtf8 else UTF8String.fromString(og))
    writer.write(7, otg)
    writer.write(8, ov)
    writer.write(9, kd)
    writer.write(10, m)
    writer.getRow
  }

  /** Exact UTF-16 length of a UTF8String without materializing a String:
    * one unit per 1-3-byte sequence, two (a surrogate pair) per 4-byte
    * sequence — identical to `s.toString.length` for valid UTF-8. */
  private def utf16Len(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes
    var i = 0
    var len = 0L
    while (i < n) {
      val b = s.getByte(i) & 0xff
      val cl = if (b < 0xc0) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4
      len += (if (cl == 4) 2L else 1L)
      i += cl
    }
    len
  }

  /** Doc-local E6+E9: the same dedup/canonicalization as [[dedupAgg]], run
    * inside one task per document over a doc-contiguous candidate stream
    * (Stage C after `repartition(doc_id).sortWithinPartitions(doc_id)`).
    * Every [[dedupAgg]] group key starts with doc_id, so a per-doc hash map
    * is semantically identical to the global aggregate — but the wide edge
    * then carries STATEMENTS (1x rows, upstream of the ~13x triple fan-out)
    * instead of encoded triples. Memory: one document's deduped triples per
    * task (same whole-doc envelope as the tokenizer); a corpus of mega-docs
    * should keep the spill-safe aggregate instead. */
  /** One [[dedupAgg]] group key as a single primitive-field object with a
    * precomputed hash and the min priority stored IN-PLACE (`m` var). The
    * former `Tuple9` key boxed three longs + three ints + a boolean per
    * emitted row and paid Scala `LinkedHashMap`'s entry overhead plus a
    * boxed `Long` value per update — measured 42% of the fused per-doc loop
    * (FusedProbe); this is one allocation per candidate row and one
    * java.util.LinkedHashMap node per SURVIVING group, same insertion-order
    * iteration, identical key equality (null-safe on the string fields). */
  private[operators] final class DKey(val subj: String, val stg: Int, val sv: Long,
      val pid: Int, val w: Boolean, val og: String, val otg: Int, val ov: Long,
      val kd: Int, val h: Int) {
    var m: Long = Long.MaxValue
    override def hashCode: Int = h
    override def equals(o: Any): Boolean = o match {
      case k: DKey =>
        k.sv == sv && k.ov == ov && k.pid == pid && k.stg == stg &&
          k.otg == otg && k.kd == kd && k.w == w &&
          (if (subj == null) k.subj == null else subj == k.subj) &&
          (if (og == null) k.og == null else og == k.og)
      case _ => false
    }
  }

  private[operators] object DKey {
    /** the group-key hash, computed BEFORE any allocation so duplicate
      * candidates probe the table without constructing a key object */
    @inline def hashOf(subj: String, stg: Int, sv: Long, pid: Int, w: Boolean,
        og: String, otg: Int, ov: Long, kd: Int): Int = {
      var x = if (subj == null) 0 else subj.hashCode
      x = x * 31 + (if (og == null) 0 else og.hashCode)
      x = x * 31 + java.lang.Long.hashCode(sv)
      x = x * 31 + java.lang.Long.hashCode(ov)
      x = x * 31 + ((stg * 31 + pid) * 31 + otg) * 31 + kd
      x * 2 + (if (w) 1 else 0)
    }
  }

  /** One document's dedup/E6 accumulator — the in-memory equivalent of one
    * [[dedupAgg]] group-set (the doc_id prefix of every key is implicit).
    * Implements [[Emitter.TripleSink]] (round 6) so the fused emit streams
    * candidate fields straight into the map — no TripleRow per candidate. */
  private[operators] final class DocDedup extends Emitter.TripleSink {
    // Open-addressed table + insertion-order array (round 6): the former
    // java.util.LinkedHashMap paid a Node allocation per SURVIVING group
    // and a second hash computation inside the map; here duplicates probe
    // with a precomputed hash and allocate nothing, inserts allocate only
    // the DKey itself. Load factor 1/2; table persists across documents
    // (cleared, not reallocated, between flushes).
    private var cap = 1 << 11
    private var mask = cap - 1
    private var table = new Array[DKey](cap)
    private val order = new ArrayBuffer[DKey](1 << 11)
    def add(r: TripleRow): Unit =
      add(r.doc_id, r.subj, r.pred_id, r.obj, r.so_tag, r.subj_val, r.obj_val,
        r.kd, r.src_line, r.slot, r.wcls)
    def add(doc_id: String, subj: String, pred_id: Int, obj: String, so_tag: Int,
            subj_val: Long, obj_val: Long, kd: Int, src_line: Long, slot: Int,
            wcls: Int): Unit = {
      val w = wcls >= 0
      val stg = so_tag >> 3
      val og = if (w) "" else obj
      val otg = if (w) 0 else so_tag % 8
      val ov = if (w) -1L else obj_val
      val h = DKey.hashOf(subj, stg, subj_val, pred_id, w, og, otg, ov, kd)
      // identical clamps to dedupAgg's `prio` column
      val lineC = math.min(math.max(src_line, -1L) + 2L, (1L << 36) - 1)
      val slotC = math.min(math.max(slot, -1) + 1, 4095).toLong
      val p = (lineC * 4096L + slotC) * 16384L + (if (w) wcls.toLong else 0L)
      var idx = h & mask
      while (true) {
        val k = table(idx)
        if (k == null) {
          val nk = new DKey(subj, stg, subj_val, pred_id, w, og, otg, ov, kd, h)
          nk.m = p
          table(idx) = nk
          order += nk
          if (order.length * 2 > cap) grow()
          return
        } else if (k.h == h && k.sv == subj_val && k.ov == ov && k.pid == pred_id &&
            k.stg == stg && k.otg == otg && k.kd == kd && k.w == w &&
            (if (subj == null) k.subj == null else subj == k.subj) &&
            (if (og == null) k.og == null else og == k.og)) {
          if (p < k.m) k.m = p
          return
        }
        idx = (idx + 1) & mask
      }
    }
    private def grow(): Unit = {
      cap <<= 1
      mask = cap - 1
      table = new Array[DKey](cap)
      var i = 0
      while (i < order.length) {
        val k = order(i)
        var idx = k.h & mask
        while (table(idx) != null) idx = (idx + 1) & mask
        table(idx) = k
        i += 1
      }
    }
    private def clearTable(): Unit = {
      // unconditional fill: cap is at most 2x the largest group count this
      // partition has seen, so the per-doc wipe is microseconds even after
      // a mega-doc growth (selective run-nulling is not provably complete
      // once probe runs have been split by earlier deletions)
      java.util.Arrays.fill(table.asInstanceOf[Array[AnyRef]], null)
      order.clear()
    }
    def nonEmpty: Boolean = order.nonEmpty
    /** surviving (post-dedup) group count accumulated so far */
    def size: Int = order.length
    /** drain: one DedupedRow per surviving group, then reset for the next doc */
    def flush(doc: String): Iterator[DedupedRow] = {
      val rows = new Array[DedupedRow](order.length)
      var i = 0
      while (i < order.length) {
        val k = order(i)
        rows(i) = DedupedRow(doc, k.subj, k.stg, k.sv, k.pid, k.w, k.og, k.otg, k.ov, k.kd, k.m)
        i += 1
      }
      clearTable()
      rows.iterator
    }

    /** drain as UnsafeRows through a REUSED per-partition writer (round 6):
      * zero row objects per surviving group — the scan contract (consumers
      * that buffer must copy) is upheld by every SQL operator downstream of
      * the [[GraftBridge.internalCreateDataFrame]] leaf. Keys are copied out
      * and the map cleared up-front, exactly like [[flush]]. */
    def flushUnsafe(doc: org.apache.spark.unsafe.types.UTF8String,
        writer: org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter)
        : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
      val keys = order.toArray
      clearTable()
      keys.iterator.map { k =>
        Pipeline.writeFusedRow(writer, doc, k.subj, k.stg, k.sv, k.pid, k.w,
          k.og, k.otg, k.ov, k.kd, k.m)
      }
    }
  }

  private[graft] def docLocalDedup(emitted: Dataset[TripleRow]): DataFrame = {
    val spark = emitted.sparkSession
    import spark.implicits._
    emitted.mapPartitions { it =>
      val acc = new DocDedup
      var curDoc: String = null
      var out: Iterator[DedupedRow] = Iterator.empty
      new Iterator[DedupedRow] {
        def hasNext: Boolean = {
          while (!out.hasNext && it.hasNext) {
            val r = it.next()
            if (curDoc == null) curDoc = r.doc_id
            else if (r.doc_id != curDoc) { out = acc.flush(curDoc); curDoc = r.doc_id }
            acc.add(r)
          }
          if (!out.hasNext && !it.hasNext && acc.nonEmpty) out = acc.flush(curDoc)
          out.hasNext
        }
        def next(): DedupedRow = out.next()
      }
    }.toDF
  }

  final case class Options(
      removeDuplicates: Boolean = false,
      /** D2 target-replication factor; 1 = AQE-only skew handling (measured
        * equal-or-better on both bench corpora — see Linker scaladoc) */
      salt: Int = 1,
      /** when set, stage outputs are written/read as parquet tables under this
        * directory (checkpoint/resume mode); otherwise stmts are persisted */
      checkpointDir: Option[String] = None,
      /** persist the Stage-C candidate stream so consuming BOTH triples and
        * markers executes Stage C exactly once (one extra memory/disk pass on
        * the hot path — leave off when only triples are consumed; checkpoint
        * mode already materializes Stage C as a stage table) */
      persistEmitted: Boolean = false,
      /** explicit EXPRESS schema version, bypassing the FILE_SCHEMA sniff —
        * the reference's convert(path, out, schema) overload
        * (IfcSpfReader.java:243-245), which reaches the 4 non-sniffable
        * versions IFC2X3_Final / IFC4 / IFC4_ADD1 / IFC4_ADD2 */
      schemaOverride: Option[String] = None,
      /** graph-API parity: keep the 2 ontology header triples of an aborted
        * document (the reference's parseModelToGraph does,
        * RDFWriter.java:121-132); default false = file-sink semantics
        * (goldens test6/test15 flush nothing) */
      headerOnAbort: Boolean = false,
      /** mega-doc guard: a document is ONE input row (its text lives in one
        * task's heap, same envelope as the reference's whole-file linemap,
        * README.md:34); docs above this many chars abort with an
        * `oversize_doc` marker instead of risking executor OOM */
      maxDocChars: Long = Tokenizer.DefaultMaxDocChars,
      /** Fully-fused single-pass mode: tokenize → doc-local link (documents
        * are self-contained, so the D2 semantics reduce to the doc's own
        * line→keyword map) → emit → doc-local dedup, all inside ONE narrow
        * mapPartitions over the docs table — ZERO wide edges; only the
        * broadcast-dim IRI decode follows. Maximum-throughput conversion
        * path (FinishBench cell "fused"); same per-task memory envelope as
        * the staged doc-local mode (one whole document). The staged
        * relational path remains the default: it is the resumable
        * (checkpointDir), introspectable (stage tables, per-stage lineage),
        * AQE-skew-handled form, and the seam the q24/q25/q26 oracles pin.
        * Some(true)/Some(false) force a mode (fused + checkpointDir is
        * refused: no stage tables exist to resume from); None (default) =
        * fused, except in checkpoint mode which needs the staged path.
        * In fused mode `salt` and `docLocalFinish` are ignored. Output
        * identity with the staged path is pinned by StageDSpec; measured
        * 11.0M/8.0M triples/s uniform/skewed vs 4.0/3.9M staged doc-local
        * (FinishBench interleaved min-of-5). */
      fusedPipeline: Option[Boolean] = None,
      /** Stage-D strategy. Some(true) = doc-local dedup ([[docLocalDedup]]:
        * the wide edge carries statements, ~1/13 the rows of the encoded
        * triple stream — measured 1.5-1.9x end-to-end, graft.FinishBench —
        * at the cost of whole-doc task memory, the same envelope as the
        * reference's in-heap Jena model, and one-task-per-mega-doc
        * serialization); Some(false) = the spill-safe global hash aggregate
        * (prefer it for corpora of near-maxDocChars documents). None
        * (default) = doc-local, except in checkpoint mode: a parquet
        * stage-table re-read may split a document across input partitions,
        * breaking the doc-contiguity the local dedup relies on, so
        * checkpointDir forces the aggregate (explicit Some(true) there is
        * refused loudly). Identical output either way (pinned by
        * StageDSpec). */
      docLocalFinish: Option[Boolean] = None)

  /** S8 generic consumer seam, mirroring the reference's caller-supplied
    * per-triple StreamRDF sink (convert(file, StreamRDF, base),
    * IfcSpfReader.java:357-365): the consumer runs once per partition on the
    * executors — no driver-side collection of the triple stream. */
  def foreachTriplePartition(triples: DataFrame)(consumer: Iterator[FinalTriple] => Unit)
                            (implicit spark: SparkSession): Unit = {
    import spark.implicits._
    triples.as[FinalTriple].foreachPartition(consumer)
  }

  def run(docs: Dataset[Doc], baseURI: String, removeDuplicates: Boolean = false,
          salt: Int = 1)(implicit spark: SparkSession): Result =
    run(docs, baseURI, Options(removeDuplicates, salt))

  /** The fused single-pass stage (see Options.fusedPipeline): per document,
    * tokenize → local link → emit → DocDedup, emitting deduped encoded rows
    * with markers riding in-band as kd = MarkerKd rows. */
  private def runFused(docs: Dataset[Doc], baseURI: String, opts: Options,
      lineageAcc: org.apache.spark.util.CollectionAccumulator[LineageRow])
      (implicit spark: SparkSession): Result = {
    import spark.implicits._
    val schemaOv = opts.schemaOverride
    val maxChars = opts.maxDocChars
    val base = baseURI
    val hdrOnAbort = opts.headerOnAbort
    val rmDup = opts.removeDuplicates
    // InternalRow form (round 6, guide §1.2 step 2 / §5): the stage consumes
    // the scan's InternalRows directly (no Doc/Span object per input row)
    // and emits UnsafeRows from a reused per-partition writer (no DedupedRow
    // object + product-encoder pass per output row) — at ~13 output rows per
    // statement the two encoder boundaries were a measured slice of the
    // stage's task time. Input field offsets are resolved BY NAME so a
    // reordered parquet schema keeps working; the output schema is the
    // DedupedRow encoder schema BY CONSTRUCTION (FusedSchema).
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val inSchema = docs.schema
    val docIdIdx = inSchema.fieldIndex("doc_id")
    val spansIdx = inSchema.fieldIndex("spans")
    val spanType = inSchema(spansIdx).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val spanN = spanType.length
    val kindIdx = spanType.fieldIndex("kind")
    val textIdx = spanType.fieldIndex("text")
    val offIdx = spanType.fieldIndex("offset")
    val kdOrd = FusedKdOrdinal
    val rowRdd = docs.queryExecution.toRdd.mapPartitions(
      instrumented[InternalRow, InternalRow]("F_fused", lineageAcc,
          _.getInt(kdOrd) == PredIds.MarkerKd) { rowIt =>
        val emitters = scala.collection.mutable.HashMap[String, Emitter]()
        // per-phase counters: the staged path reports per-stage lineage for
        // free (one instrumented mapPartitions per stage); the fused path
        // keeps that introspection by counting phase boundaries locally —
        // plain Long increments per doc/statement plus three nanoTime reads
        // per doc, nothing per emitted triple beyond what emitOne already does
        var nDocs, nStmts, nKept, nEmit, nMark, nDedupOut = 0L
        var tokNs, linkNs, emitNs = 0L
        // ONE dedup accumulator + counting sink per partition (flush(doc)
        // clears between documents): emitted candidates stream field-wise
        // into the dedup map — no TripleRow object per candidate (round 6)
        val dedup = new DocDedup
        val sink = new Emitter.TripleSink {
          def add(doc_id: String, subj: String, pred_id: Int, obj: String,
                  so_tag: Int, subj_val: Long, obj_val: Long, kd: Int,
                  src_line: Long, slot: Int, wcls: Int): Unit = {
            nEmit += 1
            dedup.add(doc_id, subj, pred_id, obj, so_tag, subj_val, obj_val,
              kd, src_line, slot, wcls)
          }
        }
        val writer = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(11)
        val textKind = UTF8String.fromString("text")
        val out = rowIt.flatMap { inRow =>
          nDocs += 1
          val t0 = System.nanoTime()
          val docId = inRow.getUTF8String(docIdIdx).toString
          val spans = inRow.getArray(spansIdx)
          // ---- docChars + assembly, replicating Tokenizer.assembleText and
          // the oversize sum EXACTLY (single-text fast path; media spans
          // skipped; stable offset order; null text appends "null"; UTF-16
          // lengths) — but without materializing Span objects
          val nSp = spans.numElements()
          var docChars = 0L
          var nText = 0
          var onlyText: UTF8String = null
          var onlyIsNull = false
          var i = 0
          while (i < nSp) {
            val sp = spans.getStruct(i, spanN)
            val kind = sp.getUTF8String(kindIdx)
            if (kind != null && kind.equals(textKind)) {
              nText += 1
              val t = sp.getUTF8String(textIdx)
              onlyText = t
              onlyIsNull = t == null
              if (t != null) docChars += utf16Len(t)
            }
            i += 1
          }
          // single-parse (round 6): each statement arrives WITH its parse
          // tree, so the emitter never re-tokenizes the body (two automaton
          // passes -> one); trees are null above the tokenizer's memory bound
          // and the emitter re-parses those — identical output either way
          val stmts =
            if (docChars > maxChars)
              Tokenizer.oversizeEntry(docId, docChars, maxChars).toArray
            else {
              val text =
                if (nText == 1 && !onlyIsNull) onlyText.toString
                else {
                  val parts = new ArrayBuffer[(Int, UTF8String)](nText)
                  var j = 0
                  while (j < nSp) {
                    val sp = spans.getStruct(j, spanN)
                    val kind = sp.getUTF8String(kindIdx)
                    if (kind != null && kind.equals(textKind)) {
                      // loud on a null offset, like the typed deserializer's
                      // non-nullable-field error (getInt would read 0 silently)
                      if (sp.isNullAt(offIdx))
                        throw new NullPointerException(s"null span offset in doc $docId")
                      parts += ((sp.getInt(offIdx), sp.getUTF8String(textIdx)))
                    }
                    j += 1
                  }
                  val sb = new java.lang.StringBuilder
                  parts.sortBy(_._1).foreach { case (_, t) =>
                    sb.append(if (t == null) "null" else t.toString)
                  }
                  sb.toString
                }
              Tokenizer.tokenizeText(docId, text, schemaOv,
                keep = docChars <= Tokenizer.TreeKeepMaxChars).toArray
            }
          val t1 = System.nanoTime(); tokNs += t1 - t0; nStmts += stmts.length
          // D1 (opt-in): canonical line per body (min line_id; headers always
          // survive), refs to removed duplicates resolve to the canonical
          // line — the doc-local form of Linker's window + alias join
          val (kept, alias) =
            if (!rmDup) (stmts, Map.empty[Long, Long])
            else {
              val canon = stmts.filter(_._1.line_id >= 0).groupBy(_._1.body)
                .iterator.flatMap { case (_, g) =>
                  val m = g.iterator.map(_._1.line_id).min
                  g.iterator.map(_._1.line_id -> m)
                }.toMap
              (stmts.filter(p => p._1.line_id < 0 || canon(p._1.line_id) == p._1.line_id),
                canon.filter { case (l, c) => l != c })
            }
          // D2, doc-locally: the doc's own line -> keyword map IS the
          // reference-resolution relation (documents are self-contained);
          // primitive-key LongMap — the immutable Map boxed every line id
          val kw = new scala.collection.mutable.LongMap[String](
            math.max(8, kept.length))
          kept.foreach { case (s, _) => if (s.line_id >= 0) kw.update(s.line_id, s.keyword) }
          val t2 = System.nanoTime(); linkNs += t2 - t1; nKept += kept.length
          var markerList: ArrayBuffer[Marker] = null
          kept.foreach { case (s, tree) =>
            val targets = s.refs.map { r =>
              val rr = alias.getOrElse(r, r)
              kw.get(rr) match {
                case Some(k) => RefTarget(r, rr, k)
                case None => RefTarget(r, -1L, null) // dangling
              }
            }
            val ls = LinkedStmt(s.doc_id, s.schema, s.line_id, s.keyword,
              s.body, s.abort, s.bad_line, targets)
            emitCore(emitters, base, hdrOnAbort)(ls, tree, sink).foreach { m =>
              nEmit += 1
              nMark += 1
              if (markerList == null) markerList = new ArrayBuffer[Marker](4)
              markerList += m
            }
          }
          emitNs += System.nanoTime() - t2
          nDedupOut += dedup.size
          val docUtf = UTF8String.fromString(docId)
          val markerRows =
            if (markerList == null) Iterator.empty
            else markerList.iterator.map(m => writeFusedRow(writer,
              docUtf, m.kind, 0, -1L, MARKER_PRED_ID, w = false, m.detail, 0,
              -1L, PredIds.MarkerKd, m.line_id))
          dedup.flushUnsafe(docUtf, writer) ++ markerRows
        }
        // report the phase rows once the partition's output is exhausted —
        // rows_in/rows_out chain: docs → statements → deduped statements →
        // emitted rows (markers counted as errors) → post-dedup triples.
        // F4's wall is inside F3's emit loop (add() runs per emitted row);
        // it reports rows only.
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var reported = false
        new Iterator[InternalRow] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && !reported) {
              reported = true
              lineageAcc.add(LineageRow("F1_tokenize", pid, nDocs, nStmts, 0, tokNs / 1000000))
              lineageAcc.add(LineageRow("F2_link", pid, nStmts, nKept, 0, linkNs / 1000000))
              lineageAcc.add(LineageRow("F3_emit", pid, nKept, nEmit, nMark, emitNs / 1000000))
              lineageAcc.add(LineageRow("F4_dedup", pid, nEmit - nMark, nDedupOut, 0, 0))
            }
            h
          }
          def next(): InternalRow = out.next()
        }
      })
    val fused0 = org.apache.spark.sql.GraftBridge.internalCreateDataFrame(
      spark, rowRdd, FusedSchema)
    val (fused, cached) =
      if (opts.persistEmitted) {
        val c = fused0.persist(StorageLevel.MEMORY_AND_DISK)
        (c, Seq(c))
      } else (fused0, Nil)
    val isMarker = $"kd" === PredIds.MarkerKd
    val finalTriples = decode(fused.filter(!isMarker), baseURI)
    val markers = fused.filter(isMarker)
      .select($"doc_id", $"subj".as("kind"), $"m".as("line_id"), $"og".as("detail"))
      .as[Marker]
    Result(finalTriples, markers, cached, lineageAcc)
  }

  def run(docs: Dataset[Doc], baseURI: String, opts: Options)
         (implicit spark: SparkSession): Result = {
    import spark.implicits._

    val lineageAcc = spark.sparkContext.collectionAccumulator[LineageRow]("graft.lineage")

    if (opts.fusedPipeline.getOrElse(opts.checkpointDir.isEmpty)) {
      require(opts.checkpointDir.isEmpty,
        "fusedPipeline has no stage tables to resume from — use the staged path for checkpoint mode")
      return runFused(docs, baseURI, opts, lineageAcc)
    }

    // ---- Stage A ----
    val schemaOv = opts.schemaOverride
    val maxChars = opts.maxDocChars
    val stmts0 = docs.mapPartitions(
      instrumented[Doc, Stmt]("A_tokenize", lineageAcc, _ => false)(
        _.flatMap(Tokenizer.tokenizeDoc(_, schemaOv, maxChars))))
    val (stmts, cached) = opts.checkpointDir match {
      case Some(dir) =>
        val p = graft.sources.TableIO.checkpoint(stmts0.toDF, s"$dir/stage_a_stmts")
        (p.as[Stmt], Nil)
      case None =>
        val c = stmts0.persist(StorageLevel.MEMORY_AND_DISK)
        // Materialize the stage table NOW, before the Stage-B join is
        // planned: a populated InMemoryRelation reports MEASURED stats, so
        // Catalyst's broadcast-vs-sort-merge choice for the D2 join is made
        // from real sizes. Unmaterialized, the estimate is inherited from
        // the doc source — a synthetic spark.range source estimates a few
        // KB for an arbitrarily large corpus, and the resulting
        // statistics-blind BroadcastHashJoin collects the whole corpus to
        // the driver. (Checkpoint mode gets real stats from the parquet
        // stage table for free; this is the cache-mode equivalent.) The
        // count costs nothing extra: Stage A runs exactly once either way,
        // this just moves it before join planning.
        c.count()
        (c, Seq(c))
    }

    val docLocal = opts.docLocalFinish.getOrElse(opts.checkpointDir.isEmpty)
    require(!(docLocal && opts.checkpointDir.nonEmpty),
      "docLocalFinish needs doc-contiguous partitions; a checkpoint stage-table " +
        "re-read may split a document across input splits")

    // ---- Stage B ----
    val linked0 = Linker.link(stmts, opts.removeDuplicates, opts.salt)
    // doc-local finish: co-locate each document's statements now (1x rows),
    // so no exchange is needed after the ~13x triple fan-out of Stage C
    val linked = if (docLocal)
      linked0.repartition($"doc_id").sortWithinPartitions($"doc_id")
    else linked0

    // ---- Stage C ---- narrow; dictionaries load from the executor classpath
    val base = baseURI
    val hdrOnAbort = opts.headerOnAbort
    val emitted0: Dataset[TripleRow] = linked.mapPartitions(
      instrumented[LinkedStmt, TripleRow]("C_emit", lineageAcc, _.kd == PredIds.MarkerKd) { it =>
      val emitters = scala.collection.mutable.HashMap[String, Emitter]()
      it.flatMap(ls => emitOne(emitters, base, hdrOnAbort)(ls))
    })
    // In checkpoint mode Stage C is additionally persisted as a stage table
    // (resume point); the hot path below never needs a second pass over it.
    // With persistEmitted, the candidate stream is cached instead, so a
    // markers action after a triples action re-executes nothing.
    val (emitted, cached2) = opts.checkpointDir match {
      case Some(dir) => (graft.sources.TableIO.checkpoint(emitted0.toDF, s"$dir/stage_c_emitted"), cached)
      case None if opts.persistEmitted =>
        val c = emitted0.toDF.persist(StorageLevel.MEMORY_AND_DISK)
        (c, cached :+ c)
      case None => (emitted0.toDF, cached)
    }

    // ---- Stage D ----
    // Per-document aborts and *ERROR 2* truncation were decided in Stage A
    // (per-row facts of the self-contained documents) and applied inside the
    // emitter, so the finishing pass is a pure filter + one hash aggregate.
    val isMarker = $"kd" === PredIds.MarkerKd
    val finalTriples =
      if (docLocal)
        decode(docLocalDedup(emitted.filter(!isMarker).as[TripleRow]), baseURI)
      else finish(emitted.filter(!isMarker), baseURI)

    // markers: the emitter's in-band diagnostics. In checkpoint mode they
    // read the Stage-C stage table (no recompute); with persistEmitted they
    // read the cache; otherwise consuming them re-runs Stage C from the
    // persisted stmts (fine for tests/ops introspection; the triples path
    // never touches them)
    val markers = emitted.filter(isMarker)
      .select($"doc_id", $"subj".as("kind"), $"src_line".as("line_id"), $"obj".as("detail"))
      .as[Marker]

    Result(finalTriples, markers, cached2, lineageAcc)
  }
}
