package graft

import graft.model.{Doc, Span}
import graft.operators.Pipeline
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Stage-D finishing-pass regressions: the empty-string-literal group key,
  * the prio encoding's clamp/decode arithmetic, canonical wrapper-class
  * selection order, and the physical plan shape of the whole pipeline. */
class StageDSpec extends SparkTestBase {

  private def ifcDoc(id: String, dataLines: String): Doc = {
    val text = "ISO-10303-21;\nHEADER;\nFILE_SCHEMA(('IFC4'));\nENDSEC;\nDATA;\n" +
      dataLines + "ENDSEC;\nEND-ISO-10303-21;\n"
    Doc(id, Seq(Span("text", text, "", 0)))
  }

  test("empty IFC string literal '' survives Stage D as an empty literal") {
    import spark.implicits._
    // IFCORGANIZATION Name slot ('' here) ranges over IfcLabel (STRING):
    // the wrapper must carry express:hasString "" — NOT a class IRI
    // (regression: obj='' used to double as the wrapper-row group sentinel)
    val docs = spark.createDataset(Seq(ifcDoc("e0", "#1= IFCORGANIZATION($,'',$,$,$);\n")))
    val r = Pipeline.run(docs, "http://b/")
    val rows = r.triples.collect()
    val lits = rows.filter(_.getAs[String]("obj_kind") == "literal")
    assert(lits.nonEmpty)
    val hasString = lits.filter(_.getAs[String]("pred").endsWith("hasString"))
    assert(hasString.length == 1)
    assert(hasString.head.getAs[String]("obj") == "")
    // and the shared wrapper is still typed with its range class
    assert(rows.exists(x => x.getAs[String]("pred").endsWith("#type") &&
      x.getAs[String]("obj").endsWith("#IfcLabel")))
    r.unpersist()
  }

  test("finish: wrapper candidates pick the first-in-document-order class") {
    import spark.implicits._
    val iri1 = graft.schema.ClassIds.idToIri(5)
    val iri2 = graft.schema.ClassIds.idToIri(9)
    // pred_id 0 = first predicate of the global dim; kd 0 = iri, 2 = xsd:string
    val df = Seq(
      // same wrapper subject, two candidate classes; (src_line, slot) order
      // must decide, not class id order (9 wins: line 3 < line 7)
      ("d", "w1", 0, iri2, 0, -1L, -1L, 0, 3L, 0, 9),
      ("d", "w1", 0, iri1, 0, -1L, -1L, 0, 7L, 0, 5),
      // duplicate plain triples collapse to min (src_line, slot)
      ("d", "s1", 1, "o", 0, -1L, -1L, 0, 9L, 2, -1),
      ("d", "s1", 1, "o", 0, -1L, -1L, 0, 4L, 1, -1),
      // empty-string literal is its own group and keeps obj = ""
      ("d", "s1", 1, "", 0, -1L, -1L, 2, 2L, 0, -1)
    ).toDF("doc_id", "subj", "pred_id", "obj", "so_tag", "subj_val", "obj_val", "kd", "src_line", "slot", "wcls")
    val out = Pipeline.finish(df, "").collect().map(r =>
      (r.getString(1), r.getString(3), r.getString(4), r.getLong(6), r.getInt(7))).toSet
    assert(out == Set(
      ("w1", iri2, "iri", 3L, 0),
      ("s1", "o", "iri", 4L, 1),
      ("s1", "", "literal", 2L, 0)))
  }

  test("finish: prio encoding clamps huge src_line without Long overflow") {
    import spark.implicits._
    val df = Seq(
      ("d", "s", 0, "a", 0, -1L, -1L, 0, Long.MaxValue / 2, 0, -1),
      ("d", "s", 0, "a", 0, -1L, -1L, 0, 5L, 1, -1)
    ).toDF("doc_id", "subj", "pred_id", "obj", "so_tag", "subj_val", "obj_val", "kd", "src_line", "slot", "wcls")
    val out = Pipeline.finish(df, "").collect()
    assert(out.length == 1)
    // the unclamped row (line 5) must win the min — a clamped row overflowing
    // to negative would otherwise shadow every real row
    assert(out.head.getAs[Long]("src_line") == 5L)
    assert(out.head.getAs[Int]("slot") == 1)
  }

  private def finalPlan(docLocal: Boolean): String = {
    import spark.implicits._
    val docs = spark.createDataset((0 until 24).map(i =>
      graft.sources.SynthCorpus.genDoc(i.toLong, 40, skew = false, seed = 7L)))
    val r = Pipeline.run(docs, graft.sources.SynthCorpus.BaseURI,
      Pipeline.Options(docLocalFinish = Some(docLocal), fusedPipeline = Some(false)))
    val df = r.triples
    df.collect() // materialize so AQE settles on the final plan
    val full = df.queryExecution.executedPlan.toString
    r.unpersist()
    // under AQE the string carries final + initial plans; judge only the final
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  test("aggregate-mode physical plan: zero sorts, at most two true repartitions") {
    val plan = finalPlan(docLocal = false)
    withClue(plan) {
      assert(!plan.contains("Sort"), "Stage D must stay a HashAggregate (no SortAggregate/SortMergeJoin)")
      // With measured stats from the materialized Stage-A cache the INITIAL
      // plan picks sort-merge for the D2 stmts⋈refMaps join (the correct
      // at-scale choice); at demo scale AQE converts it to broadcast and the
      // stmts-side exchange degrades to a local read (no repartition). So:
      // at most 3 shuffle stages, and anything beyond the two real wide
      // edges (refMap groupBy, Stage-D fused aggregate) must be local reads.
      val shuffles = "ShuffleQueryStage".r.findAllIn(plan).length
      val localReads = "AQEShuffleRead local".r.findAllIn(plan).length
      assert(shuffles <= 3, s"expected <= 3 shuffle stages, saw $shuffles")
      assert(shuffles - localReads <= 2,
        s"expected <= 2 true repartitions, saw $shuffles stages with only $localReads local reads")
    }
  }

  test("staged doc-local physical plan: the triple stream never shuffles") {
    val plan = finalPlan(docLocal = true)
    withClue(plan) {
      // every exchange keys on doc_id ALONE (the statement co-location and
      // the refMap groupBy side) — the old 13x wide edge keyed on the full
      // encoded triple tuple (doc_id, subj, …) must be gone
      val exchanges = "hashpartitioning\\(([^)]*)\\)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(exchanges.nonEmpty)
      assert(!exchanges.exists(_.contains("subj")),
        "no exchange may carry the emitted triple stream")
      // no aggregate at all in Stage D — dedup ran inside the per-doc tasks
      assert(!plan.contains("SortAggregate"))
      // the one Sort is the LOCAL statement sort on doc_id (global=false)
      val sorts = "Sort \\[([^\\]]*)\\], (\\w+)".r.findAllMatchIn(plan).toSeq
      assert(sorts.forall(m => m.group(1).startsWith("doc_id") && m.group(2) == "false"),
        "only the within-partition doc_id statement sort is allowed")
    }
  }

  test("fused (default) physical plan: ZERO shuffle stages") {
    import spark.implicits._
    val docs = spark.createDataset((0 until 24).map(i =>
      graft.sources.SynthCorpus.genDoc(i.toLong, 40, skew = false, seed = 7L)))
    val r = Pipeline.run(docs, graft.sources.SynthCorpus.BaseURI) // default = fused
    val df = r.triples
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    r.unpersist()
    withClue(plan) {
      // docs in, triples out, no wide edge anywhere — and since round 6 the
      // IRI decode is foldable literal-array lookups, so the fused plan has
      // no join operators (and no broadcast exchanges) at all
      assert(!plan.contains("ShuffleQueryStage") && !plan.contains("Exchange hashpartitioning"),
        "the fused pipeline must plan without any shuffle")
      assert(!plan.contains("Sort"), "and without any sort")
      assert(!plan.contains("Join"),
        "IRI decode must be pure expressions — no join operators on the fused path")
    }
  }

  test("finish: AbsIriKd objects pass through verbatim; unknown pred_id fails loud") {
    import spark.implicits._
    val abs = graft.schema.PredIds.AbsIriKd
    val df = Seq(
      // a urn:-shaped absolute IRI object outside VocabIds: shipped whole,
      // restored with NO baseURI prefix, obj_kind = iri
      ("d", "s", 0, "urn:uuid:12ab", 0, -1L, -1L, abs, 1L, 0, -1),
      ("d", "s", 0, "local9", 0, -1L, -1L, 0, 2L, 0, -1)
    ).toDF("doc_id", "subj", "pred_id", "obj", "so_tag", "subj_val", "obj_val", "kd", "src_line", "slot", "wcls")
    val out = Pipeline.finish(df, "http://b/").collect()
      .map(r => r.getString(3) -> r.getString(4)).toMap
    assert(out("urn:uuid:12ab") == "iri") // NOT corrupted to http://b/urn:uuid:12ab
    assert(out.contains("http://b/local9"))
    // a pred_id outside the universe must surface, not vanish (left join +
    // raise_error, consistent with PredIds.id's loud-on-miss posture)
    val bad = Seq(("d", "s", -99, "o", 0, -1L, -1L, 0, 1L, 0, -1))
      .toDF("doc_id", "subj", "pred_id", "obj", "so_tag", "subj_val", "obj_val", "kd", "src_line", "slot", "wcls")
    val e = intercept[Exception](Pipeline.finish(bad, "http://b/").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pred_id not in PredIds universe")))
  }

  test("emitter: oversize docs abort with a marker; headerOnAbort keeps header triples") {
    import spark.implicits._
    // oversize guard: a doc over the configured char bound produces exactly
    // one oversize_doc marker and zero triples (no OOM risk path)
    val big = ifcDoc("big", "#1= IFCORGANIZATION($,'x',$,$,$);\n")
    val r1 = Pipeline.run(spark.createDataset(Seq(big)), "http://b/",
      Pipeline.Options(maxDocChars = 16))
    assert(r1.triples.count() == 0)
    val m = r1.markers.collect()
    assert(m.length == 1 && m.head.kind == "oversize_doc" && m.head.detail.contains("chars"))
    r1.unpersist()

    // graph-API parity option: a dangling-ref abort keeps the 2 ontology
    // header triples (reference parseModelToGraph, RDFWriter.java:121-132)...
    val abortDoc = ifcDoc("a0", "#1= IFCAPPLICATION(#99,'v1','App','app');\n")
    val r2 = Pipeline.run(spark.createDataset(Seq(abortDoc)), "http://b/",
      Pipeline.Options(headerOnAbort = true))
    val t2 = r2.triples.collect()
    assert(t2.length == 2)
    assert(t2.map(_.getAs[String]("pred")).toSet ==
      Set("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://www.w3.org/2002/07/owl#imports"))
    assert(r2.markers.collect().exists(_.kind == "dangling_ref"))
    r2.unpersist()

    // ...while the default (file-sink semantics) flushes nothing
    val r3 = Pipeline.run(spark.createDataset(Seq(abortDoc)), "http://b/")
    assert(r3.triples.count() == 0)
    r3.unpersist()
  }

  test("D2 salt levels are output-equivalent (salt=1 AQE default vs salt=8)") {
    import spark.implicits._
    val docs = spark.createDataset((0 until 12).map(i =>
      graft.sources.SynthCorpus.genDoc(i.toLong, 60, skew = true, seed = 11L)))
    def tripleSet(salt: Int): Seq[String] = {
      val r = Pipeline.run(docs, graft.sources.SynthCorpus.BaseURI,
        Pipeline.Options(salt = salt, fusedPipeline = Some(false)))
      val out = r.triples.collect().map(_.toSeq.mkString("\u0001")).toSeq.sorted
      r.unpersist(); out
    }
    assert(tripleSet(1) == tripleSet(8))
  }

  test("docLocalFinish is output-identical to the global aggregate (triples + markers)") {
    import spark.implicits._
    // synthetic corpus with skewed mega-docs: exercises wrapper reuse (E6
    // min-prio canonicalization), every encoding tag, and multi-doc flushes
    val docs = spark.createDataset((0 until 12).map(i =>
      graft.sources.SynthCorpus.genDoc(i.toLong, 60, skew = true, seed = 11L)))
    def outputs(docLocal: Boolean): (Seq[String], Seq[String]) = {
      val r = Pipeline.run(docs, graft.sources.SynthCorpus.BaseURI,
        Pipeline.Options(docLocalFinish = Some(docLocal), fusedPipeline = Some(false)))
      val t = r.triples.collect().map(_.toSeq.mkString("")).toSeq.sorted
      val m = r.markersDF.collect().map(_.toSeq.mkString("")).toSeq.sorted
      r.unpersist(); (t, m)
    }
    val (aggT, aggM) = outputs(docLocal = false)
    val (locT, locM) = outputs(docLocal = true)
    assert(locT == aggT)
    assert(locM == aggM)
    // golden fixture corpus too, when mounted: the full branch surface
    if (graft.sources.FixtureDocs.available()) {
      val fix = spark.createDataset(graft.sources.FixtureDocs.docs())
      def fixSet(docLocal: Boolean): Seq[String] = {
        val r = Pipeline.run(fix, graft.sources.FixtureDocs.BaseURI,
          Pipeline.Options(docLocalFinish = Some(docLocal), fusedPipeline = Some(false)))
        val out = r.triples.collect().map(_.toSeq.mkString("")).toSeq.sorted
        r.unpersist(); out
      }
      assert(fixSet(docLocal = true) == fixSet(docLocal = false))
    }
  }

  test("fusedPipeline is output-identical to the staged path (both D1 settings)") {
    import spark.implicits._
    val docs = spark.createDataset((0 until 12).map(i =>
      graft.sources.SynthCorpus.genDoc(i.toLong, 60, skew = true, seed = 11L)) :+
      // duplicate-line doc: exercises the doc-local D1 canon/alias path
      ifcDoc("dup", "#1= IFCORGANIZATION($,'x',$,$,$);\n#2= IFCORGANIZATION($,'x',$,$,$);\n" +
        "#3= IFCAPPLICATION(#2,'v','a','b');\n"))
    def outputs(fused: Boolean, rmDup: Boolean): (Seq[String], Seq[String]) = {
      val r = Pipeline.run(docs, graft.sources.SynthCorpus.BaseURI,
        Pipeline.Options(fusedPipeline = Some(fused), removeDuplicates = rmDup))
      val t = r.triples.collect().map(_.toSeq.mkString("")).toSeq.sorted
      val m = r.markersDF.collect().map(_.toSeq.mkString("")).toSeq.sorted
      r.unpersist(); (t, m)
    }
    for (rmDup <- Seq(false, true)) {
      val (stagedT, stagedM) = outputs(fused = false, rmDup)
      val (fusedT, fusedM) = outputs(fused = true, rmDup)
      assert(fusedT == stagedT, s"triples diverge at removeDuplicates=$rmDup")
      assert(fusedM == stagedM, s"markers diverge at removeDuplicates=$rmDup")
    }
    // golden fixture corpus too, when mounted
    if (graft.sources.FixtureDocs.available()) {
      val fix = spark.createDataset(graft.sources.FixtureDocs.docs())
      def fixSet(fused: Boolean): Seq[String] = {
        val r = Pipeline.run(fix, graft.sources.FixtureDocs.BaseURI,
          Pipeline.Options(fusedPipeline = Some(fused)))
        val out = r.triples.collect().map(_.toSeq.mkString("")).toSeq.sorted
        r.unpersist(); out
      }
      assert(fixSet(fused = true) == fixSet(fused = false))
    }
  }

  test("docLocalFinish refuses checkpoint mode (contiguity contract)") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(ifcDoc("c0", "#1= IFCORGANIZATION($,'x',$,$,$);\n")))
    val e = intercept[IllegalArgumentException](
      Pipeline.run(docs, "http://b/", Pipeline.Options(
        docLocalFinish = Some(true), checkpointDir = Some("/tmp/graft-ckpt-refuse"))))
    assert(e.getMessage.contains("doc-contiguous"))
  }

  test("persistEmitted: markers after a triples action re-run no stage") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      ifcDoc("m0", "#1= IFCORGANIZATION($,'x',$,$,$);\n#2= IFCSIUNIT(*,.LENGTHUNIT.,$,.BOGUSENUM.);\n")))
    val r = Pipeline.run(docs, "http://b/", Pipeline.Options(persistEmitted = true))
    r.triples.count() // populates the Stage-C cache
    // the markers subtree must read the cache, not the A->B->C pipeline
    val plan = r.markers.queryExecution.executedPlan.toString
    withClue(plan) {
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        "markers must scan the persisted Stage-C candidate stream")
    }
    assert(r.markers.collect().exists(_.kind == "enum_miss"))
    r.unpersist()
  }

  test("CLI showFiles mirrors the reference's recursive discovery") {
    val dir = java.nio.file.Paths.get("/root/reference/src/test/resources/showfiles")
    assume(java.nio.file.Files.isDirectory(dir))
    val names = IfcToRdf.showFiles(dir).map(_.getFileName.toString).sorted
    // the reference's golden list (TestIfcSpfReader.java:76-92) names five
    // files; the tree shipped here carries two of them — discovery must
    // surface exactly what exists, recursing into nested/
    assert(names == Seq("20160414office_model_CV2_fordesign.ifc", "ootest.txt"))
  }

  test("CLI arg parsing: --baseURI consumes its value wherever it appears") {
    val a = IfcToRdf.parseArgs(Array("in.ifc", "out.ttl", "--baseURI", "http://x"))
    assert(a.baseURI == "http://x/" && !a.removeDuplicates && a.dir.isEmpty &&
      a.pos == Seq("in.ifc", "out.ttl") && a.format == "ttl" && a.schema.isEmpty)
    val b = IfcToRdf.parseArgs(
      Array("--keep-duplicates", "--dir", "/tmp/corpus", "--baseURI", "http://y/"))
    assert(b.baseURI == "http://y/" && b.removeDuplicates && b.dir.contains("/tmp/corpus") &&
      b.pos.isEmpty)
    val c = IfcToRdf.parseArgs(
      Array("--schema", "IFC4_ADD1", "--format", "nt", "in.ifc", "out.nt"))
    assert(c.schema.contains("IFC4_ADD1") && c.format == "nt" &&
      c.pos == Seq("in.ifc", "out.nt"))
  }

  test("schemaOverride reaches the non-sniffable dictionaries (IFC4_ADD1 et al.)") {
    import spark.implicits._
    // FILE_SCHEMA says IFC4 -> sniff would route to IFC4_ADD2_TC1; the
    // override must force the IFC4_ADD1 dictionary instead (reference:
    // explicit-schema convert overload, IfcSpfReader.java:243-245)
    val body = "ISO-10303-21;\nHEADER;\nFILE_SCHEMA(('IFC4'));\nENDSEC;\nDATA;\n" +
      "#1= IFCORGANIZATION($,'x',$,$,$);\nENDSEC;\nEND-ISO-10303-21;\n"
    val docs = spark.createDataset(Seq(
      graft.model.Doc("ov0", Seq(graft.model.Span("text", body, "", 0)))))
    for (ver <- Seq("IFC2X3_Final", "IFC4", "IFC4_ADD1", "IFC4_ADD2")) {
      val r = Pipeline.run(docs, "http://b/",
        Pipeline.Options(schemaOverride = Some(ver)))
      val preds = r.triples.select("pred").as[String].collect().toSet
      val alt = graft.schema.DictGen.ontAlt(ver)
      assert(preds.exists(_.contains(s"/IFC/DEV/${alt}OWL#")),
        s"$ver: expected ontology NS ${alt} in $preds")
      r.unpersist()
    }
  }

  test("S8 consumer seam: foreachTriplePartition visits every triple on executors") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(ifcDoc("c0", "#1= IFCORGANIZATION($,'x',$,$,$);\n")))
    val r = Pipeline.run(docs, "http://b/")
    val acc = spark.sparkContext.longAccumulator("seen")
    Pipeline.foreachTriplePartition(r.triples)(it => it.foreach(_ => acc.add(1)))
    assert(acc.value == r.triples.count())
    r.unpersist()
  }
}
