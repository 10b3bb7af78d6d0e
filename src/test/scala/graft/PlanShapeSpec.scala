package graft

import graft.analytics.Battery

/** Physical-plan regressions for the analytics battery: the properties that
  * make these operators 100-TB-shaped must hold in the executed plan, not
  * just in intent — filter/column pushdown reaching the parquet scan,
  * broadcast (not shuffle) joins for small dimensions, and hash (not sort)
  * aggregation on the dedup paths. */
class PlanShapeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    // inside the test body (not the constructor): a missing fixture dir must
    // CANCEL the tests, not abort the suite with an escaped exception
    assume(new java.io.File(s"$sf/lineitem.parquet").exists())
    val df = Battery.queries(name)(spark, sf)
    df.collect() // settle AQE on the final plan
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  test("q01: filter is pushed into the parquet scan and columns are pruned") {
    val p = plan("q01_agg_pushdown")
    withClue(p) {
      assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
        "shipdate filter must reach the parquet reader")
      // projection needs 5 of lineitem's 16 columns; the scan must not read more
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_comment"),
        s"column pruning must drop unused columns: $readSchema")
    }
  }

  test("q02: small-dimension join is broadcast, not shuffled") {
    val p = plan("q02_join_broadcast")
    withClue(p) {
      assert(p.contains("BroadcastHashJoin"), "dim join must broadcast")
      assert(!p.contains("SortMergeJoin"), "no sort-merge for a 25-row dim")
    }
  }

  test("q11: exact dedup is a hash aggregate (no sorts)") {
    val p = plan("q11_dedup_exact")
    withClue(p) {
      assert(p.contains("HashAggregate"), "dedup must hash-aggregate")
      assert(!p.contains("SortAggregate"), "string-group dedup must not demote to SortAggregate")
    }
  }

  test("q12: the shingle-hash subtree is computed once and its exchange reused") {
    val p = plan("q12_dedup_jaccard")
    withClue(p) {
      // the df-cap window, the sizes aggregate, and both pair self-join
      // sides all hang off ONE h-partitioned exchange of the scan+shingle+
      // md5 pass — recomputing it per consumer was the 2x q12 regression
      assert(p.contains("ReusedExchange"),
        "shingle-hash exchange must be reused, not recomputed per branch")
    }
  }

  test("q23/q28: ANN candidate generation has no exploded pos-join") {
    for (q <- Seq("q23_dedup_embcos", "q28_ann_ivf")) {
      val p = plan(q)
      withClue(s"$q:\n$p") {
        // signatures/distances are narrow per-row expressions (BandedSig /
        // QuantL2 over broadcast arrays); a Generate(posexplode) before the
        // candidate join would mean the d-fold row explosion came back
        assert(!p.contains("posexplode(embedding"),
          "no per-element explosion of the embedding column")
      }
    }
  }

  test("ANN scoring stages run inside WholeStageCodegen") {
    // complements CodegenPinSpec (expression-level CODEGEN_ONLY): the
    // executed plan must actually place the quantized-scoring projections
    // inside WholeStageCodegen spans — a non-codegen-able operator in the
    // hot path would silently drop the whole stage to interpreted row
    // processing even when every expression compiles in isolation
    for (q <- Seq("q23_dedup_embcos", "q27_ann_lsh_banded", "q28_ann_ivf", "q30_ivf_assign")) {
      val p = plan(q)
      withClue(s"$q:\n$p") {
        // the AQE final-plan string renders a WholeStageCodegen span as a
        // `*(id)` operator prefix; the quant-scoring Project/Join operators
        // must carry one (an interpreted fallback prints them bare)
        val scoringCodegend = p.linesIterator.exists(l =>
          l.contains("*(") && (l.contains("graft_quant") || l.contains("Project")))
        assert(scoringCodegend,
          "scoring operators must sit inside a WholeStageCodegen (`*(n)`) span")
      }
    }
  }

  test("SPARQL pattern constants and negated property sets reach the parquet scan") {
    import graft.analytics.Sparql
    // a triples table ON DISK: pushdown is only observable on a file scan
    val dir = java.nio.file.Files.createTempDirectory("graft-planshape-sparql").toString + "/t"
    import spark.implicits._
    Seq(("d1", "a", "urn:p", "b"), ("d1", "b", "urn:q", "c"))
      .toDF("doc_id", "subj", "pred", "obj").write.parquet(dir)
    val triples = spark.read.parquet(dir)

    val bgp = Sparql.query(triples, "SELECT ?s ?o WHERE { ?s <urn:p> ?o }")
    bgp.collect()
    val p1 = bgp.queryExecution.executedPlan.toString
    withClue(p1)(assert(p1.contains("PushedFilters: [IsNotNull(pred), EqualTo(pred,urn:p)]"),
      "the constant-predicate filter must reach the parquet reader"))

    val nps = Sparql.query(triples, "SELECT ?s ?o WHERE { ?s !(<urn:p>) ?o }")
    nps.collect()
    val p2 = nps.queryExecution.executedPlan.toString
    withClue(p2)(assert(p2.contains("Not(EqualTo(pred,urn:p))"),
      "the negated-property-set filter must reach the parquet reader"))

    // GRAPH <iri> compiles to a plain graph-column predicate, so it must
    // push through the group's pattern scan down to the parquet reader too
    val gq = Sparql.query(triples, "SELECT ?s ?o WHERE { GRAPH <d1> { ?s <urn:p> ?o } }")
    gq.collect()
    val p3 = gq.queryExecution.executedPlan.toString
    withClue(p3)(assert(p3.contains("EqualTo(doc_id,d1)"),
      "the GRAPH <iri> filter must reach the parquet reader"))

    // FROM / FROM NAMED dataset clauses compile to the same pushed-down
    // graph-column membership filter GRAPH <iri> uses
    val fq = Sparql.query(triples, "SELECT ?s ?o FROM <d1> WHERE { ?s <urn:p> ?o }")
    fq.collect()
    val p5 = fq.queryExecution.executedPlan.toString
    withClue(p5)(assert(p5.contains("EqualTo(doc_id,d1)"),
      "the FROM <iri> filter must reach the parquet reader"))
    val fq2 = Sparql.query(triples,
      "SELECT ?s ?o FROM <d1> FROM <d2> WHERE { ?s <urn:p> ?o }")
    fq2.collect()
    val p6 = fq2.queryExecution.executedPlan.toString
    withClue(p6)(assert(p6.contains("In(doc_id, [d1,d2])"),
      "the multi-graph FROM membership filter must reach the parquet reader"))

    // the OPTIONAL LeftJoin-expr path: equality conjuncts must stay join
    // KEYS (hash/merge join, filter as residual) — a nested-loop join here
    // would go quadratic on a corpus-scale store
    val oq = Sparql.query(triples, """SELECT ?s ?o ?q WHERE {
      ?s <urn:p> ?o . OPTIONAL { ?s <urn:q> ?q FILTER (?o > 1) } }""")
    oq.collect()
    val p4 = oq.queryExecution.executedPlan.toString
    withClue(p4) {
      assert(!p4.contains("BroadcastNestedLoopJoin"),
        "hoisted OPTIONAL filter must not degrade the left join to a nested loop")
      assert(p4.contains("HashJoin") || p4.contains("SortMergeJoin"),
        "the left join must key on the shared columns")
    }
  }

  test("q63: eval grams and contaminated ids broadcast; the corpus is never sort-merge joined") {
    val p = plan("q63_decontaminate")
    withClue(p) {
      assert(p.contains("LeftSemi, BuildRight"),
        "the benchmark-sized eval-gram set must broadcast into the semi join")
      assert(p.contains("LeftAnti, BuildRight"),
        "the contaminated-id set must broadcast into the anti join")
      assert(!p.contains("SortMergeJoin"),
        "no corpus-vs-corpus sort-merge join anywhere in the decontamination plan")
    }
  }

  test("q65: the corpus pass is ONE map-side-combined histogram aggregate; windows run above it") {
    val p = plan("q65_corpus_stats")
    withClue(p) {
      // partial (map-side) aggregate keyed by (lang, n_chars) directly over the scan
      assert("HashAggregate\\(keys=\\[lang#\\d+, n_chars#\\d+L?\\], functions=\\[partial_".r
        .findFirstIn(p).isDefined,
        "the histogram must partial-aggregate map-side before any exchange")
      // both windows sit ABOVE the histogram aggregate (tree prints parents first),
      // i.e. the cumulative sums run over the tiny histogram, never the raw corpus
      val win = p.indexOf("Window [")
      val hist = "HashAggregate\\(keys=\\[lang#\\d+, n_chars#\\d+".r
        .findFirstMatchIn(p).map(_.start).getOrElse(-1)
      assert(win >= 0 && hist > win,
        "the median window must consume the histogram, not the raw documents")
      // the scan must not read doc_id (pruned: only text/lang/n_chars used)
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("doc_id"), s"column pruning must drop doc_id: $readSchema")
    }
  }

  test("q66: the per-doc top-3 is rank-limited BEFORE the doc_id exchange") {
    val p = plan("q66_tfidf_topk")
    withClue(p) {
      assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
        "rk <= 3 must push a partial per-partition top-k below the shuffle " +
          "(each map task ships at most 3 rows per doc, not the whole tf frame)")
    }
  }

  test("q89: the only single-partition exchange feeds off the shard AGGREGATE") {
    // the two-level prefix sum's contract: the corpus cumsum runs in
    // shard-partitioned windows; the one unpartitioned window (per-shard
    // offsets) may only consume the shard-totals aggregate — a
    // SinglePartition exchange over the raw docs frame would be the naive
    // global sort this decomposition exists to avoid
    val p = plan("q89_seq_pack")
    withClue(p) {
      val singles = "Exchange SinglePartition".r.findAllMatchIn(p).map(_.start).toList
      assert(singles.nonEmpty, "the per-shard offset window needs its tiny exchange")
      singles.foreach { i =>
        val below = p.substring(i, math.min(p.length, i + 400))
        assert(below.contains("HashAggregate"),
          "a SinglePartition exchange must sit above the shard-totals aggregate, " +
            "never above the raw docs scan")
      }
      assert(p.contains("Window ["), "intra-shard cumsum must be a Window")
    }
  }
}
