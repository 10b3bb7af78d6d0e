package graft

import graft.model.Doc
import graft.operators.Pipeline
import graft.sources.FixtureDocs
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Session tuning the pipeline expects (AQE + skew join on; modest shuffle
    * parallelism for local[32]). Safe to call on an existing session. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark
  }

  /** The interleaved-span docs table synthesized from the reference's golden
    * corpus (FIXTURES.md §2). LOUD when the reference tree is not mounted:
    * the kg_* oracle is a committed expectation table derived from these
    * fixtures (expected/kg_*.parquet), so a silent fallback corpus would turn
    * an environment problem into a guaranteed every-row oracle mismatch.
    * Callers that can run without fixtures (Bench's kg_goldens probe, the
    * golden specs) gate on [[FixtureDocs.available]] themselves. */
  def goldenDocs(spark: SparkSession): org.apache.spark.sql.Dataset[Doc] = {
    import spark.implicits._
    require(FixtureDocs.available(),
      s"reference fixture corpus not mounted at ${FixtureDocs.DefaultDir} — " +
        "kg_triples/kg_markers are oracle-pinned to expected/kg_*.parquet, " +
        "which is derived from exactly that corpus")
    spark.createDataset(FixtureDocs.docs())
  }

  /** Flagship: the four-stage KG-construction pipeline over the golden corpus;
    * returns the final triples table. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = tune(spark)
    Pipeline.run(goldenDocs(spark), FixtureDocs.BaseURI).triples
  }

  private val goldenCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  /** The golden-corpus triples table, computed once per session and persisted.
    * The KG-query battery entries (q35-q42) read THIS, so they time the query
    * layer itself — kg_uniform/kg_skewed bench the construction pipeline; an
    * eight-fold pipeline re-run inside the query battery would measure
    * nothing new. Production queries run the same way: over the materialized
    * triples table, not a fresh pipeline invocation per query. */
  def goldenTriples(spark: SparkSession): DataFrame =
    goldenCache.computeIfAbsent(spark, s => {
      // localCheckpoint, not persist (round 6): the materialized store is a
      // LogicalRDD LEAF, so the ~90 queries planned over it carry a tiny
      // plan. A persisted frame kept the full pipeline lineage (now
      // including the decode stage's ~5 MB dictionary literals) inside the
      // cached relation, and CacheManager's per-query plan matching against
      // it measurably taxed EVERY golden-store query (~+0.3-0.6 s each).
      entry(s).localCheckpoint(true) // eager: first timed query is not the pipeline
    })

  /** One entry per implemented operator (SURVEY.md §2 and the training-data
    * battery). kg_* queries run the KG pipeline itself (not expressible as
    * SQL over the sf tables → rows-only check); the q* battery is
    * oracle-checked against DuckDB. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.analytics.Battery.queries ++ Map[String, (SparkSession, String) => DataFrame](
      "kg_triples" -> ((s, _) => entry(s)),
      "kg_markers" -> ((s, _) => {
        implicit val sp: SparkSession = tune(s)
        Pipeline.run(goldenDocs(s), FixtureDocs.BaseURI).markersDF
      }),
      // SPARQL-style BGP over the real pipeline output: adjacent list cells
      // with both values (subject-star join + object->subject chain join),
      // oracle = the literal three-way self-join over the expectation table
      "q35_kg_bgp_join" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{I, V}
        KgQuery.bgp(goldenTriples(s), Seq(
          (V("cell"), I(KgQuery.ListHasContents), V("v")),
          (V("cell"), I(KgQuery.ListHasNext), V("nxt")),
          (V("nxt"), I(KgQuery.ListHasContents), V("nv"))))
      }),
      // property-path list flatten (hasNext* closure + hasContents), oracle =
      // a recursive CTE walking the same chains over the expectation table
      "q36_kg_list_path" -> ((s, _) =>
        graft.analytics.KgQuery.listElements(goldenTriples(s))),
      // SPARQL FILTER NOT EXISTS (left-anti join): list cells with contents
      // but no successor — chain tails and singleton lists
      "q37_kg_not_exists" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{I, V}
        KgQuery.bgpNotExists(goldenTriples(s),
          Seq((V("cell"), I(KgQuery.ListHasContents), V("v"))),
          Seq((V("cell"), I(KgQuery.ListHasNext), V("n"))))
      }),
      // SPARQL OPTIONAL (left join): every contents cell with its successor
      // where one exists, NULL where the chain ends
      "q38_kg_optional" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{I, V}
        KgQuery.bgpOptional(goldenTriples(s),
          Seq((V("cell"), I(KgQuery.ListHasContents), V("v"))),
          Seq((V("cell"), I(KgQuery.ListHasNext), V("nxt"))))
      }),
      // SPARQL CONSTRUCT (KG-to-KG transform): derive symmetric adjacency
      // triples from the hasNext chains — two template triples per solution,
      // set semantics
      "q39_kg_construct" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{I, V}
        KgQuery.construct(goldenTriples(s),
          Seq((V("c"), I(KgQuery.ListHasNext), V("n"))),
          Seq((V("c"), I("urn:graft:adjacentTo"), V("n")),
            (V("n"), I("urn:graft:precededBy"), V("c"))))
      }),
      // SPARQL UNION (bag semantics, NULL-padded branch-only vars): a cell's
      // contents OR its successor — the alternation form of q38's OPTIONAL
      "q40_kg_union" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{I, V}
        KgQuery.bgpUnion(goldenTriples(s), Seq(
          Seq((V("cell"), I(KgQuery.ListHasContents), V("v"))),
          Seq((V("cell"), I(KgQuery.ListHasNext), V("nxt")))))
      }),
      // SPARQL DESCRIBE: the full subject-star of every list cell (content-
      // hash skolemization leaves no blank nodes, so subject-star = CBD)
      "q41_kg_describe" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{I, V}
        KgQuery.describe(goldenTriples(s),
          Seq((V("c"), I(KgQuery.ListHasContents), V("v"))), "c")
      }),
      // SPARQL SELECT + GROUP BY over a BGP: instance count and graph spread
      // per class — the KG-analytics histogram every ontology audit starts at
      "q42_kg_class_hist" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{I, V}
        import org.apache.spark.sql.functions.{count, countDistinct, lit, col}
        KgQuery.bgp(goldenTriples(s), Seq((V("i"), I(KgQuery.RdfType), V("cls"))))
          .groupBy(col("cls"))
          .agg(count(lit(1)).as("n"), countDistinct(col(KgQuery.GraphCol)).as("n_graphs"))
      }),
      // SPARQL 1.1 property path in a pattern: hasNext*/hasContents — every
      // list content reachable from each cell (closure + midpoint join)
      "q43_kg_path_reach" -> ((s, _) => {
        import graft.analytics.KgQuery
        import KgQuery.{P, PathSeq, Pred, Star, V}
        KgQuery.bgp(goldenTriples(s), Seq(
          (V("cell"), P(PathSeq(Star(Pred(KgQuery.ListHasNext)),
            Pred(KgQuery.ListHasContents))), V("content"))))
      }),
      // SPARQL TEXT front-end (parser + compiler, not the algebra API):
      // prologue, ';' shorthand, a three-pattern join, and a lexical FILTER
      "q44_sparql_select" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           SELECT ?cell ?v ?nv WHERE {
             ?cell list:hasContents ?v ; list:hasNext ?nxt .
             ?nxt list:hasContents ?nv .
             FILTER (?v != ?nv)
           }""")),
      // SPARQL TEXT aggregation: GROUP BY + COUNT through the text planner
      "q45_sparql_agg" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           SELECT ?cls (COUNT(?i) AS ?n) WHERE { ?i rdf:type ?cls } GROUP BY ?cls""")),
      // SPARQL TEXT property path: inverse over an alternation — parser must
      // build Inv(Alt(...)) and the compiler emit the swapped edge union
      "q46_sparql_path" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           SELECT ?o ?s WHERE { ?o ^(list:hasNext|list:hasContents) ?s }""")),
      // SPARQL TEXT HAVING + deterministic SAMPLE/GROUP_CONCAT: multi-member
      // classes with a representative and the sorted member roster
      "q47_sparql_having" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           SELECT ?cls (COUNT(?i) AS ?n) (SAMPLE(?i) AS ?one)
                  (GROUP_CONCAT(DISTINCT ?i; SEPARATOR="|") AS ?members)
           WHERE { ?i rdf:type ?cls } GROUP BY ?cls HAVING (COUNT(?i) > 1)""")),
      // SPARQL TEXT subquery + negated property set: each list cell's
      // contents joined to its count of non-hasContents out-edges (the
      // aggregate computed in a { SELECT … } subquery, the NPS a pushed-down
      // NOT-IN pred filter; the aggregating subquery drops the graph column
      // so the join is on the projected ?cell alone)
      "q48_sparql_subquery" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           SELECT ?cell ?v ?n WHERE {
             ?cell list:hasContents ?v .
             { SELECT ?cell (COUNT(?o) AS ?n)
               WHERE { ?cell !list:hasContents ?o } GROUP BY ?cell }
           }""")),
      // SPARQL 1.1 UPDATE: a DELETE/INSERT WHERE predicate rewrite over the
      // whole store — copy-on-write (anti join + union, no whole-store
      // distinct); the oracle is the equivalent relational CASE rewrite
      "q49_sparql_update" -> ((s, _) => graft.analytics.Sparql.update(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           DELETE { ?c list:hasNext ?n }
           INSERT { ?c <urn:graft:next> ?n }
           WHERE  { ?c list:hasNext ?n }""")
        .select("doc_id", "subj", "pred", "obj")),
      // SPARQL TEXT expression builtins: IF/STRLEN classification plus a
      // first-occurrence STRAFTER suffix split, both BIND-computed
      "q50_sparql_builtin" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           SELECT ?cell ?v ?tag ?tail WHERE {
             ?cell list:hasContents ?v .
             BIND(IF(STRLEN(?v) > 40, "long", "short") AS ?tag)
             BIND(STRAFTER(?v, "_") AS ?tail)
           }""")),
      // SPARQL GRAPH clause: ?g binds the named graph (the documents ARE the
      // graphs) and the GRAPH group same-graph-joins with the outer pattern;
      // plus a non-grouped (expression AS ?alias) computed projection
      "q51_sparql_graph" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           SELECT ?g ?cell ?v (CONCAT(?g, "/", ?cell) AS ?key) WHERE {
             ?cell list:hasContents ?v .
             GRAPH ?g { ?cell list:hasNext ?nxt }
           }""")),
      // SPARQL expression projections over aggregates: arithmetic and
      // builtins on synthetic agg columns (the HAVING mechanism), grouped
      "q52_sparql_exprproj" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           SELECT ?cls (CONCAT(?cls, "#", STR(COUNT(?i))) AS ?lbl)
                  ((COUNT(?i) * 2) AS ?dbl)
           WHERE { ?i rdf:type ?cls } GROUP BY ?cls""")),
      // SPARQL DISTINCT aggregates (COUNT/SUM over a BIND-computed column)
      "q53_sparql_distinct" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           SELECT ?cls (COUNT(DISTINCT ?i) AS ?nd) (SUM(DISTINCT ?len) AS ?sd)
           WHERE { ?i rdf:type ?cls . BIND(STRLEN(?i) AS ?len) } GROUP BY ?cls""")),
      // N-Triples SOURCE: serialize the whole store through the sink's
      // codegen'd line expression, parse every line back with the splittable
      // reader — the full wire roundtrip (escapes, datatypes, term kinds)
      // checked against the original table (xsd:string reads back as "", the
      // RDF 1.1 implicit-datatype rule canonical NT encodes by omission)
      // SPARQL OPTIONAL with an outer-referencing FILTER — the LeftJoin
      // (Ω1, Ω2, expr) rule: the filter rides the join condition over the
      // merged binding, non-matching cells keep a NULL-padded next pointer
      "q55_sparql_optfilter" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           SELECT ?cell ?v ?nxt WHERE {
             ?cell list:hasContents ?v .
             OPTIONAL { ?cell list:hasNext ?nxt FILTER (STRLEN(?v) > 40) }
           }""")),
      "q54_nt_roundtrip" -> ((s, _) => {
        val lines = goldenTriples(s)
          .select(graft.sinks.NTriplesSink.line().as("value"))
          .as(org.apache.spark.sql.Encoders.STRING)
        graft.sources.NTriplesSource.parse(lines)
          .select("subj", "pred", "obj", "obj_kind", "obj_datatype")
      }),
      // N-Quads roundtrip: serialize the golden store WITH its graph column
      // (doc_id → urn:graft:graph:<id> per the sink's naming convention),
      // parse it back, and recover the quads — the oracle applies the same
      // convention to the expected table
      "q86_nquads_roundtrip" -> ((s, _) => {
        val lines = goldenTriples(s)
          .select(graft.sinks.NQuadsSink.line().as("value"))
          .as(org.apache.spark.sql.Encoders.STRING)
        graft.sources.NQuadsSource.parse(lines)
          .select("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")
      }),
      // SPARQL typed-term layer: language tags ride the store's obj_lang
      // column and surface through LANG/LANGMATCHES/DATATYPE — the store is
      // the golden corpus with deterministic tags (length parity), so the
      // oracle replays the tagging rule relationally
      "q56_sparql_lang" -> ((s, _) => {
        import org.apache.spark.sql.functions.{col, length, lit, when}
        val tagged = goldenTriples(s).withColumn("obj_lang",
          when(length(col("obj")) % 3 === 1, lit("en")).otherwise(lit("fr")))
        graft.analytics.Sparql.query(tagged,
          """SELECT ?s ?p ?v (LANG(?v) AS ?tag) (DATATYPE(?v) AS ?dt)
             WHERE { ?s ?p ?v FILTER LANGMATCHES(LANG(?v), "en") }""")
      }),
      // SPARQL ASK (existence probe) as a 1-row frame so the last query
      // form gains a driver CORRECTNESS row; includes FROM-scoped probes
      "q57_sparql_ask" -> ((s, _) => {
        import s.implicits._
        val store = goldenTriples(s)
        def ask(text: String) = graft.analytics.Sparql.ask(store, text)
        Seq((
          ask("ASK { ?c <https://w3id.org/list#hasNext> ?n }"),
          ask("ASK { ?c <urn:graft:absent> ?o }"),
          ask("ASK FROM <t01> { ?i ?p ?o }"),
          ask("ASK FROM <t99> { ?i ?p ?o }")
        )).toDF("ask_pos", "ask_neg", "ask_from_pos", "ask_from_neg")
      }),
      // SPARQL FROM dataset clause: membership filter pushed to the scan
      "q58_sparql_from" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           SELECT ?i ?cls FROM <t01> FROM <t03> WHERE { ?i rdf:type ?cls }""")),
      // Negated property set with MIXED members (SPARQL 1.1 §18.4 split):
      // the forward scan excludes only rdf:type, the reversed scan only
      // hasContents/rdf:type — one NOT-IN filtered scan per side, unioned
      "q59_sparql_nps" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           PREFIX list: <https://w3id.org/list#>
           SELECT DISTINCT ?s ?o
           WHERE { ?s !(rdf:type|^list:hasContents|^rdf:type) ?o }""")),
      // SPARQL 1.1 Update dataset clauses: WITH scopes op 1's match+delete to
      // one graph and its GRAPH-template block directs the insert to a fresh
      // audit graph; op 2's USING restricts its WHERE like FROM while the
      // delete still hits the store (§3.1.3)
      "q60_sparql_with" -> ((s, _) => graft.analytics.Sparql.update(goldenTriples(s),
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           PREFIX list: <https://w3id.org/list#>
           WITH <t16>
           DELETE { ?c list:hasNext ?n }
           INSERT { GRAPH <urn:graft:audit> { ?c <urn:graft:unlinked> ?n } }
           WHERE  { ?c list:hasNext ?n } ;
           DELETE { ?i rdf:type ?cls }
           USING <t12> WHERE { ?i rdf:type ?cls }""")
        .select("doc_id", "subj", "pred", "obj")),
      // Blank-node pattern syntax: nested [ … ] property lists are scoped
      // existential variables — same plan as the q44 three-pattern join,
      // written the way working SPARQL users actually write it
      "q61_sparql_bnode" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX list: <https://w3id.org/list#>
           SELECT ?v ?nv WHERE {
             [ list:hasContents ?v ; list:hasNext [ list:hasContents ?nv ] ]
             FILTER (?v != ?nv)
           }""")),
      // §17.5 XPath constructor casts: xsd:double filters numerically
      // (uncastable lexical forms → NULL → dropped), the projected casts
      // land as typed columns (double / bigint)
      "q62_sparql_cast" -> ((s, _) => graft.analytics.Sparql.query(goldenTriples(s),
        """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
           SELECT ?s ?o (xsd:double(?o) AS ?num) (xsd:integer(?o) AS ?i)
           WHERE { ?s ?p ?o FILTER (xsd:double(?o) > 1) }""")),
      // W3C SPARQL 1.1 Results serializers over the WHOLE golden store —
      // term-retaining SELECT, then the TSV (full term syntax) / JSON-lines
      // (typed binding objects) renderers; both are pure codegen'd string
      // expressions, so the driver hash pins every escape and suffix rule
      "q74_sparql_tsv" -> ((s, _) => graft.analytics.SparqlResults.tsv(
        graft.analytics.Sparql.selectTerms(goldenTriples(s),
          "SELECT ?s ?p ?v WHERE { ?s ?p ?v }"))),
      "q75_sparql_json" -> ((s, _) => graft.analytics.SparqlResults.jsonLines(
        graft.analytics.Sparql.selectTerms(goldenTriples(s),
          "SELECT ?s ?p ?v WHERE { ?s ?p ?v }"))),
      "q76_sparql_csv" -> ((s, _) => graft.analytics.SparqlResults.csv(
        graft.analytics.Sparql.selectTerms(goldenTriples(s),
          "SELECT ?s ?p ?v WHERE { ?s ?p ?v }"))),
      "q77_sparql_xml" -> ((s, _) => graft.analytics.SparqlResults.xml(
        graft.analytics.Sparql.selectTerms(goldenTriples(s),
          "SELECT ?s ?p ?v WHERE { ?s ?p ?v }"))),
      // RDFS entailment materialization (ρdf: rdfs2/3/5/7/9/11) — the
      // reference's users run this step in a single-node Jena InfModel; here
      // it is two tiny graph-keyed closures + broadcast rule joins. The TBox
      // is deterministic: every asserted class under urn:graft:Artifact
      // (itself under Entity — a 2-hop chain), hasNext sp linked sp related
      // with domain/range on the DERIVED properties (exercises the
      // rdfs7-before-rdfs2/3 stratification), Cell sc Node (exercises
      // dom-derived types feeding rdfs9)
      "q78_rdfs" -> ((s, _) => {
        import s.implicits._
        import org.apache.spark.sql.functions.{col, lit}
        val store = goldenTriples(s)
        val classes = store.filter(col("pred") === graft.analytics.KgQuery.RdfType)
          .select(col("obj").as("subj")).distinct()
          .select(col("subj"), lit(graft.analytics.Rdfs.SubClassOf).as("pred"),
            lit("urn:graft:Artifact").as("obj"))
        val fixed = Seq(
          ("urn:graft:Artifact", graft.analytics.Rdfs.SubClassOf, "urn:graft:Entity"),
          (graft.analytics.KgQuery.ListHasNext, graft.analytics.Rdfs.SubPropertyOf, "urn:graft:linked"),
          ("urn:graft:linked", graft.analytics.Rdfs.SubPropertyOf, "urn:graft:related"),
          ("urn:graft:linked", graft.analytics.Rdfs.Domain, "urn:graft:Cell"),
          ("urn:graft:related", graft.analytics.Rdfs.Range, "urn:graft:Cell"),
          ("urn:graft:Cell", graft.analytics.Rdfs.SubClassOf, "urn:graft:Node")
        ).toDF("subj", "pred", "obj")
        // the augmented store is localCheckpointed before entailment: in
        // production the entail input IS a staged table (parquet), not a
        // lazy distinct+crossJoin union — without the cut, every rule scan
        // re-derives the union (6 redundant graph-list shuffles here)
        graft.analytics.Rdfs.entail(graft.analytics.Rdfs.withSchema(
          store, classes.unionByName(fixed)).localCheckpoint(true))
      }),
      // owl:sameAs smushing: every typed instance gains a 3-member identity
      // clique (i ← urn:a1:i ← urn:a2:i, linked by directed sameAs edges so
      // transitivity is exercised), an aliased type assertion (collapses
      // into the original after rewrite) and an alias-valued property (obj
      // rewrite). The oracle derives the expected output STRUCTURALLY
      // (canon is always the http-prefixed original — 'h' < 'u'), an
      // independent path from the engine's closure+min derivation
      "q79_sameas" -> ((s, _) => {
        import org.apache.spark.sql.functions.{col, concat, lit}
        val store = goldenTriples(s)
          .select(col("doc_id"), col("subj"), col("pred"), col("obj"))
        val types = store.filter(col("pred") === graft.analytics.KgQuery.RdfType)
        val a1 = concat(lit("urn:a1:"), col("subj"))
        val a2 = concat(lit("urn:a2:"), col("subj"))
        val sa = graft.analytics.SameAs.OwlSameAs
        val extra = types.select(col("doc_id"), a1.as("subj"),
            lit(sa).as("pred"), col("subj").as("obj"))
          .unionByName(types.select(col("doc_id"), a2.as("subj"),
            lit(sa).as("pred"), a1.as("obj")))
          .unionByName(types.select(col("doc_id"), a2.as("subj"),
            col("pred"), col("obj")))
          .unionByName(types.select(col("doc_id"), col("subj"),
            lit("urn:graft:seenAt").as("pred"), a1.as("obj")))
        graft.analytics.SameAs.resolve(store.unionByName(extra))
      }),
      // VoID dataset description (W3C note) of the pipeline store, emitted
      // as triples — core per-graph statistics plus property/class
      // partitions; the oracle recomputes every count independently in SQL
      "q81_void" -> ((s, _) => graft.analytics.VoidStats.describe(
        goldenTriples(s).select("doc_id", "subj", "pred", "obj"))),
      // RDF store delta: snapshot B is a deterministic "next revision" of
      // the golden store (list links dropped, a revision marker added per
      // typed subject); the diff is two quad-keyed anti joins. The oracle
      // recomputes both snapshots and EXCEPTs them independently.
      "q83_graph_diff" -> ((s, _) => {
        import org.apache.spark.sql.functions.{col, lit}
        val a = goldenTriples(s).select("doc_id", "subj", "pred", "obj")
        val b = a.filter(col("pred") =!= graft.analytics.KgQuery.ListHasNext)
          .unionByName(a.filter(col("pred") === graft.analytics.KgQuery.RdfType)
            .select(col("doc_id"), col("subj"),
              lit("urn:graft:rev").as("pred"), lit("2").as("obj")))
        graft.analytics.RdfDiff.diff(a, b)
      }),
      // entity property table: the KG→feature-frame bridge (one row per
      // typed entity, one column per selected predicate — what an ML
      // pipeline consumes). Conditional aggregation, NOT pivot: an explicit
      // column list keeps the schema static and the pass one map-side-
      // combinable (doc_id, subj)-keyed aggregate; value = min (the
      // deterministic representative), plus the total out-degree.
      "q87_entity_table" -> ((s, _) => {
        import org.apache.spark.sql.functions.{col, count, lit, min, when, sum}
        val preds = Seq(
          ("type_of", graft.analytics.KgQuery.RdfType),
          ("contents", graft.analytics.KgQuery.ListHasContents),
          ("next_cell", graft.analytics.KgQuery.ListHasNext))
        goldenTriples(s)
          .groupBy(col("doc_id"), col("subj"))
          .agg(
            count(lit(1)).as("out_degree"),
            preds.map { case (alias, p) =>
              min(when(col("pred") === p, col("obj"))).as(alias) }: _*)
      }),
      // OWL property-characteristics materialization: hasNext declared
      // transitive (list cells close into full reachability) and prevCell
      // declared its inverse (every closed chain inverts) — per graph; the
      // oracle recomputes the fixpoint as one recursive CTE + inversions
      "q91_owl" -> ((s, _) => {
        import org.apache.spark.sql.functions.{col, lit}
        val store = goldenTriples(s).select("doc_id", "subj", "pred", "obj")
        val graphs = store.select(col("doc_id")).distinct()
        val decls = graphs.select(col("doc_id"),
            lit(graft.analytics.KgQuery.ListHasNext).as("subj"),
            lit(graft.analytics.KgQuery.RdfType).as("pred"),
            lit(graft.analytics.Owl.TransitiveProperty).as("obj"))
          .unionByName(graphs.select(col("doc_id"),
            lit("urn:graft:prevCell").as("subj"),
            lit(graft.analytics.Owl.InverseOf).as("pred"),
            lit(graft.analytics.KgQuery.ListHasNext).as("obj")))
        // staged before entailment for the same reason as q78: the entail
        // input is a materialized table in production, not a lazy
        // distinct+union the rule branches would each re-derive
        graft.analytics.Owl.entail(store.unionByName(decls).localCheckpoint(true))
      }),
      // exact triangle count over the store's undirected iri→iri entity
      // graph, per document — the a<b<c ordered two-hop join; graphs with
      // no triangle produce no row (inner aggregate) in both engines
      "q92_triangles" -> ((s, _) => {
        import org.apache.spark.sql.functions.col
        graft.functions.GraphOps.triangleCount(
          goldenTriples(s).filter(col("obj_kind") === "iri")
            .select(col("doc_id").as("g"), col("subj").as("s"), col("obj").as("d")))
      }),
      // k-hop neighborhood aggregation (the GNN feature-engineering
      // primitive): per node, distinct out-neighbor count at exactly 1 hop
      // and distinct nodes reachable within 2 directed hops (start node
      // excluded) plus the lexicographic min 2-hop neighbor — one self-join
      // of the (graph, node)-keyed edge list, two combinable aggregates
      "q93_khop" -> ((s, _) => {
        import org.apache.spark.sql.functions._
        val e = goldenTriples(s).filter(col("obj_kind") === "iri")
          .select(col("doc_id").as("g"), col("subj").as("a"), col("obj").as("b"))
          .filter(col("a") =!= col("b")).distinct()
        val two = e.as("e1").join(e.as("e2"),
            col("e1.g") === col("e2.g") && col("e1.b") === col("e2.a"))
          .select(col("e1.g").as("g"), col("e1.a").as("a"), col("e2.b").as("n"))
        val reach = e.select(col("g"), col("a"), col("b").as("n"))
          .unionByName(two)
          .filter(col("a") =!= col("n")).distinct()
        val h1 = e.groupBy(col("g"), col("a"))
          .agg(countDistinct(col("b")).as("n_1hop"))
        h1.join(reach.groupBy(col("g"), col("a"))
            .agg(countDistinct(col("n")).as("n_2hop"), min(col("n")).as("min_2hop")),
          Seq("g", "a"))
      }),
      // GROUP BY expression keys (§18.2.4 GroupCondition): group the whole
      // golden store by the subject's IRI scheme prefix — the alias is
      // projected and drives HAVING
      "q90_sparql_groupexpr" -> ((s, _) => graft.analytics.Sparql.query(
        goldenTriples(s),
        """SELECT ?k (COUNT(*) AS ?n) WHERE { ?s ?p ?o }
           GROUP BY (STRLEN(STR(?s)) AS ?k) HAVING (COUNT(*) > 2)""")),
      // characteristic sets (Neumann & Moerkotte, ICDE 2011): the RDF
      // statistic planners estimate star joins with — group subjects by
      // their exact predicate SET. Two map-side-combinable aggregates:
      // (graph, subj) → sorted distinct pred list, then the set string →
      // (n_entities, sum of out-degrees). sort_array makes collect_set's
      // arbitrary order deterministic and cross-engine.
      "q88_char_sets" -> ((s, _) => {
        import org.apache.spark.sql.functions._
        goldenTriples(s)
          .groupBy(col("doc_id"), col("subj"))
          .agg(count(lit(1)).as("deg"),
            concat_ws(",", sort_array(collect_set(col("pred")))).as("cset"))
          .groupBy(col("doc_id"), col("cset"))
          .agg(count(lit(1)).as("n_entities"), sum(col("deg")).as("n_triples"))
      }),
      // SHACL-lite validation: three shapes over the golden store — one
      // fully conforming (express:INTEGER, exercising the zero-violation
      // path of four constraint kinds) and two violating (ontology nodes
      // fail minCount 2 + nodeKind literal; list cells fail maxCount 0 on
      // hasNext + an ^urn: pattern on hasContents). The oracle recomputes
      // every constraint as independent SQL.
      "q85_shacl" -> ((s, _) => {
        import graft.analytics.Shacl.{NodeShape, PropShape}
        graft.analytics.Shacl.validate(goldenTriples(s), Seq(
          NodeShape("s_int", "https://w3id.org/express#INTEGER", Seq(
            PropShape("https://w3id.org/express#hasInteger",
              minCount = Some(1L), maxCount = Some(1L),
              datatype = Some("http://www.w3.org/2001/XMLSchema#integer"),
              nodeKind = Some("literal")))),
          NodeShape("s_ont", "http://www.w3.org/2002/07/owl#Ontology", Seq(
            PropShape("http://www.w3.org/2002/07/owl#imports",
              minCount = Some(2L), nodeKind = Some("literal")))),
          NodeShape("s_cell",
            "http://standards.buildingsmart.org/IFC/DEV/IFC4/ADD2_TC1/OWL#IfcCartesianPoint_List",
            Seq(
              PropShape("https://w3id.org/list#hasNext", maxCount = Some(0L)),
              PropShape("https://w3id.org/list#hasContents",
                pattern = Some("^urn:"))))))
      }),
      // integer-exact PageRank (2 unrolled rounds, d = 0.85, 1e6 scale)
      // over the store's iri→iri edges, per graph; the oracle unrolls the
      // same two rounds as SQL CTEs
      "q84_pagerank" -> ((s, _) => {
        import org.apache.spark.sql.functions.col
        graft.functions.GraphOps.pageRank(
          goldenTriples(s).filter(col("obj_kind") === "iri")
            .select(col("doc_id").as("g"), col("subj").as("s"), col("obj").as("d")),
          "g", "s", "d", 2)
      })
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The kg_* flagship entries are checked against
    * the COMMITTED expectation tables (expected/kg_*.parquet, regenerated by
    * `ExpectedGen`, staleness-pinned by `ExpectedSpec`): the pipeline output
    * is byte-deterministic (content-hash skolemization), so the golden-corpus
    * triple set is a plain table and the oracle a plain SELECT — the
    * relational form of the reference's committed-.ttl golden compare
    * (TestIfcSpfReader.java:102-151). */
  def oracleSql: Map[String, String] = graft.analytics.Battery.oracleSql ++ Map(
    "kg_triples" ->
      s"""SELECT doc_id, subj, pred, obj, obj_kind, obj_datatype, src_line, slot
         FROM read_parquet('${ExpectedGen.TriplesFile}')""",
    "kg_markers" ->
      s"""SELECT doc_id, kind, line_id, detail
         FROM read_parquet('${ExpectedGen.MarkersFile}')""",
    "q35_kg_bgp_join" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT c1.doc_id AS graph, n.obj AS nxt, c1.subj AS cell, c1.obj AS v, c2.obj AS nv
       FROM c c1 JOIN n ON n.doc_id = c1.doc_id AND n.subj = c1.subj
                 JOIN c c2 ON c2.doc_id = n.doc_id AND c2.subj = n.obj""",
    "q36_kg_list_path" ->
      s"""WITH RECURSIVE trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       cont AS (SELECT doc_id, subj AS cell, obj AS content FROM trip
                WHERE pred = 'https://w3id.org/list#hasContents'),
       nxt AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasNext'),
       heads AS (SELECT c.doc_id, c.cell FROM cont c
                 LEFT JOIN nxt n ON n.doc_id = c.doc_id AND n.obj = c.cell
                 WHERE n.subj IS NULL),
       walk(doc_id, head, cell, pos) AS (
         SELECT doc_id, cell, cell, 0 FROM heads
         UNION ALL
         SELECT w.doc_id, w.head, n.obj, w.pos + 1
         FROM walk w JOIN nxt n ON n.doc_id = w.doc_id AND n.subj = w.cell)
       SELECT w.doc_id, w.head, w.pos, c.content
       FROM walk w JOIN cont c ON c.doc_id = w.doc_id AND c.cell = w.cell""",
    "q37_kg_not_exists" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id AS graph, subj AS cell, obj AS v FROM trip
             WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT doc_id AS graph, subj AS cell FROM trip
             WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT c.graph, c.cell, c.v FROM c ANTI JOIN n USING (graph, cell)""",
    "q38_kg_optional" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id AS graph, subj AS cell, obj AS v FROM trip
             WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT doc_id AS graph, subj AS cell, obj AS nxt FROM trip
             WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT c.graph, c.cell, c.v, n.nxt FROM c LEFT JOIN n USING (graph, cell)""",
    "q39_kg_construct" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       nx AS (SELECT doc_id, subj AS c, obj AS n FROM trip
              WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT DISTINCT doc_id, subj, pred, obj FROM (
         SELECT doc_id, c AS subj, 'urn:graft:adjacentTo' AS pred, n AS obj FROM nx
         UNION ALL
         SELECT doc_id, n AS subj, 'urn:graft:precededBy' AS pred, c AS obj FROM nx)""",
    "q40_kg_union" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT doc_id AS graph, subj AS cell, CAST(NULL AS VARCHAR) AS nxt, obj AS v
       FROM trip WHERE pred = 'https://w3id.org/list#hasContents'
       UNION ALL
       SELECT doc_id, subj, obj, CAST(NULL AS VARCHAR)
       FROM trip WHERE pred = 'https://w3id.org/list#hasNext'""",
    "q41_kg_describe" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT t.* FROM trip t
       WHERE EXISTS (SELECT 1 FROM trip c
                     WHERE c.pred = 'https://w3id.org/list#hasContents'
                       AND c.doc_id = t.doc_id AND c.subj = t.subj)""",
    "q42_kg_class_hist" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT obj AS cls, count(*) AS n, count(DISTINCT doc_id) AS n_graphs
       FROM trip
       WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
       GROUP BY 1""",
    "q43_kg_path_reach" ->
      s"""WITH RECURSIVE trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       n AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasNext'),
       c AS (SELECT doc_id, subj AS cell, obj AS content FROM trip
             WHERE pred = 'https://w3id.org/list#hasContents'),
       reach(doc_id, src, dst) AS (
         SELECT doc_id, subj, obj FROM n
         UNION
         SELECT r.doc_id, r.src, n2.obj FROM reach r
         JOIN n n2 ON n2.doc_id = r.doc_id AND n2.subj = r.dst),
       star AS (
         -- explicit DISTINCT over UNION ALL: DuckDB 1.0.0 fails to dedupe a
         -- chained bare UNION inside a CTE that references a recursive CTE
         -- (zero-length pairs came out twice, +1 multiplicity on 56 rows)
         SELECT DISTINCT doc_id, src, dst FROM (
           SELECT doc_id, src, dst FROM reach
           UNION ALL SELECT doc_id, subj, subj FROM trip
           UNION ALL SELECT doc_id, obj, obj FROM trip))
       SELECT s.doc_id AS graph, s.src AS cell, c.content
       FROM star s JOIN c ON c.doc_id = s.doc_id AND c.cell = s.dst""",
    "q44_sparql_select" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT c1.doc_id AS graph, c1.subj AS cell, c1.obj AS v, c2.obj AS nv
       FROM c c1 JOIN n ON n.doc_id = c1.doc_id AND n.subj = c1.subj
                 JOIN c c2 ON c2.doc_id = n.doc_id AND c2.subj = n.obj
       WHERE c1.obj <> c2.obj""",
    "q45_sparql_agg" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT obj AS cls, count(*) AS n FROM trip
       WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
       GROUP BY 1""",
    "q46_sparql_path" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT doc_id AS graph, obj AS o, subj AS s FROM trip
       WHERE pred IN ('https://w3id.org/list#hasNext',
                      'https://w3id.org/list#hasContents')""",
    "q47_sparql_having" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT obj AS cls, count(*) AS n, min(subj) AS one,
              string_agg(DISTINCT subj, '|' ORDER BY subj) AS members
       FROM trip
       WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
       GROUP BY 1 HAVING count(*) > 1""",
    "q48_sparql_subquery" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id, subj AS cell, obj AS v FROM trip
             WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT subj AS cell, count(*) AS n FROM trip
             WHERE pred <> 'https://w3id.org/list#hasContents' GROUP BY 1)
       SELECT c.doc_id AS graph, c.cell, c.v, n.n
       FROM c JOIN n ON n.cell = c.cell""",
    "q49_sparql_update" ->
      s"""SELECT doc_id, subj,
              CASE WHEN pred = 'https://w3id.org/list#hasNext'
                   THEN 'urn:graft:next' ELSE pred END AS pred, obj
       FROM read_parquet('${ExpectedGen.TriplesFile}')""",
    "q50_sparql_builtin" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT doc_id AS graph, subj AS cell, obj AS v,
              CASE WHEN length(obj) > 40 THEN 'long' ELSE 'short' END AS tag,
              CASE WHEN strpos(obj, '_') > 0
                   THEN substr(obj, strpos(obj, '_') + 1) ELSE '' END AS tail
       FROM trip WHERE pred = 'https://w3id.org/list#hasContents'""",
    "q51_sparql_graph" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT doc_id, subj FROM trip WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT c.doc_id AS graph, c.doc_id AS g, c.subj AS cell, c.obj AS v,
              c.doc_id || '/' || c.subj AS key
       FROM c JOIN n ON n.doc_id = c.doc_id AND n.subj = c.subj""",
    "q52_sparql_exprproj" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT obj AS cls, obj || '#' || CAST(count(*) AS VARCHAR) AS lbl,
              CAST(count(*) * 2 AS DOUBLE) AS dbl
       FROM trip
       WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
       GROUP BY 1""",
    "q53_sparql_distinct" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT obj AS cls, count(DISTINCT subj) AS nd,
              CAST(sum(DISTINCT length(subj)) AS DOUBLE) AS sd
       FROM trip
       WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
       GROUP BY 1""",
    "q55_sparql_optfilter" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT doc_id, subj, obj FROM trip WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT c.doc_id AS graph, c.subj AS cell, c.obj AS v, n.obj AS nxt
       FROM c LEFT JOIN n
         ON n.doc_id = c.doc_id AND n.subj = c.subj AND length(c.obj) > 40""",
    "q54_nt_roundtrip" ->
      s"""SELECT subj, pred, obj, obj_kind,
              CASE WHEN obj_kind = 'iri' THEN ''
                   WHEN obj_datatype = 'http://www.w3.org/2001/XMLSchema#string' THEN ''
                   ELSE obj_datatype END AS obj_datatype
       FROM read_parquet('${ExpectedGen.TriplesFile}')""",
    "q86_nquads_roundtrip" ->
      s"""SELECT 'urn:graft:graph:' || doc_id AS doc_id, subj, pred, obj, obj_kind,
              CASE WHEN obj_kind = 'iri' THEN ''
                   WHEN obj_datatype = 'http://www.w3.org/2001/XMLSchema#string' THEN ''
                   ELSE obj_datatype END AS obj_datatype
       FROM read_parquet('${ExpectedGen.TriplesFile}')""",
    "q56_sparql_lang" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT doc_id AS graph, subj AS s, pred AS p, obj AS v, 'en' AS tag,
              'http://www.w3.org/1999/02/22-rdf-syntax-ns#langString' AS dt
       FROM trip WHERE obj_kind = 'literal' AND length(obj) % 3 = 1""",
    "q57_sparql_ask" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT (SELECT count(*) FROM trip
               WHERE pred = 'https://w3id.org/list#hasNext') > 0 AS ask_pos,
              (SELECT count(*) FROM trip
               WHERE pred = 'urn:graft:absent') > 0 AS ask_neg,
              (SELECT count(*) FROM trip WHERE doc_id = 't01') > 0 AS ask_from_pos,
              (SELECT count(*) FROM trip WHERE doc_id = 't99') > 0 AS ask_from_neg""",
    "q58_sparql_from" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT doc_id AS graph, subj AS i, obj AS cls FROM trip
       WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
         AND doc_id IN ('t01', 't03')""",
    "q59_sparql_nps" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       e AS (
         SELECT doc_id, subj AS s, obj AS o FROM trip
         WHERE pred <> 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
         UNION ALL
         SELECT doc_id, obj AS s, subj AS o FROM trip
         WHERE pred NOT IN ('https://w3id.org/list#hasContents',
                            'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'))
       SELECT DISTINCT doc_id AS graph, s, o FROM e""",
    "q60_sparql_with" ->
      s"""WITH trip AS (SELECT doc_id, subj, pred, obj
               FROM read_parquet('${ExpectedGen.TriplesFile}')),
       m AS (SELECT subj, obj FROM trip WHERE doc_id = 't16'
             AND pred = 'https://w3id.org/list#hasNext')
       SELECT doc_id, subj, pred, obj FROM trip
       WHERE NOT (doc_id = 't16' AND pred = 'https://w3id.org/list#hasNext')
         AND NOT (doc_id = 't12'
                  AND pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')
       UNION ALL
       SELECT DISTINCT 'urn:graft:audit' AS doc_id, subj,
              'urn:graft:unlinked' AS pred, obj FROM m""",
    "q61_sparql_bnode" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       c AS (SELECT doc_id, subj, obj FROM trip
             WHERE pred = 'https://w3id.org/list#hasContents'),
       n AS (SELECT doc_id, subj, obj FROM trip
             WHERE pred = 'https://w3id.org/list#hasNext')
       SELECT c1.doc_id AS graph, c1.obj AS v, c2.obj AS nv
       FROM c c1 JOIN n ON n.doc_id = c1.doc_id AND n.subj = c1.subj
                 JOIN c c2 ON c2.doc_id = n.doc_id AND c2.subj = n.obj
       WHERE c1.obj <> c2.obj""",
    "q62_sparql_cast" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}'))
       SELECT doc_id AS graph, subj AS s, obj AS o,
              TRY_CAST(obj AS DOUBLE) AS num,
              CASE WHEN regexp_matches(obj, '^[+-]?[0-9]+$$')
                   THEN CAST(obj AS BIGINT) END AS i
       FROM trip WHERE TRY_CAST(obj AS DOUBLE) > 1""",
    // serializer mirrors: the same escape chains and term-syntax rules as
    // SparqlResults (tsvEscape/jsonEscape orders match literally); golden
    // IRIs/doc-ids carry no escapable characters, so their chains are
    // identity and only the literal object column is escaped
    "q74_sparql_tsv" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       e AS (SELECT doc_id, subj, pred, obj, obj_kind, obj_datatype,
               replace(replace(replace(replace(replace(obj,
                 '\\', '\\\\'), '"', '\\"'), chr(10), '\\n'), chr(13), '\\r'),
                 chr(9), '\\t') AS eo
             FROM trip)
       SELECT CAST(0 AS BIGINT) AS ord,
              '?graph' || chr(9) || '?s' || chr(9) || '?p' || chr(9) || '?v' AS line
       UNION ALL
       SELECT CAST(1 AS BIGINT),
              '"' || doc_id || '"' || chr(9) || '<' || subj || '>' || chr(9) ||
              '<' || pred || '>' || chr(9) ||
              CASE WHEN obj_kind = 'iri' THEN '<' || obj || '>'
                   WHEN obj_datatype <> ''
                        AND obj_datatype <> 'http://www.w3.org/2001/XMLSchema#string'
                     THEN '"' || eo || '"^^<' || obj_datatype || '>'
                   ELSE '"' || eo || '"' END
       FROM e""",
    "q75_sparql_json" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       e AS (SELECT doc_id, subj, pred, obj, obj_kind, obj_datatype,
               replace(replace(replace(replace(replace(replace(obj,
                 '\\', '\\\\'), '"', '\\"'), chr(10), '\\n'), chr(13), '\\r'),
                 chr(9), '\\t'), chr(8), '\\b') AS ej
             FROM trip)
       SELECT '{"graph":{"type":"literal","value":"' || doc_id ||
              '"},"s":{"type":"uri","value":"' || subj ||
              '"},"p":{"type":"uri","value":"' || pred || '"},"v":' ||
              CASE WHEN obj_kind = 'iri'
                     THEN '{"type":"uri","value":"' || ej || '"}'
                   WHEN obj_datatype <> ''
                        AND obj_datatype <> 'http://www.w3.org/2001/XMLSchema#string'
                     THEN '{"type":"literal","value":"' || ej ||
                          '","datatype":"' || obj_datatype || '"}'
                   ELSE '{"type":"literal","value":"' || ej || '"}' END || '}' AS line
       FROM e""",
    "q76_sparql_csv" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       f AS (SELECT doc_id, subj, pred, obj,
               CASE WHEN regexp_matches(obj, '[,"\\n\\r]')
                    THEN '"' || replace(obj, '"', '""') || '"' ELSE obj END AS fo
             FROM trip)
       SELECT CAST(0 AS BIGINT) AS ord, 'graph,s,p,v' AS line
       UNION ALL
       SELECT CAST(1 AS BIGINT), doc_id || ',' || subj || ',' || pred || ',' || fo
       FROM f""",
    "q77_sparql_xml" ->
      s"""WITH trip AS (SELECT * FROM read_parquet('${ExpectedGen.TriplesFile}')),
       e AS (SELECT doc_id, subj, pred, obj, obj_kind, obj_datatype,
               replace(replace(replace(obj,
                 '&', '&amp;'), '<', '&lt;'), '>', '&gt;') AS xo
             FROM trip)
       SELECT CAST(0 AS BIGINT) AS ord,
              '<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#">' ||
              '<head><variable name="graph"/><variable name="s"/>' ||
              '<variable name="p"/><variable name="v"/></head><results>' AS line
       UNION ALL
       SELECT CAST(1 AS BIGINT),
              '<result><binding name="graph"><literal>' || doc_id ||
              '</literal></binding><binding name="s"><uri>' || subj ||
              '</uri></binding><binding name="p"><uri>' || pred ||
              '</uri></binding><binding name="v">' ||
              CASE WHEN obj_kind = 'iri' THEN '<uri>' || xo || '</uri>'
                   WHEN obj_datatype <> ''
                        AND obj_datatype <> 'http://www.w3.org/2001/XMLSchema#string'
                     THEN '<literal datatype="' || obj_datatype || '">' || xo || '</literal>'
                   ELSE '<literal>' || xo || '</literal>' END ||
              '</binding></result>'
       FROM e
       UNION ALL
       SELECT CAST(2 AS BIGINT), '</results></sparql>'""",
    // ρdf entailment mirrored relationally: recursive CTEs for the sc/sp
    // closures, then the same stratified rule joins (rdfs7 → rdfs2/3 over
    // asserted∪derived properties → rdfs9 over asserted∪derived types)
    "q78_rdfs" ->
      s"""WITH RECURSIVE
       trip AS (SELECT doc_id, subj, pred, obj
                FROM read_parquet('${ExpectedGen.TriplesFile}')),
       graphs AS (SELECT DISTINCT doc_id FROM trip),
       tbox AS (
         SELECT DISTINCT obj AS subj,
                'http://www.w3.org/2000/01/rdf-schema#subClassOf' AS pred,
                'urn:graft:Artifact' AS obj
         FROM trip WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
         UNION ALL SELECT * FROM (VALUES
           ('urn:graft:Artifact',
            'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'urn:graft:Entity'),
           ('https://w3id.org/list#hasNext',
            'http://www.w3.org/2000/01/rdf-schema#subPropertyOf', 'urn:graft:linked'),
           ('urn:graft:linked',
            'http://www.w3.org/2000/01/rdf-schema#subPropertyOf', 'urn:graft:related'),
           ('urn:graft:linked',
            'http://www.w3.org/2000/01/rdf-schema#domain', 'urn:graft:Cell'),
           ('urn:graft:related',
            'http://www.w3.org/2000/01/rdf-schema#range', 'urn:graft:Cell'),
           ('urn:graft:Cell',
            'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'urn:graft:Node'))),
       store AS (SELECT * FROM trip
         UNION ALL
         SELECT g.doc_id, t.subj, t.pred, t.obj FROM graphs g CROSS JOIN tbox t),
       sc_e AS (SELECT doc_id, subj AS src, obj AS dst FROM store
                WHERE pred = 'http://www.w3.org/2000/01/rdf-schema#subClassOf'),
       sp_e AS (SELECT doc_id, subj AS src, obj AS dst FROM store
                WHERE pred = 'http://www.w3.org/2000/01/rdf-schema#subPropertyOf'),
       sc_p AS (SELECT * FROM sc_e
         UNION
         SELECT r.doc_id, r.src, e.dst FROM sc_p r
         JOIN sc_e e ON e.doc_id = r.doc_id AND e.src = r.dst),
       sp_p AS (SELECT * FROM sp_e
         UNION
         SELECT r.doc_id, r.src, e.dst FROM sp_p r
         JOIN sp_e e ON e.doc_id = r.doc_id AND e.src = r.dst),
       props AS (SELECT * FROM store
                 WHERE pred <> 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
       d7 AS (SELECT p.doc_id, p.subj, s.dst AS pred, p.obj FROM props p
              JOIN sp_p s ON s.doc_id = p.doc_id AND s.src = p.pred),
       ap AS (SELECT * FROM props UNION ALL SELECT * FROM d7),
       dm AS (SELECT doc_id, subj AS p, obj AS cls FROM store
              WHERE pred = 'http://www.w3.org/2000/01/rdf-schema#domain'),
       rg AS (SELECT doc_id, subj AS p, obj AS cls FROM store
              WHERE pred = 'http://www.w3.org/2000/01/rdf-schema#range'),
       t2 AS (SELECT a.doc_id, a.subj,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
                d.cls AS obj
              FROM ap a JOIN dm d ON d.doc_id = a.doc_id AND d.p = a.pred),
       t3 AS (SELECT a.doc_id, a.obj AS subj,
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
                r.cls AS obj
              FROM ap a JOIN rg r ON r.doc_id = a.doc_id AND r.p = a.pred),
       ty AS (SELECT * FROM store
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3),
       d9 AS (SELECT y.doc_id, y.subj, y.pred, s.dst AS obj FROM ty y
              JOIN sc_p s ON s.doc_id = y.doc_id AND s.src = y.obj)
       SELECT DISTINCT doc_id, subj, pred, obj FROM (
         SELECT * FROM store
         UNION ALL SELECT doc_id, src,
           'http://www.w3.org/2000/01/rdf-schema#subClassOf', dst FROM sc_p
         UNION ALL SELECT doc_id, src,
           'http://www.w3.org/2000/01/rdf-schema#subPropertyOf', dst FROM sp_p
         UNION ALL SELECT * FROM d7
         UNION ALL SELECT * FROM t2
         UNION ALL SELECT * FROM t3
         UNION ALL SELECT * FROM d9)""",
    // sameAs smushing expected output built structurally: the clique canon
    // is always the original IRI (http… < urn:… bytewise), so the rewrite
    // collapses the aliased type row into the asserted one, the alias-valued
    // property rewrites to the canon, and each alias keeps one provenance
    // sameAs row — no recursive closure needed on the oracle side
    "q79_sameas" ->
      s"""WITH trip AS (SELECT doc_id, subj, pred, obj
                FROM read_parquet('${ExpectedGen.TriplesFile}')),
       ty AS (SELECT doc_id, subj FROM trip
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type')
       SELECT DISTINCT doc_id, subj, pred, obj FROM (
         SELECT doc_id, subj, pred, obj FROM trip
         UNION ALL SELECT doc_id, subj, 'urn:graft:seenAt', subj FROM ty
         UNION ALL SELECT doc_id, 'urn:a1:' || subj,
           'http://www.w3.org/2002/07/owl#sameAs', subj FROM ty
         UNION ALL SELECT doc_id, 'urn:a2:' || subj,
           'http://www.w3.org/2002/07/owl#sameAs', subj FROM ty)""",
    "q81_void" ->
      s"""WITH trip AS (SELECT doc_id, subj, pred, obj
                FROM read_parquet('${ExpectedGen.TriplesFile}')),
       core AS (SELECT doc_id, 'urn:graft:void:' || doc_id AS ds,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(count(DISTINCT subj) AS BIGINT) AS ns,
                       CAST(count(DISTINCT pred) AS BIGINT) AS np,
                       CAST(count(DISTINCT obj) AS BIGINT) AS no,
                       CAST(count(DISTINCT CASE WHEN pred =
                         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                         THEN obj END) AS BIGINT) AS nc
                FROM trip GROUP BY 1),
       pp AS (SELECT doc_id, 'urn:graft:void:' || doc_id AS ds, pred AS p,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(count(DISTINCT subj) AS BIGINT) AS ns
              FROM trip GROUP BY 1, 2, 3),
       cp AS (SELECT doc_id, 'urn:graft:void:' || doc_id AS ds, obj AS c,
                     CAST(count(DISTINCT subj) AS BIGINT) AS ne
              FROM trip
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
              GROUP BY 1, 2, 3)
       SELECT doc_id, ds AS subj,
              'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
              'http://rdfs.org/ns/void#Dataset' AS obj FROM core
       UNION ALL SELECT doc_id, ds, 'http://rdfs.org/ns/void#triples',
              CAST(n AS VARCHAR) FROM core
       UNION ALL SELECT doc_id, ds, 'http://rdfs.org/ns/void#distinctSubjects',
              CAST(ns AS VARCHAR) FROM core
       UNION ALL SELECT doc_id, ds, 'http://rdfs.org/ns/void#properties',
              CAST(np AS VARCHAR) FROM core
       UNION ALL SELECT doc_id, ds, 'http://rdfs.org/ns/void#distinctObjects',
              CAST(no AS VARCHAR) FROM core
       UNION ALL SELECT doc_id, ds, 'http://rdfs.org/ns/void#classes',
              CAST(nc AS VARCHAR) FROM core
       UNION ALL SELECT doc_id, ds, 'http://rdfs.org/ns/void#propertyPartition',
              ds || ':prop:' || p FROM pp
       UNION ALL SELECT doc_id, ds || ':prop:' || p,
              'http://rdfs.org/ns/void#property', p FROM pp
       UNION ALL SELECT doc_id, ds || ':prop:' || p,
              'http://rdfs.org/ns/void#triples', CAST(n AS VARCHAR) FROM pp
       UNION ALL SELECT doc_id, ds || ':prop:' || p,
              'http://rdfs.org/ns/void#distinctSubjects', CAST(ns AS VARCHAR) FROM pp
       UNION ALL SELECT doc_id, ds, 'http://rdfs.org/ns/void#classPartition',
              ds || ':class:' || c FROM cp
       UNION ALL SELECT doc_id, ds || ':class:' || c,
              'http://rdfs.org/ns/void#class', c FROM cp
       UNION ALL SELECT doc_id, ds || ':class:' || c,
              'http://rdfs.org/ns/void#entities', CAST(ne AS VARCHAR) FROM cp""",
    "q83_graph_diff" ->
      s"""WITH trip AS (SELECT DISTINCT doc_id, subj, pred, obj
                FROM read_parquet('${ExpectedGen.TriplesFile}')),
       b AS (SELECT DISTINCT doc_id, subj, pred, obj FROM (
           SELECT doc_id, subj, pred, obj FROM trip
           WHERE pred <> 'https://w3id.org/list#hasNext'
           UNION ALL
           SELECT doc_id, subj, 'urn:graft:rev', '2' FROM trip
           WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'))
       SELECT doc_id, subj, pred, obj, '+' AS op
       FROM (SELECT doc_id, subj, pred, obj FROM b
             EXCEPT SELECT doc_id, subj, pred, obj FROM trip)
       UNION ALL
       SELECT doc_id, subj, pred, obj, '-' AS op
       FROM (SELECT doc_id, subj, pred, obj FROM trip
             EXCEPT SELECT doc_id, subj, pred, obj FROM b)""",
    "q84_pagerank" ->
      s"""WITH e AS (SELECT DISTINCT doc_id AS g, subj AS s, obj AS d
                FROM read_parquet('${ExpectedGen.TriplesFile}')
                WHERE obj_kind = 'iri'),
       outd AS (SELECT g, s, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1, 2),
       nodes AS (SELECT DISTINCT g, node FROM (
           SELECT g, s AS node FROM e UNION ALL SELECT g, d AS node FROM e)),
       pr0 AS (SELECT g, node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
       c1 AS (SELECT e.g, e.d AS node, SUM(p.pr // o.deg) AS m
              FROM e JOIN outd o ON o.g = e.g AND o.s = e.s
                     JOIN pr0 p ON p.g = e.g AND p.node = e.s
              GROUP BY 1, 2),
       pr1 AS (SELECT n.g, n.node,
                 CAST(150000 + (85 * COALESCE(c1.m, 0)) // 100 AS BIGINT) AS pr
               FROM nodes n LEFT JOIN c1 ON c1.g = n.g AND c1.node = n.node),
       c2 AS (SELECT e.g, e.d AS node, SUM(p.pr // o.deg) AS m
              FROM e JOIN outd o ON o.g = e.g AND o.s = e.s
                     JOIN pr1 p ON p.g = e.g AND p.node = e.s
              GROUP BY 1, 2),
       pr2 AS (SELECT n.g, n.node,
                 CAST(150000 + (85 * COALESCE(c2.m, 0)) // 100 AS BIGINT) AS pr
               FROM nodes n LEFT JOIN c2 ON c2.g = n.g AND c2.node = n.node)
       SELECT g, node, pr FROM pr2""",
    "q85_shacl" ->
      s"""WITH trip AS (SELECT doc_id, subj, pred, obj, obj_kind, obj_datatype
                FROM read_parquet('${ExpectedGen.TriplesFile}')),
       ty AS (SELECT doc_id, subj, obj FROM trip
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
       f1 AS (SELECT DISTINCT doc_id, subj AS focus FROM ty
              WHERE obj = 'https://w3id.org/express#INTEGER'),
       v1 AS (SELECT doc_id, subj AS focus, obj, obj_kind, obj_datatype FROM trip
              WHERE pred = 'https://w3id.org/express#hasInteger'),
       c1 AS (SELECT f.doc_id, f.focus, CAST(count(v.obj) AS BIGINT) AS n
              FROM f1 f LEFT JOIN v1 v ON v.doc_id = f.doc_id AND v.focus = f.focus
              GROUP BY 1, 2),
       f2 AS (SELECT DISTINCT doc_id, subj AS focus FROM ty
              WHERE obj = 'http://www.w3.org/2002/07/owl#Ontology'),
       v2 AS (SELECT doc_id, subj AS focus, obj, obj_kind FROM trip
              WHERE pred = 'http://www.w3.org/2002/07/owl#imports'),
       c2 AS (SELECT f.doc_id, f.focus, CAST(count(v.obj) AS BIGINT) AS n
              FROM f2 f LEFT JOIN v2 v ON v.doc_id = f.doc_id AND v.focus = f.focus
              GROUP BY 1, 2),
       f3 AS (SELECT DISTINCT doc_id, subj AS focus FROM ty
              WHERE obj = 'http://standards.buildingsmart.org/IFC/DEV/IFC4/ADD2_TC1/OWL#IfcCartesianPoint_List'),
       v3n AS (SELECT doc_id, subj AS focus, obj FROM trip
               WHERE pred = 'https://w3id.org/list#hasNext'),
       c3 AS (SELECT f.doc_id, f.focus, CAST(count(v.obj) AS BIGINT) AS n
              FROM f3 f LEFT JOIN v3n v ON v.doc_id = f.doc_id AND v.focus = f.focus
              GROUP BY 1, 2),
       v3c AS (SELECT doc_id, subj AS focus, obj FROM trip
               WHERE pred = 'https://w3id.org/list#hasContents')
       SELECT doc_id, focus, 's_int' AS shape,
              'https://w3id.org/express#hasInteger' AS path,
              'minCount' AS constraint, CAST(n AS VARCHAR) AS detail
         FROM c1 WHERE n < 1
       UNION ALL SELECT doc_id, focus, 's_int',
              'https://w3id.org/express#hasInteger', 'maxCount', CAST(n AS VARCHAR)
         FROM c1 WHERE n > 1
       UNION ALL SELECT v.doc_id, v.focus, 's_int',
              'https://w3id.org/express#hasInteger', 'datatype', v.obj
         FROM f1 f JOIN v1 v ON v.doc_id = f.doc_id AND v.focus = f.focus
         WHERE v.obj_datatype <> 'http://www.w3.org/2001/XMLSchema#integer'
       UNION ALL SELECT v.doc_id, v.focus, 's_int',
              'https://w3id.org/express#hasInteger', 'nodeKind', v.obj
         FROM f1 f JOIN v1 v ON v.doc_id = f.doc_id AND v.focus = f.focus
         WHERE v.obj_kind <> 'literal'
       UNION ALL SELECT doc_id, focus, 's_ont',
              'http://www.w3.org/2002/07/owl#imports', 'minCount', CAST(n AS VARCHAR)
         FROM c2 WHERE n < 2
       UNION ALL SELECT v.doc_id, v.focus, 's_ont',
              'http://www.w3.org/2002/07/owl#imports', 'nodeKind', v.obj
         FROM f2 f JOIN v2 v ON v.doc_id = f.doc_id AND v.focus = f.focus
         WHERE v.obj_kind <> 'literal'
       UNION ALL SELECT doc_id, focus, 's_cell',
              'https://w3id.org/list#hasNext', 'maxCount', CAST(n AS VARCHAR)
         FROM c3 WHERE n > 0
       UNION ALL SELECT v.doc_id, v.focus, 's_cell',
              'https://w3id.org/list#hasContents', 'pattern', v.obj
         FROM f3 f JOIN v3c v ON v.doc_id = f.doc_id AND v.focus = f.focus
         WHERE NOT regexp_matches(v.obj, '^urn:')""",
    "q87_entity_table" ->
      s"""SELECT doc_id, subj, CAST(count(*) AS BIGINT) AS out_degree,
              MIN(CASE WHEN pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                  THEN obj END) AS type_of,
              MIN(CASE WHEN pred = 'https://w3id.org/list#hasContents'
                  THEN obj END) AS contents,
              MIN(CASE WHEN pred = 'https://w3id.org/list#hasNext'
                  THEN obj END) AS next_cell
       FROM read_parquet('${ExpectedGen.TriplesFile}')
       GROUP BY 1, 2""",
    "q88_char_sets" ->
      s"""WITH per AS (SELECT doc_id, subj, CAST(count(*) AS BIGINT) AS deg,
                array_to_string(list_sort(list(DISTINCT pred)), ',') AS cset
              FROM read_parquet('${ExpectedGen.TriplesFile}')
              GROUP BY 1, 2)
       SELECT doc_id, cset, CAST(count(*) AS BIGINT) AS n_entities,
              CAST(SUM(deg) AS BIGINT) AS n_triples
       FROM per GROUP BY 1, 2""",
    "q90_sparql_groupexpr" ->
      s"""SELECT CAST(length(subj) AS INT) AS k, CAST(count(*) AS BIGINT) AS n
       FROM read_parquet('${ExpectedGen.TriplesFile}')
       GROUP BY 1 HAVING count(*) > 2""",
    "q91_owl" ->
      s"""WITH RECURSIVE
       trip AS (SELECT doc_id, subj, pred, obj
                FROM read_parquet('${ExpectedGen.TriplesFile}')),
       graphs AS (SELECT DISTINCT doc_id FROM trip),
       decls AS (SELECT doc_id, 'https://w3id.org/list#hasNext' AS subj,
                   'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
                   'http://www.w3.org/2002/07/owl#TransitiveProperty' AS obj
                 FROM graphs
         UNION ALL SELECT doc_id, 'urn:graft:prevCell',
                   'http://www.w3.org/2002/07/owl#inverseOf',
                   'https://w3id.org/list#hasNext' FROM graphs),
       base AS (SELECT * FROM trip UNION ALL SELECT * FROM decls),
       nxt AS (SELECT doc_id, subj, obj FROM base
               WHERE pred = 'https://w3id.org/list#hasNext'),
       cl AS (SELECT doc_id, subj AS src, obj AS dst FROM nxt
         UNION
         SELECT c.doc_id, c.src, n.obj FROM cl c
         JOIN nxt n ON n.doc_id = c.doc_id AND n.subj = c.dst)
       SELECT DISTINCT doc_id, subj, pred, obj FROM (
         SELECT doc_id, subj, pred, obj FROM base
         UNION ALL SELECT doc_id, src, 'https://w3id.org/list#hasNext', dst FROM cl
         UNION ALL SELECT doc_id, dst, 'urn:graft:prevCell', src FROM cl)""",
    "q92_triangles" ->
      s"""WITH e AS (SELECT DISTINCT doc_id AS g,
                LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b
              FROM read_parquet('${ExpectedGen.TriplesFile}')
              WHERE obj_kind = 'iri' AND subj <> obj)
       SELECT e1.g, CAST(count(*) AS BIGINT) AS n_triangles
       FROM e e1
       JOIN e e2 ON e2.g = e1.g AND e2.a = e1.b
       JOIN e e3 ON e3.g = e1.g AND e3.a = e1.a AND e3.b = e2.b
       GROUP BY 1""",
    "q93_khop" ->
      s"""WITH e AS (SELECT DISTINCT doc_id AS g, subj AS a, obj AS b
              FROM read_parquet('${ExpectedGen.TriplesFile}')
              WHERE obj_kind = 'iri' AND subj <> obj),
       two AS (SELECT e1.g, e1.a, e2.b AS n FROM e e1
               JOIN e e2 ON e2.g = e1.g AND e2.a = e1.b),
       reach AS (SELECT DISTINCT g, a, n FROM (
           SELECT g, a, b AS n FROM e UNION ALL SELECT g, a, n FROM two)
         WHERE a <> n),
       h1 AS (SELECT g, a, CAST(count(DISTINCT b) AS BIGINT) AS n_1hop
              FROM e GROUP BY 1, 2),
       h2 AS (SELECT g, a, CAST(count(DISTINCT n) AS BIGINT) AS n_2hop,
                     MIN(n) AS min_2hop
              FROM reach GROUP BY 1, 2)
       SELECT h1.g, h1.a, h1.n_1hop, h2.n_2hop, h2.min_2hop
       FROM h1 JOIN h2 ON h2.g = h1.g AND h2.a = h1.a""")
}
