package graft

import java.nio.file.Files

import graft.sinks.NQuadsSink
import graft.sources.NQuadsSource

/** N-Quads source/sink pins: the statement core is shared with the NT pair
  * (NTriplesSourceSpec owns term-form/escape coverage); this spec pins the
  * GRAPH dimension — label forms, the default graph, the sink's doc_id
  * naming convention, per-file bnode scoping of graph labels, and the
  * distributed roundtrip. */
class NQuadsSpec extends SparkTestBase {

  test("parses graph label forms: IRI, blank node, and the default graph") {
    val g1 = NQuadsSource.parseLine("""<urn:s> <urn:p> "v" <urn:g1> .""").get
    assert(g1.doc_id == "urn:g1" && g1.obj == "v" && g1.obj_kind == "literal")
    val g2 = NQuadsSource.parseLine("<urn:s> <urn:p> <urn:o> _:gb .").get
    assert(g2.doc_id == "_:gb" && g2.obj_kind == "iri")
    val g3 = NQuadsSource.parseLine("<urn:s> <urn:p> _:o .").get
    assert(g3.doc_id == "" && g3.obj_kind == "bnode") // triple line = default graph
    // tagged literal + graph, no space before '.'
    val g4 = NQuadsSource.parseLine("""<urn:s> <urn:p> "x"@en <urn:g>.""").get
    assert(g4.doc_id == "urn:g" && g4.obj_lang == "en")
  }

  test("malformed graph terms fail loudly with position") {
    val e1 = intercept[IllegalArgumentException](
      NQuadsSource.parseLine("""<urn:s> <urn:p> "v" "g" ."""))
    assert(e1.getMessage.contains("col")) // literal can't be a graph label
    val e2 = intercept[IllegalArgumentException](
      NQuadsSource.parseLine("<urn:s> <urn:p> <urn:o> <urn:g> <urn:x> ."))
    assert(e2.getMessage.contains("col")) // a 5th term is not a statement
  }

  test("sink graph naming convention: bare id namespaced, IRI and bnode verbatim") {
    import spark.implicits._
    val df = Seq(
      ("test1", "urn:s", "urn:p", "o", "literal", ""),
      ("http://ex.org/g", "urn:s", "urn:p", "urn:o", "iri", ""),
      ("_:g9", "urn:s", "urn:p", "x", "literal", ""))
      .toDF("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype")
    val lines = df.select(NQuadsSink.line().as("v")).as[String].collect().toSet
    assert(lines == Set(
      """<urn:s> <urn:p> "o" <urn:graft:graph:test1> .""",
      """<urn:s> <urn:p> <urn:o> <http://ex.org/g> .""",
      """<urn:s> <urn:p> "x" _:g9 ."""))
  }

  test("distributed write -> read roundtrip keeps graphs; bnode graphs scope per file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("nq").toString
    val quads = Seq(
      ("http://ex.org/g1", "urn:s1", "urn:p", "plain", "literal", "", ""),
      ("http://ex.org/g2", "_:b1", "urn:p", "_:b2", "bnode", "", ""),
      ("docA", "urn:s2", "urn:p", "3", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", ""),
      ("docA", "urn:s2", "urn:q", "salut", "literal", "", "fr"))
      .toDF("doc_id", "subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang")
    NQuadsSink.write(quads.repartition(2), s"$dir/out")
    val back = NQuadsSource.read(spark, s"$dir/out")
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(3),
      r.getString(4), r.getString(5), r.getString(6))).toSet
    // graph IRIs verbatim, bare doc id namespaced, lang tag survives;
    // bnode labels relabeled per file but distinctness preserved
    assert(rows.count(_._1 == "http://ex.org/g1") == 1)
    assert(rows.exists(r => r._1 == "urn:graft:graph:docA" && r._3 == "3"
      && r._5 == "http://www.w3.org/2001/XMLSchema#integer"))
    assert(rows.exists(r => r._1 == "urn:graft:graph:docA" && r._3 == "salut" && r._6 == "fr"))
    val bn = back.filter("obj_kind = 'bnode'").collect()
    assert(bn.length == 1)
    val r = bn.head
    assert(r.getString(1).startsWith("_:f") && r.getString(3).startsWith("_:f")
      && r.getString(1) != r.getString(3)) // b1 vs b2 stay distinct
  }

  test("streaming NQ ingest: readStream text -> parse -> quads table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("nqstream").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.nq"),
      ("<urn:s1> <urn:p> \"1\" <urn:gA> .\n" +
       "<urn:s2> <urn:p> \"2\" <urn:gB> .\n").getBytes("UTF-8"))
    // continuous NQ ingest is the same one-liner as batch
    val q = NQuadsSource.parse(spark.readStream.text(dir).as[String])
      .writeStream.format("memory").queryName("nq_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("nq_stream").count() == 2)
    assert(spark.table("nq_stream").select("doc_id").as[String].collect().toSet
      == Set("urn:gA", "urn:gB"))
  }

  test("the parsed quads drop straight into the SPARQL layer as named graphs") {
    import spark.implicits._
    val lines = Seq(
      """<urn:s1> <urn:p> "1" <urn:gA> .""",
      """<urn:s2> <urn:p> "2" <urn:gB> .""").toDS()
    val store = NQuadsSource.parse(lines)
    val got = graft.analytics.Sparql.query(store,
      """SELECT ?v WHERE { GRAPH <urn:gA> { ?s <urn:p> ?v } }""")
      .select("v").as[String].collect().toSeq
    assert(got == Seq("1"))
  }
}
