package graft

import java.nio.file.{Files, Paths}

/** End-to-end drive of the CLI conversion path (IfcToRdf.execute) on the
  * shared suite session: fixture .ifc in, .ttl/.nt files out, streamed
  * serialization byte-identical to the in-memory serializers. */
class CliSpec extends SparkTestBase {

  private def fixture(n: Int) = graft.sources.FixtureDocs.ifcPath(n)

  test("CLI converts a fixture to ttl and nt; streamed bytes == serialize()") {
    assume(graft.sources.FixtureDocs.available())
    val tmp = Files.createTempDirectory("graft-cli")
    val in = tmp.resolve("in.ifc")
    Files.copy(fixture(1), in)
    val outTtl = tmp.resolve("out.ttl")
    val outNt = tmp.resolve("out.nt")

    val cli = IfcToRdf.CliArgs()
    IfcToRdf.execute(cli, Seq(in), Seq(outTtl))(spark)
    IfcToRdf.execute(cli.copy(format = "nt"), Seq(in), Seq(outNt))(spark)

    val ttl = Files.readString(outTtl)
    assert(ttl.contains("@prefix ifc:") && ttl.contains(" ."))
    val nt = Files.readString(outNt)
    assert(nt.linesIterator.nonEmpty && nt.linesIterator.forall(l => l.endsWith(" .")))

    // streamed file output must be byte-identical to the string serializers
    // over the same triple set
    import spark.implicits._
    val docs = spark.createDataset(Seq(graft.model.Doc("f0",
      Seq(graft.model.Span("text", Files.readString(in), "", 0)))))
    val r = graft.operators.Pipeline.run(docs, cli.baseURI)
    val ts = r.triples.as[graft.model.FinalTriple].collect().toSeq
    val ontNS = "http://standards.buildingsmart.org/IFC/DEV/IFC4/ADD2_TC1/OWL#"
    assert(ttl == graft.sinks.TurtleSink.serialize(ts, cli.baseURI, ontNS))
    assert(nt == graft.sinks.NTriplesSink.serialize(ts))
    r.unpersist()
  }

  test("CLI --format nq emits quads carrying the document's graph label") {
    assume(graft.sources.FixtureDocs.available())
    val tmp = Files.createTempDirectory("graft-cli-nq")
    val in = tmp.resolve("in.ifc")
    Files.copy(fixture(1), in)
    val outNq = tmp.resolve("out.nq")
    IfcToRdf.execute(IfcToRdf.CliArgs(format = "nq"), Seq(in), Seq(outNq))(spark)
    val nq = Files.readString(outNq)
    // every line parses as a quad whose graph is the namespaced doc id,
    // and stripping the graph term yields exactly the NT serialization
    val rows = nq.linesIterator.map(l =>
      graft.sources.NQuadsSource.parseLine(l).get).toSeq
    assert(rows.nonEmpty && rows.forall(_.doc_id.startsWith("urn:graft:graph:")))
    val outNt = tmp.resolve("out.nt")
    IfcToRdf.execute(IfcToRdf.CliArgs(format = "nt"), Seq(in), Seq(outNt))(spark)
    val ntRows = Files.readString(outNt).linesIterator.map(l =>
      graft.sources.NTriplesSource.parseLine(l).get).toSeq
    assert(rows.map(r => (r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype))
      == ntRows.map(r => (r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype)))
  }

  test("CLI writes nothing for an aborted document (dangling ref)") {
    assume(graft.sources.FixtureDocs.available())
    val tmp = Files.createTempDirectory("graft-cli-abort")
    val in = tmp.resolve("in.ifc")
    Files.copy(fixture(6), in) // test6 = dangling-ref abort fixture
    val out = tmp.resolve("out.ttl")
    IfcToRdf.execute(IfcToRdf.CliArgs(), Seq(in), Seq(out))(spark)
    assert(!Files.exists(out), "aborted doc must flush nothing (reference file-sink semantics)")
  }
}
