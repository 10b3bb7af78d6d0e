package graft

import graft.model.{Doc, Span}
import graft.operators.Pipeline

import java.nio.file.{Files, Paths}

/** End-to-end conversion of the reference's largest bundled input: the
  * 64,686-line IFC2X3 office model (3.18 MB) — exercises the IFC2X3_TC1
  * dictionary and a mega-document in one row. */
class OfficeModelSpec extends SparkTestBase {

  private val path = Paths.get(
    "/root/reference/src/test/resources/showfiles/nested/20160414office_model_CV2_fordesign.ifc")

  assume(Files.isRegularFile(path))

  test("office model converts without aborts and links every reference") {
    import spark.implicits._
    val text = Files.readString(path)
    val docs = spark.createDataset(Seq(Doc("office", Seq(Span("text", text, "", 0)))))
    val r = Pipeline.run(docs, "http://example.org/office/")
    val n = r.triples.count()
    assert(n > 100000, s"expected a large graph, got $n")
    val badKinds = r.markers.collect().map(_.kind).toSet
      .intersect(Set("dangling_ref", "unknown_entity", "crash", "unsupported_schema"))
    assert(badKinds.isEmpty, s"unexpected error markers: $badKinds")
    // schema actually resolved as IFC2X3_TC1
    val subjPrefix = r.triples.select("obj").where("pred like '%imports%'").collect()
    assert(subjPrefix.head.getString(0).contains("IFC2x3/TC1"))
    r.unpersist()
  }
}
