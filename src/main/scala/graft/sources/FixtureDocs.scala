package graft.sources

import graft.model.{Doc, Span}

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthesis of the interleaved-span `docs` table from the
  * reference's golden regression corpus (FIXTURES.md §2): one row per
  * PiPauwel_IFCtoRDF_testN.ifc, its text packed into ≤120-char spans — split
  * mid-statement for N ∈ {3,12,13,16} to exercise statement re-assembly — with
  * a media span interleaved after every third text span. The pipeline must
  * skip media spans while preserving span order (per-row invariant).
  */
object FixtureDocs {

  val DefaultDir = "/root/reference/src/test/resources/convertIFCFileToOutputTTL"
  val BaseURI = "http://linkedbuildingdata.net/ifc/resources/"

  /** fixtures that are span-split mid-statement on purpose */
  private val midSplit = Set(3, 12, 13, 16)

  def fixtureIds: Seq[Int] = 1 to 19

  def docId(n: Int): String = f"t$n%02d"

  def ifcPath(n: Int, dir: String = DefaultDir): Path =
    Paths.get(dir, s"PiPauwel_IFCtoRDF_test$n.ifc")

  def ttlPath(n: Int, dir: String = DefaultDir): Path =
    Paths.get(dir, s"PiPauwel_IFCtoRDF_test$n.ttl")

  def available(dir: String = DefaultDir): Boolean = Files.isDirectory(Paths.get(dir))

  /** Build the interleaved doc for fixture N. Deterministic. */
  def doc(n: Int, dir: String = DefaultDir): Doc = {
    val text = Files.readString(ifcPath(n, dir))
    Doc(docId(n), interleave(docId(n), chunks(text, n)))
  }

  def docs(dir: String = DefaultDir): Seq[Doc] = fixtureIds.map(doc(_, dir))

  /** Pack text into ≤120-char chunks; by line for most fixtures, by raw
    * character count (mid-statement) for the midSplit set. */
  private def chunks(text: String, n: Int): Seq[String] = {
    if (midSplit.contains(n)) text.grouped(120).toSeq
    else {
      val out = ArrayBuffer[String]()
      val sb = new StringBuilder
      // keep newlines attached to their line so concatenation is lossless
      text.split("(?<=\n)", -1).foreach { line =>
        if (sb.nonEmpty && sb.length + line.length > 120) { out += sb.toString; sb.setLength(0) }
        sb.append(line)
      }
      if (sb.nonEmpty) out += sb.toString
      out.toSeq
    }
  }

  private def interleave(docId: String, cs: Seq[String]): Seq[Span] = {
    val spans = ArrayBuffer[Span]()
    var off = 0
    var k = 0
    cs.zipWithIndex.foreach { case (c, i) =>
      spans += Span("text", c, "", off); off += 1
      if ((i + 1) % 3 == 0) {
        spans += Span("media", "", s"m:$docId:$k", off); off += 1; k += 1
      }
    }
    spans.toSeq
  }
}
