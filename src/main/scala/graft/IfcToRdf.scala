package graft

import graft.model.{Doc, FinalTriple, Span}
import graft.operators.Pipeline
import graft.schema.{DictGen, SchemaDict}
import graft.sinks.TurtleSink
import graft.operators.Tokenizer
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** CLI with the reference's surface (IfcSpfReader.main, IfcSpfReader.java:79-161):
  *
  *   runMain graft.IfcToRdf [--baseURI <uri>] [--keep-duplicates] <in.ifc> <out.ttl>
  *   runMain graft.IfcToRdf [--baseURI <uri>] [--keep-duplicates] --dir <directory>
  *
  * Every .ifc under the input becomes one interleaved-span document row; the
  * Spark pipeline converts the whole batch in one job; each document is then
  * serialized to its sibling .ttl (test-grade Turtle; the parquet triples
  * table is the production sink). The --keep-duplicates flag matches the
  * reference's (mislabeled) option: passing it ENABLES duplicate-line removal
  * (IfcSpfReader.java:80 vs :152).
  */
object IfcToRdf {

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--")).toBuffer
    val removeDuplicates = flags.contains("--keep-duplicates")
    val baseURI =
      if (flags.contains("--baseURI")) { val b = pos.remove(0); if (b.endsWith("/")) b else b + "/" }
      else "http://linkedbuildingdata.net/ifc/resources/"

    val (inputs, outputs): (Seq[Path], Seq[Path]) =
      if (flags.contains("--dir")) {
        val dir = Paths.get(pos.remove(0))
        val ins = Files.walk(dir).iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".ifc")).toSeq.sortBy(_.toString)
        (ins, ins.map(p => Paths.get(p.toString.stripSuffix(".ifc") + ".ttl")))
      } else {
        (Seq(Paths.get(pos.remove(0))), Seq(Paths.get(pos.remove(0))))
      }
    require(inputs.nonEmpty, "no .ifc inputs found")

    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-ifc2rdf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import spark.implicits._

    val docs = spark.createDataset(inputs.zipWithIndex.map { case (p, i) =>
      Doc(s"f$i", Seq(Span("text", Files.readString(p), "", 0)))
    })
    val result = Pipeline.run(docs, baseURI, removeDuplicates = removeDuplicates)
    val byDoc = result.triples.as[FinalTriple].collect().groupBy(_.doc_id)

    inputs.zipWithIndex.foreach { case (in, i) =>
      val schema = Tokenizer.sniffSchema(Files.readString(in))
      val ontNS = DictGen.ontAlt.get(schema)
        .map(alt => s"http://standards.buildingsmart.org/IFC/DEV/${alt}OWL#").getOrElse("")
      val ts = byDoc.getOrElse(s"f$i", Array.empty[FinalTriple]).toSeq
      Files.writeString(outputs(i), TurtleSink.serialize(ts, baseURI, ontNS))
      println(s"[ifc2rdf] $in -> ${outputs(i)} (${ts.size} triples)")
    }
    result.unpersist()
    spark.stop()
  }
}
