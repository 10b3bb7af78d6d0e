package graft

import graft.model.{Doc, FinalTriple, Span}
import graft.operators.Pipeline
import graft.schema.DictGen
import graft.sinks.TurtleSink
import graft.operators.Tokenizer
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}

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
  *
  * Known divergence from the reference, deliberate: the reference's default
  * baseURI embeds a wall-clock timestamp (IfcSpfReader.java:83-84); this CLI
  * uses a fixed default so conversions are byte-deterministic across runs.
  */
object IfcToRdf {

  /** Recursive file discovery (S1), mirroring the reference's showFiles
    * (IfcSpfReader.java:169-184): every regular file under `dir`, any
    * extension (the .ifc filter is applied by the caller, as the reference
    * does in main, IfcSpfReader.java:127-140). Sorted for determinism (the
    * reference's listFiles order is fs-dependent; its own test sorts). */
  def showFiles(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(dir)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
    finally s.close()
  }

  /** Positional argument parsing: `--baseURI` consumes the NEXT token, so
    * `in.ifc out.ttl --baseURI http://x/` no longer steals `in.ifc`. */
  private[graft] def parseArgs(args: Array[String]): (String, Boolean, Option[String], Seq[String]) = {
    var baseURI = "http://linkedbuildingdata.net/ifc/resources/"
    var removeDuplicates = false
    var dir: Option[String] = None
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--baseURI" =>
          require(i + 1 < args.length, "--baseURI requires a value")
          val b = args(i + 1); baseURI = if (b.endsWith("/")) b else b + "/"; i += 1
        case "--keep-duplicates" => removeDuplicates = true
        case "--dir" =>
          require(i + 1 < args.length, "--dir requires a value")
          dir = Some(args(i + 1)); i += 1
        case other => pos += other
      }
      i += 1
    }
    (baseURI, removeDuplicates, dir, pos.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val (baseURI, removeDuplicates, dirOpt, pos) = parseArgs(args)

    val (inputs, outputs): (Seq[Path], Seq[Path]) = dirOpt match {
      case Some(d) =>
        val ins = showFiles(Paths.get(d)).filter(_.toString.endsWith(".ifc"))
        (ins, ins.map(p => Paths.get(p.toString.stripSuffix(".ifc") + ".ttl")))
      case None =>
        require(pos.length >= 2, "usage: [--baseURI <uri>] [--keep-duplicates] <in.ifc> <out.ttl>")
        (Seq(Paths.get(pos(0))), Seq(Paths.get(pos(1))))
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

    // per-doc output path + ontology namespace, resolved on the driver (one
    // entry per input file — small), shipped in the task closure
    val meta: Map[String, (String, String)] = inputs.zip(outputs).zipWithIndex.map {
      case ((in, out), i) =>
        val schema = Tokenizer.sniffSchema(Files.readString(in))
        val ontNS = DictGen.ontAlt.get(schema)
          .map(alt => s"http://standards.buildingsmart.org/IFC/DEV/${alt}OWL#").getOrElse("")
        s"f$i" -> (out.toString, ontNS)
    }.toMap

    val docs = spark.createDataset(inputs.zipWithIndex.map { case (p, i) =>
      Doc(s"f$i", Seq(Span("text", Files.readString(p), "", 0)))
    })
    val result = Pipeline.run(docs, baseURI, removeDuplicates = removeDuplicates)

    // Distributed serialization: each document's triples are grouped onto one
    // executor task and its .ttl written from there — no driver-side collect
    // of the triple stream (a whole-batch collect would bottleneck the driver
    // when --dir points at a large corpus). In local mode the executor shares
    // the filesystem; on a cluster, point outputs at a shared mount.
    val base = baseURI
    val written = result.triples.as[FinalTriple]
      .groupByKey(_.doc_id)
      .mapGroups { (docId, it) =>
        val (out, ontNS) = meta(docId)
        val ts = it.toSeq
        Files.writeString(Paths.get(out), TurtleSink.serialize(ts, base, ontNS))
        (docId, out, ts.size)
      }
      .collect().sortBy(_._1)

    // docs whose conversion aborted (dangling refs) produce no triples at all
    // — write nothing for them, like the reference's silent file-sink flush
    written.foreach { case (_, out, n) => println(s"[ifc2rdf] -> $out ($n triples)") }
    meta.keySet.diff(written.map(_._1).toSet).toSeq.sorted.foreach { d =>
      println(s"[ifc2rdf] ${meta(d)._1}: no output (document aborted or empty)")
    }
    result.unpersist()
    spark.stop()
  }
}
