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
  *   runMain graft.IfcToRdf [flags] <in.ifc> <out.{ttl,nt,nq}>
  *   runMain graft.IfcToRdf [flags] --dir <directory>
  *   flags: [--baseURI <uri>] [--keep-duplicates] [--schema <ver>] [--format ttl|nt|nq]
  *
  * `--schema` mirrors the reference's explicit-schema convert overload
  * (IfcSpfReader.java:243-245) and reaches the 4 non-sniffable compiled
  * dictionaries (IFC2X3_Final, IFC4, IFC4_ADD1, IFC4_ADD2); `--format nt`
  * writes N-Triples (scale-grade line export) instead of Turtle.
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

  final case class CliArgs(
      baseURI: String = "http://linkedbuildingdata.net/ifc/resources/",
      removeDuplicates: Boolean = false,
      dir: Option[String] = None,
      /** explicit EXPRESS version (reference's convert(path,out,schema)
        * overload) — reaches the 4 non-sniffable compiled dictionaries */
      schema: Option[String] = None,
      /** "ttl" (default, reference parity), "nt" or "nq" (scale-grade line exports) */
      format: String = "ttl",
      pos: Seq[String] = Nil)

  /** Positional argument parsing: value flags consume the NEXT token, so
    * `in.ifc out.ttl --baseURI http://x/` no longer steals `in.ifc`. */
  private[graft] def parseArgs(args: Array[String]): CliArgs = {
    var a = CliArgs()
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    def value(flag: String): String = {
      require(i + 1 < args.length, s"$flag requires a value"); i += 1; args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "--baseURI" =>
          val b = value("--baseURI"); a = a.copy(baseURI = if (b.endsWith("/")) b else b + "/")
        case "--keep-duplicates" => a = a.copy(removeDuplicates = true)
        case "--dir" => a = a.copy(dir = Some(value("--dir")))
        case "--schema" => a = a.copy(schema = Some(value("--schema")))
        case "--format" =>
          val f = value("--format")
          require(f == "ttl" || f == "nt" || f == "nq",
            s"--format must be ttl, nt or nq, got $f")
          a = a.copy(format = f)
        case other => pos += other
      }
      i += 1
    }
    a.copy(pos = pos.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val cli = parseArgs(args)
    val CliArgs(baseURI, removeDuplicates, dirOpt, schemaOv, format, pos) = cli

    val ext = "." + format
    val (inputs, outputs): (Seq[Path], Seq[Path]) = dirOpt match {
      case Some(d) =>
        val ins = showFiles(Paths.get(d)).filter(_.toString.endsWith(".ifc"))
        (ins, ins.map(p => Paths.get(p.toString.stripSuffix(".ifc") + ext)))
      case None =>
        require(pos.length >= 2,
          "usage: [--baseURI <uri>] [--keep-duplicates] [--schema <ver>] [--format ttl|nt|nq] <in.ifc> <out>")
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
    execute(cli, inputs, outputs)(spark)
    spark.stop()
  }

  /** The conversion itself, on a caller-owned session (main owns its session
    * lifecycle; tests drive this directly with the shared suite session). */
  private[graft] def execute(cli: CliArgs, inputs: Seq[Path], outputs: Seq[Path])
                            (implicit spark: SparkSession): Unit = {
    val CliArgs(baseURI, removeDuplicates, _, schemaOv, format, _) = cli
    import spark.implicits._

    // per-doc output path + ontology namespace, resolved on the driver (one
    // entry per input file — small), shipped in the task closure
    val meta: Map[String, (String, String)] = inputs.zip(outputs).zipWithIndex.map {
      case ((in, out), i) =>
        val schema = schemaOv.getOrElse(Tokenizer.sniffSchema(Files.readString(in)))
        val ontNS = DictGen.ontAlt.get(schema)
          .map(alt => s"http://standards.buildingsmart.org/IFC/DEV/${alt}OWL#").getOrElse("")
        s"f$i" -> (out.toString, ontNS)
    }.toMap

    val docs = spark.createDataset(inputs.zipWithIndex.map { case (p, i) =>
      Doc(s"f$i", Seq(Span("text", Files.readString(p), "", 0)))
    })
    val result = Pipeline.run(docs, baseURI,
      Pipeline.Options(removeDuplicates = removeDuplicates, schemaOverride = schemaOv))

    // Distributed serialization with O(1) task state: the per-doc (subj,
    // pred, obj) presentation sort rides the shuffle frame — repartition by
    // doc_id, sortWithinPartitions — so a task streams each document's
    // already-ordered triples straight into its .ttl/.nt writer one row at a
    // time. No `it.toSeq`: a mega-doc export never holds its triple set on
    // one heap (the old bound was the maxDocChars guard; now it's a single
    // row + write buffer). No driver-side collect of the triple stream
    // either (only the tiny per-doc summary tuples come back). In local
    // mode the executor shares the filesystem; on a cluster, point outputs
    // at a shared mount.
    // Ordering note: Spark sorts strings by UTF-8 bytes (= code points),
    // the old in-heap sortBy by UTF-16 code units — byte-identical output
    // except for supplementary-plane characters in literals.
    val base = baseURI
    val fmt = format
    import org.apache.spark.sql.functions.col
    val written = result.triples.as[FinalTriple]
      .repartition(col("doc_id"))
      .sortWithinPartitions("doc_id", "subj", "pred", "obj")
      .as[FinalTriple]
      .mapPartitions { rows =>
        // write to an ATTEMPT-UNIQUE sibling temp file and rename on
        // success: a task that dies mid-stream (disk full, I/O error) must
        // not leave a truncated .ttl where a consumer of the output
        // directory can read it, and concurrent attempts of the same task
        // (speculation, zombie retry on a shared mount) must not interleave
        // into one temp file or delete each other's
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId.toString).getOrElse(java.util.UUID.randomUUID.toString)
        val summaries = scala.collection.mutable.ArrayBuffer[(String, String, Int)]()
        var cur: String = null
        var dest: Path = null
        var tmp: Path = null
        var w: java.io.Writer = null
        var ttl: TurtleSink.Streamed = null
        var n = 0
        def finish(): Unit = if (cur != null) {
          try {
            w.close()
            // prefer an atomic same-directory rename — REPLACE_EXISTING
            // alone does not guarantee a reader can't observe a partially-
            // moved destination on every filesystem
            try Files.move(tmp, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            catch {
              case _: java.nio.file.AtomicMoveNotSupportedException =>
                Files.move(tmp, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
            summaries += ((cur, dest.toString, n))
          } finally {
            // close flushes and can itself throw on the failure path —
            // swallow it so the ORIGINAL exception propagates and the temp
            // still gets cleaned (on success close() is an idempotent no-op)
            try w.close() catch { case _: java.io.IOException => }
            Files.deleteIfExists(tmp)
            cur = null
          }
        }
        try {
          rows.foreach { t =>
            if (t.doc_id != cur) {
              finish()
              val (out, ontNS) = meta(t.doc_id)
              cur = t.doc_id
              dest = Paths.get(out)
              tmp = dest.resolveSibling(s"${dest.getFileName}.inprogress-$attempt")
              w = Files.newBufferedWriter(tmp)
              ttl = if (fmt == "ttl") new TurtleSink.Streamed(w, base, ontNS) else null
              n = 0
            }
            if (fmt == "nt") graft.sinks.NTriplesSink.writeOne(t, w)
            else if (fmt == "nq") graft.sinks.NQuadsSink.writeOne(t, w)
            else ttl.write(t)
            n += 1
          }
          finish()
        } catch {
          // mid-doc failure: drop the in-progress temp, then rethrow
          case e: Throwable =>
            if (cur != null) { try w.close() catch { case _: Exception => }; Files.deleteIfExists(tmp) }
            throw e
        }
        summaries.iterator
      }
      .collect().sortBy(_._1)

    // docs whose conversion aborted (dangling refs) produce no triples at all
    // — write nothing for them, like the reference's silent file-sink flush
    written.foreach { case (_, out, n) => println(s"[ifc2rdf] -> $out ($n triples)") }
    meta.keySet.diff(written.map(_._1).toSet).toSeq.sorted.foreach { d =>
      println(s"[ifc2rdf] ${meta(d)._1}: no output (document aborted or empty)")
    }
    result.unpersist()
  }
}
