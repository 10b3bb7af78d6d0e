package graft

import graft.analytics.Sparql
import org.apache.spark.sql.SparkSession

/** CLI: run a SPARQL query over an emitted triples table (the downstream
  * half of the reference's workflow — its users load the Turtle into a
  * triple store and query there; this keeps the query on the cluster).
  *
  *   runMain graft.SparqlRun <triples.parquet> <query | @file.rq> <outDir>
  *                           [--graph-col doc_id] [--format parquet|csv]
  *
  * SELECT/CONSTRUCT/DESCRIBE write their solution table to `outDir`
  * (parquet by default; csv writes a header and is meant for small,
  * human-read results). ASK prints `true`/`false` and writes a one-row
  * table with a boolean `ask` column, so scripted callers have both a
  * process-output and a file contract. An UPDATE request (INSERT/DELETE)
  * writes the UPDATED TRIPLES TABLE to `outDir` — copy-on-write: the
  * input table is never touched, the output is its next snapshot.
  */
object SparqlRun {

  def main(args: Array[String]): Unit = {
    val (pos, flags) = parseArgs(args)
    require(pos.length == 3,
      "usage: SparqlRun <triples.parquet> <query | @file.rq> <outDir> " +
        "[--graph-col doc_id] [--format parquet|csv]")
    val Seq(triplesPath, queryArg, outDir) = pos.toSeq
    val graphCol = flags.getOrElse("graph-col", "doc_id")
    val format = flags.getOrElse("format", "parquet")
    require(Formats.contains(format), s"unknown --format $format (one of ${Formats.mkString("|")})")
    val text =
      if (queryArg.startsWith("@"))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(queryArg.drop(1))), java.nio.charset.StandardCharsets.UTF_8)
      else queryArg

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sparql")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try run(spark, triplesPath, text, outDir, graphCol, format)
    finally if (!sys.env.contains("GRAFT_KEEP_SESSION")) spark.stop()
  }

  /** `--format` values: parquet/csv write the solution TABLE; the
    * `results-*` forms render a SELECT through the W3C SPARQL 1.1 Results
    * serializers ([[graft.analytics.SparqlResults]]) and write text lines
    * (one file, document order — result sets a human exports this way are
    * driver-sized; the distributed export is the table forms). ASK composes
    * with results-json/results-xml only (the boolean documents — CSV/TSV
    * define no boolean form). */
  private val Formats = Set("parquet", "csv",
    "results-csv", "results-tsv", "results-json", "results-xml")

  /** The testable core: session supplied by the caller. */
  def run(spark: SparkSession, triplesPath: String, text: String, outDir: String,
          graphCol: String = "doc_id", format: String = "parquet"): Unit = {
    val triples = spark.read.parquet(triplesPath)
    if (format.startsWith("results-") && form(text) == "ASK") {
      // boolean results: the W3C JSON/XML scalar documents (CSV/TSV define
      // no boolean form — their spec covers SELECT only)
      require(format == "results-json" || format == "results-xml",
        s"--format $format has no boolean form; ASK renders through " +
          "results-json or results-xml")
      val answer = Sparql.ask(triples, text, graphCol)
      println(answer) // the process-output contract, same as the table path
      val doc = if (format == "results-json")
        graft.analytics.SparqlResults.askJson(answer)
      else graft.analytics.SparqlResults.askXml(answer)
      import spark.implicits._
      Seq(doc).toDF("line").coalesce(1).write.mode("overwrite").text(outDir)
      return
    }
    if (format.startsWith("results-")) {
      require(form(text) == "SELECT",
        s"--format $format renders SELECT result sets; ${form(text)} forms " +
          "write solution tables (use parquet or csv)")
      val bindings = Sparql.selectTerms(triples, text, graphCol)
      val lines = format match {
        case "results-csv" => graft.analytics.SparqlResults.csv(bindings)
        case "results-tsv" => graft.analytics.SparqlResults.tsv(bindings)
        case "results-xml" => graft.analytics.SparqlResults.xml(bindings)
        case _ => graft.analytics.SparqlResults.jsonLines(bindings)
          .select(org.apache.spark.sql.functions.lit(1L).as("ord"),
            org.apache.spark.sql.functions.col("line"))
      }
      // ADVICE r5: equal-ord rows must not rely on sort STABILITY (Spark
      // does not contractually guarantee it; a spill during the single-
      // partition sort could interleave them and silently break an ordered
      // result document). A monotonically increasing id taken BEFORE the
      // coalesce (partition-major, ascending within partitions — i.e. the
      // query's own output order) is the explicit secondary key.
      lines
        .withColumn("seq", org.apache.spark.sql.functions.monotonically_increasing_id())
        .coalesce(1).sortWithinPartitions("ord", "seq").select("line")
        .write.mode("overwrite").text(outDir)
      return
    }
    val result = form(text) match {
      case "ASK" =>
        val answer = Sparql.ask(triples, text, graphCol)
        println(answer) // the process-output contract
        import spark.implicits._
        Seq(answer).toDF("ask")
      case "INSERT" | "DELETE" | "CLEAR" | "DROP" | "CREATE" | "ADD" | "COPY" |
           "MOVE" | "LOAD" => Sparql.update(triples, text, graphCol)
      case _ => Sparql.query(triples, text, graphCol)
    }
    val w = result.write.mode("overwrite")
    if (format == "csv") w.option("header", "true").csv(outDir) else w.parquet(outDir)
  }

  /** First form keyword outside comments, IRIs, and prologue prefix labels
    * (an IRI could contain "select"; a prefix could be named "ask:") —
    * routes to ask / update / query without a full parse. */
  private[graft] def form(text: String): String = {
    val clean = text.replaceAll("<[^>\\n]*>", " ") // IRIs first: they may contain '#'
      .linesIterator.map(l => l.takeWhile(_ != '#')).mkString("\n")
      .replaceAll("(?i)\\bPREFIX\\b\\s*[A-Za-z0-9_.-]*:", " ")
    val kw = raw"(?i)\b(SELECT|ASK|CONSTRUCT|DESCRIBE|INSERT|DELETE|CLEAR|DROP|CREATE|ADD|COPY|MOVE|LOAD)\b".r
    kw.findFirstIn(clean).map(_.toUpperCase).getOrElse("")
  }

  private[graft] def isAsk(text: String): Boolean = form(text) == "ASK"

  private def parseArgs(args: Array[String]): (Vector[String], Map[String, String]) = {
    var pos = Vector.empty[String]
    var flags = Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      if (args(i).startsWith("--")) {
        require(i + 1 < args.length, s"${args(i)} needs a value")
        flags += (args(i).drop(2) -> args(i + 1)); i += 2
      } else { pos :+= args(i); i += 1 }
    }
    (pos, flags)
  }
}
