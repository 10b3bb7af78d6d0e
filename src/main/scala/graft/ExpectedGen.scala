package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Regenerates the committed flagship expectation tables
  * (`expected/kg_triples.parquet`, `expected/kg_markers.parquet`).
  *
  * The KG pipeline's output is byte-deterministic across runs, JVMs and
  * parallelism levels (content-hash skolemization — BASELINE.md
  * "Determinism"), so the golden-corpus triple set can be pinned ONCE as a
  * plain table and the driver's DuckDB oracle becomes a simple
  * `SELECT ... FROM read_parquet(...)` — the same gate the reference applies
  * with its committed .ttl goldens (TestIfcSpfReader.java:102-151), expressed
  * relationally. `ExpectedSpec` re-derives both tables on every `sbt test`
  * run, so a semantic change that forgets to regenerate fails locally before
  * it reaches the driver.
  *
  * Run: `sbt "runMain graft.ExpectedGen"` (requires /root/reference mounted —
  * the same precondition as the golden suite).
  */
object ExpectedGen {

  /** Absolute paths: the driver's DuckDB oracle (SparkEntry.oracleSql) reads
    * these by absolute path from whatever cwd it runs in — generator, test
    * gate, and oracle must agree on ONE location, resolved HERE. A checkout
    * at a non-default location sets GRAFT_EXPECTED_DIR (or the
    * graft.expected.dir system property). */
  val ExpectedDir: String = sys.props.get("graft.expected.dir")
    .orElse(sys.env.get("GRAFT_EXPECTED_DIR"))
    .getOrElse("/root/repo/expected")
  val TriplesFile = s"$ExpectedDir/kg_triples.parquet"
  val MarkersFile = s"$ExpectedDir/kg_markers.parquet"

  /** write df as exactly one parquet FILE at `file` (not a directory) */
  def writeSingle(df: DataFrame, file: String)(implicit spark: SparkSession): Unit = {
    val tmpDir = Files.createTempDirectory("graft-expected")
    val tmp = tmpDir.toString + "/t"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val listing = Files.list(Paths.get(tmp))
    val part =
      try listing.toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS"))
      finally listing.close()
    require(part.length == 1, s"expected one part file, got ${part.toSeq}")
    val dest = Paths.get(file)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part.head), dest, StandardCopyOption.REPLACE_EXISTING)
    // clean the temp copy (a full parquet of the table per regeneration)
    val walk = Files.walk(tmpDir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally walk.close()
  }

  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(graft.sources.FixtureDocs.available(),
      "reference fixture corpus not mounted — cannot regenerate expectations")
    val r = graft.operators.Pipeline.run(
      SparkEntry.goldenDocs(spark), graft.sources.FixtureDocs.BaseURI,
      graft.operators.Pipeline.Options(persistEmitted = true))
    writeSingle(r.triples, TriplesFile)
    writeSingle(r.markersDF, MarkersFile)
    println(s"wrote $TriplesFile (${spark.read.parquet(TriplesFile).count()} rows), " +
      s"$MarkersFile (${spark.read.parquet(MarkersFile).count()} rows)")
    r.unpersist()
    spark.stop()
  }
}
