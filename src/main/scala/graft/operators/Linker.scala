package graft.operators

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage B — duplicate handling + cross-line reference resolution
  * (SURVEY.md §2 D1/D2). This is the pipeline's one unavoidable wide stage:
  * an equi hash join on (doc_id, local_id) run under AQE, whose runtime skew
  * splitting handles hot keys (the same target line referenced from very
  * many statements of a mega-document).
  *
  * Salting is OFF by default (salt = 1): an interleaved A/B on this host
  * (`graft.SaltBench`, min-of-5, 10k docs × 100 lines) measured salt=1+AQE
  * equal on the 1%-mega-doc skewed corpus (4.36 s vs 4.28 s) and ~15% FASTER
  * on the uniform corpus (4.91 s vs 5.79 s) with identical outputs — the
  * unconditional 8× target replication was pure shuffle-volume overhead
  * (8× the statement keys on the build side) that AQE's skew-join splitting
  * already covers. The salt knob remains for corpora with a pathological
  * single hot key beyond what AQE partition-splitting granularity resolves.
  *
  * Reference semantics reproduced:
  *  - optional duplicate-line dedup keyed on the full text after '='
  *    (resolveDuplicates, IfcSpfParser.java:147-165); the canonical survivor
  *    here is min(line_id) (the reference keeps the first in HashMap iteration
  *    order, which for its small Long keys is ascending — and its own test
  *    compares by graph isomorphism, so survivor identity is not contractual);
  *    refs to removed duplicates resolve to the canonical line
  *    (IfcSpfParser.java:184-187);
  *  - dangling references surface as targets with a null keyword (the
  *    whole-document abort itself is decided locally in Stage A — see
  *    Tokenizer — since a document is one input row).
  *
  * (Duplicate line numbers are resolved last-write-wins locally in Stage A —
  * a whole document is one input row, so no shuffle is needed for that.)
  */
object Linker {

  def link(stmts: Dataset[Stmt], removeDuplicates: Boolean = false, salt: Int = 1)
          (implicit spark: SparkSession): Dataset[LinkedStmt] = {
    import spark.implicits._
    val joined = joinedRefs(stmts, removeDuplicates, salt)

    // per-line target maps; dangling refs keep a null keyword
    val refMaps = joined
      .groupBy($"doc_id", $"line_id")
      .agg(collect_list(struct($"ref".as("ref"),
        coalesce($"tline", lit(-1L)).as("line"), $"tkw".as("keyword"))).as("targets"))

    // Large sides plan as sort-merge (spills gracefully; a shuffled-hash
    // build map cannot — it OOMs under small executor heaps); small sides as
    // broadcast. The strategy choice is only safe because Pipeline.run
    // MATERIALIZES the stmts stage before the wide stage is planned (cache
    // count / parquet stage table), so Catalyst sees measured sizes here:
    // both join sides descend from the doc source, and on an unmaterialized
    // synthetic source (spark.range) the estimate is a few KB for what can
    // be an unbounded side — a statistics-blind BroadcastHashJoin then
    // collects the whole corpus to the driver (observed: >1 GiB of task
    // results at a 20k-doc bench before the eager materialization existed).
    dedupedStmts(stmts, removeDuplicates)
      .join(refMaps, Seq("doc_id", "line_id"), "left")
      .select($"doc_id", $"schema", $"line_id", $"keyword", $"body", $"abort", $"bad_line", $"targets")
      .as[LinkedStmt]
  }

  /** D1 duplicate-line dedup: keep the minimum line_id per (doc_id, body);
    * header/sentinel rows (line_id < 0) always survive. Public seam —
    * battery query q24 oracle-checks it against DuckDB. */
  def dedupStmts(stmts: org.apache.spark.sql.DataFrame)
                (implicit spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val wBody = Window.partitionBy($"doc_id", $"body")
    stmts.withColumn("canon",
        when($"line_id" >= 0, min($"line_id").over(wBody)).otherwise($"line_id"))
      .filter($"line_id" === $"canon").drop("canon")
  }

  private def dedupedStmts(stmts: Dataset[Stmt], removeDuplicates: Boolean)
                          (implicit spark: SparkSession): org.apache.spark.sql.DataFrame =
    if (!removeDuplicates) stmts.toDF else dedupStmts(stmts.toDF)

  private def joinedRefs(stmts: Dataset[Stmt], removeDuplicates: Boolean, salt: Int)
                        (implicit spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._

    // D1 (opt-in, CLI default off — IfcSpfReader.java:152): canonical line per body
    val (deduped, aliasDF) =
      if (!removeDuplicates) (stmts.toDF, None)
      else {
        val wBody = Window.partitionBy($"doc_id", $"body")
        val withCanon = stmts.toDF.withColumn("canon",
          when($"line_id" >= 0, min($"line_id").over(wBody)).otherwise($"line_id"))
        val kept = withCanon.filter($"line_id" === $"canon").drop("canon")
        val alias = withCanon.filter($"line_id" =!= $"canon")
          .select($"doc_id", $"line_id".as("dup_id"), $"canon")
        (kept, Some(alias))
      }

    // explode refs; rref = the line actually joined against (canonical line
    // for refs pointing at a removed duplicate); `ref` stays the original
    // token id — the emitter keys its per-line target map on it
    val refs0 = deduped.select($"doc_id", $"line_id", explode($"refs").as("ref"))
    val refs = aliasDF match {
      case Some(alias) =>
        refs0.alias("r").join(alias.alias("a"),
            col("r.doc_id") === col("a.doc_id") && col("r.ref") === col("a.dup_id"), "left")
          .select(col("r.doc_id").as("doc_id"), col("r.line_id").as("line_id"),
            col("r.ref").as("ref"), coalesce(col("a.canon"), col("r.ref")).as("rref"))
      case None => refs0.withColumn("rref", $"ref")
    }

    // D2: equi hash join on (doc_id, local_id), AQE skew-split at runtime.
    // With salt > 1 the build side (statement keys) is replicated `salt`
    // ways and each probe row picks one deterministic salt bucket, manually
    // splitting hot (doc_id, ref) keys across `salt` reducers; salt == 1
    // (the measured default) skips the salt columns entirely.
    val targets0 = deduped
      .filter($"line_id" >= 0)
      .select($"doc_id", $"line_id".as("tline"), $"keyword".as("tkw"))
    val (probes, targets, saltCond) =
      if (salt <= 1) (refs.alias("p"), targets0.alias("t"), lit(true))
      else (
        refs.withColumn("salt", pmod(xxhash64($"line_id", $"ref"), lit(salt)).cast("int")).alias("p"),
        targets0.withColumn("salt", explode(typedlit((0 until salt).toArray))).alias("t"),
        col("p.salt") === col("t.salt"))

    // explicit aliases: probes and targets share lineage (self-join)
    val joined = probes.join(targets,
      col("p.doc_id") === col("t.doc_id") &&
        col("p.rref") === col("t.tline") && saltCond,
      "left")
      .select(col("p.doc_id").as("doc_id"), col("p.line_id").as("line_id"),
        col("p.ref").as("ref"), col("t.tline").as("tline"), col("t.tkw").as("tkw"))
    joined
  }
}
