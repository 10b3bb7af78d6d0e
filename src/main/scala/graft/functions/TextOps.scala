package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable training-data text operators (deduplication + analysis) over a
  * corpus DataFrame with (id, text) columns. All results are cross-engine
  * deterministic: doubles only per-row, integer aggregation, portable
  * md5-based 32-bit token hash (see Battery's oracle notes).
  */
object TextOps {

  /** portable 32-bit token hash (non-negative, fits a long): the native
    * [[H32]] expression — bit-identical to [[h32Composed]], which the DuckDB
    * oracles mirror, without the per-call hex/substring/conv allocations */
  def h32(c: Column): Column = H32(c)

  /** the composed built-in form of [[h32]] — kept as the cross-engine
    * definition of record and the equivalence pin's reference side */
  def h32Composed(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** whitespace tokens, empties dropped: the native [[Tokens]] byte scan —
    * identical to [[tokensComposed]] (property-pinned) */
  def tokens(c: Column): Column = Tokens(c)

  /** the composed built-in form of [[tokens]] — the oracle-mirrored
    * definition of record and the equivalence pin's reference side */
  def tokensComposed(c: Column): Column = filter(split(c, " "), x => x =!= "")

  /** word n-gram shingles of a token-array column (rows with < n tokens drop) */
  def shingles(tk: Column, n: Int = 3): Column =
    expr(s"transform(sequence(0, size(${tk.toString}) - $n), " +
      s"i -> concat_ws(' ', ${(0 until n).map(j => s"${tk.toString}[i + $j]").mkString(", ")}))")

  /** the deduped word n-gram shingle SET of a token-array column, empties
    * dropped — the one definition of the shingle transform shared by
    * [[shingleHashes]], [[minhashSig]] and Battery q12 (a change here is a
    * change everywhere, mirrored manually in the DuckDB oracle CTEs) */
  def shingleSet(tk: Column, n: Int = 3): Column =
    array_distinct(filter(shingles(tk, n), x => x =!= ""))

  /** exact-duplicate groups: (h, canonical, n) keyed on md5(text) */
  def exactDuplicates(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("h"))
      .agg(min(col(id)).as("canonical"), count(lit(1)).as("n"))

  /** distinct (id, shingle-hash) pairs for docs with >= n tokens. Deduped
    * NARROWLY (array_distinct before the explode): (doc, sh) duplicates only
    * arise within one document, so no global distinct shuffle is needed.
    * Round 6: the dedup + hash pass is the native [[ShingleHashes]] fused
    * loop (one pass, byte-level shingles) — bit-identical to
    * `explode(shingleSet(tk, n))` + [[h32Composed]], property-pinned. */
  def shingleHashes(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame =
    df.select(col(id).as("doc"), tokens(col(text)).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc"), explode(ShingleHashes(col("tk"), n)).as("h"))

  /** Per-row MinHash signature over word n-gram shingles: (doc, mh0..mh{k-1})
    * computed in ONE narrow pass — the shingle array is built, deduped and
    * md5-hashed once per row (its projection stays separate: Catalyst's
    * CollapseProject does not inline a non-cheap expression used k times),
    * then each hash function takes an array_min over it. No explode, no
    * broadcast param crossJoin, no pre-join groupBys — at 10^9 docs the
    * signature is a pure map stage, like [[graft.functions.BandedSig]] for
    * embeddings. Values are identical to min over the exploded
    * (doc, shingle-hash) stream (pinned by FunctionsSpec). */
  def minhashSig(df: DataFrame, id: String, text: String,
                 params: Seq[(Long, Long)], n: Int = 3): DataFrame = {
    val base = df.select(col(id).as("doc"), tokens(col(text)).as("tk"))
      .filter(size(col("tk")) >= n)
    // round 6: native fused loops ([[ShingleHashes]] / [[AffineMinMod]])
    // replace the interpreted HOF trees — k+4 boxed array passes per row
    // become one shingle pass + k plain-long min loops; values unchanged
    // (property-pinned vs the composed forms)
    base.select(col("doc"), ShingleHashes(col("tk"), n).as("hs"))
      .select(col("doc") +: params.zipWithIndex.map { case ((a, b), i) =>
        AffineMinMod(col("hs"), a, b, 4294967291L).as(s"mh$i")
      }: _*)
  }

  /** near-duplicate candidate pairs via MinHash + banded LSH.
    * k hash functions, bands of `rows` each; pairs (a < b).
    * (Relational signature build — kept as the independent cross-check for
    * [[minhashSig]]; production callers should prefer the narrow path.) */
  def minhashPairs(sh: DataFrame, params: Seq[(Long, Long)], rows: Int = 2): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val p = params.zipWithIndex.map { case ((a, b), i) => (i, a, b) }.toDF("i", "ha", "hb")
    val sig = sh.crossJoin(broadcast(p))
      .groupBy(col("doc"), col("i"))
      .agg(min((col("ha") * col("h") + col("hb")) % lit(4294967291L)).as("mh"))
    val bands = sig.withColumn("band", floor(col("i") / rows).cast("int"))
      .groupBy(col("doc"), col("band"))
      .agg(collect_list(struct(col("i"), col("mh"))).as("sig"))
      .withColumn("key", xxhash64(col("band"), to_json(array_sort(col("sig")))))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b")).distinct()
  }

  /** 16-bit SimHash over the distinct-token set → (doc, simhash) */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id).as("doc"), explode(tokens(col(text))).as("tok")).distinct()
      .select(col("doc"), h32(col("tok")).as("h"))
    tok.select(col("doc"), explode(expr("sequence(0, 15)")).as("j"), col("h"))
      .groupBy(col("doc"), col("j"))
      .agg(sum(when(expr("(shiftright(h, CAST(j AS INT)) & 1)") === 1, 1).otherwise(-1)).as("w"))
      .groupBy(col("doc"))
      .agg(sum(when(col("w") > 0, expr("shiftleft(1L, CAST(j AS INT))")).otherwise(0L)).as("simhash"))
  }

  /** order-sensitive rolling fingerprint: sum((pos+1) * h32(tok)) mod p */
  def fingerprint(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("doc"), posexplode(tokens(col(text))).as(Seq("pos", "tok")))
      .groupBy(col("doc"))
      .agg((sum((col("pos") + 1) * h32(col("tok"))) % lit(1000000007L)).as("fp"))
}
