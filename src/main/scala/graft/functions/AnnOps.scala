package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths: exact brute-force top-k (integer-quantized dot product —
  * deterministic across engines and summation orders) and a sign-LSH
  * bucketed variant (the scale path: candidates only meet within their
  * hyperplane-sign bucket, turning the O(n^2) join into per-bucket joins).
  * True float cosine is also provided for API completeness (Spark-side only;
  * float sums are aggregation-order-dependent, so it is not oracle-checked).
  */
object AnnOps {

  /** integer-quantized embedding elements: (id, pos, ei) */
  def quantized(df: DataFrame, id: String, emb: String, scale: Int = 1000): DataFrame =
    df.select(col(id).as("vid"), posexplode(col(emb)).as(Seq("pos", "e")))
      .select(col("vid"), col("pos"), floor(col("e") * scale).cast("long").as("ei"))

  /** exact top-k neighbors by quantized dot product for the query ids */
  def bruteForceTopK(df: DataFrame, id: String, emb: String, isQuery: Column, k: Int): DataFrame = {
    val el = quantized(df, id, emb)
    val q = df.filter(isQuery).select(col(id).as("qid"))
    val qe = el.join(q, el("vid") === q("qid")).select(col("vid").as("q"), col("pos"), col("ei").as("qe"))
    val dots = qe.join(el.select(col("vid").as("c"), col("pos"), col("ei").as("ce")), Seq("pos"))
      .filter(col("q") =!= col("c"))
      .groupBy(col("q"), col("c")).agg(sum(col("qe") * col("ce")).as("dot"))
    val w = Window.partitionBy(col("q")).orderBy(col("dot").desc, col("c").asc)
    dots.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** sign-LSH bucket id over the first `bits` dimensions */
  def signBucket(emb: Column, bits: Int = 8): Column =
    expr(s"aggregate(sequence(0, ${bits - 1}), 0L, (acc, j) -> " +
      s"acc + CASE WHEN ${emb.toString}[j] >= 0 THEN CAST(pow(2, j) AS LONG) ELSE 0L END)")

  /** bucketed approximate top-k: candidates share the sign bucket */
  def lshTopK(df: DataFrame, id: String, emb: String, isQuery: Column, k: Int,
              bits: Int = 8): DataFrame = {
    val b = df.select(col(id).as("vid"), signBucket(col(emb), bits).as("bucket"), col(emb).as("emb"))
    val el = b.select(col("vid"), col("bucket"), posexplode(col("emb")).as(Seq("pos", "e")))
      .select(col("vid"), col("bucket"), col("pos"), floor(col("e") * 1000).cast("long").as("ei"))
    val q = df.filter(isQuery).select(col(id).as("qid"))
    val qe = el.join(q, el("vid") === q("qid"))
      .select(col("vid").as("q"), col("bucket"), col("pos"), col("ei").as("qe"))
    val dots = qe.join(
        el.select(col("vid").as("c"), col("bucket").as("cb"), col("pos").as("cpos"), col("ei").as("ce")),
        col("bucket") === col("cb") && col("q") =!= col("c") && col("pos") === col("cpos"))
      .groupBy(col("q"), col("c")).agg(sum(col("qe") * col("ce")).as("dot"))
    val w = Window.partitionBy(col("q")).orderBy(col("dot").desc, col("c").asc)
    dots.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** true float cosine similarity between two embedding columns (per-row;
    * zip_with + aggregate keep the summation order deterministic per row) */
  def cosine(a: Column, b: Column): Column = {
    val dot = expr(s"aggregate(zip_with(${a.toString}, ${b.toString}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)")
    val na = expr(s"sqrt(aggregate(${a.toString}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))")
    val nb = expr(s"sqrt(aggregate(${b.toString}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v))")
    dot / (na * nb)
  }
}
