package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque binary columns with
  * typed metadata, and a partition-batched "decode / feature-extract" stage.
  *
  * This container ships no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic fake — but everything Spark-side is real:
  * the binary column, the metadata struct schema, the partition-batched
  * execution shape (the Scala analog of a pandas-UDF `mapInPandas` stage:
  * one JVM-side batch loop per partition, amortizing per-batch setup such as
  * a codec context), and the fixed-width feature-vector output.
  */
object MediaOps {

  final case class MediaMeta(n_bytes: Int, head_hex: String, kind: String)
  final case class MediaFeature(id: Long, meta: MediaMeta, feature: Array[Float])

  /** Attach an opaque binary payload + metadata struct for a text column
    * (stand-in for reading real media bytes from a blob store). */
  def attachPayload(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("id"),
        encode(col(text), "UTF-8").as("payload"),
        struct(
          length(encode(col(text), "UTF-8")).as("n_bytes"),
          lower(hex(encode(substring(col(text), 1, 4), "UTF-8"))).as("head_hex"),
          lit("text/plain").as("kind")).as("meta"))

  /** Partition-batched decode/feature stage. The per-partition `codec` setup
    * and the batch loop are the real plumbing; the byte→feature math is the
    * STUB (deterministic fold of the payload bytes into `dim` buckets). */
  def decodeStub(df: DataFrame, dim: Int = 8)(implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload"), col("meta.n_bytes"),
        col("meta.head_hex"), col("meta.kind"))
      .as[(Long, Array[Byte], Int, String, String)]
      .mapPartitions { it =>
        // per-partition setup (a real decoder would open its codec context here)
        val buckets = new Array[Long](dim)
        it.map { case (id, payload, nBytes, headHex, kind) =>
          java.util.Arrays.fill(buckets, 0L)
          var i = 0
          while (i < payload.length) {
            buckets(i % dim) += (payload(i) & 0xff)
            i += 1
          }
          val feat = buckets.map(b => if (payload.length == 0) 0f else b.toFloat / payload.length)
          MediaFeature(id, MediaMeta(nBytes, headHex, kind), feat)
        }
      }
  }
}
