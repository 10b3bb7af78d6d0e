package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native operators for the continuous-ingest side of the engine
  * (SURVEY.md §2.7). The reference is strictly batch; these are the
  * Structured-Streaming counterparts of the battery's q22 (windowed
  * aggregation, here with an event-time watermark so state is bounded) and
  * q11 (exact dedup, here as cross-batch keyed state): the two constructs a
  * continuously-fed training-data pipeline needs that foreachBatch alone
  * does not give — late-data semantics and state that survives micro-batch
  * boundaries.
  *
  * Scale posture: both operators shuffle once on their key (window/hash) and
  * keep per-key state O(1); watermarking evicts window state, and dedup
  * state is one boolean per distinct content hash (at 10^12 docs, back the
  * state store with RocksDB — `spark.sql.streaming.stateStore.providerClass`
  * — which is a config, not a code change).
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation over an event stream — the
    * streaming form of battery q22 (same integer-exact aggregates). Late
    * rows beyond `watermarkDelay` are dropped and their window state evicted;
    * in append mode a window emits once, when the watermark passes its end. */
  def windowedEventStats(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("val_m"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("val_m"))

  final case class DedupDoc(doc_id: Long, text: String)

  /** Cross-batch exact deduplication: the first document with a given
    * content hash (in stream arrival order) is emitted, every later
    * duplicate — same micro-batch or any subsequent one — is suppressed.
    * State per distinct hash is a single boolean held by the state store
    * (checkpointed, exactly-once across restarts). */
  def streamingExactDedup(docs: Dataset[DedupDoc])
                         (implicit spark: SparkSession): Dataset[DedupDoc] = {
    import spark.implicits._
    docs
      .groupByKey(d => org.apache.commons.codec.digest.DigestUtils.md5Hex(d.text))
      .flatMapGroupsWithState[Boolean, DedupDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[DedupDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // hash seen in an earlier batch
          else {
            state.update(true)
            // within one batch: keep the smallest doc_id (deterministic)
            var first: DedupDoc = null
            rows.foreach(d => if (first == null || d.doc_id < first.doc_id) first = d)
            Iterator.single(first)
          }
      }
  }
}
