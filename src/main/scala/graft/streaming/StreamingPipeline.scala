package graft.streaming

import graft.model.Doc
import graft.operators.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingest variant (SURVEY.md §2.7 optional path).
  *
  * The reference is strictly batch; the north rule is batch at 10^12 docs.
  * This variant exists for continuous/backfill ingest: a file stream over the
  * docs table directory, each micro-batch pushed through the identical
  * four-stage pipeline via foreachBatch (documents are self-contained — all
  * #id references are intra-document — so per-batch processing is exactly
  * per-document semantics), appending to the triples table. Trigger.AvailableNow
  * drains the backlog and stops, giving checkpointed, resumable, exactly-once
  * table appends.
  */
object StreamingPipeline {

  def start(spark: SparkSession, docsDir: String, outDir: String, checkpoint: String,
            baseURI: String): StreamingQuery = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val docsSchema = spark.emptyDataset[Doc].schema
    spark.readStream
      .schema(docsSchema)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = Pipeline.run(batch.as[Doc], baseURI)
        r.triples.repartitionByRange(r.triples("doc_id"), r.triples("subj"))
          .write.mode("append").parquet(outDir)
        r.unpersist()
      }
      .start()
  }
}
