package graft

import graft.model.Doc
import graft.operators.Pipeline
import graft.sources.FixtureDocs
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Session tuning the pipeline expects (AQE + skew join on; modest shuffle
    * parallelism for local[32]). Safe to call on an existing session. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark
  }

  /** The interleaved-span docs table synthesized from the reference's golden
    * corpus (FIXTURES.md §2); falls back to the deterministic synthetic
    * corpus when the reference tree is not mounted. */
  def goldenDocs(spark: SparkSession): org.apache.spark.sql.Dataset[Doc] = {
    import spark.implicits._
    if (FixtureDocs.available()) spark.createDataset(FixtureDocs.docs())
    else graft.sources.SynthCorpus.docs(spark, 20, 60)
  }

  /** Flagship: the four-stage KG-construction pipeline over the golden corpus;
    * returns the final triples table. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = tune(spark)
    Pipeline.run(goldenDocs(spark), FixtureDocs.BaseURI).triples
  }

  /** One entry per implemented operator (SURVEY.md §2 and the training-data
    * battery). kg_* queries run the KG pipeline itself (not expressible as
    * SQL over the sf tables → rows-only check); the q* battery is
    * oracle-checked against DuckDB. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.analytics.Battery.queries ++ Map[String, (SparkSession, String) => DataFrame](
      "kg_triples" -> ((s, _) => entry(s)),
      "kg_markers" -> ((s, _) => {
        implicit val sp: SparkSession = tune(s)
        Pipeline.run(goldenDocs(s), FixtureDocs.BaseURI).markersDF
      })
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the kg_* pipeline entries (the
    * driver then records a rows-only check). */
  def oracleSql: Map[String, String] = graft.analytics.Battery.oracleSql
}
