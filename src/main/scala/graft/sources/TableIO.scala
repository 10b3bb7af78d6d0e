package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Stage-table layer (checkpoint/resume, SURVEY.md §7.3).
  *
  * The north rule targets Iceberg tables; no Iceberg jar ships in
  * /opt/spark/jars, so the backend here is plain partitioned parquet behind
  * this small seam — swapping `format("parquet")` for `format("iceberg")` (and
  * path for table identifier) is the only change needed when the runtime has
  * the Iceberg catalog (documented in BASELINE.md).
  *
  * `checkpoint` is write-once/read-forever: if the stage table already exists
  * with a _SUCCESS marker the computation is skipped entirely — this is what
  * makes the DAG resumable mid-run: a restarted job re-reads completed stage
  * outputs instead of recomputing them.
  */
object TableIO {

  def exists(path: String)(implicit spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def checkpoint(df: DataFrame, path: String)(implicit spark: SparkSession): DataFrame = {
    if (!exists(path)) df.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil)
           (implicit spark: SparkSession): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
