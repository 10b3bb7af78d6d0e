package graft

import graft.operators.Pipeline
import graft.sources.SynthCorpus
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic: run the 4-stage pipeline once on a staged parquet corpus and
  * print per-Spark-stage wall time / task time / shuffle volumes, to locate
  * the binding stage at a given parallelism. Not part of the driver contract.
  *
  * Usage: runMain graft.ProfileRun [nDocs] [lines] [cores] [skew]
  */
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 20000
    val lines = if (args.length > 1) args(1).toInt else 100
    val cores = if (args.length > 2) args(2).toInt else 32
    val skew = args.length > 3 && args(3).toBoolean

    // shared protocol with profiling overrides: 4 shuffle tasks per core
    // (finer stage attribution) and env-selectable shuffle writer for A/B
    val spark = BenchSession.local("graft-profile", cores)
      .config("spark.sql.shuffle.partitions", cores * 4)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_BYPASS_THRESHOLD", "1"))
      .config("spark.file.transferTo", sys.env.getOrElse("GRAFT_TRANSFER_TO", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark

    val stagePath = s"/dev/shm/graft-bench-docs/${nDocs}x${lines}_$skew"
    if (!new java.io.File(stagePath).exists())
      SynthCorpus.docs(spark, nDocs, lines, skew).write.mode("overwrite").parquet(stagePath)

    // warm-up
    val w = Pipeline.run(SynthCorpus.docs(spark, 50, 50), SynthCorpus.BaseURI)
    w.triples.count(); w.unpersist()

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        rows.add(f"stage=${si.stageId}%3d tasks=${si.numTasks}%4d wall=$wall%7.2fs " +
          f"taskTime=${m.executorRunTime / 1000.0}%8.1fs cpu=${m.executorCpuTime / 1e9}%8.1fs " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB  ${si.name.takeWhile(_ != '\n').take(70)}")
      }
    })

    val docs = spark.read.parquet(stagePath)
      .as[graft.model.Doc](org.apache.spark.sql.Encoders.product[graft.model.Doc])
    val t0 = System.nanoTime()
    val r = Pipeline.run(docs, SynthCorpus.BaseURI)
    val n = r.triples.count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    rows.forEach(println)
    println(f"TOTAL triples=$n wall=$secs%.2f tps=${(n / secs).round}")
    // per-phase lineage (fused: F1..F4): summed wall_ms across partitions —
    // what fraction of the stage's task time the per-doc loop itself is
    r.lineage.groupBy("stage")
      .agg(org.apache.spark.sql.functions.sum("wall_ms").as("ms"),
        org.apache.spark.sql.functions.sum("rows_out").as("rows_out"))
      .orderBy("stage").collect()
      .foreach(x => println(f"lineage ${x.get(0)}%-12s ${x.getLong(1) / 1000.0}%8.2fs rows_out=${x.getLong(2)}"))
    r.unpersist()
    spark.stop()
  }
}
