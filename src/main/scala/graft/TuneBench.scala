package graft

import graft.operators.Pipeline
import graft.sources.SynthCorpus
import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B of shuffle-writer configs on the staged
  * corpus (the host swings multi-x over minutes, so only paired min-of-N
  * comparisons are meaningful). Not part of the driver contract.
  *
  * Usage: runMain graft.TuneBench [nDocs] [lines] [reps] [cores]
  */
object TuneBench {

  final case class Variant(name: String, bypass: String, transferTo: String, parts: Int)

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 20000
    val lines = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 3
    val cores = if (args.length > 3) args(3).toInt else 32

    val variants = Seq(
      Variant("bypass+nio_p4x", "200", "true", cores * 4), // current Bench behavior
      Variant("sortw+stream_p4x", "1", "false", cores * 4),
      Variant("bypass+nio_p1x", "200", "true", cores),
      Variant("sortw+stream_p1x", "1", "false", cores))

    val stagePath = s"/dev/shm/graft-bench-docs/${nDocs}x${lines}_false"
    locally {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false").getOrCreate()
      if (!new java.io.File(stagePath).exists())
        SynthCorpus.docs(spark, nDocs, lines, skew = false).write.mode("overwrite").parquet(stagePath)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    def run(v: Variant): Double = {
      // per-variant overrides of the shared protocol (later .config wins)
      val spark = BenchSession.local(s"graft-tune-${v.name}", cores)
        .config("spark.sql.shuffle.partitions", v.parts)
        .config("spark.shuffle.sort.bypassMergeThreshold", v.bypass)
        .config("spark.file.transferTo", v.transferTo)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      implicit val s: SparkSession = spark
      val w = Pipeline.run(SynthCorpus.docs(spark, 50, 50), SynthCorpus.BaseURI)
      w.triples.count(); w.unpersist()
      val docs = spark.read.parquet(stagePath)
        .as[graft.model.Doc](org.apache.spark.sql.Encoders.product[graft.model.Doc])
      val t0 = System.nanoTime()
      // staged mode pinned: this harness A/Bs shuffle-writer configs, which
      // need a pipeline that actually shuffles (the fused default does not)
      val r = Pipeline.run(docs, SynthCorpus.BaseURI,
        Pipeline.Options(fusedPipeline = Some(false)))
      val n = r.triples.count()
      val secs = (System.nanoTime() - t0) / 1e9
      r.unpersist()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.err.println(f"[tune] ${v.name}%-18s t=$secs%7.2f  ($n triples)")
      secs
    }

    val all = (1 to reps).flatMap(_ => variants.map(v => v.name -> run(v)))
    val mins = variants.map(v => v.name -> all.collect { case (n, t) if n == v.name => t }.min)
    mins.foreach { case (n, t) => println(f"""{"tune":"$n","min_sec":$t%.2f}""") }
  }
}
