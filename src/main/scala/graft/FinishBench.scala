package graft

import graft.operators.Pipeline
import graft.sources.SynthCorpus
import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B/C of the pipeline strategy — global fused
  * hash aggregate over the encoded triple stream (13x-row wide edge) vs
  * doc-local dedup after a statement repartition (1x-row wide edge) vs the
  * fused single-pass mode (zero wide edges) — on uniform and skewed staged
  * corpora. Only
  * paired min-of-N comparisons are meaningful on this host (multi-minute
  * throughput windows). Not part of the driver contract.
  *
  * Usage: runMain graft.FinishBench [nDocs] [lines] [reps] [cores]
  */
object FinishBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 10000
    val lines = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 5
    val cores = if (args.length > 3) args(3).toInt else 32

    val spark = BenchSession.local("graft-finish-bench", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark

    def staged(name: String, skew: Boolean) = {
      val p = s"/dev/shm/graft-finish-docs/${nDocs}x${lines}_$name"
      if (!new java.io.File(p).exists())
        SynthCorpus.docs(spark, if (skew) nDocs / 2 else nDocs, lines, skew).write.mode("overwrite").parquet(p)
      spark.read.parquet(p).as[graft.model.Doc](org.apache.spark.sql.Encoders.product[graft.model.Doc])
    }
    val uniform = staged("uniform", skew = false)
    val skewed = staged("skewed", skew = true)

    // three strategies: global aggregate, doc-local finish, fused single-pass
    def optsOf(mode: String) = mode match {
      case "agg" => Pipeline.Options(docLocalFinish = Some(false), fusedPipeline = Some(false))
      case "doclocal" => Pipeline.Options(docLocalFinish = Some(true), fusedPipeline = Some(false))
      case "fused" => Pipeline.Options(fusedPipeline = Some(true))
    }
    val modes = Seq("agg", "doclocal", "fused")

    // warm-up (classload + codegen), uncounted — every path
    for (m <- modes) {
      val w = Pipeline.run(SynthCorpus.docs(spark, 50, 50), SynthCorpus.BaseURI, optsOf(m))
      w.triples.count(); w.unpersist()
    }

    val cells = for (c <- Seq(("uniform", uniform), ("skewed", skewed)); m <- modes)
      yield (c._1, c._2, m)
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    for (r <- 1 to reps; (cn, docs, mode) <- cells) {
      val key = s"${cn}_$mode"
      val t0 = System.nanoTime()
      val res = Pipeline.run(docs, SynthCorpus.BaseURI, optsOf(mode))
      val n = res.triples.count()
      res.unpersist()
      val t = (System.nanoTime() - t0) / 1e9
      best(key) = math.min(best.getOrElse(key, Double.MaxValue), t)
      counts(key) = n
      println(f"[finish] rep $r $key $t%.2fs ($n triples)")
    }
    best.foreach { case (k, t) =>
      println(f"[finish] BEST $k $t%.2fs (${counts(k)} triples, ${(counts(k) / t).round} tps)") }
    // identical output across strategies is a correctness invariant
    for (c <- Seq("uniform", "skewed"); m <- modes.tail)
      require(counts(s"${c}_agg") == counts(s"${c}_$m"), s"$c/$m count mismatch")
    spark.stop()
  }
}
