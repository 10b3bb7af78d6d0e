package graft

import graft.operators.Pipeline
import graft.sources.SynthCorpus
import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B of the Stage-D strategy — global fused hash
  * aggregate over the encoded triple stream (the 13x-row wide edge) vs
  * doc-local dedup after a statement repartition (1x-row wide edge,
  * whole-doc task memory) — on uniform and skewed staged corpora. Only
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

    // warm-up (classload + codegen), uncounted — both paths
    for (dl <- Seq(false, true)) {
      val w = Pipeline.run(SynthCorpus.docs(spark, 50, 50), SynthCorpus.BaseURI,
        Pipeline.Options(docLocalFinish = Some(dl)))
      w.triples.count(); w.unpersist()
    }

    val cells = Seq(("uniform", uniform, false), ("uniform", uniform, true),
      ("skewed", skewed, false), ("skewed", skewed, true))
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    for (r <- 1 to reps; (cn, docs, docLocal) <- cells) {
      val key = s"${cn}_${if (docLocal) "doclocal" else "agg"}"
      val t0 = System.nanoTime()
      val res = Pipeline.run(docs, SynthCorpus.BaseURI, Pipeline.Options(docLocalFinish = Some(docLocal)))
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
    require(counts("uniform_agg") == counts("uniform_doclocal"), "uniform count mismatch")
    require(counts("skewed_agg") == counts("skewed_doclocal"), "skewed count mismatch")
    spark.stop()
  }
}
