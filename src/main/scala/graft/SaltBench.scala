package graft

import graft.operators.Pipeline
import graft.sources.SynthCorpus
import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved A/B of the D2 join's salt factor (1 = rely on AQE
  * skew splitting alone vs 8 = unconditional target replication) on uniform
  * and skewed staged corpora. Only paired min-of-N comparisons are meaningful
  * on this host (multi-minute throughput windows). Not part of the driver
  * contract.
  *
  * Usage: runMain graft.SaltBench [nDocs] [lines] [reps] [cores]
  */
object SaltBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 10000
    val lines = if (args.length > 1) args(1).toInt else 100
    val reps = if (args.length > 2) args(2).toInt else 5
    val cores = if (args.length > 3) args(3).toInt else 32

    val spark = BenchSession.local("graft-salt-bench", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark

    def staged(name: String, skew: Boolean) = {
      val p = s"/dev/shm/graft-salt-docs/${nDocs}x${lines}_$name"
      if (!new java.io.File(p).exists())
        SynthCorpus.docs(spark, if (skew) nDocs / 2 else nDocs, lines, skew).write.mode("overwrite").parquet(p)
      spark.read.parquet(p).as[graft.model.Doc](org.apache.spark.sql.Encoders.product[graft.model.Doc])
    }
    val uniform = staged("uniform", skew = false)
    val skewed = staged("skewed", skew = true)

    // warm-up (classload + codegen), uncounted
    locally {
      val w = Pipeline.run(SynthCorpus.docs(spark, 50, 50), SynthCorpus.BaseURI)
      w.triples.count(); w.unpersist()
    }

    val cells = Seq(("uniform", uniform, 1), ("uniform", uniform, 8),
      ("skewed", skewed, 1), ("skewed", skewed, 8))
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    for (r <- 1 to reps; (cn, docs, salt) <- cells) {
      val key = s"${cn}_salt$salt"
      val t0 = System.nanoTime()
      // staged mode pinned: this harness measures the D2 join's salt factor,
      // which the fused default bypasses entirely
      val res = Pipeline.run(docs, SynthCorpus.BaseURI,
        Pipeline.Options(salt = salt, fusedPipeline = Some(false)))
      val n = res.triples.count()
      res.unpersist()
      val t = (System.nanoTime() - t0) / 1e9
      best(key) = math.min(best.getOrElse(key, Double.MaxValue), t)
      counts(key) = n
      println(f"[salt] rep $r $key $t%.2fs ($n triples)")
    }
    best.foreach { case (k, t) => println(f"[salt] BEST $k $t%.2fs (${counts(k)} triples)") }
    // identical output across salts is a correctness invariant
    require(counts("uniform_salt1") == counts("uniform_salt8"), "uniform count mismatch")
    require(counts("skewed_salt1") == counts("skewed_salt8"), "skewed count mismatch")
    spark.stop()
  }
}
