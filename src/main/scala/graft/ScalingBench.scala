package graft

import graft.operators.Pipeline
import graft.sources.SynthCorpus
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.json: throughput scaling efficiency
  * >= 0.8 from N to 4N executors). No real cluster exists in this sandbox, so
  * the same job runs at two parallelism levels — local[8] and local[32] — on
  * the identical corpus; efficiency = (T8 / T32) / 4 where T is wall time
  * (equivalently tps32 / (4 * tps8)).
  *
  * Usage: runMain graft.ScalingBench [nDocs] [linesPerDoc] [skew]
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 3000
    val lines = if (args.length > 1) args(1).toInt else 100
    val skew = args.length > 2 && args(2).toBoolean

    def run(cores: Int): (Double, Long) = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", cores * 2)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      implicit val s: SparkSession = spark
      // warm-up (JIT + codegen), small
      val w = Pipeline.run(SynthCorpus.docs(spark, 50, 50, skew), SynthCorpus.BaseURI)
      w.triples.count(); w.unpersist()
      // two measured reps; keep the best (JIT/page-cache noise dominates rep 1)
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val r = Pipeline.run(SynthCorpus.docs(spark, nDocs, lines, skew), SynthCorpus.BaseURI)
        val n = r.triples.count()
        val secs = (System.nanoTime() - t0) / 1e9
        r.unpersist()
        (secs, n)
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (reps.map(_._1).min, reps.head._2)
    }

    val (t8, n8) = run(8)
    val (t32, n32) = run(32)
    require(n8 == n32, s"nondeterministic output: $n8 vs $n32")
    val eff = (t8 / t32) / 4.0
    println(f"""{"bench":"scaling","nDocs":$nDocs,"linesPerDoc":$lines,"skew":$skew,"triples":$n8,"t8_sec":$t8%.2f,"t32_sec":$t32%.2f,"tps8":${(n8 / t8).round},"tps32":${(n32 / t32).round},"efficiency":$eff%.3f}""")
  }
}
