package graft

import graft.operators.Pipeline
import graft.sources.SynthCorpus
import org.apache.spark.sql.SparkSession

/** N vs 4N EXECUTORS scaling evidence using Spark's local-cluster mode:
  * unlike local[n] (one shared JVM), each executor is its own process with
  * its own heap, GC and allocator — the faithful in-sandbox model of adding
  * executors to a cluster, which is what the north rule's scaling criterion
  * is about. Requires SPARK_HOME and the packaged app jar
  * (`sbt package` → target/scala-2.13/ifctordfspark_2.13-0.1.0.jar).
  *
  * Usage: runMain graft.ClusterScalingBench [nDocs] [lines] [skew] [reps]
  *        [nExecLo] [nExecHi] [coresPerExec] [memPerExecMb] [gen|stage]
  */
object ClusterScalingBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 10000
    val lines = if (args.length > 1) args(1).toInt else 100
    val skew = args.length > 2 && args(2).toBoolean
    val reps = if (args.length > 3) args(3).toInt else 3
    val execLo = if (args.length > 4) args(4).toInt else 2
    val execHi = if (args.length > 5) args(5).toInt else 8
    val cpe = if (args.length > 6) args(6).toInt else 4
    val mem = if (args.length > 7) args(7).toInt else 6144

    // "gen" (default, the historical protocol) synthesizes the corpus inside
    // the timed region; "stage" writes it to /dev/shm parquet ONCE and every
    // leg reads the table — the north-rule input shape, and at larger nDocs
    // it keeps one-time synthesis cost out of the scaling measurement
    val mode = if (args.length > 8) args(8) else "gen"
    require(Set("gen", "stage").contains(mode), s"unknown mode $mode")

    val jar = new java.io.File("target/scala-2.13/ifctordfspark_2.13-0.1.0.jar")
    require(jar.isFile, s"app jar missing — run `sbt package` first (${jar.getPath})")

    val stagePath = s"/dev/shm/graft-cluster-docs/${nDocs}x${lines}_$skew"
    if (mode == "stage" && !new java.io.File(stagePath).exists()) {
      val spark = BenchSession.local("graft-cluster-stage", 8).getOrCreate()
      SynthCorpus.docs(spark, nDocs, lines, skew).write.mode("overwrite").parquet(stagePath)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    def run(execs: Int, rep: Int): (Double, Long) = {
      val spark = BenchSession.builder(s"graft-cluster-$execs", execs * cpe, execs * cpe * 8)
        .master(s"local-cluster[$execs,$cpe,$mem]")
        .config("spark.jars", jar.getPath)
        // AQE must not broadcast-convert the (doc_id, line_id)-keyed joins:
        // their compressed shuffle stats look small but the hashed relation
        // does not fit executor task memory
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      implicit val s: SparkSession = spark
      def corpus =
        if (mode == "stage")
          spark.read.parquet(stagePath)
            .as[graft.model.Doc](org.apache.spark.sql.Encoders.product[graft.model.Doc])
        else SynthCorpus.docs(spark, nDocs, lines, skew)
      val w = Pipeline.run(SynthCorpus.docs(spark, 50, 50, skew), SynthCorpus.BaseURI)
      w.triples.count(); w.unpersist()
      val t0 = System.nanoTime()
      val r = Pipeline.run(corpus, SynthCorpus.BaseURI)
      val n = r.triples.count()
      val secs = (System.nanoTime() - t0) / 1e9
      r.unpersist()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.err.println(f"[cluster-scaling] executors=$execs rep=$rep t=$secs%.2f")
      (secs, n)
    }

    val results = (1 to reps).flatMap { rep =>
      Seq(execLo -> run(execLo, rep), execHi -> run(execHi, rep))
    }
    val tLo = results.collect { case (`execLo`, (t, _)) => t }.min
    val tHi = results.collect { case (`execHi`, (t, _)) => t }.min
    val ns = results.map(_._2._2).distinct
    require(ns.size == 1, s"nondeterministic output: $ns")
    val n = ns.head
    val eff = (tLo / tHi) / (execHi.toDouble / execLo)
    println(f"""{"bench":"cluster-scaling","nDocs":$nDocs,"linesPerDoc":$lines,"skew":$skew,"executors_lo":$execLo,"executors_hi":$execHi,"cores_per_executor":$cpe,"mode":"$mode","triples":$n,"t_lo_sec":$tLo%.2f,"t_hi_sec":$tHi%.2f,"tps_lo":${(n / tLo).round},"tps_hi":${(n / tHi).round},"efficiency":$eff%.3f}""")
  }
}
