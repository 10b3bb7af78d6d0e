package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: interleaved min-of-N wall time for named battery queries at a
  * given sf dir — the per-query A/B harness for efficiency work (the full
  * Bench run takes minutes; this times just the queries under study).
  * Not part of the driver contract.
  *
  * Usage: runMain graft.QueryTime <sfDir> <reps> <q1> [q2 ...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchSession.local("graft-query-time", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    // warm-up (classload + codegen), uncounted
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    for (_ <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
      println(f"[qtime] $n rep: $t%.2fs ($rows rows)")
    }
    best.foreach { case (n, t) => println(f"[qtime] BEST $n $t%.3fs") }
    spark.stop()
  }
}
