package graft

import org.apache.spark.sql.SparkSession

/** Guide §1.4 noop-sink isolation (round 6): times named battery queries —
  * and the kg flagship via the `kg` pseudo-query — with
  * `df.write.format("noop")`, which computes EVERY column of every row.
  * Complements [[QueryTime]] (count-based, matches the frozen Bench
  * methodology): a count lets the optimizer prune decode/serializer
  * columns, so noop is the honest measure of full-row materialization
  * (e.g. the flagship's IRI decode expressions). Not part of the driver
  * contract — Bench.scala stays frozen.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <reps> <q…|kg>
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchSession.local("graft-bench-extra", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark

    // kg pseudo-query: full pipeline over the bench's staged uniform corpus
    // shape (20k x 100 at sf0.1), triples noop-sunk — decode NOT pruned
    def kgDf() = {
      val stage = sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark") +
        "/benchextra-docs"
      if (!new java.io.File(stage).exists())
        graft.sources.SynthCorpus.docs(spark,
          if (sfDir.contains("sf0.1")) 20000 else 2000, 100)
          .write.mode("overwrite").parquet(stage)
      operators.Pipeline.run(
        spark.read.parquet(stage).as[graft.model.Doc](
          org.apache.spark.sql.Encoders.product[graft.model.Doc]),
        graft.sources.SynthCorpus.BaseURI).triples
    }
    def dfOf(n: String) = if (n == "kg") kgDf() else SparkEntry.queries(n)(spark, sfDir)

    def noop(n: String): Unit = {
      spark.sparkContext.setJobDescription(s"benchextra: $n")
      dfOf(n).write.format("noop").mode("overwrite").save()
      spark.sparkContext.setJobDescription(null)
    }
    names.foreach(noop) // warm-up (classload + codegen), uncounted
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (_ <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      noop(n)
      val t = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
      println(f"[benchextra] $n rep: $t%.2fs")
    }
    best.foreach { case (n, t) => println(f"[benchextra] BEST $n $t%.3fs") }
    spark.stop()
  }
}
