package graft

import org.apache.spark.sql.SparkSession

/** Round-6 plan-capture helper (guide §1: capture `.explain("formatted")`
  * for every query touched, before and after each change).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query substrings...]
  * Writes <outDir>/<query>_<suffix>.txt for every matching SparkEntry query.
  * Separate main on purpose — Bench.scala is frozen for measurement.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val filters = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchSession.local("graft-plandump", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (filters.isEmpty || filters.exists(name.contains)) {
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $name ($suffix)")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
