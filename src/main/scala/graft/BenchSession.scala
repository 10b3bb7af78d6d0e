package graft

import org.apache.spark.sql.SparkSession

/** The ONE definition of the tuned measurement-session knobs every bench /
  * profiling harness shares (Bench, ScalingBench, ClusterScalingBench,
  * SaltBench, TuneBench, QueryTime, ProfileRun). BASELINE.md's numbers are
  * claims about runs under exactly these settings, so the settings must not
  * drift between the harness that justifies a decision (e.g. SaltBench for
  * D2's salt=1 default) and the harness the driver records.
  *
  * Knob rationale (measured on this host, see BASELINE.md "Tuned protocol"):
  *  - shuffle.partitions = cores, default.parallelism = cores*8: one shuffle
  *    task per core and 8 input slices per core — no scheduling waves, no
  *    starved cores on the narrow stages.
  *  - locality.wait=0s: single host; waiting for locality only idles cores.
  *  - AQE + skewJoin: runtime re-plan, the skew path the pipeline relies on.
  *  - bypassMergeThreshold=1 + transferTo=false (serialized sort shuffle
  *    writer + stream copy; interleaved min-of-3: 2.3-2.5x): the
  *    bypass-merge writer opens one file per reducer per map task and
  *    concatenates them with NIO transferTo, whose mmap/munmap cycles fire
  *    cross-core TLB shootdowns that dominate wall time at 32 threads
  *    (jstack-sampled). TuneBench/ProfileRun override these to A/B them.
  *  - local.dir in /dev/shm: shuffle spill to tmpfs, not the container disk.
  *  - session.timeZone UTC: date bucketing independent of host zone.
  *
  * Returns a builder with NO master so each harness adds its own
  * (local[n] / local-cluster[...]) plus any per-experiment overrides — a
  * later .config call on the builder overwrites these defaults.
  */
object BenchSession {

  def builder(app: String, shuffleParts: Int, parallelism: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(app)
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.default.parallelism", parallelism)
      .config("spark.locality.wait", "0s")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.file.transferTo", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** the standard local-mode shape: local[cores], one shuffle task and
    * 8 input slices per core */
  def local(app: String, cores: Int): SparkSession.Builder =
    builder(app, cores, cores * 8).master(s"local[$cores]")
}
