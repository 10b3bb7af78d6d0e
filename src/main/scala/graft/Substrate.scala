package graft

/** Host-substrate probes: tiny pure-JVM measurements of what the sandbox
  * host is actually delivering *right now*, reported alongside every bench
  * JSON so a reader can tell a code regression from a throttled window.
  *
  * Motivation (measured): the identical 26M-triple job on identical code
  * swings 17 s .. 430 s across host windows — noisy-neighbor contention on
  * CPU and (dominantly) memory bandwidth, multi-minute granularity, up to
  * ~20x. A throughput claim without a substrate reading is therefore
  * uninterpretable; with one, throughput-per-substrate is roughly stable
  * across windows. The probes are deliberately short (~0.3 s each) and
  * allocation-free in the timed loop.
  *
  *  - cpu1 / cpuN: single-thread / N-thread FNV-1a over a 64-byte
  *    cache-resident block, in M-hashes/s — pure ALU+L1, no memory traffic.
  *  - membwN: N threads each streaming System.arraycopy over 16 MiB long
  *    arrays, aggregate GiB/s — the shuffle-write-shaped load that the
  *    noisy neighbor actually contends on.
  */
object Substrate {

  private def fnvBlock(block: Array[Byte], rounds: Int): Long = {
    var h = 0xcbf29ce484222325L
    var r = 0
    while (r < rounds) {
      var i = 0
      while (i < block.length) {
        h ^= block(i)
        h *= 0x100000001b3L
        i += 1
      }
      r += 1
    }
    h
  }

  /** M-hashes/s of the 64-byte FNV block on the calling thread. */
  def cpuSingle(ms: Long = 300): Double = {
    val block = Array.tabulate[Byte](64)(_.toByte)
    var sink = 0L
    var n = 0L
    val deadline = System.nanoTime() + ms * 1000000L
    val t0 = System.nanoTime()
    while (System.nanoTime() < deadline) {
      sink ^= fnvBlock(block, 64)
      n += 64
    }
    val secs = (System.nanoTime() - t0) / 1e9
    if (sink == 42L) System.err.println("") // black-hole: keep the loop live
    n / 1e6 / secs
  }

  /** Aggregate M-hashes/s over `threads` concurrent FNV loops. */
  def cpuMulti(threads: Int, ms: Long = 300): Double = {
    val results = new java.util.concurrent.atomic.DoubleAdder()
    val ts = (0 until threads).map { _ =>
      new Thread(() => results.add(cpuSingle(ms)))
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    results.sum()
  }

  /** Aggregate GiB/s copied by `threads` concurrent 16 MiB arraycopy loops
    * (each thread streams 32 MiB of working set — through memory, not L2). */
  def memBw(threads: Int, ms: Long = 300): Double = {
    val results = new java.util.concurrent.atomic.DoubleAdder()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        val n = (16 << 20) / 8
        val src = new Array[Long](n)
        val dst = new Array[Long](n)
        var i = 0
        while (i < n) { src(i) = i; i += 1 }
        var bytes = 0L
        val deadline = System.nanoTime() + ms * 1000000L
        val t0 = System.nanoTime()
        while (System.nanoTime() < deadline) {
          System.arraycopy(src, 0, dst, 0, n)
          bytes += n * 8L
        }
        val secs = (System.nanoTime() - t0) / 1e9
        if (dst(n - 1) == -1L) System.err.println("")
        results.add(bytes / 1073741824.0 / secs)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    results.sum()
  }

  /** One reading of all three probes, as JSON object fragments. */
  def probe(threads: Int): (Double, Double, Double) =
    (cpuSingle(), cpuMulti(threads), memBw(threads))
}
