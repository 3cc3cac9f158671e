package graft

/** Memory-bandwidth saturation microbench (pure JVM, no Spark): each
  * thread streams XOR-reads over its own private 256 MB byte array —
  * no sharing, no locks, no allocation in the loop — so the ONLY shared
  * resource is the memory bus / last-level cache. If aggregate GB/s
  * stops growing with threads, added cores cannot convert to wall-time
  * for any memory-streaming workload on this box, including the fused
  * document scorer (which streams every document's bytes).
  *
  * This is the evidence BASELINE.md cites for why the single-box
  * local[8]→local[32] proxy under-reports true N→4N CLUSTER scaling:
  * a real cluster adds memory bandwidth with every node; a single box
  * does not.
  *
  *   sbt "runMain graft.MemBandwidth"   # prints one JSON line per level
  */
object MemBandwidth {

  private val ArrBytes = 128 << 20 // 128 MB per thread (≫ LLC, fits 32× in heap)
  private val PassesWarm = 2

  private def scan(a: Array[Byte]): Long = {
    // 8-byte strides via sum of longs read from the byte array
    var acc = 0L
    var i = 0
    while (i < a.length - 8) {
      acc += (a(i) & 0xffL) | ((a(i + 4) & 0xffL) << 32)
      i += 64 // one touch per cache line: measures bandwidth, not ALU
    }
    acc
  }

  def runLevel(threads: Int, seconds: Double = 2.0): Double = {
    val arrays = Array.fill(threads)(new Array[Byte](ArrBytes))
    arrays.foreach(a => java.util.Arrays.fill(a, 7.toByte))
    val bytesScanned = new java.util.concurrent.atomic.AtomicLong()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val ts = arrays.map { a =>
      new Thread(() => {
        var n = 0
        while (!stop.get()) {
          sink.addAndGet(scan(a))
          bytesScanned.addAndGet(a.length.toLong)
          n += 1
        }
      })
    }
    // warmup (JIT) on one array
    (1 to PassesWarm).foreach(_ => sink.addAndGet(scan(arrays(0))))
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    Thread.sleep((seconds * 1000).toLong)
    stop.set(true)
    ts.foreach(_.join())
    val dt = (System.nanoTime() - t0) / 1e9
    bytesScanned.get() / dt / 1e9
  }

  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8, 16, 32)
    val results = levels.map { t =>
      val gbs = runLevel(t)
      System.gc()
      t -> gbs
    }
    val base = results.head._2 / results.head._1
    val parts = results.map { case (t, gbs) =>
      f""""t$t":{"gb_per_sec":$gbs%.1f,"per_thread":${gbs / t}%.2f,"eff_vs_1t":${gbs / t / base}%.2f}"""
    }
    println(s"""{"metric":"mem_bandwidth","unit":"GB/s",${parts.mkString(",")}}""")
  }
}
