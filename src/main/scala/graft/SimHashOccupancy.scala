package graft

/** Pure-JVM bucket-occupancy evidence for the two SimHash banding regimes
  * (no Spark; dev measurement main, output cited in BENCH.md).
  *
  * The claim under test (rules/Rules.scala scaladoc): the 60-bit rule's
  * 15-bit pigeonhole chunks (32k values) SATURATE as the corpus grows —
  * every bucket blows past `maxBucket` and the rule degrades to hub-only
  * pairing — while the 128-bit rule's 32-bit Manku block-pair keys
  * (4.3 × 10⁹ values) keep buckets person-sized at any web-corpus size.
  *
  * Methodology: n UNIFORM random fingerprints (xorshift). Uniform is the
  * BEST case for the 60-bit regime — natural-language bit bias
  * concentrates chunk values and saturates them EARLIER — so a saturation
  * shown here is a lower bound on the real effect. All 4 chunks and all
  * 28 block pairs are i.i.d. under uniform bits; we histogram every chunk
  * and one representative block pair (blocks 0,1 of the low half).
  *
  *   sbt "runMain graft.SimHashOccupancy 10000000"
  */
object SimHashOccupancy {

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq
    else Seq(100000, 1000000, 10000000)
    val maxBucket = 256 // the rules' all-pairs/hub regime split
    println(f"${"n"}%12s ${"regime"}%-22s ${"key space"}%12s " +
      f"${"mean occ"}%10s ${"p max occ"}%10s ${"docs in >256"}%13s")
    ns.foreach { n =>
      var s = 0x123456789abcdefL
      def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
      val chunkCounts = Array.fill(4)(new Array[Int](1 << 15))
      val pairKeys = new Array[Int](n)
      var i = 0
      while (i < n) {
        val lo = next()
        var c = 0
        while (c < 4) {
          chunkCounts(c)(((lo >>> (c * 15)) & 0x7FFF).toInt) += 1
          c += 1
        }
        pairKeys(i) = (((lo & 0xFFFFL) << 16) | ((lo >>> 16) & 0xFFFFL)).toInt
        i += 1
      }
      // 60-bit regime: average the 4 i.i.d. chunks
      val chunkStats = chunkCounts.map { cc =>
        val nonEmpty = cc.count(_ > 0)
        val maxOcc = cc.max
        val docsInBig = cc.filter(_ > maxBucket).map(_.toLong).sum
        (n.toDouble / math.max(1, nonEmpty), maxOcc, docsInBig.toDouble / n)
      }
      val meanOcc = chunkStats.map(_._1).sum / 4
      val maxOcc = chunkStats.map(_._2).max
      val fracBig = chunkStats.map(_._3).sum / 4
      println(f"$n%12d ${"60-bit 15-bit chunk"}%-22s ${1 << 15}%12d " +
        f"$meanOcc%10.2f $maxOcc%10d ${fracBig * 100}%12.1f%%")
      // 128-bit regime: sort one block-pair key column, run-length occupancy
      java.util.Arrays.sort(pairKeys)
      var maxRun = 0; var run = 1; var docsBig = 0L
      i = 1
      while (i <= n) {
        if (i < n && pairKeys(i) == pairKeys(i - 1)) run += 1
        else {
          if (run > maxRun) maxRun = run
          if (run > maxBucket) docsBig += run
          run = 1
        }
        i += 1
      }
      val distinct = {
        var d = 1; var j = 1
        while (j < n) { if (pairKeys(j) != pairKeys(j - 1)) d += 1; j += 1 }
        d
      }
      println(f"$n%12d ${"128-bit block pair"}%-22s ${"2^32"}%12s " +
        f"${n.toDouble / distinct}%10.2f $maxRun%10d ${docsBig * 100.0 / n}%12.1f%%")
    }
    println("\nExtrapolation (uniform, mean occupancy = n / key-space):")
    println("  n=10^9:  15-bit chunk -> 30,518 docs/bucket (119x over maxBucket:" +
      " every bucket hub-only); 32-bit pair -> 0.23 docs/bucket")
    println("  n=10^10: 15-bit chunk -> 305,176 docs/bucket; 32-bit pair -> 2.3" +
      " docs/bucket (all-pairs regime intact)")
  }
}
