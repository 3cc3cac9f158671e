package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.QualityPipeline
import graft.rules.Rules
import graft.sources.PagesGen

/** The 60-bit SimHash Hamming rule as a second opinion next to MinHash:
  * pigeonhole banding is exact for Hamming ≤ maxHamming, and a planted
  * near-dup (single-token mutation of a 120–300-token doc) moves only the
  * simhash bits whose token-vote margin was ≤ 2 — almost always ≤ 3 bits.
  */
class SimHashRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val N = 3000L
  private lazy val pages = PagesGen.generate(spark, N, 8).toDF().cache()
  private lazy val feat = QualityPipeline.features(pages).cache()

  private def idOf(url: String): Long = url.split("/p/")(1).toLong

  test("identical docs share a simhash; planted near-dups sit within Hamming 3") {
    val rows = feat.select("url", "simhash").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val urlOfId = rows.keys.map(u => idOf(u) -> u).toMap
    val planted = rows.keys.filter(u => PagesGen.errorClass(idOf(u)) == "near_dup")
    assert(planted.nonEmpty)
    var within = 0
    var total = 0
    planted.foreach { u =>
      val id = idOf(u)
      val baseId = PagesGen.cleanBaseAtOrAbove(id - math.floorMod(id, 97L) + 2)
      urlOfId.get(baseId).foreach { bu =>
        total += 1
        val d = java.lang.Long.bitCount(rows(u) ^ rows(bu))
        if (d <= 3) within += 1
      }
    }
    info(s"planted near-dup pairs within Hamming 3: $within/$total")
    assert(total > 0)
    assert(within.toDouble / total >= 0.9,
      s"only $within/$total planted pairs within Hamming 3")
  }

  test("simHashNearDup recall on planted near-dup pairs is comparable to MinHash") {
    val sim = Rules.simHashNearDup(feat, col("url"), col("simhash"))
      .collect().map(_.getString(0)).toSet
    val mh = QualityPipeline.nearDupVerdicts(feat, QualityPipeline.defaultConfig)
      .collect().map(r => r.getAs[String]("url")).toSet
    val urls = feat.select("url").collect().map(_.getString(0))
    val urlOfId = urls.map(u => idOf(u) -> u).toMap
    def pairCaught(flagged: Set[String]): (Int, Int) = {
      var caught = 0; var total = 0
      urls.filter(u => PagesGen.errorClass(idOf(u)) == "near_dup").foreach { u =>
        val id = idOf(u)
        val baseId = PagesGen.cleanBaseAtOrAbove(id - math.floorMod(id, 97L) + 2)
        if (urlOfId.contains(baseId)) {
          total += 1
          // the pair is detected iff one of its two members was dropped
          if (flagged(u) || flagged(urlOfId(baseId))) caught += 1
        }
      }
      (caught, total)
    }
    val (simCaught, total) = pairCaught(sim)
    val (mhCaught, _) = pairCaught(mh)
    info(s"planted-pair recall: simhash=$simCaught/$total minhash=$mhCaught/$total")
    assert(simCaught.toDouble / total >= 0.9,
      s"simhash rule caught only $simCaught/$total planted near-dup pairs")
    // second-opinion contract: within 10% of the MinHash path on plants
    assert(simCaught >= mhCaught - (total / 10),
      s"simhash ($simCaught) lags minhash ($mhCaught) by more than 10%")
  }

  test("hot-bucket hub regime: maxBucket=1 forces hub pairing everywhere; precision holds, no detonation") {
    // the df-cap contract: when a chunk bucket exceeds maxBucket the rule
    // degrades to O(|bucket|) hub pairs (recall on that bucket is best
    // effort — documented), but it must NEVER emit a pair beyond
    // maxHamming nor do quadratic work. Forcing maxBucket=1 exercises the
    // hub path on every bucket.
    val hubOnly = Rules.simHashNearDup(feat, col("url"), col("simhash"),
      maxHamming = 3, maxBucket = 1)
    val all = Rules.simHashNearDup(feat, col("url"), col("simhash"),
      maxHamming = 3)
    val shOf = feat.select("url", "simhash").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hubRows = hubOnly.collect()
    hubRows.foreach { r =>
      val d = java.lang.Long.bitCount(shOf(r.getString(0)) ^ shOf(r.getString(4)))
      assert(d <= 3, s"hub regime flagged ${r.getString(0)} at Hamming $d")
    }
    // hub verdicts are a SUBSET of the all-pairs regime's flagged urls
    val allSet = all.collect().map(_.getString(0)).toSet
    val hubSet = hubRows.map(_.getString(0)).toSet
    assert(hubSet.subsetOf(allSet),
      s"hub regime flagged urls the exact regime did not: ${(hubSet -- allSet).take(3)}")
  }

  // --- wide (128-bit) fingerprint: the 10⁹⁺-doc production regime ---

  private lazy val featWide = pages
    .withColumn("__ds", graft.functions.DocStats.docStats(
      coalesce(col("text"), lit("")), 0, wideSimHash = true))
    .select(col("url"),
      col("__ds.simhash_hi").as("sh_hi"), col("__ds.simhash_lo").as("sh_lo"))
    .cache()

  test("wide fingerprint: identical docs agree; planted near-dups within Hamming 6 of 128") {
    val rows = featWide.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val urlOfId = rows.keys.map(u => idOf(u) -> u).toMap
    val planted = rows.keys.filter(u => PagesGen.errorClass(idOf(u)) == "near_dup")
    var within = 0; var total = 0
    planted.foreach { u =>
      val id = idOf(u)
      val baseId = PagesGen.cleanBaseAtOrAbove(id - math.floorMod(id, 97L) + 2)
      urlOfId.get(baseId).foreach { bu =>
        total += 1
        val (h1, l1) = rows(u); val (h2, l2) = rows(bu)
        val d = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
        if (d <= 6) within += 1
      }
    }
    info(s"planted near-dup pairs within Hamming 6/128: $within/$total")
    assert(total > 0)
    // a single-token edit flips a bit count proportional to fingerprint
    // width — 6/128 is the same dissimilarity level as 3/60
    assert(within.toDouble / total >= 0.9,
      s"only $within/$total planted pairs within Hamming 6 at 128 bits")
  }

  test("simHashNearDupWide recall >= the 60-bit rule on planted pairs; precision holds") {
    val wide = Rules.simHashNearDupWide(featWide, col("url"),
      col("sh_hi"), col("sh_lo")).collect()
    val narrow = Rules.simHashNearDup(feat, col("url"), col("simhash"))
      .collect().map(_.getString(0)).toSet
    val wideSet = wide.map(_.getString(0)).toSet
    val urls = feat.select("url").collect().map(_.getString(0))
    val urlOfId = urls.map(u => idOf(u) -> u).toMap
    def pairCaught(flagged: Set[String]): (Int, Int) = {
      var caught = 0; var total = 0
      urls.filter(u => PagesGen.errorClass(idOf(u)) == "near_dup").foreach { u =>
        val id = idOf(u)
        val baseId = PagesGen.cleanBaseAtOrAbove(id - math.floorMod(id, 97L) + 2)
        if (urlOfId.contains(baseId)) {
          total += 1
          if (flagged(u) || flagged(urlOfId(baseId))) caught += 1
        }
      }
      (caught, total)
    }
    val (wCaught, total) = pairCaught(wideSet)
    val (nCaught, _) = pairCaught(narrow)
    info(s"planted-pair recall: wide(128)=$wCaught/$total narrow(60)=$nCaught/$total")
    assert(wCaught >= nCaught,
      s"wide rule ($wCaught) must not lag the 60-bit rule ($nCaught) on plants")
    // precision of verify: nothing beyond maxHamming on the wide fingerprint
    val shOf = featWide.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    wide.foreach { r =>
      val (h1, l1) = shOf(r.getString(0)); val (h2, l2) = shOf(r.getString(4))
      val d = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
      assert(d <= 6, s"${r.getString(0)} flagged at wide Hamming $d")
      assert(r.getDouble(3) <= d.toDouble)
    }
  }

  test("wide kernel flag: off => zero hi/lo at zero cost; on => deterministic, distinct docs differ") {
    val a = graft.functions.DocStats.compute("the quick brown fox jumps over the lazy dog", 0)
    assert(a.simhashHi == 0L && a.simhashLo == 0L)
    val b1 = graft.functions.DocStats.compute("the quick brown fox jumps over the lazy dog", 0, wide = true)
    val b2 = graft.functions.DocStats.compute("the quick brown fox jumps over the lazy dog", 0, wide = true)
    assert(b1.simhashHi == b2.simhashHi && b1.simhashLo == b2.simhashLo)
    assert(b1.simhashHi != 0L || b1.simhashLo != 0L)
    val c = graft.functions.DocStats.compute("completely different content about ships and harbors", 0, wide = true)
    assert((b1.simhashHi, b1.simhashLo) != (c.simhashHi, c.simhashLo))
    val e = graft.functions.DocStats.compute("", 0, wide = true)
    assert(e.simhashHi == 0L && e.simhashLo == 0L)
  }

  test("pigeonhole banding emits no pair beyond maxHamming (precision of verify)") {
    val verdicts = Rules.simHashNearDup(feat, col("url"), col("simhash"),
      maxHamming = 3)
    val shOf = feat.select("url", "simhash").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    verdicts.collect().foreach { r =>
      val d = java.lang.Long.bitCount(shOf(r.getString(0)) ^ shOf(r.getString(4)))
      assert(d <= 3, s"${r.getString(0)} flagged at Hamming $d")
      // score = min distance over the url's verified partners ≤ the
      // distance to the reported (min-url) survivor
      assert(r.getDouble(3) <= d.toDouble)
    }
  }
}
