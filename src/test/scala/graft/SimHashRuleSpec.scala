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
