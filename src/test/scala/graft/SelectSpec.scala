package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.curation.Select
import graft.functions.TextFns

class SelectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 langs × uneven sizes, distinct deterministic scores, token counts
  // 5-50 — big enough that every regime (multi-bucket, boundary bin,
  // under-budget lang) appears
  private lazy val corpus = {
    val r = new scala.util.Random(43)
    val rows = (1 to 900).map { i =>
      val lang = Seq("en", "de", "zh")(i % 3)
      val n = if (lang == "zh" && i > 600) 0 else 1 // zh smaller
      (s"doc$i", lang, i * 0.001 + (i % 7) * 10.0, 5L + r.nextInt(46), n)
    }.filter(_._5 == 1).map(t => (t._1, t._2, t._3, t._4))
    rows.toDF("key", "lang", "score", "tokens")
      .withColumn("h", TextFns.md5Long(col("key")))
  }

  test("ntileBuckets: per-lang bucket sizes differ by <= 1, ordered by score") {
    val b = Select.ntileBuckets(corpus, col("key"), col("lang"), col("score"), 3)
      .select("key", "lang", "score", "bucket").collect()
    val byLang = b.groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_.getInt(3)).view.mapValues(_.length).toMap
      assert(sizes.keySet == Set(1, 2, 3), lang)
      assert(sizes.values.max - sizes.values.min <= 1, lang)
      // every bucket-1 score <= every bucket-3 score
      assert(rows.filter(_.getInt(3) == 1).map(_.getDouble(2)).max <=
        rows.filter(_.getInt(3) == 3).map(_.getDouble(2)).min, lang)
    }
  }

  test("assignByCutoffs on the full corpus reproduces ntileBuckets exactly") {
    val exact = Select.ntileBuckets(corpus, col("key"), col("lang"), col("score"), 3)
      .select("key", "bucket").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val cuts = Select.bucketCutoffs(corpus, col("key"), col("lang"),
      col("score"), 3, sampleMod = 1L)
    val got = Select.assignByCutoffs(corpus, col("key"), col("lang"),
        col("score"), cuts)
      .select("key", "bucket").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == exact)
  }

  test("bucketCutoffs: deterministic across repartitioning; sampled cutoffs ascend") {
    def run(parts: Int, mod: Long) =
      Select.bucketCutoffs(corpus.repartition(parts), col("key"), col("lang"),
          col("score"), 4, sampleMod = mod)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(run(3, 3L) == run(11, 3L))
    run(3, 3L).foreach { case (lang, cuts) =>
      assert(cuts == cuts.sorted, lang)
      assert(cuts.length == 3, lang)
    }
    // k = 1: no cutoffs, everything bucket 1
    val one = Select.assignByCutoffs(corpus, col("key"), col("lang"), col("score"),
        Select.bucketCutoffs(corpus, col("key"), col("lang"), col("score"), 1))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    assert(one == Seq(1))
  }

  test("tokenBudget: keeps best-first until the budget line; crossing doc kept") {
    val b = Select.ntileBuckets(corpus, col("key"), col("lang"), col("score"), 3)
    val kept = Select.tokenBudget(b, col("key"), col("lang"), col("bucket"),
        col("h"), col("tokens"), budget = 800L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    // brute-force twin
    val all = b.select("key", "lang", "bucket", "h", "tokens").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val expect = all.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(t => (t._3, t._4, t._1))
      var acc = 0L
      sorted.takeWhile { t => val keep = acc < 800L; acc += t._5; keep }
    }.map(t => (t._1, t._2, t._3, t._5)).toSet
    assert(kept.toSet == expect)
    // budget is crossed, not undershot: per lang, kept sum >= 800 (or whole lang)
    kept.groupBy(_._2).foreach { case (lang, rows) =>
      val total = all.filter(_._2 == lang).map(_._5).sum
      assert(rows.map(_._4).sum >= math.min(800L, total), lang)
    }
  }

  test("tokenBudgetScalable == tokenBudget, any binBits, any partitioning") {
    val b = Select.ntileBuckets(corpus, col("key"), col("lang"), col("score"), 3)
    val exact = Select.tokenBudget(b, col("key"), col("lang"), col("bucket"),
        col("h"), col("tokens"), budget = 800L)
      .select("key").collect().map(_.getString(0)).toSet
    for (bits <- Seq(2, 10); parts <- Seq(1, 7)) {
      val got = Select.tokenBudgetScalable(b.repartition(parts), col("key"),
          col("lang"), col("bucket"), col("h"), col("tokens"),
          budget = 800L, binBits = bits)
        .select("key").collect().map(_.getString(0)).toSet
      assert(got == exact, s"bits=$bits parts=$parts")
    }
    // a budget no language reaches keeps everything (no boundary bin)
    val allKeys = b.select("key").collect().map(_.getString(0)).toSet
    val huge = Select.tokenBudgetScalable(b, col("key"), col("lang"),
        col("bucket"), col("h"), col("tokens"), budget = 10_000_000L)
      .select("key").collect().map(_.getString(0)).toSet
    assert(huge == allKeys)
  }
}
