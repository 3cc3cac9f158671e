package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Proves the shingle doc-frequency cap (Queries.MaxShingleDf) defuses the
  * n-gram-Jaccard hot-key blowup: a boilerplate shingle shared by b docs
  * emits b·(b−1)/2 self-join rows — web boilerplate makes b huge, so the
  * uncapped join is O(b²) at exactly the keys that carry zero near-dup
  * signal. The cap bounds every join key at MaxShingleDf occurrences
  * WITHOUT losing genuine near-dup pairs (their shared shingles are rare
  * by definition — a shingle shared by the whole web identifies nothing).
  */
class NgramJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("df cap: 1k-copy boilerplate contributes ZERO join rows; genuine pair survives") {
    val boiler = "all rights reserved terms of service privacy policy " +
      "cookie settings navigation home about contact sitemap copyright notice"
    // 1000 docs sharing ONLY boilerplate + a unique prefix each
    val boilerDocs = (0 until 1000).map(i => (i.toLong, s"uniq${i}a uniq${i}b $boiler"))
    // one genuine near-dup pair with rare shingles (30 words, 1 changed)
    val basePair = (0 until 30).map(i => s"pairword$i").mkString(" ")
    val mutated = "changed " + (1 until 30).map(i => s"pairword$i").mkString(" ")
    val docs = (boilerDocs ++ Seq((5000L, basePair), (5001L, mutated)))
      .toDF("doc_id", "text")

    val ex0 = docs
      .withColumn("sh", graft.functions.ShingleHashes.shingleHashes(col("text"), 3))
      .select(col("doc_id"), explode(col("sh")).as("tok"))

    // uncapped: the boilerplate shingles each appear in 1000 docs → the
    // self-join would emit ≥ 10 shingles × 1000·999/2 ≈ 5M rows
    def joinRows(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy("tok").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head()
        .getAs[Any](0).asInstanceOf[Number].longValue()
    val uncappedJoinRows = joinRows(ex0)
    // capped: every surviving key has df ≤ MaxShingleDf
    val capped = Queries.cappedShingles(ex0).cache()
    val cappedJoinRows = joinRows(capped)
    info(s"self-join rows: uncapped=$uncappedJoinRows capped=$cappedJoinRows")
    assert(uncappedJoinRows > 4000000L, "fixture lost its hot keys")
    assert(cappedJoinRows < 1000L,
      s"cap failed to bound the join ($cappedJoinRows rows)")
    val maxDf = capped.groupBy("tok").count().agg(max("count")).head().getLong(0)
    assert(maxDf <= Queries.MaxShingleDf)

    // and the pipeline still finds exactly the genuine near-dup pair
    val pairs = Queries.ngramJaccardPairs(docs).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    assert(pairs.toSeq == Seq((5000L, 5001L)), pairs.mkString(", "))
    capped.unpersist()
  }
}
