package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cross-document EXACT-SUBSTRING duplication (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better",
  * ExactSubstr): any span of ≥ L tokens appearing verbatim in more than
  * one document is duplicated text — press syndication, mirrors, quote
  * farms — invisible to whole-document dedup (MinHash/SimHash judge the
  * whole doc; a 10% shared span in two long, otherwise-different pages
  * moves neither signature past its threshold).
  *
  * The paper resolves spans with a corpus-wide suffix array — a
  * single-node construction. The distributed re-expression: every
  * L-token window is an L-gram; a span of ≥ L tokens shared between two
  * docs is EXACTLY a run of ≥ 1 shared L-gram windows, so per-doc
  * "duplicated tokens" = the size of the union of [pos, pos+L) intervals
  * over windows whose gram occurs in ≥ `minDocs` distinct docs. That
  * union is computable with one per-doc window function over shared
  * window positions (sorted starts, equal lengths ⇒ each row adds
  * `min(L, pos − prevPos)`).
  *
  * The reference engine (/root/reference/src/improve_data_quality.py)
  * deduplicates whole rows only; this module is part of the LLM-pipeline
  * surface beyond it.
  *
  * Scale shape (10⁸-doc regime, the boilerplateParagraphs pattern):
  *  - gram text NEVER shuffles: windows project to (xxhash64(gram), key,
  *    pos) in the scan partition, ~20 B/token. (Hash note: bucketing by
  *    64-bit hash, like exactDup/boilerplate; the DuckDB oracle groups
  *    by gram text itself — identical result absent a 64-bit collision.)
  *  - ndocs per gram = distinct-(hash, key) THEN count: the distinct
  *    spreads a mega-hot gram ("all rights reserved …" boilerplate)
  *    across the (hash, key) space before the map-side-combinable count.
  *  - shared-gram join-back is a shuffle join on the 8-byte hash; the
  *    build side is one row per ≥minDocs hash. The final per-doc window
  *    sorts ONLY shared window positions of one doc — web-scale docs are
  *    10³-10⁵ tokens, so a partition-local sort, never a corpus sort.
  *
  * Tokenisation contract shared with [[Decontam.wordNgrams]] / the
  * DuckDB `dq_substr_dup` oracle: lowercase, split on `\s+`, empties
  * dropped; a window is L consecutive tokens joined by single spaces;
  * positions are 1-based token indices.
  */
object ExactSubstr {

  /** Per-document duplicated-span stats: (__k, n_tokens, n_dup_windows,
    * dup_tokens, dup_frac). Every input document appears exactly once;
    * docs with no shared window (or < L tokens) carry zeros and
    * `dup_frac` 0 (null when the doc has zero tokens — no denominator).
    */
  def substrDupStats(df: DataFrame, key: Column, text: Column,
                     l: Int, minDocs: Long = 2L): DataFrame = {
    require(l >= 1, s"span length must be >= 1 token, got $l")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document), got $minDocs")
    val base = df.select(key.as("__k"),
      Decontam.wordNgrams(text, l).as("__gs"),
      // greatest(_, 0) absorbs size(null) = null on null text
      greatest(size(TextFns.tokens(text)), lit(0)).cast("long").as("n_tokens"))
    val pos = base
      .select(col("__k"), posexplode(col("__gs")).as(Seq("__p0", "__g")))
      .select(col("__k"), (col("__p0") + 1).cast("long").as("__pos"),
        xxhash64(col("__g")).as("__h"))
    val nd = pos.select("__h", "__k").distinct()
      .groupBy("__h").agg(count(lit(1)).as("__ndocs"))
      .filter(col("__ndocs") >= minDocs)
      .select("__h")
    val w = Window.partitionBy(col("__k")).orderBy(col("__pos"))
    val cov = pos.join(nd, Seq("__h"))
      .select(col("__k"), col("__pos"))
      .withColumn("__c", coalesce(
        least(lit(l.toLong), col("__pos") - lag(col("__pos"), 1).over(w)),
        lit(l.toLong)))
      .groupBy("__k")
      .agg(count(lit(1)).as("n_dup_windows"), sum(col("__c")).as("dup_tokens"))
    base.select(col("__k"), col("n_tokens"))
      .join(cov, Seq("__k"), "left")
      .select(col("__k"), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast(DoubleType) /
          nullif(col("n_tokens"), lit(0L)), 6).as("dup_frac"))
  }
}
