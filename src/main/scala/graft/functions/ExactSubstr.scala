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
  *  - gram text never EXISTS: [[GramHash]] emits (xxhash64(gram), key,
  *    pos) straight from the staged token array in the scan partition,
  *    ~20 B/token, no interpreted HOF, no gram-string allocation.
  *    (Hash note: bucketing by 64-bit hash, like exactDup/boilerplate;
  *    the DuckDB oracle groups by gram text itself — identical result
  *    absent a 64-bit collision.)
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
    *
    * EAGER AT CONSTRUCTION: this method runs Spark jobs before
    * returning (the shared-gram set is materialised and counted to pick
    * the join strategy — AQE cannot see that the ≥minDocs filter leaves
    * a broadcast-sized build side). Callers composing it into a larger
    * job should defer construction to where the work may overlap other
    * actions — QualityPipeline.run builds it inside the v1a future for
    * exactly this reason.
    */
  def substrDupStats(df: DataFrame, key: Column, text: Column,
                     l: Int, minDocs: Long = 2L,
                     maxBroadcastGrams: Long = 4000000L): DataFrame = {
    require(l >= 1, s"span length must be >= 1 token, got $l")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document), got $minDocs")
    // Tokens are STAGED in a column so the gram kernel reads a bound
    // attribute; the composed wordNgrams + xxhash64(__g) shape ran the
    // interpreted-HOF lambda re-evaluating the tokenizer per window
    // (O(tokens²) regex work per doc — 23.6 s on the sf0.1 board, 10×
    // the next query). GramHashes emits bit-identical xxhash64 values
    // in one codegen'd pass and the gram string now never exists at all.
    val base = df.select(key.as("__k"), text.as("__t"))
    // the window table is left LAZY deliberately: it is referenced by
    // the shared-gram aggregate and the coverage join (2 computes), but
    // an eager localCheckpoint here measured SLOWER at bench scale (the
    // materialisation action costs more than one recompute of the
    // codegen'd gram pass) and at corpus scale would store ~16 B/window
    // — recomputing a scan-speed kernel beats persisting a corpus-sized
    // intermediate
    val pos = base
      .withColumn("__toks", TextFns.tokens(lower(col("__t"))))
      .select(col("__k"),
        posexplode(GramHash.gramHashes(col("__toks"), l)).as(Seq("__p0", "__h")))
      .select(col("__k"), (col("__p0") + 1).cast("long").as("__pos"), col("__h"))
    // per-doc token counts via the fused byte kernel (wordCountFast ==
    // size(tokens), TextFnsSpec-pinned); greatest(_, 0) absorbs the
    // null-text null
    val nTokens = base.select(col("__k"),
      greatest(TextFns.wordCountFast(col("__t")), lit(0)).cast("long")
        .as("n_tokens"))
    val ndRaw = pos.select("__h", "__k").distinct()
      .groupBy("__h").agg(count(lit(1)).as("__ndocs"))
      .filter(col("__ndocs") >= minDocs)
      .select("__h")
    // The shared-gram set is typically TINY relative to the window table
    // (only grams in ≥ minDocs docs survive — 403k of ~15M distinct
    // hashes on the 100k-doc bench corpus), but AQE can't see that: the
    // ≥minDocs filter sits ABOVE the agg stage whose materialized stats
    // it reads, so the planner keeps a shuffle join and re-partitions
    // the ENTIRE window table (the operator's one unbounded side) just
    // to probe a 3 MB build set. Materialize nd (an 8-byte hash per
    // shared gram), count it, and broadcast when it fits — measured
    // 34 s → 11 s on the 100k-doc battery. Above the gate (boilerplate-
    // heavy corpora at the 10⁹⁺ regime) the plan is the previous
    // hash-partitioned join, unchanged.
    val nd = ndRaw.localCheckpoint(true)
    val ndSide = if (nd.count() <= maxBroadcastGrams) broadcast(nd) else nd
    val w = Window.partitionBy(col("__k")).orderBy(col("__pos"))
    val cov = pos.join(ndSide, Seq("__h"))
      .select(col("__k"), col("__pos"))
      .withColumn("__c", coalesce(
        least(lit(l.toLong), col("__pos") - lag(col("__pos"), 1).over(w)),
        lit(l.toLong)))
      .groupBy("__k")
      .agg(count(lit(1)).as("n_dup_windows"), sum(col("__c")).as("dup_tokens"))
    nTokens
      .join(cov, Seq("__k"), "left")
      .select(col("__k"), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast(DoubleType) /
          nullif(col("n_tokens"), lit(0L)), 6).as("dup_frac"))
  }
}
