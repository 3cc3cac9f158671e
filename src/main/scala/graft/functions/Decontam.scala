package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Benchmark DECONTAMINATION: per-document word n-gram overlap against a
  * held-out evaluation corpus — the standard training-data hygiene test
  * (GPT-3, Brown et al. 2020 appx C, used 13-gram collisions; PaLM and
  * successors the same shape with n 8-13). A document whose n-grams
  * collide with an eval set is a test-set leak and must be dropped
  * before training, not merely down-weighted.
  *
  * The reference engine (/root/reference/src/improve_data_quality.py)
  * has no notion of an external corpus; this module is part of the
  * LLM-pipeline surface the engine adds beyond it.
  *
  * Scale shape (built for the 10⁸-doc × 10⁶-eval-gram regime):
  *  - eval side: distinct n-grams of the EVAL corpus. Eval suites are
  *    tiny relative to the training corpus (10⁵-10⁷ grams ⇒ tens of MB)
  *    — the canonical broadcast side. `contamination` takes it as a
  *    DataFrame so production loads it from any source; pass
  *    `broadcastEval = false` for a pathological eval set bigger than
  *    the broadcast threshold and the same plan degrades to a shuffle
  *    hash join on the gram.
  *  - corpus side: one narrow projection (tokenize + gram assembly),
  *    `explode`, broadcast-hash probe, then a per-doc count. The
  *    partial aggregation collapses each doc's grams map-side (docs are
  *    contiguous within a scan partition), so the one shuffle carries
  *    ~one small row per document — never gram text volume.
  *
  * Tokenisation contract (shared with [[TextFns.tokens]] / the DuckDB
  * oracle): lowercase, trim, split on `\s+`, empties dropped; a gram is
  * n consecutive tokens joined by single spaces. Counting is MULTISET on
  * the document side (every colliding occurrence counts, GPT-3 style)
  * and DISTINCT on the eval side.
  */
object Decontam {

  /** Array of word n-grams of `c` (lowercased), `[]` when the doc has
    * fewer than n tokens, null on null text.
    */
  def wordNgrams(c: Column, n: Int): Column = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val toks = TextFns.tokens(lower(c))
    when(isnull(c), lit(null).cast("array<string>"))
      .when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct n-grams of an eval corpus, as a one-column `gram` frame —
    * the (broadcast) build side of the contamination probe.
    */
  def evalGrams(evalDf: DataFrame, text: Column, n: Int): DataFrame =
    evalDf.select(explode(wordNgrams(text, n)).as("gram")).distinct()

  /** Per-document contamination: (key, n_grams, n_contaminated,
    * contam_frac). `contam_frac` is null for documents with no n-grams
    * (< n tokens). Every document of `df` appears exactly once
    * (`explode_outer` keeps gram-less docs).
    */
  def contamination(df: DataFrame, key: Column, text: Column,
                    eval: DataFrame, n: Int,
                    broadcastEval: Boolean = true): DataFrame = {
    // Probe on 64-bit gram hashes: the corpus side computes them with
    // the codegen'd [[GramHash]] kernel over a staged token array (the
    // composed wordNgrams shape re-evaluated the tokenizer per window in
    // the interpreted HOF lambda), and the eval side — always the tiny,
    // often-broadcast side — hashes its materialized gram strings with
    // the xxhash64 built-in, which [[GramHash]] matches bit-for-bit. A
    // 64-bit collision counting a clean gram as contaminated is the
    // same accepted risk as the exactDup/boilerplate hash bucketing.
    val ev = (if (broadcastEval) broadcast(eval) else eval)
      .select(xxhash64(col("gram")).as("__h"), lit(1).as("__hit"))
    val grams = df
      .select(key.as("__k"), text.as("__t"))
      .withColumn("__toks", TextFns.tokens(lower(col("__t"))))
      .select(col("__k"), GramHash.gramHashes(col("__toks"), n).as("__hs"))
      .select(col("__k"), size(col("__hs")).as("__n"),
        explode_outer(col("__hs")).as("__h"))
    grams.join(ev, Seq("__h"), "left")
      .groupBy("__k")
      // __n is constant per key; max() just carries it through the agg
      .agg(greatest(max(col("__n")), lit(0)).cast("long").as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_contaminated"))
      .select(col("__k"), col("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast(DoubleType) /
          nullif(col("n_grams"), lit(0L)), 6).as("contam_frac"))
  }
}
