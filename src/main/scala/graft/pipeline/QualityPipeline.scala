package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType
import graft.functions._
import graft.rules.Rules
import graft.model.ColumnProfile
import graft.profile.Profiler

/** The webtext keep/drop + scrub engine (north rule).
  *
  * Dataflow (two-pass, mirroring the reference's firstpass/secondpass
  * sequencing — `/root/reference/src/improve_data_quality.py:227-284`,
  * pass-2 sees only pass-1 survivors, :610/:739):
  *
  *   pages ──(narrow fused projection)──> features
  *   features ──(per-row rules: no shuffle)──> verdicts₁a
  *   features ──(dedup groupBy on 8-byte hash)──> verdicts₁b
  *   features ──(MinHash bands groupBy)──> verdicts₁c
  *   kept₁ = pages ⟕ anti-join(verdicts₁)
  *   kept₁ ──(corpus-stat + group rules)──> verdicts₂
  *   kept  = kept₁ anti-join verdicts₂, + scrubbed_text (narrow)
  *
  * Scale shape: ONE full scan of text (the fused feature projection);
  * shuffles carry only (url, hashes/scores) — never the document body;
  * group rules shuffle on low-cardinality or hash-distributed keys.
  */
object QualityPipeline {

  final case class Config(
      minWords: Int = 30,                // C4-style short-doc rule
      maxSymbolRatio: Double = 0.10,     // Gopher symbol-to-char
      minStopwordRatio: Double = 0.01,   // en docs only (C4 needs stopwords)
      minMeanWordLen: Double = 2.0,      // Gopher word-length window
      maxMeanWordLen: Double = 12.0,
      maxPerplexity: Double = 12.0,      // LM junk threshold (clean ≤ ~7.2, gibberish ≥ ~34 on the fixture)
      zScoreK: Double = 6.0,             // reference default (utils.py:190)
      groupZK: Double = 10.0,            // per-lang ppl outliers: conservative (abs rule is primary)
      langIdMinMargin: Double = 0.35,    // mismatch rule confidence gate
      maxDupLineRatio: Double = 0.30,    // line-dedup (C4 boilerplate)
      minHashK: Int = 32,                // signature width
      bands: Int = 8, rowsPerBand: Int = 4,
      minJaccard: Double = 0.80,         // near-dup verify threshold
      rareComboMin: Long = 10,           // A5 semantics
      maxToxicityHits: Int = 3,          // drop beyond; scrub below
      saltBuckets: Int = 64)             // two-phase agg fan-out for skew

  val defaultConfig: Config = Config()

  // ---------------------------------------------------------------------
  // Stage 1: fused per-document features — one narrow pass over `text`.
  // ---------------------------------------------------------------------
  /** All per-doc features come from ONE fused expression
    * ([[graft.functions.DocStats]]) — a single tight JVM pass per
    * document (~10 µs/doc). The composed Column/higher-order-function
    * version measured ~16 ms/doc (HOF lambdas are interpreted per
    * element, and any Column subtree referenced inside a lambda
    * re-evaluates per element — see DocStats scaladoc). TextFns remains
    * the semantic reference; DocStatsSpec cross-validates the two paths.
    */
  def features(pages: DataFrame, cfg: Config = defaultConfig): DataFrame =
    // html is the raw payload (text extraction input) — nothing after the
    // feature stage reads it, and caching it would double the working set
    pages.drop("html")
      .withColumn("__ds", DocStats.docStats(coalesce(col("text"), lit("")), cfg.minHashK))
      .withColumn("n_chars", col("__ds.n_chars"))
      .withColumn("n_words", col("__ds.n_words"))
      .withColumn("mean_word_len", col("__ds.mean_word_len"))
      .withColumn("symbol_ratio", col("__ds.symbol_ratio"))
      .withColumn("stopword_ratio", col("__ds.stopword_ratio"))
      .withColumn("toxicity_hits", col("__ds.toxicity_hits"))
      .withColumn("n_lines", col("__ds.n_lines"))
      .withColumn("n_distinct_lines", col("__ds.n_distinct_lines"))
      .withColumn("dup_line_ratio", col("__ds.dup_line_ratio"))
      .withColumn("lang_id", struct(
        col("__ds.lang").as("lang"), col("__ds.lang_score").as("score")))
      .withColumn("perplexity", col("__ds.perplexity"))
      .withColumn("fingerprint", col("__ds.fingerprint"))
      .withColumn("minhash_sig", col("__ds.minhash_sig"))
      .drop("__ds")

  // ---------------------------------------------------------------------
  // Pass 1 rules
  // ---------------------------------------------------------------------
  private def v(df: DataFrame, rule: String, score: Column, detail: Column): DataFrame =
    df.select(col("url"), lit(rule).as("rule"), lit(false).as("keep"),
      score.cast(DoubleType).as("score"), detail.cast("string").as("detail"))

  /** Per-row heuristic rules — pure filters over the feature projection,
    * zero shuffle. Gopher/C4 semantics ≙ reference extreme/empty rules.
    */
  def heuristicVerdicts(feat: DataFrame, cfg: Config): DataFrame = {
    val empty = v(feat.filter(col("text").isNull || col("n_words") < cfg.minWords),
      "empty", col("n_words"), lit("min_words"))
    val symbols = v(feat.filter(col("symbol_ratio") > cfg.maxSymbolRatio),
      "symbol_ratio", col("symbol_ratio"), lit("max_symbol_ratio"))
    val mwl = v(feat.filter(col("mean_word_len").isNotNull &&
      (col("mean_word_len") < cfg.minMeanWordLen ||
        col("mean_word_len") > cfg.maxMeanWordLen)),
      "mean_word_len", col("mean_word_len"), lit("word_len_window"))
    val stop = v(feat.filter(col("lang_id.lang") === "en" &&
      col("stopword_ratio").isNotNull &&
      col("stopword_ratio") < cfg.minStopwordRatio),
      "stopword_ratio", col("stopword_ratio"), lit("en_min_stopwords"))
    val ppl = v(feat.filter(col("perplexity") > cfg.maxPerplexity),
      "perplexity", col("perplexity"), lit("lm_junk"))
    val dupLines = v(feat.filter(col("dup_line_ratio") > cfg.maxDupLineRatio),
      "dup_lines", col("dup_line_ratio"), lit("boilerplate_lines"))
    val langMismatch = v(feat.filter(
      col("lang").isNotNull && col("lang_id.score") > cfg.langIdMinMargin &&
        col("lang_id.lang") =!= col("lang")),
      "lang_mismatch", col("lang_id.score"), col("lang_id.lang"))
    val tox = v(feat.filter(col("toxicity_hits") > cfg.maxToxicityHits),
      "toxicity", col("toxicity_hits"), lit("max_toxicity_hits"))
    Seq(symbols, mwl, stop, ppl, dupLines, langMismatch, tox)
      .foldLeft(empty)(_ unionByName _)
  }

  /** Exact dedup on the 60-bit content fingerprint: shuffle carries
    * (url, fingerprint) only. keep='first' ⇒ min url (SURVEY §2.3).
    */
  def exactDupVerdicts(feat: DataFrame): DataFrame =
    Rules.exactDup(
      feat.filter(col("text").isNotNull && col("n_chars") > 0),
      col("url"), col("fingerprint"))

  /** Near-dup via MinHash + LSH banding: docs sharing any band bucket are
    * candidates; candidates are verified by signature-estimated Jaccard;
    * in each near-dup pair the larger url is dropped. The band groupBy is
    * hash-distributed by construction (band keys are uniform hashes), so
    * host-level skew cannot concentrate this shuffle.
    */
  def nearDupVerdicts(feat: DataFrame, cfg: Config,
                      bag: CacheBag = new CacheBag): DataFrame = {
    val sigs = feat
      .filter(col("text").isNotNull && col("n_words") >= lit(5))
      .select(col("url"), col("minhash_sig"))
    // candidate discovery shuffles ONLY (url, band, key) — never the
    // signature (the exploded bands would otherwise carry `bands` copies
    // of every signature through the shuffle)
    val bands = sigs
      .select(col("url"),
        explode(Hashing.bandKeys(col("minhash_sig"), cfg.bands, cfg.rowsPerBand)).as("b"))
      .select(col("url"), col("b.band").as("band"), col("b.key").as("key"))
    // HUB pairING, not all-pairs: each bucket member pairs with the
    // bucket's min url only. An all-pairs self-join is O(|bucket|²) and a
    // single template-heavy bucket (boilerplate, shared page furniture)
    // detonates it at web scale; the hub star gives O(|bucket|) pairs and
    // — since the survivor of a near-dup cluster is its min url anyway —
    // the same keep/drop decisions for clusters that share buckets.
    val hubs = bands.groupBy(col("band"), col("key"))
      .agg(min(col("url")).as("hub"), count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1) // singleton buckets can't pair
      .drop("__cnt")
    val pairs = bands.join(hubs, Seq("band", "key"))
      .filter(col("url") =!= col("hub"))
      .select(col("hub").as("url1"), col("url").as("url2"))
      .dropDuplicates("url1", "url2")
    // verify candidates: join signatures back (pairs ≪ corpus)
    val withSigs = pairs
      .join(sigs.select(col("url").as("url1"), col("minhash_sig").as("sig1")), Seq("url1"))
      .join(sigs.select(col("url").as("url2"), col("minhash_sig").as("sig2")), Seq("url2"))
    val jac = withSigs.withColumn("jaccard",
      aggregate(zip_with(col("sig1"), col("sig2"),
        (a, b) => when(a === b, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast(DoubleType) / lit(cfg.minHashK))
      .filter(col("jaccard") >= cfg.minJaccard)
    // transitive closure over the verified pairs: the reference's MCL
    // yields TRANSITIVE clusters (/root/reference/src/markov_clustering.py:58-73)
    // — a chain A~B~C where A and C share no bucket must still keep only
    // one survivor. Min-label propagation over the (tiny) verified edge
    // set; each member is dropped in favour of its cluster-min url.
    val labels = connectedMin(jac.select(col("url1"), col("url2")), bag)
    labels.filter(col("url") =!= col("label"))
      .select(col("url"), lit("near_dup").as("rule"),
        lit(false).as("keep"), lit(1.0).cast(DoubleType).as("score"),
        col("label").cast("string").as("detail"))
  }

  /** Connected components by iterative min-label propagation:
    * (url, label=min url of its component). The edge set is verified
    * near-dup pairs — orders of magnitude smaller than the corpus — so a
    * handful of tiny shuffles is cheap; iterations are bounded by the
    * cluster diameter (near-dup clusters are dense star/clique-like
    * shapes, diameter ≤ a few hops; hard cap 15 documents the contract).
    */
  private[graft] def connectedMin(pairs: DataFrame,
                                  bag: CacheBag = new CacheBag): DataFrame = {
    val edges = pairs.select(col("url1").as("a"), col("url2").as("b"))
      .unionByName(pairs.select(col("url2").as("a"), col("url1").as("b")))
      .distinct().cache()
    var labels = edges.groupBy(col("a").as("url"))
      .agg(least(min(col("b")), first(col("a"))).as("label")).cache()
    var converged = false
    var iter = 0
    while (!converged && iter < 15) {
      // propagate: my new label = min(my label, labels of my neighbors)
      val next = edges
        .join(labels.withColumnRenamed("url", "b").withColumnRenamed("label", "nl"), Seq("b"))
        .groupBy(col("a").as("url")).agg(min(col("nl")).as("pl"))
        .join(labels, Seq("url"))
        .select(col("url"), least(col("label"), col("pl")).as("label"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("url"))
        .filter(col("label") < col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // the final labels cache must OUTLIVE this call (the returned verdict
    // view reads it until v1 is materialised) — the bag releases it
    bag.track(labels)
    labels
  }

  def pass1(feat: DataFrame, cfg: Config = defaultConfig,
            bag: CacheBag = new CacheBag): DataFrame =
    heuristicVerdicts(feat, cfg)
      .unionByName(exactDupVerdicts(feat))
      .unionByName(nearDupVerdicts(feat, cfg, bag))

  // ---------------------------------------------------------------------
  // Pass 2 — corpus-stat rules over pass-1 survivors
  // ---------------------------------------------------------------------
  /** Pass-2 corpus statistics (z-score gates + moments + tendency arming)
    * come from ONE fused aggregation job — separate Profiler/moments/
    * tendency actions each cost a full job round-trip, and those fixed
    * latencies (not compute) were the scaling-efficiency ceiling.
    * All sums are exact decimals (order-independent — see Stats).
    */
  def pass2(survivors: DataFrame, cfg: Config = defaultConfig): DataFrame = {
    val (v2, statCols) = pass2Impl(survivors, cfg)
    // force now so the caller may not leak the internal cache forever:
    // the verdicts are tiny, the cache has served its purpose once built
    v2.cache().count()
    statCols.unpersist()
    v2
  }

  /** pass2 returning (verdicts, internal statCols cache) so [[run]] can
    * release the cache once the result set is materialised.
    */
  private def pass2Impl(survivors: DataFrame, cfg: Config): (DataFrame, DataFrame) = {
    val statCols = survivors.select("url", "lang", "n_chars", "n_words", "perplexity")
      .cache()
    import org.apache.spark.sql.types.DecimalType
    def dec(c: String) = col(c).cast(DecimalType(38, 10))
    def decSq(c: String) =
      col(c).cast(DecimalType(19, 5)) * col(c).cast(DecimalType(19, 5))
    val row = statCols.agg(
      count(col("n_chars")).as("nc_n"), countDistinct(col("n_chars")).as("nc_d"),
      sum(dec("n_chars")).as("nc_s"), sum(decSq("n_chars")).as("nc_s2"),
      count(col("n_words")).as("nw_n"), countDistinct(col("n_words")).as("nw_d"),
      sum(dec("n_words")).as("nw_s"), sum(decSq("n_words")).as("nw_s2"),
      sum((col("n_words") < col("n_chars")).cast("long")).as("tend_lt"),
      count(lit(1)).as("total")).head()
    def momentsOf(p: String) = graft.profile.Stats.fromSums(
      row.getAs[Long](s"${p}_n"),
      row.getAs[java.math.BigDecimal](s"${p}_s"),
      row.getAs[java.math.BigDecimal](s"${p}_s2"))
    def uniqOf(p: String) = {
      val n = row.getAs[Long](s"${p}_n")
      if (n == 0) 0.0 else row.getAs[Long](s"${p}_d").toDouble / n
    }
    val extremes = Seq("n_chars" -> "nc", "n_words" -> "nw").flatMap {
      case (c, p) =>
        Rules.zScoreExtreme(statCols, col("url"), col(c), c,
          uniqOf(p), momentsOf(p), cfg.zScoreK)
    }
    val groupZ = Rules.groupZScore(statCols, col("url"), col("lang"),
      col("perplexity"), "perplexity", cfg.groupZK)
    val rare = Rules.rareCombo(
      statCols.withColumn("tld", regexp_extract(col("url"),
        "https?://[^/]*?(\\.[a-z]+)(?:[:/]|$)", 1)),
      col("url"), col("lang"), col("tld"), "lang", "tld", cfg.rareComboMin)
    // tendency (A4): armed from the fused stats row; quirk preserved
    // (denominator = all rows)
    val total = row.getAs[Long]("total")
    val lt = Option(row.getAs[Any]("tend_lt")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val tend =
      if (total == 0 || lt.toDouble / total <= 0.999) None
      else Some(statCols
        .filter(col("n_words").isNotNull && col("n_chars").isNotNull &&
          col("n_words") > col("n_chars"))
        .select(col("url"), lit("tendency_n_words_n_chars").as("rule"),
          lit(false).as("keep"), lit(lt.toDouble / total).cast(DoubleType).as("score"),
          concat_ws(">", col("n_words"), col("n_chars")).as("detail")))
    val v2 = (extremes ++ Seq(groupZ, rare) ++ tend.toSeq)
      .reduceOption(_ unionByName _)
      .getOrElse(statCols.sparkSession.createDataFrame(
        statCols.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.Verdict.schema))
    (v2, statCols)
  }

  // ---------------------------------------------------------------------
  // Assembly
  // ---------------------------------------------------------------------
  /** Registry of cached intermediates so a long-running caller (the
    * Checkpointer loops over hundreds of day partitions; benches loop over
    * parallelism levels) can release them once outputs are written —
    * otherwise cached RDDs accumulate unboundedly across partitions.
    */
  final class CacheBag {
    private val dfs = scala.collection.mutable.Buffer[DataFrame]()
    def track(df: DataFrame): DataFrame = { dfs += df; df }
    def release(): Unit = { dfs.foreach(_.unpersist()); dfs.clear() }
  }

  final case class Result(verdicts: DataFrame, kept: DataFrame,
                          metrics: DataFrame, bag: CacheBag) {
    /** Release every cached intermediate. Call AFTER kept/verdicts are
      * written (the outputs are lazy views over the caches).
      */
    def unpersist(): Unit = bag.release()
  }

  /** Full run: features → pass1 → survivors → pass2 → kept + scrub.
    * `fusedScrub=true` uses the single-pass ScrubText expression; both
    * paths produce byte-identical output (property-tested).
    */
  def run(pages: DataFrame, cfg: Config = defaultConfig,
          fusedScrub: Boolean = true): Result = {
    val bag = new CacheBag
    val feat = bag.track(features(pages, cfg).cache())
    // MATERIALIZATION BARRIER: pass-1 is a union of three independent
    // branches that all scan `feat`; without forcing the cache first,
    // their stages run concurrently against a cold cache and each branch
    // recomputes the feature projection (observed 2× wall at high
    // parallelism from duplicate work + memory-store contention)
    feat.count()
    // verdicts are tiny relative to pages — caching v1 (and the url-only
    // drop-set) means neither the dedup joins nor pass-1 re-run for any
    // downstream action (pass-2 stats, kept build, verdict write)
    val v1 = bag.track(pass1(feat, cfg, bag).cache())
    val dropped1 = bag.track(v1.select("url").distinct().cache())
    val survivors = feat.join(dropped1, Seq("url"), "left_anti")
    // pass-2's single stats-agg action (inside pass2Impl) materialises
    // the v1/dropped1 caches through the survivor anti-join lineage — a
    // separate dropped1.count() barrier here was pure serial driver
    // latency (one full job round-trip on the critical path)
    val (v2raw, statCols) = pass2Impl(survivors, cfg)
    bag.track(statCols)
    // v2 is small; caching it keeps the kept-build and the verdict write
    // from re-running the pass-2 group joins
    val v2 = bag.track(v2raw.cache())
    val verdicts = v1.unionByName(v2)
    val scrub: Column => Column =
      if (fusedScrub) Scrub.scrubFused else Scrub.scrubCol
    val kept = survivors
      .join(v2.select("url").distinct(), Seq("url"), "left_anti")
      .select(col("url"), col("warc_ts"), col("lang"),
        col("lang_id.lang").as("lang_detected"),
        col("perplexity"), col("n_words"),
        scrub(col("text")).as("scrubbed_text"))
    val metrics = verdicts.rollup(col("rule")).count()
      .withColumn("rule", coalesce(col("rule"), lit("__total__")))
    Result(verdicts, kept, metrics, bag)
  }
}
