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
  *   pages ──(narrow fused projection, text NOT retained)──> features
  *   features ──(per-row rules: no shuffle)──> verdicts₁a
  *   features ──(dedup groupBy on 8-byte hash)──> verdicts₁b
  *   features ──(MinHash bands groupBy)──> verdicts₁c
  *   survivors₁ = features anti-join verdicts₁
  *   survivors₁ ──(corpus-stat + group rules)──> verdicts₂
  *   kept = pages (SECOND source scan) anti-join (verdicts₁ ∪ verdicts₂),
  *          + scrubbed_text + lite-kernel output features (narrow)
  *
  * Scale shape: TWO narrow scans of the source text (feature pass, kept
  * writer) and a cached feature frame that carries NO document bodies
  * (~300 B/doc): at 10⁹-doc partitions the corpus text cannot live in
  * cluster storage memory, so the design re-reads the columnar source for
  * the kept output instead of caching or shuffling bodies. Shuffles carry
  * only (url, hashes/scores); group rules shuffle on low-cardinality or
  * hash-distributed keys.
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
      // mismatch rule confidence gate. Recalibrated 0.35 → 0.25 when the
      // langid model grew pt/nl/sv/pl confusers (round 3): the close
      // es↔pt pair compresses worst-case clean-doc margins to ~0.32
      // (LangIdSpec pins the floor per language), so the old gate would
      // have silently stopped flagging some corrupted-label docs.
      langIdMinMargin: Double = 0.25,
      maxDupLineRatio: Double = 0.30,    // line-dedup (C4 boilerplate)
      minHashK: Int = 32,                // signature width
      bands: Int = 8, rowsPerBand: Int = 4,
      minJaccard: Double = 0.80,         // near-dup verify threshold
      // opt-in SimHash near-dup second opinion next to the MinHash path:
      // Some(60) = pigeonhole-banded 60-bit rule (fine through ~10⁸
      // docs); Some(128) = Manku block-pair banding over the wide
      // fingerprint (the 10⁹⁺ regime — 15-bit chunks saturate there; see
      // Rules.simHashNearDup scaladoc). Default OFF: MinHash+verify is
      // the primary dedup path and the F1 goldens are pinned to it.
      simHashNearDupBits: Option[Int] = None,
      // opt-in Gopher repetition battery (Rae et al. 2021 Table A1) as
      // extra pass-1 rules; thresholds are the published ones. Default
      // OFF: the F1 goldens are pinned to the reference-derived rule set,
      // and the battery costs a second fused scan column (~ms/doc gram
      // maps) only when enabled.
      gopherRepetition: Boolean = false,
      maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxDupParaCharFrac: Double = 0.20,
      maxTop2GramCharFrac: Double = 0.20,
      maxTop3GramCharFrac: Double = 0.18,
      maxTop4GramCharFrac: Double = 0.16,
      maxDup5GramCharFrac: Double = 0.15,
      maxDup10GramCharFrac: Double = 0.10,
      // opt-in C4/RefinedWeb line battery (page-DROP rules only — the C4
      // line-EDIT rules would break the byte-identical scrub contract).
      // Default OFF, and note the golden fixture corpus is
      // punctuation-free, so minSentences is corpus-inappropriate there
      // (C4RulesSpec exercises the battery on a sentence-bearing corpus).
      c4Rules: Boolean = false,
      minSentences: Int = 3,             // C4 page rule
      maxBulletStartFrac: Double = 0.90, // RefinedWeb
      maxEllipsisEndFrac: Double = 0.30, // RefinedWeb
      // opt-in CCNet-style cross-document paragraph boilerplate rule
      // (Rules.boilerplateParagraphs). Costs one extra narrow source
      // scan + an 8-byte-hash shuffle when on; default off.
      ccnetBoilerplate: Boolean = false,
      boilerplateMinDocs: Long = 2,
      maxBoilerplateFrac: Double = 0.50,
      // opt-in benchmark decontamination (Rules.contaminationRule):
      // drop docs sharing >= decontamMinHits word decontamN-grams with
      // these eval passages. Seq[String] keeps Config serializable; a
      // production eval CORPUS goes through Rules.contaminationRule
      // with any DataFrame directly. Default empty = rule off.
      decontamPassages: Seq[String] = Nil,
      decontamN: Int = 8,
      decontamMinHits: Long = 1,
      // opt-in URL battery (Rules.urlBattery — narrow, zero-shuffle)
      // and per-host document cap (Rules.hostCap — one bounded-heap
      // groupBy on host + broadcast join-back). Off by default.
      urlRules: Boolean = false,
      urlBlockedHosts: Seq[String] = Nil,
      urlAdultKeywords: Seq[String] = Nil,
      maxUrlLen: Int = 2048,
      hostDocCap: Int = 0, // 0 = off
      // opt-in cross-document exact-substring duplication rule
      // (Rules.exactSubstrDup, Lee et al. 2021 shape): drop docs whose
      // >= exactSubstrTokens-token spans shared with other docs cover
      // >= maxSubstrDupFrac of their tokens. One extra narrow source
      // scan + an 8-byte-hash shuffle when on; 0 = off (the paper's
      // production L is 50).
      exactSubstrTokens: Int = 0,
      maxSubstrDupFrac: Double = 0.5,
      // opt-in model-based quality rule (Rules.modelQualityRule — the
      // fastText-shaped hashed-trigram classifier): drop docs scoring
      // below this. One codegen'd narrow map over the source text scan
      // when on; None = rule off (the F1 goldens are pinned to the
      // heuristic rule set). On the built-in model the planted classes
      // separate at 0.45 with ±0.17 margin (QualityModelSpec).
      modelQualityMin: Option[Double] = None,
      // opt-in HTML → text extraction at the pipeline entrance: text is
      // DERIVED from the html payload (HtmlExtract.extractBinary — the
      // north rule's "byte-identical extracted text per url" step)
      // instead of trusted from the source. A narrow codegen'd per-row
      // map on both source scans; zero cost when off. Default off: the
      // fixture corpus carries pre-extracted text.
      extractHtml: Boolean = false,
      rareComboMin: Long = 10,           // A5 semantics
      maxToxicityHits: Int = 3,          // drop beyond; scrub below
      saltBuckets: Int = 64,             // exact-dedup join-back salt fan-out (hot-key skew)
      // near-dup components: driver union-find below BOTH bounds,
      // distributed cascade above either. 200k edges / 300k members keeps
      // the driver fetch (url + primitive k-long signature per member,
      // ~350 B/member) under ~100 MB — safe on a stock 4–8 GB cluster
      // driver; the previous 2M-edge default courted an OOM exactly at
      // the crossover.
      maxDriverEdges: Long = 200000L,
      maxDriverMembers: Long = 300000L) {
    // bandKeysOf truncates the band set to the signature length; a config
    // asking for more banded rows than the signature holds would silently
    // diverge from the composed Hashing.bandKeys semantics (empty-slice
    // bands hash to key 0 and co-bucket every short-sig doc).
    require(bands * rowsPerBand <= minHashK,
      s"bands*rowsPerBand (${bands * rowsPerBand}) must not exceed minHashK ($minHashK)")
    require(simHashNearDupBits.forall(b => b == 60 || b == 128),
      s"simHashNearDupBits must be 60 or 128 (got $simHashNearDupBits)")
  }

  val defaultConfig: Config = Config()

  // env-gated phase timer (SPARK_GRAFT_PHASES=1): localizes driver-side
  // wall between actions — stage metrics alone can't show scheduling /
  // analysis / collect gaps
  private val PhaseLog = sys.env.contains("SPARK_GRAFT_PHASES")
  @inline private def ph[T](name: String)(f: => T): T =
    if (!PhaseLog) f
    else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(
        f"[phase] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

  // ---------------------------------------------------------------------
  // Stage 1: fused per-document features — one narrow pass over `text`.
  // ---------------------------------------------------------------------
  /** All per-doc features come from ONE fused expression
    * ([[graft.functions.DocStats]]) — a single tight JVM pass per
    * document (~100 µs/doc single-thread on ~1.4 KB docs, byte path +
    * one-probe score table). The composed Column/higher-order-function
    * version measured ~16 ms/doc (HOF lambdas are interpreted per
    * element, and any Column subtree referenced inside a lambda
    * re-evaluates per element — see DocStats scaladoc). TextFns remains
    * the semantic reference; DocStatsSpec cross-validates the two paths.
    */
  /** text column swap for `cfg.extractHtml`: derive text from the html
    * payload (before any html drop). Applied independently by features()
    * and run()'s kept writer — each extracts from the SOURCE bytes, so
    * the transform is never applied twice to the same column.
    */
  private def withSourceText(pages: DataFrame, cfg: Config): DataFrame =
    if (!cfg.extractHtml) pages
    else pages.withColumn("text",
      graft.functions.HtmlExtract.extractBinary(col("html")))

  def features(pages0: DataFrame, cfg: Config = defaultConfig): DataFrame = {
    val pages = withSourceText(pages0, cfg)
    // Gopher repetition battery rides the same feature scan as an extra
    // fused expression when toggled on (still ONE pass over text, still
    // no text in the output frame); zero cost when off.
    def withRepetition(df: DataFrame): DataFrame =
      if (!cfg.gopherRepetition) df
      else df
        .withColumn("__rep",
          graft.functions.Repetition.repetition(coalesce(col("text"), lit(""))))
        .withColumn("rep_dup_para_frac", col("__rep.dup_para_frac"))
        .withColumn("rep_dup_line_char_frac", col("__rep.dup_line_char_frac"))
        .withColumn("rep_dup_para_char_frac", col("__rep.dup_para_char_frac"))
        .withColumn("rep_top_2gram_char_frac", col("__rep.top_2gram_char_frac"))
        .withColumn("rep_top_3gram_char_frac", col("__rep.top_3gram_char_frac"))
        .withColumn("rep_top_4gram_char_frac", col("__rep.top_4gram_char_frac"))
        .withColumn("rep_dup_5gram_char_frac", col("__rep.dup_5gram_char_frac"))
        .withColumn("rep_dup_10gram_char_frac", col("__rep.dup_10gram_char_frac"))
        .drop("__rep")
    // C4/RefinedWeb line battery, same pattern: extra fused expression in
    // the single feature scan when toggled on, zero cost when off
    def withC4(df: DataFrame): DataFrame =
      if (!cfg.c4Rules) df
      else df
        .withColumn("__c4",
          graft.functions.C4Stats.c4Stats(coalesce(col("text"), lit(""))))
        .withColumn("c4_n_sentences", col("__c4.n_sentences"))
        .withColumn("c4_bullet_frac", col("__c4.frac_lines_start_bullet"))
        .withColumn("c4_ellipsis_frac", col("__c4.frac_lines_end_ellipsis"))
        .withColumn("c4_lorem_ipsum", col("__c4.has_lorem_ipsum"))
        .withColumn("c4_curly_brace", col("__c4.has_curly_brace"))
        .drop("__c4")
    // html is the raw payload (text extraction input) — nothing after the
    // feature stage reads it. text is ALSO dropped from the feature frame
    // (see the final .drop): every rule below reads only the computed
    // features, and a feature cache carrying the document bodies is what
    // cannot exist at corpus scale (100 TB of text does not fit a
    // cluster's storage memory; ~300 B/doc of features does). The kept
    // writer re-reads text from the source scan instead (run()).
    withC4(withRepetition(pages.drop("html")))
      .withColumn("__ds", DocStats.docStats(coalesce(col("text"), lit("")),
        cfg.minHashK, cfg.bands, cfg.rowsPerBand,
        wideSimHash = cfg.simHashNearDupBits.contains(128)))
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
      .withColumn("simhash", col("__ds.simhash"))
      // wide-fingerprint columns ride along only when the 128-bit rule is
      // on (zeros otherwise — the kernel skips the 128 votes/token)
      .withColumn("simhash_hi", col("__ds.simhash_hi"))
      .withColumn("simhash_lo", col("__ds.simhash_lo"))
      .withColumn("minhash_sig", col("__ds.minhash_sig"))
      .withColumn("band_keys", col("__ds.band_keys"))
      .drop("__ds", "text")
  }

  // ---------------------------------------------------------------------
  // Pass 1 rules
  // ---------------------------------------------------------------------
  /** Per-row heuristic rules — ONE pass over the feature projection, zero
    * shuffle. Gopher/C4 semantics ≙ reference extreme/empty rules.
    *
    * All eight rules are evaluated in a single scan as an array of
    * conditional verdict structs + explode + null filter (all codegen'd;
    * no HOFs). The previous one-branch-per-rule union was semantically
    * identical but paid EIGHT feature-frame scans per pass-1 job —
    * measured ~30 s CPU per scan at 2M docs just decoding the columnar
    * cache, ~8× the useful filter work, and the kind of fixed per-scan
    * cost that erodes scaling efficiency at high parallelism.
    */
  def heuristicVerdicts(feat: DataFrame, cfg: Config): DataFrame = {
    def entry(cond: Column, rule: String, score: Column, detail: Column) =
      when(cond, struct(lit(rule).as("rule"),
        score.cast(DoubleType).as("score"),
        detail.cast("string").as("detail")))
    val baseEntries = Seq(
      // null text computes features over "" (n_words = 0 < minWords), so
      // the empty rule needs no text reference — the frame carries none
      entry(col("n_words") < cfg.minWords,
        "empty", col("n_words"), lit("min_words")),
      entry(col("symbol_ratio") > cfg.maxSymbolRatio,
        "symbol_ratio", col("symbol_ratio"), lit("max_symbol_ratio")),
      entry(col("mean_word_len").isNotNull &&
        (col("mean_word_len") < cfg.minMeanWordLen ||
          col("mean_word_len") > cfg.maxMeanWordLen),
        "mean_word_len", col("mean_word_len"), lit("word_len_window")),
      entry(col("lang_id.lang") === "en" &&
        col("stopword_ratio").isNotNull &&
        col("stopword_ratio") < cfg.minStopwordRatio,
        "stopword_ratio", col("stopword_ratio"), lit("en_min_stopwords")),
      entry(col("perplexity") > cfg.maxPerplexity,
        "perplexity", col("perplexity"), lit("lm_junk")),
      entry(col("dup_line_ratio") > cfg.maxDupLineRatio,
        "dup_lines", col("dup_line_ratio"), lit("boilerplate_lines")),
      entry(col("lang").isNotNull && col("lang_id.score") > cfg.langIdMinMargin &&
        col("lang_id.lang") =!= col("lang"),
        "lang_mismatch", col("lang_id.score"), col("lang_id.lang")),
      entry(col("toxicity_hits") > cfg.maxToxicityHits,
        "toxicity", col("toxicity_hits"), lit("max_toxicity_hits")))
    // opt-in Gopher repetition rules (published Table A1 thresholds);
    // the rep_* columns only exist when cfg.gopherRepetition is on
    val repEntries =
      if (!cfg.gopherRepetition) Seq.empty[Column]
      else Seq(
        ("rep_dup_para_frac", cfg.maxDupParaFrac, "gopher_dup_para"),
        ("rep_dup_line_char_frac", cfg.maxDupLineCharFrac, "gopher_dup_line_chars"),
        ("rep_dup_para_char_frac", cfg.maxDupParaCharFrac, "gopher_dup_para_chars"),
        ("rep_top_2gram_char_frac", cfg.maxTop2GramCharFrac, "gopher_top_2gram"),
        ("rep_top_3gram_char_frac", cfg.maxTop3GramCharFrac, "gopher_top_3gram"),
        ("rep_top_4gram_char_frac", cfg.maxTop4GramCharFrac, "gopher_top_4gram"),
        ("rep_dup_5gram_char_frac", cfg.maxDup5GramCharFrac, "gopher_dup_5gram"),
        ("rep_dup_10gram_char_frac", cfg.maxDup10GramCharFrac, "gopher_dup_10gram"))
        .map { case (c, thr, rule) =>
          entry(col(c) > thr, rule, col(c), lit(c.stripPrefix("rep_")))
        }
    // opt-in C4/RefinedWeb page-drop rules (published thresholds); the
    // c4_* columns only exist when cfg.c4Rules is on
    val c4Entries =
      if (!cfg.c4Rules) Seq.empty[Column]
      else Seq(
        entry(col("c4_n_sentences") < cfg.minSentences,
          "c4_min_sentences", col("c4_n_sentences"), lit("min_sentences")),
        entry(col("c4_bullet_frac") > cfg.maxBulletStartFrac,
          "rw_bullet_lines", col("c4_bullet_frac"), lit("bullet_start_frac")),
        entry(col("c4_ellipsis_frac") > cfg.maxEllipsisEndFrac,
          "rw_ellipsis_lines", col("c4_ellipsis_frac"), lit("ellipsis_end_frac")),
        entry(col("c4_lorem_ipsum"), "c4_lorem_ipsum",
          col("c4_lorem_ipsum").cast("int"), lit("placeholder_text")),
        entry(col("c4_curly_brace"), "c4_curly_brace",
          col("c4_curly_brace").cast("int"), lit("code_brace")))
    val entries = array(baseEntries ++ repEntries ++ c4Entries: _*)
    feat.select(col("url"), explode(entries).as("__e"))
      .filter(col("__e").isNotNull)
      .select(col("url"), col("__e.rule").as("rule"),
        lit(false).as("keep"), col("__e.score").as("score"),
        col("__e.detail").as("detail"))
  }

  /** Exact dedup on the 60-bit content fingerprint: shuffle carries
    * (url, fingerprint) only. keep='first' ⇒ min url (SURVEY §2.3).
    */
  def exactDupVerdicts(feat: DataFrame,
                       cfg: Config = defaultConfig): DataFrame =
    Rules.exactDup(
      feat.filter(col("n_chars") > 0), // null/empty text ⇒ n_chars = 0
      col("url"), col("fingerprint"), cfg.saltBuckets)

  /** Near-dup via MinHash + LSH banding: docs sharing any band bucket are
    * candidates; candidates are verified by signature-estimated Jaccard;
    * in each near-dup pair the larger url is dropped. The band groupBy is
    * hash-distributed by construction (band keys are uniform hashes), so
    * host-level skew cannot concentrate this shuffle.
    */
  def nearDupVerdicts(feat: DataFrame, cfg: Config): DataFrame =
    nearDupResolve(nearDupCandidates(feat, cfg), cfg)

  /** Candidate-discovery half of [[nearDupVerdicts]]: explodes band keys,
    * hub-pairs each bucket and materialises the pair set as a checkpoint
    * leaf. Split out so [[run]] can use this job — a single linear stage
    * chain whose map stage is the pipeline's FIRST scan of `feat` — as
    * the feature-cache builder (no separate count() barrier), and overlap
    * the heuristic/exact-dup checkpoint with [[nearDupResolve]]'s
    * collect/verify actions.
    */
  final case class NearDupCandidates(eligible: DataFrame, sigs: DataFrame,
                                     pairs: DataFrame)

  def nearDupCandidates(feat: DataFrame, cfg: Config): NearDupCandidates = {
    // ALL LSH machinery runs in 8-byte uid space (xxhash64 of url): the
    // exploded band rows and every join key would otherwise carry the
    // ~60-byte url string — 3.5× the shuffle bytes for zero information
    // (the url is only needed to EMIT verdicts, and is joined back once
    // at the end over the tiny clustered set). Collision risk n²/2⁶⁵ is
    // ~1e-7 at a 10⁹-doc day partition; a collision merges two docs'
    // candidacy and is caught by the signature verify.
    val eligible = feat
      .filter(col("n_words") >= lit(5)) // null text ⇒ n_words = 0
      .select(col("url"), xxhash64(col("url")).as("uid"),
        col("minhash_sig"), col("band_keys"))
    val sigs = eligible.select(col("uid"), col("minhash_sig"))
    // candidate discovery shuffles ONLY (uid, bucket) — never the
    // signature (the exploded bands would otherwise carry `bands` copies
    // of every signature through the shuffle). Band keys come PRECOMPUTED
    // from the fused DocStats pass: the composed slice+aggregate version
    // (Hashing.bandKeys, kept as the semantic reference) interprets its
    // HOF lambdas per element and measured ~190 s CPU at 300k docs.
    // The (band, key) pair is folded BIJECTIVELY into one long
    // (key < P = 2³¹ ⇒ key*bands+band < 2³⁴+): this shuffle is the
    // pipeline's biggest (docs × bands rows), and one 8-byte column in
    // place of two cuts its row width by a third with identical bucket
    // semantics.
    val nb = math.max(1, cfg.bands)
    val bands = eligible
      .select(col("uid"), posexplode(col("band_keys")).as(Seq("band", "key")))
      .select(col("uid"), (col("key") * lit(nb.toLong) + col("band")).as("bucket"))
    // HUB pairING, not all-pairs: each bucket member pairs with the
    // bucket's min uid only. An all-pairs self-join is O(|bucket|²) and a
    // single template-heavy bucket (boilerplate, shared page furniture)
    // detonates it at web scale; the hub star gives O(|bucket|) pairs —
    // the verified pairs then cluster transitively, and the SURVIVOR is
    // chosen by min URL over the whole cluster at the end, so the hub
    // choice only affects candidate discovery, never semantics.
    val hubs = bands.groupBy(col("bucket"))
      .agg(min(col("uid")).as("hub"), count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1) // singleton buckets can't pair
      .drop("__cnt")
    // LINEAGE TRUNCATION (EAGER localCheckpoint): everything downstream
    // (verify, components, v1 → survivors → v2 → kept) re-references this
    // subtree many times; with the full LSH lineage attached, the logical
    // plan nests multiplicatively and the analyzer/AQE-explain machinery
    // OOMs building plan strings. The eager checkpoint runs the expensive
    // LSH candidate pipeline EXACTLY ONCE as one fully-parallel action and
    // leaves a tiny block-backed leaf. (A LAZY checkpoint here let
    // concurrent downstream stages race-recompute the whole LSH lineage:
    // measured 4× wall.) Same pattern as GraphX/GraphFrames iterative
    // jobs; on a cluster, a lost executor costs a stage retry.
    val pairs0 = bands.join(hubs, Seq("bucket"))
      .filter(col("uid") =!= col("hub"))
      .select(col("hub").as("uid1"), col("uid").as("uid2"))
      .dropDuplicates("uid1", "uid2")
    val pairs = ph("neardup pairs checkpoint")(pairs0.localCheckpoint(true))
    NearDupCandidates(eligible, sigs, pairs)
  }

  /** Verify + cluster + survivor-select over a materialised candidate
    * pair leaf (the second half of [[nearDupVerdicts]]).
    */
  def nearDupResolve(cand: NearDupCandidates, cfg: Config): DataFrame = {
    import cand.{eligible, sigs, pairs}
    // scale-adaptive verify + clustering (same spirit as AQE's broadcast
    // decision — the candidate set is materialised so its size is KNOWN):
    //  - below the threshold, signature verify, transitive components and
    //    min-url survivor selection all run on the DRIVER from ONE scan
    //    that fetches the candidates' (url, sig) rows — the distributed
    //    formulation pays ~5 sequential jobs and 3 broadcast builds of
    //    pure coordination for a pair set that fits in a few MB;
    //  - above it — genuinely web-scale duplication — the distributed
    //    chain (broadcast verify joins, min-label cascade) is the only
    //    shape that fits.
    // ONE action decides AND fetches: pulling maxDriverEdges+1 rows from
    // the leaf either yields the complete pair set (driver path) or
    // proves overflow (distributed path) — a separate count() was a
    // driver round-trip spent learning what the fetch shows anyway
    val fetchCap = (cfg.maxDriverEdges + 1).min(Int.MaxValue.toLong).toInt
    val fetched = ph("neardup pair fetch")(pairs.limit(fetchCap).collect())
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-heap gate is on MEMBER count, not just edge count: the fetch
    // below pulls (url, signature) per distinct member, so a sparse pair
    // set touching many docs (e.g. 200k disjoint pairs = 400k members)
    // is what actually sizes the driver working set
    val memberCount: Long =
      if (fetched.length > cfg.maxDriverEdges) Long.MaxValue
      else fetched.iterator.flatMap(p => Iterator(p._1, p._2)).toSet.size.toLong
    if (fetched.length <= cfg.maxDriverEdges && memberCount <= cfg.maxDriverMembers)
      nearDupDriverVerify(eligible, fetched, cfg)
    else nearDupDistributedVerify(eligible, sigs, pairs, cfg)
  }

  /** Driver path: one cluster scan collects the candidate docs'
    * (uid, url, sig); jaccard verify + union-find + min-url survivors run
    * locally; verdicts return as a LOCAL relation (already a plan leaf).
    * Verify semantics are IDENTICAL to the Column formula:
    * (#equal signature positions)/k ≥ minJaccard.
    */
  private def nearDupDriverVerify(eligible: DataFrame,
                                  pairRows: Array[(Long, Long)],
                                  cfg: Config): DataFrame = {
    val spark = eligible.sparkSession
    import spark.implicits._
    val uids = pairRows.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    val uidDf = spark.createDataset(uids.toSeq).toDF("uid")
    // signatures land as primitive Array[Long] (null hash positions → -1
    // sentinel, impossible for a real hash in [0, P)): the boxed
    // Seq[java.lang.Long] form retained ~3× the heap per member, which is
    // what bounds this path's driver footprint at the crossover
    val NullSig = -1L
    val members = ph("neardup member fetch")(
      eligible.select(col("uid"), col("url"), col("minhash_sig"))
        .join(broadcast(uidDf), Seq("uid"))
        .collect())
      .map { r =>
        val boxed = r.getSeq[java.lang.Long](2)
        val sig = new Array[Long](cfg.minHashK)
        var i = 0
        while (i < cfg.minHashK) {
          val v = boxed(i)
          sig(i) = if (v == null) NullSig else v.longValue()
          i += 1
        }
        r.getLong(0) -> (r.getString(1), sig)
      }
      .toMap
    def estJaccard(a: Array[Long], b: Array[Long]): Double = {
      var eq = 0
      var i = 0
      while (i < cfg.minHashK) {
        // mirror the Column formula: null positions never count as equal
        if (a(i) != NullSig && a(i) == b(i)) eq += 1
        i += 1
      }
      eq.toDouble / cfg.minHashK
    }
    val verifiedEdges = pairRows.filter { case (u1, u2) =>
      (members.get(u1), members.get(u2)) match {
        case (Some((_, s1)), Some((_, s2))) => estJaccard(s1, s2) >= cfg.minJaccard
        case _ => false
      }
    }
    val find = unionFindLocal(verifiedEdges)
    val clustered = verifiedEdges.iterator
      .flatMap(p => Iterator(p._1, p._2)).toSet.toSeq
    val byLabel = clustered.groupBy(find)
    val verdicts = byLabel.values.toSeq.flatMap { comp =>
      val urls = comp.map(u => members(u)._1)
      val keep = urls.min
      urls.filter(_ != keep).map(u => (u, "near_dup", false, 1.0, keep))
    }
    spark.createDataset(verdicts)
      .toDF("url", "rule", "keep", "score", "detail")
  }

  /** Distributed path (web-scale pair counts): broadcast verify joins,
    * min-label cascade, min-url survivor resolution.
    */
  private def nearDupDistributedVerify(eligible: DataFrame, sigs: DataFrame,
                                       pairs: DataFrame, cfg: Config): DataFrame = {
    // verify candidates: join signatures back. NO broadcast hint — this
    // branch is selected precisely BECAUSE the pair set overflowed the
    // driver bound, so force-broadcasting it (and worse, p1 = pairs ×
    // 32-long signatures, ~300 B/row) would blow the driver build and
    // Spark's 8 GB broadcast cap exactly at web-scale pair counts. With
    // AQE on, a pair set that happens to be small still gets converted to
    // a broadcast join adaptively from its MEASURED size; a genuinely
    // huge one shuffle-joins on uid, which partitions correctly. (For a
    // pathological pair explosion the LSH band width, not this join, is
    // the knob that needs retuning.)
    val p1 = sigs.select(col("uid").as("uid1"), col("minhash_sig").as("sig1"))
      .join(pairs, Seq("uid1"))
    val withSigs = sigs.select(col("uid").as("uid2"), col("minhash_sig").as("sig2"))
      .join(p1, Seq("uid2"))
    val jac = withSigs.withColumn("jaccard",
      aggregate(zip_with(col("sig1"), col("sig2"),
        (a, b) => when(a === b, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast(DoubleType) / lit(cfg.minHashK))
      .filter(col("jaccard") >= cfg.minJaccard)
    // transitive closure over the verified pairs: the reference's MCL
    // yields TRANSITIVE clusters (/root/reference/src/markov_clustering.py:58-73)
    // — a chain A~B~C where A and C share no bucket must still keep only
    // one survivor. The finished cascade is checkpointed into a leaf:
    // union flattening (Dataset.unionByName applies CombineUnions
    // eagerly) splices pass-1 branches directly into every downstream
    // plan, so a cache() on the union above this branch can never match —
    // without the leaf, each downstream action re-runs the whole cascade
    // (measured as a ~20-stage recompute storm per write job).
    val verified = jac.select(col("uid1"), col("uid2"))
      .localCheckpoint(true)
    val labels = connectedMin(verified).localCheckpoint(true)
    // back to url space: join the clustered member set against the pruned
    // (uid, url) feature scan. Usually the member set is tiny and AQE
    // converts this to a broadcast join from its measured size; no FORCED
    // hint, because on this web-scale branch a heavily-duplicated corpus
    // can make the verified member set a corpus-scale fraction, and a
    // forced broadcast would then fail outright where a uid-partitioned
    // shuffle join degrades gracefully. The cluster SURVIVOR is the min
    // URL over the whole component (SURVEY §2.3 tie-break), computed here
    // — so hub/uid choices above never leak into semantics.
    val members = eligible.select(col("uid"), col("url"))
      .join(labels, Seq("uid"))
    val survivors = members.groupBy(col("label"))
      .agg(min(col("url")).as("keep_url"))
    members.join(survivors, Seq("label"))
      .filter(col("url") =!= col("keep_url"))
      .select(col("url"), lit("near_dup").as("rule"),
        lit(false).as("keep"), lit(1.0).cast(DoubleType).as("score"),
        col("keep_url").cast("string").as("detail"))
      // leaf-ify to match the driver path's local-relation shape: run()
      // references the near-dup verdicts several times (survivor
      // anti-join, verdict union, kept anti-join, metrics), and without
      // a leaf each reference re-runs the url join-back's feat scan
      .coalesce(eligible.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint(true)
  }

  /** Number of min-label propagation rounds = the maximum near-dup
    * cluster DIAMETER resolved exactly. Real near-dup clusters are
    * star/clique shaped (diameter ≤ 4); a pathological longer chain
    * merely keeps one extra survivor — the same truncation contract as
    * the reference MCL's iteration_limit
    * (`/root/reference/src/markov_clustering.py:39`).
    */
  val LabelRounds = 5

  /** Connected components by min-label propagation, built as a fully LAZY
    * plan of fixed depth: (url, label = min url of its component). A
    * counted convergence loop would run one driver action per iteration —
    * measured as serial wall on the run's critical path — so instead
    * [[LabelRounds]] rounds resolve every component of diameter ≤
    * LabelRounds with ZERO driver actions.
    *
    * Plan-size discipline: SELF-LOOPS are added to the edge set so each
    * round is `min over neighbors∪self` = ONE join + ONE aggregate with a
    * SINGLE reference to the previous round — the plan tree grows
    * linearly in rounds. (The textbook `least(own, min(neighbors))` form
    * references the previous labels twice per round: the logical tree
    * doubles every round and the analyzer/treeString blow up
    * exponentially once the pipeline nests it.)
    *
    * The edge set (verified near-dup pairs) is orders of magnitude
    * smaller than the corpus and the caller hands it in as a checkpointed
    * leaf, so NOTHING here is cached: recomputing the tiny cascade is
    * cheaper than a cache that cold-concurrent stages would race.
    */
  private[graft] def connectedMin(pairs: DataFrame): DataFrame = {
    val half = pairs.select(col("uid1").as("a"), col("uid2").as("b"))
    val edges =
      half
        .unionByName(half.select(col("b").as("a"), col("a").as("b")))
        .unionByName(half.select(col("a"), col("a").as("b")))   // self loops:
        .unionByName(half.select(col("b").as("a"), col("b")))   // min includes own label
        .distinct()
    var labels = edges.groupBy(col("a").as("uid")).agg(min(col("b")).as("label"))
    for (_ <- 1 to LabelRounds) {
      labels = edges
        .join(labels.withColumnRenamed("uid", "b").withColumnRenamed("label", "nl"),
          Seq("b"))
        .groupBy(col("a").as("uid")).agg(min(col("nl")).as("label"))
    }
    labels
  }

  /** Driver-side union-find over a SMALL verified edge set (counted ≤
    * cfg.maxDriverEdges). Path-halving union-find is O(α·E); the result
    * labels table is parallelized back out. Exactly equivalent to
    * [[connectedMin]] on any diameter (no LabelRounds truncation).
    */
  /** Path-halving union-find over local edges; the returned function maps
    * a node to its component's min node.
    */
  private def unionFindLocal(edges: Array[(Long, Long)]): Long => Long = {
    val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) {
        val p = parent.get(r)
        val gp = parent.getOrDefault(p, p)
        parent.put(r, gp) // path halving
        r = gp
      }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    find
  }

  private[graft] def connectedMinDriver(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val find = unionFindLocal(edges)
    val nodes = edges.iterator.flatMap { case (a, b) => Iterator(a, b) }.toSet
    // the label is only a component id — the survivor is picked by min
    // URL downstream, so root choice carries no semantics
    val labels = nodes.iterator.map(n => (n, find(n))).toSeq
    spark.createDataset(labels).toDF("uid", "label")
  }

  /** Opt-in SimHash near-dup second opinion (cfg.simHashNearDupBits):
    * a SECOND, cheaper dedup signal next to the MinHash path — SimHash
    * catches multiset-preserving rewrites (token reorderings keep the
    * frequency-weighted fingerprint identical while destroying every
    * MinHash shingle) and costs one narrow long (or two) per doc vs k=32
    * signature longs. 60-bit pigeonhole banding through ~10⁸ docs;
    * 128-bit Manku block-pair banding for the 10⁹⁺ regime where 15-bit
    * chunks saturate (Rules.scala scaladoc has the arithmetic; BENCH.md
    * the measured occupancy histogram). None (default) adds zero work —
    * the kernel skips the wide votes and no rule job runs.
    */
  def simHashVerdicts(feat: DataFrame, cfg: Config): Option[DataFrame] =
    cfg.simHashNearDupBits.map {
      case 60 => Rules.simHashNearDup(feat, col("url"), col("simhash"),
        maxHamming = 3, bits = 60)
      case 128 => Rules.simHashNearDupWide(feat, col("url"),
        col("simhash_hi"), col("simhash_lo"), maxHamming = 6)
    }

  def pass1(feat: DataFrame, cfg: Config = defaultConfig): DataFrame =
    simHashVerdicts(feat, cfg).foldLeft(
      heuristicVerdicts(feat, cfg)
        .unionByName(exactDupVerdicts(feat, cfg))
        .unionByName(nearDupVerdicts(feat, cfg)))(_ unionByName _)

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
    // materialize as a CHECKPOINT LEAF, not a cache: a long-running caller
    // looping over partitions via pass2 would otherwise accumulate one
    // never-released cache per call; a localCheckpoint block is freed by
    // the ContextCleaner when the DataFrame is GC'd
    val par = survivors.sparkSession.sparkContext.defaultParallelism
    val out = v2.coalesce(par).localCheckpoint(true)
    statCols.unpersist()
    out
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
    // CACHE BUILD IS FOLDED INTO THE FIRST REAL JOB: the near-dup
    // candidate checkpoint's map stage is a single linear stage chain
    // (the bands exchange is reused by both the hub aggregate and the
    // pair join), so it scans feat exactly once, cold, populating the
    // cache as a side effect — no concurrent-branch cold-cache race is
    // possible, and the previous standalone count() barrier (one full
    // warm scan + an action round-trip of pure coordination on the
    // serial critical path) is gone. All LATER feat consumers still run
    // strictly after this job, so they read a warm cache.
    val cand = ph("neardup candidates")(nearDupCandidates(feat, cfg))
    // VERDICT SETS ARE LEAVES, NOT CACHES. unionByName flattens unions
    // eagerly, so a downstream plan never contains the v1/v2 union node
    // and a cache() on either can never be matched (measured: every
    // write job re-ran all 10 pass-1 branches AND 5 pass-2 branches —
    // ~10 redundant 300-task scans of the feature cache per run). The
    // verdict sets are tiny (url + rule rows), so an eager localCheckpoint
    // materialises each ONCE — over the warm feat cache, branches running
    // fully parallel inside one job — and every downstream consumer
    // (survivor anti-joins, writes, metrics) reads a block-backed leaf.
    // coalesce before checkpointing: the verdict union is 10+ branches ×
    // shuffle.partitions tasks of a few rows each — one leaf partition
    // per core is plenty and cuts the checkpoint job's task count 10×
    val par = pages.sparkSession.sparkContext.defaultParallelism
    // OVERLAP: the heuristic+exact-dup checkpoint (cluster-parallel scans
    // of the now-warm cache) runs concurrently with the near-dup
    // collect/verify chain (mostly driver-side latency: a bounded fetch,
    // a member fetch, local union-find) — the two own disjoint resources,
    // so this removes the near-dup driver round-trips from the serial
    // critical path instead of queueing them behind the v1 job.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // CCNet boilerplate reads TEXT (the feature frame carries none), so
    // it scans the source pages — one extra narrow scan, only when on.
    // ALL text-reading opt-in rules go through withSourceText: under
    // cfg.extractHtml the text column is DERIVED from the html payload,
    // and a rule reading the raw column would judge a different (null or
    // stale) corpus view than features() and the kept writer do
    val srcPages = withSourceText(pages, cfg)
    val boilerV: Option[DataFrame] =
      if (!cfg.ccnetBoilerplate) None
      else Some(Rules.boilerplateParagraphs(srcPages, col("url"), col("text"),
        cfg.boilerplateMinDocs, cfg.maxBoilerplateFrac))
    // decontamination likewise reads TEXT from the source pages; the
    // eval side is a tiny broadcast built from the configured passages
    val decontamV: Option[DataFrame] =
      if (cfg.decontamPassages.isEmpty) None
      else {
        val s = pages.sparkSession
        import s.implicits._
        val ev = graft.functions.Decontam.evalGrams(
          cfg.decontamPassages.toDF("p"), col("p"), cfg.decontamN)
        Some(Rules.contaminationRule(srcPages, col("url"), col("text"),
          ev, cfg.decontamN, cfg.decontamMinHits))
      }
    // exact-substring dup likewise reads TEXT from the source pages —
    // one narrow scan projecting to 8-byte gram hashes, only when on.
    // BUILT LAZILY: substrDupStats eagerly materializes + counts the
    // shared-gram set to pick its join strategy; constructed here it
    // would run that stage serially on the driver BEFORE v1a's future
    // starts — deferring construction into the future overlaps it with
    // the near-dup resolve instead
    val substrV: () => Option[DataFrame] = () =>
      if (cfg.exactSubstrTokens <= 0) None
      else Some(Rules.exactSubstrDup(srcPages, col("url"), col("text"),
        cfg.exactSubstrTokens, maxFrac = cfg.maxSubstrDupFrac))
    // model-based quality score likewise reads TEXT — one codegen'd
    // narrow map on the source scan, only when on
    val modelV: Option[DataFrame] =
      cfg.modelQualityMin.map(theta =>
        Rules.modelQualityRule(srcPages, col("url"), col("text"), theta))
    // URL rules read only the key column; host cap adds one bounded-heap
    // groupBy on host — both off by default
    val urlV: Seq[DataFrame] =
      (if (!cfg.urlRules) Nil
       else Seq(Rules.urlBattery(pages, col("url"), col("url"),
         cfg.urlBlockedHosts, cfg.urlAdultKeywords, cfg.maxUrlLen))) ++
      (if (cfg.hostDocCap <= 0) Nil
       else Seq(Rules.hostCap(pages, col("url"), col("url"), cfg.hostDocCap)))
    val v1aF = Future(ph("v1a checkpoint")(
      (simHashVerdicts(feat, cfg).toSeq ++ boilerV.toSeq ++ decontamV.toSeq ++ substrV().toSeq ++ modelV.toSeq ++ urlV).foldLeft(
          heuristicVerdicts(feat, cfg).unionByName(exactDupVerdicts(feat, cfg)))(
          _ unionByName _)
        .coalesce(par).localCheckpoint(true)))
    val nd = ph("neardup resolve")(nearDupResolve(cand, cfg))
    // both sides are materialised leaves (v1a a checkpoint block, nd a
    // local relation or checkpointed join-back), so the union needs no
    // further checkpoint
    val v1 = Await.result(v1aF, Duration.Inf).unionByName(nd)
    val dropped1 = v1.select("url").distinct()
    val survivors = feat.join(dropped1, Seq("url"), "left_anti")
    val (v2raw, statCols) = ph("pass2 stats agg")(pass2Impl(survivors, cfg))
    bag.track(statCols)
    val v2 = ph("v2 checkpoint")(v2raw.coalesce(par).localCheckpoint(true))
    val verdicts = v1.unionByName(v2)
    val scrub: Column => Column =
      if (fusedScrub) Scrub.scrubFused else Scrub.scrubCol
    // kept output: RE-SCAN the source pages (anti-join the tiny dropped
    // url set — both verdict sides are checkpoint leaves, AQE broadcasts
    // them) and recompute the three output features with the LITE kernel
    // (minHashK=0: no shingle/minhash work). The feature cache carries no
    // text, so this second source scan is what pays for a cache the
    // cluster can actually hold: at corpus scale caching the bodies is
    // impossible, re-reading the columnar source is the designed-for
    // path, and the lite recompute (~µs/doc) is pure partition-local CPU
    // — strictly cheaper than shuffling the kept bodies through a join
    // against the feature frame.
    val droppedAll = v1.select("url").unionByName(v2.select("url")).distinct()
    val kept = withSourceText(pages, cfg).drop("html")
      .join(droppedAll, Seq("url"), "left_anti")
      .withColumn("__ds", DocStats.docStats(coalesce(col("text"), lit("")), 0))
      .select(col("url"), col("warc_ts"), col("lang"),
        col("__ds.lang").as("lang_detected"),
        col("__ds.perplexity").as("perplexity"),
        col("__ds.n_words").as("n_words"),
        scrub(col("text")).as("scrubbed_text"))
    val metrics = verdicts.rollup(col("rule")).count()
      .withColumn("rule", coalesce(col("rule"), lit("__total__")))
    Result(verdicts, kept, metrics, bag)
  }
}
