package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType
import graft.model.ColumnProfile

/** Generic rule kernels. Each takes a keyed DataFrame and returns a
  * verdict-shaped DataFrame `(key, rule, keep=false, score, detail)` —
  * the Spark analogue of the reference's `add_to_bad_idx` rows
  * (`/root/reference/src/improve_data_quality.py:674-719`).
  *
  * Scale notes per kernel are inline; the common theme: per-row rules are
  * narrow (no shuffle); group rules shuffle ONLY on the group key (never
  * on the full row); anything joined back to rows uses left-semi joins on
  * the key so the payload (html/text) never crosses the wire twice.
  */
object Rules {

  private def verdict(df: DataFrame, key: Column, rule: String,
                      score: Column, detail: Column): DataFrame =
    df.select(
      key.as("url"),
      lit(rule).as("rule"),
      lit(false).as("keep"),
      score.cast(DoubleType).as("score"),
      detail.cast("string").as("detail"))

  /** O4 `push_bad_index` (`/root/reference/src/improve_data_quality.py:
    * 162-172`, deprecated there — kept for surface completeness): append
    * an externally supplied bad-url list to the verdict set. The
    * reference appends raw indexes to a Python list (duplicates and
    * all); the verdict-frame analogue is a union of DROP verdicts under
    * an `external` rule — downstream consumers (`add_to_bad_idx` ≙
    * verdict union + distinct on url) already dedupe, exactly as the
    * reference's `bad_index` property does via `set()`.
    */
  def pushBadIndex(verdicts: DataFrame, badUrls: DataFrame,
                   rule: String = "external"): DataFrame =
    verdicts.unionByName(
      verdict(badUrls, col(badUrls.columns.head), rule,
        lit(1.0), lit("pushed")))

  /** Exact duplicate detection, reference semantics
    * (`improve_data_quality.py:286-298`): all-but-first occurrence of
    * identical content is flagged, "first" = smallest key (pandas file
    * order has no distributed analogue; SURVEY §2.3 fixes the tie-break
    * to key asc). Implemented over a CONTENT HASH, not the content
    * itself — at 100 TB the shuffle must carry (key, 8-byte hash), never
    * the document body.
    *
    * Skew (north rule: "salted-key repartitioning to defuse host-level
    * skew"): the AGGREGATION is already skew-proof — map-side partial
    * aggregation means the shuffle carries (hash, min, count) per
    * distinct hash per input partition, however duplicated a document
    * is. The JOIN-BACK is the skew point: a mega-duplicated document
    * (a boilerplate page mirrored 10⁷×) puts every one of its rows in
    * ONE join partition. With `saltBuckets` > 1 the (small) duplicate-
    * groups side is replicated per salt value and each fact row joins on
    * (hash, salt-of-its-key), spreading a hot hash over `saltBuckets`
    * partitions. Output is identical for any saltBuckets (RulesSpec
    * property-checks salted == unsalted).
    */
  def exactDup(df: DataFrame, key: Column, contentHash: Column,
               saltBuckets: Int = 1): DataFrame = {
    val hashed = df.select(key.as("url"), contentHash.as("__h"))
    // groupBy + join-back instead of a window: the aggregation combines
    // map-side and avoids the window's full sort
    val groups = hashed.groupBy(col("__h"))
      .agg(min(col("url")).as("__first"), count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1)
    val flagged =
      if (saltBuckets <= 1) hashed.join(groups, Seq("__h"))
      else {
        val salted = hashed.withColumn("__salt",
          pmod(xxhash64(col("url")), lit(saltBuckets.toLong)))
        val saltedGroups = groups.withColumn("__salt",
          explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
        salted.join(saltedGroups, Seq("__h", "__salt"))
      }
    verdict(flagged.filter(col("url") =!= col("__first")),
      col("url"), "duplication", lit(1.0), col("__first"))
  }

  /** SimHash Hamming near-dup rule — the cheap second opinion next to the
    * MinHash/LSH path (SURVEY §2.4): two documents whose 60-bit token
    * simhashes differ in ≤ `maxHamming` bits are near-duplicates; the
    * larger url of each verified pair is flagged (keep-first = min url,
    * same tie-break as every dedup rule).
    *
    * Candidate discovery is PIGEONHOLE banding: the 60-bit simhash splits
    * into `maxHamming+1` chunks (15 bits each at the defaults), and any
    * pair within Hamming ≤ maxHamming must agree EXACTLY on at least one
    * chunk — so chunk-equality buckets provably contain every qualifying
    * pair (no recall loss, unlike probabilistic LSH). Scale shape mirrors
    * the MinHash path: explode to (bucket, url, sig) with one long bucket
    * id — hub pairing bounds each bucket at O(|bucket|) pairs, and
    * verification is a codegen'd bit_count(xor) filter. One groupBy shuffle of
    * docs × (maxHamming+1) narrow rows; no all-pairs anything.
    */
  def simHashNearDup(df: DataFrame, key: Column, simhash: Column,
                     maxHamming: Int = 3, bits: Int = 60,
                     maxBucket: Int = 256): DataFrame = {
    require(bits % (maxHamming + 1) == 0,
      s"bits ($bits) must split evenly into ${maxHamming + 1} chunks")
    val chunks = maxHamming + 1
    val w = bits / chunks
    val mask = (1L << w) - 1L
    val t = df.select(key.as("__url"), simhash.as("__sh"))
    val ex = t.select(col("__url"), col("__sh"),
      explode(array((0 until chunks).map { c =>
        shiftrightunsigned(col("__sh"), c * w).bitwiseAND(lit(mask)) *
          lit(chunks.toLong) + lit(c.toLong)
      }: _*)).as("bucket"))
    // a 15-bit chunk is a far weaker discriminator than a MinHash band
    // key (natural-language bit bias concentrates chunk values), so
    // buckets legitimately hold many UNRELATED docs and hub-only pairing
    // would drop a true pair whenever a chance collider owns the hub.
    // Two regimes, split by measured bucket size (see [[nearDupCore]]).
    // Production note: at 10⁹+ docs, 15-bit chunks saturate — switch to
    // the 128-bit fingerprint and [[simHashNearDupWide]] rather than
    // raising maxBucket.
    nearDupCore(ex, graft.functions.Hashing.hammingDist,
      maxHamming, maxBucket, "near_dup_simhash")
  }

  /** Wide (128-bit) SimHash near-dup rule — the production regime for
    * 10⁹⁺-doc corpora, where the 60-bit rule's 15-bit pigeonhole chunks
    * (32k values) saturate into all-hub buckets. Candidate discovery is
    * the block-permuted banding of Manku, Jain & Das Sarma, "Detecting
    * Near-Duplicates for Web Crawling" (WWW '07): the fingerprint
    * ([[graft.functions.DocStats]]'s `simhash_hi`/`simhash_lo`, opt-in
    * `wideSimHash` kernel output) splits into 8 16-bit blocks, and every
    * C(8,2) = 28 block PAIR concatenates into a 32-bit candidate key.
    * If two fingerprints differ in ≤ 6 bits, those bits touch ≤ 6
    * blocks, so ≥ 2 blocks match exactly and some pair key collides —
    * EXACT recall for Hamming ≤ 6 (= the 60-bit rule's 3-of-60
    * dissimilarity level at 128 bits: a near-dup edit flips a bit-count
    * proportional to fingerprint width), with 4×10⁹ distinct key values
    * per combination so buckets stay person-sized at any corpus scale.
    * Cost: 28 narrow (url, 16B sig, 8B key) rows per doc through ONE
    * groupBy shuffle — the Manku tradeoff (more tables, smaller buckets).
    */
  def simHashNearDupWide(df: DataFrame, key: Column, hi: Column, lo: Column,
                         maxHamming: Int = 6, maxBucket: Int = 256): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"block-pair banding over 8 blocks is exact only for Hamming <= 6 (got $maxHamming)")
    val t = df.select(key.as("__url"),
      struct(hi.as("hi"), lo.as("lo")).as("__sh"))
    def blockOf(b: Int): Column = {
      val src = if (b < 4) col("__sh.lo") else col("__sh.hi")
      shiftrightunsigned(src, (b % 4) * 16).bitwiseAND(lit(0xFFFFL))
    }
    val combos = for { a <- 0 until 8; b <- a + 1 until 8 } yield (a, b)
    val keyCols = combos.zipWithIndex.map { case ((a, b), ci) =>
      lit(ci.toLong << 32) + shiftleft(blockOf(a), 16) + blockOf(b)
    }
    val ex = t.select(col("__url"), col("__sh"),
      explode(array(keyCols: _*)).as("bucket"))
    val dist = (a: Column, b: Column) =>
      graft.functions.Hashing.hammingDist(a.getField("hi"), b.getField("hi")) +
        graft.functions.Hashing.hammingDist(a.getField("lo"), b.getField("lo"))
    nearDupCore(ex, dist, maxHamming, maxBucket, "near_dup_simhash_wide")
  }

  /** Shared bucket machinery of the SimHash rules. `ex` is the exploded
    * (bucket, __url, __sh) candidate universe; `dist` compares two `__sh`
    * values (plain long or (hi, lo) struct). Two regimes, split by
    * MEASURED bucket size:
    *  - |bucket| ≤ maxBucket: ALL-PAIRS within the bucket — bounded at
    *    maxBucket²/2 pairs, exact recall (the banding scheme guarantees
    *    every qualifying pair shares a bucket);
    *  - |bucket| > maxBucket: hub pairing only — the df-cap pattern
    *    (same contract as the MinHash path's hub star and the n-gram
    *    df cap): a bucket that hot is a degenerate discriminator, and
    *    O(|bucket|²) on it is exactly the detonation this engine never
    *    allows.
    */
  private def nearDupCore(ex: DataFrame, dist: (Column, Column) => Column,
                          maxHamming: Int, maxBucket: Int,
                          rule: String): DataFrame = {
    val sizes = ex.groupBy(col("bucket")).agg(count(lit(1)).as("__n"))
    // Materialised once (eager localCheckpoint): exS feeds BOTH sides of
    // the small-bucket self-join, the big branch and the hub aggregate —
    // left lazy each reference re-runs the explode and the bucket-size
    // join (AQE reuses the exchanges but not the join itself). The frame
    // is narrow — (8B bucket, key, sig, 8B count) per exploded row that
    // SURVIVED the __n > 1 filter, i.e. only rows in candidate buckets —
    // and the banding scheme's whole point is that candidate buckets are
    // a small fraction of the corpus, so the leaf is far smaller than
    // the input at any scale (worst case = the input's dup density).
    val exS = ex.join(sizes, Seq("bucket")).filter(col("__n") > 1)
      .localCheckpoint(true)
    val small = exS.filter(col("__n") <= maxBucket)
    val pairsSmall = small.as("a").join(small.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.__url") < col("b.__url"))
      .select(col("a.__url").as("__u1"), col("a.__sh").as("__s1"),
        col("b.__url").as("__u2"), col("b.__sh").as("__s2"))
    val big = exS.filter(col("__n") > maxBucket)
    val hubs = big.groupBy(col("bucket"))
      .agg(min(struct(col("__url"), col("__sh"))).as("__h"))
      .select(col("bucket"), col("__h.__url").as("__hub_url"),
        col("__h.__sh").as("__hub_sh"))
    val pairsBig = big.join(hubs, Seq("bucket"))
      .filter(col("__url") =!= col("__hub_url"))
      .select(least(col("__url"), col("__hub_url")).as("__u1"),
        when(col("__url") < col("__hub_url"), col("__sh"))
          .otherwise(col("__hub_sh")).as("__s1"),
        greatest(col("__url"), col("__hub_url")).as("__u2"),
        when(col("__url") < col("__hub_url"), col("__hub_sh"))
          .otherwise(col("__sh")).as("__s2"))
    val verified = pairsSmall.unionByName(pairsBig)
      .filter(dist(col("__s1"), col("__s2")) <= maxHamming)
    val flagged = verified.select(
      col("__u2").as("__drop"), col("__u1").as("__keep"),
      dist(col("__s1"), col("__s2")).as("__dist"))
      .groupBy(col("__drop"))
      .agg(min(col("__keep")).as("__keep"), min(col("__dist")).as("__dist"))
    verdict(flagged, col("__drop"), rule, col("__dist"), col("__keep"))
  }

  /** Z-score extremes (`utils.py:190-232`). The reference's quirk is kept:
    * the predicate is `NOT (x > lo AND x < hi)` so boundary-EQUAL values
    * are flagged. Gate: only runs when uniqueness ∈ (0.0001, 0.99)
    * (utils.py:221). Stats are ORDER-INDEPENDENT exact moments
    * ([[graft.profile.Stats]]) so the flag set is identical at any
    * partitioning; the rule itself is a narrow filter: no shuffle.
    */
  def zScoreExtreme(df: DataFrame, key: Column, x: Column, name: String,
                    uniqueness: Double, m: graft.profile.Stats.Moments,
                    k: Double = 6.0): Option[DataFrame] = {
    if (!(uniqueness > 0.0001 && uniqueness < 0.99)) return None
    if (m.n < 2 || m.stddevSamp.isNaN || m.stddevSamp == 0.0) return None
    val lo = m.mean - k * m.stddevSamp
    val hi = m.mean + k * m.stddevSamp
    val flagged = df.filter(x.isNotNull && !(x > lit(lo) && x < lit(hi)))
    Some(verdict(flagged, key, s"extreme_$name",
      abs(x - lit(m.mean)) / lit(m.stddevSamp), x))
  }

  /** Per-class z-score (`improve_data_quality.py:721-766`, A6): within
    * each value of a low-cardinality class column, z-score a numeric
    * column; flag rows outside mean ± k·std of their class. Implemented
    * as groupBy + exact decimal moments + broadcast join-back: map-side
    * partial aggregation (no window sort), one shuffle of (class, sums)
    * only, and order-independent bounds — identical verdicts at any
    * cluster size.
    */
  def groupZScore(df: DataFrame, key: Column, cls: Column, x: Column,
                  name: String, k: Double = 6.0): DataFrame = {
    val base = df.select(key.as("url"), cls.as("__cls"), x.as("__x"))
      .filter(col("__x").isNotNull && col("__cls").isNotNull)
    val stats = graft.profile.Stats.groupedMoments(base, col("__cls"), col("__x"))
      .withColumn("__m", graft.profile.Stats.meanCol)
      .withColumn("__sd", graft.profile.Stats.stdCol)
      .select("__cls", "__n", "__m", "__sd")
    val scored = base.join(broadcast(stats), Seq("__cls"))
      .filter(col("__n") >= 2 && col("__sd") > 0 &&
        !(col("__x") > col("__m") - lit(k) * col("__sd") &&
          col("__x") < col("__m") + lit(k) * col("__sd")))
    verdict(scored, col("url"), s"group_extreme_$name",
      abs(col("__x") - col("__m")) / col("__sd"),
      concat_ws("=", col("__cls"), col("__x").cast("string")))
  }

  /** Rare-combination detector (`improve_data_quality.py:596-636`, A5):
    * (c1, c2) groups with fewer than `minCount` members flag all their
    * rows. groupBy on the pair key (tiny), then a broadcast semi-join
    * back — the grouped side is bounded by the product of two
    * low-cardinality columns, so the join never shuffles the fact table.
    */
  def rareCombo(df: DataFrame, key: Column, c1: Column, c2: Column,
                n1: String, n2: String, minCount: Long = 10): DataFrame = {
    val pairs = df.select(key.as("url"), c1.as("__c1"), c2.as("__c2"))
      .filter(col("__c1").isNotNull && col("__c2").isNotNull)
    val rare = pairs.groupBy(col("__c1"), col("__c2")).count()
      .filter(col("count") < minCount)
    val flagged = pairs.join(broadcast(rare), Seq("__c1", "__c2"), "inner")
    verdict(flagged, col("url"), s"rare_combo_${n1}_$n2",
      col("count"), concat_ws(",", col("__c1"), col("__c2")))
  }

  /** Tendency invariant (`utils.py:427-441`, A4): if P(a < b) > thresh
    * over the corpus (denominator = total rows — the reference's quirk,
    * kept), rows violating a < b (strictly a > b; ties exempt) are
    * flagged. One tiny agg decides whether the rule arms; the flag pass
    * is a narrow filter.
    */
  def tendency(df: DataFrame, key: Column, a: Column, b: Column,
               n1: String, n2: String, thresh: Double = 0.999): Option[DataFrame] = {
    val stats = df.agg(
      sum((a < b).cast("long")).as("lt"),
      count(lit(1)).as("n")).head()
    val lt = Option(stats.getAs[Any]("lt")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val n = stats.getAs[Long]("n")
    if (n == 0 || lt.toDouble / n <= thresh) None
    else {
      val flagged = df.filter(a.isNotNull && b.isNotNull && a > b)
      Some(verdict(flagged, key, s"tendency_${n1}_$n2",
        lit(lt.toDouble / n), concat_ws(">", a.cast("string"), b.cast("string"))))
    }
  }

  /** Value-uniqueness sanity (`utils.py:371-383`, D4): in a ≈all-unique
    * column (uniqueness > hi) duplicated values are suspect; in a
    * ≈all-repeated column (uniqueness < lo) unique values are. groupBy on
    * the value + semi-join back — same shuffle shape as rareCombo.
    */
  def nonUniqueValues(df: DataFrame, key: Column, c: Column, name: String,
                      uniqueness: Double, hi: Double = 0.99,
                      lo: Double = 0.001): Option[DataFrame] = {
    val vals = df.select(key.as("url"), c.as("__v")).filter(col("__v").isNotNull)
    val counts = vals.groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
    if (uniqueness > hi) {
      val flagged = vals.join(counts.filter(col("__cnt") > 1), Seq("__v"))
      Some(verdict(flagged, col("url"), s"dup_value_$name",
        col("__cnt"), col("__v")))
    } else if (uniqueness < lo) {
      val flagged = vals.join(counts.filter(col("__cnt") === 1), Seq("__v"))
      Some(verdict(flagged, col("url"), s"unique_value_$name",
        col("__cnt"), col("__v")))
    } else None
  }

  /** String-column correlation discovery (`improve_data_quality.py:638-672`,
    * G3): label-encode the gated low-uniqueness string columns with ONE
    * SHARED encoding (the reference fits a single LabelEncoder over the
    * union of values), Pearson-correlate every pair, keep |corr| ≥ thresh.
    * The encoding table is tiny by the gate's construction → broadcast;
    * all pairwise correlations come from ONE aggregate pass.
    */
  def corrStr(df: DataFrame, cols: Seq[String],
              thresh: Double = 0.5): Map[String, Seq[String]] = {
    if (cols.size < 2) return cols.map(_ -> Seq.empty[String]).toMap
    // shared encoding: sorted distinct union of all values → 1..K
    val values = cols.map(c => df.select(col(c).cast("string").as("v")))
      .reduce(_ unionByName _).filter(col("v").isNotNull)
      .distinct().orderBy("v")
    val codeMap = values.collect().map(_.getString(0)).zipWithIndex
      .map { case (v, i) => v -> (i + 1) }.toMap
    val enc = typedlit(codeMap)
    val encoded = df.select(cols.map(c =>
      element_at(enc, col(c).cast("string")).cast("double").as(c)): _*)
    val pairs = cols.combinations(2).toSeq
    val aggs = pairs.map { case Seq(a, b) => corr(col(a), col(b)).as(s"$a|$b") }
    val row = encoded.agg(aggs.head, aggs.tail: _*).head()
    val related = pairs.flatMap { case Seq(a, b) =>
      Option(row.getAs[Any](s"$a|$b")).map(_.asInstanceOf[Double]).toSeq
        .filter(c => math.abs(c) >= thresh)
        .flatMap(_ => Seq(a -> b, b -> a))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    cols.map(c => c -> related.getOrElse(c, Seq.empty)).toMap
  }

  /** Row-completeness (`utils.py:344-368`, A3): flag rows whose null
    * fraction across all columns ≥ t1 AND whose null fraction across
    * "mostly-present" columns (column null-mean < 0.8, from the broadcast
    * profile) ≥ t2 — the intersection semantics of utils.py:366. Pure
    * row-local expression: no shuffle.
    */
  def completeness(df: DataFrame, key: Column,
                   profiles: Map[String, ColumnProfile],
                   cols: Seq[String],
                   t1: Double = 0.7, t2: Double = 0.5): DataFrame = {
    val nullCount = cols.map(c => isnull(col(c)).cast("int")).reduce(_ + _)
    val presentCols = cols.filter(c => profiles.get(c).forall(_.nullMean < 0.8))
    val nullCountPresent =
      if (presentCols.isEmpty) lit(0)
      else presentCols.map(c => isnull(col(c)).cast("int")).reduce(_ + _)
    val frac1 = nullCount.cast(DoubleType) / lit(cols.size)
    val frac2 =
      if (presentCols.isEmpty) lit(0.0)
      else nullCountPresent.cast(DoubleType) / lit(presentCols.size)
    val flagged = df.filter(frac1 >= t1 && frac2 >= t2)
    verdict(flagged, key, "empty", frac1, lit("row_null_fraction"))
  }

  /** CCNet-style CROSS-DOCUMENT paragraph boilerplate rule (Wenzek et al.
    * 2020 "CCNet" dedups paragraphs across shards; dropping the whole doc
    * when a fraction of it is shared boilerplate is the conservative
    * variant that preserves this engine's byte-identical scrub contract —
    * we never edit text). A document is flagged when ≥ `maxFrac` of its
    * paragraph characters belong to paragraphs that appear in at least
    * `minDocs` DISTINCT documents.
    *
    * Paragraph contract shared with [[graft.functions.Repetition]] /
    * the `dq_boilerplate` oracle: literal `\n\n` split, empty segments
    * dropped, code-point char counts.
    *
    * Scale shape (the whole point of this rule being distributed): the
    * shuffle carries (8-byte xxhash64, key, length) — never paragraph
    * text. ndocs is computed as distinct-(hash, key) THEN count — the
    * explicit two-step spreads a mega-hot paragraph ("subscribe to our
    * newsletter" in 10⁸ docs) across the (hash, key) key space before
    * the map-side-combinable count; the join-back build side has exactly
    * ONE row per hash, so the hot hash joins without salting. Hash note:
    * xxhash64 is engine-internal bucketing (like exactDup's content
    * hash); the oracle QUERY groups by paragraph text itself — exact at
    * test scale, same metric.
    */
  def boilerplateParagraphs(df: DataFrame, key: Column, text: Column,
                            minDocs: Long = 2,
                            maxFrac: Double = 0.5): DataFrame = {
    val paras = df
      .select(key.as("__k"),
        explode(split(coalesce(text, lit("")), "\n\n")).as("__p"))
      .filter(col("__p") =!= "")
      .select(col("__k"), xxhash64(col("__p")).as("__h"),
        length(col("__p")).cast("long").as("__len"))
    val ndocs = paras.select(col("__h"), col("__k")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__ndocs"))
    val perDoc = paras.join(ndocs, Seq("__h"))
      .groupBy("__k")
      .agg(
        sum(col("__len")).as("__tot"),
        sum(when(col("__ndocs") >= minDocs, col("__len")).otherwise(0L)).as("__shared"),
        sum(when(col("__ndocs") >= minDocs, 1L).otherwise(0L)).as("__nshared"))
      .withColumn("__frac", col("__shared").cast(DoubleType) / col("__tot"))
    verdict(perDoc.filter(col("__frac") >= maxFrac), col("__k"),
      "ccnet_boilerplate", col("__frac"),
      concat_ws("/", col("__nshared"), lit("shared_paras")))
  }

  /** Benchmark-decontamination rule (GPT-3 appx C shape, via
    * [[graft.functions.Decontam]]): flag any document with ≥ `minHits`
    * word n-gram collisions against the eval corpus. The default
    * `minHits = 1` is the published semantics — one 8-13-gram collision
    * with a test set is a leak, whatever the document's length; raise it
    * (or gate on `score`, the collision fraction) for noisier eval sets.
    * Eval side broadcasts (eval suites are tiny next to the corpus);
    * the one shuffle carries a row per document, never gram text.
    */
  def contaminationRule(df: DataFrame, key: Column, text: Column,
                        eval: DataFrame, n: Int = 8,
                        minHits: Long = 1): DataFrame = {
    val c = graft.functions.Decontam.contamination(df, key, text, eval, n)
    verdict(c.filter(col("n_contaminated") >= minHits), col("__k"),
      "decontam", coalesce(col("contam_frac"), lit(0.0)),
      concat_ws("/", col("n_contaminated"), lit("eval_gram_hits")))
  }

  /** Cross-document exact-substring duplication rule (Lee et al. 2021
    * ExactSubstr shape, via [[graft.functions.ExactSubstr]]): flag any
    * document whose fraction of tokens covered by ≥ `l`-token spans
    * shared with ≥ `minDocs` distinct documents reaches `maxFrac`. The
    * paper's L is 50 tokens; doc-DROP (not span-EDIT) semantics here
    * preserve the byte-identical scrub contract, same reasoning as the
    * C4 line battery. Complements MinHash/SimHash whole-doc near-dup:
    * those miss a long verbatim span inside two otherwise-different
    * documents; this rule measures exactly that.
    */
  def exactSubstrDup(df: DataFrame, key: Column, text: Column,
                     l: Int = 50, minDocs: Long = 2L,
                     maxFrac: Double = 0.2): DataFrame = {
    val st = graft.functions.ExactSubstr.substrDupStats(df, key, text, l, minDocs)
    verdict(st.filter(col("dup_frac") >= maxFrac), col("__k"),
      "exact_substr_dup", col("dup_frac"),
      concat_ws("/", col("dup_tokens"), col("n_tokens"), lit(s"dup@L$l")))
  }

  /** Model-based quality rule ([[graft.functions.QualityModel]] — the
    * fastText-shaped hashed-trigram classifier the CCNet/DCLM/FineWeb-Edu
    * stack runs next to the heuristic batteries): drop documents scoring
    * below `minScore`. One codegen'd narrow map over whatever scan reads
    * the text column — the ~32 KB weight table rides inside the
    * expression to every executor; zero shuffle, no model server. The
    * [[graft.functions.QualityModel.Default]] model is the built-in; a
    * production model trained on real labels loads via
    * [[graft.functions.QualityModel.fromFrame]].
    */
  def modelQualityRule(df: DataFrame, key: Column, text: Column,
                       minScore: Double,
                       model: graft.functions.QualityModel.Model =
                         graft.functions.QualityModel.Default): DataFrame = {
    val scored = df.select(key.as("__k"),
        graft.functions.QualityModel.scoreColumn(
          graft.functions.TextFns.normText(text), model).as("__q"))
      .filter(col("__q") < minScore)
    verdict(scored, col("__k"), "model_quality", col("__q"),
      concat_ws("<", round(col("__q"), 4), lit(minScore.toString)))
  }

  /** URL battery (RefinedWeb §3.1 shape, via [[graft.functions.UrlFns]]):
    * blocked-host membership, adult/spam keyword in the URL, and
    * over-long URLs — all pure narrow expressions riding whatever scan
    * already reads the key column; zero shuffle. `blockedHosts` /
    * `adultKeywords` are inlined literals here (curated lists are
    * 10³-10⁵ entries — expression-literal scale); a blocklist that has
    * outgrown a literal joins as a broadcast frame on
    * [[graft.functions.UrlFns.host]] instead.
    */
  def urlBattery(df: DataFrame, key: Column, url: Column,
                 blockedHosts: Seq[String] = Nil,
                 adultKeywords: Seq[String] = Nil,
                 maxUrlLen: Int = 2048): DataFrame = {
    import graft.functions.UrlFns
    val base = df.select(key.as("__k"), url.as("__u"),
      UrlFns.host(url).as("__host"))
    val blocked =
      if (blockedHosts.isEmpty) None
      else Some(verdict(
        base.filter(col("__host").isin(blockedHosts: _*)),
        col("__k"), "url_blocked_host", lit(1.0), col("__host")))
    val adult =
      if (adultKeywords.isEmpty) None
      else Some(verdict(
        base.filter(UrlFns.containsAny(col("__u"), adultKeywords)),
        col("__k"), "url_adult_keyword", lit(1.0), col("__host")))
    val long = verdict(
      base.filter(length(col("__u")) > maxUrlLen),
      col("__k"), "url_too_long", length(col("__u")).cast(DoubleType),
      col("__host"))
    (blocked.toSeq ++ adult.toSeq).foldLeft(long)(_ unionByName _)
  }

  /** Per-host document cap (host-level dedup pressure: a single template
    * site must not dominate the corpus). Keeps for each host the `cap`
    * documents with the smallest portable 60-bit url hash
    * ([[graft.functions.TextFns.md5Long]] — a deterministic uniform
    * draw per host, oracle-expressible) and flags the rest.
    *
    * Scale shape: ONE groupBy on host whose aggregate state is a
    * bounded K-heap ([[graft.functions.UrlFns.kthSmallest]] — map-side
    * partial heaps, ≤ K longs per host per partition, never the group's
    * rows), filtered to over-cap hosts, joined back on host. The build
    * side is one (host, threshold) row per OVER-CAP host — small by
    * construction — so the join-back broadcasts; a mega-host's rows
    * stay distributed on the probe side and never co-locate.
    */
  def hostCap(df: DataFrame, key: Column, url: Column,
              cap: Int): DataFrame = {
    import graft.functions.{TextFns, UrlFns}
    val base = df.select(key.as("__k"),
      UrlFns.host(url).as("__host"),
      TextFns.md5Long(url).as("__h"))
      .filter(col("__host").isNotNull)
    val thr = base.groupBy("__host")
      .agg(UrlFns.kthSmallest(col("__h"), cap).as("__thr"),
        count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(col("__host"), col("__thr"), col("__n"))
    val flagged = base.join(broadcast(thr), Seq("__host"))
      .filter(col("__h") > col("__thr"))
    verdict(flagged, col("__k"), "host_over_cap",
      col("__n").cast(DoubleType), col("__host"))
  }
}
