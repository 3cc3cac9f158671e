package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.C4Stats
import graft.pipeline.QualityPipeline

/** Cross-validates the fused C4/RefinedWeb line battery against an
  * independent brute-force reference, and exercises the pipeline's
  * `c4Rules` toggle on a sentence-bearing ad-hoc corpus (the golden
  * fixture corpus is punctuation-free, so minSentences would be
  * corpus-inappropriate there — documented at the Config field).
  */
class C4StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ref(s: String): C4Stats.Result = {
    val ls = s.split("\n", -1).filter(_.nonEmpty).toSeq
    val n = ls.size
    val sent = "[.!?](\\s|$)".r.findAllIn(s).length
    def fr(c: Int) = if (n == 0) 0.0 else c.toDouble / n
    val term = ls.count(l => ".!?\"".contains(l.last))
    val bull = ls.count(l => "•-*".contains(l.head))
    val ell = ls.count(l => l.endsWith("...") || l.endsWith("…"))
    val short5 = ls.count(l => l.trim.split("\\s+").count(_.nonEmpty) < 5)
    val js = ls.count(_.toLowerCase(java.util.Locale.ROOT).contains("javascript"))
    C4Stats.Result(n, sent, fr(term), fr(bull), fr(ell), fr(short5), fr(js),
      s.toLowerCase(java.util.Locale.ROOT).contains("lorem ipsum"),
      s.contains("{"))
  }

  private val fixtures = Seq(
    "",
    "no newline no punctuation here",
    "First sentence. Second! Third? Done.",
    "• item one\n• item two\n• item three\nBody text ends here.",
    "thinking...\nmore thoughts…\nconclusion.",
    "Enable JAVASCRIPT to continue\nLorem IPSUM dolor\nfunction() { return 1 }",
    "a.b c!d e?f",                       // terminators NOT followed by ws don't count
    "Hi!? Done.\n\n\nshort line",        // "!?": only '?' counts; empty lines dropped
    "ends with dots...\nends with quote\"\n- starts dash")

  test("kernel equals brute-force reference on crafted fixtures") {
    for (s <- fixtures)
      assert(C4Stats.compute(s) == ref(s),
        s"mismatch on ${s.replace("\n", "\\n")}:\n got ${C4Stats.compute(s)}\n exp ${ref(s)}")
  }

  test("kernel equals brute-force reference on generated pages") {
    val texts = (0L until 300L).map(i => graft.sources.PagesGen.genRow(i).text)
    for (t <- texts)
      assert(C4Stats.compute(t) == ref(t), s"mismatch on ${t.take(50)}")
  }

  test("expression path works and null stays null") {
    val rows = Seq((1L, "One. Two! Three? Four."), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), C4Stats.c4Stats(col("t")).as("c")).orderBy("id").collect()
    assert(rows(0).getStruct(1).getInt(1) == 4)
    assert(rows(1).isNullAt(1))
  }

  test("c4Rules toggle: published page-drop rules fire on a sentence-bearing corpus") {
    // ad-hoc corpus in the pipeline's page shape: url, warc_ts, html, text, lang
    val good = "This is a well formed document with full sentences. " +
      "It has several of them, in fact! Does it pass the battery? " +
      "Yes, because it is ordinary prose with normal lines."
    val rows = Seq(
      ("http://ok/p/1", good, "en"),
      ("http://bad/p/2", "fragment without punctuation", "en"),        // < 3 sentences
      ("http://bad/p/3", good + "\n" + "• a\n• b\n• c\n• d\n• e\n• f\n• g\n• h\n• i\n• j\n• k\n• l", "en"), // bullets > 0.9? 12 bullets + 1 prose = 12/13 = 0.92
      ("http://bad/p/4", good + "\nwait for it...\nstill going...\nalmost there...", "en"), // ellipsis 3/4 = 0.75
      ("http://bad/p/5", good + " Lorem ipsum dolor sit amet.", "en"),
      ("http://bad/p/6", good + " if (x) { return; }", "en"))
      .toDF("url", "text", "lang")
      .withColumn("warc_ts", lit("2025-01-01T00:00:00Z"))
      .withColumn("html", col("text"))
    val cfg = QualityPipeline.defaultConfig.copy(c4Rules = true)
    val feat = QualityPipeline.features(rows, cfg)
    val v = QualityPipeline.heuristicVerdicts(feat, cfg)
      .filter(col("rule").isin("c4_min_sentences", "rw_bullet_lines",
        "rw_ellipsis_lines", "c4_lorem_ipsum", "c4_curly_brace"))
      .select("url", "rule").collect().map(r => r.getString(0) -> r.getString(1))
    val byUrl = v.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!byUrl.contains("http://ok/p/1"), s"clean doc flagged: ${byUrl.get("http://ok/p/1")}")
    assert(byUrl("http://bad/p/2").contains("c4_min_sentences"))
    assert(byUrl("http://bad/p/3").contains("rw_bullet_lines"))
    assert(byUrl("http://bad/p/4").contains("rw_ellipsis_lines"))
    assert(byUrl("http://bad/p/5").contains("c4_lorem_ipsum"))
    assert(byUrl("http://bad/p/6").contains("c4_curly_brace"))

    // toggle off: no c4 columns, no c4/rw rules
    val featOff = QualityPipeline.features(rows)
    assert(!featOff.columns.exists(_.startsWith("c4_")))
    val offRules = QualityPipeline
      .heuristicVerdicts(featOff, QualityPipeline.defaultConfig)
      .select("rule").distinct().collect().map(_.getString(0)).toSet
    assert(!offRules.exists(r => r.startsWith("c4_") || r.startsWith("rw_")))
  }
}
