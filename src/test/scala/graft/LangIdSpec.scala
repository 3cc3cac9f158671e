package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{LangId, LangIdModel, CharLm, Perplexity}

class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sentences = Map(
    "en" -> "the people would know that this is a good test of common words from there",
    "fr" -> "les gens sont avec nous pour que cette langue soit bien dans tout cela",
    "de" -> "die leute haben nicht nur durch werden auch noch einer sprache vom zum",
    "es" -> "la gente para cuando donde tiempo muy solo pero tambien como otros desde",
    "it" -> "la gente sarebbe anche nella degli delle questi sono stati per non che piu"
  )

  test("n-gram model classifies held-out-ish sentences per language") {
    sentences.foreach { case (lang, s) =>
      val (got, _) = LangIdModel.classify(s)
      assert(got == lang, s"expected $lang got $got for: $s")
    }
  }

  test("classify is deterministic and handles degenerate input") {
    assert(LangIdModel.classify("") == ("und", 0.0))
    assert(LangIdModel.classify("ab") == ("und", 0.0))
    val a = LangIdModel.classify("the quick brown fox")
    assert(a == LangIdModel.classify("the quick brown fox"))
  }

  test("LangIdExpr works as a Column and matches driver-side classify") {
    val df = sentences.values.toSeq.toDF("text")
    val got = df.select(col("text"), LangId.langIdLang(col("text")).as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    sentences.foreach { case (lang, s) => assert(got(s) == lang) }
  }

  test("perplexity: clean seed-like text scores far below gibberish") {
    val clean = CharLm.perplexity("the people would know that this is a good test")
    val junk = CharLm.perplexity("xq zvkw jfp qqqz mxnv bbtk zzz qpw xvj kkz")
    assert(clean < 12, s"clean ppl $clean")
    assert(junk > 30, s"junk ppl $junk")
    assert(CharLm.perplexity("") == 1.0)
  }

  test("perplexity expression matches driver-side function") {
    val texts = Seq("the quick brown fox", "zzz qqq xxx jjj")
    val got = texts.toDF("t").select(Perplexity.perplexityCol(col("t")))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == texts.map(CharLm.perplexity))
  }

  test("markerLang SQL-portable scorer: argmax with asc tie-break, und on zero") {
    val df = Seq(
      "the cat and the dog with that",   // en
      "le chien et la vache dans les",   // fr
      "zzz qqq",                          // none → und
      "der die und das"                   // de
    ).toDF("t")
    val got = df.select(LangId.markerLang(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "fr", "und", "de"))
  }

  test("fused marker scorer equals the composed Column version everywhere") {
    // the fixture corpus + adversarial edge cases (ties, empties, case,
    // whitespace zoo); the fused expression must be a pure optimisation
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    val edge = Seq("", "   ", "\t\n", "THE AND OF", "the la", "la the",
      "le der el the le der el the", "does-not-match anything here",
      "withvt\tand nbsp the").toDF("text")
    Seq(docs, edge.toDF()).foreach { d =>
      val mismatch = d.select(
          LangId.markerLang(col("text")).as("f"),
          LangId.markerLangComposed(col("text")).as("c"))
        .filter(!(col("f") <=> col("c")))
      assert(mismatch.count() == 0,
        mismatch.collect().take(5).mkString("; "))
    }
    // tie goes to the lexicographically earlier language (de<en<es<fr)
    val tie = Seq("the der").toDF("text")
      .select(LangId.markerLang(col("text"))).head().getString(0)
    assert(tie == "de")
  }

  test("fused marker scorer matches lower() semantics on non-ASCII tokens") {
    // U+0130 'İ' full-string-lowercases to "i̇" (1-to-N mapping): lower("İS")
    // is NOT "is", so the composed path scores no marker hit — the fused
    // per-char path must agree (it poisons any token containing a char
    // ≥ 0x80 rather than guessing its lowercase form). U+212A Kelvin → 'k'
    // is the lone non-ASCII→ASCII mapping; no marker contains 'k'.
    val docs = Seq(
      "İS İST zzz",            // İS İST — must NOT hit en "is"
      "the İS and of",              // en hits come from ASCII tokens only
      "thé lès dés",      // accented near-markers — no hits
      "Kel els",                    // Kelvin-sign token
      "DER DİE UND"                 // DİE poisoned; der+und still de
    ).toDF("text")
    val mismatch = docs.select(
        LangId.markerLang(col("text")).as("f"),
        LangId.markerLangComposed(col("text")).as("c"))
      .filter(!(col("f") <=> col("c")))
    assert(mismatch.count() == 0, mismatch.collect().take(5).mkString("; "))
    val got = docs.select(LangId.markerLang(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("und", "en", "und", "und", "de"), got)
  }
}
