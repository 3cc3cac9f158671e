package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** KenLM-style per-document perplexity from a character n-gram LM.
  *
  * Reimagines the reference's outlier scoring (`/root/reference/src/
  * improve_data_quality.py:482-528`, LOF) and z-score extremes
  * (`src/utils.py:190-232`) as a per-document language-model score: a
  * document whose character distribution is far from the corpus model
  * (gibberish, binary junk, boilerplate soup) gets high perplexity and is
  * dropped by a threshold rule. Unlike LOF (kNN over all rows — not
  * distributable), the LM score is embarrassingly parallel: the model is
  * small and identical on every JVM (built from the embedded seed corpus,
  * like [[LangIdModel]]), so scoring is a narrow map with zero shuffle —
  * the only shape that works at 10¹² documents.
  *
  * Model: order-3 char LM, add-alpha smoothing, trained on the combined
  * LangIdModel seed corpus. Deterministic by construction.
  */
object CharLm {
  val Order = 3
  val Alpha = 0.1

  final case class Model(ctx: java.util.HashMap[String, java.lang.Double], // context -> total+αV
                         cnt: java.util.HashMap[String, java.lang.Double], // context+char -> count+α
                         vocab: Double)

  lazy val model: Model = fromText(LangIdModel.SeedCorpus.toSeq)

  /** Build the LM from in-memory (lang, text) pairs — IDENTICAL math to
    * the embedded-corpus build (sort by lang, join with " ", normalize,
    * count order-3 grams, vocab = distinct final chars + 1), so
    * `fromText(SeedCorpus)` reproduces [[model]] bit-for-bit
    * (PerplexitySpec round-trips it). This is the production LM swap
    * point: the scorer's model is data, not code.
    */
  def fromText(pairs: Seq[(String, String)]): Model = {
    val corpus = pairs.sortBy(_._1).map(_._2).mkString(" ")
    val n = TextNorm.norm(corpus)
    val ctxCount = new java.util.HashMap[String, java.lang.Double]()
    val gramCount = new java.util.HashMap[String, java.lang.Double]()
    val chars = scala.collection.mutable.HashSet[Char]()
    var i = 0
    while (i + Order <= n.length) {
      val ctx = n.substring(i, i + Order - 1)
      val gram = n.substring(i, i + Order)
      ctxCount.merge(ctx, 1.0, (a, b) => a + b)
      gramCount.merge(gram, 1.0, (a, b) => a + b)
      chars += n.charAt(i + Order - 1)
      i += 1
    }
    Model(ctxCount, gramCount, chars.size.toDouble + 1.0)
  }

  /** Build the LM from any (lang, text) DataFrame — the cluster-friendly
    * loader twin of [[LangIdModel.fromTable]]: a training corpus is a few
    * MB of curated text (the model must stay broadcast-sized; it ships
    * inside the scorer expression to every executor), so a driver
    * collect is the correct shape — this is model TRAINING input, not a
    * data path. Gated by the shared [[LangIdModel.MaxCorpusBytes]]
    * budget: a mispointed corpus-scale table fails with a named error
    * before anything is collected, never a driver OOM.
    */
  def fromTable(df: org.apache.spark.sql.DataFrame,
                maxBytes: Long = LangIdModel.MaxCorpusBytes): Model =
    fromText(LangIdModel.boundedCorpusRows(df, "char_lm.from_table", maxBytes))

  /** Perplexity under an EXPLICIT model (the loader-parity scorer; the
    * fused kernel path scores under the default [[model]]).
    */
  def perplexityUnder(m: Model, text: String): Double = {
    val n = TextNorm.norm(text)
    if (n.length < Order) return 1.0
    var logSum = 0.0
    var i = 0
    val total = n.length - Order + 1
    while (i + Order <= n.length) {
      val ctx = n.substring(i, i + Order - 1)
      val gram = n.substring(i, i + Order)
      val c = m.cnt.get(gram)
      val cc = m.ctx.get(ctx)
      val num = (if (c == null) 0.0 else c.doubleValue()) + Alpha
      val den = (if (cc == null) 0.0 else cc.doubleValue()) + Alpha * m.vocab
      logSum += math.log(num / den)
      i += 1
    }
    math.exp(-logSum / total)
  }

  /** Hash-keyed LOG-prob tables for the zero-allocation scorer
    * ([[DocStats]]): `math.log` per trigram was ~1500 log() calls per
    * document — precomputing log P(c|ctx) for seen grams, the per-context
    * unseen-gram default, and the global default removes every log from
    * the hot loop. Values are built with the IDENTICAL expression the
    * reference path uses, so the summed doubles match bit-for-bit.
    */
  lazy val fastGramLogProb: LongDoubleMap = {
    val t = new LongDoubleMap(model.cnt.size() + 1)
    model.cnt.forEach { (g, c) =>
      val ctx = g.substring(0, Order - 1)
      val cc = model.ctx.get(ctx)
      val den = (if (cc == null) 0.0 else cc.doubleValue()) + Alpha * model.vocab
      t.put(DocStats.fnv1a(g, 0, g.length), math.log((c + Alpha) / den))
    }
    t
  }
  lazy val fastCtxDefaultLogProb: LongDoubleMap = {
    val t = new LongDoubleMap(model.ctx.size() + 1)
    model.ctx.forEach { (g, c) =>
      t.put(DocStats.fnv1a(g, 0, g.length),
        math.log(Alpha / (c + Alpha * model.vocab)))
    }
    t
  }
  lazy val globalDefaultLogProb: Double =
    math.log(Alpha / (Alpha * model.vocab))

  /** Perplexity = exp(-mean log P(c | ctx)). Short/empty text ⇒ 1.0. */
  def perplexity(text: String): Double = perplexityUnder(model, text)
}

/** `char_ngram_perplexity(text)` → double. */
case class CharNgramPerplexity(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    CharLm.perplexity(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): CharNgramPerplexity =
    copy(child = newChild)
}

object Perplexity {
  def perplexityCol(c: Column): Column =
    GraftExpr.column(CharNgramPerplexity(GraftExpr.expr(c)))
}
