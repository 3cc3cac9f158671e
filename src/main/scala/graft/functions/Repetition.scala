package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher repetition battery (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", Table A1)
  * as ONE fused per-document pass — the published webtext quality rules
  * the reference's heuristics don't cover (`/root/reference/src/
  * assess_data_quality.py` stops at per-column stats; the north-star
  * battery for LLM corpus filtering is this):
  *
  *  - `dup_line_frac` / `dup_para_frac`: fraction of non-empty line /
  *    paragraph occurrences beyond the first of each distinct value.
  *  - `dup_line_char_frac` / `dup_para_char_frac`: same, weighted by
  *    code-point length (chars in repeated occurrences / total chars).
  *  - `top_{2,3,4}gram_char_frac`: chars covered by ALL occurrences of
  *    the single most frequent word n-gram / total word chars. Ties on
  *    count break to the UTF-8-byte-smallest n-gram — the same order as
  *    DuckDB's binary varchar collation, which keeps the SQL oracle twin
  *    (`ORDER BY count DESC, gram ASC`) bit-compatible.
  *  - `dup_{5,10}gram_char_frac`: chars of word POSITIONS covered by any
  *    n-gram occurring ≥ 2 times / total word chars — the masked variant
  *    public Gopher replications use (overlapping duplicate n-grams never
  *    double-count a word), bounded in [0, 1].
  *
  * Segmentation contract (shared with the DuckDB oracle `dq_repetition`):
  * lines split on `\n`, paragraphs on literal `\n\n` (leftmost,
  * non-overlapping — `"a\n\n\nb"` → `["a", "\nb"]`, exactly DuckDB
  * `string_split`), empty segments dropped AFTER splitting (no trim, so
  * a whitespace-only line still counts); words are the whitespace tokens
  * of [[TextFns.tokens]]; all char counts are Unicode CODE POINTS
  * (DuckDB `length()`).
  *
  * Scale shape: one pass, no shuffle, ~O(n_words) time and memory per
  * document (five small per-doc hash maps). This is an OPT-IN second
  * scan column (`QualityPipeline.Config.gopherRepetition`), not part of
  * the always-on DocStats kernel, because the gram maps allocate per doc
  * — the always-on kernel stays allocation-lean at ~100 µs/doc.
  */
object Repetition {

  val schema: StructType = StructType(Seq(
    StructField("n_paras", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_para_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("dup_para_char_frac", DoubleType, nullable = false),
    StructField("top_2gram_char_frac", DoubleType, nullable = false),
    StructField("top_3gram_char_frac", DoubleType, nullable = false),
    StructField("top_4gram_char_frac", DoubleType, nullable = false),
    StructField("dup_5gram_char_frac", DoubleType, nullable = false),
    StructField("dup_10gram_char_frac", DoubleType, nullable = false)))

  /** Raw (unrounded) battery values; fractions are exact int/int double
    * divisions so the SQL twin reproduces them bit-for-bit.
    */
  final case class Result(
      nParas: Int,
      dupLineFrac: Double, dupParaFrac: Double,
      dupLineCharFrac: Double, dupParaCharFrac: Double,
      top2: Double, top3: Double, top4: Double,
      dup5: Double, dup10: Double)

  // same \s set as TextFns.tokens / DocStats (Java regex \s)
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** (dup_frac, dup_char_frac, n_segments) over non-empty segments. */
  private def segStats(segs: java.util.ArrayList[String]): (Double, Double, Int) = {
    val n = segs.size
    if (n == 0) return (0.0, 0.0, 0)
    val counts = new java.util.HashMap[String, Int](n * 2)
    var i = 0
    while (i < n) {
      counts.merge(segs.get(i), 1, (a: Int, b: Int) => a + b)
      i += 1
    }
    var totChars = 0L
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val len = cpLen(e.getKey).toLong
      totChars += e.getValue * len
      dupChars += (e.getValue - 1) * len
    }
    val dupFrac = (n - counts.size).toDouble / n
    val dupCharFrac = if (totChars == 0) 0.0 else dupChars.toDouble / totChars
    (dupFrac, dupCharFrac, n)
  }

  /** Split on a literal separator, leftmost non-overlapping, keeping only
    * non-empty segments — DuckDB `string_split` + `x <> ''` semantics.
    */
  private def splitLiteral(s: String, sep: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    var from = 0
    while (from <= s.length) {
      val idx = s.indexOf(sep, from)
      val end = if (idx < 0) s.length else idx
      if (end > from) out.add(s.substring(from, end))
      if (idx < 0) from = s.length + 1 else from = idx + sep.length
    }
    out
  }

  private def words(s: String): Array[String] = {
    val out = new java.util.ArrayList[String]()
    var i = 0
    var ts = -1
    val len = s.length
    while (i <= len) {
      if (i == len || isWs(s.charAt(i))) {
        if (ts >= 0) { out.add(s.substring(ts, i)); ts = -1 }
      } else if (ts < 0) ts = i
      i += 1
    }
    out.toArray(new Array[String](out.size))
  }

  /** unsigned lexicographic compare of UTF-8 byte encodings — DuckDB's
    * default binary varchar collation, so kernel and SQL pick the SAME
    * tie-break n-gram.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n) {
      val d = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    ab.length < bb.length
  }

  private def grams(ws: Array[String], n: Int): Array[String] = {
    if (ws.length < n) return Array.empty
    val out = new Array[String](ws.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** chars of all occurrences of the most frequent n-gram (count-max,
    * UTF-8-byte-min tie-break).
    */
  private def topGramChars(gs: Array[String], n: Int): Long = {
    if (gs.isEmpty) return 0L
    val counts = new java.util.HashMap[String, Int](gs.length * 2)
    var i = 0
    while (i < gs.length) { counts.merge(gs(i), 1, (a: Int, b: Int) => a + b); i += 1 }
    var bestC = 0
    var best: String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > bestC || (e.getValue == bestC && utf8Less(e.getKey, best))) {
        bestC = e.getValue; best = e.getKey
      }
    }
    bestC.toLong * (cpLen(best) - (n - 1))
  }

  /** masked duplicate-n-gram chars: sum of word code-point lengths over
    * positions covered by any n-gram window occurring ≥ 2 times.
    */
  private def dupGramChars(ws: Array[String], gs: Array[String], n: Int): Long = {
    if (gs.isEmpty) return 0L
    val counts = new java.util.HashMap[String, Int](gs.length * 2)
    var i = 0
    while (i < gs.length) { counts.merge(gs(i), 1, (a: Int, b: Int) => a + b); i += 1 }
    val covered = new Array[Boolean](ws.length)
    i = 0
    while (i < gs.length) {
      if (counts.get(gs(i)) >= 2) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var chars = 0L
    i = 0
    while (i < ws.length) {
      if (covered(i)) chars += cpLen(ws(i))
      i += 1
    }
    chars
  }

  def compute(s: String): Result = {
    val (dlf, dlcf, _) = segStats(splitLiteral(s, "\n"))
    val (dpf, dpcf, nParas) = segStats(splitLiteral(s, "\n\n"))
    val ws = words(s)
    var wChars = 0L
    var i = 0
    while (i < ws.length) { wChars += cpLen(ws(i)); i += 1 }
    def frac(chars: Long): Double = if (wChars == 0) 0.0 else chars.toDouble / wChars
    val g5 = grams(ws, 5)
    val g10 = grams(ws, 10)
    Result(nParas, dlf, dpf, dlcf, dpcf,
      frac(topGramChars(grams(ws, 2), 2)),
      frac(topGramChars(grams(ws, 3), 3)),
      frac(topGramChars(grams(ws, 4), 4)),
      frac(dupGramChars(ws, g5, 5)),
      frac(dupGramChars(ws, g10, 10)))
  }

  /** Kernel → InternalRow, callable as a STATIC from generated code (see
    * [[DocStats.evalRow]] for the pattern).
    */
  def evalRow(u: UTF8String): InternalRow = {
    val r = compute(u.toString)
    InternalRow(r.nParas, r.dupLineFrac, r.dupParaFrac,
      r.dupLineCharFrac, r.dupParaCharFrac,
      r.top2, r.top3, r.top4, r.dup5, r.dup10)
  }

  def repetition(c: Column): Column = GraftExpr.column(RepetitionExpr(GraftExpr.expr(c)))
}

case class RepetitionExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Repetition.schema
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Repetition.evalRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Repetition.evalRow($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionExpr =
    copy(child = newChild)
}
