package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The C4 / RefinedWeb LINE-level battery (Raffel et al. 2020 §2.2 "C4";
  * Penedo et al. 2023 "RefinedWeb" line-wise filters) as one fused
  * per-document pass — the doc-level statistics behind the published
  * page-drop rules:
  *
  *  - `n_sentences`: count of `[.!?]` immediately followed by whitespace
  *    or end-of-text (C4 drops pages with < 3 sentences).
  *  - `frac_lines_end_terminal`: lines whose LAST code point is one of
  *    `. ! ? "` (C4 keeps only such lines; surfaced as a doc-level
  *    fraction so the rule can drop pages instead of editing text — the
  *    pipeline's scrubbed-text contract is byte-identical per url).
  *  - `frac_lines_start_bullet`: first code point `• - *` (RefinedWeb
  *    drops docs over 0.90).
  *  - `frac_lines_end_ellipsis`: line ends with `...` or `…` (RefinedWeb
  *    drops docs over 0.30).
  *  - `frac_short_lines`: lines with < 5 whitespace tokens (the C4
  *    line-edit rule as a doc statistic).
  *  - `frac_js_lines`: lines containing `javascript` case-insensitively
  *    (the C4 "javascript" line rule as a doc statistic).
  *  - `has_lorem_ipsum` / `has_curly_brace`: the C4 page-drop predicates.
  *
  * Line segmentation and whitespace follow [[Repetition]]'s contract
  * (split on `\n`, empty segments dropped, no trim, code-point counts),
  * so the DuckDB twin (`dq_c4_lines`) is expressible with the same
  * `string_split` / list-lambda fragments.
  */
object C4Stats {

  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_sentences", IntegerType, nullable = false),
    StructField("frac_lines_end_terminal", DoubleType, nullable = false),
    StructField("frac_lines_start_bullet", DoubleType, nullable = false),
    StructField("frac_lines_end_ellipsis", DoubleType, nullable = false),
    StructField("frac_short_lines", DoubleType, nullable = false),
    StructField("frac_js_lines", DoubleType, nullable = false),
    StructField("has_lorem_ipsum", BooleanType, nullable = false),
    StructField("has_curly_brace", BooleanType, nullable = false)))

  final case class Result(
      nLines: Int, nSentences: Int,
      endTerminal: Double, startBullet: Double, endEllipsis: Double,
      shortLines: Double, jsLines: Double,
      loremIpsum: Boolean, curlyBrace: Boolean)

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** case-insensitive ASCII-needle search within s[from, until) — exact
    * parity with DuckDB `contains(lower(x), needle)` for needles whose
    * chars have no non-ASCII Unicode pre-image (true for both needles
    * here: the only single-char ASCII-producing mapping is U+212A → 'k',
    * absent from them), without the index desync a full-string
    * toLowerCase would cause (1→N mappings like U+0130 change length).
    */
  private def asciiContains(s: String, from: Int, until: Int, needle: String): Boolean = {
    val n = needle.length
    var i = from
    while (i + n <= until) {
      var j = 0
      while (j < n && {
        val c = s.charAt(i + j)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        lc == needle.charAt(j)
      }) j += 1
      if (j == n) return true
      i += 1
    }
    false
  }

  private def wordCount(s: String, from: Int, until: Int): Int = {
    var n = 0
    var i = from
    var in = false
    while (i < until) {
      val ws = isWs(s.charAt(i))
      if (!ws && !in) { n += 1; in = true } else if (ws) in = false
      i += 1
    }
    n
  }

  def compute(s: String): Result = {
    val lorem = asciiContains(s, 0, s.length, "lorem ipsum")
    val curly = s.indexOf('{') >= 0
    // sentence terminators: [.!?] followed by whitespace or end-of-text
    var sentences = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c == '.' || c == '!' || c == '?') &&
        (i == s.length - 1 || isWs(s.charAt(i + 1)))) sentences += 1
      i += 1
    }
    // line loop: split on '\n', skip empty segments
    var nLines = 0
    var terminal = 0
    var bullet = 0
    var ellipsis = 0
    var short5 = 0
    var js = 0
    var from = 0
    while (from <= s.length) {
      val idx = s.indexOf('\n', from)
      val end = if (idx < 0) s.length else idx
      if (end > from) {
        nLines += 1
        val last = s.charAt(end - 1)
        if (last == '.' || last == '!' || last == '?' || last == '"') terminal += 1
        val first = s.charAt(from)
        if (first == '•' || first == '-' || first == '*') bullet += 1
        if ((end - from >= 3 && s.charAt(end - 1) == '.' &&
          s.charAt(end - 2) == '.' && s.charAt(end - 3) == '.') ||
          last == '…') ellipsis += 1
        if (wordCount(s, from, end) < 5) short5 += 1
        if (asciiContains(s, from, end, "javascript")) js += 1
      }
      if (idx < 0) from = s.length + 1 else from = idx + 1
    }
    def frac(n: Int): Double = if (nLines == 0) 0.0 else n.toDouble / nLines
    Result(nLines, sentences, frac(terminal), frac(bullet), frac(ellipsis),
      frac(short5), frac(js), lorem, curly)
  }

  def evalRow(u: UTF8String): InternalRow = {
    val r = compute(u.toString)
    InternalRow(r.nLines, r.nSentences, r.endTerminal, r.startBullet,
      r.endEllipsis, r.shortLines, r.jsLines, r.loremIpsum, r.curlyBrace)
  }

  def c4Stats(c: Column): Column = GraftExpr.column(C4StatsExpr(GraftExpr.expr(c)))
}

case class C4StatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = C4Stats.schema
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    C4Stats.evalRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.C4Stats.evalRow($c);")

  override protected def withNewChildInternal(newChild: Expression): C4StatsExpr =
    copy(child = newChild)
}
