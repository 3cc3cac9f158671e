package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML → text extraction — the north rule's "byte-identical
  * extracted text per url" step (the first operator of any web-scale
  * pipeline: the trafilatura/resiliparse slot, reduced to a fully
  * specified, engine-portable transform).
  *
  * The extraction IS the ordered transform chain below — defined once and
  * rendered twice: as a chain of codegen'd Spark built-ins
  * (`regexp_replace`/`replace`, [[extract]]) and as the identical DuckDB
  * SQL ([[sqlExpr]], the `dq_html_extract` oracle). Patterns are
  * restricted to the dialect Java regex and RE2 share: inline `(?is)`
  * flags, non-greedy `.*?`, `(?:…)` groups, `\A`/`\z` anchors — no
  * backreferences (RE2 has none), no `\x0B`-class divergences (Java `\s`
  * includes vertical tab, RE2's does not, so character classes are
  * spelled out).
  *
  * Steps, in order:
  *  1. drop invisible subtrees wholesale: `<script>`, `<style>`,
  *     `<head>`, `<noscript>`, `<template>` (content and all), then
  *     `<!-- comments -->`;
  *  2. block-level tags become `\n` (paragraph structure survives as
  *     line structure);
  *  3. every remaining tag is stripped;
  *  4. the six ubiquitous named entities + `&#39;` decode — `&amp;`
  *     LAST, so `&amp;lt;` correctly yields the literal text `&lt;`;
  *     decoding happens AFTER tag-stripping, so a decoded `<` is data,
  *     never re-parsed as markup;
  *  5. whitespace normalization: horizontal runs → one space, spaces
  *     trimmed around newlines, ≥3 newlines → 2 (paragraph break),
  *     outer trim.
  *
  * Scale shape: a per-row narrow map of ~17 string ops, all inside
  * whole-stage codegen (no UDF, no fused-kernel interpreter boundary);
  * zero shuffle, zero state. At 100 TB this runs at scan speed on the
  * source partitions. A single-pass state-machine kernel (the DocStats
  * treatment) is the known next step if profiles ever show the regex
  * chain dominating — at ~1.5 KB/doc it does not (see BENCH.md).
  *
  * PagesGen composes its html so that `extract(html) == text` holds
  * byte-identically on every generated page (HtmlExtractSpec pins it,
  * and the `extractHtml` pipeline toggle rests on it).
  */
object HtmlExtract {

  /** Subtrees removed wholesale, content included. */
  val DropSubtrees: Seq[String] =
    Seq("script", "style", "head", "noscript", "template")

  /** Tags whose open/close both read as a line break. */
  val BlockTags: Seq[String] = Seq(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "tr", "td", "th", "table",
    "thead", "tbody", "tfoot", "caption", "blockquote", "pre",
    "section", "article", "header", "footer", "nav", "aside",
    "figure", "figcaption", "form", "fieldset", "address")

  /** Ordered regex steps, phase 1: structure (pattern → replacement). */
  val tagSteps: Seq[(String, String)] =
    DropSubtrees.map(t => (s"(?is)<$t\\b[^>]*>.*?</$t[ \\t\\r\\n]*>", "")) ++ Seq(
      ("(?s)<!--.*?-->", ""),
      (s"(?i)</?(?:${BlockTags.mkString("|")})\\b[^>]*/?>", "\n"),
      // tag-like starts only (letter after optional / or !): a stray
      // '< 6' in prose is DATA and must not eat text to the next '>'
      ("<[/!]?[a-zA-Z][^>]*>", ""))

  /** Literal entity decodes (plain `replace`, not regex) — `&amp;` last. */
  val entitySteps: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  /** Ordered regex steps, phase 2: whitespace normalization. */
  val wsSteps: Seq[(String, String)] = Seq(
    ("[ \\t\\r\\f]+", " "),
    (" *\\n *", "\n"),
    ("\\n{3,}", "\n\n"),
    ("\\A[\\n ]+|[\\n ]+\\z", ""))

  /** The extraction as a Spark Column over an html STRING column. */
  def extract(html: Column): Column = {
    var c = html
    tagSteps.foreach { case (p, r) => c = regexp_replace(c, p, r) }
    entitySteps.foreach { case (a, b) => c = replace(c, lit(a), lit(b)) }
    wsSteps.foreach { case (p, r) => c = regexp_replace(c, p, r) }
    c
  }

  /** Same over a BINARY column (UTF-8 page bytes, the lake schema). */
  def extractBinary(html: Column): Column = extract(decode(html, "UTF-8"))

  /** Whitespace normalization alone (phase 2) — the fixpoint class of
    * [[extract]]: extract(wrap(t)) == normalizeWs(t) for markup-free t.
    */
  def normalizeWs(text: Column): Column =
    wsSteps.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** The identical chain as a DuckDB SQL expression over `expr` (the
    * `dq_html_extract` oracle side). DuckDB standard strings keep
    * backslashes literally, so the pattern strings interpolate verbatim;
    * only single quotes need escaping. `\n` replacements embed a real
    * newline character in the literal (Verify JSON-escapes it).
    */
  def sqlExpr(expr: String): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    var e = expr
    tagSteps.foreach { case (p, r) =>
      e = s"regexp_replace($e, ${lit(p)}, ${lit(r)}, 'g')" }
    entitySteps.foreach { case (a, b) =>
      e = s"replace($e, ${lit(a)}, ${lit(b)})" }
    wsSteps.foreach { case (p, r) =>
      e = s"regexp_replace($e, ${lit(p)}, ${lit(r)}, 'g')" }
    e
  }
}
