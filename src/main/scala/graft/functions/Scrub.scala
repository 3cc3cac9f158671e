package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Regex PII/toxicity scrubbing "compiled into Catalyst expressions"
  * (north rule). Two equivalent implementations:
  *
  *  1. [[Scrub.scrubCol]] — a chain of built-in `RegExpReplace` nodes.
  *     Fully codegen'd, and each pattern is SQL-portable (the DuckDB
  *     oracle applies the same chain), so this is the correctness path.
  *  2. [[ScrubText]] — one fused custom Expression that pre-compiles all
  *     patterns once per task and applies them in a single pass, skipping
  *     untouched strings without reallocation. Same output byte-for-byte
  *     (property-tested); used when profiling shows the replace chain hot.
  *
  * Semantics descend from the reference's typo *correction*
  * (`/root/reference/src/function_typo.py:6-47`): replace a flagged span
  * with a canonical form, deterministically, so scrubbed text is
  * byte-identical per url across runs and cluster sizes.
  *
  * Patterns are written in the common Java-regex ∩ RE2 subset (no
  * backreferences, no lookaround) so the DuckDB oracle and any RE2-based
  * auditor agree with the JVM engine.
  */
object Scrub {

  /** (pattern, replacement), applied in order. Order is part of the
    * contract — changing it changes scrubbed bytes.
    */
  val Patterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"),
    ("\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("(?i)\\b(?:" + TextFns.ToxicityLexicon.mkString("|") + ")\\b", "<TOX>")
  )

  /** Built-in-expression scrub chain (codegen path, oracle-portable). */
  def scrubCol(c: Column): Column =
    Patterns.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** Fused single-expression scrub. */
  def scrubFused(c: Column): Column = GraftExpr.column(ScrubText(GraftExpr.expr(c)))
}

/** One-pass scrubber: compiles every pattern once per task (lazy vals are
  * per-deserialized-instance, i.e. per executor task closure, not per row)
  * and short-circuits allocation when nothing matches.
  */
case class ScrubText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val compiled: Array[(java.util.regex.Pattern, String)] =
    Scrub.Patterns.map { case (p, r) =>
      (java.util.regex.Pattern.compile(p), r)
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    var changed = false
    var i = 0
    while (i < compiled.length) {
      val (pat, rep) = compiled(i)
      val m = pat.matcher(s)
      if (m.find()) { s = m.replaceAll(rep); changed = true }
      i += 1
    }
    if (changed) UTF8String.fromString(s) else input
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubText =
    copy(child = newChild)
}
