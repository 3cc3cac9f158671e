package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Repetition

/** Cross-validates the fused Gopher-repetition kernel against an
  * INDEPENDENT brute-force reference built from plain Scala collections
  * (regex split, groupBy, sliding windows) — no shared code with the
  * kernel's single-pass hash-map implementation.
  */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** brute-force reference: same documented contract, naive algorithms */
  private def ref(s: String): Repetition.Result = {
    def segStats(raw: Seq[String]): (Double, Double, Int) = {
      val segs = raw.filter(_.nonEmpty)
      if (segs.isEmpty) return (0.0, 0.0, 0)
      val cnt = segs.groupBy(identity).view.mapValues(_.size).toMap
      def cp(x: String) = x.codePointCount(0, x.length)
      val tot = segs.map(x => cp(x).toLong).sum
      val dup = cnt.map { case (k, c) => (c - 1).toLong * cp(k) }.sum
      ((segs.size - cnt.size).toDouble / segs.size,
        if (tot == 0) 0.0 else dup.toDouble / tot, segs.size)
    }
    // literal split, leftmost non-overlapping, via regex quoting
    def lsplit(x: String, sep: String): Seq[String] =
      x.split(java.util.regex.Pattern.quote(sep), -1).toSeq
    val lt = segStats(lsplit(s, "\n"))
    val pt = segStats(lsplit(s, "\n\n"))
    val ws = s.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def cp(x: String) = x.codePointCount(0, x.length)
    val wchars = ws.map(w => cp(w).toLong).sum
    def frac(c: Long) = if (wchars == 0) 0.0 else c.toDouble / wchars
    def top(n: Int): Double = {
      val gs = ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      if (gs.isEmpty) return 0.0
      val cnt = gs.groupBy(identity).view.mapValues(_.size).toMap
      val mx = cnt.values.max
      val byteOrd: Ordering[String] =
        Ordering.comparatorToOrdering(
          java.util.Arrays.compareUnsigned(_: Array[Byte], _: Array[Byte]))
          .on[String](_.getBytes("UTF-8"))
      val best = cnt.collect { case (g, c) if c == mx => g }.min(byteOrd)
      frac(mx.toLong * (cp(best) - (n - 1)))
    }
    def dup(n: Int): Double = {
      val gs = ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toVector
      if (gs.isEmpty) return 0.0
      val cnt = gs.groupBy(identity).view.mapValues(_.size).toMap
      val covered = gs.zipWithIndex.collect {
        case (g, i) if cnt(g) >= 2 => (i until i + n)
      }.flatten.toSet
      frac(ws.zipWithIndex.collect {
        case (w, i) if covered(i) => cp(w).toLong
      }.sum)
    }
    Repetition.Result(pt._3, lt._1, pt._1, lt._2, pt._2,
      top(2), top(3), top(4), dup(5), dup(10))
  }

  private val fixtures = Seq(
    "",
    "   \t  ",
    "single line no repeats at all here",
    "a b a b a b a b a b a b",                    // heavy 2-gram repetition
    "x\nx\nx\n\ny y\n\ny y",                      // dup lines + dup paragraphs
    "a\n\n\nb",                                   // leftmost \n\n split: ["a", "\nb"]
    "one two three four five one two three four five six seven",
    "Hé hé Hé hé ünïcode ünïcode 𐍈𐍈 𐍈𐍈",          // non-ASCII code points
    " \n line \n line \n\npara\n\npara\n",        // whitespace-only segments survive (no trim)
    ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 3) + "tail")

  test("kernel equals brute-force reference on crafted fixtures") {
    for (s <- fixtures) {
      val got = Repetition.compute(s)
      val exp = ref(s)
      assert(got == exp, s"mismatch on ${s.replace("\n", "\\n").take(60)}:\n got $got\n exp $exp")
    }
  }

  test("kernel equals brute-force reference on generated pages") {
    val texts = (0L until 300L).map(i => graft.sources.PagesGen.genRow(i).text)
    for (t <- texts) {
      assert(Repetition.compute(t) == ref(t), s"mismatch on page ${t.take(50)}")
    }
  }

  test("expression path (codegen) equals the kernel, null text stays null") {
    val df = Seq(
      (1L, "a b a b a b\nline\nline"),
      (2L, null.asInstanceOf[String]),
      (3L, "one two three")).toDF("id", "t")
    val rows = df.select(col("id"), Repetition.repetition(col("t")).as("r"))
      .orderBy("id").collect()
    val r1 = rows(0).getStruct(1)
    val e1 = Repetition.compute("a b a b a b\nline\nline")
    assert(r1.getDouble(1) == e1.dupLineFrac && r1.getDouble(5) == e1.top2)
    assert(rows(1).isNullAt(1))
    assert(rows(2).getStruct(1).getDouble(5) > 0.0) // "one two" top-2gram
  }

  test("masked dup fracs bounded in [0,1] under pathological repetition; top-n can exceed 1") {
    val s = ("spam " * 500).trim
    val r = Repetition.compute(s)
    // masked (position-cover) fractions are bounded by construction
    for (v <- Seq(r.dupLineFrac, r.dupParaFrac, r.dupLineCharFrac, r.dupParaCharFrac,
      r.dup5, r.dup10))
      assert(v >= 0.0 && v <= 1.0)
    assert(r.dup5 == 1.0 && r.dup10 == 1.0) // fully-covered degenerate doc
    // top-n counts ALL (overlapping) occurrences — Gopher's published
    // definition — so a one-token doc exceeds 1: 499 * len("spam spam") …
    assert(r.top2 == 499.0 * 8 / 2000)
  }
}
