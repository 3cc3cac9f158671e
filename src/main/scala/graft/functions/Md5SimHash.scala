package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash over md5-hashed distinct lowercase tokens — byte-identical to
  * the composed-Column/SQL-oracle semantics (md5-prefix-60-bit token
  * hash, per-bit majority vote `2*ones >= n`), fused into one pass.
  */
case class Md5SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val seen = new java.util.HashSet[String]()
    val ones = new Array[Int](bits)
    var n = 0
    var i = 0
    val len = s.length
    var ts = -1
    while (i <= len) {
      if (i == len || isWs(s.charAt(i))) {
        if (ts >= 0) {
          // Locale.ROOT: the oracle-checked md5 depends on these bytes —
          // a Turkish-locale JVM lowercasing "I" to "ı" would fork them
          val tok = s.substring(ts, i).toLowerCase(java.util.Locale.ROOT)
          if (seen.add(tok)) {
            n += 1
            md.reset()
            val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var v = 0L
            var b = 0
            while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
            val h = v >>> 4 // first 15 hex chars = 60 bits
            b = 0
            while (b < bits) {
              if (((h >>> b) & 1L) == 1L) ones(b) += 1
              b += 1
            }
          }
          ts = -1
        }
      } else if (ts < 0) ts = i
      i += 1
    }
    if (n == 0) return 0L
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * ones(b) >= n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Md5SimHashExpr =
    copy(child = newChild)
}

/** WIDE (2 × 60-bit) md5 token simhash for the 10⁹⁺ near-dup regime
  * ([[graft.rules.Rules.simHashNearDupWide]]): per-bit majority over TWO
  * portable 60-bit token hashes — `lo` from md5 hex chars 1-15 (the
  * proven md5Long convention: first 8 digest bytes ≫ 4) and `hi` from
  * hex chars 17-31 (bytes 8-15 ≫ 4) — emitted as a struct(hi, lo). Both
  * halves are expressible in DuckDB as
  * `('0x'||substr(md5(t),{1|17},15))::BIGINT`, which is what makes the
  * brute-force wide-Hamming oracle (`dq_simhash_neardup_wide`) portable.
  * The engine-internal production fingerprint is [[DocStats]]'s FNV-based
  * `simhash_hi/lo` (same banding rule, non-portable hash domain).
  */
case class Md5SimHashWideExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private val Bits = 60
  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val seen = new java.util.HashSet[String]()
    val ones = new Array[Int](2 * Bits)
    var n = 0
    var i = 0
    val len = s.length
    var ts = -1
    while (i <= len) {
      if (i == len || isWs(s.charAt(i))) {
        if (ts >= 0) {
          val tok = s.substring(ts, i).toLowerCase(java.util.Locale.ROOT)
          if (seen.add(tok)) {
            n += 1
            md.reset()
            val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var vLo = 0L; var vHi = 0L
            var b = 0
            while (b < 8) {
              vLo = (vLo << 8) | (d(b) & 0xffL)
              vHi = (vHi << 8) | (d(b + 8) & 0xffL)
              b += 1
            }
            val hLo = vLo >>> 4 // hex chars 1-15
            val hHi = vHi >>> 4 // hex chars 17-31
            b = 0
            while (b < Bits) {
              ones(b) += ((hLo >>> b) & 1L).toInt
              ones(Bits + b) += ((hHi >>> b) & 1L).toInt
              b += 1
            }
          }
          ts = -1
        }
      } else if (ts < 0) ts = i
      i += 1
    }
    if (n == 0)
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    var lo = 0L; var hi = 0L
    var b = 0
    while (b < Bits) {
      if (2 * ones(b) >= n) lo |= (1L << b)
      if (2 * ones(Bits + b) >= n) hi |= (1L << b)
      b += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(hi, lo)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5SimHashWideExpr =
    copy(child = newChild)
}

object Md5SimHash {
  def md5SimHash(c: Column, bits: Int): Column =
    GraftExpr.column(Md5SimHashExpr(GraftExpr.expr(c), bits))
  def md5SimHashWide(c: Column): Column =
    GraftExpr.column(Md5SimHashWideExpr(GraftExpr.expr(c)))
}
