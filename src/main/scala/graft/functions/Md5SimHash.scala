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

object Md5SimHash {
  def md5SimHash(c: Column, bits: Int): Column =
    GraftExpr.column(Md5SimHashExpr(GraftExpr.expr(c), bits))
}
