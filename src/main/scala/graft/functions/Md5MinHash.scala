package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash over md5-hashed char shingles — byte-identical semantics to
  * the SQL-oracle formula
  * `min((a * (('0x'||substr(md5(shingle),1,15))::BIGINT % P) + b) % P)`
  * but evaluated in one tight loop with a reused MessageDigest, instead
  * of k interpreted array-transforms each re-hashing every shingle
  * (observed 120 s → ~1 s on the sf0.1 corpus).
  */
case class Md5MinHashExpr(child: Expression, shingleLen: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val params = Hashing.hashParamsArray(k)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val sig = new Array[Any](k)
    if (n < shingleLen) return new GenericArrayData(sig) // all nulls
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // byte-per-char fast path only valid for pure-ASCII strings
    val ascii = {
      var i = 0; var ok = true
      while (i < n && ok) { if (s.charAt(i) >= 0x80) ok = false; i += 1 }
      ok
    }
    val allBytes = if (ascii) s.getBytes(java.nio.charset.StandardCharsets.UTF_8) else null
    var i = 0
    while (i + shingleLen <= n) {
      md.reset()
      if (ascii) md.update(allBytes, i, shingleLen)
      else md.update(s.substring(i, i + shingleLen)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      // first 15 hex chars = first 60 bits: 8 bytes big-endian >>> 4
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val h = (v >>> 4) % Hashing.P
      var p = 0
      while (p < k) {
        val x = (params(p)(0) * h + params(p)(1)) % Hashing.P
        if (x < mins(p)) mins(p) = x
        p += 1
      }
      i += 1
    }
    var p = 0
    while (p < k) { sig(p) = mins(p); p += 1 }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashExpr =
    copy(child = newChild)
}

object Md5MinHash {
  def md5MinHash(c: Column, shingleLen: Int, k: Int): Column =
    GraftExpr.column(Md5MinHashExpr(GraftExpr.expr(c), shingleLen, k))
}
