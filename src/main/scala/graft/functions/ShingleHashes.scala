package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingle hashes of normalised text, fused.
  *
  * Used as a JOIN KEY for n-gram Jaccard: only equality consistency
  * matters (two equal shingle strings hash equal; FNV-64 collisions are
  * negligible at corpus scale), so the composed pipeline — normalise →
  * tokenize → per-shingle `concat_ws(slice(...))` string building →
  * `array_distinct` — collapses to one allocation-light pass. Shingle
  * hash = FNV over the token FNVs (order-sensitive). Fewer than k tokens
  * ⇒ the distinct token hashes themselves (matching the composed/oracle
  * fallback `ELSE toks`).
  */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    // token FNVs over the lowercased text (normalisation = lowercase +
    // whitespace-delimited scan; collapsing is implicit in tokenisation)
    val tokHashes = new java.util.ArrayList[java.lang.Long](64)
    var ts = -1
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i <= n) {
      if (i == n || isWs(s.charAt(i))) {
        if (ts >= 0) { tokHashes.add(h); ts = -1; h = 0xcbf29ce484222325L }
      } else {
        if (ts < 0) ts = i
        h ^= Character.toLowerCase(s.charAt(i)); h *= 0x100000001b3L
      }
      i += 1
    }
    val nTok = tokHashes.size()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (nTok >= k) {
      var a = 0
      while (a + k <= nTok) {
        var sh = 0xcbf29ce484222325L
        var j = 0
        while (j < k) { sh ^= tokHashes.get(a + j); sh *= 0x100000001b3L; j += 1 }
        out.add(sh)
        a += 1
      }
    } else {
      var a = 0
      while (a < nTok) { out.add(tokHashes.get(a)); a += 1 }
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashes {
  def shingleHashes(c: Column, k: Int): Column =
    GraftExpr.column(ShingleHashesExpr(GraftExpr.expr(c), k))
}
