package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike

/** URL-level features and rules for webtext curation (RefinedWeb,
  * Penedo et al. 2023 §3.1 filters on the URL before ever reading the
  * page body: blocklists, keyword scoring, length/digit heuristics).
  * Everything here is a pure Column expression — zero shuffle, fully
  * codegen'd, evaluated in the same narrow pass as the text features.
  *
  * DuckDB oracle parity: host extraction and digit counting use only
  * regexp functions with identical semantics in both engines (same
  * pattern, same `regexp_replace` global flag behavior via Spark's
  * default-global replace vs DuckDB's 'g' flag — mirrored in the
  * `dq_url_rules` SQL).
  */
object UrlFns {

  /** Host pattern, shared verbatim with the DuckDB twins (single source
    * of truth — Java-regex ∩ RE2 subset). The optional `[^/?#]*@` skips
    * RFC-3986 userinfo: without it `https://x@evil.com/` extracts host
    * `x@evil.com`, so a blocklist entry or per-host cap is trivially
    * bypassed by prefixing junk userinfo (the authority's host starts
    * after the LAST `@`, which the greedy prefix matches). Port and
    * path/query/fragment are excluded as before.
    */
  val HostRe: String = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/:?#@]+)"

  /** Hostname of an absolute URL: the authority (userinfo stripped) up
    * to the first `/`, `:`, `?` or `#`; null when the string has no
    * `scheme://` prefix. regexp_extract (not `parse_url`) so the DuckDB
    * twin is the SAME pattern — and it codegens, where parse_url is a
    * non-codegen UDF shape in some Spark versions.
    */
  def host(url: Column): Column =
    nullif(regexp_extract(url, HostRe, 1), lit(""))

  /** Fraction of URL characters that are ASCII digits (spam/session-id
    * signal); null on empty/null url.
    */
  def digitFrac(url: Column): Column =
    ((length(url) - length(regexp_replace(url, "[0-9]", "")))
      .cast(DoubleType) / nullif(length(url), lit(0))).cast(DoubleType)

  /** True when any of `keywords` occurs in the lowercased URL. */
  def containsAny(url: Column, keywords: Seq[String]): Column =
    keywords.map(k => contains(lower(url), lit(k)))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Aggregate: the K-th smallest value of a LONG column (= max of the
    * K smallest), null on an empty group. The per-host document-cap
    * primitive: `hash <= kth_smallest(hash, K)` keeps a deterministic
    * K-sized subset of each group without sorting the group.
    *
    * Scale shape — the reason this is a custom TypedImperativeAggregate
    * and not `slice(sort_array(collect_list(h)), k, 1)`: collect_list
    * materialises EVERY row of the group in one aggregation buffer
    * (a 10⁸-page host = an 800 MB buffer = an executor OOM), while this
    * buffer is a bounded max-heap of K longs whatever the group size.
    * Partial aggregation runs map-side; the shuffle carries one ≤ K-long
    * heap per (host, map partition); merge is O(K log K).
    */
  def kthSmallest(c: Column, k: Int): Column =
    GraftExpr.column(
      KthSmallestLong(GraftExpr.expr(c), k).toAggregateExpression())
}

/** Bounded max-heap of the k smallest longs offered. `top` (the heap
  * max) is the k-th smallest seen when `size >= k`, else the max of all.
  */
final class LongMinKHeap(val k: Int) {
  require(k >= 1, s"k must be >= 1, got $k")
  private[functions] val a = new Array[Long](k)
  private[functions] var n = 0
  def size: Int = n
  def top: Long = a(0)
  def offer(v: Long): Unit = {
    if (n < k) {
      var i = n; a(i) = v; n += 1
      while (i > 0 && a((i - 1) / 2) < a(i)) {
        val p = (i - 1) / 2; val t = a(p); a(p) = a(i); a(i) = t; i = p
      }
    } else if (v < a(0)) {
      a(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && a(l) > a(m)) m = l
        if (r < n && a(r) > a(m)) m = r
        if (m == i) done = true
        else { val t = a(m); a(m) = a(i); a(i) = t; i = m }
      }
    }
  }
}

/** `kth_smallest(longCol, k)` — see [[UrlFns.kthSmallest]]. */
case class KthSmallestLong(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongMinKHeap] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kth_smallest"

  override def createAggregationBuffer(): LongMinKHeap = new LongMinKHeap(k)

  override def update(buf: LongMinKHeap, input: InternalRow): LongMinKHeap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongMinKHeap, other: LongMinKHeap): LongMinKHeap = {
    var i = 0
    while (i < other.n) { buf.offer(other.a(i)); i += 1 }
    buf
  }

  override def eval(buf: LongMinKHeap): Any =
    if (buf.n == 0) null else buf.top

  override def serialize(buf: LongMinKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongMinKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val heap = new LongMinKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { heap.offer(bb.getLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): KthSmallestLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KthSmallestLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KthSmallestLong =
    copy(child = newChild)
}
