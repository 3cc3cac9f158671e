package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike

/** KNN imputation of missing numeric values — the reference's C8
  * (`/root/reference/src/improve_data_quality.py:459-480`:
  * `sklearn.KNNImputer(n_neighbors=10, weights="uniform")` over the
  * deduplicated numeric frame, feeding LOF). Re-expressed distributed:
  *
  *  - metric = sklearn's `nan_euclidean`: over the coordinates PRESENT
  *    IN BOTH rows, `dist² = (n_features / n_shared) · Σ (xᵢ − yᵢ)²`;
  *    pairs sharing no coordinate are not neighbors.
  *  - donors for a receiver's missing column c = rows with c present
  *    (other rows with their own gaps still donate — their missing
  *    coords simply drop out of the distance), the receiver excluded.
  *  - imputed value = uniform mean of the k nearest donors' c; fewer
  *    than k donors ⇒ mean of those available; zero ⇒ the column's
  *    observed mean (sklearn's fallback).
  *  - tie-break: sklearn's argpartition leaves equal-distance order
  *    UNSPECIFIED; this operator pins (dist, donor key) ascending so
  *    results are deterministic and oracle-checkable. With distinct
  *    distances it equals sklearn exactly.
  *
  * Scale shape (the reason this is not a crossJoin-and-Window):
  *  - receivers (rows with ≥ 1 missing value) are BROADCAST — web-scale
  *    missingness on derived features is a small fraction, and the
  *    candidate pass is then ONE narrow scan of the donors: a
  *    BroadcastNestedLoopJoin, O(n · r) work with zero corpus shuffle,
  *    the [[graft.embed.Ann.bruteForceTopK]] relationship (the exact
  *    baseline; an IVF-bucketed variant is the scale path when r
  *    explodes — see `Ann.ivfTopK`'s cell-probe pattern).
  *  - top-k per (receiver, column) via [[KnnMeanK]], a
  *    `TypedImperativeAggregate` whose buffer is a BOUNDED max-heap of
  *    k (dist, donor, value) triples — map-side partials carry ≤ k
  *    triples per group per partition whatever the donor count, the
  *    `UrlFns.kthSmallest` shape (never `collect_list` + sort: that
  *    materialises every donor in one buffer).
  *
  * Exact-arithmetic note (oracle parity): with integer-valued features
  * every squared diff, partial sum and `· n_features / n_shared`
  * product is exactly representable, so Spark and DuckDB compute
  * IDENTICAL doubles — ordering, means and 6-dp roundings cannot
  * diverge (see the `dq_knn_impute` oracle).
  *
  * The engine's own pipeline never needs this operator: its numeric
  * features are derived total functions of text (DocStats), never
  * null. The reference needed C8 because its input tabular numerics
  * carried NaNs. It ships as a standalone surface operator; callers
  * dedup first to mirror the reference (`_is_duplicated` at :471).
  */
object KnnImpute {

  /** Mean of the k nearest donors' value per group, ordered by
    * (dist, donorKey) ascending; null on an empty group.
    */
  def knnMean(dist: Column, donorKey: Column, value: Column, k: Int): Column =
    GraftExpr.column(
      KnnMeanK(GraftExpr.expr(dist), GraftExpr.expr(donorKey),
        GraftExpr.expr(value), k).toAggregateExpression())

  /** One row per missing cell: (__k, col, imputed) — `imputed` rounded
    * to 6 dp. `key` must be LONG (the deterministic tie-break).
    * `features` are numeric columns (cast to double internally).
    */
  def imputeCells(df: DataFrame, key: Column, features: Seq[String],
                  k: Int = 10): DataFrame = {
    require(features.nonEmpty, "need at least one feature column")
    require(k >= 1, s"k must be >= 1, got $k")
    val f = df.select(
      key.cast(LongType).as("__k") +:
        features.map(c => col(c).cast(DoubleType).as(c)): _*)
    val recv = f.filter(features.map(col(_).isNull).reduce(_ || _))
      .select(col("__k").as("__rk") +:
        features.map(c => col(c).as(s"__r_$c")): _*)
    val miss = recv.select(col("__rk"), explode(filter(
      array(features.map(c =>
        when(col(s"__r_$c").isNull, lit(c))): _*),
      x => x.isNotNull)).as("__c"))
    // observed column means — the no-donor fallback (tiny scalar agg)
    val meansRow = f.agg(
      avg(col(features.head)).as(features.head),
      features.tail.map(c => avg(col(c)).as(c)): _*).head()
    val meansMap = map(features.flatMap(c => Seq(lit(c),
      lit(if (meansRow.isNullAt(meansRow.fieldIndex(c))) null
          else meansRow.getDouble(meansRow.fieldIndex(c))))): _*)
    val nShared = features.map(c =>
      when(col(c).isNotNull && col(s"__r_$c").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val sqSum = features.map(c =>
      when(col(c).isNotNull && col(s"__r_$c").isNotNull,
        (col(c) - col(s"__r_$c")) * (col(c) - col(s"__r_$c")))
        .otherwise(lit(0d))).reduce(_ + _)
    val valueByName = element_at(
      map(features.flatMap(c => Seq(lit(c), col(c))): _*), col("__c"))
    val knn = f.crossJoin(broadcast(recv))
      .filter(col("__k") =!= col("__rk"))
      .withColumn("__ns", nShared).withColumn("__ss", sqSum)
      .filter(col("__ns") > 0)
      .join(broadcast(miss), Seq("__rk"))
      .withColumn("__val", valueByName)
      .filter(col("__val").isNotNull)
      .withColumn("__wd",
        col("__ss") * lit(features.size.toDouble) / col("__ns"))
      .groupBy("__rk", "__c")
      .agg(knnMean(col("__wd"), col("__k"), col("__val"), k).as("__knn"))
    miss.join(knn, Seq("__rk", "__c"), "left")
      .select(col("__rk").as("__k"), col("__c").as("col"),
        round(coalesce(col("__knn"), element_at(meansMap, col("__c"))), 6)
          .as("imputed"))
  }

  /** The sklearn return shape: the input frame with every missing
    * feature cell filled (6-dp). Non-feature columns pass through.
    */
  def impute(df: DataFrame, key: Column, features: Seq[String],
             k: Int = 10): DataFrame = {
    val patch = imputeCells(df, key, features, k)
      .groupBy(col("__k"))
      .agg(map_from_entries(collect_list(struct(col("col"), col("imputed"))))
        .as("__patch"))
    df.withColumn("__k", key.cast(LongType))
      .join(broadcast(patch), Seq("__k"), "left")
      .select(df.columns.map(c =>
        (if (features.contains(c))
           coalesce(col(c).cast(DoubleType), element_at(col("__patch"), lit(c)))
         else col(c)).as(c)): _*)
  }
}

/** Bounded max-heap of the k smallest (dist, id) pairs with a payload
  * value each; lexicographic (dist, id) order makes ties deterministic.
  */
final class KnnMeanHeap(val k: Int) {
  private[functions] val d = new Array[Double](k)
  private[functions] val id = new Array[Long](k)
  private[functions] val v = new Array[Double](k)
  private[functions] var n = 0
  @inline private def gt(i: Int, j: Int): Boolean =
    d(i) > d(j) || (d(i) == d(j) && id(i) > id(j))
  @inline private def gtv(dd: Double, ii: Long, j: Int): Boolean =
    dd > d(j) || (dd == d(j) && ii > id(j))
  @inline private def swap(i: Int, j: Int): Unit = {
    val td = d(i); d(i) = d(j); d(j) = td
    val ti = id(i); id(i) = id(j); id(j) = ti
    val tv = v(i); v(i) = v(j); v(j) = tv
  }
  def offer(dd: Double, ii: Long, vv: Double): Unit = {
    if (n < k) {
      var i = n; d(i) = dd; id(i) = ii; v(i) = vv; n += 1
      while (i > 0 && gt(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    } else if (!gtv(dd, ii, 0)) {
      d(0) = dd; id(0) = ii; v(0) = vv
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && gt(l, m)) m = l
        if (r < n && gt(r, m)) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }
  /** Uniform mean of the kept values, summed in (dist, donor id) order.
    * The heap-array layout depends on insertion/merge order (partition
    * layout!), so a raw array-order sum is partition-dependent for
    * NON-integral values — the selected donor SET is deterministic, but
    * float addition isn't associative. Sorting the ≤ k kept triples
    * before summing makes the mean a pure function of the set (k ≤ ~10;
    * cost is noise). Integral values were exact either way — which is
    * why the oracle, built on integer features, never caught this.
    */
  def mean: Double = {
    val idx = Array.range(0, n)
    // insertion sort by (dist, id) — n ≤ k, tiny
    var i = 1
    while (i < n) {
      val key = idx(i)
      var j = i - 1
      while (j >= 0 && (d(idx(j)) > d(key) ||
          (d(idx(j)) == d(key) && id(idx(j)) > id(key)))) {
        idx(j + 1) = idx(j); j -= 1
      }
      idx(j + 1) = key
      i += 1
    }
    var s = 0d
    i = 0
    while (i < n) { s += v(idx(i)); i += 1 }
    s / n
  }
}

/** `knn_mean(dist, donorKey, value, k)` — see [[KnnImpute.knnMean]]. */
case class KnnMeanK(
    first: Expression, second: Expression, third: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KnnMeanHeap] with TernaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "knn_mean"

  override def createAggregationBuffer(): KnnMeanHeap = new KnnMeanHeap(k)

  override def update(buf: KnnMeanHeap, input: InternalRow): KnnMeanHeap = {
    val dd = first.eval(input); val ii = second.eval(input)
    val vv = third.eval(input)
    if (dd != null && ii != null && vv != null)
      buf.offer(dd.asInstanceOf[Double], ii.asInstanceOf[Long],
        vv.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KnnMeanHeap, other: KnnMeanHeap): KnnMeanHeap = {
    var i = 0
    while (i < other.n) { buf.offer(other.d(i), other.id(i), other.v(i)); i += 1 }
    buf
  }

  override def eval(buf: KnnMeanHeap): Any =
    if (buf.n == 0) null else buf.mean

  override def serialize(buf: KnnMeanHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 24 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.d(i)); bb.putLong(buf.id(i)); bb.putDouble(buf.v(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KnnMeanHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val heap = new KnnMeanHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { heap.offer(bb.getDouble(), bb.getLong(), bb.getDouble()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): KnnMeanK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KnnMeanK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): KnnMeanK =
    copy(first = f, second = s, third = t)
}
