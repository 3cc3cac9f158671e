package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CellEmbed
import graft.rules.Rules

/** C10 ([[graft.functions.CellEmbed]]) and O4 ([[Rules.pushBadIndex]])
  * — the two reference dead-code items, implemented for surface
  * completeness. No float-exact claims (embedding training is
  * order-sensitive); pinned instead: vocabulary coverage, dims,
  * finiteness, the cell → vector mapping, and O4's union semantics.
  */
class CellEmbedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (0L until 300L)
    .map(i => (i, s"lang${i % 5}", if (i % 7 == 3) null else s"src${i % 3}"))
    .toDF("id", "lang", "source")

  test("vocabVectors: full vocab incl. Nan fill, dim, finite floats") {
    val v = CellEmbed.vocabVectors(df, Seq("lang", "source"), "id",
      dim = 8, chunk = 64)
    val rows = v.collect()
    val words = rows.map(_.getString(0)).toSet
    assert(words == (0 until 5).map(i => s"lang$i").toSet ++
      (0 until 3).map(i => s"src$i").toSet + "Nan")
    assert(rows.forall(_.getSeq[Float](1).size == 8))
    assert(rows.forall(_.getSeq[Float](1).forall(f => !f.isNaN && !f.isInfinite)))
  }

  test("transformCells: every cell maps to its vocabulary vector") {
    val out = CellEmbed.transformCells(df, Seq("lang"), "id",
      dim = 4, chunk = 64)
    assert(out.columns.toSeq == Seq("id", "lang", "source"))
    val got = out.select("lang").collect()
    assert(got.length == 300 && got.forall(_.getSeq[Float](0).size == 4))
    // same cell value ⇒ same vector (a mapping, not a re-embedding)
    val distinctVecs = out
      .select(col("lang")).distinct().count()
    assert(distinctVecs == 5)
  }

  test("pushBadIndex: appended urls become DROP verdicts; union dedupes") {
    val verdicts = Rules.exactDup(
      Seq(("u1", 1L), ("u2", 1L)).toDF("url", "h"), col("url"), col("h"))
    val pushed = Rules.pushBadIndex(verdicts,
      Seq("u9", "u2").toDF("url"))
    val urls = pushed.select("url").as[String].collect().toSeq
    assert(urls.sorted == Seq("u2", "u2", "u9")) // raw append, like the ref list
    assert(pushed.filter(col("rule") === "external").count() == 2)
    // the reference's bad_index property dedupes via set(): distinct url
    assert(pushed.select("url").distinct().count() == 2)
  }
}
