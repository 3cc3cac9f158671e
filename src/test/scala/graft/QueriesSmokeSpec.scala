package graft

import org.scalatest.funsuite.AnyFunSuite

class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("entry: flagship pipeline returns verdicts") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("url", "rule", "keep", "score", "detail"))
  }

  test("every registered query runs at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      withClue(name) { assert(n >= 0) }
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
