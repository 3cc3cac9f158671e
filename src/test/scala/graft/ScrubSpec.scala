package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Scrub

class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Plain-JVM golden: apply the same pattern chain outside Spark. */
  private def golden(s: String): String =
    Scrub.Patterns.foldLeft(s) { case (acc, (p, r)) => acc.replaceAll(p, r) }

  /** Deterministic scalacheck sampling (fixed seed, no wall clock). */
  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val samples = Seq(
    "write to john.doe+spam@sub.example.co.uk today",
    "ssn 123-45-6789 phone 555-123-4567 and 555 123 4567",
    "server at 10.0.0.1 and 192.168.255.3:8080",
    "this DAMN thing is idiot-adjacent, what the Hell",
    "nothing to scrub here at all",
    "edge@case.io. trailing 999-99-9999.",
    // trigger-prescan edge cases: lexicon word as substring (prescan
    // fires, \b regex must reject → output unchanged); multibyte text
    // with '@' (byte-level prescan must not corrupt the UTF-8 fast path)
    "damnation is hellish but no standalone word",
    "café@exämple.com naïve 12 Straße",
    ""
  )

  private val scrubbyGen: Gen[String] = Gen.listOfN(60, Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '@', '.', '-', '1', '5', '9'))).map(_.mkString)

  test("scrubCol (Catalyst chain) is byte-identical to plain-JVM golden") {
    val got = samples.toDF("t").select(Scrub.scrubCol(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got.toSeq == samples.map(golden))
  }

  test("scrubFused (custom expression) equals scrubCol byte-for-byte") {
    val df = samples.toDF("t")
    val chain = df.select(Scrub.scrubCol(col("t")).as("r")).collect().map(_.getString(0))
    val fused = df.select(Scrub.scrubFused(col("t")).as("r")).collect().map(_.getString(0))
    assert(chain.toSeq == fused.toSeq)
  }

  test("scrub replaces expected spans") {
    val r = golden("mail a@b.co ssn 123-45-6789 call 555-123-4567 ip 10.0.0.1 damn")
    assert(r == "mail <EMAIL> ssn <SSN> call <PHONE> ip <IP> <TOX>")
  }

  test("property: scrub is idempotent (200 generated strings)") {
    sample(scrubbyGen, 200).foreach { s =>
      val once = golden(s)
      assert(golden(once) == once, s"not idempotent on: $s")
    }
  }

  test("property: fused == chain == golden on generated strings") {
    val ss = sample(scrubbyGen, 200)
    val df = ss.toDF("t")
    val a = df.select(Scrub.scrubCol(col("t"))).collect().map(_.getString(0)).toSeq
    val b = df.select(Scrub.scrubFused(col("t"))).collect().map(_.getString(0)).toSeq
    assert(a == b)
    assert(a == ss.map(golden))
  }
}
