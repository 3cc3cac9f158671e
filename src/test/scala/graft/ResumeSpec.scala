package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.pipeline.Checkpointer
import graft.sources.PagesGen

class ResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("kill-and-resume: committed partitions skipped, outputs identical") {
    val pages = PagesGen.generate(spark, 600, 4).toDF()
      // keep the partition count small for the test: 3 distinct days
      .filter(org.apache.spark.sql.functions.col("warc_ts")
        .cast("date").cast("string").isin("2024-01-01", "2024-01-02", "2024-01-03"))
      .cache()
    val cleanRoot = Files.createTempDirectory("graft-ckpt-clean").toString
    val crashRoot = Files.createTempDirectory("graft-ckpt-crash").toString

    // straight run
    val straight = Checkpointer.run(spark, pages, cleanRoot)
    assert(straight.forall(!_.skipped))

    // crashed run: fail at the 3rd partition
    val days = straight.map(_.partition).sorted
    val boom = intercept[RuntimeException] {
      Checkpointer.run(spark, pages, crashRoot, failAtPartition = Some(days(2)))
    }
    assert(boom.getMessage.contains("injected failure"))

    // resume: first two partitions must be SKIPPED, not recomputed
    val resumed = Checkpointer.run(spark, pages, crashRoot)
    val skipped = resumed.filter(_.skipped).map(_.partition).toSet
    assert(skipped == Set(days(0), days(1)),
      s"expected first two partitions skipped, got $skipped")

    // outputs identical to the straight run
    def keptSet(root: String) = Checkpointer.readKept(spark, root)
      .select("url", "scrubbed_text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    def verdictSet(root: String) = Checkpointer.readVerdicts(spark, root)
      .select("url", "rule").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(keptSet(crashRoot) == keptSet(cleanRoot))
    assert(verdictSet(crashRoot) == verdictSet(cleanRoot))

    // lineage table has one row per partition with sane counts
    val lineage = Checkpointer.readLineage(spark, cleanRoot).collect()
    assert(lineage.length == days.length)
    assert(lineage.forall(r => r.getAs[Long]("n_docs") > 0))
  }

  test("stats-scope CONTRACT: checkpointer verdicts == per-day pipeline runs " +
    "(pass-2 statistics are computed within each day partition)") {
    // The documented contract (README / Checkpointer scaladoc): corpus
    // statistics for pass-2 gates are PER-PARTITION, so a resumed run is
    // bit-identical to a straight run regardless of where it crashed —
    // the alternative (whole-corpus stats) would make every partition's
    // verdicts depend on every other partition and break resume-without-
    // recompute. This pins the choice explicitly.
    import org.apache.spark.sql.functions._
    val pages = PagesGen.generate(spark, 400, 4).toDF()
      .withColumn("pdate", to_date(col("warc_ts")).cast("string"))
      .filter(col("pdate").isin("2024-01-04", "2024-01-05"))
      .cache()
    val root = Files.createTempDirectory("graft-ckpt-contract").toString
    Checkpointer.run(spark, pages.drop("pdate"), root)
    val fromCkpt = Checkpointer.readVerdicts(spark, root)
      .select("url", "rule").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val perDay = Seq("2024-01-04", "2024-01-05").map { d =>
      graft.pipeline.QualityPipeline.run(
          pages.filter(col("pdate") === d).drop("pdate"))
        .verdicts.select("url", "rule").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }.reduce(_ union _)
    assert(fromCkpt == perDay,
      "checkpointer verdicts drifted from the per-day pipeline contract")
  }
}
