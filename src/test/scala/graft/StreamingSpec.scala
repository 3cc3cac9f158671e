package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals its batch twin on the events table") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
    // file stream sources consume directories
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.windowedCountsStream(spark, streamDir.toString,
      batchEvents, "stream_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      """SELECT window.start AS window_start, event_type, n, round(sum_value, 4) AS sum_value
        |FROM stream_out""".stripMargin)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = EventStream.windowedCountsBatch(
        batchEvents.withColumn("ts", col("ts").cast("timestamp")))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
  }

  test("streaming heuristic verdicts equal the batch pass-1 heuristics") {
    import org.apache.spark.sql.SaveMode
    val pages = graft.sources.PagesGen.generate(spark, 500, 4).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft-pages-stream").toString
    pages.write.mode(SaveMode.Overwrite).parquet(dir)
    val q = EventStream.heuristicVerdictStream(spark, dir, "page_verdicts")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT url, rule FROM page_verdicts")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batchPages = spark.read.parquet(dir)
    val batch = graft.pipeline.QualityPipeline.heuristicVerdicts(
        graft.pipeline.QualityPipeline.features(batchPages),
        graft.pipeline.QualityPipeline.defaultConfig)
      .select("url", "rule")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
