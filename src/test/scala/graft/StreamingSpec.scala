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

  test("flatMapGroupsWithState sessionization equals the batch twin once the watermark closes every session") {
    import org.apache.spark.sql.types.LongType
    val dir = "/root/testdata/sf0.001"
    val batchEvents = spark.read.parquet(s"$dir/events.parquet")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("00-events.parquet"))
    // two sentinel batches (user_id = -1, far future) push the watermark
    // past every real session's last-event + gap: batch 2's sentinel
    // advances the watermark, batch 3's sentinel TRIGGERS the timeouts
    // (timeout processing uses the watermark set by the previous batch) —
    // no reliance on no-data micro-batches. maxFilesPerTrigger=1 keeps
    // the three files in three triggers.
    val maxUs = batchEvents
      .agg(org.apache.spark.sql.functions.max(
        unix_micros(col("ts").cast("timestamp")))).head().getLong(0)
    val tsType = batchEvents.schema("ts").dataType
    def sentinel(offsetUs: Long, evId: Long) = batchEvents.limit(1)
      .withColumn("user_id", lit(-1L).cast(batchEvents.schema("user_id").dataType))
      .withColumn("event_id", lit(evId).cast(batchEvents.schema("event_id").dataType))
      .withColumn("ts", timestamp_micros(lit(maxUs + offsetUs)).cast(tsType))
    Seq((86400000000L * 100, 999000001L, "01"), (86400000000L * 200, 999000002L, "02"))
      .foreach { case (off, id, tag) =>
        Thread.sleep(1100) // distinct mtimes => stable file-batch order
        sentinel(off, id).repartition(1).write.mode("append")
          .parquet(streamDir.toString)
        val _ = tag
      }
    val q = graft.streaming.EventStream.sessionizeStream(spark,
      streamDir.toString, batchEvents, "sess_out", 30, maxFilesPerTrigger = Some(1))
    q.processAllAvailable()
    q.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    }.toMap
    val streamed = keyed(spark.sql(
      """SELECT user_id, session_no, session_start_us, session_end_us,
        | n_events, sum_value FROM sess_out WHERE user_id >= 0""".stripMargin)
      .collect())
    val batch = keyed(graft.streaming.EventStream.sessionizeBatch(batchEvents)
      .select(col("user_id").cast(LongType), col("session_no"),
        col("session_start_us"), col("session_end_us"), col("n_events"),
        col("sum_value"))
      .collect())
    assert(streamed.nonEmpty)
    assert(streamed.keySet == batch.keySet,
      s"session keys differ: stream-only=${(streamed.keySet -- batch.keySet).take(3)} " +
        s"batch-only=${(batch.keySet -- streamed.keySet).take(3)}")
    streamed.foreach { case (k, (s1, e1, n1, v1)) =>
      val (s2, e2, n2, v2) = batch(k)
      assert(s1 == s2 && e1 == e2 && n1 == n2, s"bounds/count differ at $k")
      // double addition order differs (incremental vs partial agg) —
      // compare post-round values with an ulp-tolerant epsilon
      assert(math.abs(v1 - v2) < 1e-6, s"sum differs at $k: $v1 vs $v2")
    }
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
