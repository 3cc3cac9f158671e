package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-Spark-job wall breakdown of one named query invocation —
  * answers "where do the ~1 s of a tiny-input query go" (stage overhead vs
  * plan compile vs real work). Not part of the bench surface.
  *
  *   sbt "runMain graft.ProfileEmb emb_knn 3"
  */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "emb_knn"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, String.valueOf(js.properties.getProperty("spark.job.description"))))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        println(f"[job] ${je.jobId}%3d ${(je.time - t0) / 1e3}%7.3f s  $desc")
      }
    })
    // warmup
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => }
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      println(s"=== rep $i of $name ===")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val tExec = (System.nanoTime() - t1) / 1e9
      println(f"[rep] build(eager jobs incl.)=$tBuild%.3f s  execute=$tExec%.3f s  total=${tBuild + tExec}%.3f s")
    }
    spark.stop()
  }
}
