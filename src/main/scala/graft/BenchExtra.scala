package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage cpu/wall accounting for the default pipeline at
  * a given parallelism — the recorded-artifact form of the "engine adds
  * no serial bottleneck" claim (VERDICT r5 Next #8). `graft.Bench` is a
  * frozen measurement harness, so the extra telemetry lives here.
  *
  *   SPARK_GRAFT_BENCH_DOCS=400000 sbt "runMain graft.BenchExtra"
  *
  * Prints one JSON line: wall, docs/s, Σ executor task-run time, the
  * implied core-utilization (Σ run time / (wall × cores)), and the top
  * stages by task time. Utilization near 1.0 at 32 threads means the
  * work is cluster-parallel for the whole wall — driver-side
  * coordination (collects, planning, checkpoint barriers) is what eats
  * the difference.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: codegen + input parquet write + model init (untimed)
    Bench.pipelineDocsPerSec(spark, n)

    final case class Row(id: Int, name: String, tasks: Int,
                         runMs: Long, cpuMs: Long)
    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        rows.synchronized {
          rows += Row(si.stageId,
            si.name.takeWhile(_ != '\n').take(60), si.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000L)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (dps, sec) = Bench.pipelineDocsPerSec(spark, n)
    // listenerBus is private[spark]; a short sleep drains the queued
    // stage-completed events (dev tool — precision is not the point)
    Thread.sleep(2000)
    val runMs = rows.map(_.runMs).sum
    val cpuMs = rows.map(_.cpuMs).sum
    val util = runMs / (sec * 1000.0 * cpus)
    val cpuUtil = cpuMs / (sec * 1000.0 * cpus)
    val top = rows.sortBy(-_.runMs).take(8).map(r =>
      s"""{"stage":${r.id},"tasks":${r.tasks},"run_ms":${r.runMs},""" +
        s""""cpu_ms":${r.cpuMs},"name":"${r.name.replace("\"", "'")}"}""")
      .mkString("[", ",", "]")
    println(f"""{"metric":"pipeline_stage_utilization","docs":$n,""" +
      f""""cpus":$cpus,"wall_sec":$sec%.3f,"docs_per_sec":${dps.toInt},""" +
      f""""stages":${rows.length},"sum_task_run_ms":$runMs,""" +
      f""""sum_task_cpu_ms":$cpuMs,"run_utilization":$util%.3f,""" +
      f""""cpu_utilization":$cpuUtil%.3f,"top_stages":$top}""")
    spark.stop()
  }
}
