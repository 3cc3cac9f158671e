package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-phase wall times of the pipeline at a given (cpus, n). */
object ProfilePipeline {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 100000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.QualityPipeline._

    if (args.length > 2 && args(2) == "kernel") {
      // single-thread fused-kernel micro-bench (no Spark in the loop)
      val texts = (0L until n).map(i =>
        graft.sources.PagesGen.genRow(i).text).toArray
      val bytes = texts.map(_.length.toLong).sum
      // warmup (JIT + model tables)
      texts.take(2000).foreach(t => graft.functions.DocStats.compute(t, 32))
      val t0 = System.nanoTime()
      var sink = 0L
      texts.foreach { t =>
        sink += graft.functions.DocStats.compute(t, 32).fingerprint
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[prof] kernel: $n docs, ${bytes / 1e6}%.1f MB, $sec%.2f s = " +
        f"${sec * 1e6 / n}%.1f us/doc, ${bytes / sec / 1e6}%.1f MB/s (sink=$sink)")
      spark.stop(); return
    }
    if (args.length > 2 && args(2) == "rep") {
      // single-thread Gopher-repetition kernel micro-bench (opt-in second
      // scan column — this is the per-doc price of the battery)
      val texts = (0L until n).map(i =>
        graft.sources.PagesGen.genRow(i).text).toArray
      val bytes = texts.map(_.length.toLong).sum
      texts.take(2000).foreach(t => graft.functions.Repetition.compute(t))
      val t0 = System.nanoTime()
      var sink = 0.0
      texts.foreach { t =>
        sink += graft.functions.Repetition.compute(t).top2
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[prof] rep: $n docs, ${bytes / 1e6}%.1f MB, $sec%.2f s = " +
        f"${sec * 1e6 / n}%.1f us/doc, ${bytes / sec / 1e6}%.1f MB/s (sink=$sink%.1f)")
      spark.stop(); return
    }
    if (args.length > 2 && args(2) == "expr") {
      // EXPRESSION-BOUNDARY micro-bench: the same kernel as "kernel" mode
      // but driven through the Catalyst expression inside a Spark plan —
      // the delta vs kernel mode is the per-row expression dispatch cost
      // (CodegenFallback boxed call vs doGenCode static call). Summing a
      // struct field forces the full kernel per row.
      import org.apache.spark.sql.Encoders
      val texts = (0L until n).map(i => graft.sources.PagesGen.genRow(i).text)
      val df = spark.createDataset(texts)(Encoders.STRING).toDF("text")
        .repartition(cpus).cache()
      df.count()
      val c = graft.functions.DocStats.docStats(col("text"), 32, 8, 4)
      def run(): Long = df.select((c.getField("fingerprint") % 1000000L).as("f"))
        .agg(sum(col("f"))).head().getLong(0)
      run(); run() // warmup (codegen + JIT)
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[prof] expr: $n docs x ${times.size} reps, median " +
        f"${times(times.size / 2)}%.3f s = ${times(times.size / 2) * 1e6 / n}%.1f us/doc " +
        f"(min ${times.head}%.3f max ${times.last}%.3f)")
      spark.stop(); return
    }
    if (args.length > 2 && args(2) == "nocache") {
      // run() dataflow with NO persistence — cache-contention bisect
      val pages = graft.sources.PagesGen.generate(spark, n, cpus).toDF()
      t("gen+cache")(pages.cache().count())
      val feat = features(pages)
      val v1 = pass1(feat)
      val dropped1 = v1.select("url").distinct()
      val survivors = feat.join(dropped1, Seq("url"), "left_anti")
      val statCols = survivors.select("url", "lang", "n_chars", "n_words", "perplexity")
      t("stats aggs (no cache)") {
        graft.profile.Profiler.profile(statCols.drop("url"))
        graft.profile.Stats.moments(statCols, col("n_chars"))
        graft.profile.Stats.moments(statCols, col("n_words"))
      }
      spark.stop(); return
    }
    if (args.length > 2 && args(2) == "full") {
      // mimic Bench.pipelineDocsPerSec exactly, with phase splits
      val pages = graft.sources.PagesGen.generate(spark, n, cpus).toDF()
      t("gen+cache")(pages.cache().count())
      val res = t("run() call (eager stats)")(run(pages))
      t("kept write")(res.kept.write.mode("overwrite").format("noop").save())
      t("verdicts write")(res.verdicts.write.mode("overwrite").format("noop").save())
      spark.stop(); return
    }

    val pages = graft.sources.PagesGen.generate(spark, n, cpus).toDF()
    t("gen+cache")(pages.cache().count())
    val feat = features(pages).cache()
    t("features materialize")(feat.count())
    t("heuristics count")(heuristicVerdicts(feat, defaultConfig).count())
    t("exactDup count")(exactDupVerdicts(feat).count())
    t("nearDup count")(nearDupVerdicts(feat, defaultConfig).count())
    val v1 = pass1(feat)
    val dropped1 = t("pass1+dropped1 cache")(
      v1.select("url").distinct().cache())
    t("dropped1 count")(dropped1.count())
    val survivors = feat.join(dropped1, Seq("url"), "left_anti")
    val statCols = survivors.select("url", "lang", "n_chars", "n_words", "perplexity").cache()
    t("statCols materialize")(statCols.count())
    t("profiler")(graft.profile.Profiler.profile(statCols.drop("url")))
    t("moments n_chars")(graft.profile.Stats.moments(statCols, col("n_chars")))
    t("moments n_words")(graft.profile.Stats.moments(statCols, col("n_words")))
    t("tendency agg")(graft.rules.Rules.tendency(statCols, col("url"),
      col("n_words"), col("n_chars"), "a", "b"))
    val v2 = pass2(survivors)
    t("v2 count")(v2.count())
    val droppedAll = dropped1.select("url")
      .unionByName(v2.select("url")).distinct()
    val kept = pages.join(droppedAll, Seq("url"), "left_anti")
      .select(col("url"), graft.functions.Scrub.scrubCol(col("text")).as("s"))
    t("kept write")(kept.write.mode("overwrite").format("noop").save())
    t("verdicts write")(v1.unionByName(v2).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
