package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print physical-plan shape stats for the pipeline outputs —
  * used to hunt duplicated subtrees / missed cache hits.
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = graft.sources.PagesGen.generate(spark, 2000, 4).toDF().cache()
    pages.count()
    val res = graft.pipeline.QualityPipeline.run(pages)
    def shape(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(p).size
      println(s"=== $name: len=${p.length} scans=${c("Scan ExistingRDD")} " +
        s"inmem=${c("InMemoryTableScan")} union=${c("Union")} " +
        s"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} " +
        s"exch=${c("Exchange")}")
    }
    shape("verdicts", res.verdicts)
    shape("kept", res.kept)
    // cache substitution check: after withCachedData, the v1 union branch
    // should be ONE InMemoryRelation, not the full pass-1 tree
    def top(name: String, p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            maxDepth: Int): Unit = {
      println(s"=== $name withCachedData (top $maxDepth levels):")
      def go(q: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, d: Int): Unit = {
        println(("  " * d) + q.nodeName + " out=" + q.output.map(_.name).take(4).mkString(","))
        if (d < maxDepth) q.children.foreach(c => go(c, d + 1))
      }
      go(p, 0)
    }
    top("verdicts", res.verdicts.queryExecution.withCachedData, 3)
    top("kept", res.kept.queryExecution.withCachedData, 7)
    res.verdicts.write.mode("overwrite").format("noop").save()
    res.kept.write.mode("overwrite").format("noop").save()
    res.unpersist()
    spark.stop()
  }
}
