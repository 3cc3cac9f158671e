package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: trace duplication-pair orientation between engine and golden. */
object DebugDup {
  def main(args: Array[String]): Unit = {
    val n = 3000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = graft.sources.PagesGen.generate(spark, n, 8).toDF().cache()
    val res = graft.pipeline.QualityPipeline.run(pages)
    val flagged = res.verdicts.filter(col("rule").isin("duplication", "near_dup"))
      .select("url", "rule").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rows = pages.select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val urlOfId = rows.keys.map(u => u.split("/p/")(1).toLong -> u).toMap

    var shown = 0
    (0L until n).filter(id => graft.sources.PagesGen.errorClass(id) == "duplication")
      .foreach { id =>
        val base = graft.sources.PagesGen.cleanBaseAtOrAbove(id - java.lang.Math.floorMod(id, 101L) + 1)
        val u = urlOfId(id)
        val bu = urlOfId.get(base)
        val textEq = bu.exists(b => rows(b) == rows(u))
        val fU = flagged.get(u); val fB = bu.flatMap(flagged.get)
        if (shown < 40) {
          println(s"id=$id base=$base textEq=$textEq uFlag=$fU bFlag=$fB " +
            s"uMax=${bu.exists(b => u > b)}")
          shown += 1
        }
      }
    spark.stop()
  }
}
