package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full keep/drop + scrub quality pipeline (langid,
    * perplexity, heuristics, exact + MinHash dedup, two-pass verdicts)
    * over a deterministically generated pages table of the north-rule
    * shape. Returns the verdict table (rows > 0 by construction — the
    * generator plants every error class).
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.sources.PagesGen.generate(spark, 2000, 8).toDF()
    graft.pipeline.QualityPipeline.run(pages).verdicts
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
