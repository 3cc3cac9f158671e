package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.QueryExecution

/** Plan-shape assertions (SURVEY §5.2.4): the 100 TB contract is about
  * what reaches the scan and where shuffles happen, not just row values.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("column pruning: unused columns never reach the parquet scan") {
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
    val scan = df.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(scan).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads pruned columns: $readSchema")
  }

  test("predicate pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 49.0)
      .select("l_orderkey")
    val scan = physical(df)
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]")
      || scan.contains("GreaterThan(l_quantity"), s"no pushdown in: ${scan.take(800)}")
  }

  test("feature projection is shuffle-free (no Exchange)") {
    val pages = graft.sources.PagesGen.generate(spark, 100, 2).toDF()
    val feat = graft.pipeline.QualityPipeline.features(pages)
    val plan = physical(feat)
    assert(!plan.contains("Exchange"), s"feature stage shuffles: ${plan.take(800)}")
  }

  test("rare-combo rule broadcasts the tiny grouped side") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val g = d.groupBy("lang", "source").count().filter(col("count") < 3)
    val joined = d.join(broadcast(g), Seq("lang", "source"))
    assert(physical(joined).contains("BroadcastHashJoin"))
  }

  test("emb_cosine_dedup: no cartesian product — SRP-bucketed equi-join") {
    val plan = physical(Queries.embCosineDedup(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in emb_cosine_dedup: ${plan.take(800)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in emb_cosine_dedup: ${plan.take(800)}")
  }

  test("dq_exact_dup: groupBy partial-agg plan, no window sort") {
    val plan = physical(Queries.dqExactDup(spark, dir))
    assert(!plan.contains("Window"), s"window in dq_exact_dup: ${plan.take(800)}")
    assert(plan.contains("HashAggregate"), plan.take(400))
  }

  test("dq_profile restacks ONE aggregate scan (no per-column union of scans)") {
    // the returned frame is the driver-side restack of a single multi-agg
    // row — it must contain no parquet scan of its own
    val plan = physical(Queries.dqProfile(spark, dir))
    assert(!plan.contains("Scan parquet"), plan.take(400))
    assert(plan.contains("LocalTableScan"), plan.take(400))
  }


  test("dq_simhash_neardup: bucket-bounded equi-join, no cartesian / nested-loop") {
    // pigeonhole chunk banding must discover candidates via an equi-join
    // on the bucket id — an all-pairs formulation would show up here as a
    // cartesian or broadcast-nested-loop join over the corpus
    val plan = physical(Queries.dqSimHashNearDup(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in dq_simhash_neardup: ${plan.take(800)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in dq_simhash_neardup: ${plan.take(800)}")
  }

  test("ev_sessionize: ONE shuffle — the session agg reuses the window's user_id partitioning") {
    // HashPartitioning(user_id) satisfies ClusteredDistribution(user_id,
    // session_no), so the groupBy after the per-user window must NOT add
    // a second Exchange: sessionization at 100 TB is one narrow shuffle
    // on the session key, full stop. (orderBy adds a range exchange for
    // presentation only — assert on the unsorted core.)
    val core = graft.streaming.EventStream.sessionizeBatch(
      spark.read.parquet(s"$dir/events.parquet"))
    val plan = physical(core)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n${plan.take(1200)}")
  }

  test("emb_ann_ivf: cell-probe equi-join — no cartesian, broadcast query side") {
    val plan = physical(Queries.embAnnIvf(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in emb_ann_ivf: ${plan.take(800)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in emb_ann_ivf: ${plan.take(800)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"cell probe join is not broadcast: ${plan.take(800)}")
  }

  test("whole-stage codegen covers the scalar feature expressions") {
    // NOTE: higher-order array functions (filter/transform/aggregate) are
    // interpreted in Spark — only scalar expression chains codegen. The
    // scan + scalar features must be inside a WholeStageCodegen span.
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val f = d.select(graft.functions.TextFns.symbolRatio(col("text")),
      graft.functions.TextFns.fingerprint(col("text")))
    // codegen'd spans print as "*(n) Project ..." in the physical plan
    assert(physical(f).contains("*(1)"), physical(f).take(500))
  }

  test("dq_decontam: broadcast eval probe; no shuffle carries gram text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val q = Queries.dqDecontam(spark, dir)
    val plan = physical(q)
    assert(plan.contains("BroadcastHashJoin"),
      s"eval probe not broadcast: ${plan.take(800)}")
    val root = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // Allowed shuffles: the EVAL side's distinct (gram only — the tiny
    // eval set), the per-doc agg, and the final orderBy. Forbidden: a
    // shuffle of the exploded CORPUS grams, which carries the doc key
    // alongside the gram — that would re-ship the corpus text volume.
    root.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val names = e.output.map(_.name)
      assert(!(names.contains("gram") && names.contains("__k")),
        s"shuffle carries exploded corpus grams: ${names.mkString(",")}")
      // corpus side now hashes via GramHash over staged tokens — neither
      // the text nor the token array may reach a shuffle boundary
      assert(!names.contains("__t") && !names.contains("__toks"),
        s"shuffle carries corpus text/tokens: ${names.mkString(",")}")
    }
  }

  test("boilerplateParagraphs: no shuffle carries paragraph text (8-byte hash only)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val pages = graft.sources.PagesGen.generate(spark, 200, 2).toDF()
    val v = graft.rules.Rules.boilerplateParagraphs(
      pages, col("url"), col("text"))
    // Walk the physical tree: every Exchange must ship only (__h, __k,
    // __len)-shaped rows — the exploded paragraph STRING `__p` must be
    // projected away before any shuffle boundary. At 10^8 docs a shuffle
    // carrying paragraph bodies is the difference between an 8-byte-key
    // shuffle and re-shipping the corpus.
    val root = v.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected at least one shuffle in the rule")
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("__p"),
        s"shuffle carries paragraph text: ${names.mkString(",")}")
    }
  }

  test("substrDupStats: no shuffle carries gram text (8-byte hash + position only)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val pages = graft.sources.PagesGen.generate(spark, 200, 2).toDF()
    val st = graft.functions.ExactSubstr.substrDupStats(
      pages, col("url"), col("text"), l = 8)
    // Same contract as boilerplateParagraphs: the exploded L-gram STRING
    // `__g` must die in the scan partition (projected to xxhash64) —
    // every Exchange ships only (__h, __k, __pos)-shaped rows. An
    // L-gram-text shuffle would ship ~L copies of the corpus.
    val root = st.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected at least one shuffle in the operator")
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("__g"),
        s"shuffle carries gram text: ${names.mkString(",")}")
      // post-GramHash shape: the gram string never exists; the staged
      // text/token columns must die in the scan partition too
      assert(!names.contains("__t") && !names.contains("__toks"),
        s"shuffle carries doc text/tokens: ${names.mkString(",")}")
    }
  }
}
