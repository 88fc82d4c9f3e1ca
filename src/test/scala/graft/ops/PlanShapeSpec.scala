package graft.ops

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-shape guards for the corpus-prep operators: the properties
  * that make them survive 100× are PLAN properties, so they are
  * asserted here against the executed plan — a refactor that
  * reintroduces a global single-partition window or an all-pairs
  * join fails the suite, not just the benchmark.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
      case q: QueryStageExec => walk(q.plan)(f)
      case other => other.children.foreach(walk(_)(f))
    }
  }

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    walk(p)(out += _)
    out.toSeq
  }

  it("Packing's data-sized window is bucket-partitioned; its only " +
      "global window runs on the buckets-sized census") {
    val df = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("id", "tok")
    val out = Packing.packSpans(df, "id", "tok", blockSize = 64L)
    out.collect()
    val windows = nodes(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    windows should not be empty
    // since r14 the offs prefix-scan (previously a driver collect)
    // is a PLAN-side window over the per-bucket aggregate — global
    // but metadata-sized (<= nBuckets rows), the SurrogateKeys
    // shape; the row-carrying window stays bucket-partitioned
    val (global, keyed) = windows.partition(_.partitionSpec.isEmpty)
    keyed should not be empty
    global.foreach { g =>
      nodes(g).count(_.getClass.getSimpleName
        .contains("HashAggregate")) should be >= 1
    }
  }

  it("mixtureByTokens keeps the sampled side shuffle-free") {
    val df = (1L to 500L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", 3L))
      .toDF("doc_id", "stratum", "tok")
    val kept = Sampling.mixtureByTokens(df, "stratum", "doc_id",
      col("tok"), Map("a" -> 0.5, "b" -> 0.5))
    kept.collect()
    // the keep predicate is a pure row filter: zero exchanges in the
    // kept-rows plan (the supply agg ran eagerly inside the call)
    nodes(kept.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 0
  }

  it("SegmentDedup's election carries no segment text in the grouping key") {
    import graft.dedup.SegmentDedup
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val docs = (1L to 50L).map(i => (i, s"w$i x$i y$i z$i")).toDF("doc_id", "text")
    val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", 2)
    out.collect()
    // the winner-election aggregate (min(struct) plans as an object/
    // sort aggregate) keys by (h, slen) — hash + length, never the
    // segment text itself
    val aggs = nodes(out.queryExecution.executedPlan)
      .collect { case a: BaseAggregateExec => a }
    aggs.filter(_.groupingExpressions.map(_.name).toSet == Set("h", "slen")) should
      not be empty
    aggs.filter(_.groupingExpressions.exists(_.name == "seg")) shouldBe empty
  }

  it("Snapshot.asOf pushes its interval predicate into the parquet scan") {
    val p = "target/scratch/planshape_asof"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    Seq(
      (1L, 10L, Option(20L)), (1L, 20L, Option.empty[Long]),
      (2L, 25L, Option.empty[Long]))
      .toDF("k", Snapshot.ValidFrom, Snapshot.ValidTo)
      .write.parquet(p)
    val out = Snapshot.asOf(spark.read.parquet(p), lit(15L))
    out.collect()
    val scan = out.queryExecution.executedPlan.toString
    // time travel at scale = a pruned scan: both interval bounds must
    // reach the data source, not evaluate post-scan only
    // (the rendered PushedFilters list truncates — match prefixes)
    scan should include regex "PushedFilters: \\[.*LessThanOrEqual\\(valid_from,15\\)"
    scan should include regex "PushedFilters: \\[.*Or\\(IsNull\\(valid_to\\),GreaterThan\\(valid_to,"
  }

  it("LM-index probe pushes the kind split into the parquet scan") {
    import graft.text.LmFilter
    val p = "target/scratch/planshape_lm_index"
    val pp = new org.apache.hadoop.fs.Path(p)
    pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    val ref = Seq("alpha beta gamma", "beta gamma delta")
      .map(Tuple1(_)).toDF("text")
    LmFilter.bigramLmIndex(ref, "text").write.parquet(p)
    val out = LmFilter.scoreAgainstLmIndex(spark.read.parquet(p),
      Seq((1L, "alpha beta zeta")).toDF("doc_id", "text"),
      "doc_id", "text")
    out.collect()
    val scan = out.queryExecution.executedPlan.toString
    // the persisted model splits by row kind at the SCAN — a probe
    // must never deserialize the other half of the count table
    scan should include regex "PushedFilters: \\[.*EqualTo\\(kind,uni\\)"
    scan should include regex "PushedFilters: \\[.*EqualTo\\(kind,bi\\)"
  }

  it("ROUGE index probe reads the persisted counts and never " +
      "re-tokenizes the reference") {
    import graft.ml.Rouge
    val p = "target/scratch/planshape_rouge_index"
    val pp = new org.apache.hadoop.fs.Path(p)
    pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    val ref = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("pair_id", "text")
    Rouge.refCountIndex(ref, "pair_id", "text", n = 2, (2L, 7L))
      .write.parquet(p)
    val out = Rouge.scoreAgainstIndex(spark.read.parquet(p),
      Seq((1L, "alpha beta zeta")).toDF("pair_id", "text"),
      "pair_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the probe's only text-parsing work is the CANDIDATE leg: the
    // reference side must come from the parquet artifact (two pruned
    // scans — match join + totals), with zero reference tokenization
    plan should include("planshape_rouge_index")
    // exactly one tokenize chain (the candidate's) in the whole plan:
    // split(lower(text)) appearing twice would mean the reference is
    // being re-parsed somewhere
    val tokenizes = "split\\(lower\\(".r.findAllIn(plan).length
    tokenizes should be <= 2 // candidate counts are barriered once;
    // the localCheckpoint may surface the expression in two fragments
  }

  it("interpolated LM probe keeps the scan-level kind split for all " +
      "three count-table legs") {
    import graft.text.LmFilter
    val p = "target/scratch/planshape_lm_jm_index"
    val pp = new org.apache.hadoop.fs.Path(p)
    pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    val ref = Seq("alpha beta gamma", "beta gamma delta")
      .map(Tuple1(_)).toDF("text")
    LmFilter.bigramLmIndex(ref, "text", LmFilter.Interpolated(700))
      .write.parquet(p)
    val out = LmFilter.scoreAgainstLmIndex(spark.read.parquet(p),
      Seq((1L, "alpha beta zeta")).toDF("doc_id", "text"),
      "doc_id", "text")
    out.collect()
    val scan = out.queryExecution.executedPlan.toString
    // the JM scorer adds a second unigram join (c_b of the second
    // token) — every leg must still split by row kind AT THE SCAN,
    // never deserialize-then-filter the whole count table
    scan should include regex "PushedFilters: \\[.*EqualTo\\(kind,uni\\)"
    scan should include regex "PushedFilters: \\[.*EqualTo\\(kind,bi\\)"
  }

  it("per-UA robots election still never shuffles the URL corpus") {
    import graft.text.Robots
    val urls = (1L to 400L).map(i => (i, s"https://h${i % 5}.com/p/$i"))
      .toDF("id", "url")
    val robots = Seq(
      ("h1.com", "User-agent: graftbot\nDisallow: /p/\n" +
        "User-agent: *\nDisallow: /x"),
      ("h2.com", "User-agent: *\nDisallow: /p/3")).toDF("domain", "body")
    val out = Robots.filterAllowed(urls, "url",
      Robots.rules(robots, "domain", "body", agent = Some("graftbot")))
    out.collect()
    // the named-group election adds windows on the RULES side only
    // (domains-sized); the corpus side must stay exchange-free and
    // no sort-merge join may appear
    val ns = nodes(out.queryExecution.executedPlan)
    ns.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]) shouldBe false
    val bhj = ns.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    bhj should have size 1
    nodes(bhj.head.left)
      .count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 0
  }

  it("crawl-pipeline extraction + quality gate stays shuffle-free pre-election") {
    import graft.text.HtmlExtract
    val pages = (1L to 20L)
      .map(i => (i, s"<p>some body text number $i</p>")).toDF("doc_id", "html")
    val extracted = pages
      .withColumn("t", HtmlExtract.mainText(col("html")))
      // scalatest's Matchers shadows functions.length — expr() form
      .withColumn("toks",
        expr("cast(length(trim(t)) - length(replace(trim(t), ' ', '')) + 1 as bigint)"))
      .filter(col("toks") >= 3)
    extracted.collect()
    nodes(extracted.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 0
  }

  it("capPerKey salts the first window and re-ranks only survivors") {
    val df = (1L to 500L).map(i => (i, if (i % 2 == 0) "big" else s"k${i % 7}"))
      .toDF("id", "key")
    val out = Sampling.capPerKey(df, "key", "id", cap = 3, saltBuckets = 8)
    out.count()
    val plan = out.queryExecution.executedPlan
    val wins = nodes(plan).collect { case w: WindowExec => w }
    wins.size shouldBe 2
    // stage 1 (deeper node) partitions by (key, salt); stage 2 by key
    // alone — and stage 2's subtree must contain the survivor filter,
    // or the mega-key's full sort is back in one task.
    val Seq(stage2, stage1) = wins // outermost first
    stage1.partitionSpec.map(_.toString).exists(_.contains("_cap_salt")) shouldBe true
    stage2.partitionSpec.size shouldBe 1
    val filtersBelowStage2 = nodes(stage2.child).collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    filtersBelowStage2.exists(_.condition.toString.contains("_cap_rn")) shouldBe true
  }

  it("Mojibake repair is a zero-exchange scan projection") {
    import graft.text.Mojibake
    val df = (1L to 300L).map(i => (i, s"text $i " + Mojibake.mojibake("é")))
      .toDF("id", "t")
      .withColumn("fixed", Mojibake.repair(col("t")))
      .withColumn("flag", Mojibake.looksCorrupted(col("t")))
    df.collect()
    nodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 0
  }

  it("robots enforcement never shuffles the URL corpus") {
    import graft.text.Robots
    val urls = (1L to 400L).map(i => (i, s"https://h${i % 5}.com/p/$i"))
      .toDF("id", "url")
    val rules = Seq(("h1.com", "/p/1", false)).toDF("domain", "rule", "allow")
    val out = Robots.filterAllowed(urls, "url", rules)
    out.collect()
    // broadcast join with the election in a projection: the RULES
    // side may shuffle its domains-sized groupBy, but the corpus
    // (streamed) side must carry no exchange, and no sort-merge
    // join may appear anywhere
    val ns = nodes(out.queryExecution.executedPlan)
    ns.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]) shouldBe false
    val bhj = ns.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    bhj should have size 1
    nodes(bhj.head.left)
      .count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 0
  }

  it("ZoneMap.readRange opens only the manifest-surviving files") {
    val dir = "target/scratch/planshape_zonemap"
    val df = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
    ZoneMap.write(df, dir, "k", 10)
    val pruned = ZoneMap.readRange(spark, dir, "k",
      lit(100L), lit(200L))
    // the planned scan's file set IS the pruned set — strictly fewer
    // than the 10 on disk
    pruned.inputFiles.length should be < 10
    pruned.inputFiles.length should be >= 1
    pruned.count() shouldBe 100L
  }

  it("HivePartitions.readRange prunes directories at planning time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.lit
    val path = "target/scratch/planshape_hive"
    val df = (0L until 300L).map(i => (i, i % 30)).toDF("id", "day")
    HivePartitions.write(df, path, "day")
    val pruned = HivePartitions.readRange(spark, path, "day",
      lit(5), lit(12))
    pruned.count() shouldBe 70L
    val scans = nodes(pruned.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    scans should not be empty
    scans.head.partitionFilters should not be empty
    // only the 7 surviving day-directories are selected, out of 30
    scans.head.selectedPartitions.partitionCount shouldBe 7
  }

  it("Transitions windows on user_id only (never a global lag)") {
    val ev = (1L to 200L).map(i => (i % 9, i, i, s"s${i % 4}"))
      .toDF("user_id", "ms", "event_id", "state")
    val out = Transitions.matrix(ev)
    out.collect()
    val wins = nodes(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    wins should not be empty
    wins.foreach(_.partitionSpec should not be empty)
  }

  it("CdcApply windows the changelog alone — the base is never sorted") {
    val base = (1L to 300L).map(i => (i, s"v$i")).toDF("k", "payload")
    val changes = Seq(("U", 5L, 1, 51L, "nv"), ("D", 7L, 1, 71L, "x"))
      .toDF("op", "k", "seq", "change_id", "payload")
    val out = CdcApply(base, changes, "k")
    out.collect()
    val plan = out.queryExecution.executedPlan
    val wins = nodes(plan).collect { case w: WindowExec => w }
    wins.size shouldBe 1
    // the windowed subtree must NOT contain the base's local relation:
    // only the 2-row changelog sorts
    val winLeaves = nodes(wins.head).collect {
      case l if l.children.isEmpty => l
    }
    winLeaves.foreach { l =>
      l.toString should not include "v299" // base payload never below the window
    }
  }

  it("Bootstrap.sumCi keeps the CDF comparisons off the mix chain (one u per row-rep)") {
    val df = (1L to 100L).map(i => ("g", i, 1.0)).toDF("g", "id", "v")
    val out = Bootstrap.sumCi(df, "g", "id", "v", b = 20,
      ps = Seq(0.05, 0.5, 0.95))
    out.collect()
    // the aggregate expression must reference the materialized draw,
    // not re-derive it: pmod (the mix chain) appears in a projection
    // below the first aggregate, and the aggregate itself carries no
    // pmod at all
    val aggs = nodes(out.queryExecution.executedPlan).collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }
    aggs should not be empty
    val partial = aggs.last // deepest = partial aggregation
    partial.aggregateExpressions.map(_.toString)
      .exists(_.contains("pmod")) shouldBe false
  }

  it("BitmapAgg builds states in two phases (map-side partials, one exchange)") {
    import graft.functions.BitmapAgg
    val df = (1L to 2000L).map(i => (i % 5, i % 300)).toDF("g", "id")
    val out = df.groupBy("g").agg(BitmapAgg.bitmapBuild(col("id")).as("bm"))
    out.collect()
    val ns = nodes(out.queryExecution.executedPlan)
    // TypedImperativeAggregate plans as ObjectHashAggregate: a
    // partial below the exchange and a final above — states OR
    // map-side before anything shuffles
    val objAggs = ns.filter(_.getClass.getSimpleName
      .contains("ObjectHashAggregate"))
    objAggs.size shouldBe 2
    ns.count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 1
  }

  it("IntervalUnion and WeightedQuantile plan only KEYED windows") {
    val iv = (1L to 300L).map(i => (i % 9, i * 10, i * 10 + 15, i))
      .toDF("key", "start", "end", "id")
    val cov = IntervalUnion.coverage(iv)
    cov.collect()
    nodes(cov.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
      .foreach(_.partitionSpec should not be empty)

    val wq = graft.quality.WeightedQuantile.report(
      (1L to 300L).map(i => (i % 4, i.toDouble, 1L, i))
        .toDF("g", "v", "w", "id"))
    wq.collect()
    nodes(wq.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
      .foreach(_.partitionSpec should not be empty)
  }

  it("SurrogateKeys' only global window runs on the buckets-sized census") {
    val df = (1L to 1000L).map(i => Tuple1(i % 211)).toDF("k")
    val out = SurrogateKeys.assign(df, Seq("k"), col("k") / 20)
    out.collect()
    val ws = nodes(out.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    // the rank window is keyed by bucket; exactly one window (the
    // bucket-offset prefix sum over the census) is global, and its
    // input is the aggregate output, never the key rows
    val (global, keyed) = ws.partition(_.partitionSpec.isEmpty)
    global.size shouldBe 1
    keyed should not be empty
    nodes(global.head).count(_.getClass.getSimpleName
      .contains("HashAggregate")) should be >= 1
  }
}
