package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Dev-only plan probe: print executed-plan summaries for a set of
  * queries (shuffle/scan/codegen shape audit backing SURVEY §4).
  * Counts by TREE TRAVERSAL, descending into AQE query stages —
  * the AQE shell's toString hides WholeStageCodegen markers and
  * stage-internal nodes (Spark 4.1).
  * Usage: runMain graft.JudgeProbe [qname ...]
  */
object JudgeProbe {

  private def count(root: SparkPlan, pred: SparkPlan => Boolean): Int = {
    var n = 0
    def walk(p: SparkPlan): Unit = {
      if (pred(p)) n += 1
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(root)
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q46_pivot", "q48_cube_grouping", "q50_salted_skew_agg",
        "q51_semi_anti_join", "q53_sample_stratified", "q54_filter_funnel",
        "q58_profile_stats", "q29_lang_id")
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      // collect() executes THIS df's queryExecution (count() would
      // build and execute a different plan, leaving this one an
      // unexecuted AQE shell with no codegen stages compiled)
      df.collect()
      val plan = df.queryExecution.executedPlan
      println(s"[probe] $q " +
        s"scans=${count(plan, _.isInstanceOf[FileSourceScanExec])} " +
        s"exchanges=${count(plan, _.isInstanceOf[ShuffleExchangeLike])} " +
        s"broadcasts=${count(plan, _.isInstanceOf[BroadcastExchangeLike])} " +
        s"wscg=${count(plan, _.isInstanceOf[WholeStageCodegenExec])} " +
        s"expand=${count(plan, _.isInstanceOf[ExpandExec])}")
    }
    spark.stop()
  }
}
