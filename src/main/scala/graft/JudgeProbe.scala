package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan probe: print executed-plan summaries for a set of
  * queries (shuffle/scan/codegen shape audit backing SURVEY §4).
  * Usage: runMain graft.JudgeProbe [qname ...]
  */
object JudgeProbe {
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
      df.count() // trigger AQE final plan
      val plan = df.queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).length
      println(s"[probe] $q scans=${n("FileScan|Scan parquet")} " +
        s"exchanges=${n("Exchange (hash|range|single)")} " +
        s"broadcasts=${n("BroadcastExchange")} wscg=${n("\\*\\(\\d+\\)")} " +
        s"expand=${n("Expand")}")
      if (q == "q53_sample_stratified")
        println(plan.linesIterator.filter(_.contains("FileScan")).mkString("\n"))
    }
    spark.stop()
  }
}
