package graft
import org.apache.spark.sql.SparkSession
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_full_scan_agg")(spark, sfDir).count()
    for (q <- Seq("q29_lang_id", "q29_lang_id", "q30_quality_score")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(s"[probe] $q ${(System.nanoTime() - t0) / 1e9}s")
    }
    SparkEntry.queries("q29_lang_id")(spark, sfDir).explain(true)
    spark.stop()
  }
}
