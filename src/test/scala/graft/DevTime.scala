package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: warm per-query timing for a subset of queries.
  * sbt "Test/runMain graft.DevTime /root/testdata/sf0.1 3 q37 q77"
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt
    val prefixes = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q01_full_scan_agg")(spark, sfDir).count()
    catch { case _: Throwable => }
    val selected = SparkEntry.queries.filter { case (name, _) =>
      prefixes.isEmpty || prefixes.exists(name.startsWith)
    }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name min=${times.min}%.2fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
