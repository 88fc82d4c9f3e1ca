package graft.ops

import org.apache.spark.sql.SparkSession

/** The repo's staged-swap discipline as one reusable primitive
  * (extracted r10 from Writer.merge / LmFilter.indexedBigramLogprob;
  * Compaction keeps its source-preserving variant): write the new
  * artifact NEXT TO the target and swap by rename, so a concurrent
  * reader of `path` sees the old complete artifact until the new one
  * is fully in place — an in-place mode(overwrite) deletes the live
  * files first and hands that reader a torn directory. A crash
  * mid-swap leaves the old, the new, or the `.old` aside — never
  * nothing — and readers built on the treat-any-failure-as-rebuild
  * rule recover from all three.
  */
object StagedSwap {

  /** Run `write` against a staging path, then swap it into `path`
    * via rename-aside. `write` must produce a complete artifact at
    * the staging path it is given (e.g. `df.write.mode("overwrite")
    * .parquet(staging)`).
    */
  def overwrite(spark: SparkSession, path: String)(
      write: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".staging")
    write(staging.toString)
    val old = new Path(path + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, old))
      throw new java.io.IOException(
        s"staged swap: rename $target -> $old failed")
    if (!fs.rename(staging, target)) {
      if (hadTarget) fs.rename(old, target) // restore
      throw new java.io.IOException(
        s"staged swap: rename $staging -> $target failed")
    }
    if (hadTarget) fs.delete(old, true)
  }
}
