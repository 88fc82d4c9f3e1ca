package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-sample selection for the ANN trainers.
  *
  * An xxhash64 threshold on the id column picks ~`target` rows
  * independent of partitioning, file order, or cluster size — the
  * same rows are chosen on a laptop and on a 1000-executor run, so
  * trained codebooks/centroids are reproducible. The one extra job is
  * a count (parquet metadata-cheap) to turn the target into a
  * fraction; corpora at or under the target skip the filter so small
  * fixtures train bit-identically to full-corpus training.
  */
object Sampler {
  def hashSample(vecs: DataFrame, idCol: String, target: Int): DataFrame = {
    require(target > 0, s"sample target must be positive, got $target")
    val n = vecs.count()
    if (n <= target) vecs
    else {
      // threshold in millionths; +1 biases toward >= target rows so a
      // slightly small sample never starves k-means of seed rows
      val thresh = (1000000L * target) / n + 1
      vecs.filter(pmod(xxhash64(col(idCol)), lit(1000000L)) < lit(thresh))
    }
  }
}
