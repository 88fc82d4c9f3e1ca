package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zipf power-law fit over a rank-frequency head — the corpus
  * health-check companion to q42's top-ngrams and q188's lexical
  * stats: natural text shows ln f ≈ c − s·ln r with s near 1
  * (Zipf 1949); a far-off exponent flags synthetic/templated or
  * over-deduplicated corpora before they hit training.
  *
  * Method: OLS of ln(freq) on ln(rank) over the top-R ranks —
  * exactly q176's closed form, but x and y are logs, so exactness
  * needs one extra step: each ln is rounded to 12dp and quantized to
  * an INTEGER number of 1e-12 units (DECIMAL(19,0)), making every
  * moment sum exact and order-independent; second-order moments ride
  * DECIMAL(38,0) via 19-digit-decimal products (q193's Σy² idiom —
  * pico-unit squares outgrow BIGINT). The closed form is
  * scale-invariant in the quantization factor for slope and r², so
  * no descaling appears anywhere. The 12dp round also absorbs
  * cross-engine 1-ulp ln() wobble (q173's discipline).
  *
  * Scale shape: the token census is one partial-aggregatable
  * groupBy; ranking is a per-series window over VOCABULARY-sized
  * rows (q180's contract — never the corpus); the moments pass is
  * R rows per series.
  */
object Zipf {

  val DefaultTopR = 100

  /** @param ranked (series, rank, freq) — 1-based dense head ranks.
    * @return (series, n_ranks, zipf_exponent, r2) — exponent = −slope
    *   of ln f on ln r, 6dp; null when fewer than 3 ranks or zero
    *   x-variance.
    */
  def fit(ranked: DataFrame): DataFrame = {
    val pts = ranked.select(col("series"),
      round(log(col("rank").cast("double")) * 1e12, 0)
        .cast("decimal(19,0)").as("x"),
      round(log(col("freq").cast("double")) * 1e12, 0)
        .cast("decimal(19,0)").as("y"))
    val m = pts.groupBy("series").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    def d(name: String) = col(name).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val denX = d("n") * d("sxx") - d("sx") * d("sx")
    val denY = d("n") * d("syy") - d("sy") * d("sy")
    val ok = col("n") >= 3 && denX > 0
    m.select(col("series"), col("n").as("n_ranks"),
      when(ok, round(-(num / denX), 6)).as("zipf_exponent"),
      when(ok && denY > 0, round(num * num / (denX * denY), 6)).as("r2"))
  }

  /** DuckDB twin over a `ranked(series, rank, freq)` CTE — same
    * quantization, same moment set, same closed-form chain.
    */
  def sql(rankedCte: String): String =
    s"""WITH ranked AS ($rankedCte
       |), pts AS (
       |  SELECT series,
       |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1e12, 0)
       |      AS DECIMAL(19,0)) AS x,
       |    CAST(round(ln(CAST(freq AS DOUBLE)) * 1e12, 0)
       |      AS DECIMAL(19,0)) AS y
       |  FROM ranked
       |), m AS (
       |  SELECT series, count(*) AS n_ranks,
       |    CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |    CAST(sum(x * x) AS DOUBLE) AS sxx,
       |    CAST(sum(x * y) AS DOUBLE) AS sxy,
       |    CAST(sum(y * y) AS DOUBLE) AS syy
       |  FROM pts GROUP BY series
       |), c AS (
       |  SELECT series, n_ranks,
       |    n * sxy - sx * sy AS num,
       |    n * sxx - sx * sx AS denx,
       |    n * syy - sy * sy AS deny
       |  FROM m
       |)
       |SELECT series, n_ranks,
       |  CASE WHEN n_ranks >= 3 AND denx > 0
       |    THEN round(-(num / denx), 6) END AS zipf_exponent,
       |  CASE WHEN n_ranks >= 3 AND denx > 0 AND deny > 0
       |    THEN round(num * num / (denx * deny), 6) END AS r2
       |FROM c
       |ORDER BY series""".stripMargin
}
