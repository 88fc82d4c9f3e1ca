package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2014) — the
  * DATA-DRIVEN attribution model beside the positional heuristics
  * (q148 first/last, q210 U-shaped): user journeys become a
  * first-order Markov chain (START → channels → CONV/NULL), overall
  * conversion probability is the chain's absorption mass, and a
  * channel's credit is its REMOVAL EFFECT — how much conversion
  * disappears when every hop into the channel is redirected to NULL
  * (visits keep their denominators: the journey still "spends the
  * click", it just converts nothing — the standard construction).
  *
  * Reproducibility: transition COUNTS are exact; absorption runs
  * `iters` fixed-point power iterations in integer arithmetic —
  * each term floor((v_s · c_st) / tot_s) with truncating division
  * (the q131/q250 discipline), summed as integers (order-free) —
  * so base and removed conversion masses are bit-exact
  * cross-engine; effect and share close with one double division
  * each, rounded to 9dp.
  *
  * Scale shape: journeys truncate at first conversion and shred to
  * transition PAIRS with two keyed windows (per-user frames — the
  * q20 sessionize contract); the transition matrix is
  * (channels+3)² ≤ ~100 counts — METADATA — so the absorption
  * iterations legitimately run driver-side on collected scalars
  * (the IVF-centroid rationale), not as |channels|·iters Spark
  * jobs over 8-row DataFrames.
  */
object MarkovAttribution {

  val Start = "START"
  val Conv = "CONV"
  val Null = "NULL"

  /** Journey transition counts: (src, dst, c). Each user's events
    * order by (ts, id), truncate at the first conversion (mapped to
    * CONV), and a non-converting journey closes with → NULL.
    */
  def transitions(events: DataFrame, userCol: String, chanCol: String,
      tsCol: String, idCol: String, convChannel: String): DataFrame = {
    val chan = when(col(chanCol) === convChannel, lit(Conv))
      .otherwise(col(chanCol))
    val ev = events.select(col(userCol).as("u"), chan.as("ch"),
      col(tsCol).as("ts"), col(idCol).as("eid"))
    val wAll = Window.partitionBy("u")
    val cut = min(when(col("ch") === Conv,
      struct(col("ts"), col("eid")))).over(wAll)
    val kept = ev.withColumn("cut", cut)
      .filter(col("cut").isNull ||
        struct(col("ts"), col("eid")) <= col("cut"))
    val w = Window.partitionBy("u").orderBy(col("ts"), col("eid"))
    val hops = kept
      .withColumn("src", coalesce(lag(col("ch"), 1).over(w), lit(Start)))
      .withColumn("rn_desc", row_number().over(
        Window.partitionBy("u").orderBy(col("ts").desc, col("eid").desc)))
      .select(col("u"), col("src"), col("ch").as("dst"),
        col("rn_desc"), col("cut"))
    val terminal = hops
      .filter(col("rn_desc") === 1 && col("cut").isNull)
      .select(col("dst").as("src"), lit(Null).as("dst"))
    hops.select(col("src"), col("dst"))
      .unionByName(terminal)
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
  }

  /** Fixed-point absorption mass after `iters` power iterations —
    * the driver-side mirror of [[sqlChain]]'s generated CTEs.
    */
  private def absorb(trans: Map[(String, String), Long], iters: Int,
      scale: Long): Long = {
    val tot = trans.groupBy(_._1._1).map { case (s, m) =>
      s -> m.values.sum }
    var v = Map(Start -> scale)
    var conv = 0L
    for (_ <- 1 to iters) {
      var next = Map.empty[String, Long]
      for (((s, t), c) <- trans; vs <- v.get(s)) {
        val term = (vs * c) / tot(s) // non-negative: / == floor
        if (t == Conv) conv += term
        else if (t != Null)
          next = next.updated(t, next.getOrElse(t, 0L) + term)
      }
      v = next
    }
    conv
  }

  /** Remove `ch`: hops INTO it redirect to NULL (denominators
    * unchanged), hops OUT of it drop.
    */
  private def removed(trans: Map[(String, String), Long],
      ch: String): Map[(String, String), Long] =
    trans.collect {
      case ((s, t), c) if s != ch =>
        (s, if (t == ch) Null else t) -> c
    }.groupBy(_._1).map { case (k, m) => k -> m.map(_._2).sum }

  /** Full pipeline: per-channel removal effects + normalized credit
    * shares. `channels` fixes the report's channel set (a channel
    * with no journeys reports zero effect).
    */
  def attribute(events: DataFrame, userCol: String, chanCol: String,
      tsCol: String, idCol: String, convChannel: String,
      channels: Seq[String], iters: Int = 12,
      scale: Long = 1000000000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val trans = transitions(events, userCol, chanCol, tsCol, idCol,
        convChannel)
      .collect() // bounded: (channels + 3)^2 count scalars
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val base = absorb(trans, iters, scale)
    val rows = channels.sorted.map { ch =>
      val rem = absorb(removed(trans, ch), iters, scale)
      (ch, base, rem)
    }
    val sumDrop = rows.map { case (_, b, r) => b - r }.sum
    rows.map { case (ch, b, r) =>
      val effect = if (b == 0) 0.0
        else BigDecimal((b - r).toDouble / b.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val share = if (sumDrop == 0) 0.0
        else BigDecimal((b - r).toDouble / sumDrop.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (ch, b, r, effect, share)
    }.toDF("channel", "conv_base_fp", "conv_removed_fp",
      "removal_effect", "share")
  }

  /** Generated DuckDB SQL for the SAME computation: journeys →
    * transition counts → unrolled fixed-point absorption for the
    * base chain and one removal per channel. `eventsCte` must
    * produce (u, ch, ts, eid) with ch already CONV-mapped.
    */
  def sql(eventsCte: String, channels: Seq[String], iters: Int,
      scale: Long = 1000000000L): String = {
    val chans = channels.sorted
    // one absorption chain per variant; variant "" = base
    // AS MATERIALIZED everywhere a CTE is referenced more than once:
    // without it an inlining planner re-expands the whole upstream
    // pipeline per reference and the 12-level chain goes exponential
    def chain(tag: String, transCte: String): String = {
      val v0 =
        s"""v${tag}_0 AS MATERIALIZED (
           |  SELECT '$Start' AS st, CAST($scale AS BIGINT) AS val),
           |c${tag}_0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS conv)""".stripMargin
      val steps = (1 to iters).map { k =>
        s"""v${tag}_$k AS MATERIALIZED (
           |  SELECT t.dst AS st, CAST(sum((v.val * t.c) // t.tot) AS BIGINT) AS val
           |  FROM v${tag}_${k - 1} v JOIN $transCte t ON t.src = v.st
           |  WHERE t.dst <> '$Conv' AND t.dst <> '$Null'
           |  GROUP BY t.dst),
           |c${tag}_$k AS MATERIALIZED (
           |  SELECT (SELECT conv FROM c${tag}_${k - 1})
           |    + COALESCE((SELECT CAST(sum((v.val * t.c) // t.tot) AS BIGINT)
           |        FROM v${tag}_${k - 1} v
           |        JOIN $transCte t ON t.src = v.st AND t.dst = '$Conv'),
           |      0) AS conv)""".stripMargin
      }
      (v0 +: steps).mkString(",\n")
    }
    val removals = chans.zipWithIndex.map { case (ch, i) =>
      s"""tr_r$i AS MATERIALIZED (
         |  SELECT src, CASE WHEN dst = '$ch' THEN '$Null' ELSE dst END AS dst,
         |    CAST(sum(c) AS BIGINT) AS c, CAST(max(tot) AS BIGINT) AS tot
         |  FROM tr WHERE src <> '$ch'
         |  GROUP BY 1, 2)""".stripMargin
    }
    val chains = chain("b", "tr") +: chans.zipWithIndex.map {
      case (_, i) => chain(s"r$i", s"tr_r$i") }
    val out = chans.zipWithIndex.map { case (ch, i) =>
      s"SELECT '$ch' AS channel, (SELECT conv FROM cb_$iters) AS b, " +
        s"(SELECT conv FROM cr${i}_$iters) AS r"
    }.mkString(" UNION ALL ")
    s"""WITH ev AS ($eventsCte),
       |cut AS (
       |  SELECT u, ch, ts, eid,
       |    min(CASE WHEN ch = '$Conv' THEN (ts, eid) END)
       |      OVER (PARTITION BY u) AS cv
       |  FROM ev
       |), kept AS (
       |  SELECT u, ch, ts, eid FROM cut
       |  WHERE cv IS NULL OR (ts, eid) <= cv
       |), hops AS MATERIALIZED (
       |  SELECT u,
       |    COALESCE(lag(ch) OVER (PARTITION BY u ORDER BY ts, eid),
       |      '$Start') AS src,
       |    ch AS dst,
       |    row_number() OVER (PARTITION BY u ORDER BY ts DESC, eid DESC)
       |      AS rn_desc,
       |    max(CASE WHEN ch = '$Conv' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY u) AS has_conv
       |  FROM kept
       |), allhops AS (
       |  SELECT src, dst FROM hops
       |  UNION ALL
       |  SELECT dst AS src, '$Null' AS dst FROM hops
       |  WHERE rn_desc = 1 AND has_conv = 0
       |), cnt AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS c
       |  FROM allhops GROUP BY 1, 2
       |), tr AS MATERIALIZED (
       |  SELECT src, dst, c,
       |    CAST(sum(c) OVER (PARTITION BY src) AS BIGINT) AS tot
       |  FROM cnt
       |),
       |${removals.mkString(",\n")},
       |${chains.mkString(",\n")},
       |res AS MATERIALIZED ($out),
       |td AS (SELECT CAST(sum(b - r) AS BIGINT) AS drop_sum FROM res)
       |SELECT channel, b AS conv_base_fp, r AS conv_removed_fp,
       |  CASE WHEN b = 0 THEN 0.0
       |    ELSE round(CAST(b - r AS DOUBLE) / CAST(b AS DOUBLE), 9) END
       |    AS removal_effect,
       |  CASE WHEN drop_sum = 0 THEN 0.0
       |    ELSE round(CAST(b - r AS DOUBLE) / CAST(drop_sum AS DOUBLE), 9)
       |    END AS share
       |FROM res CROSS JOIN td
       |ORDER BY channel""".stripMargin
  }
}
