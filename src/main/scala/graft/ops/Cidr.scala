package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Longest-prefix-match IPv4 classification — the log-analytics /
  * egress-audit primitive ("which network owns this client IP?")
  * that every access-log pipeline runs before geo/abuse rollups.
  * Reference scope: datanika's row-filter + enrichment family
  * (dlt_runner.py row transforms) never grows a routing-table
  * matcher; this is the standard one.
  *
  * Semantics: each rule is a CIDR block (base, len); an address
  * matches a rule when its top `len` bits equal the rule's base.
  * Among matching rules the LONGEST prefix wins — the routing-table
  * contract, which is what lets operators carve exceptions
  * (a /24 inside a /8) without touching the covering rule.
  *
  * 100 TB shape: a routing table is metadata (the full public
  * IPv4 BGP table is under a million rows; rule sets in pipelines
  * are hundreds). So the match is planned as ONE LEFT BROADCAST
  * HASH JOIN PER DISTINCT PREFIX LENGTH, longest first, and the
  * winner is a `coalesce` across the join outputs — zero shuffles
  * of the probe side, the classification runs inside the scan
  * stage. Distinct lengths are ≤ 32 by construction and real rule
  * sets use a handful. The network base per length is pure integer
  * arithmetic (`ip − ip mod 2^(32−len)`), identical in any engine —
  * no bit-shift operators whose semantics vary.
  *
  * All addresses are unsigned-32 carried in a signed 64-bit column.
  */
object Cidr {

  /** One CIDR rule: `base` is the network address (host bits zero),
    * `len` ∈ [1, 32] the prefix length, `label` the class.
    */
  final case class Rule(base: Long, len: Int, label: String) {
    def block: Long = 1L << (32 - len)
    require(len >= 1 && len <= 32, s"prefix length $len out of [1,32]")
    require(base >= 0L && base < (1L << 32), s"base $base not a u32")
    require(base % block == 0L,
      s"base $base has host bits set for /$len (misaligned rule)")
  }

  /** Annotate `df` with `cidr_label` / `cidr_len` columns holding
    * the longest matching rule (nulls when no rule covers the
    * address). `ipCol` must hold u32 addresses as longs.
    */
  def lpm(df: DataFrame, ipCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    require(rules.map(r => (r.base, r.len)).distinct.size == rules.size,
      "duplicate (base, len) rules")
    val spark = df.sparkSession
    import spark.implicits._
    val byLen = rules.groupBy(_.len).toSeq.sortBy(-_._1)
    val joined = byLen.foldLeft(df) { case (acc, (len, rs)) =>
      val block = 1L << (32 - len)
      val side = broadcast(
        rs.map(r => (r.base, r.label)).toDF(s"_cidr_b$len", s"_cidr_l$len"))
      // network base at this length: pure integer arithmetic so the
      // same expression text is portable into the DuckDB oracle
      val base = col(ipCol) - pmod(col(ipCol), lit(block))
      acc.join(side, base === col(s"_cidr_b$len"), "left")
    }
    val lens = byLen.map(_._1)
    val label = coalesce(lens.map(l => col(s"_cidr_l$l")): _*)
    val matchedLen = coalesce(lens.map(l =>
      when(col(s"_cidr_l$l").isNotNull, lit(l))): _*)
    joined
      .withColumn("cidr_label", label)
      .withColumn("cidr_len", matchedLen)
      .drop(lens.flatMap(l => Seq(s"_cidr_b$l", s"_cidr_l$l")): _*)
  }

  /** DuckDB-runnable scalar SQL for the same LPM over the same rule
    * set (for oracle authorship): a CASE over lengths, longest
    * first, each length an IN-list membership of the masked base.
    */
  def lpmSql(ipExpr: String, rules: Seq[Rule],
      want: String): String = {
    val byLen = rules.groupBy(_.len).toSeq.sortBy(-_._1)
    val arms = byLen.map { case (len, rs) =>
      val block = 1L << (32 - len)
      val masked = s"(($ipExpr) - (($ipExpr) % $block))"
      val out = want match {
        case "len" => len.toString
        case "label" =>
          // one nested CASE mapping base -> label at this length
          val maps = rs.map(r => s"WHEN $masked = ${r.base} " +
            s"THEN '${r.label}'").mkString(" ")
          s"(CASE $maps END)"
      }
      s"WHEN $masked IN (${rs.map(_.base).mkString(", ")}) THEN $out"
    }
    s"(CASE ${arms.mkString(" ")} END)"
  }
}
