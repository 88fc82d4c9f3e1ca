package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Properties of the crawl-schedule / epoch-shuffle pair (q161/q162),
  * driven through the registry over the sf0.001 corpus.
  */
class ScheduleShuffleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  it("q161 interleaves hosts: all round-k fetches precede round-k+1") {
    val rows = SparkEntry.queries("q161_politeness_schedule")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    rows.map(_._1) shouldBe rows.map(_._1).sorted
    // the head stripes across ALL hosts before any host repeats
    val round1 = rows.filter(_._1 == 1).map(_._2)
    round1.toSet.size shouldBe round1.size
    round1.size shouldBe 7
    rows.map(_._1).head shouldBe 1
  }

  it("q162 re-partitions completely per epoch, differently across epochs") {
    val rows = SparkEntry.queries("q162_epoch_shuffle")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byEpoch = rows.groupBy(_._1)
    byEpoch.keySet shouldBe Set(0L, 1L, 2L)
    val totals = byEpoch.view.mapValues(rs =>
      (rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    // every epoch covers the full corpus (same doc count + id checksum)
    totals.values.toSet.size shouldBe 1
    // but the shard histogram moves between epochs (a real re-shuffle)
    val hist = byEpoch.view.mapValues(
      _.map(r => r._2 -> r._3).toMap).toMap
    hist(0L) should not be hist(1L)
  }
}
