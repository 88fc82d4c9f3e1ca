package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Diagnostic main measuring the BPE production-vocab path (VERDICT
  * r11 item 2): serial [[graft.text.Bpe.train]] (one Spark job per
  * merge) vs [[graft.text.Bpe.trainBatched]] (one job per PASS, each
  * pass committing a provably-serial-equal batch) at a real merge
  * count, plus the chunked bounded-depth encode. Not part of any
  * gated artifact — run it when revisiting the batching story:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     SPARK_GRAFT_BPE_MERGES=1000 \
  *     sbt -batch "runMain graft.tools.BpeBench"
  *
  * SPARK_GRAFT_BPE_MODE=batched skips the serial leg (at 30k merges
  * serial is the thing being replaced, not a baseline worth
  * waiting for); MODE=driver measures ONLY the driver-resident
  * in-memory trainer (the trainAuto fast path — the 30k-merges-in-
  * minutes row, VERDICT r12 item 2).
  *
  * SPARK_GRAFT_BPE_VOCAB=<N> swaps the corpus word table for a
  * DETERMINISTIC synthetic Zipf vocabulary of N distinct words
  * (hash-derived letters, lengths 4–12, counts ~1e6/(rank+1)): the
  * driver corpus has a ~31-word vocabulary, far too small to sustain
  * ≥1k merges, while the merge loop's operand is precisely the
  * vocabulary-sized word table — so the synthetic table IS the
  * production shape being measured.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "1000").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_BPE_MODE", "both")
    val vocabSpec = sys.env.getOrElse("SPARK_GRAFT_BPE_VOCAB", "corpus")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.Bpe

    val words = (if (vocabSpec == "corpus")
      Bpe.wordCounts(
        graft.sources.Tables.load(spark, sfDir, "documents")
          .select("text"), "text")
    else
      spark.range(vocabSpec.toLong).selectExpr(
        "concat_ws('', transform(sequence(0, cast(id % 9 + 3 as int)), " +
          "j -> chr(97 + pmod(shiftright(xxhash64(id), j * 5), 26)))) " +
          "AS word",
        "cast(1000000 / (id + 1) as bigint) + 1 AS cnt")
        .groupBy("word").agg(
          org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[bpebench] vocab=${words.count()} (spec=$vocabSpec) " +
      s"nMerges=$nMerges sf=$sfDir")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // driver-resident exact path (VERDICT r12 item 2): collect the
    // vocabulary-sized table once, serial merge loop in memory
    val (driverMerges, tDriver) = time {
      val collected = words
        .select(org.apache.spark.sql.functions.col("word"),
          org.apache.spark.sql.functions.col("cnt").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      Bpe.trainDriver(collected, nMerges)
    }
    println(f"[bpebench] driver   ${tDriver}%.1fs merges=${driverMerges.size}")

    if (mode == "driver") { spark.stop(); return }

    val (st, tBatched) =
      time(Bpe.trainBatchedStats(spark, words, nMerges))
    println(f"[bpebench] batched  ${tBatched}%.1fs merges=${st.merges.size} " +
      s"passes=${st.passes} largestBatch=${st.largestBatch} " +
      f"avgBatch=${st.merges.size.toDouble / st.passes}%.1f " +
      f"vsDriver=${tBatched / tDriver}%.0fx")
    require(driverMerges == st.merges,
      "driver-resident merge sequence diverged from batched — " +
        "trainDriver is broken")

    if (mode != "batched") {
      val (serial, tSerial) = time(Bpe.train(spark, words, nMerges))
      println(f"[bpebench] serial   ${tSerial}%.1fs merges=${serial.size} " +
        f"speedup=${tSerial / tBatched}%.1fx")
      require(serial == st.merges,
        "batched merge sequence diverged from serial — the accept rule is broken")
    }

    // encode the word table under the learned merges, chunked vs (for
    // small lists) single-projection — the inference-path depth story
    val (_, tEnc) = time(
      Bpe.applyMerges(words, st.merges).count())
    println(f"[bpebench] encode_chunked ${tEnc}%.1fs " +
      s"(chunkSize=512, ${st.merges.size} merges)")
    spark.stop()
  }
}
