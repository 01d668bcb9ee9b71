package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev measurement: duplicate-heavy dedup stress — nBase
  * [[StressFixtures.zipfDocs]] documents (Zipf(1.0) vocabulary; the
  * pre-round-8 fixture replicated the ~30-word-vocab gated docs, so
  * every shingle lived in a handful of corpus-wide buckets and both
  * paths were measured at a degenerate upper bound) each replicated
  * ×copies under fresh ids with a one-token suffix — replicas are
  * near- but not exact-dups (4-shingle Jaccard ≈ 0.85), so candidate
  * generation faces ×copies² true-pair pressure per base doc while
  * bucket occupancies stay text-like. Compares the exact
  * prefix-filtered path (d02) against banded MinHash+LSH (d03).
  * Results recorded in PERF.md.
  *
  * Usage: runMain graft.DedupStress [sfDir] [copies] [nBase]
  * (nBase overrides the base-doc count — fixing copies×nBase while
  * varying copies isolates DUPLICATION DENSITY from corpus size)
  */
object DedupStress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val nBaseArg = if (args.length > 2) Some(args(2).toLong) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nBase = nBaseArg.getOrElse(Tables.documents(spark, sfDir).count())
    StressFixtures.zipfDocs(spark, nBase)
      .crossJoin(spark.range(copies).toDF("copy"))
      .select((col("doc_id") + col("copy") * nBase).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zc"), col("copy"))).as("text"))
      .write.mode("overwrite").parquet("/tmp/graft_dedup_stress")
    val docs = spark.read.parquet("/tmp/graft_dedup_stress")
    println(s"[stress] corpus = ${docs.count()} zipf docs (${copies}x of $nBase)")

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[stress] $label pairs=$rows took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("d03 minhash+LSH") {
      Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), 4, 32, 16, 0.5).count()
    }
    time("d02 exact prefix-filtered") {
      Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 4, 0.5).count()
    }
    // same banded candidates, character-grain verify: the threshold-
    // bounded DP prices each pair at ~len·(2% of len) char ops
    time("d16 edit-distance verify") {
      Dedup.editDistancePairs(docs, col("doc_id"), col("text"), 4, 32, 16, 2).count()
    }
    // contamination economics on a FRESH corpus of the same total doc
    // count: d09 shuffles the FULL train shingle vocabulary to a
    // distinct before the probe join; d14 prunes the train scan with a
    // broadcast Bloom over the eval shingles first (identical results —
    // the gate pins it; this measures the shuffle saved). Two fixture
    // choices matter, both matching production rather than the dedup
    // corpus above: (1) docs are fresh zipf draws, NOT replicas —
    // replicated docs share their shingles, so the vocabulary distinct
    // collapses map-side to ~the base vocabulary and the cost d14
    // exists to avoid never materializes (fresh text grows the
    // vocabulary ~linearly, the 100 TB reality); (2) ids are remapped
    // so the operators' doc_id%10==0 eval rule selects a FIXED 500-doc
    // eval slice (≈ the 50k-key regime d14's 2²⁰-bit filter is sized
    // for) while train grows with the corpus — benchmarks are
    // constant-size, the train side is what scales; a proportional 10%
    // slice would saturate the fixed filter and measure a mis-sized
    // sketch, not the algorithm.
    val contDir = "/tmp/graft_dedup_stress_cont"
    StressFixtures.zipfDocs(spark, copies * nBase, seed = 7L)
      .select(
        when(col("doc_id") < 500, col("doc_id") * 10)
          .otherwise(col("doc_id") * 10 + 1).as("doc_id"),
        col("text"))
      .write.mode("overwrite").parquet(s"$contDir/documents.parquet")
    // wall-time alone can't separate the two on this box (a 23M-long
    // distinct is sub-second at local[32]); the claim d14 exists for is
    // shuffle VOLUME, so measure it — at cluster scale shuffle bytes
    // are network+spill, the term that actually hurts
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def timeShuffle(label: String)(body: => Long): Unit = {
      org.apache.spark.sql.graft.Internals.drainListenerBus(spark.sparkContext)
      val b0 = shuffled.get
      val t0 = System.nanoTime()
      val rows = body
      val secs = (System.nanoTime() - t0) / 1e9
      // listener bus drains asynchronously — wait, don't sleep
      org.apache.spark.sql.graft.Internals.drainListenerBus(spark.sparkContext)
      println(f"[stress] $label pairs=$rows took $secs%.1f s " +
        f"shuffle=${(shuffled.get - b0) / 1024.0 / 1024.0}%.1f MiB")
    }
    // NOT .count(): the operators end in a left outer join whose right
    // side has a unique key, so a bare count is cardinality-preserving
    // and Catalyst prunes the ENTIRE contamination subtree — the first
    // cut of this harness timed a 500-row eval count and nothing else.
    // Summing a computed column forces the real work.
    timeShuffle("d09 contamination (full-vocab distinct)") {
      graft.queries.AnalyticsQueries.d09Contamination(spark, contDir)
        .agg(sum(col("n_contaminated"))).head.getLong(0)
    }
    timeShuffle("d14 contamination (bloom-pruned)") {
      graft.queries.AnalyticsQueries.d14BloomDecontam(spark, contDir)
        .agg(sum(col("n_contaminated"))).head.getLong(0)
    }
    spark.stop()
  }
}
