package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Dev measurement: the multimodal family's two structural cost
  * claims, measured under corpus replication (results in PERF.md):
  *
  *   1. the decode kernels are narrow 1:1 scans — wall-time linear in
  *      clip count, no shuffle term (m03's ImageIO decode+resize and
  *      m08's PCM decimation, the real codec paths);
  *   2. m07's near-dup tail costs by DISTINCT content, not corpus
  *      size: replicas reuse base payloads (content key = id mod
  *      nBase — a billion copies of one meme), so the exact-cluster
  *      aggregate collapses ×copies rows into a constant distinct-hash
  *      set and the banded Hamming self-join stays FLAT while only
  *      the linear decode scan grows.
  *
  * Usage: runMain graft.MultimodalStress [nBase] [copies]
  */
object MultimodalStress {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 5000L
    val copies = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[stress] $label rows=$rows took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    Seq(("1x", 1), (s"${copies}x", copies)).foreach { case (tag, c) =>
      val n = nBase * c
      // replicated corpora with CONSTANT distinct content: payload is a
      // pure function of id mod nBase. Materialized before timing so the
      // measured cost is the kernel, not the fixture synthesis.
      val png = spark.range(n).toDF("media_id").as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.synthPng(id % nBase, 16, 16))))
        .toDF("media_id", "payload")
        .localCheckpoint()
      val pcm = spark.range(n).toDF("media_id").as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.synthPcm(id % nBase, 800, 160))))
        .toDF("media_id", "payload")
        .localCheckpoint()
      println(s"[stress] $tag corpus = $n clips ($c copies of $nBase)")
      timed(s"$tag m03-kernel ImageIO decode+resize") {
        Multimodal.decodeResizeNearest(png, stride = 4).count()
      }
      timed(s"$tag m08-kernel PCM decimate") {
        Multimodal.decimatePcm(pcm, factor = 2).count()
      }
      val distinct = Multimodal.aHash8(png).toDF()
        .select(col("hash_hi"), col("hash_lo")).distinct().count()
      timed(s"$tag m07 near-dup tail (distinct hashes = $distinct)") {
        graft.queries.AnalyticsQueries.m07NearDupFrom(png).count()
      }
      // m09's serving split: decode-once INGEST persists the 24-byte
      // hash rows; warm near-dup SERVING reads the index, never
      // pixels. The ingest row should track the linear decode scan
      // above; the warm-serve rows should stay flat in copies (cost =
      // index bytes + distinct-content cluster join) — the a19
      // economics on the media channel.
      val ihStage = StressFixtures.runDir(s"m09_$tag")
      timed(s"$tag m09 ingest: decode+hash -> stored index") {
        Multimodal.aHash8(png).toDF()
          .select(col("media_id"), col("hash_hi"), col("hash_lo"))
          .write.mode("overwrite").parquet(ihStage)
        spark.read.parquet(ihStage).count()
      }
      (1 to 2).foreach { i =>
        timed(s"$tag m09 warm near-dup serve #$i from stored hashes (no decode)") {
          graft.queries.AnalyticsQueries.nearDupFromHashes(
            spark.read.parquet(ihStage)).count()
        }
      }
      // m10's generational layout: the SAME hash rows split across a
      // frozen base root and a landed segment root, served as a union.
      // The generational serve must price identically to the monolith
      // (hash rows are pure per-media functions; the union adds one
      // scan boundary, no extra shuffle) — the measured form of m10's
      // "appends never degrade the serve path" claim.
      val genBase = StressFixtures.runDir(s"m10b_$tag")
      val genSeg = StressFixtures.runDir(s"m10s_$tag")
      val ih = spark.read.parquet(ihStage)
      ih.filter(col("media_id") % 2 === 0).write.mode("overwrite").parquet(genBase)
      ih.filter(col("media_id") % 2 === 1).write.mode("overwrite").parquet(genSeg)
      timed(s"$tag m10 warm near-dup serve from base ∪ segment (no decode)") {
        graft.queries.AnalyticsQueries.nearDupFromHashes(
          spark.read.parquet(genBase)
            .unionByName(spark.read.parquet(genSeg))).count()
      }
      // m11's compaction: base ∪ segment re-merged into one
      // media_id-sorted table — a linear rewrite of INDEX bytes (never
      // pixels), priced here as the ingest-side cost appends defer;
      // the compacted warm serve must price at-or-below the
      // generational union (one scan boundary instead of two).
      val compacted = StressFixtures.runDir(s"m11_$tag")
      timed(s"$tag m11 compaction: base ∪ segment -> one sorted table (index bytes only)") {
        spark.read.parquet(genBase).unionByName(spark.read.parquet(genSeg))
          .repartitionByRange(2, col("media_id"))
          .sortWithinPartitions(col("media_id"))
          .write.mode("overwrite").parquet(compacted)
        spark.read.parquet(compacted).count()
      }
      timed(s"$tag m11 warm near-dup serve from compacted (no decode)") {
        graft.queries.AnalyticsQueries.nearDupFromHashes(
          spark.read.parquet(compacted)).count()
      }
      // m13's STEADY-STATE LOOP: two merge rounds, tombstones applied
      // at the second (base ∪ half-segment → merge; merged ∪ rest,
      // minus retracted ids → delete-applying merge) — both linear
      // rewrites of 24-byte index bytes, so the loop's recurring cost
      // must stay flat however many rounds have run before.
      val cyc1 = StressFixtures.runDir(s"m13g1_$tag")
      val cyc2 = StressFixtures.runDir(s"m13f_$tag")
      timed(s"$tag m13 two-merge cycle (merge, tombstones, delete-applying merge)") {
        spark.read.parquet(genBase)
          .unionByName(
            spark.read.parquet(genSeg).filter(col("media_id") % 4 === 1))
          .repartitionByRange(2, col("media_id"))
          .sortWithinPartitions(col("media_id"))
          .write.mode("overwrite").parquet(cyc1)
        spark.read.parquet(cyc1)
          .unionByName(
            spark.read.parquet(genSeg).filter(col("media_id") % 4 === 3))
          .join(broadcast(ih.filter(pmod(col("media_id"), lit(7)) === 3)
            .select(col("media_id"))), Seq("media_id"), "left_anti")
          .repartitionByRange(2, col("media_id"))
          .sortWithinPartitions(col("media_id"))
          .write.mode("overwrite").parquet(cyc2)
        spark.read.parquet(cyc2).count()
      }
      timed(s"$tag m13 warm near-dup serve from cycled table (no decode)") {
        graft.queries.AnalyticsQueries.nearDupFromHashes(
          spark.read.parquet(cyc2)).count()
      }
      StressFixtures.rmrf(spark, cyc1)
      StressFixtures.rmrf(spark, cyc2)
      StressFixtures.rmrf(spark, compacted)
      StressFixtures.rmrf(spark, genBase)
      StressFixtures.rmrf(spark, genSeg)
      // skew audit on the REAL self-join input: the join partitions on
      // (band, key); the exact-cluster collapse must keep the hottest
      // bucket at per-band DISTINCT-hash collision scale — constant
      // across replication (every image here has ×copies exact
      // copies), never corpus-multiplicity scale
      val hot = graft.queries.AnalyticsQueries.bandedClusters(
          spark.read.parquet(ihStage))
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("sz"))
        .agg(max(col("sz")).as("mx")).head.getLong(0)
      println(s"[stress] $tag m07/m09 banded-join hottest (band,key) bucket = $hot cluster rows")
      StressFixtures.rmrf(spark, ihStage) // staged fixtures don't outlive the run
    }
    spark.stop()
  }
}
