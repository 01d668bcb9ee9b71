package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: the COMPOSITE corpus-build pipeline (p07's
  * gate → split → exact-dedup → decontaminate → sample chain) under
  * corpus replication, with per-stage wall time AND shuffle-byte
  * accounting from a TaskEnd listener. Every family is stress-measured
  * in isolation (DedupStress, RetrievalStress, …); this harness
  * measures the interaction term a real corpus build pays — stage
  * boundaries sharing one Catalyst plan, the reused shingle-set
  * subtree, the dedup window's full-corpus shuffle feeding the
  * decontam join.
  *
  * Fixture: [[StressFixtures.zipfDocs]] text with a 5-stopword suffix
  * (the p07 quality gate keys on stopword presence, token count ≥ 50
  * and mean word length — raw zipf text has no English stopwords and
  * would gate to zero), replicated ×copies as EXACT copies under fresh
  * ids: the crawl shape where the gate scales with the crawl, the
  * exact-dedup window carries the full ×copies shuffle, and decontam
  * runs over the collapsed base-size survivor set.
  *
  * Reported per scale: prefix walls (each prefix re-runs the chain up
  * to its stage — deltas between rows isolate a stage's add-on cost),
  * the composite as-written, and a recompute-vs-localCheckpoint A/B on
  * the shingle-set frame the decontam stage consumes twice (p22's
  * question asked of the composite). Shuffle bytes are cluster-scale
  * truth: wall times on local[32] hide network cost that dominates on
  * 1000 executors. Results recorded in PERF.md.
  *
  * Usage: runMain graft.PipelineStress [nBase] [copiesCsv]
  */
object PipelineStress {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 20000L
    val copiesList =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // task-level shuffle accounting: LongAdders fed by TaskEnd events.
    // The listener bus is asynchronous — snapshots sleep briefly after
    // each job so in-flight events land first (a dev harness can
    // afford 300 ms; the alternative is a private[spark] API).
    val shufR = new LongAdder
    val shufW = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def mb(b: Long): String = f"${b / 1048576.0}%.1f MB"
    def timed(label: String)(body: => Long): Unit = {
      Thread.sleep(300)
      val r0 = shufR.sum(); val w0 = shufW.sum()
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[stress] $label rows=$rows wall=$wall%.1f s " +
        s"shufRead=${mb(shufR.sum() - r0)} shufWrite=${mb(shufW.sum() - w0)}")
    }

    copiesList.foreach { c =>
      val n = nBase * c
      val corpus = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft_stress_p07_${nBase}_$c").toString
      // exact ×copies replicas under fresh ids; stopword suffix keeps
      // the quality gate live on zipf vocabulary (see scaladoc). The
      // replica span is nBase+3, NOT nBase: a mod-10-preserving span
      // would align every replica with its base's train/eval side, and
      // the decontam join would never fire (a replica of a train doc
      // landing in the eval slice is exactly the contamination case).
      val span = nBase + 3
      StressFixtures.zipfDocs(spark, nBase)
        .crossJoin(spark.range(c).toDF("copy"))
        .select((col("doc_id") + col("copy") * span).as("doc_id"),
          concat(col("text"), lit(" the and of is a")).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(corpus)
      val docs = spark.read.parquet(corpus)
      println(s"[stress] p07 corpus ${c}x = ${docs.count()} docs " +
        s"($c exact copies of $nBase zipf base)")

      val st = graft.queries.AnalyticsQueries.p07Stages(docs)
      timed(s"${c}x prefix-1 quality gate")(st.quality.count())
      timed(s"${c}x prefix-2 eval shingle vocab")(st.evalVocab.count())
      timed(s"${c}x prefix-3 + exact dedup")(st.deduped.count())
      timed(s"${c}x prefix-4 + decontaminate")(st.clean.count())
      timed(s"${c}x composite as-written") {
        st.report.queryExecution.executedPlan.execute().count()
      }
      timed(s"${c}x composite, shingle-set frame checkpointed") {
        graft.queries.AnalyticsQueries.p07Stages(docs, checkpointSets = true)
          .report.queryExecution.executedPlan.execute().count()
      }
    }
    spark.stop()
  }
}
