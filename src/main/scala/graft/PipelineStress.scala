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
  * ids with a mod-10-PRESERVING span, so a base doc's replicas follow
  * it into train or eval (a span that rotates residues puts ~10% of
  * every doc's replicas in eval and decontam nukes the whole corpus —
  * the first cut of this harness measured exactly that degenerate
  * shape). Contamination is injected deterministically instead: base
  * docs with id ≡ 1 (mod 40) copy the text of their id−1 neighbor —
  * an eval-side doc — so a fixed ~2.5% of the corpus is a true
  * train/eval leak at every scale. The crawl shape follows: the gate
  * scales with the crawl, the exact-dedup window carries the full
  * ×copies shuffle, decontam runs over the collapsed base-size
  * survivor set and drops its stable contaminated fraction.
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
    require(nBase % 40 == 0,
      "nBase must be a multiple of 40: replication preserves id mod 10 " +
        "(train/eval side) and the injected-leak fraction stays exact")
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
    val shufRecs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          shufRecs.add(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def mb(b: Long): String = f"${b / 1048576.0}%.1f MB"
    def timed(label: String)(body: => Long): Unit = {
      org.apache.spark.sql.graft.Internals.drainListenerBus(spark.sparkContext)
      val r0 = shufR.sum(); val w0 = shufW.sum(); val c0 = shufRecs.sum()
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.Internals.drainListenerBus(spark.sparkContext)
      // bytes are post-compression (exact-dup text compresses ~100×,
      // so records are the incompressible volume truth alongside)
      println(f"[stress] $label rows=$rows wall=$wall%.1f s " +
        s"shufRead=${mb(shufR.sum() - r0)} shufWrite=${mb(shufW.sum() - w0)} " +
        s"shufRecords=${shufRecs.sum() - c0}")
    }

    copiesList.foreach { c =>
      val n = nBase * c
      val corpus = StressFixtures.runDir(s"p07_${nBase}_$c")
      // base corpus with injected leaks: id ≡ 1 (mod 40) docs carry
      // their id−1 (eval-side, since 40 | id−1 ⇒ 10 | id−1) neighbor's
      // text — the deterministic ~2.5% contamination decontam exists
      // to catch (see scaladoc for why replication can't provide it)
      val raw = StressFixtures.zipfDocs(spark, nBase)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val base = raw
        .join(raw.select((col("doc_id") + 1).as("doc_id"),
            col("text").as("eval_text")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 40 === 1, col("eval_text"))
            .otherwise(col("text")).as("text"),
          col("lang"), col("source"))
      base.crossJoin(spark.range(c).toDF("copy"))
        .select((col("doc_id") + col("copy") * nBase).as("doc_id"),
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
      StressFixtures.rmrf(spark, corpus) // staged fixtures don't outlive the run
    }
    spark.stop()
  }
}
