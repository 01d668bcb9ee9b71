package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic-corpus generators for the dev stress harnesses
  * (RetrievalStress / DedupStress / GraphStress).
  *
  * The round-7 stress fixtures replicated the gated testdata docs,
  * whose ~30-word uniform vocabulary makes every term a corpus-wide
  * stopword — so term-frequency-sensitive operators (a17/a19's
  * keyword channel, shingle bucketing) were measured only at their
  * pathological upper bound, and df-threshold pruning would empty the
  * channel entirely. These generators produce a Zipf(1.0) vocabulary
  * instead (the public convention for synthetic text: Powers,
  * NeMLaP'98), so posting-list lengths, shingle-bucket occupancies,
  * and df-based pruning behave like real text.
  *
  * Everything is DETERMINISTIC (xxhash64-seeded, no RNG state): the
  * same (nDocs, vocab, seed) always yields byte-identical corpora, so
  * stress numbers are reproducible run to run. Gated fixtures are
  * untouched — these write only under /tmp stress staging.
  */
object StressFixtures {

  /** Per-run /tmp staging path: fixture dirs keyed only by scenario
    * name let two concurrent stress runs on one machine overwrite or
    * rmrf each other's staged fixture mid-measurement, so every path
    * carries this JVM's PID. Fixtures are deleted at end of run
    * ([[rmrf]]); a crashed run's leftovers are orphaned by PID reuse
    * at worst, never silently shared. */
  def runDir(name: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stress_${name}_p${ProcessHandle.current().pid()}").toString

  /** Recursive delete for /tmp fixtures the stress harnesses stage —
    * unlike the localCheckpoints they replaced (freed with the JVM),
    * staged parquet outlives the run, and repeated multi-scale runs
    * would otherwise accumulate tens of GB under java.io.tmpdir. */
  def rmrf(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    ()
  }

  /** Zipf(1.0) rank sample: u ~ U(0,1) hashed from (seed, doc, pos),
    * rank = ⌊V^u⌋ clamped to [1, V] — the standard inverse-CDF
    * approximation for s=1 (P[rank ≤ r] = ln r / ln V, so
    * pmf(r) ≈ 1/(r·ln V)): rank 1 is ~ln(V)× more frequent than rank
    * V, with the heavy head and long tail real text has. */
  private def zipfWord(seed: Long, doc: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column, vocab: Int): org.apache.spark.sql.Column = {
    val u = (pmod(xxhash64(lit(seed), doc, pos), lit(1000000L)).cast("double") + 0.5) /
      1000000.0
    concat(lit("w"), least(greatest(
      floor(pow(lit(vocab.toDouble), u)).cast("long"), lit(1L)), lit(vocab.toLong)))
  }

  /** nDocs synthetic documents with Zipf(1.0) vocabulary: doc i has
    * 30 + (h(i) mod 40) tokens, token j drawn by [[zipfWord]]. Schema
    * matches the gated documents table's columns the text operators
    * read (doc_id, text, lang, source, n_chars). */
  def zipfDocs(spark: SparkSession, nDocs: Long, vocab: Int = 10000,
      seed: Long = 42L): DataFrame = {
    val doc = col("doc_id")
    spark.range(nDocs).toDF("doc_id")
      .withColumn("len", (pmod(xxhash64(lit(seed + 1), doc), lit(40L)) + 30).cast("int"))
      .select(doc,
        concat_ws(" ", transform(sequence(lit(1), col("len")),
          j => zipfWord(seed, doc, j, vocab))).as("text"))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("zipf"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }
}
