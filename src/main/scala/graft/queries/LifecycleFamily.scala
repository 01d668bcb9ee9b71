package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Lifecycle-cycle family (a37–a39, m13) — the 100-TB STEADY STATE as
  * gated queries. Every per-channel lifecycle step is pinned singly
  * elsewhere (append a20/a30/a32/m10/a12, compaction a35/a33/m11/a15,
  * deletes a36/a34/m12/a16, streamed twins s14–s31), but a production
  * index never runs one step once: it loops — append a segment,
  * absorb deletes, compact with purge, append again, merge again. Each
  * query here drives one channel through TWO generations with deletes
  * interleaved between the merges:
  *
  *   gen0 (frozen base) + segment 1  ── merge 1 ──▶ compacted₁
  *   tombstones arrive (doc_id ≡ 3 mod 7)
  *   compacted₁ + segment 2          ── merge 2 (delete-applying) ──▶ final
  *
  * and pins the FINAL index ≡ a fresh build over the surviving corpus
  * (for the keyword channel: including the re-stat — df/idf over
  * survivors, the drift a20's appends absorbed now fully repaid across
  * two merge rounds). The second merge is the load-bearing novelty:
  * its input is itself a compaction OUTPUT, so these queries prove the
  * merge operators are CLOSED under iteration — re-stat of a re-stat,
  * purge during merge, pushdown surviving the twice-merged layout
  * (PlanAuditSpec) — which single-step pins cannot show.
  *
  * Segment membership: gen0 = even ids, segment 1 = ids ≡ 1 (mod 4),
  * segment 2 = ids ≡ 3 (mod 4) — a disjoint cover of the corpus, so
  * the surviving corpus after tombstones is exactly `id % 7 <> 3` and
  * the existing delete oracles (a34/a16/m12) gate three of the four
  * cycles unchanged; the keyword cycle re-stats, so it gets its own
  * fresh-build-over-survivors oracle. All merges read INDEX BYTES
  * only — no re-tokenization, no re-encode, no decode (each channel's
  * compaction economics, now exercised twice in sequence).
  * CONVENTION: task closures (flatMapGroups/mapPartitions/...)
  * must NOT reference trait-level vals/defs — that captures the
  * whole facade (Task-not-serializable); hoist to a local first.
  * `tools/closurelint.py` fails CI on the next violation; it also
  * bans trait-level `object`s: JVM-shared state goes at file top
  * level. */
private[queries] trait LifecycleFamily { this: AnalyticsQueries.type =>

  import Sql._

  /** The a37 keyword two-merge cycle stage. Both merges are a35's
    * index-bytes-only RE-STAT ([[kwRecoverTf]]: tf = impact DIV idf,
    * exact; then [[writeKwLayout]], the one writer every fresh build
    * uses): merge 1 re-stats base ∪ segment 1; tombstones then land
    * beside the index; merge 2 recovers tf from the COMPACTED merge-1
    * output (a re-stat of a re-stat — closure under iteration) plus
    * segment 2, drops tombstoned docs BEFORE the stat pass, and
    * re-stats over the survivor count — so deleted docs stop
    * inflating df/idf exactly at the delete-applying merge, Lucene's
    * merge semantics. Meta (n_live, n_tomb) written LAST. */
  private[queries] def stageA37KwCycle(spark: SparkSession, dir: String,
      force: Boolean = false, tag: String = "a37kw"): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/documents.parquet")
    val stage = PipelineQueries.staging(tag, s"$dir#$fp")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/meta"))) {
      val base = stageA20CorpusKwIndex(spark, dir)
      val seg1 = stageKwIndexTable(spark, dir, "a37s1",
        col("doc_id") % 4 === 1, force = false)
      def nOf(st: String): Long =
        spark.read.parquet(s"$st/meta").head.getAs[Long]("n")
      // merge 1: re-stat over gen0 ∪ segment 1 (no deletes yet) —
      // a35's merge verbatim, landed as an intermediate generation
      val n1 = nOf(base) + nOf(seg1)
      writeKwLayout(spark, s"$stage/gen1",
        kwRecoverTf(spark, base).unionByName(kwRecoverTf(spark, seg1)), n1)
      // tombstones arrive between the merges (ids-only, broadcastable)
      Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/tombstones")
      val nTomb = spark.read.parquet(s"$stage/tombstones").count()
      val seg2 = stageKwIndexTable(spark, dir, "a37s2",
        col("doc_id") % 4 === 3, force = false)
      // merge 2, delete-applying: tf recovered from the COMPACTED
      // merge-1 layout ∪ segment 2, tombstoned docs dropped before
      // the stat pass, df/idf re-derived over the SURVIVOR count
      val tf2 = kwRecoverTf(spark, s"$stage/gen1")
        .unionByName(kwRecoverTf(spark, seg2))
        .join(broadcast(spark.read.parquet(s"$stage/tombstones")),
          Seq("doc_id"), "left_anti")
      // n_live COUNTED from the anti-joined survivor rows (every doc
      // in testdata tokenizes to ≥1 term, so distinct doc_ids = docs);
      // the arithmetic n1 + |seg2| − |tombstones| holds only while
      // gen0/seg1/seg2 form an exact disjoint cover AND every
      // tombstone falls inside it — assert the equivalence so a
      // segment-predicate edit fails HERE at build time instead of
      // silently skewing df/idf until LifecycleCycleSpec notices
      val nLive = tf2.select(col("doc_id")).distinct().count()
      val arith = n1 + nOf(seg2) - nTomb
      require(nLive == arith,
        s"a37 survivor count drifted: counted=$nLive, arithmetic=$arith — " +
          "segment predicates no longer cover, or a tombstone fell outside")
      writeKwLayout(spark, stage, tf2, nLive)
      spark.range(1).select(lit(nLive).as("n_live"), lit(nTomb).as("n_tomb"))
        .write.mode("overwrite").parquet(s"$stage/meta")
    }
    stage
  }

  /** Test hook: the a37 twice-merged keyword staging path. */
  def a37KwCycleStage(spark: SparkSession, dir: String): String =
    stageA37KwCycle(spark, dir)

  /** Test hook (StagingProtocolSpec): the keyword cycle staged under a
    * DEDICATED tag, so crash injection can physically corrupt its
    * multi-artifact intermediates (gen1, tombstones) without touching
    * the shared a37 stage every other suite and bench serves from. */
  def a37KwCycleStageTagged(spark: SparkSession, dir: String, tag: String,
      force: Boolean = false): String =
    stageA37KwCycle(spark, dir, force, tag)

  /** Stress hook: pre-build the cycle's INPUTS (base + both segments,
    * each priced as ingest elsewhere) so a forced cycle rebuild times
    * exactly the two re-stat merges + the tombstone landing — the
    * steady-state loop's recurring cost, index bytes only. */
  def a37CycleInputsStage(spark: SparkSession, dir: String): Unit = {
    stageA20CorpusKwIndex(spark, dir)
    stageKwIndexTable(spark, dir, "a37s1", col("doc_id") % 4 === 1, force = false)
    stageKwIndexTable(spark, dir, "a37s2", col("doc_id") % 4 === 3, force = false)
  }

  /** Stress hook: re-run the two-merge cycle unconditionally (inputs
    * build-if-missing — pre-stage via [[a37CycleInputsStage]]). */
  def rebuildA37CycleStage(spark: SparkSession, dir: String): String =
    stageA37KwCycle(spark, dir, force = true)

  /** Test hook: a fresh single-pass keyword build over the surviving
    * corpus — the ground truth the cycle's final layout is pinned
    * against (terms, postings AND served search). */
  def a37FreshSurvivorKwStage(spark: SparkSession, dir: String): String =
    stageKwIndexTable(spark, dir, "a37fresh",
      pmod(col("doc_id"), lit(7)) =!= 3, force = false)

  /** a37 — keyword search served after the FULL lifecycle cycle:
    * build → append seg1 → compact/re-stat → deletes → append seg2 →
    * delete-applying compact/re-stat. Search is a19's pruned probe
    * verbatim over the twice-merged index; hash-gated with a
    * fresh-build-over-survivors ORACLE (df/idf over `doc_id % 7 <> 3`
    * only — the post-purge re-stat is what distinguishes this from
    * a36's frozen-stats soft delete). Queries stay external text, so
    * a tombstoned doc still asks. */
  def a37KeywordLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageA37KwCycle(spark, dir)
    kwPrunedSearch(spark, dir,
      spark.read.parquet(s"$stage/terms")
        .select(col("term"), col("term_id"), col("df")),
      spark.read.parquet(s"$stage/postings"))
  }

  /** The a38 token two-merge cycle stage: token-hash rows are pure
    * per-doc functions, so both merges are pure LAYOUT rewrites (a33's
    * linear re-merge of ~72 B/doc index bytes — no recompute exists to
    * run). Merge 2's input is merge 1's output ∪ segment 2, tombstoned
    * rows dropped during the merge — the delete-applying compaction
    * a34's purged table previews, here produced by the actual loop. */
  private[queries] def stageA38TokenCycle(spark: SparkSession, dir: String,
      force: Boolean = false): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/documents.parquet")
    val stage = PipelineQueries.staging("a38th", s"$dir#$fp")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/meta"))) {
      val base = stageA30TokenBase(spark, dir)
      val seg1 = stageTokenTable(spark, dir, "a38s1",
        col("doc_id") % 4 === 1, partitions = 2, force = false)
      spark.read.parquet(s"$base/tokens")
        .unionByName(spark.read.parquet(s"$seg1/tokens"))
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").parquet(s"$stage/gen1")
      Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/tombstones")
      val seg2 = stageTokenTable(spark, dir, "a38s2",
        col("doc_id") % 4 === 3, partitions = 2, force = false)
      spark.read.parquet(s"$stage/gen1")
        .unionByName(spark.read.parquet(s"$seg2/tokens"))
        .join(broadcast(spark.read.parquet(s"$stage/tombstones")),
          Seq("doc_id"), "left_anti")
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").parquet(s"$stage/tokens")
      spark.read.parquet(s"$stage/tokens").agg(count(lit(1)).as("n_live"))
        .crossJoin(spark.read.parquet(s"$stage/tombstones")
          .agg(count(lit(1)).as("n_tomb")))
        .write.mode("overwrite").parquet(s"$stage/meta")
    }
    stage
  }

  /** Test hook: the a38 twice-merged token staging path. */
  def a38TokenCycleStage(spark: SparkSession, dir: String): String =
    stageA38TokenCycle(spark, dir)

  /** Stress hook: pre-build the a38 cycle's INPUTS (base + both token
    * segments — each segment's tokenize+hash is ingest, priced by the
    * a28 build row) so a forced cycle rebuild times exactly the two
    * layout merges + the tombstone landing — the token loop's
    * recurring cost, ~72 B/doc index bytes, no tokenize anywhere. */
  def a38CycleInputsStage(spark: SparkSession, dir: String): Unit = {
    stageA30TokenBase(spark, dir)
    stageTokenTable(spark, dir, "a38s1", col("doc_id") % 4 === 1,
      partitions = 2, force = false)
    stageTokenTable(spark, dir, "a38s2", col("doc_id") % 4 === 3,
      partitions = 2, force = false)
  }

  /** Stress hook: re-run the a38 two-merge cycle unconditionally
    * (inputs build-if-missing — pre-stage via
    * [[a38CycleInputsStage]]). */
  def rebuildA38CycleStage(spark: SparkSession, dir: String): String =
    stageA38TokenCycle(spark, dir, force = true)

  /** a38 — the late-interaction re-rank served after the full token
    * cycle (two generations appended, deletes interleaved, both
    * compacted away): a29's serving composition reads ONE
    * doc_id-sorted table that is provably ≡ a fresh token build over
    * the survivors (spec-pinned row for row). Deletion is TOTAL —
    * tombstoned docs are neither candidates nor queryable (a34's
    * semantics), so a34's ORACLE gates the cycle unchanged. */
  def a38TokenLifecycle(spark: SparkSession, dir: String): DataFrame =
    maxSimRerankServed(spark, dir,
      spark.read.parquet(s"${stageA38TokenCycle(spark, dir)}/tokens"))

  /** A segment's code rows encoded against the FROZEN a12 codebooks
    * (FAISS add), fingerprint-keyed build-if-missing: encoding is the
    * segment's INGEST cost — paid once when the segment arrives
    * (a12's append path prices it), never re-paid by a merge. Staged
    * separately from the cycle so a forced cycle rebuild times the
    * merges alone. Meta (n) written LAST. */
  private[queries] def stageA39Delta(spark: SparkSession, dir: String,
      tag: String, residue: Int): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/embeddings.parquet")
    val stage = PipelineQueries.staging(tag, s"$dir#$fp")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$stage/meta"))) {
      val a12 = stageA12Index(spark, dir)
      val cbAll = spark.read.parquet(s"$a12/codebooks")
      pqEncodeAgainst(pqSubcodes(Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 4 === residue)), cbAll)
        .write.mode("overwrite").parquet(s"$stage/codes")
      spark.read.parquet(s"$stage/codes").agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(s"$stage/meta")
    }
    stage
  }

  /** The a39 vector two-merge cycle stage: codebooks stay FROZEN for
    * the whole loop (a12's protocol — segments are ENCODED against
    * them, never retrained; re-training is the scheduled offline event,
    * not a merge side effect), so both merges are layout rewrites of
    * 4 B/vector code rows and the purge drops tombstoned code rows
    * with the codebooks untouched (a16's purged-codes-same-codebooks,
    * produced here by the actual loop). Segment encodes live in their
    * own stages ([[stageA39Delta]] — ingest cost, paid at arrival),
    * so a forced rebuild here prices exactly the loop's recurring
    * work: two merges + the tombstone landing. */
  private[queries] def stageA39VecCycle(spark: SparkSession, dir: String,
      force: Boolean = false): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/embeddings.parquet")
    val stage = PipelineQueries.staging("a39pq", s"$dir#$fp")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/meta"))) {
      val a12 = stageA12Index(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      // segment 1 arrives pre-encoded (its own ingest stage), then
      // merge 1: gen0 codes ∪ segment-1 codes, one sorted layout
      val d1 = stageA39Delta(spark, dir, "a39d1", 1)
      spark.read.parquet(s"$a12/codes")
        .unionByName(spark.read.parquet(s"$d1/codes"))
        .repartitionByRange(2, col("vec_id"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite").parquet(s"$stage/gen1")
      emb.filter(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/tombstones")
      val d2 = stageA39Delta(spark, dir, "a39d2", 3)
      // merge 2, delete-applying: twice-merged codes minus tombstones
      spark.read.parquet(s"$stage/gen1")
        .unionByName(spark.read.parquet(s"$d2/codes"))
        .join(broadcast(spark.read.parquet(s"$stage/tombstones")),
          Seq("vec_id"), "left_anti")
        .repartitionByRange(2, col("vec_id"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite").parquet(s"$stage/codes")
      // n_corpus sizes the serve-time shortlist exactly as a15/a16 do
      emb.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(spark.read.parquet(s"$stage/tombstones")
          .agg(count(lit(1)).as("n_tomb")))
        .write.mode("overwrite").parquet(s"$stage/meta")
    }
    stage
  }

  /** Test hook: the a39 twice-merged code staging path. */
  def a39VecCycleStage(spark: SparkSession, dir: String): String =
    stageA39VecCycle(spark, dir)

  /** Stress hook: pre-build the a39 cycle's INPUTS (trained index +
    * both segments pre-ENCODED against the frozen codebooks) so a
    * forced cycle rebuild times exactly the two layout merges + the
    * tombstone landing — the vector loop's recurring cost, 4 B/vector
    * code rows, no encoding anywhere. */
  def a39CycleInputsStage(spark: SparkSession, dir: String): Unit = {
    stageA12Index(spark, dir)
    stageA39Delta(spark, dir, "a39d1", 1)
    stageA39Delta(spark, dir, "a39d2", 3)
  }

  /** Stress hook: re-run the a39 two-merge cycle unconditionally
    * (inputs build-if-missing — pre-stage via
    * [[a39CycleInputsStage]]). */
  def rebuildA39CycleStage(spark: SparkSession, dir: String): String =
    stageA39VecCycle(spark, dir, force = true)

  /** a39 — PQ search served after the full vector cycle: the ADC +
    * exact-re-rank algebra over the twice-merged, purged code table
    * with the FROZEN a12 codebooks. Hash-gated with a16's ORACLE —
    * however many merge rounds the loop ran, serving must be
    * indistinguishable from the single soft-delete step (and from
    * a16's one-shot purge, spec-pinned row for row). Queries are
    * external embeddings, so a tombstoned vector still asks. */
  def a39VectorLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageA39VecCycle(spark, dir)
    val a12 = stageA12Index(spark, dir)
    val cbAll = spark.read.parquet(s"$a12/codebooks")
    val n = spark.read.parquet(s"$stage/meta").head.getAs[Long]("n_corpus")
    val qside = pqSubcodes(Tables.embeddings(spark, dir).filter(col("vec_id") < 20))
      .withColumnRenamed("vec_id", "query_id")
    pqAdcTail(spark, dir, spark.read.parquet(s"$stage/codes"),
      pqLutsFrom(qside, cbAll), math.max(PqL.toLong, n / 20).toInt)
  }

  /** The m13 image two-merge cycle stage: perceptual hashes are pure
    * per-media functions, so both merges are linear rewrites of
    * 24-byte hash rows — ZERO decode anywhere in the loop (each
    * segment paid its own decode once, at its own ingest). */
  private[queries] def stageM13ImageCycle(spark: SparkSession, dir: String,
      force: Boolean = false): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/documents.parquet")
    val stage = PipelineQueries.staging("m13ih", s"$dir#$fp")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/meta"))) {
      val base = stageM10Generation(spark, dir, "m10ihbase",
        col("media_id") % 2 === 0)
      val seg1 = stageM10Generation(spark, dir, "m13s1",
        col("media_id") % 4 === 1)
      spark.read.parquet(s"$base/hashes")
        .unionByName(spark.read.parquet(s"$seg1/hashes"))
        .repartitionByRange(2, col("media_id"))
        .sortWithinPartitions(col("media_id"))
        .write.mode("overwrite").parquet(s"$stage/gen1")
      Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(7)) === 3)
        .select(col("doc_id").as("media_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/tombstones")
      val seg2 = stageM10Generation(spark, dir, "m13s2",
        col("media_id") % 4 === 3)
      spark.read.parquet(s"$stage/gen1")
        .unionByName(spark.read.parquet(s"$seg2/hashes"))
        .join(broadcast(spark.read.parquet(s"$stage/tombstones")),
          Seq("media_id"), "left_anti")
        .repartitionByRange(2, col("media_id"))
        .sortWithinPartitions(col("media_id"))
        .write.mode("overwrite").parquet(s"$stage/hashes")
      spark.read.parquet(s"$stage/hashes").agg(count(lit(1)).as("n_live"))
        .crossJoin(spark.read.parquet(s"$stage/tombstones")
          .agg(count(lit(1)).as("n_tomb")))
        .write.mode("overwrite").parquet(s"$stage/meta")
    }
    stage
  }

  /** Test hook: the m13 twice-merged hash staging path. */
  def m13ImageCycleStage(spark: SparkSession, dir: String): String =
    stageM13ImageCycle(spark, dir)

  /** m13 — image near-dedup served after the full media cycle: the
    * exact-cluster → banded-Hamming tail over the twice-merged,
    * purged hash table. Deletion preceded the cluster aggregate (it
    * happened at merge time), so surviving clusters re-elected their
    * representatives and recounted members — exactly m12's semantics,
    * whose ORACLE (m07's arithmetic over the retracted corpus) gates
    * the cycle unchanged. */
  def m13ImageLifecycle(spark: SparkSession, dir: String): DataFrame =
    nearDupFromHashes(
      spark.read.parquet(s"${stageM13ImageCycle(spark, dir)}/hashes"))

  /** The a40 COMMIT LOG stage: the keyword channel's lifecycle epochs
    * recorded as a versioned metadata log (p23's lakehouse commit-log
    * pattern applied to the INDEX rather than the table). The log is
    * four rows — (version, kind, path) — pointing at artifacts the
    * lifecycle ALREADY retains: v0 the frozen a20 base build, v1 the
    * a37 cycle's first re-stat merge output, v2 the tombstone id list
    * (merge-on-read — no layout rewrite happened at delete time), v3
    * the delete-applying second merge. Building the log costs ZERO
    * index bytes (TimeTravelSpec pins the stage dir to commit_log +
    * marker only): at 100 TB, index history is free until vacuum
    * because generational merging already keeps every epoch's layout
    * on disk — the log just names them. Marker written LAST. */
  private[queries] def stageA40CommitLog(spark: SparkSession, dir: String,
      force: Boolean = false): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/documents.parquet")
    val stage = PipelineQueries.staging("a40log", s"$dir#$fp")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // dependency revalidation OUTSIDE the marker check: the log only
    // NAMES the lifecycle's artifacts, so a surviving log marker must
    // not outlive the stages it points at (both build-if-missing —
    // warm cost is two marker stats)
    val cyc = stageA37KwCycle(spark, dir)
    val base = stageA20CorpusKwIndex(spark, dir)
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/done"))) {
      import spark.implicits._
      Seq((0, "layout", base), (1, "layout", s"$cyc/gen1"),
          (2, "tombstones", s"$cyc/tombstones"), (3, "layout", cyc))
        .toDF("version", "kind", "path")
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/commit_log")
      spark.range(1).write.mode("overwrite").parquet(s"$stage/done")
    }
    stage
  }

  /** Test hook: the a40 commit-log staging path. */
  def a40CommitLogStage(spark: SparkSession, dir: String): String =
    stageA40CommitLog(spark, dir)

  /** Stress hook: re-land the a40 commit log unconditionally (the
    * lifecycle artifacts build-if-missing) — prices exactly what
    * recording an epoch costs at scale: one metadata row per retained
    * artifact, zero index bytes. */
  def rebuildA40CommitLogStage(spark: SparkSession, dir: String): String =
    stageA40CommitLog(spark, dir, force = true)

  /** The AS-OF snapshot serve over a keyword-index commit log: resolve
    * the newest layout commit with version ≤ v, apply any tombstone
    * commits in (layout_version, v] merge-on-read (broadcast ids-only
    * anti-join at scoring, stats FROZEN — a36's live-docs semantics;
    * tombstones at or before the layout's version are already folded
    * into it by a delete-applying merge), then run a19's pruned probe
    * over that snapshot. Scan cost is the SNAPSHOT's bytes only —
    * TimeTravelSpec pins that an epoch's plan never references another
    * epoch's files. Shared by a40 (shared-artifact log) and p28
    * (owned-copy log, so vacuum can physically reclaim). */
  private[queries] def kwServeAsOfLog(spark: SparkSession, dir: String,
      logStage: String, v: Int): DataFrame = {
    val (layout, tombs) = PipelineQueries.resolveAsOf(
      PipelineQueries.readCommitLog(spark, logStage), v, logStage)
    kwServeSnapshot(spark, dir, layout, tombs)
  }

  /** The keyword serve over one RESOLVED snapshot — (layout, pending
    * tombstone lists) however they were resolved: from a shared log
    * (a40), an owned log (p28), or a replica's shipped artifacts
    * (s38). Tombstones apply merge-on-read, stats frozen. */
  private[queries] def kwServeSnapshot(spark: SparkSession, dir: String,
      layout: String, tombs: Seq[String]): DataFrame = {
    val postings = tombs.foldLeft(spark.read.parquet(s"$layout/postings")) {
      (p, t) => p.join(broadcast(spark.read.parquet(t)), Seq("doc_id"), "left_anti")
    }
    kwPrunedSearch(spark, dir,
      spark.read.parquet(s"$layout/terms")
        .select(col("term"), col("term_id"), col("df")),
      postings)
  }

  /** Test hook (TimeTravelSpec): one epoch's serve off the a40 log. */
  def a40ServeAsOf(spark: SparkSession, dir: String, v: Int): DataFrame =
    kwServeAsOfLog(spark, dir, stageA40CommitLog(spark, dir), v)

  /** a40 — INDEX TIME TRAVEL: the a19 probe served AS OF every epoch
    * of the keyword index's lifecycle, off the commit log. Epoch 0 is
    * the frozen base build (stats over the even-id half); epoch 1 the
    * first re-stat merge (stats over `doc_id % 4 <> 3`); epoch 2 the
    * soft-delete snapshot — SAME layout and stats as epoch 1, the
    * tombstone list applied merge-on-read at scoring only (a36's
    * frozen-stats semantics, reproduced here by log resolution rather
    * than by a dedicated query); epoch 3 the delete-applying second
    * merge (fresh stats over the full-corpus survivors). The oracle
    * replays all four epochs from their definitions — each epoch's
    * df/idf over ITS population, epoch 2's delete visible in scoring
    * but invisible in stats — so one hash gates both the snapshot
    * RESOLUTION rule (layout ≤ v, tombstones after it) and every
    * epoch's scoring. Queries stay external text in every epoch: a
    * doc deleted in epoch 3 still asks. Reproducibility is the 100-TB
    * point: "which index did this training run retrieve from" has an
    * exact, replayable answer as long as vacuum hasn't reclaimed the
    * epoch (p28 prices that reclaim). */
  def a40IndexTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageA40CommitLog(spark, dir)
    (0 to 3).map { v =>
      kwServeAsOfLog(spark, dir, stage, v).withColumn("version", lit(v))
    }.reduce(_ unionByName _)
      .select(col("version"), col("query_id"), col("kw_rank"),
        col("doc_id"), col("kw_score"))
      .orderBy(col("version"), col("query_id"), col("kw_rank"))
  }

  /** The a41 commit-log stage — a40's discipline on the VECTOR
    * channel, proving the log is channel-agnostic: four metadata rows
    * naming artifacts the a39 cycle and the a12 index already retain
    * (v0 the frozen even-half code table, v1 the first layout merge's
    * output, v2 the tombstone id list, v3 the purged twice-merged
    * codes). Codebooks are NOT epoch state: they stay frozen for the
    * whole lifecycle (a12's protocol — retraining is a scheduled
    * offline event that would open a new log), so every epoch serves
    * through the SAME broadcast LUTs and only the code-row population
    * time-travels. Zero index bytes, marker last, dependencies
    * revalidated outside the marker check (a40's self-heal rule). */
  private[queries] def stageA41VecCommitLog(spark: SparkSession,
      dir: String, force: Boolean = false): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/embeddings.parquet")
    val stage = PipelineQueries.staging("a41log", s"$dir#$fp")
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cyc = stageA39VecCycle(spark, dir)
    val a12 = stageA12Index(spark, dir)
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/done"))) {
      import spark.implicits._
      Seq((0, "layout", s"$a12/codes"), (1, "layout", s"$cyc/gen1"),
          (2, "tombstones", s"$cyc/tombstones"), (3, "layout", s"$cyc/codes"))
        .toDF("version", "kind", "path")
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/commit_log")
      spark.range(1).write.mode("overwrite").parquet(s"$stage/done")
    }
    stage
  }

  /** Stress/test hook: re-land the a41 commit log unconditionally (the
    * lifecycle artifacts build-if-missing) — the same rebuild parity
    * a40 has: one metadata row per retained artifact, zero index
    * bytes. */
  def rebuildA41CommitLogStage(spark: SparkSession, dir: String): String =
    stageA41VecCommitLog(spark, dir, force = true)

  /** The vector channel's as-of serve: same log-resolution rule as
    * [[kwServeAsOfLog]] (newest layout ≤ v; tombstone commits after it
    * anti-joined merge-on-read — a16's soft-delete semantics falling
    * out of resolution), then a16's ADC + exact-re-rank serve over the
    * snapshot's code rows with the FROZEN a12 codebooks. Shortlist
    * depth is sized by the full-corpus count in EVERY epoch — depth is
    * a serving parameter, not index state, so it must not time-travel
    * (the oracle sizes identically). */
  private[queries] def pqServeAsOfLog(spark: SparkSession, dir: String,
      logStage: String, v: Int): DataFrame = {
    val (layout, tombs) = PipelineQueries.resolveAsOf(
      PipelineQueries.readCommitLog(spark, logStage), v, logStage)
    pqServeSnapshot(spark, dir, layout, tombs)
  }

  /** The vector serve over one RESOLVED snapshot — the ADC +
    * exact-re-rank tail with the FROZEN a12 codebooks, shared by the
    * as-of serves (a41/p30) and the replica consumer (s40). */
  private[queries] def pqServeSnapshot(spark: SparkSession, dir: String,
      layout: String, tombs: Seq[String]): DataFrame = {
    val codes = tombs.foldLeft(spark.read.parquet(layout)) { (c, t) =>
      c.join(broadcast(spark.read.parquet(t)), Seq("vec_id"), "left_anti")
    }
    val a12 = stageA12Index(spark, dir)
    val cbAll = spark.read.parquet(s"$a12/codebooks")
    val n = spark.read.parquet(s"$a12/meta").head.getAs[Long]("n")
    val qside = pqSubcodes(Tables.embeddings(spark, dir).filter(col("vec_id") < 20))
      .withColumnRenamed("vec_id", "query_id")
    pqAdcTail(spark, dir, codes, pqLutsFrom(qside, cbAll),
      math.max(PqL.toLong, n / 20).toInt)
  }

  /** Test hook (TimeTravelSpec): one epoch's serve off the a41 log. */
  def a41ServeAsOf(spark: SparkSession, dir: String, v: Int): DataFrame =
    pqServeAsOfLog(spark, dir, stageA41VecCommitLog(spark, dir), v)

  /** a41 — INDEX TIME TRAVEL on the vector channel: the a16-style PQ
    * search served AS OF every epoch of the a39 lifecycle, off the
    * commit log. Epoch 0 is the frozen even-half index; epoch 1 the
    * first layout merge (gen0 ∪ segment 1); epoch 2 the soft-delete
    * snapshot — SAME code rows as epoch 1, tombstones anti-joined at
    * serve (a16's search-invisible deletes, produced by log resolution
    * rather than a dedicated query); epoch 3 the purged twice-merged
    * table. One oracle replays all four epochs: the SAME frozen-
    * codebook training (even half, a12's protocol) in every epoch,
    * only the candidate population varying — which is exactly the
    * invariant a vector store's history must keep (codes never
    * re-encode, codebooks never retrain, deletes never reshape
    * surviving rows). With a40 this pins the commit-log discipline as
    * CHANNEL-AGNOSTIC: the resolution rule neither knows nor cares
    * whether the layout under it is postings or code rows. */
  def a41VectorTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageA41VecCommitLog(spark, dir)
    (0 to 3).map { v =>
      pqServeAsOfLog(spark, dir, stage, v).withColumn("version", lit(v))
    }.reduce(_ unionByName _)
      .select(col("version"), col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("version"), col("query_id"), col("rank"))
  }

  /** The p28 OWNED commit-log stage: the same four epochs as a40, but
    * with every artifact COPIED into log-owned storage — the table-
    * format ownership model (Delta/Iceberg: the log's files are the
    * table's files), which is what makes physical reclaim safe: p28's
    * vacuum deletes ONLY directories this stage owns, never the
    * shared lifecycle stages other queries serve from. Copies are
    * index bytes (no recompute — the layouts already exist); `tag`
    * lets tests stage a private log they can corrupt or vacuum
    * without touching the shared one. Marker written LAST; a crash
    * mid-copy leaves no marker and the next build wipes and recopies
    * wholesale (StagingProtocolSpec's contract). */
  private[queries] def stageP28OwnedLog(spark: SparkSession, dir: String,
      tag: String = "p28vac", force: Boolean = false): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/documents.parquet")
    val stage = PipelineQueries.staging(tag, s"$dir#$fp")
    val conf = spark.sessionState.newHadoopConf()
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    val fs = stagePath.getFileSystem(conf)
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/done"))) {
      import spark.implicits._
      fs.delete(stagePath, true)
      val cyc = stageA37KwCycle(spark, dir)
      val base = stageA20CorpusKwIndex(spark, dir)
      def own(src: String, dst: String): String =
        PipelineQueries.copyDir(spark, src, s"$stage/$dst")
      // every commit-log path comes from own()'s RETURN, so the log can
      // never point at a directory that was not actually copied
      def ownLayout(srcRoot: String, name: String): String = {
        own(s"$srcRoot/terms", s"$name/terms")
        own(s"$srcRoot/postings", s"$name/postings")
        s"$stage/$name"
      }
      val v0 = ownLayout(base, "v0")
      val v1 = ownLayout(s"$cyc/gen1", "v1")
      val t2 = own(s"$cyc/tombstones", "tomb2")
      val v3 = ownLayout(cyc, "v3")
      Seq((0, "layout", v0), (1, "layout", v1), (2, "tombstones", t2),
          (3, "layout", v3))
        .toDF("version", "kind", "path")
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/commit_log")
      spark.range(1).write.mode("overwrite").parquet(s"$stage/done")
    }
    stage
  }

  /** Test hook (TimeTravelSpec): a PRIVATE owned log under `tag`;
    * `force` rebuilds wholesale so a spec gets pre-vacuum state in ONE
    * copy pass instead of build-delete-rebuild. */
  def p28OwnedLogStageTagged(spark: SparkSession, dir: String,
      tag: String, force: Boolean = false): String =
    stageP28OwnedLog(spark, dir, tag, force)

  /** Stress hook: re-copy the owned log unconditionally (lifecycle
    * artifacts build-if-missing) — prices the one-time ownership
    * copies: linear in index bytes, no recompute. */
  def rebuildP28OwnedLogStage(spark: SparkSession, dir: String): String =
    stageP28OwnedLog(spark, dir, force = true)

  /** Stress/test hook: the current-snapshot serve off an owned log. */
  def p28ServeCurrent(spark: SparkSession, dir: String,
      logStage: String): DataFrame =
    kwServeAsOfLog(spark, dir, logStage, 3)

  /** VACUUM over an owned commit log: physically delete every
    * artifact directory superseded by the RETENTION HORIZON — the
    * `retainLayouts`-th newest layout commit (Delta's retention
    * window, expressed in epochs rather than hours: keep the newest K
    * servable snapshots, reclaim everything strictly older — older
    * layouts, and tombstone lists already folded in by a
    * delete-applying merge at or before the horizon). The LOG ROWS
    * stay — history remains enumerable as metadata, but an as-of read
    * into a vacuumed epoch now fails at planning (Delta/Iceberg's
    * VACUUM-beyond-retention semantics); as-of reads AT or after the
    * horizon still serve, including merge-on-read epochs whose
    * tombstone lists are newer than the horizon. Idempotent:
    * already-deleted paths are skipped. Returns the paths it
    * reclaimed this call. */
  def p28VacuumRun(spark: SparkSession, logStage: String,
      retainLayouts: Int = 1): Seq[String] = {
    require(retainLayouts >= 1, "retention must keep at least the newest layout")
    val conf = spark.sessionState.newHadoopConf()
    val log = PipelineQueries.readCommitLog(spark, logStage)
    // ownership guard: vacuum deletes files, so it may ONLY run on a
    // log whose artifacts it owns (every commit path inside the log's
    // own stage). The a40 SHARED log names the live lifecycle stages —
    // vacuuming it would delete artifacts other queries serve from.
    // Containment is checked against the stage WITH a trailing
    // separator: a sibling stage whose path merely extends this one
    // (".../graft_x_abc" vs ".../graft_x_abc2") must read as foreign.
    val owned = logStage.stripSuffix("/") + "/"
    require(log.forall(_._3.startsWith(owned)),
      s"refusing to vacuum a log with commits it does not own " +
        s"(log=$logStage, foreign=${log.filterNot(_._3.startsWith(owned)).map(_._3).toSeq})")
    val keepFrom = log.filter(_._2 == "layout").map(_._1)
      .sorted(Ordering[Int].reverse).take(retainLayouts).last
    // an owned layout's version dir holds terms+postings; reclaim the
    // version dir as a unit (tombstone commits are a single dir)
    def unitRoot(p: String): String =
      if (p.endsWith("/terms") || p.endsWith("/postings"))
        p.substring(0, p.lastIndexOf('/')) else p
    // a unit named by BOTH a reclaimed commit and a retained one (a
    // layout re-published after a rollback) is LIVE — liveness is set
    // membership over the retained commits, same rule as
    // [[graft.operators.OccCommitLog.vacuum]]
    val live = log.filter(_._1 >= keepFrom).map(t => unitRoot(t._3)).toSet
    log.filter(_._1 < keepFrom).map(t => unitRoot(t._3)).toSeq
      .sorted.distinct.filterNot(live).flatMap { p =>
        val root = new org.apache.hadoop.fs.Path(p)
        val fs = root.getFileSystem(conf)
        if (fs.exists(root)) { fs.delete(root, true); Some(root.toString) }
        else None
      }
  }

  /** p28 — INDEX VACUUM: storage reclaim as a first-class maintenance
    * operator. Build the owned four-epoch log (copies priced once,
    * fingerprint-keyed), VACUUM it — v0, v1 and the folded tombstone
    * list are physically deleted, the current layout and the log's
    * history rows survive — then serve the CURRENT snapshot. Gated by
    * a37's fresh-build-over-survivors oracle: reclaiming history must
    * not perturb the present by a single row (TimeTravelSpec
    * additionally pins the files physically gone, as-of reads into
    * vacuumed epochs failing, and vacuum idempotence). At 100 TB this
    * is the knob that bounds index storage at O(live bytes) instead
    * of O(live × epochs): time travel (a40) is free BECAUSE old
    * generations linger; vacuum is the scheduled decision to stop
    * paying for them. */
  def p28IndexVacuum(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageP28OwnedLog(spark, dir)
    p28VacuumRun(spark, stage)
    kwServeAsOfLog(spark, dir, stage, 3)
  }

  /** The p30 OWNED vector commit-log stage: p28's ownership model on
    * the a41 log, proving reclaim is channel-agnostic the way a41
    * proved serving — the same four epochs, every artifact COPIED into
    * log-owned storage so vacuum deletes only what this stage owns,
    * never the shared a12/a39 stages other queries serve from. Vector
    * layouts are single code-table directories (no terms/postings
    * split), so each epoch owns one dir. Codebooks are NOT copied:
    * they are serving state, not epoch state (a41's invariant), and
    * vacuum must never touch them. Marker last; crash mid-copy leaves
    * no marker → wholesale recopy (StagingProtocolSpec's contract). */
  private[queries] def stageP30OwnedVecLog(spark: SparkSession, dir: String,
      tag: String = "p30vac", force: Boolean = false): String = synchronized {
    val fp = PipelineQueries.contentFingerprint(spark, s"$dir/embeddings.parquet")
    val stage = PipelineQueries.staging(tag, s"$dir#$fp")
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    val fs = stagePath.getFileSystem(spark.sessionState.newHadoopConf())
    if (force || !fs.exists(new org.apache.hadoop.fs.Path(s"$stage/done"))) {
      import spark.implicits._
      fs.delete(stagePath, true)
      val cyc = stageA39VecCycle(spark, dir)
      val a12 = stageA12Index(spark, dir)
      val v0 = PipelineQueries.copyDir(spark, s"$a12/codes", s"$stage/v0")
      val v1 = PipelineQueries.copyDir(spark, s"$cyc/gen1", s"$stage/v1")
      val t2 = PipelineQueries.copyDir(spark, s"$cyc/tombstones", s"$stage/tomb2")
      val v3 = PipelineQueries.copyDir(spark, s"$cyc/codes", s"$stage/v3")
      Seq((0, "layout", v0), (1, "layout", v1), (2, "tombstones", t2),
          (3, "layout", v3))
        .toDF("version", "kind", "path")
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/commit_log")
      spark.range(1).write.mode("overwrite").parquet(s"$stage/done")
    }
    stage
  }

  /** Test hook (TimeTravelSpec): a PRIVATE owned vector log under
    * `tag`; `force` rebuilds wholesale for pre-vacuum state. */
  def p30OwnedVecLogStageTagged(spark: SparkSession, dir: String,
      tag: String, force: Boolean = false): String =
    stageP30OwnedVecLog(spark, dir, tag, force)

  /** Test hook (TimeTravelSpec): one epoch's serve off an owned
    * vector log. */
  def p30ServeAsOf(spark: SparkSession, dir: String, logStage: String,
      v: Int): DataFrame =
    pqServeAsOfLog(spark, dir, logStage, v)

  /** p30 — VECTOR-CHANNEL VACUUM: p28's retention reclaim run on the
    * a41 log's owned copy, with [[p28VacuumRun]] REUSED verbatim — the
    * horizon rule and ownership guard never look inside a layout, so
    * the operator that reclaims postings reclaims code tables
    * unchanged (reclaim now proven channel-agnostic the way a41 proved
    * serving). v0, v1 and the folded tombstone list are physically
    * deleted; the current purged code table and the log's history rows
    * survive; the serve afterwards is gated by a16's ORACLE — however
    * much history was reclaimed, the present must not move by a row.
    * Codebooks sit outside the log and are untouched: at 100 TB the
    * reclaim bounds CODE storage at O(live bytes) while the shared
    * serving state (LUT-sized) never enters the retention math. */
  def p30VectorVacuum(spark: SparkSession, dir: String): DataFrame = {
    val stage = stageP30OwnedVecLog(spark, dir)
    p28VacuumRun(spark, stage)
    pqServeAsOfLog(spark, dir, stage, 3)
  }

  /** The a40 index-log CHANGE FEED reader (p29's contract lifted from
    * the doc table's log to the INDEX's): every commit in `(from, to]`
    * as an epoch-granularity event — layout commits become `replace`
    * (an index layout commit names a COMPLETE new layout, so the
    * change event is a snapshot replacement, not a row delta),
    * tombstone commits become ids-only `delete` events. The feed rows
    * are METADATA (version, kind, path): index replication ships
    * segment files, not rows (Lucene/Solr segment-replication model,
    * public), so a consumer pulls exactly the named artifacts — the
    * changed bytes, never the whole index, and a feed read itself
    * plans ZERO index bytes. Unknown commit kinds fail loudly (p29's
    * rule). */
  private[queries] def indexChangesFromLog(spark: SparkSession, logStage: String,
      from: Int, to: Int): DataFrame = {
    import spark.implicits._
    PipelineQueries.readCommitLog(spark, logStage)
      .filter(c => c._1 > from && c._1 <= to).sortBy(_._1)
      .map {
        case (v, "layout", p) => (v, "replace", p)
        case (v, "tombstones", p) => (v, "delete", p)
        case (v, kind, _) => throw new IllegalArgumentException(
          s"index feed: unknown commit kind '$kind' at version $v in " +
            s"$logStage — the change feed understands layout/tombstones only")
      }
      .toDF("version", "kind", "path")
  }

  def a40IndexChangesBetween(spark: SparkSession, dir: String,
      from: Int, to: Int): DataFrame =
    indexChangesFromLog(spark, stageA40CommitLog(spark, dir), from, to)

  /** The same feed off the VECTOR log — the mapping is one shared
    * function of the (version, kind, path) triples, so the feed is
    * channel-agnostic by construction, not by parallel code. */
  def a41IndexChangesBetween(spark: SparkSession, dir: String,
      from: Int, to: Int): DataFrame =
    indexChangesFromLog(spark, stageA41VecCommitLog(spark, dir), from, to)

  /** This family's slice of the oracle-SQL map: only the keyword cycle
    * needs new SQL — its delete-applying merge RE-STATS, so the oracle
    * is a19's chain rebuilt from scratch over the surviving corpus
    * (df/idf over `doc_id % 7 <> 3`; query side still the external
    * full-table slice, so a tombstoned doc still asks and its
    * surviving-vocabulary terms still probe). a38/a39/m13 alias their
    * channels' delete oracles in [[AnalyticsQueries.oracleSql]], and
    * p28 aliases a37's (vacuum must not perturb the current serve).
    * a40's oracle is the epoch chain below, once per version. */

  /** The population-parameterized a19 oracle chain — the ONE SQL body
    * behind a37's gate (epoch 3 alone, survivor population) and every
    * a40 epoch: the index population restricted to `pop` (stats — df,
    * n, idf — computed over exactly the docs that epoch's layout
    * indexed) plus an optional extra scoring predicate (`scoreAnd`,
    * the soft-delete epoch's doc filter — visible in scoring,
    * invisible in stats: a36's live-docs split, expressed as SQL).
    * The query side is always the external full-corpus doc_id < 10
    * slice; pruning ties are (df ASC, term ASC) because every epoch's
    * layout assigns dense lexicographic term_ids. Single-sourced so a
    * scoring or idf fix cannot decouple a37's gate (and its s32/p28
    * aliases) from a40's. */
  private def kwChainSql(pop: String, scoreAnd: String): String =
    s"""WITH sv AS (SELECT doc_id, text FROM documents WHERE $pop),
       |t AS (SELECT doc_id, unnest(${words("text")}) AS term FROM sv),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM sv),
       |idf AS (SELECT term, df,
       |    CAST(floor(10000.0 * n.n / df) AS BIGINT) AS idf
       |  FROM dft CROSS JOIN n),
       |idx AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS impact
       |  FROM tf JOIN idf USING (term)),
       |qe AS (SELECT doc_id AS query_id, unnest(${words("text")}) AS term
       |  FROM documents WHERE doc_id < 10),
       |qt AS (SELECT DISTINCT query_id, term FROM qe),
       |qk AS (SELECT query_id, term FROM (
       |  SELECT qt.query_id, qt.term, ROW_NUMBER() OVER (
       |      PARTITION BY qt.query_id ORDER BY idf.df ASC, qt.term ASC) AS trk
       |  FROM qt JOIN idf USING (term)) WHERE trk <= $KwKeepTerms),
       |kw AS (SELECT qk.query_id, idx.doc_id,
       |    CAST(SUM(idx.impact) AS BIGINT) AS kw_score
       |  FROM idx JOIN qk USING (term)
       |  WHERE idx.doc_id <> qk.query_id$scoreAnd
       |  GROUP BY 1, 2)
       |SELECT query_id, kw_rank, doc_id, kw_score FROM (
       |  SELECT query_id, doc_id, kw_score, CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY kw_score DESC, doc_id) AS INT) AS kw_rank
       |  FROM kw) WHERE kw_rank <= 20""".stripMargin

  /** One a40 epoch: the chain wrapped with its commit version. */
  private def kwEpochSql(version: Int, pop: String, scoreAnd: String): String =
    s"""SELECT $version AS version, query_id, kw_rank, doc_id, kw_score FROM (
       |${kwChainSql(pop, scoreAnd)})""".stripMargin

  /** One a41 epoch: a16's PQ oracle ([[pqOracle]] — a12's frozen
    * even-half codebook training in EVERY epoch, full-corpus shortlist
    * sizing) with the candidate population restricted to the epoch's
    * code rows, wrapped with its commit version. */
  private def pqEpochSql(version: Int, corpusWhere: String): String =
    s"""SELECT $version AS version, query_id, rank, neighbor_id FROM (
       |${pqOracle(PqM, PqSubDim, PqK, PqL,
            trainWhere = "vec_id % 2 = 0", initCut = 2 * PqK,
            corpusWhere = corpusWhere)})""".stripMargin

  private[queries] lazy val lifecycleOracles: Map[String, String] = Map(
    // the four epochs from their definitions: v0 the frozen even-half
    // base, v1 the first re-stat merge (pop % 4 <> 3), v2 the SAME
    // stats with the delete applied at scoring only, v3 the fresh
    // survivor re-stat — one hash gates resolution rule + every epoch
    "a40_index_time_travel" ->
      s"""${kwEpochSql(0, "doc_id % 2 = 0", "")}
         |UNION ALL
         |${kwEpochSql(1, "doc_id % 4 <> 3", "")}
         |UNION ALL
         |${kwEpochSql(2, "doc_id % 4 <> 3", " AND idx.doc_id % 7 <> 3")}
         |UNION ALL
         |${kwEpochSql(3, "doc_id % 7 <> 3", "")}
         |ORDER BY version, query_id, kw_rank""".stripMargin,
    // the same chain, survivor population, no version column — a37's
    // gate (and through [[AnalyticsQueries.oracleSql]] its s32 and p28
    // aliases) and a40's epoch 3 are now literally one SQL body
    "a37_keyword_lifecycle" ->
      s"""${kwChainSql("doc_id % 7 <> 3", "")}
         |ORDER BY query_id, kw_rank""".stripMargin,
    // the vector epochs: v0 the frozen even-half index, v1 the first
    // layout merge (% 4 <> 3), v2 the same rows with tombstones barred
    // from candidacy, v3 the purged final — one hash gates resolution
    // + every epoch's candidate population, codebooks frozen throughout
    "a41_vector_time_travel" ->
      s"""${pqEpochSql(0, "aa0.vec_id % 2 = 0")}
         |UNION ALL
         |${pqEpochSql(1, "aa0.vec_id % 4 <> 3")}
         |UNION ALL
         |${pqEpochSql(2, "aa0.vec_id % 4 <> 3 AND aa0.vec_id % 7 <> 3")}
         |UNION ALL
         |${pqEpochSql(3, "aa0.vec_id % 7 <> 3")}
         |ORDER BY version, query_id, rank""".stripMargin,
  )
}
