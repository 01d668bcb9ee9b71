package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Streaming OCC family (s41–s42) — the composition round 15 left
  * open: a streaming lifecycle DAEMON whose every landing and merge is
  * an [[graft.operators.OccCommitLog]] commit, and whose ONLY state is
  * the log. s36/s39 keep the daemon's node set in driver memory and
  * make replay safe with batch-id-keyed landing ledgers; p31/p32 drive
  * the OCC protocol with driver threads. These keys fuse the two: the
  * foreachBatch body derives the node set FROM the log on every batch
  * (newest layout commit + segment commits after it), so a daemon
  * restarted mid-drain resumes exactly where the log says it was — the
  * actual Delta-writer shape, where recovery is a log read, not a
  * driver-state reconstruction. Replay safety is the protocol's `txn`
  * action (writer identity, Delta's SetTransaction): every landing
  * commits as (`<tag>-ingest`, batchId) and every merge as
  * (`<tag>-daemon`, generation), and the drain is followed by an
  * explicit REPLAY of every landing commit — the log must not move, in
  * the same run the oracle gates. One daemon body
  * ([[occPolicyDaemon]]), two channels (keyword re-stat merges /
  * token layout rewrites), one answer each — gated by the same a19/a29
  * oracles that gate s36/s39, so committing through the OCC log must
  * leave NO trace in what the daemon serves.
  * CONVENTION: task closures (flatMapGroups/mapPartitions/...)
  * must NOT reference trait-level vals/defs — that captures the
  * whole facade (Task-not-serializable); hoist to a local first.
  * foreachBatch BODIES run on the driver and may call trait
  * helpers — but nothing they build that serializes into tasks may
  * touch trait members. */
private[queries] trait StreamingOccFamily { this: StreamingQueries.type =>

  /** The OCC-committed policy daemon s41/s42 share: stream the corpus
    * in four micro-batches; each batch `land`s its segment layout
    * batch-id-keyed (file-level idempotence) and PUBLISHES it as an
    * OCC `segment` commit with txn identity (`<tag>-ingest`, batchId —
    * log-level idempotence, the one mechanism production has); the
    * merge policy then runs INSIDE the stream against the LOG's node
    * set (newest `layout` commit + `segment` commits after it — the
    * daemon carries no driver state a restart would lose), `merge`s
    * all current nodes into the next generation when ≥2 segments are
    * pending, and publishes the result as a `layout` commit with txn
    * (`<tag>-daemon`, generation). After the drain: a defensive sweep
    * folds any remainder; every landing commit is then REPLAYED with
    * its original txn identity — the checkpoint-recovery schedule — and
    * the log must not move by a single version; finally the head is
    * resolved with the shared as-of rule and handed to the channel's
    * serve. Writes `n_merges` meta for the spec pin (the policy must
    * fire mid-stream, not only at the sweep). Returns the head layout
    * path. */
  private[queries] def occPolicyDaemon(spark: SparkSession, dir: String,
      tag: String)(input: => DataFrame)(
      land: (DataFrame, String) => Unit)(
      merge: (SparkSession, Seq[String], String) => Unit): String = {
    val root = freshRunRoot(spark, dir, s"${tag}m")
    val logDir = s"$root/log"
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val occ = graft.operators.OccCommitLog
    // the daemon's node set, derived FROM the log: the newest layout
    // (absent before the first merge) plus every segment committed
    // after it — segments at or before the newest layout are already
    // folded in (exactly resolveAsOf's layout rule, on segments)
    def nodesOf(log: Seq[graft.operators.OccCommitLog.Commit])
        : (Seq[String], Int) = {
      val headV = log.filter(_.kind == "layout").map(_.version)
        .maxOption.getOrElse(-1)
      val head = log.find(c => c.kind == "layout" && c.version == headV)
      val segs = log.filter(c => c.kind == "segment" && c.version > headV)
      (head.map(_.path).toSeq ++ segs.map(_.path), segs.size)
    }
    def policy(sp: SparkSession, minPending: Int): Unit = {
      val log = occ.read(hfs, logDir)
      val (nodes, pending) = nodesOf(log)
      if (pending >= minPending) {
        val gen = log.count(_.kind == "layout") + 1
        val out = s"$root/gen$gen"
        merge(sp, nodes, out)
        occ.commit(hfs, logDir, "layout", out,
          txn = Some((s"$tag-daemon", gen.toLong)))
      }
    }
    streamedLandings(spark, dir, tag, "segs")(input) { (batch, id, landed) =>
      val sp = batch.sparkSession
      val seg = s"$landed/batch=$id"
      land(batch, seg)
      occ.commit(hfs, logDir, "segment", seg,
        txn = Some((s"$tag-ingest", id)))
      // the merge policy, evaluated from the LOG after every landing
      policy(sp, minPending = 2)
    }
    policy(spark, minPending = 1) // post-drain sweep (daemon shutdown)
    // CHECKPOINT REPLAY, exercised in the gated run: re-commit every
    // landing with its original txn identity — the restarted writer's
    // schedule — and the log must not move (each replay resolves to
    // the version it originally won)
    val settled = occ.read(hfs, logDir)
    settled.filter(_.kind == "segment").foreach { c =>
      val replayed = occ.commit(hfs, logDir, c.kind, c.path,
        txn = c.txnApp.zip(c.txnVersion))
      require(replayed == c.version,
        s"a replayed landing moved the log: v${c.version} -> v$replayed")
    }
    require(occ.read(hfs, logDir).size == settled.size,
      "checkpoint replay double-committed a landing")
    spark.range(1)
      .select(lit(settled.count(_.kind == "layout")).as("n_merges"))
      .write.mode("overwrite").parquet(s"$root/meta")
    val triples = occ.readTriples(hfs, logDir)
    val (layout, tombs) = PipelineQueries.resolveAsOf(
      triples, triples.map(_._1).max, logDir)
    require(tombs.isEmpty, s"$tag daemon committed no tombstones")
    layout
  }

  /** s41 — the KEYWORD compaction daemon committing through the OCC
    * log: s36's policy-triggered re-stat merges with every landing and
    * merge published as a protocol commit and the node set derived
    * from the log (see [[occPolicyDaemon]]). Per-segment stats live in
    * each node's own meta (n — what s36 kept in driver memory), so a
    * merge reads index bytes + one meta row per node and re-stats
    * df/idf over the summed doc count exactly as s36 does. Serve is
    * a19's pruned probe over the head layout resolved FROM THE LOG,
    * hash-gated with a19's ORACLE: a fresh monolith, a driver-state
    * daemon (s36), or a log-state daemon with txn-replayed landings —
    * one answer. LifecycleCycleSpec pins the OCC-committed layout
    * row-identical to s36's ledger-committed one. */
  def s41OccKeywordDaemon(spark: SparkSession, dir: String): DataFrame = {
    val layout = occPolicyDaemon(spark, dir, "s41")(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .repartition(4)) { (batch, seg) =>
      val sp = batch.sparkSession
      val tf = batch.select(col("doc_id"),
          explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint() // tokenize once: n-count + layout write
      val nSeg = tf.select(col("doc_id")).distinct().count()
      AnalyticsQueries.writeKwLayout(sp, seg, tf, nSeg)
      sp.range(1).select(lit(nSeg).as("n"))
        .write.mode("overwrite").parquet(s"$seg/meta")
    } { (sp, nodes, out) =>
      val tf = nodes.map(AnalyticsQueries.kwRecoverTf(sp, _))
        .reduce(_ unionByName _)
      val n = nodes.map(p =>
        sp.read.parquet(s"$p/meta").head.getAs[Long]("n")).sum
      AnalyticsQueries.writeKwLayout(sp, out, tf, n)
      sp.range(1).select(lit(n).as("n"))
        .write.mode("overwrite").parquet(s"$out/meta")
    }
    AnalyticsQueries.kwPrunedSearch(spark, dir,
      spark.read.parquet(s"$layout/terms")
        .select(col("term"), col("term_id"), col("df")),
      spark.read.parquet(s"$layout/postings"))
  }

  /** s43 — the CDC daemon committing through the OCC log: the
    * delete-applying composition s41/s42 leave open (their corpora
    * carry no deletes, and p31/p32 commit tombstones only from driver
    * threads). One stream interleaves EVERY document with the
    * tombstone ids (ids ≡ 3 mod 7) — [[cdcInterleave]]'s arrival
    * shape, a tombstone free to precede its own doc's arrival — and
    * every micro-batch publishes TWO commits: its segment layout and
    * its tombstone id list (possibly empty — an empty retraction list
    * is a valid, harmless commit), each under its own writer identity
    * (`s43-seg`/`s43-del`, txnVersion = batchId). The merge policy
    * reads the LOG: when ≥2 segments are pending past the newest
    * layout, a DELETE-APPLYING re-stat merge fires — tf recovered from
    * the head layout ∪ pending segments, ALL committed tombstone lists
    * broadcast-anti-joined before the stat pass (re-applying an
    * already-folded tombstone is a set-level no-op — the rows are
    * absent), df/idf re-derived over the COUNTED survivor set (no
    * per-node meta: a delete-applying merge must recount anyway, the
    * structural contrast with s41). The post-drain sweep fires if ANY
    * segment OR tombstone is pending past the head layout, so the
    * served head has everything folded and resolveAsOf hands it zero
    * pending tombstones. Landings (both kinds) are then replayed with
    * their original txns — the log must not move. Gated by a37's
    * fresh-build-over-survivors ORACLE: driver-staged (a37),
    * stream-landed on ledgers (s32), or stream-landed through the
    * concurrency protocol — one merge discipline, one answer;
    * LifecycleCycleSpec pins the head layout row-identical to the a37
    * batch cycle's. */
  def s43OccCdcDaemon(spark: SparkSession, dir: String): DataFrame = {
    val root = freshRunRoot(spark, dir, "s43m")
    val logDir = s"$root/log"
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val occ = graft.operators.OccCommitLog
    def state(): (Seq[graft.operators.OccCommitLog.Commit], Int, Seq[String], Int) = {
      val log = occ.read(hfs, logDir)
      val headV = log.filter(_.kind == "layout").map(_.version)
        .maxOption.getOrElse(-1)
      val head = log.find(c => c.kind == "layout" && c.version == headV)
      val segs = log.filter(c => c.kind == "segment" && c.version > headV)
      val pendTombs = log.count(c => c.kind == "tombstones" && c.version > headV)
      (log, log.count(_.kind == "layout"),
        head.map(_.path).toSeq ++ segs.map(_.path), segs.size + pendTombs)
    }
    def fireMerge(sp: SparkSession, log: Seq[graft.operators.OccCommitLog.Commit],
        gens: Int, nodes: Seq[String]): Unit = {
      val out = s"$root/gen${gens + 1}"
      // ALL committed tombstone lists, re-applied every merge: the
      // anti-join is set-valued, so folding a tombstone twice is the
      // same as folding it once — what lets a late-arriving doc still
      // meet a tombstone committed batches earlier
      val tombPaths = log.filter(_.kind == "tombstones").map(_.path)
      val tf0 = nodes.map(AnalyticsQueries.kwRecoverTf(sp, _))
        .reduce(_ unionByName _)
      val tf =
        (if (tombPaths.isEmpty) tf0
         else tf0.join(
           broadcast(sp.read.parquet(tombPaths: _*).select(col("doc_id"))),
           Seq("doc_id"), "left_anti"))
          .localCheckpoint() // recover+anti-join once: count + write
      val nLive = tf.select(col("doc_id")).distinct().count()
      AnalyticsQueries.writeKwLayout(sp, out, tf, nLive)
      occ.commit(hfs, logDir, "layout", out,
        txn = Some(("s43-daemon", (gens + 1).toLong)))
    }
    streamedLandings(spark, dir, "s43", "segs")(
      cdcInterleave(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        Tables.documents(spark, dir)
          .filter(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
    ) { (batch, id, landed) =>
      val sp = batch.sparkSession
      val seg = s"$landed/batch=$id"
      val tf = batch.filter(col("kind") === "doc")
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.words(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint() // tokenize once: n-count + layout write
      AnalyticsQueries.writeKwLayout(sp, seg,
        tf, tf.select(col("doc_id")).distinct().count())
      occ.commit(hfs, logDir, "segment", seg, txn = Some(("s43-seg", id)))
      batch.filter(col("kind") === "del").select(col("doc_id"))
        .write.mode("overwrite").parquet(s"$landed/tomb=$id")
      occ.commit(hfs, logDir, "tombstones", s"$landed/tomb=$id",
        txn = Some(("s43-del", id)))
      val (log, gens, nodes, _) = state()
      if (nodes.count(_.contains("/batch=")) >= 2) // ≥2 pending segments
        fireMerge(sp, log, gens, nodes)
    }
    // post-drain sweep: anything pending past the head layout —
    // segment OR tombstone — folds, so the head is delete-applied
    val (log0, gens0, nodes0, pending0) = state()
    if (pending0 > 0) fireMerge(spark, log0, gens0, nodes0)
    // checkpoint replay: every landing commit (both kinds) re-runs
    // with its original txn; the log must not move
    val settled = occ.read(hfs, logDir)
    settled.filter(c => c.kind == "segment" || c.kind == "tombstones")
      .foreach { c =>
        val replayed = occ.commit(hfs, logDir, c.kind, c.path,
          txn = c.txnApp.zip(c.txnVersion))
        require(replayed == c.version,
          s"a replayed landing moved the log: v${c.version} -> v$replayed")
      }
    require(occ.read(hfs, logDir).size == settled.size,
      "checkpoint replay double-committed a landing")
    val triples = occ.readTriples(hfs, logDir)
    val (layout, tombs) = PipelineQueries.resolveAsOf(
      triples, triples.map(_._1).max, logDir)
    require(tombs.isEmpty,
      "the swept head is delete-applying — no tombstones may be pending")
    AnalyticsQueries.kwPrunedSearch(spark, dir,
      spark.read.parquet(s"$layout/terms")
        .select(col("term"), col("term_id"), col("df")),
      spark.read.parquet(s"$layout/postings"))
  }

  /** s47 — the LOG consumED AS A STREAMING SOURCE: `graft-logfeed`
    * ([[graft.streaming.LogFeedSource]] — Delta's readStream-on-a-table
    * shape, offsets = commit versions). Every prior streamed replica
    * consumed change events the producer had staged as FILES; here the
    * consumer points at the OCC LOG ITSELF: a producer commits p23's
    * timeline through the protocol (three insert deltas, a delete
    * list, then a `snapshot` data checkpoint), and the consumer runs
    * `readStream.format("graft-logfeed")` with one version per
    * micro-batch, landing each batch id-keyed. The source reads the
    * log (metadata) per trigger, plans each action's parquet files
    * executor-side, SKIPS the snapshot (derived data is not a change —
    * so a checkpointed log streams without double-applying), and its
    * version-valued offsets live in the stream's checkpoint — the
    * exactly-once restart contract TableLogSpec pins by appending a
    * commit and re-running against the same checkpoint. The replica's
    * membership (insert payloads minus delete ids) is gated by s37's
    * ORACLE: staged-file feed or log-direct source, one answer. */
  def s47LogStreamSource(spark: SparkSession, dir: String): DataFrame = {
    val root = StreamingQueries.freshRunRoot(spark, dir, "s47m")
    val logDir = s"$root/log"
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val occ = graft.operators.OccCommitLog
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    // the producer: p23's timeline committed through the protocol
    (0 to 2).foreach { k =>
      val p = s"$root/delta_r$k"
      docs.filter(col("doc_id") % 4 === k).coalesce(1)
        .write.mode("overwrite").parquet(p)
      occ.commit(hfs, logDir, "insert", p, txn = Some(("s47-prod", k.toLong)))
    }
    docs.filter(col("doc_id") % 3 === 0).select(col("doc_id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/tombstones")
    occ.commit(hfs, logDir, "delete", s"$root/tombstones",
      txn = Some(("s47-prod", 3L)))
    // a data checkpoint on the log: the source must stream THROUGH it
    // without double-applying (a snapshot is derived, not a change)
    val snap = s"$root/snapshot_v4"
    PipelineQueries.tableAsOfTriples(spark, occ.readTriples(hfs, logDir), 3, logDir)
      .coalesce(1).write.mode("overwrite").parquet(snap)
    occ.commit(hfs, logDir, "snapshot", snap, txn = Some(("s47-maint", 1L)))
    // the consumer: one commit version per micro-batch, batch-id-keyed
    // idempotent landings (the landing protocol every streamed replica
    // shares), offsets checkpointed by the engine
    val landed = s"$root/landed"
    val q = StreamingQueries.withStreamShuffle(spark, 4) {
      spark.readStream.format("graft-logfeed")
        .option("logDir", logDir)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.write.mode("overwrite").parquet(s"$landed/batch=$id"); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val events = spark.read.parquet(landed)
    // every CHANGE version arrived; the snapshot introduced none
    val versions = events.select(col("version")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(versions == Seq(0, 1, 2, 3),
      s"the feed must carry exactly the change commits: $versions")
    events.filter(col("kind") === "insert")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .join(broadcast(events.filter(col("kind") === "delete")
        .select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** s45 — the VECTOR daemon committing through the OCC log: the PQ
    * channel joins the log-state discipline via the SAME
    * [[occPolicyDaemon]] body that runs s41 (keyword) and s42 (token)
    * — only `land` and `merge` differ, which is the channel-agnosticism
    * proof repeated one level up. Each micro-batch encodes its
    * embeddings against the FROZEN a12 codebooks at landing (the FAISS
    * `add` path — training never appears in any plan; codebooks are
    * serving state the log never names) and commits the 4 B/vector
    * code rows as a `segment`; policy merges are pure layout rewrites
    * (code rows are per-vector functions of frozen codebooks — no
    * stats, nothing population-dependent to recompute, the same
    * algebra LayoutMergeConfluence pins for tokens). Because the
    * stage's stored corpus codes are themselves [[pqEncodeAgainst]]
    * output against the same frozen codebooks, a full-corpus daemon
    * build is row-identical to the stored-base ∪ increment layout —
    * so the serve (a09's ADC + exact re-rank) is gated by a12's
    * ORACLE: append-only one-shot (a12), streamed ledger ingest
    * (s14), or the log-state daemon with txn-replayed landings — one
    * answer. */
  def s45OccVectorDaemon(spark: SparkSession, dir: String): DataFrame = {
    val a12 = AnalyticsQueries.a12CorpusIndexStage(spark, dir)
    val cbAll = spark.read.parquet(s"$a12/codebooks")
    val layout = occPolicyDaemon(spark, dir, "s45")(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
        .repartition(4)) { (batch, seg) =>
      AnalyticsQueries.pqEncodeAgainst(
        AnalyticsQueries.pqSubcodes(batch), cbAll)
        .write.mode("overwrite").parquet(seg)
    } { (sp, nodes, out) =>
      nodes.map(p => sp.read.parquet(p)).reduce(_ unionByName _)
        .repartitionByRange(2, col("vec_id"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite").parquet(out)
    }
    val n = spark.read.parquet(s"$a12/meta").head.getAs[Long]("n")
    val qside = AnalyticsQueries.pqSubcodes(
      Tables.embeddings(spark, dir).filter(col("vec_id") < 20))
      .withColumnRenamed("vec_id", "query_id")
    AnalyticsQueries.pqAdcTail(spark, dir, spark.read.parquet(layout),
      AnalyticsQueries.pqLutsFrom(qside, cbAll),
      math.max(AnalyticsQueries.PqL.toLong, n / 20).toInt)
  }

  /** s46 — the IMAGE daemon committing through the OCC log: the last
    * index channel joins the log-state discipline, again through the
    * SHARED [[occPolicyDaemon]] body. Each micro-batch pays its OWN
    * ImageIO decode + perceptual hash at landing (the only moment
    * pixels are touched — m09's decode-at-ingest economics, per
    * segment) and commits the 24-byte hash rows; policy merges are
    * pure layout rewrites with ZERO decode. Serve is the exact-cluster
    * → banded-Hamming near-dup over the head layout resolved from the
    * log, gated by m07's ORACLE — the same hash pinning m07 (inline
    * decode), m09 (prebuilt), s24 (streamed ledger landings), and m10
    * (generational): five arrival shapes, one answer, now including
    * the concurrency protocol's. */
  def s46OccImageDaemon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .repartition(4) // decode distributes over the 4 batch files
      .mapPartitions(_.map(id =>
        (id, graft.operators.Multimodal.synthPng(id, 16, 16))))
      .toDF("media_id", "payload")
    val layout = occPolicyDaemon(spark, dir, "s46")(payloads) { (batch, seg) =>
      graft.operators.Multimodal.aHash8(batch).toDF()
        .select(col("media_id"), col("hash_hi"), col("hash_lo"))
        .write.mode("overwrite").parquet(seg)
    } { (sp, nodes, out) =>
      nodes.map(p => sp.read.parquet(p)).reduce(_ unionByName _)
        .repartitionByRange(2, col("media_id"))
        .sortWithinPartitions(col("media_id"))
        .write.mode("overwrite").parquet(out)
    }
    AnalyticsQueries.nearDupFromHashes(spark.read.parquet(layout))
  }

  /** s44 — the DOC-TABLE daemon through the OCC log, with OPTIMIZE as
    * the policy: the last channel (the table itself) joins the
    * log-state discipline, and the maintenance op is Delta's OPTIMIZE
    * + deletion-vectors composition rather than a delete-applying
    * merge — the structural contrast with s43. One stream interleaves
    * every document with the tombstone ids (ids ≡ 0 mod 3); each
    * micro-batch commits its insert delta AND its tombstone list
    * (possibly empty) under separate writer identities. The policy
    * reads the LOG: when ≥2 insert deltas are pending past the newest
    * `optimize`, it bin-packs head-optimize ∪ pending into one
    * range-clustered rewrite and commits it as `optimize` — a PURE
    * LAYOUT move that never applies deletes (Delta's OPTIMIZE
    * contract: compaction must not change table content, and deletion
    * vectors ride along untouched). Tombstone lists are therefore
    * merge-on-read debt applied at READ time, ALL of them regardless
    * of position — set-valued retraction, so a tombstone may precede
    * its own doc's arrival and re-applying a folded one is a no-op
    * (the same out-of-order tolerance s43 proved for the index
    * channel, here bought at read instead of at merge). After each
    * optimize the folded insert deltas are physically reclaimed
    * through the SHARED vacuum body
    * ([[PipelineQueries.tableVacuumTriples]], horizon = the optimize,
    * delete lists and optimize epochs preserved); landings of both
    * kinds are replayed post-drain with their original txns — the log
    * must not move, and the replay is safe even though the landings'
    * data is vacuumed, because the txn check precedes any artifact
    * access. Head serve = the newest optimize anti-joined with every
    * committed tombstone list, gated by the membership oracle
    * (TableLogSpec pins the plan reading ONLY the head optimize plus
    * the id lists — no reclaimed delta, no superseded epoch). */
  def s44OccTableDaemon(spark: SparkSession, dir: String): DataFrame = {
    val root = StreamingQueries.freshRunRoot(spark, dir, "s44m")
    val logDir = s"$root/log"
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val occ = graft.operators.OccCommitLog
    def pendingPastOptimize(log: Seq[graft.operators.OccCommitLog.Commit])
        : (Option[String], Seq[String]) = {
      val optV = log.filter(_.kind == "optimize").map(_.version)
        .maxOption.getOrElse(-1)
      (log.find(c => c.kind == "optimize" && c.version == optV).map(_.path),
        log.filter(c => c.kind == "insert" && c.version > optV).map(_.path))
    }
    def policy(sp: SparkSession, minPending: Int): Unit = {
      val log = occ.read(hfs, logDir)
      val (optHead, pending) = pendingPastOptimize(log)
      if (pending.size >= minPending) {
        val gen = log.count(_.kind == "optimize") + 1
        val out = s"$root/opt$gen"
        // bin-packing: head ∪ pending rewritten once, range-clustered
        // on doc_id so the rewrite also restores skippability (p34's
        // stats story; p13's clustering) — content untouched
        sp.read.parquet((optHead.toSeq ++ pending).toIndexedSeq: _*)
          .repartitionByRange(2, col("doc_id"))
          .sortWithinPartitions(col("doc_id"))
          .write.mode("overwrite").parquet(out)
        occ.commit(hfs, logDir, "optimize", out,
          txn = Some(("s44-opt", gen.toLong)))
        // reclaim the folded deltas through the SHARED vacuum body:
        // horizon = the optimize; delete lists (merge-on-read debt)
        // and optimize epochs (time-travel retention is p28's job,
        // not this daemon's) are preserved
        PipelineQueries.tableVacuumTriples(sp, occ.readTriples(hfs, logDir),
          root, horizonKind = "optimize",
          preserveKinds = Set("optimize", "delete"))
      }
    }
    StreamingQueries.streamedLandings(spark, dir, "s44", "land")(
      StreamingQueries.cdcInterleave(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), col("n_chars")),
        Tables.documents(spark, dir)
          .filter(col("doc_id") % 3 === 0).select(col("doc_id")))
    ) { (batch, id, _) =>
      val sp = batch.sparkSession
      // landings go STRAIGHT into log-owned storage (p28/p32's
      // ownership model — vacuum may only ever reclaim owned bytes,
      // so a commit must name an owned path); batch-id-keyed
      // overwrite keeps the file-level idempotence the landing
      // protocol promises
      val delta = s"$root/delta=$id"
      batch.filter(col("kind") === "doc")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(delta)
      occ.commit(hfs, logDir, "insert", delta, txn = Some(("s44-ins", id)))
      batch.filter(col("kind") === "del").select(col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/tomb=$id")
      occ.commit(hfs, logDir, "delete", s"$root/tomb=$id",
        txn = Some(("s44-del", id)))
      policy(sp, minPending = 2)
    }
    policy(spark, minPending = 1) // post-drain sweep (daemon shutdown)
    // checkpoint replay: both landing kinds re-run with their original
    // txns against a log whose folded data is already vacuumed — the
    // log must not move by a version
    val settled = occ.read(hfs, logDir)
    settled.filter(c => c.kind == "insert" || c.kind == "delete").foreach { c =>
      val replayed = occ.commit(hfs, logDir, c.kind, c.path,
        txn = c.txnApp.zip(c.txnVersion))
      require(replayed == c.version,
        s"a replayed landing moved the log: v${c.version} -> v$replayed")
    }
    require(occ.read(hfs, logDir).size == settled.size,
      "checkpoint replay double-committed a landing")
    require(settled.count(_.kind == "optimize") >= 2,
      "the optimize policy must fire mid-stream, not only at the sweep")
    val (optHead, pending) = pendingPastOptimize(settled)
    require(pending.isEmpty, "the sweep must fold every pending delta")
    // head serve: the one optimize layout, minus EVERY committed
    // tombstone list (merge-on-read, position-independent)
    val tombPaths = settled.filter(_.kind == "delete").map(_.path)
    spark.read.parquet(optHead.get)
      .join(broadcast(
        spark.read.parquet(tombPaths.toIndexedSeq: _*).select(col("doc_id"))),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** s42 — the TOKEN daemon committing through the OCC log: s39's
    * pure-layout-rewrite merges (token hashes are per-doc functions —
    * no stats, no meta, the structural contrast with s41) driven by
    * the same log-state machinery, proving [[occPolicyDaemon]]
    * channel-agnostic the way streamedIndexReplica proved the replica
    * consumer: one daemon body, only `land` and `merge` differ. Serve
    * is a29's shortlist re-rank over the head layout resolved from the
    * log, hash-gated with a29's ORACLE — the same hash that pins a29
    * (monolith), a32 (generational), a33 (one-shot compaction) and s39
    * (driver-state daemon); this key adds the log-state arrival shape
    * with txn-replayed landings. */
  def s42OccTokenDaemon(spark: SparkSession, dir: String): DataFrame = {
    val layout = occPolicyDaemon(spark, dir, "s42")(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
        .repartition(4)) { (batch, seg) =>
      batch.select(col("doc_id"),
          AnalyticsQueries.tokHashes(col("text")).as("th"))
        .write.mode("overwrite").parquet(seg)
    } { (sp, nodes, out) =>
      nodes.map(p => sp.read.parquet(p)).reduce(_ unionByName _)
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").parquet(out)
    }
    AnalyticsQueries.maxSimRerankServed(spark, dir,
      spark.read.parquet(layout))
  }

  /** s48 — STATS-CARRYING STREAMED LANDINGS (Delta's production ingest
    * shape whole: a streaming writer whose every add-action carries
    * its file statistics): the documents table arrives range-clustered
    * in four micro-batches; each landing writes its delta batch-id-
    * keyed, derives (min_id, max_id, max_chars) from the delta it just
    * wrote — the one moment stats are free, p34's rule, now inside
    * foreachBatch — and commits through the OCC log with the stats
    * riding the commit line as action METADATA (`add.stats`) and the
    * txn identity (`s48-ins`, batchId) making the landing exactly-once
    * under checkpoint replay. After the drain, the recovery schedule
    * runs for real: every landing is REPLAYED with its original txn
    * (the log must not move, stats and all), then the log is
    * CHECKPOINTED and its folded commit files expired — stats must
    * survive log compaction, because a year-old table loses its
    * skipping the day its raw commit files expire otherwise. The
    * serve is p34's: an id predicate planned from the commit metadata
    * ALONE (the body `require`s files were pruned and that the plan
    * holds only stats-hit deltas — zero footer reads, zero listing),
    * plus the stats-answered whole-table MAX. Gated by p34's oracle
    * VERBATIM: batch ingest log, compacted OCC log, or streamed
    * stats-carrying landings — one answer. */
  def s48OccStatsIngest(spark: SparkSession, dir: String): DataFrame = {
    val root = freshRunRoot(spark, dir, "s48m")
    val logDir = s"$root/log"
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val occ = graft.operators.OccCommitLog
    streamedLandings(spark, dir, "s48", "land")(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .repartitionByRange(4, col("doc_id"))
    ) { (batch, id, _) =>
      val delta = s"$root/delta=$id"
      batch.write.mode("overwrite").parquet(delta)
      val st = batch.sparkSession.read.parquet(delta).agg(
        min(col("doc_id")), max(col("doc_id")), max(col("n_chars"))).head
      occ.commitMeta(hfs, logDir, "insert", delta,
        Map("min_id" -> st.getLong(0).toString,
          "max_id" -> st.getLong(1).toString,
          "max_chars" -> st.getLong(2).toString),
        txn = Some(("s48-ins", id)))
    }
    // checkpoint-recovery replay: stats-carrying landings are still
    // exactly-once — the log must not move by a version
    val settled = occ.read(hfs, logDir)
    settled.foreach { c =>
      val replayed = occ.commitMeta(hfs, logDir, c.kind, c.path, c.meta,
        txn = c.txnApp.zip(c.txnVersion))
      require(replayed == c.version,
        s"a replayed stats landing moved the log: v${c.version} -> v$replayed")
    }
    // log maintenance: stats must survive compaction — the serve below
    // plans from the CHECKPOINTED form, the folded commit files gone
    occ.checkpoint(hfs, logDir)
    occ.cleanLog(hfs, logDir)
    val log = occ.read(hfs, logDir)
    require(log.size == settled.size && log.forall(_.meta.nonEmpty),
      s"stats lost in log compaction: $log")
    val (lo, hi) = (100L, 299L)
    val hit = log.filter(c =>
      c.meta("max_id").toLong >= lo && c.meta("min_id").toLong <= hi)
    require(hit.size < log.size,
      s"streamed stats must prune deltas: planned ${hit.size} of ${log.size}")
    val scan = spark.read.parquet(hit.map(_.path).toIndexedSeq: _*)
      .filter(col("doc_id").between(lo, hi))
    val leaked = scan.inputFiles.toSeq
      .filterNot(f => hit.exists(c => f.contains(c.path)))
    require(leaked.isEmpty, s"the plan leaked stats-pruned deltas: $leaked")
    val tableMaxChars = log.map(_.meta("max_chars").toLong).max
    scan.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("table_max_chars", lit(tableMaxChars))
      .orderBy(col("lang"))
  }

  /** s49 — INCREMENTAL AGGREGATE MAINTENANCE OFF THE CLASSIFIED FEED:
    * the consumer p41's pre-images exist FOR. A downstream per-lang
    * (count, sum_chars) aggregate is kept current from change rows
    * ALONE — each micro-batch of the classified feed contributes
    * signed partials (+1 for `insert`/`update_postimage`, −1 for
    * `delete`/`update_preimage`), landed batch-id-keyed and folded at
    * serve. Pre-images are what make the consumer STATELESS and
    * COMMUTATIVE: it never resolves what left (the feed already says),
    * so it holds no per-id state — O(distinct lang) per batch, not
    * O(rows) — and batch arrival order is irrelevant because signed
    * partial aggregates commute (the retraction algebra every
    * streaming-SQL engine's changelog mode is built on — Flink's
    * retract streams). The consumer never reads the table: its total
    * cost is O(changes), the maintenance economics p29/p41 promise,
    * demonstrated end to end. Gated by the head-state oracle from the
    * definitions — maintaining through four change shapes must equal
    * recomputing over the final table. */
  def s49StreamCdfMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val landed = streamedLandings(spark, dir, "s49", "land")(
      AnalyticsQueries.p41ChangeDataFeed(spark, dir).repartition(4)
    ) { (batch, id, landedRoot) =>
      val sign = when(
        col("change_type").isin("insert", "update_postimage"), lit(1L))
        .when(col("change_type").isin("delete", "update_preimage"), lit(-1L))
        .otherwise(lit(null).cast("long"))
      val partial = batch.withColumn("sign", sign)
      // an unknown change type must not fold into the ledger silently
      require(partial.filter(col("sign").isNull).isEmpty,
        "s49: unknown change_type in the feed")
      partial.groupBy(col("lang"))
        .agg(sum(col("sign")).as("n"),
          sum(col("sign") * col("n_chars")).as("sum_chars"))
        .write.mode("overwrite").parquet(s"$landedRoot/part=$id")
    }
    spark.read.parquet(landed)
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n"), sum(col("sum_chars")).as("sum_chars"))
      .filter(col("n") > 0)
      .orderBy(col("lang"))
  }
}
