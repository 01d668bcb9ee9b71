package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import graft.streaming.{InMemoryRecordProducer, KinesisSink, Replay, UpsertSink}

/** Oracle-checked exercises of the streaming surface (SURVEY §2.9).
  * Replay pacing runs with timeScale = 0 here (correctness, not
  * wall-clock); the pacing math itself is pinned by ReplaySpec. */
/** Oracle-checked exercises of the streaming surface (SURVEY §2.9).
  * Replay pacing runs with timeScale = 0 here (correctness, not
  * wall-clock); the pacing math itself is pinned by ReplaySpec.
  *
  * The implementation lives in one trait per family (r11 verdict ask:
  * split the 1,701-line object along the ingest-twin vs serve-twin
  * boundary), all mixed back into this single facade so every existing
  * call site (`StreamingQueries.xyz`) is unchanged. The `queries` and
  * `oracleSql` maps stay HERE, whole — the oracle text never moved, so
  * the split cannot drift it (RegistrySpec guards the recomposition
  * either way). */
object StreamingQueries
    extends StreamingCoreFamily
    with StreamingIngestFamily
    with StreamingLifecycleFamily
    with StreamingOccFamily
    with StreamingServeFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s49_stream_cdf_maintenance" -> s49StreamCdfMaintenance _,
    "s48_occ_stats_ingest" -> s48OccStatsIngest _,
    "s47_log_stream_source" -> s47LogStreamSource _,
    "s46_occ_image_daemon" -> s46OccImageDaemon _,
    "s45_occ_vector_daemon" -> s45OccVectorDaemon _,
    "s44_occ_table_daemon" -> s44OccTableDaemon _,
    "s43_occ_cdc_daemon" -> s43OccCdcDaemon _,
    "s42_occ_token_daemon" -> s42OccTokenDaemon _,
    "s41_occ_keyword_daemon" -> s41OccKeywordDaemon _,
    "s40_stream_vector_replica" -> s40StreamVectorReplica _,
    "s39_stream_token_policy_compaction" -> s39StreamTokenPolicyCompaction _,
    "s38_stream_index_replica" -> s38StreamIndexReplica _,
    "s37_stream_cdc_replica" -> s37StreamCdcReplica _,
    "s36_stream_policy_compaction" -> s36StreamPolicyCompaction _,
    "s35_stream_image_lifecycle" -> s35StreamImageLifecycle _,
    "s34_stream_vector_lifecycle" -> s34StreamVectorLifecycle _,
    "s33_stream_token_lifecycle" -> s33StreamTokenLifecycle _,
    "s32_stream_keyword_lifecycle" -> s32StreamKeywordLifecycle _,
    "s26_stream_stack_serving" -> s26StreamStackServing _,
    "s27_stream_vector_serving" -> s27StreamVectorServing _,
    "s28_stream_rerank_serving" -> s28StreamRerankServing _,
    "s29_stream_token_deletes" -> s29StreamTokenDeletes _,
    "s30_stream_image_deletes" -> s30StreamImageDeletes _,
    "s31_stream_keyword_deletes" -> s31StreamKeywordDeletes _,
    "s25_stream_token_hash_ingest" -> s25StreamTokenHashIngest _,
    "s24_stream_image_hash_ingest" -> s24StreamImageHashIngest _,
    "s23_stream_heavy_hitters" -> s23StreamHeavyHitters _,
    "s22_stream_decontam_guard" -> s22StreamDecontamGuard _,
    "s21_stream_multimodal" -> s21StreamMultimodal _,
    "s20_stream_search" -> s20StreamSearch _,
    "s19_drift_monitor" -> s19DriftMonitor _,
    "s18_stream_classifier" -> s18StreamClassifier _,
    "s17_stream_keyword_ingest" -> s17StreamKeywordIngest _,
    "s16_stream_export" -> s16StreamExport _,
    "s15_stream_deletes" -> s15StreamDeletes _,
    "s14_stream_ann_ingest" -> s14StreamAnnIngest _,
    "s13_transform_with_state" -> s13TransformWithState _,
    "s12_foreachbatch_upsert" -> s12ForeachBatchUpsert _,
    "s11_stream_static_join" -> s11StreamStaticJoin _,
    "s01_replay_sink"  -> s01ReplaySink _,
    "s02_stream_window" -> s02StreamWindow _,
    "s03_stateful_counts" -> s03StatefulCounts _,
    "s04_replay_source" -> s04ReplaySource _,
    "s05_stream_pipeline" -> s05StreamPipeline _,
    "s06_stream_dedup" -> s06StreamDedup _,
    "s07_stream_topk" -> s07StreamTopK _,
    "s08_interval_join" -> s08IntervalJoin _,
    "s09_stream_dedup_bounded" -> s09StreamDedupBounded _,
    "s10_session_window" -> s10SessionWindow _,
  )

  val oracleSql: Map[String, String] = Map(
    // queries are independent rows, so the streamed serving loop must
    // be indistinguishable from the one-shot a19 search — the SAME
    // oracle hash pins that batch boundaries leave no trace in the
    // results the frozen index serves
    "s20_stream_search" -> AnalyticsQueries.oracleSql("a19_keyword_search_prebuilt"),
    // every stage of the composed stack is per-query decomposable, so
    // four query micro-batches against the frozen indexes must union
    // to exactly the one-shot composition — a31's full-stack oracle
    // (all four chains replayed inline) pins the streamed serve
    "s26_stream_stack_serving" -> AnalyticsQueries.oracleSql("a31_stack_served"),
    // probes, ADC scoring, and the exact re-rank are all per-query, so
    // four query micro-batches against the frozen IVF-PQ index must
    // union to exactly the one-shot a13 — the SAME inline-CTE oracle
    // pins that batch boundaries leave no trace in vector serving
    "s27_stream_vector_serving" ->
      AnalyticsQueries.oracleSql("a13_ivfpq_search_prebuilt"),
    // shortlist, fetch, kernel and rank are all per-query, so four
    // query micro-batches against the frozen keyword + token indexes
    // must union to exactly the one-shot a29 re-rank — the SAME
    // full-replay oracle pins the streamed late-interaction serve
    "s28_stream_rerank_serving" -> AnalyticsQueries.oracleSql("a29_maxsim_served"),
    // the delete set applied exactly once, however it was batched:
    // the streamed landings anti-joined over base ∪ segment must be
    // indistinguishable from a34's one-shot tombstones — same oracle
    "s29_stream_token_deletes" -> AnalyticsQueries.oracleSql("a34_tombstone_rerank"),
    // same on the image channel: streamed retractions re-cluster the
    // survivors exactly as m12's one-shot deletes — same oracle
    "s30_stream_image_deletes" -> AnalyticsQueries.oracleSql("m12_tombstone_neardup"),
    // and on the keyword channel: the accumulated streamed landings
    // anti-joined on the compacted postings must serve exactly a36's
    // one-shot frozen-stats search — same oracle, closing the streamed
    // delete matrix's last cell
    "s31_stream_keyword_deletes" -> AnalyticsQueries.oracleSql("a36_keyword_tombstones"),
    // the stream-driven cycle must serve exactly what the batch cycle
    // serves — a37's fresh-build-over-survivors oracle (df/idf re-
    // statted over the surviving corpus), however the segments and
    // tombstones were batched onto the landing protocol
    "s32_stream_keyword_lifecycle" ->
      AnalyticsQueries.oracleSql("a37_keyword_lifecycle"),
    // the other three channels' merges are pure layout rewrites, so
    // their stream-driven cycles are gated by the same delete oracles
    // that gate the batch cycles (a38/a39/m13): however the segments
    // and tombstones arrived, serving after the loop must be
    // indistinguishable from the one-shot delete step
    "s33_stream_token_lifecycle" ->
      AnalyticsQueries.oracleSql("a34_tombstone_rerank"),
    "s34_stream_vector_lifecycle" ->
      AnalyticsQueries.oracleSql("a16_tombstone_search"),
    "s35_stream_image_lifecycle" ->
      AnalyticsQueries.oracleSql("m12_tombstone_neardup"),
    // policy-scheduled merges inside the stream must serve exactly the
    // fresh monolithic build — a19's oracle; WHEN the daemon merged is
    // invisible in what it serves (KwMergeConfluenceProperties is the
    // quantified algebra behind this)
    "s36_stream_policy_compaction" ->
      AnalyticsQueries.oracleSql("a19_keyword_search_prebuilt"),
    // the streamed index replica, resolved at head, must serve exactly
    // the source log's epoch 3 — a37's fresh-build-over-survivors body
    // (a40's epoch-3 slice): segment shipping and admission order
    // leave no trace in what the replica serves
    "s38_stream_index_replica" ->
      AnalyticsQueries.oracleSql("a37_keyword_lifecycle"),
    // the vector replica resolved at head must serve the a39 purged
    // table exactly — a16's oracle, the same hash pinning a16/a39/s34
    // and p30: one more arrival shape under one answer, the frozen
    // codebooks never shipped because serving state is not epoch state
    "s40_stream_vector_replica" ->
      AnalyticsQueries.oracleSql("a16_tombstone_search"),
    // the token-channel daemon: policy-scheduled layout merges inside
    // the stream must serve a29's shortlist re-rank exactly as the
    // monolithic table does — a29's oracle, the same hash that already
    // pins a32 (generational) and a33 (one-shot compaction); the
    // daemon adds the policy-scheduled arrival shape
    "s39_stream_token_policy_compaction" ->
      AnalyticsQueries.oracleSql("a29_maxsim_served"),
    // the OCC-committed daemons: committing every landing and merge
    // through the concurrency protocol — node set derived from the
    // LOG, replay safety from the txn action, landings re-committed
    // after the drain — must leave NO trace in what the daemon
    // serves: the SAME oracles that gate the driver-state daemons
    // (s36's a19 monolith, s39's a29 re-rank) gate the log-state ones
    "s41_occ_keyword_daemon" ->
      AnalyticsQueries.oracleSql("a19_keyword_search_prebuilt"),
    "s42_occ_token_daemon" ->
      AnalyticsQueries.oracleSql("a29_maxsim_served"),
    // the CDC daemon through the OCC log: segments AND tombstone
    // lists committed through the protocol, delete-applying re-stat
    // merges resolved from the log — must serve exactly a37's
    // fresh-build-over-survivors, the same hash that gates the batch
    // cycle (a37), the ledger-landed stream cycle (s32), and the
    // thread-raced arbitration (p31)
    "s43_occ_cdc_daemon" ->
      AnalyticsQueries.oracleSql("a37_keyword_lifecycle"),
    // the doc-table OPTIMIZE daemon: bin-packing rewrites committed
    // through the protocol never change content, and the tombstone
    // lists apply merge-on-read in full — whatever batch a doc or its
    // retraction landed in, head membership is every inserted doc
    // minus every tombstoned id, straight from the definitions
    "s44_occ_table_daemon" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,
    // the vector daemon: code rows are per-vector functions of the
    // FROZEN codebooks, so a full-corpus daemon build is row-identical
    // to a12's stored-base ∪ increment — a12's oracle, one answer for
    // the one-shot append, the ledger stream, and the log-state daemon
    "s45_occ_vector_daemon" ->
      AnalyticsQueries.oracleSql("a12_pq_index_update"),
    // the image daemon: perceptual hashes are pure per-media functions,
    // so m07's oracle pins the fifth arrival shape (inline, prebuilt,
    // ledger-streamed, generational, and now log-state) to one answer
    "s46_occ_image_daemon" ->
      AnalyticsQueries.oracleSql("m07_image_neardup"),
    // the maintained aggregate from change rows alone must equal
    // recomputing over the final table state: all docs inserted, ids
    // divisible by 5 re-priced +100 by the update, ids divisible by 7
    // retracted with their pre-images — a consumer that subtracted a
    // stale pre-image (or missed the 5-and-7 composition) lands on a
    // different sum and breaks the hash
    "s49_stream_cdf_maintenance" ->
      """SELECT lang, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN n_chars + 100
        |                ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 7 <> 0
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // stats-carrying streamed landings: the predicate slice and the
    // stats-answered table MAX must match the batch ingest log (p34)
    // exactly — streamed stats, compacted through the OCC checkpoint,
    // leave no trace in what the reader computes
    "s48_occ_stats_ingest" ->
      AnalyticsQueries.oracleSql("p34_stats_skipping"),
    // the log-direct streaming source: the replica it feeds must be
    // exactly the as-of-3 membership — s37's oracle body, one answer
    // whether the feed arrives as staged files or straight off the log
    "s47_log_stream_source" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 4 <= 2 AND doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,
    // the replica after consuming the whole feed must be EXACTLY the
    // as-of-3 snapshot's membership, recomputed from the definitions:
    // v0+v1+v2 inserts (doc_id % 4 <= 2) minus the v3 delete
    // (doc_id % 3 = 0) — commit-version resolution makes the file
    // source's admission order invisible in the answer
    "s37_stream_cdc_replica" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 4 <= 2 AND doc_id % 3 <> 0
        |ORDER BY doc_id""".stripMargin,
    // token hashes are a pure per-doc function, so base ∪ streamed
    // landings is EXACTLY the full inline index — the SAME oracle
    // hash pins a27 (inline), a28 (prebuilt), a30 (one-shot append),
    // and s25 (streamed append): four arrival shapes, one answer
    "s25_stream_token_hash_ingest" -> AnalyticsQueries.oracleSql("a27_maxsim_rerank"),
    // perceptual hashes are a pure function of the pixels, so the
    // streamed batch-id-keyed landings re-clustered after the drain
    // must be indistinguishable from m07's one-shot decode (and m09's
    // prebuilt index) — the SAME oracle hash pins all three channels
    "s24_stream_image_hash_ingest" -> AnalyticsQueries.oracleSql("m07_image_neardup"),
    // MG's merged guarantee makes the exact-recounted heavy hitters
    // independent of how the stream was batched — the SAME oracle as
    // the one-shot q41, exact counts included
    "s23_stream_heavy_hitters" -> AdvancedQueries.oracleSql("q41_heavy_hitters"),
    // the guard's verdicts recomputed in one shot from the base table
    // (d09's shingle CTE, probe direction reversed: per-TRAIN-doc
    // overlap against the eval vocabulary) — Bloom false positives die
    // in the exact join and batch boundaries leave no trace, so the
    // streamed landings must hash-match this batch recompute
    "s22_stream_decontam_guard" ->
      s"""WITH hs AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(string_split_regex(trim(text), '\\s+'))-3),
         |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, length(array_to_string(
         |        string_split_regex(trim(text), '\\s+')[i:i+3], ' '))+1),
         |        _pc -> unicode(substring(array_to_string(
         |          string_split_regex(trim(text), '\\s+')[i:i+3], ' '), _pc, 1)))),
         |      (_pa,_pb) -> (_pa*31+_pb) % 1000000007))) AS hv
         |  FROM documents),
         |tr AS (SELECT doc_id, hv, len(hv) AS n_shingles FROM hs
         |  WHERE doc_id % 10 <> 0 AND len(hv) > 0),
         |ev AS (SELECT DISTINCT unnest(hv) AS h FROM hs WHERE doc_id % 10 = 0),
         |probe AS (SELECT doc_id, unnest(hv) AS h FROM tr),
         |c AS (SELECT probe.doc_id, COUNT(*) AS n_overlap
         |  FROM probe JOIN ev USING (h) GROUP BY 1)
         |SELECT tr.doc_id, tr.n_shingles,
         |  COALESCE(c.n_overlap, 0) AS n_overlap,
         |  COALESCE(c.n_overlap, 0) * 10 >= tr.n_shingles AS quarantined
         |FROM tr LEFT JOIN c USING (doc_id) ORDER BY tr.doc_id""".stripMargin,
    // the decoder holds no cross-batch state, so streamed decode must
    // be indistinguishable from the one-shot m03 — the SAME oracle
    // (arithmetic pixel recompute) pins it
    "s21_stream_multimodal" -> AnalyticsQueries.oracleSql("m03_resize"),
    // s14's search over corpus∪streamed-increment codes is
    // algebraically a12's one-shot update: the SAME oracle hash pins
    // that micro-batch boundaries leave no trace in the index
    "s14_stream_ann_ingest" -> AnalyticsQueries.oracleSql("a12_pq_index_update"),
    // s17 must be indistinguishable from the one-shot a20 update: same
    // frozen-dictionary impacts, same segment-local OOV stats, same
    // pruned search — batch boundaries leave no trace
    "s17_stream_keyword_ingest" -> AnalyticsQueries.oracleSql("a20_keyword_index_update"),
    // s18's streamed scoring must equal t17's one-shot apply: the SAME
    // oracle hash pins that micro-batch boundaries leave no trace in
    // the scores the frozen model serves
    "s18_stream_classifier" -> AnalyticsQueries.oracleSql("t17_classifier_apply"),
    // the drift numbers summed across batch landings must equal the
    // batch twin computed directly from the table — window membership
    // (doc_id % 4) is deterministic, so the oracle reproduces it
    "s19_drift_monitor" ->
      """WITH d AS (SELECT doc_id % 4 AS w, lang FROM documents),
        |base AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |wc AS (SELECT w, lang, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY w, lang),
        |wn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS nw FROM d GROUP BY w),
        |j AS (SELECT a.w, a.nw, a.lang,
        |    (1000 * COALESCE(wc.c, 0)) // a.nw AS pmw,
        |    (1000 * a.cb) // a.n AS pmb
        |  FROM (SELECT wn.w, wn.nw, base.lang, base.cb, tot.n
        |        FROM wn CROSS JOIN base CROSS JOIN tot) a
        |  LEFT JOIN wc ON wc.w = a.w AND wc.lang = a.lang)
        |SELECT CAST(w AS BIGINT) AS w, CAST(MAX(nw) AS BIGINT) AS n_docs,
        |  CAST(SUM(ABS(pmw - pmb)) AS BIGINT) AS l1_drift3,
        |  CAST(SUM(ABS(pmw - pmb)) AS BIGINT) > 150 AS drifted
        |FROM j GROUP BY w ORDER BY w""".stripMargin,
    // s15's post-stream search is algebraically a16's soft-delete
    // search: the SAME oracle hash pins that delete batch boundaries
    // leave no trace in what search can see
    "s15_stream_deletes" -> AnalyticsQueries.oracleSql("a16_tombstone_search"),
    // the streamed export must reconcile exactly like the batch one:
    // batch boundaries leave no trace in what the consumer accepts
    "s16_stream_export" -> AnalyticsQueries.oracleSql("p20_export_manifest"),
    // max_value is a raw stored double (no arithmetic), so the hash
    // compare is exact
    "s13_transform_with_state" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT event_type) AS n_types, MAX(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "s12_foreachbatch_upsert" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "s11_stream_static_join" ->
      """SELECT n_name, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "s01_replay_sink" ->
      """SELECT event_type AS partition_id,
        |  COUNT(*) AS n, MIN(props) AS min_payload, MAX(props) AS max_payload
        |FROM events GROUP BY event_type ORDER BY partition_id""".stripMargin,
    "s02_stream_window" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "s03_stateful_counts" ->
      """SELECT event_type, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "s04_replay_source" ->
      """SELECT event_type AS partition_id,
        |  COUNT(*) AS n, MIN(props) AS min_payload, MAX(props) AS max_payload
        |FROM events GROUP BY event_type ORDER BY partition_id""".stripMargin,
    // delivered-exactly despite injected transient failures → the sink
    // holds precisely the events table
    "s05_stream_pipeline" ->
      """SELECT event_type AS partition_id,
        |  COUNT(*) AS n, MIN(props) AS min_payload, MAX(props) AS max_payload
        |FROM events GROUP BY event_type ORDER BY partition_id""".stripMargin,
    // streaming dedup must agree with the batch distinct count
    "s06_stream_dedup" ->
      """SELECT lang, COUNT(DISTINCT lower(trim(text))) AS n_unique
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // streaming top-k state must agree with the batch window form
    "s07_stream_topk" ->
      """WITH s AS (SELECT lang, doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words
        |  FROM documents),
        |r AS (SELECT lang, doc_id, n_words,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_words DESC, doc_id) AS rank
        |  FROM s)
        |SELECT lang, rank, doc_id, n_words FROM r WHERE rank <= 3
        |ORDER BY lang, rank""".stripMargin,
    // the drained stream-stream interval join must equal the batch
    // interval join (whole-second timestamps, so lag_s is exact)
    "s08_interval_join" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        |  date_diff('second', a.ts, b.ts) AS lag_s
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |ORDER BY a.user_id, click_id, purchase_id""".stripMargin,
    // bounded-state dedup drained within one watermark horizon must
    // equal the batch distinct count
    "s09_stream_dedup_bounded" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // lag-based sessionization with the same >= 30 min split rule as
    // session_window's end-exclusive spans (testdata has no gap of
    // exactly 30 min, so the boundary convention is unambiguous)
    "s10_session_window" ->
      """WITH o AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |         >= INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM o),
        |g AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
