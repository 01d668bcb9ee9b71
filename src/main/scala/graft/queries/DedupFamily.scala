package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextFunctions => TF, Vectors}
import graft.operators.{Dedup, Multimodal}

/** Extended analytics surface (SURVEY §7.6 / driver mandate): dedup,
  * similarity search, text analysis, multimodal plumbing — each with an
  * exact DuckDB twin built from the [[Sql]] snippet builders below so
  * the driver's hash gate checks real semantics, not just row counts. */

/** Dedup / decontamination family (d01-d16, p22) — one slice of [[AnalyticsQueries]], split along
  * COVERAGE.md's family boundaries (r10 verdict ask). Mixed back
  * into the single `AnalyticsQueries` facade; behavior unchanged.
  * Members that cross family lines are `private[queries]`.
  * CONVENTION: task closures (flatMapGroups/mapPartitions/...)
  * must NOT reference trait-level vals/defs — that captures the
  * whole facade (Task-not-serializable); hoist to a local first.
  * `tools/closurelint.py` fails CI on the next violation; it also
  * bans trait-level `object`s (every reference captures the facade
  * when it serializes, even thunks built inside driver-side
  * foreachBatch bodies — the r12 s05 incident): JVM-shared state
  * goes at file top level. */
private[queries] trait DedupFamily { this: AnalyticsQueries.type =>

  import Sql._

  /** d01 — exact dedup on normalized text. */
  def d01ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir), col("doc_id"), col("text"))
      .orderBy(col("canonical_id"))

  /** d02 — n-gram Jaccard near-dup pairs (4-word shingles, j ≥ 0.5),
    * candidates from a shared-shingle explode-join. */
  def d02NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, dir), col("doc_id"), col("text"),
        n = 4, minJaccard = 0.5)
      .orderBy(col("i"), col("j"))

  /** d03 — MinHash (k=32) + LSH (16 bands × 2 rows) candidates, exact
    * Jaccard verify — the 100 TB dedup path. */
  def d03MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, dir), col("doc_id"), col("text"),
        n = 4, k = 32, bands = 16, minJaccard = 0.5)
      .select(col("i"), col("j"))
      .orderBy(col("i"), col("j"))

  /** d04 — 16-bit SimHash clusters. */
  def d04Simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.wordHashes(col("text")).as("hv"))
      .select(col("doc_id"), Dedup.simhashFromHashes(col("hv"), 16).as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("simhash"))

  /** d07 — duplicate clusters: connected components over the d02
    * near-dup pairs; cluster id = smallest member (canonical doc). */
  def d07DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(Tables.documents(spark, dir),
      col("doc_id"), col("text"), n = 4, minJaccard = 0.5).select(col("i"), col("j"))
    Dedup.dupClusters(pairs).orderBy(col("doc_id"))
  }

  /** d11 — dedup APPLIED end to end (d03/d07 find structure; this is
    * the op a pipeline actually ships): near-dup pairs (4-gram
    * Jaccard ≥ 0.5) → connected components (large/small-star, O(log n)
    * rounds) → each cluster keeps its lowest-doc_id representative →
    * per-lang kept/removed accounting plus surviving token volume.
    * Scale shape: everything upstream is the already-audited bucketed
    * pair + CC machinery; the apply step adds one left join on doc_id
    * (cluster label is null for docs in no pair — trivially kept) and
    * one hash-agg. This is the number that decides a training run:
    * how much of the corpus survives dedup, per language. */
  def d11DedupApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      n = 4, minJaccard = 0.5).select(col("i"), col("j"))
    val clusters = Dedup.dupClusters(pairs) // (doc_id, cluster_id)
    docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("kept",
        col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), TF.tokenCount(col("text")).cast("long"))
          .otherwise(0L)).as("kept_tokens"))
      .orderBy(col("lang"))
  }

  /** p22 — leakage-safe train/val/test split (the eval-integrity op
    * every training pipeline needs BEFORE it splits: Lee ACL'22 §5
    * showed near-dups straddling a naive random split leak test
    * answers into training): near-dup pairs (d02's 4-gram
    * Jaccard ≥ 0.5) → connected components (d07's large/small-star) →
    * every document follows its CLUSTER REPRESENTATIVE into the split,
    * so a near-dup family lands wholly in train, val, or test. The
    * assignment is rep % 20 → test(0) / val(1) / train(rest) — a
    * deterministic 5/5/90 hash split on the cluster key, the standard
    * trick so re-runs and increments route identically. Emits per
    * split (n_docs, n_clusters, n_tokens) plus two global audit
    * columns: leaky_clusters (clusters straddling splits under THIS
    * assignment — structurally 0, the invariant the gate pins) and
    * leaky_clusters_naive (the same count under a doc_id % 20 split —
    * the leak a cluster-blind split would have shipped). Scale shape:
    * the pair + CC machinery is d07's audited O(log n)-round path; the
    * apply adds one broadcast-sized left join and two hash-aggs, and
    * the leak audit aggregates cluster-count-sized data. */
  def p22LeakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      n = 4, minJaccard = 0.5).select(col("i"), col("j"))
    def splitOf(key: Column): Column =
      when(pmod(key, lit(20)) === 0, lit("test"))
        .when(pmod(key, lit(20)) === 1, lit("val"))
        .otherwise(lit("train"))
    // checkpoint: the labeled frame feeds both the split accounting and
    // the leak audit — the LSH+CC pipeline above must not run twice
    val labeled = docs.join(Dedup.dupClusters(pairs), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", splitOf(col("rep")))
      .withColumn("naive_split", splitOf(col("doc_id")))
      .select(col("doc_id"), col("text"), col("rep"), col("split"),
        col("naive_split"))
      .localCheckpoint()
    val leak = labeled.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("ns"),
        countDistinct(col("naive_split")).as("nn"))
      .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("leaky_clusters"),
        sum(when(col("nn") > 1, 1L).otherwise(0L)).as("leaky_clusters_naive"))
    labeled.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"),
        sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .crossJoin(leak)
      .orderBy(col("split"))
  }

  /** d06 — SimHash near-dup pairs: 60-bit shingle-hash simhash, 6
    * bands × 10 bits (sound for Hamming ≤ 3), exact Hamming verify. */
  def d06SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), col("doc_id"), col("text"),
        n = 4, bits = 60, bands = 6, maxHamming = 3)
      .orderBy(col("i"), col("j"))

  /** d05 — embedding near-dup: label-blocked sliding-window candidate
    * pairs, top-40 by cosine (ids only; ranking is engine-stable because
    * the fold is IEEE-identical on both sides). */
  def d05EmbeddingDup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        Vectors.normSq(col("embedding")).as("nsq"))
    val a = e.toDF("i", "label", "ea", "na")
    val b = e.toDF("j", "label", "eb", "nb")
    a.join(b, Seq("label"))
      .filter(col("j") > col("i") && col("j") - col("i") <= 50)
      .withColumn("sim", Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb")))
      .orderBy(col("sim").desc, col("i"), col("j"))
      .limit(40)
      // global window AFTER the limit: it numbers ≤40 rows (driver
      // scale), so the single-partition WindowExec is benign — the
      // distributed work ended at the TakeOrdered above
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col("i"), col("j"))))
      .select(col("rank"), col("i"), col("j"))
  }

  /** d08 — embedding near-dup, the scale path: banded hyperplane-LSH
    * blocking (3 bands × 10 planes — 1024 buckets per band, the d06
    * simhash banding shape) with exact cosine verify — unlike d05's
    * label-blocked window, this needs no labels and its candidate
    * cost is band-bucket occupancy². Top-25 pairs by cosine (ids
    * only; the fold is IEEE-identical cross-engine). */
  def d08EmbeddingLsh(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.embeddingLshPairs(Tables.embeddings(spark, dir),
      col("vec_id"), col("embedding"), bands = 3, planesPerBand = 10)
    pairs.orderBy(col("sim").desc, col("i"), col("j")).limit(25)
      // global window AFTER the limit (≤25 rows) — benign, see d05
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col("i"), col("j"))))
      .select(col("rank"), col("i"), col("j"))
  }

  /** d10 — duplicated-substring span detection (the exact-substring
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL'22 — there via a corpus suffix
    * array): character-level 32-char windows at stride 16, hashed;
    * a window is a duplicated span iff its hash occurs in ≥ 2 distinct
    * docs. Stride-16 windows of width 32 overlap by 16, so any
    * duplicated substring of ≥ 47 chars is guaranteed to cover at
    * least one full window in both copies. Output: per-doc window
    * count + duplicated-window count (the "fraction of the doc that is
    * copied text" signal pipelines threshold on). Scale shape: explode
    * to (doc, hash) — volume = chars/16 — one distinct, one hash-agg,
    * one join back on 8-byte keys; no pairwise term at all. */
  def d10DupSpans(spark: SparkSession, dir: String): DataFrame = {
    val win = 32
    val stride = 16
    val docs = Tables.documents(spark, dir)
    val windows = docs.select(col("doc_id"),
        explode(when(length(col("text")) < win, array().cast("array<long>"))
          .otherwise(transform(
            sequence(lit(0),
              floor((length(col("text")) - lit(win)) / lit(stride)).cast("int")),
            k => TF.polyHash(col("text").substr(lit(1) + k * stride, lit(win))))))
          .as("h"))
    val perDocHash = windows.groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("n_local"))
    val dupHashes = perDocHash.groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs")).filter(col("n_docs") >= 2)
      .select(col("h"))
    val perDoc = windows.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
    val dupCounts = windows.join(dupHashes, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    perDoc.join(dupCounts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .orderBy(col("doc_id"))
  }

  /** d12 — SemDeDup (Abbas et al. '23, public): semantic dedup scoped
    * WITHIN a08's k-means clusters — the trick that makes embedding
    * dedup tractable at corpus scale. Pairwise cosine is computed only
    * between co-clustered vectors (an equi-join on the cluster id, cost
    * Σ cluster² instead of n²), pairs at sim ≥ 0.35 are emitted as
    * (keep lower id, drop higher id). The float threshold is exact,
    * not approximate: both engines fold the dot/norm in strict
    * ascending index order (a07/d05's parity), so `sim ≥ τ` is
    * bit-identical. Scale: clustering is the a08 scan; the pair join
    * shuffles each vector once per cluster key; no all-pairs term. */
  def d12SemDedup(spark: SparkSession, dir: String): DataFrame = {
    // materialize the clustering once (both pair-join sides consume it;
    // without this the a08 scan+broadcast subtree runs twice — at scale
    // the assignment would be a persisted table, this is the demo analog)
    val clusters = a08KmeansQuantized(spark, dir).select(col("vec_id"), col("cluster"))
      .localCheckpoint()
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Vectors.normSq(col("embedding")).as("nsq"))
      .join(clusters, Seq("vec_id"))
    val a = e.toDF("i", "ea", "na", "cluster")
    val b = e.toDF("j", "eb", "nb", "cluster")
    a.join(b, Seq("cluster"))
      .filter(col("j") > col("i"))
      .filter(Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb")) >= 0.35)
      .select(col("cluster"), col("i").as("keep_id"), col("j").as("dup_id"))
      .orderBy(col("cluster"), col("keep_id"), col("dup_id"))
  }

  /** d09 — train/eval contamination check (the "is my benchmark in the
    * training set" sweep every LLM data pipeline runs): eval docs =
    * reproducible 10% hash slice by doc_id, train = the rest; an eval
    * doc's contamination = the fraction of its distinct 4-word shingles
    * that appear anywhere in the train corpus. Scale shape: the train
    * shingle vocabulary is one distinct-shuffle over 8-byte hashes, the
    * probe is a shuffle join on those hashes, and everything per-doc is
    * a map-side-combinable count — no all-pairs term, linear in corpus
    * size. */
  def d09Contamination(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.documents(spark, dir).select(col("doc_id"),
      graft.expressions.WordShingleHashes(col("text"), 4).as("hv"))
    val isEval = pmod(col("doc_id"), lit(10)) === 0
    val evalSets = sets.filter(isEval && size(col("hv")) > 0)
    val trainVocab = sets.filter(!isEval)
      .select(explode(col("hv")).as("h")).distinct()
    val hits = evalSets.select(col("doc_id"), explode(col("hv")).as("h"))
      .join(trainVocab, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cont"))
    evalSets.select(col("doc_id"), size(col("hv")).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_cont"), lit(0L)))
      .withColumn("rate4",
        floor(lit(10000.0) * col("n_contaminated") / col("n_shingles")).cast("long"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"), col("rate4"))
      .orderBy(col("doc_id"))
  }

  /** d14 — Bloom-accelerated decontamination: d09's sweep with the
    * "ship the sketch, not the set" optimization every 100 TB
    * decontamination run needs. d09's dominant cost is the
    * distinct-shuffle over the FULL train shingle vocabulary (corpus-
    * token-scale) feeding a shuffle join; d14 instead builds a
    * [[graft.expressions.BloomAgg]] bitset over the EVAL shingles (the
    * small side — partial-aggregable, each map task ORs a local
    * bitset), broadcasts the constant-size filter into the train scan
    * as a codegen'd `graft_bloom_contains` predicate, and only the
    * surviving sliver (≈ |eval ∩ train| + the FP rate of the sliver's
    * complement) reaches the distinct + exact verify join. A Bloom
    * filter has no false negatives, and false positives are train
    * shingles that match no eval key in the exact join — so the
    * result is IDENTICAL to d09, and the gate runs d09's own oracle.
    * 2²⁰ bits / 5 hashes ≈ 0.05% FP at 50k eval keys; at production
    * eval-set sizes the filter stays megabytes while the train
    * vocabulary it prunes is terabytes — q32's runtime-pruning
    * economics replayed on decontamination. */
  def d14BloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.{BloomAgg, BloomContains}
    val sets = Tables.documents(spark, dir).select(col("doc_id"),
      graft.expressions.WordShingleHashes(col("text"), 4).as("hv"))
    val isEval = pmod(col("doc_id"), lit(10)) === 0
    val evalSets = sets.filter(isEval && size(col("hv")) > 0)
    val filterBytes = evalSets.select(explode(col("hv")).as("h"))
      .agg(BloomAgg(col("h"), numBits = 1 << 20, numHashes = 5).as("f"))
      .head.getAs[Array[Byte]]("f")
    val candVocab = sets.filter(!isEval)
      .select(explode(col("hv")).as("h"))
      .filter(BloomContains(lit(filterBytes), col("h")))
      .distinct()
    val hits = evalSets.select(col("doc_id"), explode(col("hv")).as("h"))
      .join(candVocab, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cont"))
    evalSets.select(col("doc_id"), size(col("hv")).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_cont"), lit(0L)))
      .withColumn("rate4",
        floor(lit(10000.0) * col("n_contaminated") / col("n_shingles")).cast("long"))
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"), col("rate4"))
      .orderBy(col("doc_id"))
  }

  /** d13 — INCREMENTAL near-dup, the companion p10's exact-hash form
    * cannot cover: the daily increment (odd doc_ids) is near-dup
    * checked against the existing corpus (even doc_ids) through the
    * corpus's MinHash BAND INDEX — d03's banding with the self-join
    * replaced by an increment→index join, so the corpus contributes
    * only its (id, band, key) rows (the persistable index table) and
    * its text is never rescanned. Candidates verify exact Jaccard
    * ≥ 0.5; output is the per-lang ingest accounting (incoming /
    * near-dup / novel) a daily crawl job reports. Scale shape: the
    * increment pays one scan + one band-key equi-join; corpus cost is
    * its index size. 12 of the 25 corpus-wide d03 pairs cross the
    * parity split at sf0.01, so the near-dup path has real positives. */
  /** d16 — edit-distance near-dup: d03's banded MinHash candidates
    * verified by exact character-level Levenshtein at ≤ 2% of the
    * longer text ([[Dedup.editDistancePairs]]) — the character-grain
    * verify Jaccard can't express: a one-character in-word typo
    * destroys n shingles but is ONE edit, while scattered word-level
    * rewrites can keep shingle overlap high as the texts drift far
    * apart in characters. Both engines compute
    * unit-cost Levenshtein as an exact integer, so the distances
    * themselves hash-gate, and the 2% threshold discriminates on the
    * gate corpus (some d03 candidates pass, some fail). Scale =
    * d03's: short-key bucket join for candidates, the O(len²) kernel
    * only on the candidate sliver. */
  def d16EditDistanceDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.editDistancePairs(Tables.documents(spark, dir),
      col("doc_id"), col("text"), 4, 32, 16, maxDistPct = 2)
      .orderBy(col("i"), col("j"))

  def d13IncrementalNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val dupIncrements = Dedup.incrementalNearDupPairs(docs, col("doc_id"), col("text"),
        (col("doc_id") % 2 === 0).as("is_corpus"), n = 4, k = 32, bands = 16,
        minJaccard = 0.5)
      .select(col("i").as("doc_id")).distinct()
    docs.filter(col("doc_id") % 2 === 1)
      .join(dupIncrements.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_near_dup"),
        (count(lit(1)) - sum(coalesce(col("is_dup"), lit(0L)))).as("n_novel"))
      .orderBy(col("lang"))
  }

  private[queries] lazy val shingleCte =
    s"""w AS (SELECT doc_id, ${shingles("text", 4)} AS sh FROM documents),
       |ws AS (SELECT doc_id, sh, len(sh) AS n FROM w)""".stripMargin

  /** d09's contamination sweep — shared verbatim by d14, whose Bloom
    * pre-filter must be result-invisible. */
  private[queries] lazy val d09OracleSql: String =
    s"""WITH hs AS (SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(${words("text")})-3),
       |    i -> ${polyHash(s"array_to_string(${words("text")}[i:i+3], ' ')")})) AS hv
       |  FROM documents),
       |ev AS (SELECT doc_id, hv, len(hv) AS n_shingles FROM hs
       |  WHERE doc_id % 10 = 0 AND len(hv) > 0),
       |tr AS (SELECT DISTINCT unnest(hv) AS h FROM hs WHERE doc_id % 10 <> 0),
       |probe AS (SELECT doc_id, unnest(hv) AS h FROM ev),
       |c AS (SELECT probe.doc_id, COUNT(*) AS n_cont
       |  FROM probe JOIN tr USING (h) GROUP BY 1)
       |SELECT ev.doc_id, ev.n_shingles,
       |  COALESCE(c.n_cont, 0) AS n_contaminated,
       |  CAST(floor(10000.0 * COALESCE(c.n_cont, 0) / ev.n_shingles) AS BIGINT) AS rate4
       |FROM ev LEFT JOIN c USING (doc_id) ORDER BY ev.doc_id""".stripMargin

  /** This family's slice of the oracle-SQL map (split from the
    * single oracleSqlBase literal; composed back in
    * [[AnalyticsQueries.oracleSqlBase]]). */
  private[queries] lazy val dedupOracles: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY lower(trim(text)) ORDER BY canonical_id""".stripMargin,
    "d02_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |e AS (SELECT doc_id, n, unnest(sh) AS s FROM ws),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j, a.n AS ni, b.n AS nj, COUNT(*) AS shared
         |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT i, j, shared, ni, nj FROM pairs
         |WHERE CAST(shared AS DOUBLE) / (ni + nj - shared) >= 0.5
         |ORDER BY i, j""".stripMargin,
    // Transitive closure over the d02 pair set via recursive CTE; the
    // UNION (not UNION ALL) dedups reach rows so the recursion
    // terminates; MIN(reaching node) per doc = component minimum.
    "d07_dup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
         |ex AS (SELECT doc_id, n, unnest(sh) AS s FROM ws),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j, a.n AS ni, b.n AS nj, COUNT(*) AS shared
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.n + b.n - COUNT(*)) >= 0.5),
         |e AS (SELECT i AS src, j AS dst FROM pairs UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id)
         |SELECT id AS doc_id, MIN(r) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // same component labels as d07, then the apply step: cluster
    // representative = min doc_id, accounting per lang
    "d11_dedup_apply" ->
      s"""WITH RECURSIVE $shingleCte,
         |ex AS (SELECT doc_id, n, unnest(sh) AS s FROM ws),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j, a.n AS ni, b.n AS nj, COUNT(*) AS shared
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.n + b.n - COUNT(*)) >= 0.5),
         |e AS (SELECT i AS src, j AS dst FROM pairs UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id),
         |lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |k AS (SELECT d.lang,
         |    CASE WHEN lab.cluster_id IS NULL OR lab.cluster_id = d.doc_id
         |         THEN 1 ELSE 0 END AS kept,
         |    CAST(len(${words("d.text")}) AS BIGINT) AS toks
         |  FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(kept) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN kept = 1 THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    // d11's CC chain, then both split assignments + the leak audit
    "p22_leakage_safe_split" ->
      s"""WITH RECURSIVE $shingleCte,
         |ex AS (SELECT doc_id, n, unnest(sh) AS s FROM ws),
         |pairs AS (
         |  SELECT a.doc_id AS i, b.doc_id AS j, a.n AS ni, b.n AS nj, COUNT(*) AS shared
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4
         |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.n + b.n - COUNT(*)) >= 0.5),
         |e AS (SELECT i AS src, j AS dst FROM pairs UNION ALL SELECT j, i FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM e),
         |reach AS (
         |  SELECT id, id AS r FROM nodes
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id),
         |lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |m AS (SELECT d.doc_id,
         |    CAST(len(${words("d.text")}) AS BIGINT) AS toks,
         |    COALESCE(lab.cluster_id, d.doc_id) AS rep
         |  FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
         |s AS (SELECT doc_id, toks, rep,
         |    CASE WHEN rep % 20 = 0 THEN 'test'
         |         WHEN rep % 20 = 1 THEN 'val' ELSE 'train' END AS split,
         |    CASE WHEN doc_id % 20 = 0 THEN 'test'
         |         WHEN doc_id % 20 = 1 THEN 'val' ELSE 'train' END AS naive_split
         |  FROM m),
         |lk AS (SELECT
         |    CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaky_clusters,
         |    CAST(SUM(CASE WHEN nn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaky_clusters_naive
         |  FROM (SELECT rep, COUNT(DISTINCT split) AS ns,
         |      COUNT(DISTINCT naive_split) AS nn FROM s GROUP BY rep))
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  lk.leaky_clusters, lk.leaky_clusters_naive
         |FROM s CROSS JOIN lk
         |GROUP BY split, lk.leaky_clusters, lk.leaky_clusters_naive
         |ORDER BY split""".stripMargin,
    // Shingle SETS are represented by their polynomial hashes (matching
    // WordShingleHashes): distinct hash of each 4-word window.
    "d03_minhash_lsh" ->
      s"""WITH hs AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(${words("text")})-3),
         |    i -> ${polyHash(s"array_to_string(${words("text")}[i:i+3], ' ')")})) AS hv
         |  FROM documents),
         |sig AS (SELECT doc_id, hv, len(hv) AS n,
         |  list_transform(range(0, 32), j -> coalesce(
         |    list_min(list_transform(hv, h -> ((j*2+1) * h + j*7919 + 13) % $P)),
         |    CAST($P AS BIGINT))) AS sg
         |  FROM hs),
         |banded AS (SELECT doc_id, hv, n, unnest(list_transform(range(0, 16), b ->
         |    {'band': b, 'key': array_to_string(sg[b*2+1:b*2+2], ':')})) AS bk
         |  FROM sig),
         |flat AS (SELECT doc_id, hv, n, bk.band AS band, bk.key AS key FROM banded),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j, a.hv AS si, b.hv AS sj,
         |    a.n AS ni, b.n AS nj
         |  FROM flat a JOIN flat b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT i, j FROM (
         |  SELECT i, j, len(list_intersect(si, sj)) AS shared, ni, nj FROM cand)
         |WHERE CAST(shared AS DOUBLE) / (ni + nj - shared) >= 0.5
         |ORDER BY i, j""".stripMargin,
    // d03's candidate CTEs carrying raw text; verify = DuckDB's own
    // exact levenshtein (unit-cost, same integers as Spark's)
    "d16_editdist_neardup" ->
      s"""WITH hs AS (SELECT doc_id, text, list_distinct(list_transform(
         |    range(1, len(${words("text")})-3),
         |    i -> ${polyHash(s"array_to_string(${words("text")}[i:i+3], ' ')")})) AS hv
         |  FROM documents),
         |sig AS (SELECT doc_id, text,
         |  list_transform(range(0, 32), j -> coalesce(
         |    list_min(list_transform(hv, h -> ((j*2+1) * h + j*7919 + 13) % $P)),
         |    CAST($P AS BIGINT))) AS sg
         |  FROM hs),
         |banded AS (SELECT doc_id, text, unnest(list_transform(range(0, 16), b ->
         |    {'band': b, 'key': array_to_string(sg[b*2+1:b*2+2], ':')})) AS bk
         |  FROM sig),
         |flat AS (SELECT doc_id, text, bk.band AS band, bk.key AS key FROM banded),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
         |    a.text AS ti, b.text AS tj
         |  FROM flat a JOIN flat b ON a.band = b.band AND a.key = b.key
         |    AND a.doc_id < b.doc_id)
         |SELECT i, j, CAST(levenshtein(ti, tj) AS BIGINT) AS dist,
         |  CAST(GREATEST(length(ti), length(tj)) AS BIGINT) AS max_len
         |FROM cand
         |WHERE levenshtein(ti, tj) * 100 <= GREATEST(length(ti), length(tj)) * 2
         |ORDER BY i, j""".stripMargin,
    // d03's banding with the self-join replaced by increment(odd) →
    // corpus(even) index join; per-lang ingest accounting
    "d13_incremental_neardup" ->
      s"""WITH hs AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(${words("text")})-3),
         |    i -> ${polyHash(s"array_to_string(${words("text")}[i:i+3], ' ')")})) AS hv
         |  FROM documents),
         |sig AS (SELECT doc_id, hv, len(hv) AS n,
         |  list_transform(range(0, 32), j -> coalesce(
         |    list_min(list_transform(hv, h -> ((j*2+1) * h + j*7919 + 13) % $P)),
         |    CAST($P AS BIGINT))) AS sg
         |  FROM hs),
         |banded AS (SELECT doc_id, hv, n, unnest(list_transform(range(0, 16), b ->
         |    {'band': b, 'key': array_to_string(sg[b*2+1:b*2+2], ':')})) AS bk
         |  FROM sig),
         |flat AS (SELECT doc_id, hv, n, bk.band AS band, bk.key AS key FROM banded),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j, a.hv AS si, b.hv AS sj,
         |    a.n AS ni, b.n AS nj
         |  FROM flat a JOIN flat b ON a.band = b.band AND a.key = b.key
         |    AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
         |dup AS (SELECT DISTINCT i FROM (
         |    SELECT i, len(list_intersect(si, sj)) AS shared, ni, nj FROM cand)
         |  WHERE CAST(shared AS DOUBLE) / (ni + nj - shared) >= 0.5)
         |SELECT d.lang, COUNT(*) AS n_incoming,
         |  CAST(SUM(CASE WHEN dup.i IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
         |  CAST(COUNT(*) - SUM(CASE WHEN dup.i IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |FROM documents d LEFT JOIN dup ON d.doc_id = dup.i
         |WHERE d.doc_id % 2 = 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d04_simhash" ->
      s"""WITH hv AS (SELECT doc_id,
         |  list_transform(${words("text")}, w -> ${polyHash("w")}) AS wh FROM documents),
         |h AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 16), b ->
         |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(wh, x ->
         |          CASE WHEN (x & CAST(power(2, b) AS BIGINT)) <> 0
         |               THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
         |        (x,y) -> x+y) >= 0
         |    THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
         |    (x,y) -> x+y) AS simhash
         |  FROM hv)
         |SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
         |FROM h GROUP BY simhash ORDER BY simhash""".stripMargin,
    "d06_simhash_pairs" ->
      s"""WITH hv AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(${words("text")})-3),
         |    i -> ${polyHash(s"array_to_string(${words("text")}[i:i+3], ' ')")})) AS sh_h
         |  FROM documents),
         |h AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 60), b ->
         |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(sh_h, x ->
         |      CASE WHEN ((x * (b*2+1)) % $P & 1) <> 0 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
         |      (x,y) -> x+y) >= 0
         |    THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
         |    (x,y) -> x+y) AS sh FROM hv WHERE len(sh_h) > 0),
         |banded AS (SELECT doc_id, sh, unnest(range(0, 6)) AS b FROM h),
         |fl AS (SELECT doc_id, sh, b, (sh >> CAST(b*10 AS BIGINT)) & 1023 AS bv FROM banded),
         |cand AS (SELECT DISTINCT a.doc_id AS i, b2.doc_id AS j, a.sh AS si, b2.sh AS sj
         |  FROM fl a JOIN fl b2 ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id)
         |SELECT i, j, bit_count(xor(si, sj)) AS hamming FROM cand
         |WHERE bit_count(xor(si, sj)) <= 3 ORDER BY i, j""".stripMargin,
    "d05_embedding_dup" ->
      s"""WITH e AS (SELECT vec_id, label, embedding, ${normSq("embedding")} AS nsq FROM embeddings),
         |p AS (SELECT a.vec_id AS i, b.vec_id AS j,
         |    ${cosine(dot("a.embedding", "b.embedding"), "a.nsq", "b.nsq")} AS sim
         |  FROM e a JOIN e b ON a.label = b.label AND b.vec_id > a.vec_id
         |    AND b.vec_id - a.vec_id <= 50),
         |top AS (SELECT i, j, sim FROM p ORDER BY sim DESC, i, j LIMIT 40)
         |SELECT ROW_NUMBER() OVER (ORDER BY sim DESC, i, j) AS rank, i, j
         |FROM top ORDER BY rank""".stripMargin,
    "d08_embedding_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq,
         |  ${lshBits(30)} AS allbits FROM embeddings),
         |banded AS (SELECT vec_id, embedding, nsq, allbits, unnest(range(0, 3)) AS b FROM e),
         |fl AS (SELECT vec_id, embedding, nsq, b,
         |  (allbits // CAST(power(2, b*10) AS BIGINT)) % 1024 AS bk FROM banded),
         |cand AS (SELECT DISTINCT a.vec_id AS i, c.vec_id AS j,
         |    a.embedding AS ea, a.nsq AS na, c.embedding AS eb, c.nsq AS nb
         |  FROM fl a JOIN fl c ON a.b = c.b AND a.bk = c.bk AND a.vec_id < c.vec_id),
         |p AS (SELECT i, j, ${cosine(dot("ea", "eb"), "na", "nb")} AS sim FROM cand),
         |top AS (SELECT i, j, sim FROM p ORDER BY sim DESC, i, j LIMIT 25)
         |SELECT ROW_NUMBER() OVER (ORDER BY sim DESC, i, j) AS rank, i, j
         |FROM top ORDER BY rank""".stripMargin,
    "d09_contamination" -> d09OracleSql,
    // a Bloom filter has no false negatives and the exact verify join
    // absorbs false positives, so the sketch-accelerated plan must be
    // indistinguishable from d09 — the SAME oracle hash pins it
    "d14_bloom_decontam" -> d09OracleSql,
    "d10_dup_spans" ->
      s"""WITH w AS (SELECT doc_id,
         |    CASE WHEN length(text) < 32 THEN CAST([] AS BIGINT[])
         |    ELSE list_transform(range(0, CAST(floor((length(text)-32)/16) AS BIGINT)+1),
         |      _dk -> ${polyHash("substring(text, CAST(1+_dk*16 AS BIGINT), 32)")}) END AS hs
         |  FROM documents),
         |win AS (SELECT doc_id, unnest(hs) AS h FROM w),
         |dh AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM win GROUP BY h)
         |  WHERE nd >= 2),
         |pd AS (SELECT doc_id, COUNT(*) AS n_windows FROM win GROUP BY doc_id),
         |dc AS (SELECT win.doc_id, COUNT(*) AS n_dup FROM win JOIN dh USING (h) GROUP BY 1)
         |SELECT pd.doc_id, pd.n_windows, COALESCE(dc.n_dup, 0) AS n_dup
         |FROM pd LEFT JOIN dc USING (doc_id) ORDER BY pd.doc_id""".stripMargin,
    "d12_semdedup" ->
      s"""WITH $kmeansCtes,
         |e AS (SELECT vec_id, cluster, embedding, ${normSq("embedding")} AS nsq
         |  FROM embeddings JOIN asg USING (vec_id))
         |SELECT a.cluster AS cluster, a.vec_id AS keep_id, b.vec_id AS dup_id
         |FROM e a JOIN e b ON a.cluster = b.cluster AND b.vec_id > a.vec_id
         |WHERE ${cosine(dot("a.embedding", "b.embedding"), "a.nsq", "b.nsq")} >= 0.35
         |ORDER BY 1, 2, 3""".stripMargin,
  )

}
