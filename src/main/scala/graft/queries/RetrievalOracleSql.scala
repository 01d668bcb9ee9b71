package graft.queries

/** DuckDB-SQL oracle builders for the keyword/passage/hybrid/MMR
  * retrieval family — the oracle side split out of RetrievalFamily
  * when it crossed 1,300 lines (the r12 growth watch, same boundary as
  * VectorOracleSql): the unrolled MMR greedy CTEs plus the
  * retrievalOracles map. Pure SQL-string builders, no behavior change;
  * mixed back into the facade with the same `private[queries]`
  * visibility, still composable by the late-interaction oracles
  * through the shared self-type.
  * CONVENTION: task closures must NOT reference trait-level vals/defs
  * (facade capture — tools/closurelint.py); trait-level `object`s are
  * banned; JVM-shared state goes at file top level. (No task closures
  * exist here — everything is driver-side string building.) */
private[queries] trait RetrievalOracleSql { this: AnalyticsQueries.type =>

  import Sql._

  /** The greedy MMR loop unrolled for exactly [[MmrSelect]] steps over
    * CTEs `sl(query_id, cand_id, rel)` and `pc(query_id, ai, bi, sim)`
    * — shared by a25 (exact-scan shortlist) and a26 (stored-index
    * shortlist): the selection algebra is one text, only the shortlist
    * source differs. Already margin-stripped for embedding.
    * [[mmrStepCtes]] is the s1..s4 selection algebra alone, for
    * callers (a31) that consume the picks as a CTE instead of as the
    * final projection. */
  private[queries] lazy val mmrUnrollSql: String =
    mmrStepCtes + "\n" +
      """SELECT query_id, 1 AS rank, sel AS selected_id FROM s1
        |UNION ALL SELECT query_id, 2, sel FROM s2
        |UNION ALL SELECT query_id, 3, sel FROM s3
        |UNION ALL SELECT query_id, 4, sel FROM s4
        |ORDER BY query_id, rank""".stripMargin

  private[queries] lazy val mmrStepCtes: String =
    """s1 AS (SELECT query_id, cand_id AS sel FROM (
      |    SELECT query_id, cand_id, ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY 0.5*rel - 0.5*0.0 DESC, cand_id) AS r FROM sl) WHERE r = 1),
      |s2 AS (SELECT query_id, cand_id AS sel FROM (
      |    SELECT s.query_id, s.cand_id, ROW_NUMBER() OVER (PARTITION BY s.query_id
      |      ORDER BY 0.5*s.rel - 0.5*p1.sim DESC, s.cand_id) AS r
      |    FROM sl s
      |    JOIN s1 ON s.query_id = s1.query_id AND s.cand_id <> s1.sel
      |    JOIN pc p1 ON p1.query_id = s.query_id AND p1.ai = s.cand_id
      |      AND p1.bi = s1.sel) WHERE r = 1),
      |s3 AS (SELECT query_id, cand_id AS sel FROM (
      |    SELECT s.query_id, s.cand_id, ROW_NUMBER() OVER (PARTITION BY s.query_id
      |      ORDER BY 0.5*s.rel - 0.5*GREATEST(p1.sim, p2.sim) DESC, s.cand_id) AS r
      |    FROM sl s
      |    JOIN s1 ON s.query_id = s1.query_id AND s.cand_id <> s1.sel
      |    JOIN s2 ON s.query_id = s2.query_id AND s.cand_id <> s2.sel
      |    JOIN pc p1 ON p1.query_id = s.query_id AND p1.ai = s.cand_id
      |      AND p1.bi = s1.sel
      |    JOIN pc p2 ON p2.query_id = s.query_id AND p2.ai = s.cand_id
      |      AND p2.bi = s2.sel) WHERE r = 1),
      |s4 AS (SELECT query_id, cand_id AS sel FROM (
      |    SELECT s.query_id, s.cand_id, ROW_NUMBER() OVER (PARTITION BY s.query_id
      |      ORDER BY 0.5*s.rel - 0.5*GREATEST(p1.sim, p2.sim, p3.sim) DESC,
      |        s.cand_id) AS r
      |    FROM sl s
      |    JOIN s1 ON s.query_id = s1.query_id AND s.cand_id <> s1.sel
      |    JOIN s2 ON s.query_id = s2.query_id AND s.cand_id <> s2.sel
      |    JOIN s3 ON s.query_id = s3.query_id AND s.cand_id <> s3.sel
      |    JOIN pc p1 ON p1.query_id = s.query_id AND p1.ai = s.cand_id
      |      AND p1.bi = s1.sel
      |    JOIN pc p2 ON p2.query_id = s.query_id AND p2.ai = s.cand_id
      |      AND p2.bi = s2.sel
      |    JOIN pc p3 ON p3.query_id = s.query_id AND p3.ai = s.cand_id
      |      AND p3.bi = s3.sel) WHERE r = 1)""".stripMargin

  /** This family's slice of the oracle-SQL map (split from the
    * single oracleSqlBase literal; composed back in
    * [[AnalyticsQueries.oracleSqlBase]]). */
  private[queries] lazy val retrievalOracles: Map[String, String] = Map(
    // the same exact-cosine top-3 (ties → lower neighbor id), votes
    // grouped, winner by (count DESC, label ASC) — the heap tie rules
    // mirrored as window orders
    "a24_knn_classify" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq, label
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding, nsq, label AS true_label
         |  FROM e WHERE vec_id % 2 = 1 AND vec_id < 100),
         |c AS (SELECT vec_id AS neighbor_id, embedding, nsq, label FROM e
         |  WHERE vec_id % 2 = 0),
         |p AS (SELECT q.query_id, q.true_label, c.neighbor_id, c.label,
         |    ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} AS sim
         |  FROM c CROSS JOIN q),
         |r AS (SELECT query_id, true_label, label,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM p),
         |v AS (SELECT query_id, true_label, label, COUNT(*) AS cnt
         |  FROM r WHERE rank <= 3 GROUP BY 1, 2, 3),
         |w AS (SELECT query_id, true_label, label AS pred_label,
         |    CAST(cnt AS BIGINT) AS n_votes,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cnt DESC, label ASC) AS vr
         |  FROM v)
         |SELECT query_id, CAST(pred_label AS INT) AS pred_label, true_label,
         |  n_votes, pred_label = true_label AS correct
         |FROM w WHERE vr = 1 ORDER BY query_id""".stripMargin,
    // the greedy MMR loop unrolled for exactly MmrSelect=4 steps: s1 is
    // the relevance top-1 (step-1 penalty is 0.0 so 0.5·rel alone
    // orders), each later step joins the already-selected rows and
    // penalizes by GREATEST over their pairwise cosines — the same
    // 0.5·rel − 0.5·max algebra, operand for operand, as the Spark-side
    // per-query greedy, so every double comparison matches bitwise
    "a25_mmr_rerank" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq FROM embeddings),
         |sl AS (SELECT query_id, cand_id, rel FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} AS rel,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} DESC,
         |        c.vec_id) AS rn
         |    FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id <> c.vec_id)
         |  WHERE rn <= 12),
         |pc AS (SELECT a.query_id, a.cand_id AS ai, b.cand_id AS bi,
         |    ${cosine(dot("ea.embedding", "eb.embedding"), "ea.nsq", "eb.nsq")} AS sim
         |  FROM sl a JOIN sl b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
         |  JOIN e ea ON ea.vec_id = a.cand_id JOIN e eb ON eb.vec_id = b.cand_id),
         |$mmrUnrollSql""".stripMargin,
    "a26_mmr_prebuilt" ->
      s"""${ivfPqRankedCtes(PqM, PqSubDim, PqK, IvfPqProbes, PqL)},
         |sl AS (SELECT r.query_id, r.neighbor_id AS cand_id, rr.sim AS rel
         |  FROM r JOIN rr ON r.query_id = rr.query_id
         |    AND r.neighbor_id = rr.neighbor_id
         |  WHERE r.rank <= 12),
         |pc AS (SELECT a.query_id, a.cand_id AS ai, b.cand_id AS bi,
         |    ${cosine(dot("ea.embedding", "eb.embedding"), "ea.nsq", "eb.nsq")} AS sim
         |  FROM sl a JOIN sl b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
         |  JOIN ev ea ON ea.vec_id = a.cand_id JOIN ev eb ON eb.vec_id = b.cand_id),
         |$mmrUnrollSql""".stripMargin,
    "a17_hybrid_search" ->
      s"""WITH t AS (SELECT doc_id, unnest(${words("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |idx AS (SELECT tf.doc_id, tf.term,
         |    tf.tf * CAST(floor(10000.0 * n.n / dft.df) AS BIGINT) AS impact
         |  FROM tf JOIN dft USING (term) CROSS JOIN n),
         |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 10),
         |kw AS (SELECT qt.query_id, idx.doc_id, SUM(idx.impact) AS kw_score
         |  FROM idx JOIN qt USING (term) WHERE idx.doc_id <> qt.query_id
         |  GROUP BY 1, 2),
         |kwt AS (SELECT query_id, doc_id, kw_rank FROM (
         |  SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY kw_score DESC, doc_id) AS INT) AS kw_rank
         |  FROM kw) WHERE kw_rank <= 20),
         |e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq
         |  FROM embeddings WHERE vec_id < (SELECT n FROM n)),
         |vp AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |    ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} AS sim
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |vt AS (SELECT query_id, doc_id, vec_rank FROM (
         |  SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY sim DESC, doc_id) AS INT) AS vec_rank
         |  FROM vp) WHERE vec_rank <= 20),
         |f AS (SELECT COALESCE(kwt.query_id, vt.query_id) AS query_id,
         |    COALESCE(kwt.doc_id, vt.doc_id) AS doc_id, kwt.kw_rank, vt.vec_rank,
         |    COALESCE(1000000 // (60 + kwt.kw_rank), 0) +
         |      COALESCE(1000000 // (60 + vt.vec_rank), 0) AS rrf_score
         |  FROM kwt FULL OUTER JOIN vt
         |    ON kwt.query_id = vt.query_id AND kwt.doc_id = vt.doc_id),
         |r AS (SELECT query_id, doc_id, kw_rank, vec_rank,
         |    CAST(rrf_score AS BIGINT) AS rrf_score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
         |  FROM f)
         |SELECT query_id, rank, doc_id, kw_rank, vec_rank, rrf_score FROM r
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // the whole index math (tf/df/impact), the per-query top-8-rarest
    // term pruning (df asc, term asc — a19's score=-df / id=term_id
    // heap order, term_id being the dense lexicographic rank), and the
    // top-20 scoring recomputed inline: the oracle proves the stored
    // index + pruned probe ≡ the inline definition
    "a19_keyword_search_prebuilt" ->
      s"""WITH t AS (SELECT doc_id, unnest(${words("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |idf AS (SELECT term, df,
         |    CAST(floor(10000.0 * n.n / df) AS BIGINT) AS idf
         |  FROM dft CROSS JOIN n),
         |idx AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS impact
         |  FROM tf JOIN idf USING (term)),
         |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 10),
         |qk AS (SELECT query_id, term FROM (
         |  SELECT qt.query_id, qt.term, ROW_NUMBER() OVER (
         |      PARTITION BY qt.query_id ORDER BY idf.df ASC, qt.term ASC) AS trk
         |  FROM qt JOIN idf USING (term)) WHERE trk <= $KwKeepTerms),
         |kw AS (SELECT qk.query_id, idx.doc_id,
         |    CAST(SUM(idx.impact) AS BIGINT) AS kw_score
         |  FROM idx JOIN qk USING (term) WHERE idx.doc_id <> qk.query_id
         |  GROUP BY 1, 2)
         |SELECT query_id, kw_rank, doc_id, kw_score FROM (
         |  SELECT query_id, doc_id, kw_score, CAST(ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY kw_score DESC, doc_id) AS INT) AS kw_rank
         |  FROM kw) WHERE kw_rank <= 20
         |ORDER BY query_id, kw_rank""".stripMargin,
    // a19's chain with store-level deletes applied where the STORE
    // applies them: df/idf computed over the FULL corpus (tombstoned
    // docs still inflate the stats — Lucene live-docs semantics, until
    // the next compaction re-stats), the doc filter only at the
    // scoring join; queries are external text, so doc 3 still asks
    "a36_keyword_tombstones" ->
      s"""WITH t AS (SELECT doc_id, unnest(${words("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |idf AS (SELECT term, df,
         |    CAST(floor(10000.0 * n.n / df) AS BIGINT) AS idf
         |  FROM dft CROSS JOIN n),
         |idx AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS impact
         |  FROM tf JOIN idf USING (term)),
         |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 10),
         |qk AS (SELECT query_id, term FROM (
         |  SELECT qt.query_id, qt.term, ROW_NUMBER() OVER (
         |      PARTITION BY qt.query_id ORDER BY idf.df ASC, qt.term ASC) AS trk
         |  FROM qt JOIN idf USING (term)) WHERE trk <= $KwKeepTerms),
         |kw AS (SELECT qk.query_id, idx.doc_id,
         |    CAST(SUM(idx.impact) AS BIGINT) AS kw_score
         |  FROM idx JOIN qk USING (term)
         |  WHERE idx.doc_id <> qk.query_id AND idx.doc_id % 7 <> 3
         |  GROUP BY 1, 2)
         |SELECT query_id, kw_rank, doc_id, kw_score FROM (
         |  SELECT query_id, doc_id, kw_score, CAST(ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY kw_score DESC, doc_id) AS INT) AS kw_rank
         |  FROM kw) WHERE kw_rank <= 20
         |ORDER BY query_id, kw_rank""".stripMargin,
    // the segment model recomputed inline: frozen corpus-half df/idf
    // for known terms, segment-local stats for increment-only terms,
    // pruning tie order (df, oov, term) mirroring a20's term_id
    // assignment (frozen dictionary first, then OOV, each by term)
    "a20_keyword_index_update" ->
      s"""WITH t AS (SELECT doc_id, unnest(${words("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |n AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 2 = 0),
         |cdf AS (SELECT term, COUNT(*) AS df FROM tf WHERE doc_id % 2 = 0 GROUP BY 1),
         |cd AS (SELECT term, df,
         |    CAST(floor(10000.0 * n.n / df) AS BIGINT) AS idf, FALSE AS oov
         |  FROM cdf CROSS JOIN n),
         |odf AS (SELECT term, COUNT(*) AS df FROM tf
         |  WHERE doc_id % 2 = 1 AND term NOT IN (SELECT term FROM cdf) GROUP BY 1),
         |od AS (SELECT term, df,
         |    CAST(floor(10000.0 * n.n / df) AS BIGINT) AS idf, TRUE AS oov
         |  FROM odf CROSS JOIN n),
         |d AS (SELECT * FROM cd UNION ALL SELECT * FROM od),
         |idx AS (SELECT tf.doc_id, tf.term, tf.tf * d.idf AS impact
         |  FROM tf JOIN d USING (term)),
         |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 10),
         |qk AS (SELECT query_id, term FROM (
         |  SELECT qt.query_id, qt.term, ROW_NUMBER() OVER (
         |      PARTITION BY qt.query_id ORDER BY d.df ASC, d.oov ASC, qt.term ASC) AS trk
         |  FROM qt JOIN d USING (term)) WHERE trk <= $KwKeepTerms),
         |kw AS (SELECT qk.query_id, idx.doc_id,
         |    CAST(SUM(idx.impact) AS BIGINT) AS kw_score
         |  FROM idx JOIN qk USING (term) WHERE idx.doc_id <> qk.query_id
         |  GROUP BY 1, 2)
         |SELECT query_id, kw_rank, doc_id, kw_score FROM (
         |  SELECT query_id, doc_id, kw_score, CAST(ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY kw_score DESC, doc_id) AS INT) AS kw_rank
         |  FROM kw) WHERE kw_rank <= 20
         |ORDER BY query_id, kw_rank""".stripMargin,
    // both serving channels recomputed inline from their definitions —
    // the a19 pruned keyword chain and the a13 IVF-PQ chain (the same
    // parameterized CTEs those oracles use) — then the identical
    // integer RRF fusion: the oracle proves fusion-over-stored-indexes
    // ≡ fusion-over-the-definitions
    "a21_hybrid_search_prebuilt" ->
      s"""${ivfPqRankedCtes(PqM, PqSubDim, PqK, IvfPqProbes, PqL)},
         |t AS (SELECT doc_id, unnest(${words("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |idf AS (SELECT term, df,
         |    CAST(floor(10000.0 * n.n / df) AS BIGINT) AS idf
         |  FROM dft CROSS JOIN n),
         |idx AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS impact
         |  FROM tf JOIN idf USING (term)),
         |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 10),
         |qk AS (SELECT query_id, term FROM (
         |  SELECT qt.query_id, qt.term, ROW_NUMBER() OVER (
         |      PARTITION BY qt.query_id ORDER BY idf.df ASC, qt.term ASC) AS trk
         |  FROM qt JOIN idf USING (term)) WHERE trk <= $KwKeepTerms),
         |kw AS (SELECT qk.query_id, idx.doc_id,
         |    CAST(SUM(idx.impact) AS BIGINT) AS kw_score
         |  FROM idx JOIN qk USING (term) WHERE idx.doc_id <> qk.query_id
         |  GROUP BY 1, 2),
         |kwt AS (SELECT query_id, doc_id, kw_rank FROM (
         |  SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY kw_score DESC, doc_id) AS INT) AS kw_rank
         |  FROM kw) WHERE kw_rank <= 20),
         |vt AS (SELECT query_id, neighbor_id AS doc_id, CAST(rank AS INT) AS vec_rank
         |  FROM r WHERE rank <= 5 AND query_id < 10),
         |f AS (SELECT COALESCE(kwt.query_id, vt.query_id) AS query_id,
         |    COALESCE(kwt.doc_id, vt.doc_id) AS doc_id, kwt.kw_rank, vt.vec_rank,
         |    COALESCE(1000000 // (60 + kwt.kw_rank), 0) +
         |      COALESCE(1000000 // (60 + vt.vec_rank), 0) AS rrf_score
         |  FROM kwt FULL OUTER JOIN vt
         |    ON kwt.query_id = vt.query_id AND kwt.doc_id = vt.doc_id),
         |z AS (SELECT query_id, doc_id, kw_rank, vec_rank,
         |    CAST(rrf_score AS BIGINT) AS rrf_score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
         |  FROM f)
         |SELECT query_id, rank, doc_id, kw_rank, vec_rank, rrf_score FROM z
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // t18's chunk windows re-tokenized per passage; impact uses the
    // PASSAGE-level df and passage count; heap tiebreak = lower pid
    "a22_passage_search" ->
      s"""WITH w AS (SELECT doc_id, ${words("text")} AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |    unnest(range(0, (len(toks) + 23) // 24)) AS chunk_idx FROM w),
         |p AS (SELECT doc_id * 1024 + chunk_idx AS pid, doc_id,
         |    unnest(toks[CAST(1 + chunk_idx * 24 AS BIGINT):CAST(chunk_idx * 24 + 32 AS BIGINT)]) AS term
         |  FROM c),
         |tfp AS (SELECT pid, doc_id, term, COUNT(*) AS tf FROM p GROUP BY 1, 2, 3),
         |np AS (SELECT COUNT(*) AS n FROM (SELECT DISTINCT pid FROM tfp)),
         |dfp AS (SELECT term, COUNT(*) AS df FROM tfp GROUP BY 1),
         |qe AS (SELECT doc_id AS query_id, unnest(${words("text")}) AS term
         |  FROM documents WHERE doc_id < 10),
         |qt AS (SELECT DISTINCT query_id, term FROM qe),
         |sc AS (SELECT qt.query_id, tfp.pid,
         |    CAST(SUM(tfp.tf * CAST(floor(10000.0 * np.n / dfp.df) AS BIGINT)) AS BIGINT)
         |      AS p_score
         |  FROM tfp JOIN dfp USING (term) JOIN qt USING (term) CROSS JOIN np
         |  WHERE tfp.doc_id <> qt.query_id
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, pid, p_score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY p_score DESC, pid ASC) AS INT) AS rank
         |  FROM sc)
         |SELECT query_id, rank, pid // 1024 AS doc_id, pid % 1024 AS chunk_idx,
         |  p_score
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // a22's passage statistics recomputed inline PLUS a19's pruning
    // protocol under passage-level df (trk ties → term ASC, mirroring
    // the heap's term_id order — term_id is the lexicographic rank):
    // the oracle proves the stored chunk index + pruned probe ≡ the
    // inline passage definition
    "a23_passage_search_prebuilt" ->
      s"""WITH w AS (SELECT doc_id, ${words("text")} AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |    unnest(range(0, (len(toks) + 23) // 24)) AS chunk_idx FROM w),
         |p AS (SELECT doc_id * 1024 + chunk_idx AS pid, doc_id,
         |    unnest(toks[CAST(1 + chunk_idx * 24 AS BIGINT):CAST(chunk_idx * 24 + 32 AS BIGINT)]) AS term
         |  FROM c),
         |tfp AS (SELECT pid, doc_id, term, COUNT(*) AS tf FROM p GROUP BY 1, 2, 3),
         |np AS (SELECT COUNT(*) AS n FROM (SELECT DISTINCT pid FROM tfp)),
         |dfp AS (SELECT term, COUNT(*) AS df FROM tfp GROUP BY 1),
         |qe AS (SELECT doc_id AS query_id, unnest(${words("text")}) AS term
         |  FROM documents WHERE doc_id < 10),
         |qt AS (SELECT DISTINCT query_id, term FROM qe),
         |qk AS (SELECT query_id, term FROM (
         |  SELECT qt.query_id, qt.term, ROW_NUMBER() OVER (
         |      PARTITION BY qt.query_id ORDER BY dfp.df ASC, qt.term ASC) AS trk
         |  FROM qt JOIN dfp USING (term)) WHERE trk <= $KwKeepTerms),
         |sc AS (SELECT qk.query_id, tfp.pid,
         |    CAST(SUM(tfp.tf * CAST(floor(10000.0 * np.n / dfp.df) AS BIGINT)) AS BIGINT)
         |      AS p_score
         |  FROM tfp JOIN dfp USING (term) JOIN qk USING (term) CROSS JOIN np
         |  WHERE tfp.doc_id <> qk.query_id
         |  GROUP BY 1, 2),
         |r AS (SELECT query_id, pid, p_score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY p_score DESC, pid ASC) AS INT) AS rank
         |  FROM sc)
         |SELECT query_id, rank, pid // 1024 AS doc_id, pid % 1024 AS chunk_idx,
         |  p_score
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
  )

}
