package graft.queries

/** DuckDB-SQL oracle builders for the vector-ANN family — one slice of
  * [[AnalyticsQueries]], split out of VectorAnnFamily when it crossed
  * 1,500 lines (r12 verdict growth watch): the natural boundary is
  * engine code vs the ORACLE side (pure SQL-string builders — the
  * k-means/PQ/IVF-PQ CTE chains every vector oracle composes, plus the
  * vectorOracles map itself). No behavior change: same members, same
  * `private[queries]` visibility, mixed back into the facade; the CTE
  * builders stay callable from the retrieval/late-interaction oracles
  * (a21/a26/a31) through the shared self-type.
  * CONVENTION: task closures must NOT reference trait-level vals/defs
  * (facade capture — tools/closurelint.py); trait-level `object`s are
  * banned; JVM-shared state goes at file top level. (No task closures
  * exist here — everything is driver-side string building.) */
private[queries] trait VectorOracleSql { this: AnalyticsQueries.type =>

  import Sql._

  /** The a08 two-iteration quantized k-means as a reusable CTE chain —
    * ends in `asg(vec_id, cluster, dist)`. Shared by the a08 oracle and
    * every downstream oracle that consumes the clustering (d12, a10's
    * coarse cells). `kp.k` is the corpus-scaled cluster count — the
    * DuckDB twin of [[scaledK]], so the scaling law itself hash-gates. */
  private[queries] lazy val kmeansCtes =
    s"""kp AS (SELECT GREATEST(8, LEAST(64,
       |    CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS k
       |  FROM embeddings),
       |m0 AS (SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, _qx -> abs(CAST(_qx AS DOUBLE)))) AS maxabs
       |  FROM embeddings),
       |qv AS (SELECT vec_id,
       |    CASE WHEN maxabs > 0 THEN list_transform(embedding,
       |      _qy -> CAST(floor(CAST(_qy AS DOUBLE) * (127.0 / maxabs) + 0.5) AS BIGINT))
       |    ELSE list_transform(embedding, _qz -> CAST(0 AS BIGINT)) END AS q
       |  FROM m0),
       |c0 AS (SELECT vec_id AS cid, list_transform(q, _c0 -> _c0 * 10000) AS m
       |  FROM qv WHERE vec_id < (SELECT k FROM kp)),
       |d1 AS (SELECT qv.vec_id, c0.cid, ${intDist("qv.q", "c0.m")} AS dist
       |  FROM qv CROSS JOIN c0),
       |a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d1)
       |  WHERE rk = 1),
       |dims AS (SELECT a1.cid, u.dim AS dim, u.v AS v FROM a1 JOIN qv USING (vec_id),
       |  unnest(list_transform(range(1, len(q)+1), _di -> {'dim': _di, 'v': q[_di]})) AS t(u)),
       |bydim AS (SELECT cid, dim,
       |    CAST(floor(10000.0 * CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m4
       |  FROM dims GROUP BY 1, 2),
       |c1 AS (SELECT cid, list(m4 ORDER BY dim) AS m FROM bydim GROUP BY cid),
       |d2 AS (SELECT qv.vec_id, c1.cid, ${intDist("qv.q", "c1.m")} AS dist
       |  FROM qv CROSS JOIN c1),
       |asg AS (SELECT vec_id, cid AS cluster, dist FROM (SELECT vec_id, cid, dist,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d2)
       |  WHERE rk = 1)""".stripMargin

  /** One PQ subspace (index `m`) of the a09 oracle as a CTE chain:
    * slice → per-subvector int8 quantize → K-seed init → one integer
    * Lloyd step → final assignment, ending in `aa$m(vec_id, cid)` and
    * codebook `cc$m(cid, mm)`. Lockstep with a09PqAnn's per-subspace
    * algebra (same floor rounding, same (dist, cid) argmin ties). */
  private[queries] def pqSubspaceCtes(m: Int, subDim: Int, k: Int,
      trainWhere: String = "TRUE", initCut: Int = -1): String = {
    val lo = m * subDim + 1; val hi = (m + 1) * subDim
    val cut = if (initCut > 0) initCut else k
    s"""sl$m AS (SELECT vec_id, list_slice(embedding, $lo, $hi) AS e,
       |    list_max(list_transform(list_slice(embedding, $lo, $hi),
       |      _qx -> abs(CAST(_qx AS DOUBLE)))) AS maxabs
       |  FROM embeddings),
       |qq$m AS (SELECT vec_id,
       |    CASE WHEN maxabs > 0 THEN list_transform(e,
       |      _qy -> CAST(floor(CAST(_qy AS DOUBLE) * (127.0 / maxabs) + 0.5) AS BIGINT))
       |    ELSE list_transform(e, _qz -> CAST(0 AS BIGINT)) END AS q
       |  FROM sl$m),
       |tq$m AS (SELECT * FROM qq$m WHERE $trainWhere),
       |c0$m AS (SELECT vec_id AS cid, list_transform(q, _c0 -> _c0 * 10000) AS mm
       |  FROM tq$m WHERE vec_id < $cut),
       |d1$m AS (SELECT tq$m.vec_id, c0$m.cid, ${intDist(s"tq$m.q", s"c0$m.mm")} AS dist
       |  FROM tq$m CROSS JOIN c0$m),
       |a1$m AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d1$m)
       |  WHERE rk = 1),
       |dims$m AS (SELECT a1$m.cid, u.dim AS dim, u.v AS v
       |  FROM a1$m JOIN tq$m USING (vec_id),
       |  unnest(list_transform(range(1, len(q)+1), _di -> {'dim': _di, 'v': q[_di]})) AS t(u)),
       |bydim$m AS (SELECT cid, dim,
       |    CAST(floor(10000.0 * CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m4
       |  FROM dims$m GROUP BY 1, 2),
       |cc$m AS (SELECT cid, list(m4 ORDER BY dim) AS mm FROM bydim$m GROUP BY cid),
       |d2$m AS (SELECT qq$m.vec_id, cc$m.cid, ${intDist(s"qq$m.q", s"cc$m.mm")} AS dist
       |  FROM qq$m CROSS JOIN cc$m),
       |aa$m AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d2$m)
       |  WHERE rk = 1)""".stripMargin
  }

  /** Whole a09 oracle, generated from the same (M, subDim, K, L)
    * geometry the Spark program uses. ADC scoring is folded to
    * per-pair algebra — dist(queryₘ, centroid of corpus codeₘ) summed
    * over subspaces — identical totals to the Spark LUT form, since
    * the LUT holds exactly that distance per (query, cid) pair; the
    * exact-cosine re-rank over the top-L shortlist reuses the a01
    * fold-order-exact cosine. */
  private[queries] def pqOracle(mCount: Int, subDim: Int, k: Int, l: Int,
      trainWhere: String = "TRUE", initCut: Int = -1,
      corpusWhere: String = "TRUE"): String = {
    val ms = 0 until mCount
    val ctes = ms.map(m => pqSubspaceCtes(m, subDim, k, trainWhere, initCut)).mkString(",\n")
    val corpusJoins = ms.tail.map(m =>
      s"JOIN aa$m ON aa0.vec_id = aa$m.vec_id JOIN cc$m ON aa$m.cid = cc$m.cid")
      .mkString("\n  ")
    val qsJoins = ms.tail.map(m => s"JOIN qq$m ON qq0.vec_id = qq$m.vec_id")
      .mkString("\n  ")
    // a16's tombstones: corpus rows excluded from candidacy (the
    // oracle analog of the broadcast anti-join on the delete set)
    val corpusFilter = if (corpusWhere == "TRUE") "" else s"\n  WHERE $corpusWhere"
    s"""WITH $ctes,
       |corpus AS (SELECT aa0.vec_id, ${ms.map(m => s"cc$m.mm AS mm$m").mkString(", ")}
       |  FROM aa0 JOIN cc0 ON aa0.cid = cc0.cid
       |  $corpusJoins$corpusFilter),
       |qs AS (SELECT qq0.vec_id AS query_id, ${ms.map(m => s"qq$m.q AS query$m").mkString(", ")}
       |  FROM qq0 $qsJoins WHERE qq0.vec_id < 20),
       |p AS (SELECT qs.query_id, corpus.vec_id AS neighbor_id,
       |    ${ms.map(m => intDist(s"qs.query$m", s"corpus.mm$m")).mkString(" + ")} AS d
       |  FROM corpus CROSS JOIN qs WHERE qs.query_id <> corpus.vec_id),
       |short AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rk
       |  FROM p) WHERE rk <= GREATEST($l, (SELECT COUNT(*) FROM embeddings) // 20)),
       |ev AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq FROM embeddings),
       |rr AS (SELECT s.query_id, s.neighbor_id,
       |    ${cosine(dot("qv.embedding", "cv.embedding"), "qv.nsq", "cv.nsq")} AS sim
       |  FROM short s JOIN ev qv ON s.query_id = qv.vec_id
       |  JOIN ev cv ON s.neighbor_id = cv.vec_id),
       |r AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM rr)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Whole a10 oracle: the a08 coarse-clustering CTE chain supplies
    * the cells (`asg`) and the query-to-centroid distances (`d2` →
    * probes), the a09 subspace chains supply codes and codebooks, and
    * candidate scoring is restricted to (corpus row, query) pairs
    * whose cell the query probes. Same ADC fold + re-rank as a09. */
  /** The IVF-PQ oracle pipeline up to and including the ranked CTE
    * `r` (query_id, neighbor_id, rank) — shared by the search oracles
    * and a18's recall harness, which joins `r` against an exact
    * brute-force ranking instead of selecting it directly. */
  private[queries] def ivfPqRankedCtes(mCount: Int, subDim: Int, k: Int, p: Int, l: Int,
      corpusWhere: String = "TRUE"): String = {
    val ms = 0 until mCount
    val ctes = ms.map(m => pqSubspaceCtes(m, subDim, k)).mkString(",\n")
    val corpusJoins = ms.tail.map(m =>
      s"JOIN aa$m ON aa0.vec_id = aa$m.vec_id JOIN cc$m ON aa$m.cid = cc$m.cid")
      .mkString("\n  ")
    val qsJoins = ms.tail.map(m => s"JOIN qq$m ON qq0.vec_id = qq$m.vec_id")
      .mkString("\n  ")
    // a14's metadata filter: constrain corpus rows by their attribute
    // (the oracle's analog of the pushed parquet filter on codes_cells)
    val corpusFilter =
      if (corpusWhere == "TRUE") ""
      else s"\n  JOIN embeddings _fl ON aa0.vec_id = _fl.vec_id WHERE $corpusWhere"
    s"""WITH $kmeansCtes,
       |$ctes,
       |probes AS (SELECT vec_id AS query_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
       |    FROM d2 WHERE vec_id < 20)
       |  WHERE rk <= (SELECT GREATEST($p,
       |    CAST(ceil(CAST(k AS DOUBLE) / 8.0) AS BIGINT)) FROM kp)),
       |corpus AS (SELECT aa0.vec_id, asg.cluster AS cell,
       |    ${ms.map(m => s"cc$m.mm AS mm$m").mkString(", ")}
       |  FROM aa0 JOIN cc0 ON aa0.cid = cc0.cid
       |  $corpusJoins
       |  JOIN asg ON aa0.vec_id = asg.vec_id$corpusFilter),
       |qs AS (SELECT qq0.vec_id AS query_id, ${ms.map(m => s"qq$m.q AS query$m").mkString(", ")}
       |  FROM qq0 $qsJoins WHERE qq0.vec_id < 20),
       |pp AS (SELECT qs.query_id, corpus.vec_id AS neighbor_id,
       |    ${ms.map(m => intDist(s"qs.query$m", s"corpus.mm$m")).mkString(" + ")} AS d
       |  FROM corpus JOIN probes ON corpus.cell = probes.cell
       |  JOIN qs ON qs.query_id = probes.query_id
       |  WHERE qs.query_id <> corpus.vec_id),
       |short AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, neighbor_id) AS rk
       |  FROM pp) WHERE rk <= GREATEST($l, (SELECT COUNT(*) FROM embeddings) // 20)),
       |ev AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq FROM embeddings),
       |rr AS (SELECT s.query_id, s.neighbor_id,
       |    ${cosine(dot("qv2.embedding", "cv.embedding"), "qv2.nsq", "cv.nsq")} AS sim
       |  FROM short s JOIN ev qv2 ON s.query_id = qv2.vec_id
       |  JOIN ev cv ON s.neighbor_id = cv.vec_id),
       |r AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM rr)""".stripMargin
  }

  private[queries] def ivfPqOracle(mCount: Int, subDim: Int, k: Int, p: Int, l: Int,
      corpusWhere: String = "TRUE"): String =
    s"""${ivfPqRankedCtes(mCount, subDim, k, p, l, corpusWhere)}
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** This family's slice of the oracle-SQL map (split from the
    * single oracleSqlBase literal; composed back in
    * [[AnalyticsQueries.oracleSqlBase]]). */
  private[queries] lazy val vectorOracles: Map[String, String] = Map(
    "a01_bruteforce_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq FROM embeddings),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} AS sim
         |  FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM p)
         |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,
    // threshold on a raw float is exact: both engines produce
    // bit-identical sims via the same strict ascending IEEE fold
    "a07_semantic_decontam" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq FROM embeddings),
         |p AS (SELECT c.vec_id AS corpus_id, q.vec_id AS eval_id,
         |    ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} AS sim
         |  FROM e c JOIN e q ON q.vec_id < 20 AND c.vec_id >= 20)
         |SELECT corpus_id, eval_id FROM p WHERE sim >= 0.30
         |ORDER BY corpus_id, eval_id""".stripMargin,
    "a02_lsh_ann" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 8), j ->
         |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |        list_transform(range(1, len(embedding)+1), i ->
         |          CAST(embedding[i] AS DOUBLE) *
         |          (CASE WHEN (xor((i-1)*73856093, j*19349663) >> 6) & 1 = 0
         |                THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END))),
         |        (x,y) -> x+y) >= 0
         |    THEN CAST(power(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
         |    (x,y) -> x+y) AS bucket
         |  FROM embeddings),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} AS sim
         |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM p)
         |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,
    "a03_ivf_ann" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSq("embedding")} AS nsq FROM embeddings),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb, nsq AS cnsq
         |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM e)
         |  WHERE rn <= LEAST(CAST(CEIL(SQRT((SELECT COUNT(*) FROM e))) AS BIGINT), 64)),
         |pairs AS (SELECT e.vec_id, cent.cid, e.embedding, e.nsq,
         |    ${cosine(dot("e.embedding", "cent.cemb"), "e.nsq", "cent.cnsq")} AS csim
         |  FROM e CROSS JOIN cent),
         |cells AS (SELECT vec_id AS neighbor_id, cid, embedding, nsq
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
         |        FROM pairs)
         |  WHERE crk = 1),
         |probes AS (SELECT vec_id AS query_id, cid, embedding AS qe, nsq AS qn
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
         |        FROM pairs WHERE vec_id < 20)
         |  WHERE crk <= $IvfProbes),
         |p AS (SELECT q.query_id, c.neighbor_id,
         |    ${cosine(dot("q.qe", "c.embedding"), "q.qn", "c.nsq")} AS sim
         |  FROM probes q JOIN cells c ON q.cid = c.cid AND q.query_id <> c.neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM p)
         |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,
    "a05_quantized_ann" ->
      s"""WITH m AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, _qx -> abs(CAST(_qx AS DOUBLE)))) AS maxabs
         |  FROM embeddings),
         |qv AS (SELECT vec_id,
         |    CASE WHEN maxabs > 0 THEN list_transform(embedding,
         |      _qy -> CAST(floor(CAST(_qy AS DOUBLE) * (127.0 / maxabs) + 0.5) AS BIGINT))
         |    ELSE list_transform(embedding, _qz -> CAST(0 AS BIGINT)) END AS q
         |  FROM m),
         |qn AS (SELECT vec_id, q, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(q, _qw -> _qw * _qw)), (_qa, _qb) -> _qa + _qb) AS qn FROM qv),
         |e AS (SELECT * FROM qn WHERE qn > 0),
         |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, len(a.q)+1), _qi -> a.q[_qi] * b.q[_qi])),
         |      (_qa, _qb) -> _qa + _qb) AS DOUBLE)
         |      / (sqrt(CAST(a.qn AS DOUBLE)) * sqrt(CAST(b.qn AS DOUBLE))) AS qsim
         |  FROM e a JOIN e b ON a.vec_id < 20 AND a.vec_id <> b.vec_id),
         |r AS (SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qsim DESC, neighbor_id) AS rank
         |  FROM p)
         |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,
    "a06_quantized_centroids" ->
      s"""WITH m0 AS (SELECT vec_id, label, embedding,
         |    list_max(list_transform(embedding, _qx -> abs(CAST(_qx AS DOUBLE)))) AS maxabs
         |  FROM embeddings),
         |qv AS (SELECT vec_id, label,
         |    CASE WHEN maxabs > 0 THEN list_transform(embedding,
         |      _qy -> CAST(floor(CAST(_qy AS DOUBLE) * (127.0 / maxabs) + 0.5) AS BIGINT))
         |    ELSE list_transform(embedding, _qz -> CAST(0 AS BIGINT)) END AS q
         |  FROM m0),
         |dims AS (SELECT label, u.dim AS dim, u.v AS v FROM qv,
         |  unnest(list_transform(range(1, len(q)+1), _di -> {'dim': _di, 'v': q[_di]})) AS t(u)),
         |bydim AS (SELECT label, dim,
         |    CAST(floor(10000.0 * CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m4
         |  FROM dims GROUP BY 1, 2),
         |cent AS (SELECT label, list(m4 ORDER BY dim) AS m FROM bydim GROUP BY label),
         |dists AS (SELECT qv.vec_id, qv.label,
         |    100000000 * list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(qv.q, _qa -> _qa * _qa)), (_x, _y) -> _x + _y)
         |    + list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(cent.m, _qb -> _qb * _qb)), (_x, _y) -> _x + _y)
         |    - 20000 * list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, len(qv.q)+1), _qi -> qv.q[_qi] * cent.m[_qi])),
         |      (_x, _y) -> _x + _y) AS dist
         |  FROM qv JOIN cent USING (label)),
         |r AS (SELECT label, vec_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY label) AS n_vecs
         |  FROM dists)
         |SELECT label, n_vecs, vec_id AS outlier_id, dist FROM r
         |WHERE rk = 1 ORDER BY label""".stripMargin,
    "a04_topk_agg" ->
      s"""WITH s AS (SELECT lang, doc_id, len(${words("text")}) AS score FROM documents),
         |r AS (SELECT lang, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rank
         |  FROM s)
         |SELECT lang, rank, doc_id, score FROM r WHERE rank <= 5
         |ORDER BY lang, rank""".stripMargin,
    "a08_kmeans_quantized" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, cluster, dist FROM asg ORDER BY vec_id""".stripMargin,
    "a09_pq_ann" -> pqOracle(PqM, PqSubDim, PqK, PqL),
    // a11 searches the persisted index built by the same deterministic
    // integer algebra a09 runs inline, so its answer — and oracle — is
    // exactly a09's; what differs is what execution touches (stored
    // codes/codebooks, not a rebuild).
    "a11_pq_search_prebuilt" -> pqOracle(PqM, PqSubDim, PqK, PqL),
    // a12: same search algebra, but the codebook-training CTEs are
    // restricted to the corpus half (even vec_ids; init = even ids
    // below 2K = the K lowest corpus ids) — the increment is encoded
    // by frozen corpus codebooks, and the hash pins exactly that.
    "a12_pq_index_update" -> pqOracle(PqM, PqSubDim, PqK, PqL,
      trainWhere = "vec_id % 2 = 0", initCut = 2 * PqK),
    // a15: same codes, same algebra as a12 — the hash pins compaction
    // as a pure layout change (search over the MERGED table only)
    "a15_compacted_search" -> pqOracle(PqM, PqSubDim, PqK, PqL,
      trainWhere = "vec_id % 2 = 0", initCut = 2 * PqK),
    // a16: a15's index with tombstoned rows (vec_id ≡ 3 mod 7) barred
    // from candidacy — the hash pins that deletes are search-invisible
    // EXACTLY (not merely down-weighted), while codes stay in place
    "a16_tombstone_search" -> pqOracle(PqM, PqSubDim, PqK, PqL,
      trainWhere = "vec_id % 2 = 0", initCut = 2 * PqK,
      corpusWhere = "aa0.vec_id % 7 <> 3"),
    "a10_ivfpq_ann" -> ivfPqOracle(PqM, PqSubDim, PqK, IvfPqProbes, PqL),
    // a13 searches the persisted IVF-PQ artifacts built by the same
    // deterministic integer algebra a10 derives inline, so its answer —
    // and oracle — is a10's: the hash gate proves stored-index search ≡
    // inline build+search
    "a13_ivfpq_search_prebuilt" -> ivfPqOracle(PqM, PqSubDim, PqK, IvfPqProbes, PqL),
    // a14: a13's search algebra over the corpus rows satisfying the
    // metadata predicate — the filter applies BEFORE ADC shortlisting
    // (pre-filtering), exactly where the pushed parquet filter sits in
    // the Spark plan, so the hash pins the pre- vs post-filter choice.
    "a14_filtered_ann_prebuilt" -> ivfPqOracle(PqM, PqSubDim, PqK, IvfPqProbes, PqL,
      corpusWhere = "_fl.label < 5"),
    // recall@5 of the stored IVF-PQ ranking (CTE `r`, identical to
    // a13's oracle) against exact brute-force ground truth — integer
    // basis points, no float recall
    "a18_ann_recall" ->
      s"""${ivfPqRankedCtes(PqM, PqSubDim, PqK, IvfPqProbes, PqL)},
         |idx AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 5),
         |ex0 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${cosine(dot("q.embedding", "c.embedding"), "q.nsq", "c.nsq")} AS sim
         |  FROM ev q JOIN ev c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
         |  FROM ex0) WHERE rk <= 5),
         |h AS (SELECT e.query_id, COUNT(i.neighbor_id) AS n_hits
         |  FROM ex e LEFT JOIN idx i
         |    ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
         |  GROUP BY 1)
         |SELECT query_id, 5 AS k, n_hits, n_hits * 2000 AS recall_bp
         |FROM h ORDER BY query_id""".stripMargin,
  )

}
