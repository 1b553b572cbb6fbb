package graft.oracle

/** Generated DuckDB oracles for the fixed ANN twins (q48b/q52b/q78b/
  * q53b — [[graft.similarity.Ann.lshTopKFixed]]/`ivfTopKFixed`/
  * `pqTopKFixed`/`embeddingPairsLshFixed`). Replay rests on three
  * cross-engine-exact ingredients:
  *
  *  1. xxhash64 over "t:p:d" strings for the ±1 Rademacher planes
  *     ([[DuckDbXxHash]] — the same machinery the MinHash gates use);
  *  2. L2 normalization + squared-distance/ADC chains as
  *     LEFT-ASSOCIATIVE double folds (correctly-rounded IEEE ops in a
  *     fixed order replay bit-identically — the q121b argument);
  *  3. all candidate scoring as exact integer sums over 1e-6
  *     fixed-point unit vectors.
  *
  * Centroids (q52b) and codebooks (q78b) are the normalized first-N
  * corpus embeddings — derived in-query on both sides, so the oracle
  * embeds no data constants.
  */
object AnnOracles {

  /** Shared chain: embeddings → L2-normalized `unit(id, uv)` →
    * fixed-point `vf(id, vf)`. `srcSql` must yield (id, v).
    */
  private def unitCtes(srcSql: String): String =
    s"""e AS ($srcSql),
       |nn AS (SELECT id, v, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |         list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |         (a, b) -> a + b) AS n2 FROM e),
       |unit AS MATERIALIZED (SELECT id, CASE WHEN sqrt(n2) > 0
       |         THEN list_transform(v, x -> CAST(x AS DOUBLE) / sqrt(n2))
       |         ELSE list_transform(v, x -> CAST(x AS DOUBLE)) END AS uv
       |       FROM nn),
       |vf AS MATERIALIZED (SELECT id, list_transform(uv, x ->
       |         CAST(floor(x * 1000000.0) AS BIGINT)) AS vf FROM unit)""".stripMargin

  private val embeddingsSrc = "SELECT vec_id AS id, embedding AS v FROM embeddings"

  /** Rademacher plane signs + per-(id, table) bucket CTEs (`buck`). */
  private def bucketCtes(tables: Int, planes: Int, dim: Int): String =
    s"""tpk AS (SELECT t.t, p.p, d.d,
       |          CAST(t.t AS VARCHAR) || ':' || CAST(p.p AS VARCHAR) || ':' ||
       |          CAST(d.d AS VARCHAR) AS ks
       |        FROM range($tables) t(t), range($planes) p(p), range($dim) d(d)),
       |${DuckDbXxHash.xxh64Ctes("tpk", "ks", "tph", idCols = "t, p, d")},
       |sgl AS MATERIALIZED (
       |  SELECT t, p, list(CASE WHEN h64 % 2 = 0 THEN CAST(1 AS BIGINT)
       |                         ELSE CAST(-1 AS BIGINT) END ORDER BY d) AS sl
       |  FROM tph GROUP BY 1, 2),
       |proj AS (SELECT vf.id, sgl.t, sgl.p,
       |           list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(range($dim), i -> sgl.sl[i+1] * vf.vf[i+1])),
       |           (a, b) -> a + b) AS pr
       |         FROM vf CROSS JOIN sgl),
       |buck AS MATERIALIZED (
       |  SELECT id, t, sum(CASE WHEN pr > 0
       |           THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END) AS bucket
       |  FROM proj GROUP BY 1, 2)""".stripMargin

  /** Exact integer dot of the fixed-point vectors of `aId`/`bId`. */
  private def dotFpSql(dim: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(range($dim), i -> qv.vf[i+1] * cv.vf[i+1])),
       |           (a, b) -> a + b)""".stripMargin

  /** q48b: fixed-plane LSH top-k. */
  def q48bSql(k: Int = 10, tables: Int = 32, planes: Int = 4, dim: Int = 64,
      nQueries: Int = 10): String =
    s"""WITH
       |${unitCtes(embeddingsSrc)},
       |${bucketCtes(tables, planes, dim)},
       |cand AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id
       |         FROM buck q JOIN buck c ON q.t = c.t AND q.bucket = c.bucket
       |         WHERE q.id < $nQueries AND c.id <> q.id),
       |sc AS (SELECT cand.query_id, cand.neighbor_id,
       |         ${dotFpSql(dim)} AS score_fp
       |       FROM cand JOIN vf qv ON qv.id = cand.query_id
       |                 JOIN vf cv ON cv.id = cand.neighbor_id),
       |rk AS (SELECT query_id, neighbor_id, score_fp,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY score_fp DESC, neighbor_id) AS INT) AS "rank"
       |       FROM sc)
       |SELECT query_id, neighbor_id, "rank", score_fp
       |FROM rk WHERE "rank" <= $k""".stripMargin

  /** q53b: fixed-plane LSH near-dup pairs over the planted corpus
    * (every embedding + a ×2-scaled copy at id+100000 — the scaled
    * copy normalizes to the identical unit vector).
    */
  def q53bSql(thresholdFp: Long = 450000000000L, tables: Int = 32,
      planes: Int = 4, dim: Int = 64): String = {
    val planted =
      """SELECT vec_id AS id, list_transform(embedding,
        |         x -> CAST(x AS DOUBLE)) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * 2.0) FROM embeddings""".stripMargin
    s"""WITH
       |${unitCtes(planted)},
       |${bucketCtes(tables, planes, dim)},
       |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |         FROM buck l JOIN buck r ON l.t = r.t AND l.bucket = r.bucket
       |         WHERE l.id < r.id),
       |sc AS (SELECT cand.id_a, cand.id_b, ${dotFpSql(dim)} AS score_fp
       |       FROM cand JOIN vf qv ON qv.id = cand.id_a
       |                 JOIN vf cv ON cv.id = cand.id_b)
       |SELECT id_a, id_b, score_fp FROM sc
       |WHERE score_fp >= $thresholdFp""".stripMargin
  }

  /** q168: SemDeDup under frozen centroids
    * ([[graft.pipeline.Curation.semanticDedupFixed]]) over the
    * exact-copy planted corpus (vec_id+100000 duplicates — identical
    * vectors share a cluster by construction, so every plant is a
    * guaranteed within-cluster duplicate). Assignment replays the
    * raw-vector left-assoc d² chain against the first-8 raw
    * embeddings (the q121b construction); scoring is the exact
    * integer dot of fixed-point unit vectors, computed by
    * position-join `sum` — exact integers commute, unlike the float
    * chains, so no ordered fold is needed.
    */
  def q168Sql(thresholdFp: Long = 450000000000L, nCentroids: Int = 8,
      dim: Int = 64): String = {
    val planted =
      """SELECT vec_id AS id, embedding AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings""".stripMargin
    // ONE copy of the kernel: the same sd_ fragment q170/q171/q174
    // compose, so every semantic-family oracle replays identical
    // assignment/scoring SQL
    s"""WITH
       |${semanticDroppedCtes(planted, thresholdFp, nCentroids, dim)}
       |SELECT g.id AS vec_id, g.cluster FROM sd_asg g
       |LEFT JOIN sem_dropped d ON d.id = g.id
       |WHERE d.id IS NULL""".stripMargin
  }

  /** q172: k-NN graph under frozen centroids
    * ([[graft.similarity.Ann.knnGraphFixed]]) — unit-space d²
    * assignment to the normalized first-`nlist` embeddings (the q52b
    * construction), every vector ranked against its list-mates by
    * exact integer dot (desc, neighbor asc), top-`k` kept. rank CAST
    * to INT: Spark's row_number is int32, DuckDB's BIGINT.
    */
  def q172Sql(k: Int = 5, nlist: Int = 8, dim: Int = 64): String =
    s"""WITH
       |${unitCtes(embeddingsSrc)},
       |cent AS (SELECT id AS cid, uv AS cv FROM unit WHERE id < $nlist),
       |dist AS MATERIALIZED (
       |  SELECT u.id, c.cid, ${d2Chain("u.uv", "c.cv", dim)} AS d2
       |  FROM unit u CROSS JOIN cent c),
       |best AS (SELECT id, min(d2) AS md FROM dist GROUP BY 1),
       |asg AS MATERIALIZED (
       |  SELECT d.id, min(d.cid) AS list_id
       |  FROM dist d JOIN best b ON d.id = b.id AND d.d2 = b.md
       |  GROUP BY 1),
       |pairs AS (SELECT a.id AS vec_id, b.id AS neighbor_id
       |          FROM asg a JOIN asg b
       |            ON a.list_id = b.list_id AND a.id <> b.id),
       |sc AS (SELECT p.vec_id, p.neighbor_id, ${dotFpSql(dim)} AS score_fp
       |       FROM pairs p JOIN vf qv ON qv.id = p.vec_id
       |                    JOIN vf cv ON cv.id = p.neighbor_id),
       |rk AS (SELECT vec_id, neighbor_id, score_fp,
       |              row_number() OVER (PARTITION BY vec_id
       |                ORDER BY score_fp DESC, neighbor_id) AS rank
       |       FROM sc)
       |SELECT vec_id, neighbor_id, score_fp, CAST(rank AS INT) AS rank
       |FROM rk WHERE rank <= $k""".stripMargin

  /** Prefixed CTE chain for one fixed-centroid within-list kNN graph
    * (the q172 body, centroids = normalized embeddings [centLo,
    * centHi)). Requires `unitCtes` in scope; emits `<p>knn`
    * (vec_id, neighbor_id, score_fp). cid keeps the RAW embedding id
    * as the list key — an offset from the Spark side's 0-based
    * centroid index, harmless because list ids are join-only and the
    * min(cid) tie-break preserves the centroid-sequence order.
    */
  private def knnGraphCtes(p: String, centLo: Int, centHi: Int, k: Int,
      dim: Int): String =
    s"""${p}cent AS (SELECT id AS cid, uv AS cv FROM unit
       |  WHERE id >= $centLo AND id < $centHi),
       |${p}dist AS MATERIALIZED (
       |  SELECT u.id, c.cid, ${d2Chain("u.uv", "c.cv", dim)} AS d2
       |  FROM unit u CROSS JOIN ${p}cent c),
       |${p}best AS (SELECT id, min(d2) AS md FROM ${p}dist GROUP BY 1),
       |${p}asg AS MATERIALIZED (
       |  SELECT d.id, min(d.cid) AS list_id
       |  FROM ${p}dist d JOIN ${p}best b ON d.id = b.id AND d.d2 = b.md
       |  GROUP BY 1),
       |${p}pairs AS (SELECT a.id AS vec_id, b.id AS neighbor_id
       |          FROM ${p}asg a JOIN ${p}asg b
       |            ON a.list_id = b.list_id AND a.id <> b.id),
       |${p}sc AS (SELECT pp.vec_id, pp.neighbor_id,
       |         ${dotFpSql(dim)} AS score_fp
       |       FROM ${p}pairs pp JOIN vf qv ON qv.id = pp.vec_id
       |                    JOIN vf cv ON cv.id = pp.neighbor_id),
       |${p}rk AS (SELECT vec_id, neighbor_id, score_fp,
       |              row_number() OVER (PARTITION BY vec_id
       |                ORDER BY score_fp DESC, neighbor_id) AS rank
       |       FROM ${p}sc),
       |${p}knn AS MATERIALIZED (SELECT vec_id, neighbor_id, score_fp
       |       FROM ${p}rk WHERE rank <= $k)""".stripMargin

  /** q196: one NN-descent refinement round
    * ([[graft.similarity.Ann.nnDescentRound]]) over the UNION of two
    * fixed within-list graphs under DIFFERENT centroid sets (first-8
    * and next-8 unit embeddings) — the deterministic stand-in for
    * NN-descent's random initialization: a single within-list graph
    * is component-disjoint, so its local join can only re-find
    * already-ranked pairs; two overlapping clusterings give the round
    * genuine cross-clustering candidates to discover. The round:
    * undirected adjacency (swap + distinct; the dot is symmetric so
    * either copy carries the same score), per-middle member cap at
    * `maxDegree` (score desc, member asc — the deterministic
    * sample-rate), local join (co-members become candidates), exact
    * integer dot scoring, merge with current edges, fresh top-`k`.
    */
  def q196Sql(k: Int = 5, nlist: Int = 8, dim: Int = 64,
      maxDegree: Int = 64): String =
    s"""WITH
       |${unitCtes(embeddingsSrc)},
       |${knnGraphCtes("g1_", 0, nlist, k, dim)},
       |${knnGraphCtes("g2_", nlist, 2 * nlist, k, dim)},
       |knn AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id, score_fp FROM g1_knn
       |  UNION ALL
       |  SELECT vec_id, neighbor_id, score_fp FROM g2_knn),
       |und AS (SELECT DISTINCT vec_id, neighbor_id, score_fp FROM (
       |          SELECT vec_id, neighbor_id, score_fp FROM knn
       |          UNION ALL
       |          SELECT neighbor_id, vec_id, score_fp FROM knn) u),
       |capped AS (SELECT vec_id AS mid, neighbor_id AS member FROM (
       |            SELECT vec_id, neighbor_id,
       |                   row_number() OVER (PARTITION BY vec_id
       |                     ORDER BY score_fp DESC, neighbor_id) AS rn
       |            FROM und) c WHERE rn <= $maxDegree),
       |cand AS (SELECT DISTINCT l.member AS vec_id,
       |                r.member AS neighbor_id
       |         FROM capped l JOIN capped r ON l.mid = r.mid
       |         WHERE l.member <> r.member),
       |sc AS (SELECT c.vec_id, c.neighbor_id, ${dotFpSql(dim)} AS score_fp
       |       FROM cand c JOIN vf qv ON qv.id = c.vec_id
       |                   JOIN vf cv ON cv.id = c.neighbor_id),
       |allc AS (SELECT DISTINCT vec_id, neighbor_id, score_fp FROM (
       |          SELECT vec_id, neighbor_id, score_fp FROM sc
       |          UNION ALL
       |          SELECT vec_id, neighbor_id, score_fp FROM knn) a),
       |rk AS (SELECT vec_id, neighbor_id, score_fp,
       |              row_number() OVER (PARTITION BY vec_id
       |                ORDER BY score_fp DESC, neighbor_id) AS rank
       |       FROM allc)
       |SELECT vec_id, neighbor_id, score_fp, CAST(rank AS INT) AS rank
       |FROM rk WHERE rank <= $k""".stripMargin

  /** q173: kNN-density prototypicality/outlier verdicts over the q172
    * graph ([[graft.similarity.Ann.knnDensity]]). floor(sum/count) in
    * DOUBLE on both engines (sum ≤ k·1e12 ≪ 2^53, so the division is
    * exact-input): integer `div`/`//` would diverge on negative sums
    * (Spark truncates, DuckDB floors).
    */
  def q173Sql(outlierBelowFp: Long = 100000000000L, k: Int = 5,
      nlist: Int = 8, dim: Int = 64): String =
    s"""WITH knn AS MATERIALIZED (${q172Sql(k, nlist, dim)}),
       |d AS (SELECT vec_id,
       |        CAST(floor(sum(score_fp) / count(*)) AS BIGINT) AS density_fp
       |      FROM knn GROUP BY 1)
       |SELECT vec_id, density_fp,
       |       density_fp < $outlierBelowFp AS is_outlier
       |FROM d""".stripMargin

  /** q175: MMR diversified re-rank
    * ([[graft.similarity.Ann.mmrRerank]]) over the q48b LSH shortlist
    * — k unrolled argmax steps (the q159 unrolled-DP pattern): each
    * step anti-joins the picked set, takes max integer dot to every
    * picked doc, and argmaxes `lamN·rel − lamM·maxsim` with
    * neighbor-id tie-break. The nested q48b subquery re-derives its
    * own unit CTEs in its own scope; the outer `vf` serves the
    * doc-doc sims.
    */
  def q175Sql(k: Int = 5, shortlist: Int = 20, lambdaNum: Long = 1L,
      lambdaDen: Long = 2L, tables: Int = 32, planes: Int = 4,
      dim: Int = 64, nQueries: Int = 10): String = {
    val lamM = lambdaDen - lambdaNum
    val sb = new StringBuilder
    // outer fixed-point unit vectors under m-prefixed names: DuckDB
    // rejects duplicate CTE aliases even across nested scopes, and the
    // q48b subquery owns e/nn/unit/vf
    sb.append(
      s"""WITH mvf AS MATERIALIZED (
         |  SELECT id, list_transform(
         |    CASE WHEN sqrt(n2) > 0
         |         THEN list_transform(v, x -> CAST(x AS DOUBLE) / sqrt(n2))
         |         ELSE list_transform(v, x -> CAST(x AS DOUBLE)) END,
         |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS vf
         |  FROM (SELECT id, v, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         |          (a, b) -> a + b) AS n2
         |        FROM ($embeddingsSrc)))""".stripMargin + ",\n")
    sb.append(
      s"mcand AS MATERIALIZED (${q48bSql(shortlist, tables, planes, dim, nQueries)}),\n")
    sb.append(
      s"""sel1 AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, CAST(1 AS INT) AS mmr_rank FROM (
         |    SELECT query_id, neighbor_id, row_number() OVER (
         |      PARTITION BY query_id
         |      ORDER BY score_fp DESC, neighbor_id) AS rn
         |    FROM mcand) WHERE rn = 1),
         |all1 AS (SELECT * FROM sel1)""".stripMargin + ",\n")
    for (i <- 2 to k) {
      val p = i - 1
      sb.append(
        s"""rem$i AS (SELECT c.* FROM mcand c
           |  LEFT JOIN all$p s ON s.query_id = c.query_id
           |    AND s.neighbor_id = c.neighbor_id
           |  WHERE s.neighbor_id IS NULL),
           |ms$i AS (SELECT r.query_id, r.neighbor_id,
           |    max(${dotFpSql(dim)}) AS ms_fp
           |  FROM rem$i r JOIN all$p s ON s.query_id = r.query_id
           |  JOIN mvf qv ON qv.id = r.neighbor_id
           |  JOIN mvf cv ON cv.id = s.neighbor_id
           |  GROUP BY 1, 2),
           |sel$i AS MATERIALIZED (
           |  SELECT query_id, neighbor_id, CAST($i AS INT) AS mmr_rank FROM (
           |    SELECT r.query_id, r.neighbor_id, row_number() OVER (
           |      PARTITION BY r.query_id
           |      ORDER BY $lambdaNum * r.score_fp - $lamM * m.ms_fp DESC,
           |               r.neighbor_id) AS rn
           |    FROM rem$i r JOIN ms$i m ON m.query_id = r.query_id
           |      AND m.neighbor_id = r.neighbor_id) WHERE rn = 1),
           |all$i AS (SELECT * FROM all$p UNION ALL SELECT * FROM sel$i)"""
          .stripMargin + ",\n")
    }
    sb.setLength(sb.length - 2)
    sb.append(s"\nSELECT query_id, neighbor_id, mmr_rank FROM all$k")
    sb.toString
  }

  /** q174: the D4 pipeline — SemDeDup survivors (raw-space kernel,
    * [[semanticDroppedCtes]]) → unit-space k-NN graph + density over
    * the SURVIVOR set (full-corpus centroids — frozen params don't
    * shrink with the corpus) → drop measured outliers, keep isolated
    * survivors with NULL density.
    */
  def q174Sql(dedupThresholdFp: Long = 450000000000L,
      outlierBelowFp: Long = 100000000000L, k: Int = 5,
      nCentroids: Int = 8, dim: Int = 64): String =
    s"""WITH
       |${semanticDroppedCtes(embeddingsSrc, dedupThresholdFp, nCentroids, dim)},
       |surv AS MATERIALIZED (
       |  SELECT e0.vec_id AS id FROM embeddings e0
       |  LEFT JOIN sem_dropped sdp ON sdp.id = e0.vec_id
       |  WHERE sdp.id IS NULL),
       |${unitCtes(embeddingsSrc)},
       |cent AS (SELECT id AS cid, uv AS cv FROM unit WHERE id < $nCentroids),
       |su AS (SELECT u.id, u.uv FROM unit u JOIN surv ON surv.id = u.id),
       |dist AS MATERIALIZED (
       |  SELECT su.id, c.cid, ${d2Chain("su.uv", "c.cv", dim)} AS d2
       |  FROM su CROSS JOIN cent c),
       |best AS (SELECT id, min(d2) AS md FROM dist GROUP BY 1),
       |asg AS MATERIALIZED (
       |  SELECT d.id, min(d.cid) AS list_id
       |  FROM dist d JOIN best b ON d.id = b.id AND d.d2 = b.md
       |  GROUP BY 1),
       |pairs AS (SELECT a.id AS vec_id, b.id AS neighbor_id
       |          FROM asg a JOIN asg b
       |            ON a.list_id = b.list_id AND a.id <> b.id),
       |sc AS (SELECT p.vec_id, p.neighbor_id, ${dotFpSql(dim)} AS score_fp
       |       FROM pairs p JOIN vf qv ON qv.id = p.vec_id
       |                    JOIN vf cv ON cv.id = p.neighbor_id),
       |rk AS (SELECT vec_id, score_fp,
       |              row_number() OVER (PARTITION BY vec_id
       |                ORDER BY score_fp DESC, neighbor_id) AS rank
       |       FROM sc),
       |dns AS (SELECT vec_id,
       |          CAST(floor(sum(score_fp) / count(*)) AS BIGINT) AS density_fp
       |        FROM rk WHERE rank <= $k GROUP BY 1)
       |SELECT s.id AS vec_id, dns.density_fp
       |FROM surv s LEFT JOIN dns ON dns.vec_id = s.id
       |WHERE dns.density_fp IS NULL OR dns.density_fp >= $outlierBelowFp"""
      .stripMargin

  /** q171: semantic dup CLUSTERING — the [[semanticDroppedCtes]] pair
    * set fed to a recursive min-label transitive closure (the q54Sql
    * construction), survivors = component minima plus unpaired docs.
    * High threshold (0.9): components are the planted exact-copy
    * pairs plus rare high-cosine links, so the closure stays tiny.
    */
  def q171Sql(thresholdFp: Long = 900000000000L, nCentroids: Int = 8,
      dim: Int = 64): String = {
    val planted =
      """SELECT vec_id AS id, embedding AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings""".stripMargin
    val pairsSql =
      s"""WITH
         |${semanticDroppedCtes(planted, thresholdFp, nCentroids, dim)}
         |SELECT id_a, id_b FROM sd_sc WHERE s >= $thresholdFp""".stripMargin
    s"""WITH RECURSIVE pairs AS MATERIALIZED ($pairsSql),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT a AS id, b AS r FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
       |),
       |labels AS (SELECT id, least(id, min(r)) AS cluster_id
       |           FROM reach GROUP BY 1),
       |alldocs AS (
       |  SELECT vec_id FROM embeddings
       |  UNION ALL SELECT vec_id + 100000 FROM embeddings)
       |SELECT d.vec_id FROM alldocs d LEFT JOIN labels l ON d.vec_id = l.id
       |WHERE l.cluster_id IS NULL OR l.cluster_id = d.vec_id""".stripMargin
  }

  /** q176: semantic decontamination audit
    * ([[graft.pipeline.Curation.semanticContaminationPairs]]) — corpus
    * = the embeddings table, benchmark = the vec_id%7==3 rows re-keyed
    * at +500000 (exact copies ⇒ guaranteed ≥threshold pairs plus
    * whatever random near-pairs clear the bar). Corpus assigned to its
    * single nearest raw-space centroid, benchmark to its `nProbe`
    * nearest (d asc, cid asc — the probeFixedLists tie-break); scoring
    * is the exact integer dot of fixed-point unit vectors.
    */
  def q176Sql(thresholdFp: Long = 450000000000L, nProbe: Int = 2,
      nCentroids: Int = 8, dim: Int = 64): String = {
    val benchSrc =
      """SELECT vec_id + 500000 AS id, embedding AS v
        |  FROM embeddings WHERE vec_id % 7 = 3""".stripMargin
    s"""WITH
       |${prefixedUnitFp("dc_", embeddingsSrc)},
       |${prefixedUnitFp("db_", benchSrc)},
       |dc_cent AS (SELECT vec_id AS cid, list_transform(embedding,
       |    x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id < $nCentroids),
       |dc_ev AS (SELECT id, list_transform(v, x -> CAST(x AS DOUBLE)) AS dv
       |          FROM dc_e),
       |db_ev AS (SELECT id, list_transform(v, x -> CAST(x AS DOUBLE)) AS dv
       |          FROM db_e),
       |dc_dist AS (SELECT dc_ev.id, c.cid,
       |    ${d2Chain("dc_ev.dv", "c.ce", dim)} AS d
       |  FROM dc_ev CROSS JOIN dc_cent c),
       |dc_bestd AS (SELECT id, min(d) AS md FROM dc_dist GROUP BY 1),
       |dc_asg AS MATERIALIZED (
       |  SELECT d.id, CAST(min(d.cid) AS BIGINT) AS cluster
       |  FROM dc_dist d JOIN dc_bestd b ON d.id = b.id AND d.d = b.md
       |  GROUP BY 1),
       |db_dist AS (SELECT db_ev.id, c.cid,
       |    ${d2Chain("db_ev.dv", "c.ce", dim)} AS d
       |  FROM db_ev CROSS JOIN dc_cent c),
       |db_probe AS MATERIALIZED (
       |  SELECT id, CAST(cid AS BIGINT) AS cluster FROM (
       |    SELECT id, cid, row_number() OVER (
       |      PARTITION BY id ORDER BY d, cid) AS rn FROM db_dist)
       |  WHERE rn <= $nProbe),
       |prs AS (SELECT c.id, b.id AS bench_id
       |        FROM dc_asg c JOIN db_probe b ON c.cluster = b.cluster),
       |sc AS (SELECT prs.id, prs.bench_id, ${dotFpSql(dim)} AS sim_fp
       |       FROM prs JOIN dc_vf qv ON qv.id = prs.id
       |                JOIN db_vf cv ON cv.id = prs.bench_id)
       |SELECT id, bench_id, sim_fp FROM sc
       |WHERE sim_fp >= $thresholdFp""".stripMargin
  }

  /** q184: graph-ANN beam search
    * ([[graft.similarity.Ann.beamSearchFixed]]) over the q172 k-NN
    * graph — `steps` unrolled rounds (the q175 pattern): score the
    * fixed entry set, then per round expand the frontier's graph
    * neighbors, anti-join everything already visited, keep the `beam`
    * best per query, union into visited; final top-`k` over visited.
    * The nested q172 subquery owns its own unit CTE names; the outer
    * scope scores through `gs_`-prefixed twins.
    */
  def q184Sql(beam: Int = 4, steps: Int = 3, k: Int = 5,
      nEntries: Int = 8, nQueries: Int = 10, kGraph: Int = 5,
      nlist: Int = 8, dim: Int = 64): String = {
    val sb = new StringBuilder
    sb.append(s"WITH ${prefixedUnitFp("gs_", embeddingsSrc)},\n")
    sb.append(s"knn AS MATERIALIZED (${q172Sql(kGraph, nlist, dim)}),\n")
    sb.append(
      s"""bq AS (SELECT id AS query_id FROM gs_e WHERE id < $nQueries),
         |v0 AS MATERIALIZED (
         |  SELECT b.query_id, cv.id AS node, ${dotFpSql(dim)} AS score_fp
         |  FROM bq b
         |  JOIN gs_vf qv ON qv.id = b.query_id
         |  CROSS JOIN (SELECT id FROM gs_e WHERE id < $nEntries) e
         |  JOIN gs_vf cv ON cv.id = e.id
         |  WHERE e.id <> b.query_id),
         |f0 AS (SELECT * FROM v0)""".stripMargin + ",\n")
    for (i <- 1 to steps) {
      val p = i - 1
      sb.append(
        s"""cand$i AS (SELECT DISTINCT f.query_id, g.neighbor_id AS node
           |  FROM f$p f JOIN knn g ON g.vec_id = f.node
           |  WHERE g.neighbor_id <> f.query_id),
           |new$i AS (SELECT c.query_id, c.node FROM cand$i c
           |  LEFT JOIN v$p v ON v.query_id = c.query_id AND v.node = c.node
           |  WHERE v.node IS NULL),
           |sc$i AS (SELECT n.query_id, n.node, ${dotFpSql(dim)} AS score_fp
           |  FROM new$i n JOIN gs_vf qv ON qv.id = n.query_id
           |               JOIN gs_vf cv ON cv.id = n.node),
           |f$i AS MATERIALIZED (SELECT query_id, node, score_fp FROM (
           |  SELECT query_id, node, score_fp, row_number() OVER (
           |    PARTITION BY query_id ORDER BY score_fp DESC, node) AS rn
           |  FROM sc$i) WHERE rn <= $beam),
           |v$i AS MATERIALIZED (
           |  SELECT * FROM v$p UNION ALL SELECT * FROM f$i)""".stripMargin
          + ",\n")
    }
    sb.setLength(sb.length - 2)
    sb.append(
      s"""
         |SELECT query_id, node AS neighbor_id, CAST(rn AS INT) AS rank,
         |       score_fp
         |FROM (SELECT query_id, node, score_fp, row_number() OVER (
         |        PARTITION BY query_id ORDER BY score_fp DESC, node) AS rn
         |      FROM v$steps)
         |WHERE rn <= $k""".stripMargin)
    sb.toString
  }

  /** q190: SQ8 scalar-quantized top-k
    * ([[graft.similarity.Ann.sq8TopK]]) — per-dimension bounds derived
    * in-query over the unit corpus (exact min/max, no arithmetic),
    * clamp-floor codes, on-the-fly dequantization, and the dot folded
    * SEQUENTIALLY via list_reduce (matches the codegen DotProduct loop
    * bit-for-bit) before the 1e12 fixed-point.
    */
  def q190Sql(k: Int = 10, dim: Int = 64, nQueries: Int = 10): String =
    s"""WITH
       |${unitCtes(embeddingsSrc)},
       |${sq8DequantCtes(dim)},
       |qrel AS (SELECT id AS query_id, uv AS qv FROM unit
       |         WHERE id < $nQueries),
       |sc AS (
       |  SELECT q.query_id, d.id AS neighbor_id,
       |    ${sq8FoldSql("q.qv", "d.dv", dim)} AS score_fp
       |  FROM dql d CROSS JOIN qrel q WHERE d.id <> q.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, score_fp
       |FROM (SELECT query_id, neighbor_id, score_fp, row_number() OVER (
       |        PARTITION BY query_id
       |        ORDER BY score_fp DESC, neighbor_id) AS rn
       |      FROM sc)
       |WHERE rn <= $k""".stripMargin

  /** SQ8 dequantized-vector CTEs over `unit(id, uv)`: per-dimension
    * bounds derived in-query, clamp-floor codes, dequantized lists
    * `dql(id, dv)` ordered by position. Shared by q190/q191.
    */
  private def sq8DequantCtes(dim: Int): String =
    s"""pe AS MATERIALIZED (
       |  SELECT id, i.i + 1 AS i, uv[CAST(i.i + 1 AS INT)] AS x
       |  FROM unit, range($dim) i(i)),
       |bounds AS MATERIALIZED (
       |  SELECT i, min(x) AS mn, max(x) AS mx FROM pe GROUP BY i),
       |dqx AS (
       |  SELECT pe.id, pe.i,
       |    b.mn + (CASE WHEN b.mx = b.mn THEN CAST(0 AS DOUBLE)
       |            ELSE LEAST(255.0, GREATEST(0.0,
       |              floor((pe.x - b.mn) * 255.0 / (b.mx - b.mn)))) END)
       |      * (b.mx - b.mn) / 255.0 AS dx
       |  FROM pe JOIN bounds b USING (i)),
       |dql AS MATERIALIZED (
       |  SELECT id, list(dx ORDER BY i) AS dv FROM dqx GROUP BY id)"""
      .stripMargin

  /** The ordered (sequential) double fold of `$q[j]·$d[j]` fixed-
    * pointed at 1e12 — DotProduct's loop bit-for-bit. Lambda vars are
    * suffixed to dodge outer table aliases. */
  private def sq8FoldSql(q: String, d: String, dim: Int): String =
    s"""CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range($dim),
       |        j -> $q[CAST(j + 1 AS INT)] * $d[CAST(j + 1 AS INT)])),
       |      (acc2, x2) -> acc2 + x2) * 1e12) AS BIGINT)""".stripMargin

  /** q191: IVF-SQ8 ([[graft.similarity.Ann.ivfSq8TopK]]) — the q52b
    * assignment/probe kernels (unit-space d², first-minimum) with SQ8
    * dequant scoring inside the probed lists only.
    */
  def q191Sql(k: Int = 10, nlist: Int = 8, nprobe: Int = 3,
      dim: Int = 64, nQueries: Int = 10): String =
    s"""WITH
       |${unitCtes(embeddingsSrc)},
       |cent AS (SELECT id AS cid, uv AS cv FROM unit WHERE id < $nlist),
       |dist AS MATERIALIZED (
       |  SELECT u.id, c.cid, ${d2Chain("u.uv", "c.cv", dim)} AS d2
       |  FROM unit u CROSS JOIN cent c),
       |best AS (SELECT id, min(d2) AS md FROM dist GROUP BY 1),
       |asg AS MATERIALIZED (
       |  SELECT d.id, min(d.cid) AS list_id
       |  FROM dist d JOIN best b ON d.id = b.id AND d.d2 = b.md
       |  GROUP BY 1),
       |${sq8DequantCtes(dim)},
       |qp AS (SELECT id AS query_id, cid AS list_id FROM (
       |    SELECT id, cid, row_number() OVER (
       |      PARTITION BY id ORDER BY d2, cid) AS rn
       |    FROM dist WHERE id < $nQueries) WHERE rn <= $nprobe),
       |sc AS (
       |  SELECT qp.query_id, a.id AS neighbor_id,
       |    ${sq8FoldSql("q.uv", "d.dv", dim)} AS score_fp
       |  FROM qp JOIN asg a ON a.list_id = qp.list_id
       |  JOIN dql d ON d.id = a.id
       |  JOIN unit q ON q.id = qp.query_id
       |  WHERE a.id <> qp.query_id)
       |SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, score_fp
       |FROM (SELECT query_id, neighbor_id, score_fp, row_number() OVER (
       |        PARTITION BY query_id
       |        ORDER BY score_fp DESC, neighbor_id) AS rn
       |      FROM sc)
       |WHERE rn <= $k""".stripMargin

  /** [[unitCtes]]'s chain collapsed to `{p}e, {p}nn, {p}vf` under a
    * caller prefix — for oracles joining TWO unit-fp relations in one
    * scope (DuckDB rejects duplicate CTE aliases).
    */
  private def prefixedUnitFp(p: String, srcSql: String): String =
    s"""${p}e AS ($srcSql),
       |${p}nn AS (SELECT id, v, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |    (a, b) -> a + b) AS n2 FROM ${p}e),
       |${p}vf AS MATERIALIZED (SELECT id, list_transform(
       |    CASE WHEN sqrt(n2) > 0
       |         THEN list_transform(v, x -> CAST(x AS DOUBLE) / sqrt(n2))
       |         ELSE list_transform(v, x -> CAST(x AS DOUBLE)) END,
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS vf FROM ${p}nn)"""
      .stripMargin

  /** CTE fragment replaying the ids DROPPED by
    * [[graft.pipeline.Curation.semanticDedupFixed]] over `srcSql`
    * (must yield `(id, v)`): ends in `sem_dropped(id)`. All CTE
    * names are `sd_`-prefixed so the fragment composes into larger
    * chains (q170's full-curation gate) without collisions; the
    * construction is q168's — raw-vector d² assignment against the
    * first-`nCentroids` embeddings, exact position-join integer dots
    * of fixed-point unit vectors, drop = any smaller-id ≥threshold
    * same-cluster neighbor.
    */
  def semanticDroppedCtes(srcSql: String, thresholdFp: Long,
      nCentroids: Int = 8, dim: Int = 64): String =
    s"""sd_e AS ($srcSql),
       |sd_nn AS (SELECT id, v, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |    (a, b) -> a + b) AS n2 FROM sd_e),
       |sd_vf AS MATERIALIZED (SELECT id, list_transform(
       |    CASE WHEN sqrt(n2) > 0
       |         THEN list_transform(v, x -> CAST(x AS DOUBLE) / sqrt(n2))
       |         ELSE list_transform(v, x -> CAST(x AS DOUBLE)) END,
       |    x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS vf FROM sd_nn),
       |sd_ev AS (SELECT id, list_transform(v, x -> CAST(x AS DOUBLE)) AS dv
       |          FROM sd_e),
       |sd_cent AS (SELECT vec_id AS cid, list_transform(embedding,
       |    x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id < $nCentroids),
       |sd_dist AS (SELECT sd_ev.id, c.cid,
       |    ${d2Chain("sd_ev.dv", "c.ce", dim)} AS d
       |  FROM sd_ev CROSS JOIN sd_cent c),
       |sd_bestd AS (SELECT id, min(d) AS md FROM sd_dist GROUP BY 1),
       |sd_asg AS MATERIALIZED (
       |  SELECT d.id, CAST(min(d.cid) AS BIGINT) AS cluster
       |  FROM sd_dist d JOIN sd_bestd b ON d.id = b.id AND d.d = b.md
       |  GROUP BY 1),
       |sd_pe AS MATERIALIZED (
       |  SELECT id, i.i + 1 AS i, vf[CAST(i.i + 1 AS INT)] AS x
       |  FROM sd_vf, range($dim) i(i)),
       |sd_pairs AS MATERIALIZED (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM sd_asg a JOIN sd_asg b
       |    ON a.cluster = b.cluster AND a.id < b.id),
       |sd_sc AS (
       |  SELECT p.id_a, p.id_b, CAST(sum(pa.x * pb.x) AS BIGINT) AS s
       |  FROM sd_pairs p
       |  JOIN sd_pe pa ON pa.id = p.id_a
       |  JOIN sd_pe pb ON pb.id = p.id_b AND pb.i = pa.i
       |  GROUP BY 1, 2),
       |sem_dropped AS (
       |  SELECT DISTINCT id_b AS id FROM sd_sc WHERE s >= $thresholdFp)"""
      .stripMargin

  /** The left-assoc squared-distance chain between unit-list columns
    * `$a[i]` and `$b[i]`, i = 1..dim.
    */
  private def d2Chain(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"($a[$i] - $b[$i]) * ($a[$i] - $b[$i])")
      .mkString(" + ")

  /** q52b: frozen-centroid IVF top-k — centroids are the normalized
    * first-`nlist` embeddings; assignment/probe by the exact d² chain
    * (first-minimum tie-break); ranking by exact integer dot within
    * the probed lists.
    */
  def q52bSql(k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      dim: Int = 64, nQueries: Int = 10): String =
    s"""WITH
       |${unitCtes(embeddingsSrc)},
       |cent AS (SELECT id AS cid, uv AS cv FROM unit WHERE id < $nlist),
       |dist AS MATERIALIZED (
       |  SELECT u.id, c.cid, ${d2Chain("u.uv", "c.cv", dim)} AS d2
       |  FROM unit u CROSS JOIN cent c),
       |best AS (SELECT id, min(d2) AS md FROM dist GROUP BY 1),
       |asg AS (SELECT d.id, min(d.cid) AS list_id
       |        FROM dist d JOIN best b ON d.id = b.id AND d.d2 = b.md
       |        GROUP BY 1),
       |prb AS (SELECT query_id, list_id FROM (
       |          SELECT id AS query_id, cid AS list_id,
       |                 row_number() OVER (PARTITION BY id
       |                   ORDER BY d2 ASC, cid) AS pr
       |          FROM dist WHERE id < $nQueries)
       |        WHERE pr <= $nprobe),
       |cand AS (SELECT DISTINCT p.query_id, a.id AS neighbor_id
       |         FROM prb p JOIN asg a ON a.list_id = p.list_id
       |         WHERE a.id <> p.query_id),
       |sc AS (SELECT cand.query_id, cand.neighbor_id,
       |         ${dotFpSql(dim)} AS score_fp
       |       FROM cand JOIN vf qv ON qv.id = cand.query_id
       |                 JOIN vf cv ON cv.id = cand.neighbor_id),
       |rk AS (SELECT query_id, neighbor_id, score_fp,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY score_fp DESC, neighbor_id) AS INT) AS "rank"
       |       FROM sc)
       |SELECT query_id, neighbor_id, "rank", score_fp
       |FROM rk WHERE "rank" <= $k""".stripMargin

  /** q78b: frozen-codebook PQ — codeword c of subspace j is dims
    * [j·dsub, (j+1)·dsub) of the normalized embedding `vec_id = c`;
    * encode by first-minimum d² chain per subspace, score by ADC
    * dot-table lookups (each entry fixed-pointed at 1e-6), ranked by
    * the exact integer ADC sum.
    */
  def q78bSql(k: Int = 10, m: Int = 16, ks: Int = 16, dsub: Int = 4,
      nQueries: Int = 10): String = {
    def sub(col: String, i: Int) = s"$col[$dsub*j.j+$i]"
    val encChain = (1 to dsub)
      .map(i => s"(${sub("u.uv", i)} - ${sub("w.uv", i)}) * " +
        s"(${sub("u.uv", i)} - ${sub("w.uv", i)})")
      .mkString(" + ")
    val lutChain = (1 to dsub)
      .map(i => s"${sub("u.uv", i)} * ${sub("w.uv", i)}")
      .mkString(" + ")
    s"""WITH
       |${unitCtes(embeddingsSrc)},
       |cw AS (SELECT id AS c, uv FROM unit WHERE id < $ks),
       |encd AS MATERIALIZED (
       |  SELECT u.id, j.j, w.c, $encChain AS d2
       |  FROM unit u, range($m) j(j), cw w),
       |ebest AS (SELECT id, j, min(d2) AS md FROM encd GROUP BY 1, 2),
       |ecode AS (SELECT d.id, d.j, min(d.c) AS code
       |          FROM encd d JOIN ebest b
       |            ON d.id = b.id AND d.j = b.j AND d.d2 = b.md
       |          GROUP BY 1, 2),
       |lut AS MATERIALIZED (
       |  SELECT u.id AS query_id, j.j, w.c,
       |         CAST(floor(($lutChain) * 1000000.0) AS BIGINT) AS v
       |  FROM unit u, range($m) j(j), cw w WHERE u.id < $nQueries),
       |sc AS (SELECT l.query_id, e.id AS neighbor_id,
       |              CAST(sum(l.v) AS BIGINT) AS score_fp
       |       FROM ecode e JOIN lut l
       |         ON l.j = e.j AND l.c = e.code AND l.query_id <> e.id
       |       GROUP BY 1, 2),
       |rk AS (SELECT query_id, neighbor_id, score_fp,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY score_fp DESC, neighbor_id) AS INT) AS "rank"
       |       FROM sc)
       |SELECT query_id, neighbor_id, "rank", score_fp
       |FROM rk WHERE "rank" <= $k""".stripMargin
  }

  /** q208: hash-sign random projection
    * (graft.similarity.Projection.project) — the ±1 matrix is the
    * parity of xxhash64("{tag}:j:k") and inputs fix-point to
    * floor(x·1e6) before the fold, so each component is an exact
    * integer sum.
    */
  def q208Sql(dIn: Int = 64, dOut: Int = 16,
      seedTag: String = "rp"): String = {
    val sgn = DuckDbXxHash.signedSql("h64")
    s"""WITH
       |jk AS (SELECT CAST(t1.j AS BIGINT) AS j, CAST(t2.k AS BIGINT) AS k
       |       FROM range(0, $dIn) t1(j) CROSS JOIN range(0, $dOut) t2(k)),
       |keys AS (SELECT j, k, '$seedTag:' || CAST(j AS VARCHAR) || ':' ||
       |                CAST(k AS VARCHAR) AS s FROM jk),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh", idCols = "j, k")},
       |sgn AS (SELECT j, k,
       |        CAST(1 - 2 * ((($sgn % 2) + 2) % 2) AS BIGINT) AS sg
       |        FROM hh),
       |ef AS (SELECT vec_id AS id, list_transform(embedding,
       |         x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS vf
       |       FROM embeddings WHERE embedding IS NOT NULL),
       |el AS (SELECT id, CAST(i AS BIGINT) AS j, vf[CAST(i AS INT) + 1] AS xf
       |       FROM (SELECT id, vf, unnest(range(0, len(vf))) AS i FROM ef))
       |SELECT e.id, CAST(s.k AS INT) AS k,
       |       CAST(sum(s.sg * e.xf) AS BIGINT) AS y_fp
       |FROM el e JOIN sgn s ON s.j = e.j
       |GROUP BY 1, 2""".stripMargin
  }

  /** q209: two-stage projected-shortlist + exact re-rank top-k
    * (graft.similarity.Projection.projTopKFixed) — projection of the
    * fixed-point UNIT vectors under the q208 hash-sign matrix, integer
    * shortlist ranking, exact integer-dot refine.
    */
  def q209Sql(dIn: Int = 64, dOut: Int = 16, k: Int = 10,
      shortlist: Int = 40, seedTag: String = "rp"): String = {
    val sgn = DuckDbXxHash.signedSql("h64")
    s"""WITH
       |jk AS (SELECT CAST(t1.j AS BIGINT) AS j, CAST(t2.k AS BIGINT) AS k
       |       FROM range(0, $dIn) t1(j) CROSS JOIN range(0, $dOut) t2(k)),
       |keys AS (SELECT j, k, '$seedTag:' || CAST(j AS VARCHAR) || ':' ||
       |                CAST(k AS VARCHAR) AS s FROM jk),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh", idCols = "j, k")},
       |sgn AS (SELECT j, k,
       |        CAST(1 - 2 * ((($sgn % 2) + 2) % 2) AS BIGINT) AS sg
       |        FROM hh),
       |${prefixedUnitFp("c_", embeddingsSrc)},
       |${prefixedUnitFp("q_", embeddingsSrc + " WHERE vec_id < 10")},
       |cel AS (SELECT id, CAST(i AS BIGINT) AS j, vf[CAST(i AS INT) + 1] AS xf
       |        FROM (SELECT id, vf, unnest(range(0, len(vf))) AS i FROM c_vf)),
       |cpr AS MATERIALIZED (
       |  SELECT e.id, s.k, CAST(sum(s.sg * e.xf) AS BIGINT) AS y
       |  FROM cel e JOIN sgn s ON s.j = e.j GROUP BY 1, 2),
       |qel AS (SELECT id, CAST(i AS BIGINT) AS j, vf[CAST(i AS INT) + 1] AS xf
       |        FROM (SELECT id, vf, unnest(range(0, len(vf))) AS i FROM q_vf)),
       |qpr AS MATERIALIZED (
       |  SELECT e.id, s.k, CAST(sum(s.sg * e.xf) AS BIGINT) AS y
       |  FROM qel e JOIN sgn s ON s.j = e.j GROUP BY 1, 2),
       |ps AS (
       |  SELECT qp.id AS query_id, cp.id AS neighbor_id,
       |         CAST(sum(qp.y * cp.y) AS BIGINT) AS pscore
       |  FROM qpr qp JOIN cpr cp ON cp.k = qp.k AND cp.id <> qp.id
       |  GROUP BY 1, 2),
       |shr AS (
       |  SELECT query_id, neighbor_id, row_number() OVER (
       |           PARTITION BY query_id
       |           ORDER BY pscore DESC, neighbor_id) AS pr
       |  FROM ps),
       |sc AS (
       |  SELECT s.query_id, s.neighbor_id, ${dotFpSql(dIn)} AS score_fp
       |  FROM (SELECT query_id, neighbor_id FROM shr WHERE pr <= $shortlist) s
       |  JOIN q_vf qv ON qv.id = s.query_id
       |  JOIN c_vf cv ON cv.id = s.neighbor_id)
       |SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, score_fp
       |FROM (SELECT query_id, neighbor_id, score_fp,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY score_fp DESC, neighbor_id) AS rn
       |      FROM sc)
       |WHERE rn <= $k""".stripMargin
  }

  /** q234: prototypicality pruning
    * ([[graft.pipeline.Curation.prototypicalityPrune]]) — raw-space d²
    * assignment against the first-`nCentroids` embeddings (the q168
    * centroid convention), within-cluster hardness rank by d² DESC
    * with id tie-break, keep `ceil(keepNum·n/keepDen)` per cluster via
    * the cross-multiplied integer test. `d2_fp = floor(d² · 1e12)` —
    * the d² doubles are the same left-assoc IEEE chains both engines
    * compute, so the fixed-point projection is exact.
    */
  def q234Sql(keepNum: Long = 1L, keepDen: Long = 2L,
      nCentroids: Int = 8, dim: Int = 64): String =
    s"""WITH e AS ($embeddingsSrc),
       |ev AS (SELECT id, list_transform(v, x -> CAST(x AS DOUBLE)) AS dv
       |       FROM e),
       |cent AS (SELECT vec_id AS cid, list_transform(embedding,
       |    x -> CAST(x AS DOUBLE)) AS ce
       |  FROM embeddings WHERE vec_id < $nCentroids),
       |dist AS MATERIALIZED (SELECT ev.id, c.cid,
       |    ${d2Chain("ev.dv", "c.ce", dim)} AS d
       |  FROM ev CROSS JOIN cent c),
       |bestd AS (SELECT id, min(d) AS md FROM dist GROUP BY 1),
       |asg AS (SELECT d.id, CAST(min(d.cid) AS BIGINT) AS cluster,
       |    min(b.md) AS md
       |  FROM dist d JOIN bestd b ON d.id = b.id AND d.d = b.md
       |  GROUP BY 1),
       |sz AS (SELECT cluster, count(*) AS n FROM asg GROUP BY 1),
       |r AS (SELECT id, cluster, md, row_number() OVER (
       |        PARTITION BY cluster ORDER BY md DESC, id) AS rn
       |      FROM asg)
       |SELECT r.id AS vec_id, r.cluster,
       |       CAST(floor(md * 1000000000000.0) AS BIGINT) AS d2_fp,
       |       CAST(rn AS INT) AS rank
       |FROM r JOIN sz USING (cluster)
       |WHERE rn * $keepDen <= $keepNum * n + ${keepDen - 1}""".stripMargin
}
