package graft.oracle

/** DuckDB replay of [[graft.text.BigramLm]] — re-derives the FROZEN
  * counts (top-V vocab, mapped unigram counts, top-B mapped bigram
  * counts) from the same training slice and replays the interpolated
  * Laplace scoring chain term-by-term, so the q211 gate checks the
  * whole train→score lifecycle (the UnigramOracles discipline).
  *
  * Floating-point order is kept IDENTICAL to the kernel's:
  * (c+1)/(denominator) per probability, 0.5·p_bi + 0.5·p_uni, ln,
  * ·1e6, floor per TERM (the q153/q159 "ln is portable" rule); the
  * document sum is then pure integer.
  */
object BigramLmOracles {

  private val wordsExpr =
    """list_filter(string_split_regex(trim(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))), '\s+'), x -> len(x) > 0)"""

  /** The frozen-model training replay shared by q211 and q216:
    * top-V vocab, mapped positions, unigram counts, totals, top-B
    * bigram counts (CTEs tws/rawc/voc/tpos/uni/tot/vsz/big).
    */
  private def trainCtes(vocabSize: Int, maxBigrams: Int,
      trainWhere: String): String =
    s"""tws AS (SELECT doc_id, $wordsExpr AS ws FROM documents $trainWhere),
       |rawc AS (SELECT w, count(*) AS c
       |         FROM (SELECT unnest(ws) AS w FROM tws) GROUP BY 1),
       |voc AS MATERIALIZED (
       |  SELECT w FROM rawc ORDER BY c DESC, w LIMIT $vocabSize),
       |tpos AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS BIGINT) AS i,
       |         CASE WHEN ws[CAST(i AS INT) + 1] IN (SELECT w FROM voc)
       |              THEN ws[CAST(i AS INT) + 1] ELSE '<unk>' END AS mw
       |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i FROM tws)),
       |uni AS MATERIALIZED (
       |  SELECT mw AS w, count(*) AS c FROM tpos GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
       |vsz AS (SELECT CAST(count(*) + 1 AS DOUBLE) AS v FROM voc),
       |big AS MATERIALIZED (
       |  SELECT b, count(*) AS c
       |  FROM (SELECT a.mw || ' ' || b.mw AS b
       |        FROM tpos a JOIN tpos b
       |          ON b.doc_id = a.doc_id AND b.i = a.i + 1)
       |  GROUP BY 1 ORDER BY c DESC, b LIMIT $maxBigrams)""".stripMargin

  def q211Sql(vocabSize: Int = 1024, maxBigrams: Int = 4096,
      trainWhere: String = "WHERE doc_id % 2 = 0",
      headBelowFp: Long, midBelowFp: Long): String =
    s"""WITH
       |${trainCtes(vocabSize, maxBigrams, trainWhere)},
       |dws AS (SELECT doc_id, $wordsExpr AS ws FROM documents),
       |dpos AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS BIGINT) AS i,
       |         CASE WHEN ws[CAST(i AS INT) + 1] IN (SELECT w FROM voc)
       |              THEN ws[CAST(i AS INT) + 1] ELSE '<unk>' END AS mw
       |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i FROM dws)),
       |pairs AS (
       |  SELECT a.doc_id, a.i, a.mw AS w1, b.mw AS w2
       |  FROM dpos a JOIN dpos b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
       |terms AS (
       |  SELECT p.doc_id,
       |         CAST(floor(-ln(
       |           0.5 * ((CAST(coalesce(bc.c, 0) AS DOUBLE) + 1.0) /
       |                  (CAST(coalesce(u1.c, 0) AS DOUBLE) + vsz.v)) +
       |           0.5 * ((CAST(coalesce(u2.c, 0) AS DOUBLE) + 1.0) /
       |                  (tot.n + vsz.v))) * 1000000.0) AS BIGINT) AS t
       |  FROM pairs p
       |  LEFT JOIN big bc ON bc.b = p.w1 || ' ' || p.w2
       |  LEFT JOIN uni u1 ON u1.w = p.w1
       |  LEFT JOIN uni u2 ON u2.w = p.w2
       |  CROSS JOIN tot CROSS JOIN vsz),
       |agg AS (SELECT doc_id, count(*) AS ns, CAST(sum(t) AS BIGINT) AS nll
       |        FROM terms GROUP BY 1)
       |SELECT d.doc_id,
       |       CAST(coalesce(a.ns, 0) AS BIGINT) AS n_scored,
       |       CAST(coalesce(a.nll, 0) AS BIGINT) AS nll_fp,
       |       CASE WHEN coalesce(a.ns, 0) > 0
       |            THEN CAST(floor(CAST(a.nll AS DOUBLE) /
       |                   CAST(a.ns AS DOUBLE)) AS BIGINT) END AS avg_nll_fp,
       |       CASE WHEN coalesce(a.ns, 0) = 0 THEN 'unscored'
       |            WHEN floor(CAST(a.nll AS DOUBLE) / CAST(a.ns AS DOUBLE))
       |                 < $headBelowFp THEN 'head'
       |            WHEN floor(CAST(a.nll AS DOUBLE) / CAST(a.ns AS DOUBLE))
       |                 < $midBelowFp THEN 'middle'
       |            ELSE 'tail' END AS ppl_bucket
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** q222: interpolated Kneser–Ney perplexity over the same frozen
    * counts — re-derives the continuation/left fan-outs (N1+(·w2) /
    * N1+(w1·)) and table size B from the retained bigram table and
    * replays the exact discount chain with per-term floors
    * ([[graft.text.BigramLm.kneserNeyPerplexity]]'s operation order,
    * parenthesization preserved).
    */
  def q222Sql(vocabSize: Int = 1024, maxBigrams: Int = 4096,
      trainWhere: String = "WHERE doc_id % 2 = 0",
      headBelowFp: Long, midBelowFp: Long): String =
    s"""WITH
       |${trainCtes(vocabSize, maxBigrams, trainWhere)},
       |cont AS (SELECT string_split(b, ' ')[2] AS w, count(*) AS nc
       |         FROM big GROUP BY 1),
       |lft AS (SELECT string_split(b, ' ')[1] AS w, count(*) AS nl
       |        FROM big GROUP BY 1),
       |bsz AS (SELECT CAST(count(*) AS DOUBLE) AS bn FROM big),
       |dws AS (SELECT doc_id, $wordsExpr AS ws FROM documents),
       |dpos AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS BIGINT) AS i,
       |         CASE WHEN ws[CAST(i AS INT) + 1] IN (SELECT w FROM voc)
       |              THEN ws[CAST(i AS INT) + 1] ELSE '<unk>' END AS mw
       |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS i FROM dws)),
       |pairs AS (
       |  SELECT a.doc_id, a.i, a.mw AS w1, b.mw AS w2
       |  FROM dpos a JOIN dpos b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
       |terms AS (
       |  SELECT p.doc_id,
       |         CAST(floor(-ln(
       |           greatest(CAST(coalesce(bc.c, 0) AS DOUBLE) - 0.75, 0.0)
       |             / (CAST(coalesce(u1.c, 0) AS DOUBLE) + vsz.v)
       |           + (0.75 * (CAST(coalesce(l.nl, 0) AS DOUBLE) + 1.0)
       |              / (CAST(coalesce(u1.c, 0) AS DOUBLE) + vsz.v))
       |             * ((CAST(coalesce(ct.nc, 0) AS DOUBLE) + 1.0)
       |                / (bsz.bn + vsz.v))) * 1000000.0) AS BIGINT) AS t
       |  FROM pairs p
       |  LEFT JOIN big bc ON bc.b = p.w1 || ' ' || p.w2
       |  LEFT JOIN uni u1 ON u1.w = p.w1
       |  LEFT JOIN lft l ON l.w = p.w1
       |  LEFT JOIN cont ct ON ct.w = p.w2
       |  CROSS JOIN vsz CROSS JOIN bsz),
       |agg AS (SELECT doc_id, count(*) AS ns, CAST(sum(t) AS BIGINT) AS nll
       |        FROM terms GROUP BY 1)
       |SELECT d.doc_id,
       |       CAST(coalesce(a.ns, 0) AS BIGINT) AS n_scored,
       |       CAST(coalesce(a.nll, 0) AS BIGINT) AS nll_fp,
       |       CASE WHEN coalesce(a.ns, 0) > 0
       |            THEN CAST(floor(CAST(a.nll AS DOUBLE) /
       |                   CAST(a.ns AS DOUBLE)) AS BIGINT) END AS avg_nll_fp,
       |       CASE WHEN coalesce(a.ns, 0) = 0 THEN 'unscored'
       |            WHEN floor(CAST(a.nll AS DOUBLE) / CAST(a.ns AS DOUBLE))
       |                 < $headBelowFp THEN 'head'
       |            WHEN floor(CAST(a.nll AS DOUBLE) / CAST(a.ns AS DOUBLE))
       |                 < $midBelowFp THEN 'middle'
       |            ELSE 'tail' END AS ppl_bucket
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** q216: PMI collocations over the same frozen counts —
    * floor(ln(c_ab·N / (c_a·c_b))·1e6) for retained non-`<unk>`
    * bigrams with c_ab ≥ minCount, ranked (pmi desc, w1, w2).
    */
  def q216Sql(vocabSize: Int = 1024, maxBigrams: Int = 4096,
      trainWhere: String = "WHERE doc_id % 2 = 0",
      minCount: Long = 5L): String =
    s"""WITH
       |${trainCtes(vocabSize, maxBigrams, trainWhere)},
       |pairs AS (
       |  SELECT string_split(b, ' ')[1] AS w1,
       |         string_split(b, ' ')[2] AS w2, c AS n_pair
       |  FROM big
       |  WHERE c >= $minCount AND string_split(b, ' ')[1] <> '<unk>'
       |    AND string_split(b, ' ')[2] <> '<unk>'),
       |sc AS (
       |  SELECT p.w1, p.w2, p.n_pair,
       |         CAST(floor(ln(CAST(p.n_pair AS DOUBLE) * tot.n /
       |           (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))) * 1000000.0)
       |           AS BIGINT) AS pmi_fp
       |  FROM pairs p JOIN uni u1 ON u1.w = p.w1
       |               JOIN uni u2 ON u2.w = p.w2
       |  CROSS JOIN tot)
       |SELECT w1, w2, n_pair, pmi_fp,
       |       CAST(row_number() OVER (ORDER BY pmi_fp DESC, w1, w2)
       |         AS BIGINT) AS rank
       |FROM sc""".stripMargin
}
