package graft.oracle

import graft.text.Unigram

/** DuckDB replay of [[graft.text.Unigram]] — re-derives the frozen
  * scored vocabulary from the same corpus AND replays the exact
  * integer Viterbi, so the q159 gate checks the whole train→tokenize
  * lifecycle (the [[WordPieceOracles]] discipline).
  *
  * Replay strategy: the per-word DP table is built by
  * [[Unigram.WordCap]] unrolled steps — step k adds the best
  * (path score, backpointer) for END position k by joining the match
  * table `m(word, i, l, sc)` at i = k against the already-built
  * positions k−l (`ORDER BY best DESC, l DESC LIMIT 1` per word = the
  * kernel's descending-l strict-improvement scan). A second
  * [[Unigram.WordCap]]-step unroll walks the backpointers from
  * pos = len to 0, accumulating the piece string; a word whose final
  * position is unreachable is `[UNK]`.
  *
  * The shared CTE chain ends at `wt(word, np, acc, wsc)` — per-word
  * piece count, piece string and total Viterbi score (NULL for
  * [UNK]); [[tokenStatsSql]] and [[perplexitySql]] are two tails
  * over the same replay.
  */
object UnigramOracles {

  /** Everything through `wt` — the train → match → DP → backtrack
    * replay shared by both gates.
    */
  private def viterbiCtes(topK: Int, trainWhere: String,
      applyWhere: String): String = {
    val cap = Unigram.WordCap
    val mp = Unigram.MaxPieceLen
    val split =
      """regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')"""
    val sb = new StringBuilder
    sb ++= s"""WITH tw AS (
      |  SELECT substr(word, 1, $cap) AS word, count(*) AS freq
      |  FROM (SELECT unnest($split) AS word FROM documents $trainWhere)
      |  WHERE word <> '' GROUP BY 1),
      |tp AS (SELECT word, freq, unnest(range(1, len(word) + 1)) AS p FROM tw),
      |tc AS (SELECT word, freq, p,
      |         unnest(range(1, least($mp, len(word) - p + 1) + 1)) AS l
      |       FROM tp),
      |cw AS (SELECT substr(word, p, l) AS piece, sum(freq) AS w
      |       FROM tc GROUP BY 1),
      |vsel AS (
      |  SELECT piece, w FROM cw WHERE length(piece) = 1
      |  UNION
      |  SELECT piece, w FROM (
      |    SELECT piece, w FROM cw WHERE length(piece) >= 2
      |    ORDER BY w DESC, piece ASC LIMIT $topK) tk),
      |tot AS (SELECT sum(w) AS tw FROM vsel),
      |vsc AS MATERIALIZED (
      |  SELECT piece,
      |         CAST(floor(ln(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)) * 1e6)
      |              AS BIGINT) AS sc
      |  FROM vsel CROSS JOIN tot),
      |aw AS (
      |  SELECT doc_id, substr(word, 1, $cap) AS word
      |  FROM (SELECT doc_id, unnest($split) AS word FROM documents $applyWhere)
      |  WHERE word <> ''),
      |wo AS (SELECT doc_id, word, count(*) AS occ FROM aw GROUP BY 1, 2),
      |dw AS (SELECT DISTINCT word FROM wo),
      |di AS (SELECT word, unnest(range(1, len(word) + 1)) AS i FROM dw),
      |dl AS (SELECT word, i, unnest(range(1, least($mp, i) + 1)) AS l FROM di),
      |m AS MATERIALIZED (
      |  SELECT d.word, d.i, d.l, v.sc
      |  FROM (SELECT word, i, l, substr(word, i - l + 1, l) AS piece
      |        FROM dl) d
      |  JOIN vsc v USING (piece)),
      |bp0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS best, 0 AS bl
      |        FROM dw)""".stripMargin
    for (k <- 1 to cap) {
      sb ++= s""",
      |bp$k AS MATERIALIZED (
      |  SELECT word, pos, best, bl FROM bp${k - 1}
      |  UNION ALL
      |  SELECT word, pos, best, bl FROM (
      |    SELECT m.word, $k AS pos, b.best + m.sc AS best, m.l AS bl,
      |           row_number() OVER (PARTITION BY m.word
      |             ORDER BY b.best + m.sc DESC, m.l DESC) AS rn
      |    FROM m JOIN bp${k - 1} b
      |      ON b.word = m.word AND b.pos = $k - m.l
      |    WHERE m.i = $k) t WHERE rn = 1)""".stripMargin
    }
    sb ++= s""",
      |r0 AS (
      |  SELECT d.word, len(d.word) AS len,
      |         CASE WHEN f.pos IS NULL THEN TRUE ELSE FALSE END AS unk,
      |         f.best AS wsc,
      |         len(d.word) AS cur, '' AS acc, CAST(0 AS BIGINT) AS np
      |  FROM dw d LEFT JOIN bp$cap f
      |    ON f.word = d.word AND f.pos = len(d.word))""".stripMargin
    for (k <- 1 to cap) {
      sb ++= s""",
      |r$k AS MATERIALIZED (
      |  SELECT r.word, r.len, r.unk, r.wsc,
      |    CASE WHEN r.unk OR r.cur = 0 THEN r.cur ELSE r.cur - b.bl END AS cur,
      |    CASE WHEN r.unk OR r.cur = 0 THEN r.acc
      |         ELSE '|' || substr(r.word, r.cur - b.bl + 1, b.bl) || r.acc
      |         END AS acc,
      |    CASE WHEN r.unk OR r.cur = 0 THEN r.np ELSE r.np + 1 END AS np
      |  FROM r${k - 1} r LEFT JOIN bp$cap b
      |    ON b.word = r.word AND b.pos = r.cur)""".stripMargin
    }
    sb ++= s""",
      |wt AS (SELECT word,
      |         CASE WHEN unk THEN CAST(1 AS BIGINT) ELSE np END AS np,
      |         CASE WHEN unk THEN '|[UNK]' ELSE acc END AS acc,
      |         CASE WHEN unk THEN NULL ELSE wsc END AS wsc
      |       FROM r$cap)""".stripMargin
    sb.toString
  }

  def tokenStatsSql(topK: Int = 1024,
      trainWhere: String = "WHERE doc_id % 2 = 0",
      applyWhere: String = ""): String =
    s"""${viterbiCtes(topK, trainWhere, applyWhere)},
      |ag AS (
      |  SELECT wo.doc_id,
      |    CAST(sum(wo.occ) AS BIGINT) AS n_words,
      |    CAST(sum(wo.occ * wt.np) AS BIGINT) AS n_pieces,
      |    CAST(sum(wo.occ * (('0x' || substr(md5(wt.acc), 1, 6))::BIGINT))
      |         AS BIGINT) AS piece_hash
      |  FROM wo JOIN wt USING (word) GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(ag.n_words, 0) AS BIGINT) AS n_words,
      |  CAST(coalesce(ag.n_pieces, 0) AS BIGINT) AS n_pieces,
      |  CAST(coalesce(ag.piece_hash, 0) AS BIGINT) AS piece_hash
      |FROM (SELECT doc_id FROM documents $applyWhere) d
      |LEFT JOIN ag USING (doc_id)""".stripMargin

  /** q197: CCNet-style perplexity bucketing
    * ([[graft.text.Unigram.perplexity]]) — per-doc total negative
    * log-likelihood from the per-word Viterbi scores (`wsc`; [UNK]
    * charges the frozen OOV penalty), floor-divided in DOUBLE
    * (exact-input, the knnDensity rule) and bucketed by the fixed
    * thresholds.
    */
  def perplexitySql(topK: Int = 1024,
      trainWhere: String = "WHERE doc_id % 2 = 0",
      applyWhere: String = "",
      unkScoreFp: Long = -20000000L,
      headBelowFp: Long, midBelowFp: Long): String =
    s"""${viterbiCtes(topK, trainWhere, applyWhere)},
      |ag AS (
      |  SELECT wo.doc_id,
      |    CAST(sum(wo.occ * wt.np) AS BIGINT) AS n_pieces,
      |    CAST(sum(wo.occ * (CASE WHEN wt.wsc IS NULL
      |         THEN CAST(${-unkScoreFp} AS BIGINT)
      |         ELSE -wt.wsc END)) AS BIGINT) AS nll_fp
      |  FROM wo JOIN wt USING (word) GROUP BY 1),
      |sel AS (
      |  SELECT d.doc_id,
      |    CAST(coalesce(ag.n_pieces, 0) AS BIGINT) AS n_pieces,
      |    CAST(coalesce(ag.nll_fp, 0) AS BIGINT) AS nll_fp
      |  FROM (SELECT doc_id FROM documents $applyWhere) d
      |  LEFT JOIN ag USING (doc_id)),
      |avgd AS (
      |  SELECT doc_id, n_pieces, nll_fp,
      |    CASE WHEN n_pieces = 0 THEN NULL
      |         ELSE CAST(floor(CAST(nll_fp AS DOUBLE)
      |                / CAST(n_pieces AS DOUBLE)) AS BIGINT)
      |         END AS avg_nll_fp
      |  FROM sel)
      |SELECT doc_id, n_pieces, nll_fp, avg_nll_fp,
      |  CASE WHEN n_pieces = 0 THEN 'unscored'
      |       WHEN avg_nll_fp < $headBelowFp THEN 'head'
      |       WHEN avg_nll_fp < $midBelowFp THEN 'middle'
      |       ELSE 'tail' END AS ppl_bucket
      |FROM avgd""".stripMargin
}
