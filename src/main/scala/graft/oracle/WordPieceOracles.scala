package graft.oracle

import graft.text.WordPiece

/** DuckDB replay of [[graft.text.WordPiece]] — self-contained SQL that
  * re-derives the frozen vocabulary from the same corpus AND replays
  * the greedy longest-match loop, so the q136 gate checks the whole
  * train→tokenize lifecycle, not a pasted constant table.
  *
  * Greedy replay strategy (the q106 unrolled-CTE precedent, but with
  * the per-step search PRECOMPUTED): a word's longest vocabulary match
  * at position p never depends on tokenizer state, so one equi-joined
  * match table `mm(word, p, ml)` — max matched length per position and
  * role — is built once, and each of the [[WordPiece.WordCap]] unrolled
  * steps is a cheap (word, pos) lookup instead of a nested-loop
  * longest-prefix probe. Every step advances ≥ 1 codepoint, so WordCap
  * steps complete every word.
  */
object WordPieceOracles {

  /** Oracle for [[WordPiece.tokenStats]] over `documents`, vocabulary
    * trained on the `trainWhere` slice (default: even doc_ids — the
    * q106 train/apply split, so odd docs exercise out-of-training
    * chars → `[UNK]`); `applyWhere` restricts the TOKENIZED corpus
    * (the q145 artifact-lifecycle gate tokenizes a disjoint slice).
    */
  def tokenStatsSql(topK: Int = 1024,
      trainWhere: String = "WHERE doc_id % 2 = 0",
      applyWhere: String = ""): String =
    coreCtes(topK, trainWhere, applyWhere, awKey = "doc_id") + s""",
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

  /** Oracle for [[WordPiece.coverageReport]]: the same vocab + match
    * machinery keyed per `source`, aggregating occurrence-weighted
    * word, `[UNK]`-word and piece counts — the tokenizer-health table.
    */
  def coverageSql(topK: Int = 1024,
      trainWhere: String = "WHERE doc_id % 2 = 0"): String =
    coreCtes(topK, trainWhere, "", awKey = "source") + """
      |SELECT wo.source,
      |  CAST(sum(wo.occ) AS BIGINT) AS n_words,
      |  CAST(sum(CASE WHEN wt.unk THEN wo.occ ELSE 0 END) AS BIGINT)
      |    AS n_unk_words,
      |  CAST(sum(wo.occ * wt.np) AS BIGINT) AS n_pieces
      |FROM wo JOIN wt USING (word) GROUP BY 1""".stripMargin

  /** Everything through `wt` (per-word np/acc/unk) and `wo`
    * (per-`awKey` occurrence counts) — shared by both oracles.
    */
  private def coreCtes(topK: Int, trainWhere: String,
      applyWhere: String, awKey: String): String = {
    val cap = WordPiece.WordCap
    val mi = WordPiece.MaxInitLen
    val mc = WordPiece.MaxContLen
    val split =
      """regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')"""
    val sb = new StringBuilder
    sb ++= s"""WITH tw AS (
      |  SELECT substr(word, 1, $cap) AS word, count(*) AS freq
      |  FROM (SELECT unnest($split) AS word FROM documents $trainWhere)
      |  WHERE word <> '' GROUP BY 1),
      |tp AS (SELECT word, freq, unnest(range(1, len(word) + 1)) AS p FROM tw),
      |tc AS (SELECT word, freq, p,
      |         unnest(range(1, least(CASE WHEN p = 1 THEN $mi ELSE $mc END,
      |                               len(word) - p + 1) + 1)) AS l
      |       FROM tp),
      |tpiece AS (SELECT substr(word, p, l) AS piece, freq, p, l FROM tc),
      |singles AS (SELECT DISTINCT piece FROM tpiece WHERE l = 1),
      |vim AS (SELECT piece FROM (
      |          SELECT piece, sum(freq) AS w FROM tpiece
      |          WHERE p = 1 AND l >= 2 GROUP BY 1)
      |        ORDER BY w DESC, piece ASC LIMIT $topK),
      |vcm AS (SELECT piece FROM (
      |          SELECT piece, sum(freq) AS w FROM tpiece
      |          WHERE p >= 2 AND l >= 2 GROUP BY 1)
      |        ORDER BY w DESC, piece ASC LIMIT $topK),
      |vi AS (SELECT piece FROM singles UNION SELECT piece FROM vim),
      |vc AS (SELECT piece FROM singles UNION SELECT piece FROM vcm),
      |aw AS (
      |  SELECT $awKey, substr(word, 1, $cap) AS word
      |  FROM (SELECT $awKey, unnest($split) AS word FROM documents $applyWhere)
      |  WHERE word <> ''),
      |wo AS (SELECT $awKey, word, count(*) AS occ FROM aw GROUP BY 1, 2),
      |dw AS (SELECT DISTINCT word FROM wo),
      |dp AS (SELECT word, unnest(range(1, len(word) + 1)) AS p FROM dw),
      |dc AS (SELECT word, p,
      |         unnest(range(1, least(CASE WHEN p = 1 THEN $mi ELSE $mc END,
      |                               len(word) - p + 1) + 1)) AS l
      |       FROM dp),
      |dpiece AS (SELECT word, p, l, substr(word, p, l) AS piece FROM dc),
      |mm AS MATERIALIZED (
      |  SELECT d.word, d.p, max(d.l) AS ml
      |  FROM dpiece d JOIN vi v ON d.p = 1 AND d.piece = v.piece
      |  GROUP BY 1, 2
      |  UNION ALL
      |  SELECT d.word, d.p, max(d.l)
      |  FROM dpiece d JOIN vc v ON d.p > 1 AND d.piece = v.piece
      |  GROUP BY 1, 2),
      |s0 AS (SELECT word, len(word) AS len, 1 AS pos,
      |              CAST(0 AS BIGINT) AS np, '' AS acc, FALSE AS unk
      |       FROM dw)""".stripMargin
    for (k <- 1 to cap) {
      sb ++= s""",
      |s$k AS MATERIALIZED (
      |  SELECT s.word, s.len,
      |    CASE WHEN s.unk OR s.pos > s.len OR m.ml IS NULL THEN s.pos
      |         ELSE s.pos + m.ml END AS pos,
      |    CASE WHEN s.unk OR s.pos > s.len THEN s.np
      |         WHEN m.ml IS NULL THEN CAST(1 AS BIGINT)
      |         ELSE s.np + 1 END AS np,
      |    CASE WHEN s.unk OR s.pos > s.len THEN s.acc
      |         WHEN m.ml IS NULL THEN '|[UNK]'
      |         ELSE s.acc || '|' ||
      |              (CASE WHEN s.pos = 1 THEN '' ELSE '##' END) ||
      |              substr(s.word, s.pos, m.ml) END AS acc,
      |    CASE WHEN s.unk THEN TRUE
      |         WHEN s.pos <= s.len AND m.ml IS NULL THEN TRUE
      |         ELSE FALSE END AS unk
      |  FROM s${k - 1} s LEFT JOIN mm m ON s.word = m.word AND s.pos = m.p)""".stripMargin
    }
    sb ++= s""",
      |wt AS (SELECT word, np, acc, unk FROM s$cap)""".stripMargin
    sb.toString
  }
}
