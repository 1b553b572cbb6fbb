package graft.oracle

/** DuckDB replays of the training-example generators
  * (graft.pipeline.Examples) — every per-position decision is a pure
  * function of (tag, doc_id, pos) through xxhash64 over a string key,
  * so the whole example set is plain SQL once DuckDbXxHash reproduces
  * the hash.
  */
object ExampleOracles {

  /** Normalized word array (TextAnalysis.words ∘ normalizeText). */
  private val wordsExpr =
    """string_split_regex(trim(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))), '\s+')"""

  /** q203: BERT-style MLM corruption — the 15% / 80-10-10 rule over
    * hash decisions. One xxh64 chain hashes all three tagged key
    * streams (mask? / corruption kind / replacement index); the
    * replacement token comes from the sorted-distinct corpus
    * vocabulary by positive-mod index.
    */
  def q203Sql(seedTag: String = "mlm", maskRateFp: Long = 150000L,
      maskToken: String = "[MASK]"): String = {
    def pm(x: String, m: String) =
      s"((${DuckDbXxHash.signedSql(x)} % $m) + $m) % $m"
    s"""WITH
       |ws AS (SELECT doc_id, $wordsExpr AS w FROM documents),
       |tok AS MATERIALIZED (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |         w[CAST(i AS INT) + 1] AS tok
       |  FROM (SELECT doc_id, w, unnest(range(0, len(w))) AS i FROM ws)
       |  WHERE len(w[CAST(i AS INT) + 1]) > 0),
       |keys AS (
       |  SELECT doc_id, pos, tag,
       |         pfx || CAST(doc_id AS VARCHAR) || ':' ||
       |           CAST(pos AS VARCHAR) AS s
       |  FROM tok CROSS JOIN (VALUES
       |    ('m', '${seedTag}_m:'), ('a', '${seedTag}_a:'),
       |    ('r', '${seedTag}_r:')) t(tag, pfx)),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh", idCols = "doc_id, pos, tag")},
       |dec AS (
       |  SELECT doc_id, pos,
       |         max(CASE WHEN tag = 'm' THEN h64 END) AS hm,
       |         max(CASE WHEN tag = 'a' THEN h64 END) AS ha,
       |         max(CASE WHEN tag = 'r' THEN h64 END) AS hr
       |  FROM hh GROUP BY 1, 2),
       |vocab AS (
       |  SELECT vtok, row_number() OVER (ORDER BY vtok) - 1 AS vidx
       |  FROM (SELECT DISTINCT tok AS vtok FROM tok)),
       |vsz AS (SELECT count(*) AS v FROM vocab),
       |sel AS (
       |  SELECT t.doc_id, t.pos, t.tok,
       |         ${pm("ha", "10")} AS act, ${pm("hr", "v")} AS ridx
       |  FROM tok t JOIN dec d USING (doc_id, pos) CROSS JOIN vsz
       |  WHERE ${pm("hm", "1000000")} < $maskRateFp)
       |SELECT s.doc_id, s.pos, s.tok AS orig_token,
       |       CASE WHEN s.act < 8 THEN '$maskToken'
       |            WHEN s.act = 8 THEN v.vtok
       |            ELSE s.tok END AS input_token,
       |       CASE WHEN s.act < 8 THEN 'mask'
       |            WHEN s.act = 8 THEN 'random'
       |            ELSE 'keep' END AS action
       |FROM sel s LEFT JOIN vocab v ON v.vidx = s.ridx""".stripMargin
  }
}
