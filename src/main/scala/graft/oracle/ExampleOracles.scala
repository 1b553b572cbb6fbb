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

  /** q204: T5-style span corruption — hash-selected span starts with
    * lengths 2 + h mod 3, interval union via gaps-and-islands, numbered
    * sentinels, and ordered string_agg reassembly of input/target.
    */
  def q204Sql(seedTag: String = "t5", startRateFp: Long = 50000L): String = {
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
       |    ('s', '${seedTag}_s:'), ('l', '${seedTag}_l:')) t(tag, pfx)),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh", idCols = "doc_id, pos, tag")},
       |dec AS (
       |  SELECT doc_id, pos,
       |         max(CASE WHEN tag = 's' THEN h64 END) AS hs,
       |         max(CASE WHEN tag = 'l' THEN h64 END) AS hl
       |  FROM hh GROUP BY 1, 2),
       |mx AS (SELECT doc_id, max(pos) AS maxpos FROM tok GROUP BY 1),
       |spans AS (
       |  SELECT t.doc_id, t.pos AS st,
       |         CAST(least(t.pos + 1 + ${pm("hl", "3")}, m.maxpos) AS BIGINT) AS en
       |  FROM tok t JOIN dec d USING (doc_id, pos) JOIN mx m USING (doc_id)
       |  WHERE ${pm("hs", "1000000")} < $startRateFp),
       |cov AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
       |  FROM (SELECT doc_id, unnest(range(st, en + 1)) AS p FROM spans)),
       |isl AS MATERIALIZED (
       |  SELECT doc_id, pos,
       |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
       |  FROM cov),
       |mrg AS MATERIALIZED (
       |  SELECT doc_id, g, min(pos) AS s, max(pos) AS e,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY min(pos)) - 1 AS k
       |  FROM isl GROUP BY 1, 2),
       |tgt AS (
       |  SELECT doc_id, string_agg(piece, ' ' ORDER BY k) AS target_text,
       |         count(*) AS n_spans
       |  FROM (SELECT m.doc_id, m.k,
       |               '<extra_id_' || m.k || '> ' ||
       |                 string_agg(t.tok, ' ' ORDER BY t.pos) AS piece
       |        FROM mrg m JOIN isl i ON i.doc_id = m.doc_id AND i.g = m.g
       |                   JOIN tok t ON t.doc_id = i.doc_id AND t.pos = i.pos
       |        GROUP BY m.doc_id, m.k)
       |  GROUP BY doc_id),
       |inp AS (
       |  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input_text
       |  FROM (SELECT t.doc_id, t.pos, t.tok AS piece
       |        FROM tok t ANTI JOIN cov c USING (doc_id, pos)
       |        UNION ALL
       |        SELECT doc_id, s AS pos, '<extra_id_' || k || '>' FROM mrg)
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(t.n_spans, 0) AS BIGINT) AS n_spans,
       |       coalesce(i.input_text, '') AS input_text,
       |       coalesce(t.target_text, '') AS target_text
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN inp i USING (doc_id)
       |LEFT JOIN tgt t USING (doc_id)""".stripMargin
  }

  /** q205: deterministic shard assignment + within-shard hash order.
    * Ordering replays Spark's row_number over the SIGNED hash (ties on
    * doc_id).
    */
  def q205Sql(nShards: Int, seedTag: String = "shard"): String = {
    def pm(x: String, m: String) =
      s"((${DuckDbXxHash.signedSql(x)} % $m) + $m) % $m"
    s"""WITH
       |keys AS (
       |  SELECT doc_id, tag, pfx || CAST(doc_id AS VARCHAR) AS s
       |  FROM documents CROSS JOIN (VALUES
       |    ('s', '${seedTag}_s:'), ('o', '${seedTag}_o:')) t(tag, pfx)),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh", idCols = "doc_id, tag")},
       |dec AS (
       |  SELECT doc_id,
       |         max(CASE WHEN tag = 's' THEN h64 END) AS hshard,
       |         max(CASE WHEN tag = 'o' THEN h64 END) AS hord
       |  FROM hh GROUP BY 1),
       |tokc AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter($wordsExpr, x -> len(x) > 0)) AS BIGINT)
       |           AS n_tokens
       |  FROM documents),
       |asg AS (
       |  SELECT doc_id, CAST(${pm("hshard", nShards.toString)} AS BIGINT) AS shard,
       |         ${DuckDbXxHash.signedSql("hord")} AS so
       |  FROM dec)
       |SELECT a.doc_id, a.shard,
       |       CAST(row_number() OVER (PARTITION BY a.shard
       |              ORDER BY a.so, a.doc_id) - 1 AS BIGINT) AS ord,
       |       t.n_tokens
       |FROM asg a JOIN tokc t USING (doc_id)""".stripMargin
  }

  /** q240: per-epoch deterministic reshuffle
    * ([[graft.pipeline.Examples.epochShuffle]]) — q205's shard/order
    * construction with the epoch salted into both hash strings
    * (`epoch_s:<epoch>:<doc_id>` / `epoch_o:…`), ranked per
    * (epoch, shard).
    */
  def q240Sql(nEpochs: Int, nShards: Int, seedTag: String = "epoch",
      docsSrc: String = "SELECT doc_id FROM documents"): String = {
    def pm(x: String, m: String) =
      s"((${DuckDbXxHash.signedSql(x)} % $m) + $m) % $m"
    s"""WITH
       |eps AS (
       |  SELECT doc_id, e.epoch
       |  FROM ($docsSrc) CROSS JOIN
       |    (SELECT unnest(range($nEpochs)) AS epoch) e),
       |keys AS (
       |  SELECT doc_id, epoch, tag,
       |         pfx || CAST(epoch AS VARCHAR) || ':' ||
       |           CAST(doc_id AS VARCHAR) AS s
       |  FROM eps CROSS JOIN (VALUES
       |    ('s', '${seedTag}_s:'), ('o', '${seedTag}_o:')) t(tag, pfx)),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh",
          idCols = "doc_id, epoch, tag")},
       |dec AS (
       |  SELECT doc_id, epoch,
       |         max(CASE WHEN tag = 's' THEN h64 END) AS hshard,
       |         max(CASE WHEN tag = 'o' THEN h64 END) AS hord
       |  FROM hh GROUP BY 1, 2)
       |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
       |       CAST(${pm("hshard", nShards.toString)} AS BIGINT) AS shard,
       |       CAST(row_number() OVER (
       |              PARTITION BY epoch, ${pm("hshard", nShards.toString)}
       |              ORDER BY ${DuckDbXxHash.signedSql("hord")}, doc_id) - 1
       |            AS BIGINT) AS ord
       |FROM dec""".stripMargin
  }

  /** q206: per-shard export manifest — doc/token counts plus an
    * order-independent bit_xor checksum of per-doc content hashes.
    * bit_xor over the sign-extended HUGEINT view equals the 64-bit xor
    * (upper bits stay a replica of bit 63), so the final CAST to
    * BIGINT is exact.
    */
  def q206Sql(nShards: Int, seedTag: String = "shard",
      docsSrc: String = "SELECT doc_id, text FROM documents"): String = {
    def pm(x: String, m: String) =
      s"((${DuckDbXxHash.signedSql(x)} % $m) + $m) % $m"
    s"""WITH
       |src AS ($docsSrc),
       |norm AS (
       |  SELECT doc_id,
       |         trim(regexp_replace(lower(coalesce(text, '')),
       |              '\\s+', ' ', 'g')) AS t
       |  FROM src),
       |keys AS (
       |  SELECT doc_id, 's' AS tag,
       |         '${seedTag}_s:' || CAST(doc_id AS VARCHAR) AS s
       |  FROM src
       |  UNION ALL
       |  SELECT doc_id, 'c', CAST(doc_id AS VARCHAR) || ':' || md5(t)
       |  FROM norm),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh", idCols = "doc_id, tag")},
       |dec AS (
       |  SELECT doc_id,
       |         max(CASE WHEN tag = 's' THEN h64 END) AS hshard,
       |         max(CASE WHEN tag = 'c' THEN h64 END) AS hchk
       |  FROM hh GROUP BY 1),
       |tokc AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter($wordsExpr, x -> len(x) > 0)) AS BIGINT)
       |           AS n_tokens
       |  FROM src)
       |SELECT CAST(${pm("hshard", nShards.toString)} AS BIGINT) AS shard,
       |       count(*) AS n_docs,
       |       CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(bit_xor(${DuckDbXxHash.signedSql("hchk")}) AS BIGINT)
       |         AS checksum
       |FROM dec JOIN tokc t USING (doc_id)
       |GROUP BY 1""".stripMargin
  }

  /** q215: manifest diff — two q206 manifests (base slice vs full
    * corpus) full-outer-joined to per-shard status + deltas.
    */
  def q215Sql(nShards: Int, baseSrc: String, curSrc: String): String =
    s"""SELECT coalesce(b.shard, c.shard) AS shard,
       |       CASE WHEN b.shard IS NULL THEN 'added'
       |            WHEN c.shard IS NULL THEN 'removed'
       |            WHEN b.n_docs = c.n_docs AND b.n_tokens = c.n_tokens
       |                 AND b.checksum = c.checksum THEN 'unchanged'
       |            ELSE 'changed' END AS status,
       |       coalesce(c.n_docs, 0) - coalesce(b.n_docs, 0) AS delta_docs,
       |       coalesce(c.n_tokens, 0) - coalesce(b.n_tokens, 0)
       |         AS delta_tokens
       |FROM (${q206Sql(nShards, docsSrc = baseSrc)}) b
       |FULL OUTER JOIN (${q206Sql(nShards, docsSrc = curSrc)}) c
       |  ON b.shard = c.shard""".stripMargin

  /** q224: NSP pair generation — non-overlapping segment grid,
    * coin/bucket/rank hash decisions replayed, negative pick via the
    * same bucketed dense-rank two-level index.
    */
  def q224Sql(segTokens: Int = 12, seedTag: String = "nsp",
      negBuckets: Int = 16): String = {
    def pm(x: String, m: String) =
      s"((${DuckDbXxHash.signedSql(x)} % $m) + $m) % $m"
    val fw = s"list_filter($wordsExpr, x -> len(x) > 0)"
    s"""WITH ws AS (SELECT doc_id, $fw AS w FROM documents),
       |segs AS MATERIALIZED (
       |  SELECT doc_id, CAST(s // $segTokens AS BIGINT) AS seg_no,
       |         array_to_string(list_slice(w, CAST(s + 1 AS INT),
       |           CAST(s + $segTokens AS INT)), ' ') AS seg
       |  FROM (SELECT doc_id, w, unnest(range(0, len(w), $segTokens)) AS s
       |        FROM ws WHERE len(w) > 0)),
       |keys AS (
       |  SELECT doc_id, seg_no AS pos, 't' AS tag,
       |         '${seedTag}_t:' || CAST(doc_id AS VARCHAR) || ':' ||
       |           CAST(seg_no AS VARCHAR) AS s
       |  FROM segs
       |  UNION ALL
       |  SELECT a.doc_id, a.seg_no, tag,
       |         pfx || CAST(a.doc_id AS VARCHAR) || ':' ||
       |           CAST(a.seg_no AS VARCHAR)
       |  FROM segs a JOIN segs b
       |    ON b.doc_id = a.doc_id AND b.seg_no = a.seg_no + 1
       |  CROSS JOIN (VALUES ('c', '${seedTag}_c:'), ('b', '${seedTag}_b:'),
       |    ('r', '${seedTag}_r:')) t(tag, pfx)),
       |${DuckDbXxHash.xxh64Ctes("keys", "s", "hh", idCols = "doc_id, pos, tag")},
       |bkt AS MATERIALIZED (
       |  SELECT sg.doc_id, sg.seg_no, sg.seg,
       |         ${pm("h.h64", negBuckets.toString)} AS nbucket
       |  FROM segs sg JOIN hh h
       |    ON h.tag = 't' AND h.doc_id = sg.doc_id AND h.pos = sg.seg_no),
       |brank AS (
       |  SELECT doc_id, seg_no, seg, nbucket,
       |         row_number() OVER (PARTITION BY nbucket
       |           ORDER BY doc_id, seg_no) - 1 AS nrank
       |  FROM bkt),
       |bsize AS (SELECT nbucket, count(*) AS nbsize FROM bkt GROUP BY 1),
       |dec AS (
       |  SELECT doc_id, pos,
       |         max(CASE WHEN tag = 'c' THEN h64 END) AS hc,
       |         max(CASE WHEN tag = 'b' THEN h64 END) AS hb,
       |         max(CASE WHEN tag = 'r' THEN h64 END) AS hr
       |  FROM hh WHERE tag <> 't' GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.doc_id, a.seg_no AS pos, a.seg AS seg_a,
       |         b.seg AS seg_next
       |  FROM segs a JOIN segs b
       |    ON b.doc_id = a.doc_id AND b.seg_no = a.seg_no + 1),
       |pick AS (
       |  SELECT p.doc_id, p.pos, p.seg_a, p.seg_next,
       |         ${pm("d.hc", "2")} = 1 AS is_next,
       |         ${pm("d.hb", negBuckets.toString)} AS nbucket, d.hr
       |  FROM pairs p JOIN dec d USING (doc_id, pos)),
       |pick2 AS (
       |  SELECT pk.*, ${pm("pk.hr", "z.nbsize")} AS nrank
       |  FROM pick pk JOIN bsize z USING (nbucket))
       |SELECT p2.doc_id, p2.pos, p2.seg_a,
       |       CASE WHEN p2.is_next THEN p2.seg_next ELSE br.seg END AS seg_b,
       |       p2.is_next
       |FROM pick2 p2 JOIN brank br USING (nbucket, nrank)""".stripMargin
  }
}
