package graft.oracle

import graft.dedup.Dedup

/** Generated DuckDB oracles for the MinHash/SimHash near-dup family
  * (q43, q44, q54, q90). These queries are fully deterministic — fixed
  * permutation constants, fixed banding, exact verify — so they are
  * hash-gateable once the oracle engine reproduces Spark's `xxhash64`
  * base hash ([[DuckDbXxHash]]). The permutation constants are read
  * from [[graft.dedup.Dedup.permA]]/[[Dedup.permB]] — the same source
  * the engine expressions use — so engine and oracle can never drift.
  *
  * Banding note: the engine buckets on `xxhash64(band, slice)`
  * ([[Dedup.bandsOf]]); the oracles join on the slice VALUES directly.
  * Equal slices hash equal, so the candidate sets agree up to 64-bit
  * hash collisions between DIFFERENT slices (~2⁻⁶⁴, and any such ghost
  * candidate must still clear the exact/estimator verify).
  */
object MinHashOracles {

  /** Normalized word array of `text` — DuckDB replay of
    * `TextAnalysis.words(TextAnalysis.normalizeText(text))`.
    */
  private val wordsExpr =
    """string_split_regex(trim(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), '\s+')"""

  private def permValues(numPerm: Int): String =
    (0 until numPerm)
      .map(j => s"($j, ${Dedup.permA(j)}, ${Dedup.permB(j)})")
      .mkString(", ")

  private val mask = Dedup.hashMask31 + 1 // 2^31: modulus form of `& mask`

  /** The planted near-dup corpus of q43/q44/q54 (docsWithNearDups). */
  private val nearDupDocs =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' near duplicate suffix marker' FROM documents""".stripMargin

  /** Shared CTE chain: docs → words → distinct k-shingles → per-shingle
    * xxhash64 → 31-bit base hash rows (CTE `shb`: id, shingle, base).
    * `sh` is MATERIALIZED — it feeds the signature AND both exact-verify
    * branches, and DuckDB 1.0 re-inlines multi-referenced CTEs.
    */
  private def shingleBaseCtes(docsSql: String, k: Int): String =
    s"""docs AS ($docsSql),
       |ws AS (SELECT doc_id AS id, $wordsExpr AS w FROM docs),
       |shl AS (
       |  SELECT id, list_distinct(list_transform(range(0, len(w) - $k + 1),
       |           i -> array_to_string(w[i+1:i+$k], ' '))) AS shingles
       |  FROM ws WHERE len(w) >= $k),
       |sh AS MATERIALIZED (
       |  SELECT id, unnest(shingles) AS shingle FROM shl WHERE len(shingles) > 0),
       |dsh AS (SELECT DISTINCT shingle AS s FROM sh),
       |${DuckDbXxHash.xxh64Ctes("dsh", "s", "shh", idCols = "s AS ids")},
       |shb AS MATERIALIZED (
       |  SELECT sh.id, sh.shingle, CAST(shh.h64 % $mask AS BIGINT) AS base
       |  FROM sh JOIN shh ON sh.shingle = shh.s)""".stripMargin

  /** Signature + band CTEs over `shb`: `sig` (id, j, sv) and `bnd`
    * (id, band, bs = ordered 4-slice).
    */
  private def sigBandCtes(numPerm: Int, rowsPerBand: Int): String =
    s"""perms AS (SELECT * FROM (VALUES ${permValues(numPerm)}) AS t(j, a, b)),
       |sig AS MATERIALIZED (
       |  SELECT id, j, min((base * a + b) % $mask) AS sv
       |  FROM shb CROSS JOIN perms GROUP BY 1, 2),
       |bnd AS MATERIALIZED (
       |  SELECT id, j // $rowsPerBand AS band, list(sv ORDER BY j) AS bs
       |  FROM sig GROUP BY 1, 2)""".stripMargin

  /** Shared CTE chain of the q43 family: planted corpus → signatures →
    * band-bucket candidates → exact-Jaccard verify (`jac`: id_a, id_b, j).
    */
  private def q43Ctes(shingleK: Int, bands: Int, rowsPerBand: Int): String = {
    val numPerm = bands * rowsPerBand
    s"""${shingleBaseCtes(nearDupDocs, shingleK)},
       |${sigBandCtes(numPerm, rowsPerBand)},
       |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |         FROM bnd l JOIN bnd r ON l.band = r.band AND l.bs = r.bs AND l.id < r.id),
       |cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT c.id_a, c.id_b, count(*) AS i
       |          FROM cand c JOIN sh a ON a.id = c.id_a
       |                      JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
       |          GROUP BY 1, 2),
       |jac AS (SELECT i.id_a, i.id_b,
       |               CAST(i.i AS DOUBLE) / (ca.n + cb.n - i.i) AS j
       |        FROM inter i JOIN cnt ca ON ca.id = i.id_a JOIN cnt cb ON cb.id = i.id_b)""".stripMargin
  }

  /** q43: MinHash+LSH candidate pairs + exact-Jaccard verify. */
  def q43Sql(shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): String =
    s"""WITH
       |${q43Ctes(shingleK, bands, rowsPerBand)}
       |SELECT id_a, id_b, round(j, 6) AS jaccard FROM jac WHERE j >= $threshold""".stripMargin

  /** q202: connected components over the q43 near-dup pairs —
    * min-reachable-label closure as a recursive CTE. `lab` accumulates
    * (id, label) for every label reachable from id over the symmetrized
    * pair graph; min per id = the component minimum, DuckDB's replay of
    * the large-star/small-star fixed point (`Dedup.clustersStar`).
    */
  def q202Sql(shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): String =
    s"""WITH RECURSIVE
       |${q43Ctes(shingleK, bands, rowsPerBand)},
       |prs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM jac WHERE j >= $threshold AND id_a <> id_b),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM prs
       |  UNION SELECT id_b, id_a FROM prs),
       |lab(id, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, l.label FROM lab l JOIN edges e ON e.src = l.id)
       |SELECT id AS doc_id, min(label) AS cluster_id FROM lab GROUP BY id""".stripMargin

  /** q229: cross-corpus LSH containment (Dedup.containmentPairs) —
    * corpus ∪ (id+500000 benchmark slice = first-half words of every
    * tenth doc) share one shingle/signature/band chain; candidates =
    * corpus-side × bench-side band-bucket join; exact containment
    * i / |shingles(bench)| ≥ threshold.
    */
  def q229Sql(shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.5): String = {
    val numPerm = bands * rowsPerBand
    val docsSql =
      s"""SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 500000,
         |         array_to_string(w[1:greatest(CAST(len(w) // 2 AS INT), 5)],
         |           ' ')
         |  FROM (SELECT doc_id, $wordsExpr AS w FROM documents
         |        WHERE doc_id % 10 = 0)""".stripMargin
    s"""WITH
       |${shingleBaseCtes(docsSql, shingleK)},
       |${sigBandCtes(numPerm, rowsPerBand)},
       |cand AS (SELECT DISTINCT l.id AS id_doc, r.id AS id_bench
       |         FROM bnd l JOIN bnd r ON l.band = r.band AND l.bs = r.bs
       |         WHERE l.id < 500000 AND r.id >= 500000),
       |cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT c.id_doc, c.id_bench, count(*) AS i
       |          FROM cand c JOIN sh a ON a.id = c.id_doc
       |                      JOIN sh b ON b.id = c.id_bench
       |                        AND b.shingle = a.shingle
       |          GROUP BY 1, 2)
       |SELECT i.id_doc AS doc_id, i.id_bench AS bench_id,
       |       round(CAST(i.i AS DOUBLE) / cb.n, 6) AS containment
       |FROM inter i JOIN cnt cb ON cb.id = i.id_bench
       |WHERE CAST(i.i AS DOUBLE) / cb.n >= $threshold""".stripMargin
  }

  /** q44: SimHash chunk-banding candidates + exact-popcount verify. */
  def q44Sql(maxHamming: Int = 3): String = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    s"""WITH
       |docs AS ($nearDupDocs),
       |ws AS (SELECT doc_id AS id, $wordsExpr AS w FROM docs),
       |wo AS (SELECT id, unnest(w) AS word FROM ws WHERE len(w) >= 1),
       |dw AS (SELECT DISTINCT word AS s FROM wo),
       |${DuckDbXxHash.xxh64Ctes("dw", "s", "wh", idCols = "s AS ids")},
       |wob AS (SELECT wo.id, wh.h64 FROM wo JOIN wh ON wo.word = wh.s),
       |bits AS (SELECT id, b, sum(CASE WHEN (h64 >> b) & 1 = 1 THEN 1 ELSE -1 END) AS sm
       |         FROM wob CROSS JOIN (SELECT unnest(range(64)) AS b) GROUP BY 1, 2),
       |sig AS (SELECT id, sum(CASE WHEN sm > 0 THEN CAST(1 AS UBIGINT) << CAST(b AS INT)
       |                            ELSE CAST(0 AS UBIGINT) END) AS sg
       |        FROM bits GROUP BY 1),
       |bnd AS (SELECT id, sg, c,
       |               CAST((sg >> CAST($bitsPer * c AS INT)) & ${(1L << bitsPer) - 1} AS BIGINT) AS cv
       |        FROM sig CROSS JOIN (SELECT unnest(range($chunks)) AS c)),
       |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.sg AS sa, r.sg AS sb
       |         FROM bnd l JOIN bnd r ON l.c = r.c AND l.cv = r.cv AND l.id < r.id),
       |ham AS (SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming FROM cand)
       |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $maxHamming""".stripMargin
  }

  /** q54: q43 pairs → connected components (min label via transitive
    * closure — component sizes are tiny) → one survivor per cluster.
    * `pairs`/`edges` are MATERIALIZED: the recursive closure scans
    * `edges` every iteration and DuckDB 1.0 would otherwise re-inline
    * the whole q43 pipeline into each scan (measured 174 s → 9 s).
    */
  def q54Sql(): String =
    s"""WITH RECURSIVE pairs AS MATERIALIZED (${q43Sql()}),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT a AS id, b AS r FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
       |),
       |labels AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY 1),
       |alldocs AS (
       |  SELECT doc_id FROM documents
       |  UNION ALL SELECT doc_id + 100000 FROM documents)
       |SELECT d.doc_id FROM alldocs d LEFT JOIN labels l ON d.doc_id = l.id
       |WHERE l.cluster_id IS NULL OR l.cluster_id = d.doc_id""".stripMargin

  /** Shared index-probe shape of q90/q95: build a min-owner-per-bucket
    * index over the docs matching `idxPred`, probe the docs matching
    * `probePred` against it (signature-agreement estimator ≥ threshold
    * against the bucket owner, `dup_of` = smallest such owner), and
    * emit one row per doc of `outputDocsSql` left-joined to the
    * verdicts. The split predicates receive the id column reference to
    * range over (the CTE alias differs between the index and probe
    * sides, so plain-string predicates would need fragile rewriting).
    */
  private def indexedProbeSql(corpus: String, idxPred: String => String,
      probePred: String => String, outputDocsSql: String,
      shingleK: Int, bands: Int, rowsPerBand: Int,
      threshold: Double): String = {
    val numPerm = bands * rowsPerBand
    s"""WITH
       |${shingleBaseCtes(corpus, shingleK)},
       |${sigBandCtes(numPerm, rowsPerBand)},
       |idx AS (SELECT band, bs, min(id) AS owner_id
       |        FROM bnd WHERE ${idxPred("id")} GROUP BY 1, 2),
       |hitpairs AS (SELECT DISTINCT b.id, i.owner_id
       |             FROM bnd b JOIN idx i ON b.band = i.band AND b.bs = i.bs
       |             WHERE ${probePred("b.id")}),
       |agree AS (SELECT h.id, h.owner_id,
       |                 sum(CASE WHEN ps.sv = os.sv THEN 1 ELSE 0 END) AS agrees
       |          FROM hitpairs h
       |          JOIN sig ps ON ps.id = h.id
       |          JOIN sig os ON os.id = h.owner_id AND os.j = ps.j
       |          GROUP BY 1, 2),
       |verd AS (SELECT id, min(owner_id) AS dup_of FROM agree
       |         WHERE CAST(agrees AS DOUBLE) / $numPerm >= $threshold GROUP BY 1)
       |SELECT b.doc_id, v.dup_of
       |FROM ($outputDocsSql) b
       |LEFT JOIN verd v ON b.doc_id = v.id""".stripMargin
  }

  /** q90: bucket index over even docs (owner = min id per band bucket),
    * odd batch probed against it — signature-agreement estimator ≥
    * threshold against the bucket owner, `dup_of` = smallest such owner.
    */
  def q90Sql(shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): String = {
    val corpus =
      """SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1""".stripMargin
    indexedProbeSql(corpus, c => s"$c % 2 = 0", c => s"$c % 2 = 1",
      "SELECT doc_id FROM documents WHERE doc_id % 2 = 1",
      shingleK, bands, rowsPerBand, threshold)
  }

  /** q95: the continuous streaming near-dup twin. The stream delivers
    * the corpus as two ordered micro-batches split at the doc_id
    * median (`approxQuantile(0.5, err=0)` — exact, and equal to
    * DuckDB's `quantile_disc` on the dense even-count id fixtures;
    * verified 249/2499 at sf0.01/sf0.1). Batch 0 probes an empty index
    * (all survive, every bucket claimed by its min batch-0 doc);
    * batch 1 probes batch 0's owners under the replay guard
    * (`batch_id < 1` — satisfied by every batch-0 row). Batch-internal
    * duplicates are out of scope by [[graft.streaming.StreamingDedup]]'s
    * contract, so the whole run is exactly one indexed probe: index =
    * docs below the median, probe = docs at/above it, batch-0 rows
    * surface with `dup_of` NULL.
    */
  def q95Sql(shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): String = {
    val mid = "(SELECT quantile_disc(doc_id, 0.5) FROM documents)"
    indexedProbeSql("SELECT doc_id, text FROM documents",
      c => s"$c < $mid", c => s"$c >= $mid",
      "SELECT doc_id FROM documents",
      shingleK, bands, rowsPerBand, threshold)
  }
}
