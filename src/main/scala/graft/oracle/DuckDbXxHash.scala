package graft.oracle

/** Generates inline DuckDB SQL that replays Spark's `xxhash64` (XXH64,
  * seed 42) over a string column BYTE-EXACTLY — the key that unlocks
  * hash-gating the MinHash/SimHash dedup family: their outputs are
  * fully deterministic functions of the shingle/word hashes, so once
  * the oracle engine can reproduce the base hash, the entire pipeline
  * (affine permutations, banding, estimator, components) is plain SQL.
  *
  * Arithmetic strategy: all state is kept in [0, 2^64) as UBIGINT;
  * every multiply/add routes through UHUGEINT (128-bit) and reduces
  * `% 2^64` — DuckDB has no wrapping 64-bit ops, and (2^64-1)^2
  * overflows signed HUGEINT, so the unsigned 128-bit type is load-
  * bearing. Rotations are `(x·2^k mod 2^64) + (x div 2^(64-k))` (the
  * two parts occupy disjoint bits). UTF-8 bytes come from codepoint
  * expansion (RFC 3629), so non-ASCII text hashes correctly too.
  *
  * The construction was validated byte-for-byte against Spark 4.1's
  * `xxhash64` on empty/short/8-aligned/32-stripe/non-ASCII strings
  * before being committed here; the standing cross-engine guarantee is
  * the driver's hash gate on q43/q44/q54/q90.
  */
object DuckDbXxHash {

  private val M = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261" // 0x27D4EB2F165667C5

  /** Signed (Spark long) view of an `h64`-style UBIGINT expression,
    * as HUGEINT — THE conversion every oracle that compares or mods
    * Spark's signed xxhash64 must apply; shared so the replay
    * convention cannot drift between call sites.
    */
  def signedSql(col: String): String =
    s"(CAST($col AS HUGEINT) - CASE WHEN $col >= 9223372036854775808 " +
      s"THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END)"

  private def u(x: String) = s"CAST($x AS UHUGEINT)"
  private def mul(a: String, b: String) = s"((${u(a)} * ${u(b)}) % $M)"
  private def add(a: String, b: String) = s"((${u(a)} + ${u(b)}) % $M)"
  private def rotl(x: String, k: Int) =
    s"(((${u(x)} * ${1L << k}) % $M) + (${u(x)} // ${BigInt(1) << (64 - k)}))"
  private def shr(x: String, k: Int) = s"(${u(x)} // ${1L << k})"
  private def xor(a: String, b: String) =
    s"xor(CAST($a AS UBIGINT), CAST($b AS UBIGINT))"

  // h = rotl(h ^ (rotl(w*P2,31)*P1), 27)*P1 + P4
  private def wordStep(h: String, w: String) =
    add(mul(rotl(xor(h, mul(rotl(mul(w, P2), 31), P1)), 27), P1), P4)
  // h = rotl(h ^ (b*P5), 11)*P1
  private def byteStep(h: String, b: String) =
    mul(rotl(xor(h, mul(b, P5)), 11), P1)
  // v = rotl(v + w*P2, 31)*P1
  private def stripeStep(v: String, w: String) =
    mul(rotl(add(v, mul(w, P2)), 31), P1)

  /** CTE chain (names x0..xd + `outCte`) computing `xxhash64(col)` for
    * every row of `srcCte`. The result CTE has columns `idCols`, `s`
    * (the input string) and `h64` (UBIGINT; Spark's signed long has the
    * same 64-bit pattern). Splice into a `WITH` list.
    */
  def xxh64Ctes(srcCte: String, col: String, outCte: String,
      seed: Long = 42L, idCols: String = "id"): String = {
    def leWord(base8: String): String =
      (0 until 8).map(i => s"CAST(bs[$base8+${i + 1}] AS UBIGINT) * ${1L << (8 * i)}")
        .mkString(" + ")
    def le4(base8: String): String =
      (0 until 4).map(i => s"CAST(bs[$base8+${i + 1}] AS UBIGINT) * ${1L << (8 * i)}")
        .mkString(" + ")
    val sd = seed.toString
    s"""x0 AS (  -- UTF-8 bytes of the string (codepoints expanded per RFC 3629)
       |  SELECT $idCols, $col AS s,
       |    flatten(list_transform(range(1, length($col)+1), i ->
       |      CASE WHEN unicode($col[i]) < 128 THEN [unicode($col[i])]
       |           WHEN unicode($col[i]) < 2048 THEN
       |             [192 + unicode($col[i]) // 64, 128 + unicode($col[i]) % 64]
       |           WHEN unicode($col[i]) < 65536 THEN
       |             [224 + unicode($col[i]) // 4096,
       |              128 + (unicode($col[i]) // 64) % 64,
       |              128 + unicode($col[i]) % 64]
       |           ELSE [240 + unicode($col[i]) // 262144,
       |              128 + (unicode($col[i]) // 4096) % 64,
       |              128 + (unicode($col[i]) // 64) % 64,
       |              128 + unicode($col[i]) % 64] END)) AS bs
       |  FROM $srcCte),
       |x1 AS (SELECT $idCols, s, bs, len(bs) AS n, len(bs) // 8 AS nw,
       |              CASE WHEN len(bs) >= 32 THEN (len(bs) // 32) * 4 ELSE 0 END AS s4
       |       FROM x0),
       |x2 AS (  -- all full 8-byte little-endian words
       |  SELECT *, list_transform(range(0, nw), j -> ${leWord("8*j")}) AS w8 FROM x1),
       |x3 AS (  -- stripe fold (n >= 32): 4 interleaved accumulators
       |  SELECT *, CASE WHEN n >= 32 THEN
       |    list_reduce(
       |      list_prepend(
       |        {'a': CAST(${add(add(sd, P1), P2)} AS UBIGINT),
       |         'b': CAST(${add(sd, P2)} AS UBIGINT),
       |         'c': CAST($sd AS UBIGINT),
       |         'd': CAST(${add(sd, s"($M - $P1)")} AS UBIGINT)},
       |        list_transform(range(0, s4 // 4), t ->
       |          {'a': w8[4*t+1], 'b': w8[4*t+2], 'c': w8[4*t+3], 'd': w8[4*t+4]})),
       |      (v, w) -> {'a': CAST(${stripeStep("v.a", "w.a")} AS UBIGINT),
       |                 'b': CAST(${stripeStep("v.b", "w.b")} AS UBIGINT),
       |                 'c': CAST(${stripeStep("v.c", "w.c")} AS UBIGINT),
       |                 'd': CAST(${stripeStep("v.d", "w.d")} AS UBIGINT)})
       |    ELSE NULL END AS vs FROM x2),
       |x4 AS (  -- merge the 4 accumulators, or seed+P5 for short inputs
       |  SELECT *, CASE WHEN n >= 32 THEN
       |      ${add(add(add(rotl("vs.a", 1), rotl("vs.b", 7)), rotl("vs.c", 12)), rotl("vs.d", 18))}
       |    ELSE ${add(sd, P5)} END AS h0 FROM x3),
       |x5 AS (SELECT *, CASE WHEN n >= 32 THEN
       |      ${add(mul(xor("h0", mul(rotl(mul("vs.a", P2), 31), P1)), P1), P4)}
       |    ELSE h0 END AS h1 FROM x4),
       |x6 AS (SELECT *, CASE WHEN n >= 32 THEN
       |      ${add(mul(xor("h1", mul(rotl(mul("vs.b", P2), 31), P1)), P1), P4)}
       |    ELSE h1 END AS h2 FROM x5),
       |x7 AS (SELECT *, CASE WHEN n >= 32 THEN
       |      ${add(mul(xor("h2", mul(rotl(mul("vs.c", P2), 31), P1)), P1), P4)}
       |    ELSE h2 END AS h3 FROM x6),
       |x8 AS (SELECT *, CASE WHEN n >= 32 THEN
       |      ${add(mul(xor("h3", mul(rotl(mul("vs.d", P2), 31), P1)), P1), P4)}
       |    ELSE h3 END AS h4 FROM x7),
       |x9 AS (  -- + length, then remaining 8-byte words after the stripes
       |  SELECT *, list_reduce(
       |      list_prepend(CAST(${add("h4", "n")} AS UBIGINT),
       |                   w8[s4+1:nw]),
       |      (h, w) -> CAST(${wordStep("h", "w")} AS UBIGINT)) AS h5 FROM x8),
       |xa AS (  -- optional 4-byte chunk
       |  SELECT *, CASE WHEN n % 8 >= 4 THEN
       |      ${add(mul(rotl(xor("h5", mul(le4("8*nw"), P1)), 23), P2), P3)}
       |    ELSE h5 END AS h6,
       |    CASE WHEN n % 8 >= 4 THEN 8*nw + 4 ELSE 8*nw END AS tail0 FROM x9),
       |xb AS (  -- tail bytes
       |  SELECT *, list_reduce(
       |      list_prepend(CAST(h6 AS UBIGINT), bs[tail0+1:n]),
       |      (h, b) -> CAST(${byteStep("h", "b")} AS UBIGINT)) AS h7 FROM xa),
       |xc AS (SELECT *, ${mul(xor("h7", shr("h7", 33)), P2)} AS f1 FROM xb),
       |xd AS (SELECT *, ${mul(xor("f1", shr("f1", 29)), P3)} AS f2 FROM xc),
       |$outCte AS (SELECT $idCols, s, CAST(${xor("f2", shr("f2", 32))} AS UBIGINT) AS h64 FROM xd)""".stripMargin
  }
}
