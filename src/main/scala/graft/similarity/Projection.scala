package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-projection dimensionality reduction for embedding columns —
  * the cheap pre-ANN shrink (Johnson–Lindenstrauss; Achlioptas 2003
  * showed ±1 sign matrices suffice). y_k = Σ_j s(j,k) · x_j with
  * s(j,k) ∈ {+1, −1}.
  *
  * Determinism design: the sign matrix is NOT an RNG draw — each
  * s(j,k) is the parity of xxhash64("{seedTag}:j:k"), so any engine
  * (and the DuckDB oracle) reconstructs the identical matrix from the
  * tag alone. Inputs fix-point to floor(x·1e6) BEFORE the fold, making
  * the projection pure integer arithmetic — exact cross-engine, no
  * float-sum ordering hazard. The uniform 1/√dOut scale is omitted:
  * downstream cosine/top-k ranking is scale-invariant.
  *
  * Scale posture: the sign matrix is evaluated once on a dIn×dOut
  * range relation (a bounded artifact — 1024 cells for 64→16) and
  * inlined as a LITERAL, so the per-row projection is a map-only
  * codegen'd integer fold with zero shuffles and no per-row hashing;
  * at 100 TB the scan stays the only cost.
  */
object Projection {

  /** The hash-derived ±1 sign matrix, indexed [j][k] — evaluated with
    * Spark's own xxhash64 so the replay convention cannot drift from
    * the oracle's.
    */
  def signMatrix(spark: SparkSession, dIn: Int, dOut: Int,
      seedTag: String = "rp"): Array[Array[Long]] = {
    require(dIn > 0 && dOut > 0, s"need positive dims, got $dIn x $dOut")
    val cells = spark.range(dIn.toLong).select(col("id").as("j"))
      .crossJoin(spark.range(dOut.toLong).select(col("id").as("k")))
      .select(col("j"), col("k"),
        (lit(1L) - lit(2L) * pmod(xxhash64(concat(lit(s"$seedTag:"),
          col("j"), lit(":"), col("k"))), lit(2L))).as("s"))
      .collect()
    val m = Array.fill(dIn, dOut)(0L)
    cells.foreach(r => m(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
    m
  }

  /** Project `embCol` (array<float>, length ≤ `dIn`) to `dOut` integer
    * components: one output row per (id, k) with
    * y_fp = Σ_j s(j,k) · floor(x_j · 1e6). Vectors shorter than dIn
    * contribute only their present elements (the fold runs over the
    * actual array); longer vectors error (ANSI element_at — fail loud,
    * not silently truncated); null vectors yield no rows.
    */
  def project(embs: DataFrame, idCol: String, embCol: String,
      dIn: Int, dOut: Int, seedTag: String = "rp"): DataFrame = {
    val m = signMatrix(embs.sparkSession, dIn, dOut, seedTag)
    val mLit = typedLit(m.map(_.toSeq).toSeq)
    val proj = transform(sequence(lit(0), lit(dOut - 1)), k =>
      aggregate(
        transform(col(embCol), (x, j) =>
          element_at(element_at(mLit, j + 1), k.cast("int") + 1) *
            floor(x.cast("double") * lit(1000000.0)).cast("long")),
        lit(0L), (acc, el) => acc + el))
    embs.filter(col(embCol).isNotNull)
      .select(col(idCol).as("id"), posexplode(proj).as(Seq("k", "y_fp")))
  }

  /** Two-stage top-k: shortlist by projected integer dot in dOut dims,
    * then exact re-rank of the shortlist by the full fixed-point unit
    * dot — the FAISS "refine" pattern, here with BOTH stages exact
    * integer arithmetic so the whole result hash-gates.
    *
    * The projection is applied to the fixed-point UNIT vectors (the
    * convention every Ann fixed twin shares), so the projected dot is
    * an unbiased ≈ of cosine·1e12·(matrix scale) and ranking by it is
    * the JL shortlist. Overflow-safe: |y| ≤ dIn·1e6 < 2^27, a product
    * sum over dOut stays < 2^59.
    *
    * Scale posture: stage 1 scores n·|queries| pairs in dOut ≪ dIn
    * dims with a BROADCAST query table (corpus never shuffles); stage
    * 2 touches only |queries|·shortlist rows. The per-query
    * row_number windows partition on query_id — |queries|-bounded.
    */
  def projTopKFixed(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, shortlist: Int, dIn: Int, dOut: Int,
      seedTag: String = "rp"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val m = signMatrix(corpus.sparkSession, dIn, dOut, seedTag)
    val mLit = typedLit(m.map(_.toSeq).toSeq)
    def projOf(c: Column) = transform(sequence(lit(0), lit(dOut - 1)), kk =>
      aggregate(
        transform(c, (x, j) =>
          element_at(element_at(mLit, j + 1), kk.cast("int") + 1) * x),
        lit(0L), (acc, el) => acc + el))
    val cor = Ann.unitized(corpus, idCol, vecCol)
      .select(col("id").as("neighbor_id"), Ann.fp(col("uv")).as("vf"))
      .withColumn("pv", projOf(col("vf")))
    val qs = Ann.unitized(queries, qIdCol, qVecCol)
      .select(col("id").as("query_id"), Ann.fp(col("uv")).as("qf"))
      .withColumn("pq", projOf(col("qf")))
    val pScore = aggregate(zip_with(col("pv"), col("pq"), _ * _),
      lit(0L), (acc, el) => acc + el)
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("pscore").desc, col("neighbor_id"))
    val short = cor
      .join(broadcast(qs), col("neighbor_id") =!= col("query_id"))
      .withColumn("pscore", pScore)
      .withColumn("prank", row_number().over(wShort))
      .filter(col("prank") <= shortlist)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_fp").desc, col("neighbor_id"))
    short.withColumn("score_fp", Ann.dotFp(col("vf"), col("qf")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("score_fp"))
  }
}
