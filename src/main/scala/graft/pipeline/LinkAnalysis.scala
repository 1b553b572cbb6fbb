package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph scoring for crawl curation — the PageRank-class quality
  * signal web-scale corpora rank domains/pages with (CommonCrawl
  * publishes harmonic centrality for exactly this use).
  *
  * The iteration is FIXED-POINT integer arithmetic end-to-end: ranks
  * are scaled longs, per-edge contributions use exact integral
  * division (`div`), and the damping update is `(85·Σ) div 100` — so
  * the whole T-iteration trajectory replays bit-identically in any
  * engine with integral division, and the operator hash-gates against
  * an unrolled DuckDB oracle (the BPE-replay precedent). A float
  * PageRank would be rows-only forever; the integer form loses at
  * most 1e-6 of relative precision per step at the default scale —
  * irrelevant for ranking.
  *
  * Scale shape: one join edges⋈ranks per iteration shuffling by src
  * then dst (both map-side combinable on the dst aggregation), ranks
  * localCheckpoint'ed per iteration to cut lineage (the GdMf epoch
  * lesson). Edges with duplicate (src, dst) pairs count as parallel
  * edges. Deliberate, documented divergence from the probabilistic
  * formulation: dangling-node mass is DROPPED, not redistributed —
  * each iteration is still a monotone contraction toward the damping
  * floor, and the redistribution term would cost a full extra
  * aggregate per iteration for a constant that cancels in ranking.
  */
object LinkAnalysis {

  /** (node, rank_fp) after `iterations` damped power-iteration steps
    * over `edges` (src, dst) restricted to `nodes` (node). rank_fp is
    * scaled by `scale` (initial rank = scale per node).
    */
  def pageRankFixed(edges: DataFrame, nodes: DataFrame,
      iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    // CHECKPOINT (not just persist) both relations the loop re-reads:
    // edges (joined every iteration) and the node set (the left side
    // of every damping update). A cache alone skips re-EXECUTION, but
    // every iteration's action still re-analyzes and re-optimizes the
    // relations' full expression trees — with an expensive derivation
    // (the ~700-rule PSL domain expression feeding the q137 crawl
    // graph) that driver-side walk dominated the whole query (measured
    // 143 s → 16 s for 5 iterations over a 42-domain graph).
    // Checkpointing truncates both to block-backed leaves.
    import org.apache.spark.sql.graftbridge.DatasetBridge
    // every checkpoint AFTER the first is created inside the try so a
    // failure materializing it (checkpointing is eager) still releases
    // the ones already holding blocks — stranding them would leak
    // edge-sized block state for the session's lifetime
    val nCp = DatasetBridge.localCheckpointFresh(nodes.select(col("node")))
    var eCp: DatasetBridge.FreshCheckpoint = null
    var cur: DatasetBridge.FreshCheckpoint = null
    var done = false
    try {
      val n = nCp.df
      val out = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      eCp = DatasetBridge.localCheckpointFresh(edges.join(out, "src")
        .select(col("src"), col("dst"), col("outdeg")))
      val e = eCp.df
      val base = scale * (100 - dampingPct) / 100
      // localCheckpointFresh, not Dataset.localCheckpoint: the per-
      // iteration cut must not inherit (and geometrically compound) the
      // previous leaf's stats, and each retired iteration's blocks are
      // released — the GdMf epoch-loop lessons apply verbatim here
      cur = DatasetBridge.localCheckpointFresh(
        n.select(col("node"), lit(scale).as("rank_fp")))
      for (_ <- 1 to iterations) {
        val ranks = cur.df
        val contrib = e.join(ranks, e("src") === ranks("node"))
          .select(col("dst").as("node"),
            expr("rank_fp div outdeg").as("c"))
          .groupBy("node").agg(sum(col("c")).as("s"))
        val next = DatasetBridge.localCheckpointFresh(n
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(base) +
              expr(s"($dampingPct * coalesce(s, 0L)) div 100"))
              .as("rank_fp")))
        cur.release()
        cur = next
      }
      done = true
      // the final iteration's blocks back the returned frame; they are
      // node-count-sized and live until the session drops them
      cur.df
    } finally {
      if (eCp != null) eCp.release()
      nCp.release()
      // a mid-loop failure must not strand the current iteration's
      // checkpoint blocks for the session's lifetime
      if (!done && cur != null) cur.release()
    }
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the second classic
    * link-centrality signal (PageRank measures endorsement mass; HITS
    * separates DIRECTORY pages, which point at good content, from
    * AUTHORITY pages, which good directories point at — crawl
    * curation wants authorities, seed-list construction wants hubs).
    *
    * Fixed-point like [[pageRankFixed]]: per iteration, authority =
    * Σ incoming hub scores then hub = Σ outgoing authority scores,
    * each MAX-normalized back to `scale` with exact integral division
    * (`(raw · scale) div max` — the standard max-norm variant; the
    * usual L2 norm would force floats and the trajectory would stop
    * hash-gating). Normalization is a 1-row aggregate broadcast back
    * into the plan — no per-iteration driver collect.
    *
    * Scale shape: two edge⋈score joins + two map-side-combinable sum
    * aggregations per iteration, scores checkpointed per generation
    * (the GdMf/pageRank lineage discipline). Overflow bound: raw ≤
    * maxdegree·scale, and raw·scale must stay under 2⁶³ — at the
    * default scale 10⁶ that allows degree ≤ ~9·10⁶; shrink `scale`
    * for denser graphs.
    *
    * @return (node, auth_fp, hub_fp) after `iterations` rounds.
    */
  def hitsFixed(edges: DataFrame, nodes: DataFrame,
      iterations: Int = 5, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1,50], got $iterations")
    require(scale > 0, s"scale must be positive, got $scale")
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val nCp = DatasetBridge.localCheckpointFresh(nodes.select(col("node")))
    var eCp: DatasetBridge.FreshCheckpoint = null
    var hub: DatasetBridge.FreshCheckpoint = null
    var auth: DatasetBridge.FreshCheckpoint = null
    var done = false
    try {
      val n = nCp.df
      eCp = DatasetBridge.localCheckpointFresh(
        edges.select(col("src"), col("dst")))
      val e = eCp.df
      // one generic normalized-propagation step: scores flow across
      // `e` from `fromCol` to `toCol`, sum per target, max-normalize
      def step(scores: DataFrame, scoreCol: String,
          fromCol: String, toCol: String, outCol: String): DataFrame = {
        val raw = n.join(
          e.join(scores, e(fromCol) === scores("node"))
            .select(col(toCol).as("node"), col(scoreCol))
            .groupBy("node").agg(sum(col(scoreCol)).as("s")),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("s"), lit(0L)).as("raw"))
        val m = raw.agg(greatest(max(col("raw")), lit(1L)).as("m"))
        raw.crossJoin(broadcast(m))
          .select(col("node"),
            expr(s"(raw * $scale) div m").as(outCol))
      }
      hub = DatasetBridge.localCheckpointFresh(
        n.select(col("node"), lit(scale).as("hub_fp")))
      for (_ <- 1 to iterations) {
        val aNew = DatasetBridge.localCheckpointFresh(
          step(hub.df, "hub_fp", "src", "dst", "auth_fp"))
        if (auth != null) auth.release()
        auth = aNew
        val hNew = DatasetBridge.localCheckpointFresh(
          step(auth.df, "auth_fp", "dst", "src", "hub_fp"))
        hub.release()
        hub = hNew
      }
      done = true
      auth.df.join(hub.df, Seq("node"))
        .select(col("node"), col("auth_fp"), col("hub_fp"))
    } finally {
      if (eCp != null) eCp.release()
      nCp.release()
      if (!done) {
        if (hub != null) hub.release()
        if (auth != null) auth.release()
      }
    }
  }
}
