package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * C89: distributed PAGERANK — weighted random-walk centrality over an edge
 * frame, the link-graph quality signal web-corpus curation uses for seed
 * selection (Common Crawl ranks domains by link centrality and curation
 * pipelines treat that rank as a quality prior; reference pipelines score
 * "is this domain worth crawling/keeping" from exactly this computation).
 *
 * Spark-first shape: each round is ONE co-partitioned join + ONE
 * bounded-key aggregation — `contrib = edges ⋈ rank on src` shuffles on
 * src, the sum groups by dst, and the new rank left-joins back to the node
 * frame. No Pregel runtime, no driver-side graph: the rank frame IS the
 * state, `localCheckpoint(eager)` truncates lineage each round (the
 * suffix-doubling / k-means convention), so K rounds cost K bounded
 * shuffles at any graph size and driver state is zero.
 *
 * Exact integer fixed-point so the DuckDB oracle replays every round:
 * ranks are ppb-scaled longs (init = `scale` per node), each edge
 * contributes `r·w div wt` (truncating division, per-edge — the sum is
 * order-independent), and the damped update is
 * `((100−d)·scale + d·Σ contrib) div 100`. Overflow margin: total walk
 * mass stays ≈ N·scale, so a single hub rank < N·scale; with
 * N·scale·max(w) < 2⁶³ the products are safe (documented, ~1e16 at the
 * 100k-node purchase graph vs 9.2e18).
 *
 * Dangling nodes: callers symmetrize or otherwise guarantee every node
 * has out-edges (a node set = distinct srcs by construction); the damping
 * teleport keeps the chain irreducible either way.
 */
object Rank {

  /** @param edges (src: long, dst: long, w: long) — every node must appear
    *              as a src (symmetrize bipartite/undirected graphs first).
    * @return (node, r) — fixed-point rank after `iters` damped rounds. */
  def pageRank(edges: DataFrame, iters: Int = 6, dampingPct: Int = 85,
               scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val wsum = edges.groupBy("src").agg(sum(col("w")).as("wt"))
    val ed = edges.join(wsum, "src").localCheckpoint(true)
    val nodes = ed.select(col("src").as("node")).distinct().localCheckpoint(true)
    var r = nodes.select(col("node"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(r, ed("src") === r("node"))
        .select(ed("dst").as("node"), expr("r * w div wt").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"(${100 - dampingPct} * ${scale}L + $dampingPct * coalesce(s, 0L)) div 100")
            .as("r"))
        .localCheckpoint(true)
    }
    r
  }
}
