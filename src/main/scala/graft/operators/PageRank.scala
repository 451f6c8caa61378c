package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer micros — graph centrality for
  * "which nodes are representative/authoritative" selection (e.g. central
  * documents in a similarity graph, hub parts in a co-purchase graph).
  *
  * Determinism is the point: ranks are BIGINT micros, every step is
  * integer division with an explicit floor spelling, so re-runs — and the
  * DuckDB oracle — reproduce ranks bit-for-bit. The damping update
  * `floor(s * damp / 1e6)` is computed as
  * `(s div 1e6) * damp + ((s mod 1e6) * damp) div 1e6` — the exact same
  * value by the Euclidean split identity, but the intermediate products
  * stay below 2^63 for any per-node contribution sum `s` up to ~9.2e18
  * micros (a node would need ~10^13 full-rank in-neighbors to overflow).
  *
  * Shape per iteration: edges-with-outdeg join ranks on src (one hash
  * join), groupBy dst (one exchange with map-side partial sums), left
  * join back to the node set. The edge relation and node set are persisted
  * once across all iterations and released when the final ranks
  * materialize; the whole run is `iters` chained exchange rounds — the
  * standard scalable PageRank plan, no driver-side state.
  *
  * Measured rejection — adjacency packing (the GraphX-style one
  * (src, outdeg, dsts[]) row per source, iterating by node-sized join +
  * explode): a clear win at sf0.1 (4.8 vs 6.3 s best-of-3) but 15-25%
  * SLOWER at the 100x one-JVM probe across two independent samples
  * (196.7 / 213.8 vs 172.7 s best-of-3) — the collect_list build is an
  * ObjectHashAggregate over the full edge mass and the per-iteration
  * array explode trades the cached SMJ scan for generator+GC pressure.
  * Scale behavior wins the tie; the edge-relation spelling stays.
  *
  * Dangling mass: nodes with no out-edges keep receiving the base term but
  * redistribute nothing (the common simplification; symmetrize the edge
  * relation upstream if the graph is undirected, which also removes
  * dangling nodes entirely).
  */
object PageRank {

  /** Node-count ceiling for the broadcast iteration plan: below it the
    * node-sized relations (out-degrees, per-iteration contribution sums)
    * ride broadcasts and the edge cache is clustered by `dst`, so each
    * iteration is one streamed cache scan + one node-sized exchange —
    * no edge-mass shuffle at all. 4M nodes is ~100 MB of hash relation
    * per executor, well under the working memory the shuffles it
    * replaces would use; above it the shuffled plan (edge cache
    * clustered by `src`, contribs exchanged to it) is the scale-safe
    * shape. */
  val BroadcastMaxNodes = 4000000L

  /** @param broadcastMaxNodes node-count ceiling for the broadcast plan
    *        ([[BroadcastMaxNodes]]); 0 forces the shuffled plan (test
    *        hook — PageRankSpec pins both plans bit-identical) */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 3, dampMicros: Long = 850000L,
            broadcastMaxNodes: Long = BroadcastMaxNodes): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampMicros >= 0 && dampMicros <= 1000000L,
      "dampMicros must be in [0, 1e6]")
    val base = 1000000L - dampMicros

    // The incoming edge relation may be arbitrarily expensive (a distinct
    // over a self-join, an LSH candidate build); it feeds THREE consumers
    // here (degrees, the join relation, the node set), so persist it or
    // pay its lineage once per consumer.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    // the node count gates the broadcast plan; the count action
    // materializes the node-set cache the FINAL join reuses, so it costs
    // one scheduling round, not an extra pipeline run
    val nNodes = nodes.count()
    val useBc = nNodes <= broadcastMaxNodes
    val deg0 = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val deg = if (useBc) broadcast(deg0) else deg0
    // (src, dst, outdeg): the relation every iteration joins against.
    // Broadcast plan: clustered by DST, so the per-iteration partial
    // aggregation of contributions collapses each dst inside its own
    // partition and the iteration's one exchange is node-sized — under
    // the src-clustering a dense graph puts nearly every dst in every
    // map partition and the "partial" aggregation shuffles close to the
    // full contribution mass (measured 600 MB/iteration at 100x).
    val withDeg =
      if (useBc) e.join(deg, "src").repartition(col("dst")).persist()
      else e.join(deg, "src").persist()

    // rank_micros = base + floor(s * damp / 1e6) with s the node's summed
    // in-contributions (0 when absent) — the exact Euclidean-split damping
    // from the object scaladoc, applied to a possibly-NULL sum
    val rankExpr =
      s"$base + (coalesce(s, 0L) div 1000000) * $dampMicros" +
        s" + ((coalesce(s, 0L) % 1000000) * $dampMicros) div 1000000"

    // Iterate on the CONTRIBUTION-SUM relation, not the rank relation:
    // a node absent from `contrib` has rank exactly `base` (a constant),
    // so the per-iteration "left-join every node, default the sum to 0"
    // step is folded into the NEXT iteration's src join as a left join +
    // coalesce — same values by construction, one join and one node-set
    // cache scan fewer per iteration. Iteration 1's uniform rank of 1e6
    // needs no join at all. The rank relation itself is materialized once,
    // at the end, by the final nodes left join.
    var contrib = withDeg
      .select(col("dst").as("node"),
        expr("1000000 div outdeg").as("c"))
      .groupBy("node").agg(sum("c").as("s"))
    for (_ <- 2 to iters) {
      // broadcast plan: the node-sized contribution sums ship to the
      // streamed edge cache — the join needs no exchange on either side
      val prev0 = contrib.withColumnRenamed("node", "src")
      val prev = if (useBc) broadcast(prev0) else prev0
      contrib = withDeg
        .join(prev, Seq("src"), "left")
        .select(col("dst").as("node"),
          expr(s"($rankExpr) div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
    }
    val lastContrib =
      if (useBc) broadcast(contrib) else contrib
    val ranks = nodes.join(lastContrib, Seq("node"), "left")
      .select(col("node"), expr(rankExpr).as("rank_micros"))
    // node-sized materialization cuts the iters-deep lineage and lets the
    // persisted edge/node caches release deterministically
    if (graft.util.PlanCapture.enabled) ranks
    else {
      val out = ranks.localCheckpoint(true)
      e.unpersist()
      withDeg.unpersist()
      nodes.unpersist()
      out
    }
  }

  /** Undirected convenience: symmetrize `u—v` pairs then rank.
    *
    * PRECONDITION: `pairs` must hold DISTINCT UNORDERED pairs — one row per
    * undirected edge (e.g. normalized `least/greatest` + distinct, as the
    * co-order caller does). A pair appearing twice, or in both
    * orientations, is treated as a MULTIGRAPH edge: its endpoint
    * out-degrees and rank contributions double. That is the standard
    * weighted-multigraph semantics, not an error the operator can detect
    * without paying an extra corpus-sized `distinct()` exchange every
    * caller with clean input would waste — so the contract lives here. */
  def ranksUndirected(pairs: DataFrame, aCol: String, bCol: String,
                      iters: Int = 3, dampMicros: Long = 850000L): DataFrame = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val rev = pairs.select(col(bCol).as("src"), col(aCol).as("dst"))
    ranks(fwd.union(rev), "src", "dst", iters, dampMicros)
  }
}
