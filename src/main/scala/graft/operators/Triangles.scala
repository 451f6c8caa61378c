package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting over an undirected graph — the clustering
  * primitive for near-dup/co-occurrence graphs (local clustering
  * coefficient numerators, community seeds).
  *
  * Algorithm: degree-ordered edge orientation (Cohen / node-iterator++).
  * Every edge is directed from its (degree, id)-smaller endpoint to the
  * larger; wedges are enumerated by self-joining the ORIENTED adjacency
  * on the source, and a wedge (s -> d1, s -> d2) closes iff the oriented
  * edge d1 -> d2 exists. Each triangle has exactly one vertex with
  * out-edges to the other two under this order, so it is found once —
  * no /3 correction, no duplicate elimination.
  *
  * Why this scales where the naive triple-join doesn't: out-degree under
  * degree ordering is bounded by O(sqrt(m)) regardless of skew — a
  * celebrity node of degree 1M contributes not 10^12 wedges but only
  * wedges among its FEW higher-degree neighbors. The wedge relation
  * (the big intermediate) is sum of out-degree^2 <= m^1.5, the known
  * optimum for exact triangle enumeration. All three joins are BIGINT
  * equi-joins (composite keys for the closing join), shuffled on node
  * ids — no broadcast of anything graph-sized.
  */
object Triangles {

  /** @param edges undirected edge list; self-loops dropped, duplicates and
    *               orientation normalized away
    * @param bloomBits -1 (default): auto-size a `graft_bloom_agg` sketch of
    *               the oriented edge set at ~10 bits/edge (clamped to
    *               [2^20, 2^27]; skipped entirely when the edge set
    *               outgrows the 16 MiB cap) and drop non-closing wedges
    *               INSIDE the wedge-generation stage, before they reach
    *               the closing join's exchange — the wedge shuffle is the
    *               operator's bottleneck and most wedges of a sparse graph
    *               do not close. A FIXED size would silently saturate on a
    *               larger graph (fp -> 1: all sketch cost, no prune —
    *               measured as a 2x regression at 10x before auto-sizing).
    *               > 0: explicit size; 0: prune off. False positives are
    *               re-checked by the exact join; false negatives are
    *               impossible, so results are bit-identical (TrianglesSpec
    *               asserts both paths agree).
    * @return (node, n_triangles), one row per node in >= 1 triangle
    */
  def perNode(edges: DataFrame, uCol: String, vCol: String,
      bloomBits: Int = -1, bloomHashes: Int = 5): DataFrame = {
    val e = edges
      .select(least(col(uCol), col(vCol)).as("u"),
        greatest(col(uCol), col(vCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // orient each edge from the (degree, id)-smaller endpoint to the
    // larger; persisted — it feeds the two wedge arms, the closing join,
    // and the bloom sketch (recomputing runs the degree joins four times)
    val oriented = e
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("dv"))
          .otherwise(col("du")).as("ddst"))
      .persist()

    // wedges from each source, ordered within the oriented order so the
    // closing edge is looked up in its stored direction
    val a1 = oriented.select(col("src"), col("dst").as("d1"), col("ddst").as("dd1"))
    val a2 = oriented.select(col("src"), col("dst").as("d2"), col("ddst").as("dd2"))
    val wedges = a1.join(a2, "src")
      .where(col("dd1") < col("dd2") ||
        (col("dd1") === col("dd2") && col("d1") < col("d2")))

    val spark = edges.sparkSession
    val maxBits = 1 << 27 // 16 MiB blob cap — past this, prune off
    val bits: Long =
      if (bloomBits > 0) bloomBits.toLong
      else if (bloomBits == 0) 0L
      else {
        // auto: ~10 bits/edge over the persisted relation (count is cheap)
        val target = oriented.count() * 10
        if (target > maxBits) 0L
        else math.max(1L << 20, java.lang.Long.highestOneBit(target - 1) << 1)
      }
    val prunedWedges =
      if (bits > 0 && spark.catalog.functionExists("graft_bloom_agg")) {
        val blob = oriented
          .agg(call_function("graft_bloom_agg",
            xxhash64(col("src"), col("dst")), lit(bits.toInt), lit(bloomHashes)))
          .head().getAs[Array[Byte]](0)
        // The sketch MUST reach the probe as a plan literal, never as a
        // joined-in attribute: codegen materializes a BINARY attribute with
        // UnsafeRow.getBinary, which copies the whole multi-MiB blob ON
        // EVERY ROW (measured: a broadcast 1-row relation turned this 4 s
        // query into a >90-CPU-minute memcpy storm at sf0.1). A literal is
        // a shared constant in the codegen references array — zero per-row
        // cost — and task binaries are themselves TorrentBroadcast, so the
        // blob still ships once per executor; the only per-task overhead is
        // deserialization, bounded by the 16 MiB cap.
        wedges.where(call_function("graft_might_contain",
          lit(blob), xxhash64(col("d1"), col("d2"))))
      } else wedges

    val closing = oriented.select(col("src").as("d1"), col("dst").as("d2"))
    val triangles = prunedWedges.join(closing, Seq("d1", "d2"))

    val result = triangles
      .select(explode(array(col("src"), col("d1"), col("d2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    // the per-node aggregate is tiny next to the wedge relation: materialize
    // it eagerly (cutting lineage) so the big persisted intermediate can be
    // released deterministically instead of leaking across invocations
    val out = result.localCheckpoint(true)
    oriented.unpersist()
    out
  }
}
