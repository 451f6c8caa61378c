package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{CandidateFilters, PathAlgebra, Verification}
import graft.sources.MetaFixtures
import graft.sources.MetaFixtures.{cteSql, AsOfMs, DefaultBlockSize, DefaultStaleMs}

/** Driver contract — queries + DuckDB oracles (see SURVEY.md §2, §7).
  *
  * Float determinism across engines: per-row arithmetic stays in DOUBLE
  * (IEEE-deterministic in both engines), then every aggregate is *integerized*
  * — scaled by 1e6, cast to DECIMAL(38,0) (deterministic rounding), summed
  * exactly, and emitted as BIGINT micros. No float ever crosses the
  * hash-compare boundary, so Spark's parallel partial aggregation and
  * DuckDB's sequential sum agree bit-for-bit (DuckDB's DECIMAL->DOUBLE cast
  * is not correctly rounded, so emitting doubles would drift by 1 ULP).
  */
object SparkEntry {

  /** Exact cross-engine aggregation: BIGINT micros (see object Scaladoc). */
  private def msum(c: Column): Column =
    sum((c * lit(1000000.0)).cast(DecimalType(38, 0))).cast("long")
  private def msumSql(e: String): String =
    s"CAST(SUM(CAST(($e) * 1000000.0 AS DECIMAL(38,0))) AS BIGINT)"
  /** Exact cross-engine average in micros (floor of micros-sum / count). */
  private def mavg(c: Column): Column =
    floor(msum(c) / count(lit(1))).cast("long")
  private def mavgSql(e: String): String =
    s"CAST(FLOOR(${msumSql(e)} / COUNT(*)) AS BIGINT)"

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  // ===================================================================
  // TPC-H-ish relational analytics over the driver tables
  // ===================================================================

  private def q1Pricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        msum(col("l_quantity")).as("sum_qty_micros"),
        msum(col("l_extendedprice")).as("sum_base_price_micros"),
        msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price_micros"),
        msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge_micros"),
        mavg(col("l_quantity")).as("avg_qty_micros"),
        mavg(col("l_extendedprice")).as("avg_price_micros"),
        mavg(col("l_discount")).as("avg_disc_micros"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1PricingSql =
    s"""SELECT l_returnflag, l_linestatus,
       | ${msumSql("l_quantity")} AS sum_qty_micros,
       | ${msumSql("l_extendedprice")} AS sum_base_price_micros,
       | ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price_micros,
       | ${msumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge_micros,
       | ${mavgSql("l_quantity")} AS avg_qty_micros,
       | ${mavgSql("l_extendedprice")} AS avg_price_micros,
       | ${mavgSql("l_discount")} AS avg_disc_micros,
       | COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: top-10 open orders by discounted revenue for one market
    * segment. The customer dimension is broadcast; lineitem (the 100 TB-class
    * side) is never shuffled except by the groupBy key. */
  private def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).where(col("c_mktsegment") === "MACHINERY")
      .select("c_custkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    li.join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(msum(col("rev")).as("revenue_micros"),
        unix_millis(min(col("o_orderdate")).cast("timestamp")).as("order_date_ms"))
      .orderBy(col("revenue_micros").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q3TopOrdersSql =
    s"""SELECT o_orderkey,
       | ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue_micros,
       | epoch_ms(MIN(o_orderdate)) AS order_date_ms
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'MACHINERY'
       |GROUP BY o_orderkey
       |ORDER BY revenue_micros DESC, o_orderkey
       |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: revenue by nation where customer and supplier share the
    * nation, restricted to one region. All dimensions broadcast — lineitem,
    * the 100 TB-class side, is shuffled only by the final groupBy key. */
  private def q5RegionRevenueImpl(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).where(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    li.join(broadcast(supp.join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(msum(col("rev")).as("revenue_micros"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  private val q5RegionRevenueSql =
    s"""SELECT n_name,
       | ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue_micros,
       | COUNT(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  // ===================================================================
  // Placement metadata fixtures (sanity: the arithmetic generator itself)
  // ===================================================================

  private def metaTopology(s: SparkSession, dir: String): DataFrame =
    MetaFixtures.topology(s).orderBy("node_id")
  private val metaTopologySql =
    s"$cteSql SELECT * FROM topology ORDER BY node_id"

  private def metaDatanodes(s: SparkSession, dir: String): DataFrame =
    MetaFixtures.datanodes(s).orderBy("datanode_uuid")
  private val metaDatanodesSql =
    s"$cteSql SELECT * FROM datanodes ORDER BY datanode_uuid"

  private def metaStorages(s: SparkSession, dir: String): DataFrame =
    MetaFixtures.storages(s).orderBy("storage_id")
  private val metaStoragesSql =
    s"$cteSql SELECT * FROM storages ORDER BY storage_id"

  // ===================================================================
  // Placement analytics (P2, P5, P6, P10-P12, P15)
  // ===================================================================

  /** P6 candidate filtering: healthy DISK storages outside /odd with room
    * for a 64 MiB block. */
  private def placementCandidates(s: SparkSession, dir: String): DataFrame =
    CandidateFilters.candidates(
        MetaFixtures.storages(s), MetaFixtures.datanodes(s), MetaFixtures.topology(s),
        DefaultBlockSize, Seq("DISK"), Seq("/odd"), AsOfMs, DefaultStaleMs)
      .select("storage_id", "datanode_uuid", "dc", "rack", "remaining", "xceiver_count")
      .orderBy("storage_id")

  private val placementCandidatesSql =
    s"""$cteSql
       |SELECT s.storage_id, s.datanode_uuid, t.dc, t.rack, s.remaining, d.xceiver_count
       |FROM storages s
       |JOIN datanodes d ON s.datanode_uuid = d.datanode_uuid
       |JOIN topology t ON s.datanode_uuid = t.datanode_uuid
       |WHERE s.state NOT IN ('FAILED', 'READ_ONLY_SHARED')
       |  AND s.remaining >= $DefaultBlockSize
       |  AND s.type IN ('DISK')
       |  AND d.registered AND NOT d.decommission_in_progress
       |  AND NOT d.decommissioned AND NOT d.disallowed
       |  AND $AsOfMs - d.last_heartbeat_ms <= $DefaultStaleMs
       |  AND t.path NOT LIKE '/odd%'
       |ORDER BY s.storage_id""".stripMargin

  /** P5 prefer ordering as a window rank: top-3 candidate storages per rack
    * by (preferred type, space bucket, xceivers). */
  private def placementPreferRank(s: SparkSession, dir: String): DataFrame = {
    val cand = CandidateFilters.candidates(
      MetaFixtures.storages(s), MetaFixtures.datanodes(s), MetaFixtures.topology(s),
      DefaultBlockSize, Seq("DISK"), Nil, AsOfMs, DefaultStaleMs)
    val keys = CandidateFilters.preferKeys(col("type"), col("remaining"),
      col("xceiver_count"), col("storage_id"), Seq("DISK"))
    cand.withColumn("rk", row_number().over(
        Window.partitionBy("dc", "rack").orderBy(keys: _*)))
      .where(col("rk") <= 3)
      .select("dc", "rack", "rk", "storage_id", "remaining")
      .orderBy("dc", "rack", "rk")
  }

  private val placementPreferRankSql =
    s"""$cteSql,
       |cand AS (
       |  SELECT s.*, t.dc, t.rack, d.xceiver_count
       |  FROM storages s
       |  JOIN datanodes d ON s.datanode_uuid = d.datanode_uuid
       |  JOIN topology t ON s.datanode_uuid = t.datanode_uuid
       |  WHERE s.state NOT IN ('FAILED', 'READ_ONLY_SHARED')
       |    AND s.remaining >= $DefaultBlockSize
       |    AND s.type IN ('DISK')
       |    AND d.registered AND NOT d.decommission_in_progress
       |    AND NOT d.decommissioned AND NOT d.disallowed
       |    AND $AsOfMs - d.last_heartbeat_ms <= $DefaultStaleMs),
       |ranked AS (
       |  SELECT dc, rack, storage_id, remaining,
       |    row_number() OVER (PARTITION BY dc, rack ORDER BY
       |      CASE WHEN type = 'DISK' THEN 0 ELSE 1 END,
       |      -floor(remaining / ${MetaFixtures.Bucket100GiB}),
       |      xceiver_count, storage_id) AS rk
       |  FROM cand)
       |SELECT dc, rack, rk, storage_id, remaining FROM ranked
       |WHERE rk <= 3 ORDER BY dc, rack, rk""".stripMargin

  /** P2/P15: distinct top-level racks of decommissioned nodes plus literal
    * exclude paths, DEFAULT_RACK dropped (ref `:117-130`). */
  private def placementTopRacks(s: SparkSession, dir: String): DataFrame = {
    val topo = MetaFixtures.topology(s)
    val dn = MetaFixtures.datanodes(s).where(col("decommissioned"))
    val fromNodes = topo.join(dn, "datanode_uuid")
      .select(PathAlgebra.topRack(col("path")).as("top_rack"))
    val literals = s.createDataFrame(Seq(
        Tuple1("/even/rack_2/10.202.77.4"), Tuple1("/odd/rack_1"),
        Tuple1("/default-rack")))
      .toDF("p").select(PathAlgebra.topRack(col("p")).as("top_rack"))
    fromNodes.union(literals).distinct()
      .where(col("top_rack") =!= "/default-rack")
      .orderBy("top_rack")
  }

  private val placementTopRacksSql =
    s"""$cteSql,
       |cand AS (
       |  SELECT '/' || split_part(t.path, '/', 2) AS top_rack
       |  FROM topology t JOIN datanodes d ON t.datanode_uuid = d.datanode_uuid
       |  WHERE d.decommissioned
       |  UNION ALL SELECT '/even' UNION ALL SELECT '/odd'
       |  UNION ALL SELECT '/default-rack')
       |SELECT DISTINCT top_rack FROM cand
       |WHERE top_rack <> '/default-rack' ORDER BY top_rack""".stripMargin

  /** P12 full balanced-optimal verification over the 200k-block fixture. */
  private def placementVerify(s: SparkSession, dir: String): DataFrame =
    Verification.verifyBalancedOptimal(
        MetaFixtures.replicas(s), MetaFixtures.topology(s), MetaFixtures.blocks(s))
      .orderBy("block_id")

  private val placementVerifySql =
    s"""$cteSql,
       |located AS (
       |  SELECT r.block_id, t.dc, t.rack, t.path
       |  FROM replicas r JOIN topology t ON r.datanode_uuid = t.datanode_uuid),
       |edges AS (
       |  SELECT block_id, '' AS parent, '/' || dc AS child FROM located
       |  UNION ALL
       |  SELECT block_id, '/' || dc, '/' || dc || '/' || rack FROM located
       |  UNION ALL
       |  SELECT block_id, '/' || dc || '/' || rack, path FROM located),
       |per_child AS (
       |  SELECT block_id, parent, child, COUNT(*) AS cnt
       |  FROM edges GROUP BY 1, 2, 3),
       |per_parent AS (
       |  SELECT block_id, parent, COUNT(*) AS groups, SUM(cnt) AS leaf,
       |         MAX(cnt) AS max_placed, MIN(cnt) AS min_placed
       |  FROM per_child GROUP BY 1, 2),
       |avail AS (
       |  SELECT '' AS parent, COUNT(DISTINCT dc) AS available FROM topology
       |  UNION ALL
       |  SELECT '/' || dc, COUNT(DISTINCT rack) FROM topology GROUP BY 1
       |  UNION ALL
       |  SELECT '/' || dc || '/' || rack, COUNT(*) FROM topology GROUP BY 1),
       |per_block AS (
       |  SELECT p.block_id,
       |    MAX(CASE WHEN (CASE WHEN p.leaf <= a.available
       |          THEN p.groups <> p.leaf ELSE p.groups <> a.available END)
       |          OR p.max_placed - p.min_placed > 1 THEN 1 ELSE 0 END) AS any_violation,
       |    MAX(CASE WHEN p.parent = '' THEN p.leaf ELSE 0 END) AS root_total
       |  FROM per_parent p JOIN avail a ON p.parent = a.parent
       |  GROUP BY p.block_id)
       |SELECT b.block_id,
       |  CASE WHEN v.block_id IS NULL OR v.root_total < b.require_replica THEN false
       |       WHEN v.any_violation = 1 THEN false ELSE true END AS satisfied,
       |  CASE WHEN v.block_id IS NULL OR v.root_total < b.require_replica THEN 'not_enough'
       |       WHEN v.any_violation = 1 THEN 'not_optimal' ELSE NULL END AS reason
       |FROM blocks b LEFT JOIN per_block v ON b.block_id = v.block_id
       |ORDER BY b.block_id""".stripMargin

  /** P11 fast verification (count-only). */
  private def placementVerifyFast(s: SparkSession, dir: String): DataFrame =
    Verification.verifyFast(MetaFixtures.replicas(s), MetaFixtures.blocks(s))
      .orderBy("block_id")

  private val placementVerifyFastSql =
    s"""$cteSql,
       |counts AS (SELECT block_id, COUNT(*) AS observed FROM replicas GROUP BY 1)
       |SELECT b.block_id, COALESCE(c.observed, 0) AS observed, b.require_replica,
       |       COALESCE(c.observed, 0) >= b.require_replica AS satisfied
       |FROM blocks b LEFT JOIN counts c ON b.block_id = c.block_id
       |ORDER BY b.block_id""".stripMargin

  /** P12 intermediate rolled up across blocks: fleet-level hierarchy load. */
  private def placementHierarchyStats(s: SparkSession, dir: String): DataFrame =
    Verification.hierarchyStats(MetaFixtures.replicas(s), MetaFixtures.topology(s))
      .groupBy("parent")
      .agg(count(lit(1)).as("n_blocks"), sum("groups").as("groups_sum"),
        sum("leaf").as("leaf_sum"), max("max_placed").as("max_placed"))
      .orderBy("parent")

  private val placementHierarchyStatsSql =
    s"""$cteSql,
       |located AS (
       |  SELECT r.block_id, t.dc, t.rack, t.path
       |  FROM replicas r JOIN topology t ON r.datanode_uuid = t.datanode_uuid),
       |edges AS (
       |  SELECT block_id, '' AS parent, '/' || dc AS child FROM located
       |  UNION ALL
       |  SELECT block_id, '/' || dc, '/' || dc || '/' || rack FROM located
       |  UNION ALL
       |  SELECT block_id, '/' || dc || '/' || rack, path FROM located),
       |per_child AS (
       |  SELECT block_id, parent, child, COUNT(*) AS cnt
       |  FROM edges GROUP BY 1, 2, 3),
       |per_parent AS (
       |  SELECT block_id, parent, COUNT(*) AS groups, SUM(cnt) AS leaf,
       |         MAX(cnt) AS max_placed, MIN(cnt) AS min_placed
       |  FROM per_child GROUP BY 1, 2)
       |SELECT parent, COUNT(*) AS n_blocks, SUM(groups) AS groups_sum,
       |       SUM(leaf) AS leaf_sum, MAX(max_placed) AS max_placed
       |FROM per_parent GROUP BY parent ORDER BY parent""".stripMargin

  /** P1–P9 batch allocation over the request fixture. Not SQL-expressible
    * (stateful greedy recursion) — registered without an oracle; the
    * metamorphic choose->verify property is covered in PlacementSpec. */
  private def placementChoose(s: SparkSession, dir: String): DataFrame = {
    val snap = operators.Placement.snapshot(
      MetaFixtures.storages(s), MetaFixtures.datanodes(s), MetaFixtures.topology(s),
      AsOfMs, DefaultStaleMs)
    operators.Placement.choosePlacements(s, snap, MetaFixtures.requests(s))
      .orderBy("request_id", "pick_order")
  }

  /** P13–P14 batch deletion over every over-replicated fixture block. Not
    * SQL-expressible (comparator recomputes sibling counts after each
    * removal) — registered without an oracle; round-trip covered in
    * DeletionSpec. */
  private def placementDelete(s: SparkSession, dir: String): DataFrame = {
    val snap = operators.Placement.snapshot(
      MetaFixtures.storages(s), MetaFixtures.datanodes(s), MetaFixtures.topology(s),
      AsOfMs, DefaultStaleMs)
    val candidates = MetaFixtures.replicas(s)
      .join(MetaFixtures.blocks(s), "block_id")
      .select("block_id", "require_replica", "storage_id")
    operators.Placement.chooseDeletions(s, snap, candidates)
      .orderBy("block_id", "removal_order")
  }

  // ===================================================================
  // Registry
  // ===================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (q1Pricing _),
    "q3_top_orders" -> (q3TopOrders _),
    "q5_region_revenue" -> (q5RegionRevenueImpl _),
    "meta_topology" -> (metaTopology _),
    "meta_datanodes" -> (metaDatanodes _),
    "meta_storages" -> (metaStorages _),
    "placement_candidates" -> (placementCandidates _),
    "placement_prefer_rank" -> (placementPreferRank _),
    "placement_top_racks" -> (placementTopRacks _),
    "placement_verify" -> (placementVerify _),
    "placement_verify_fast" -> (placementVerifyFast _),
    "placement_hierarchy_stats" -> (placementHierarchyStats _),
    "placement_choose" -> (placementChoose _),
    "placement_delete" -> (placementDelete _)
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql,
    "q3_top_orders" -> q3TopOrdersSql,
    "q5_region_revenue" -> q5RegionRevenueSql,
    "meta_topology" -> metaTopologySql,
    "meta_datanodes" -> metaDatanodesSql,
    "meta_storages" -> metaStoragesSql,
    "placement_candidates" -> placementCandidatesSql,
    "placement_prefer_rank" -> placementPreferRankSql,
    "placement_top_racks" -> placementTopRacksSql,
    "placement_verify" -> placementVerifySql,
    "placement_verify_fast" -> placementVerifyFastSql,
    "placement_hierarchy_stats" -> placementHierarchyStatsSql
  )
}
