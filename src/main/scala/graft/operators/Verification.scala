package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConf

/** P10–P12: placement verification as pure relational analytics.
  *
  * Re-expresses the reference's `verifyBlockPlacementBalancedOptimal`
  * (`CrossAZBlockPlacementPolicy.java:385-516`) as
  * explode(ancestor edges) -> groupBy(block, parent, child) ->
  * groupBy(block, parent) -> broadcast-join(topology group sizes) ->
  * per-block violation aggregate. Semantics preserved exactly:
  *
  *  - per parent with `leaf` replicas below it placed into `groups` distinct
  *    children out of `available`: optimal iff
  *    `leaf <= available ? groups == leaf : groups == available`
  *    (spread check, ref `:455-481`) AND `max - min <= 1` (balance, `:481`);
  *  - a block whose root total < require_replica fails with "not_enough"
  *    (ref `:417-434`) — checked before optimality, and an *empty* replica
  *    set is always unsatisfied (the reference's `.orElse(false)`);
  *  - reasons are compact codes (`not_enough` / `not_optimal`), computed only
  *    in the violation branch (`when(...)`) — the Spark analog of the
  *    reference's lazy `Supplier` messages (`:33-62`).
  *
  * Scale: the fact table (`replicas`) is only ever shuffled by block-local
  * keys; the topology dimension joins broadcast. Partial aggregation handles
  * the (block, parent, child) rollup map-side.
  */
object Verification {

  /** Direct-child counts per topology inner node — the Spark equivalent of
    * `topology.getDatanodesInRack(parent).size()` (ref `:449-450`). Tiny
    * (1 + #dcs + #racks rows): always broadcast. */
  def availableGroups(topology: DataFrame): DataFrame = {
    val root = topology.agg(countDistinct(concat(lit("/"), col("dc"))).as("available"))
      .select(lit("").as("parent"), col("available"))
    val dcs = topology.groupBy(concat(lit("/"), col("dc")).as("parent"))
      .agg(countDistinct(col("rack")).as("available"))
    val racks = topology.groupBy(concat(lit("/"), col("dc"), lit("/"), col("rack")).as("parent"))
      .agg(count(lit(1)).as("available"))
    root.unionByName(dcs).unionByName(racks)
  }

  /** Replicas located on the topology: adds dc/rack/path per replica row. */
  def located(replicas: DataFrame, topology: DataFrame): DataFrame =
    replicas.join(broadcast(topology.select("datanode_uuid", "dc", "rack", "path")),
      "datanode_uuid")

  /** Hierarchy statistics per (block, parent): number of occupied child
    * groups, total replicas underneath, and per-child max/min (the
    * reference's `Map<parent, LongSummaryStatistics>`, ref `:400-415`). */
  def hierarchyStats(replicas: DataFrame, topology: DataFrame): DataFrame = {
    val edges = located(replicas, topology)
      .select(col("block_id"), explode(PathAlgebra.ancestorEdges(col("path"))).as("e"))
      .select(col("block_id"), col("e.parent").as("parent"), col("e.child").as("child"))
    edges
      .groupBy("block_id", "parent", "child").agg(count(lit(1)).as("cnt"))
      .groupBy("block_id", "parent")
      .agg(count(lit(1)).as("groups"), sum("cnt").as("leaf"),
        max("cnt").as("max_placed"), min("cnt").as("min_placed"))
  }

  /** Full balanced-optimal verification: one row per block in `blocks`
    * (block_id, require_replica) with (satisfied, reason). */
  def verifyBalancedOptimal(replicas: DataFrame, topology: DataFrame,
                            blocks: DataFrame): DataFrame = {
    val stats = hierarchyStats(replicas, topology)
      .join(broadcast(availableGroups(topology)), "parent")
    val violated: Column =
      when(col("leaf") <= col("available"), col("groups") =!= col("leaf"))
        .otherwise(col("groups") =!= col("available")) ||
        (col("max_placed") - col("min_placed") > 1)
    val perBlock = stats.groupBy("block_id").agg(
      max(when(violated, 1).otherwise(0)).as("any_violation"),
      max(when(col("parent") === "", col("leaf")).otherwise(0L)).as("root_total"))
    blocks.join(perBlock, Seq("block_id"), "left")
      .select(col("block_id"),
        when(col("root_total").isNull || col("root_total") < col("require_replica"), false)
          .when(col("any_violation") === 1, false)
          .otherwise(true).as("satisfied"),
        when(col("root_total").isNull || col("root_total") < col("require_replica"), "not_enough")
          .when(col("any_violation") === 1, "not_optimal")
          .otherwise(lit(null).cast("string")).as("reason"))
  }

  /** P11 fast verification (ref `:373-383`): replica count >= required. */
  def verifyFast(replicas: DataFrame, blocks: DataFrame): DataFrame = {
    val counts = replicas.groupBy("block_id").agg(count(lit(1)).as("observed"))
    blocks.join(counts, Seq("block_id"), "left")
      .select(col("block_id"),
        coalesce(col("observed"), lit(0L)).as("observed"),
        col("require_replica"),
        (coalesce(col("observed"), lit(0L)) >= col("require_replica")).as("satisfied"))
  }

  /** P10 dispatcher (ref `:282-292`): `do-placement-only` short-circuits to
    * all-OK, `fast-verify` routes to the count check, else full analysis.
    * Flags come live from `spark.conf` (GraftConf). */
  def verifyPlacements(spark: SparkSession, replicas: DataFrame,
                       topology: DataFrame, blocks: DataFrame): DataFrame = {
    val conf = GraftConf.fromSession(spark)
    if (conf.doPlacementOnly)
      blocks.select(col("block_id"), lit(true).as("satisfied"),
        lit(null).cast("string").as("reason"))
    else if (conf.fastVerify)
      verifyFast(replicas, blocks)
        .select(col("block_id"), col("satisfied"),
          when(!col("satisfied"),
            concat(lit("expect replica:"), col("require_replica"),
              lit(", but got:"), col("observed")))
            .otherwise(lit(null).cast("string")).as("reason"))
    else
      verifyBalancedOptimal(replicas, topology, blocks)
  }
}
