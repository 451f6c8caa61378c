package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P6: composable candidate predicates as `Column` expressions — the Spark
  * re-expression of the reference's `storage_filter` / `node_exclude_filter`
  * (`CrossAZBlockPlacementPolicy.java:162-188`) and `healthNodeTester`
  * (`:365-371`). Everything is a codegen-able boolean expression so Catalyst
  * can push the conjuncts into the scan.
  */
object CandidateFilters {

  /** Storage state must not be FAILED or READ_ONLY_SHARED (ref `:166-172`). */
  def storageUsable(state: Column): Column =
    !state.isin("FAILED", "READ_ONLY_SHARED")

  /** Remaining space covers the block (ref `:175-177`). */
  def spaceOk(remaining: Column, blockSize: Long): Column =
    remaining >= blockSize

  /** Storage type in the policy's preferred multiset; an empty preference
    * accepts everything (ref `:180-182`). */
  def typePreferred(tpe: Column, preferred: Iterable[String]): Column =
    if (preferred.isEmpty) lit(true) else tpe.isin(preferred.toSeq: _*)

  /** Node-path prefix exclusion (ref `:162-165`): excluded iff any exclude
    * expression is a prefix of the node path. */
  def notExcluded(path: Column, excludes: Iterable[String]): Column =
    excludes.foldLeft(lit(true))((acc, e) => acc && !path.startsWith(e))

  /** Datanode health (ref `:365-371`): registered, not decommission(ing|ed),
    * not disallowed, not stale. Staleness is `asOf - last_heartbeat >
    * staleIntervalMs`, matching `DatanodeInfo.isStale`. */
  def nodeHealthy(registered: Column, decommissionInProgress: Column,
                  decommissioned: Column, disallowed: Column,
                  lastHeartbeatMs: Column, asOfMs: Long,
                  staleIntervalMs: Long): Column =
    registered && !decommissionInProgress && !decommissioned && !disallowed &&
      (lit(asOfMs) - lastHeartbeatMs <= staleIntervalMs)

  /** The P5 `prefer` ordering keys (ref `:150-156`): policy-preferred type
    * first, then more remaining space first rounded to 100 GiB buckets (the
    * reference comment's intent at `:154`), then fewer open connections,
    * with `storage_id` as a deterministic tiebreak. */
  def preferKeys(tpe: Column, remaining: Column, xceiverCount: Column,
                 storageId: Column, preferred: Iterable[String]): Seq[Column] = Seq(
    when(typePreferred(tpe, preferred), 0).otherwise(1).asc,
    (-floor(remaining / graft.sources.MetaFixtures.Bucket100GiB)).asc,
    xceiverCount.asc,
    storageId.asc
  )

  /** Full candidate set: storages x datanodes x topology with all P6
    * predicates applied. The datanode/topology dimensions are broadcast —
    * cluster metadata is small relative to the fact tables even at fleet
    * scale, so no shuffle is introduced. */
  def candidates(storages: DataFrame, datanodes: DataFrame, topology: DataFrame,
                 blockSize: Long, preferred: Iterable[String],
                 excludes: Iterable[String], asOfMs: Long,
                 staleIntervalMs: Long): DataFrame = {
    val d = datanodes
    val healthyNodes = broadcast(
      d.where(nodeHealthy(d("registered"), d("decommission_in_progress"),
        d("decommissioned"), d("disallowed"), d("last_heartbeat_ms"),
        asOfMs, staleIntervalMs))
        .select("datanode_uuid", "xceiver_count"))
    val topo = broadcast(
      topology.where(notExcluded(topology("path"), excludes))
        .select("datanode_uuid", "dc", "rack", "path"))
    storages
      .where(storageUsable(storages("state")) &&
        spaceOk(storages("remaining"), blockSize) &&
        typePreferred(storages("type"), preferred))
      .join(healthyNodes, "datanode_uuid")
      .join(topo, "datanode_uuid")
  }
}
