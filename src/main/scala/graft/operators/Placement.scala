package graft.operators

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{ClusterSnapshot, NodeMeta, PlacementRequest, PolicyEngine, StorageMeta}

/** Spark operators around the [[graft.plans.PolicyEngine]] decision
  * procedures.
  *
  * Scale shape: cluster metadata (the snapshot) is collected once and
  * broadcast — it is small by nature (SURVEY §1.1). The *requests* and
  * *blocks* dimensions are the 100 TB-class fact tables, so both operators
  * are data-parallel over them (`flatMap` / `flatMapGroups` inside
  * executors); nothing per-request ever touches the driver.
  */
object Placement {

  final case class RequestRow(request_id: Long, additional: Int,
                              writer_uuid: Option[String], excludes: Seq[String],
                              block_size: Long)
  final case class PickRow(request_id: Long, pick_order: Int, storage_id: String,
                           datanode_uuid: String)
  final case class CandidateRow(block_id: Long, require_replica: Long, storage_id: String)
  final case class RemovalRow(block_id: Long, removal_order: Int, storage_id: String)

  /** Collect + assemble the broadcastable snapshot from the metadata
    * DataFrames. Health is evaluated here once (P6 health tester). */
  def snapshot(storages: DataFrame, datanodes: DataFrame, topology: DataFrame,
               asOfMs: Long, staleIntervalMs: Long): ClusterSnapshot = {
    val d = datanodes
    val healthy = CandidateFilters.nodeHealthy(d("registered"),
      d("decommission_in_progress"), d("decommissioned"), d("disallowed"),
      d("last_heartbeat_ms"), asOfMs, staleIntervalMs)
    val nodes = topology.select("datanode_uuid", "path")
      .join(d.select(col("datanode_uuid"), healthy.as("healthy"), col("xceiver_count")),
        "datanode_uuid")
      .collect()
      .map(r => NodeMeta(r.getAs[String]("datanode_uuid"), r.getAs[String]("path"),
        r.getAs[Boolean]("healthy"), r.getAs[Number]("xceiver_count").intValue))
      .toVector
    val sts = storages.select("storage_id", "datanode_uuid", "state", "type", "remaining")
      .collect()
      .map(r => StorageMeta(r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toVector
    ClusterSnapshot(nodes, sts)
  }

  /** P1–P9 batch mode: one balanced allocation per request row, computed in
    * executors against the broadcast snapshot. Randomness is seeded by
    * request_id, so results are reproducible across runs and partitionings. */
  def choosePlacements(spark: SparkSession, snap: ClusterSnapshot,
                       requests: DataFrame): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(snap)
    requests.as[RequestRow].flatMap { r =>
      val req = PlacementRequest(r.request_id, r.additional, r.writer_uuid,
        chosen = Nil, returnChosen = false, excludes = r.excludes,
        blockSize = r.block_size,
        policy = Map("DISK" -> r.additional.toLong))
      PolicyEngine.chooseTarget(bc.value, req, new Random(r.request_id))
        .zipWithIndex.map { case (st, i) => PickRow(r.request_id, i, st.id, st.nodeUuid) }
    }.toDF()
  }

  /** P13–P14 batch mode: per block, greedily pick excess replicas to delete.
    * Vectorized with `flatMapGroups` over block_id — the one place a typed
    * group function beats a driver loop at fleet scale (SURVEY §7 step 6). */
  def chooseDeletions(spark: SparkSession, snap: ClusterSnapshot,
                      candidates: DataFrame): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(snap)
    candidates.as[CandidateRow]
      .groupByKey(_.block_id)
      .flatMapGroups { (blockId, it) =>
        val rows = it.toVector
        val ids = rows.map(_.storage_id)
        val configReplica = rows.head.require_replica.toInt
        PolicyEngine.chooseReplicasToDelete(bc.value, ids, configReplica)
          .zipWithIndex.map { case (st, i) => RemovalRow(blockId, i, st.id) }
      }.toDF()
  }
}
