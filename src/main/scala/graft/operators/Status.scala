package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.sources.MetaFixtures

/** R-parity observation surface: the Spark analog of the reference plugin's
  * cluster-state JSON render (`CrossAZBlockPlacementPolicyPlugin.java:221-262`
  * — keys `datanodes[{address,location}]`, `policy`, `fallback`,
  * `fast-verify`, `do-placement-only`). Toggles are read live from
  * `spark.conf` (see [[graft.GraftConf]]), so flipping a key is immediately
  * observable here — the hot-reconfiguration behavior without the servlet
  * machinery (which SURVEY §2.5 rules out of scope).
  */
object Status {

  /** Live datanodes (healthy per P6) with address + rack location. */
  def liveDatanodes(topology: DataFrame, datanodes: DataFrame,
                    asOfMs: Long, staleIntervalMs: Long): DataFrame = {
    val d = datanodes
    val healthy = CandidateFilters.nodeHealthy(d("registered"),
      d("decommission_in_progress"), d("decommissioned"), d("disallowed"),
      d("last_heartbeat_ms"), asOfMs, staleIntervalMs)
    topology.join(d.where(healthy).select("datanode_uuid"), "datanode_uuid")
      .select(col("ip").as("address"),
        concat(lit("/"), col("dc"), lit("/"), col("rack")).as("location"))
      .orderBy("address")
  }

  /** Full status document, shaped like the reference plugin's render. */
  def statusJson(spark: SparkSession, topology: DataFrame,
                 datanodes: DataFrame): String = {
    val conf = GraftConf.fromSession(spark)
    val dns = liveDatanodes(topology, datanodes, MetaFixtures.AsOfMs,
        conf.staleIntervalMs)
      .collect()
      .map(r => s"""{"address":"${r.getString(0)}","location":"${r.getString(1)}"}""")
      .mkString("[", ",", "]")
    s"""{"datanodes":$dns,""" +
      s""""policy":"${classOf[graft.plans.ClusterSnapshot].getPackageName}.PolicyEngine",""" +
      s""""fallback":${conf.fallback},""" +
      s""""fast-verify":${conf.fastVerify},""" +
      s""""do-placement-only":${conf.doPlacementOnly}}"""
  }
}
