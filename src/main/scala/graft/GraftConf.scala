package graft

import org.apache.spark.sql.SparkSession

/** Runtime-settable control surface — R-parity with the reference plugin's
  * HTTP tunables (`CrossAZBlockPlacementPolicyPlugin.java:180-214`) and the
  * policy's `initialize` defaults (`CrossAZBlockPlacementPolicy.java:762-777`:
  * fast-verify defaults true, do-placement-only defaults true, stale interval
  * from DFS default 30s).
  *
  * Values are read from `spark.conf` per call, so `spark.conf.set(...)` is a
  * live toggle — the Spark analog of the reference's hot reconfiguration.
  */
final case class GraftConf(
    fastVerify: Boolean,
    doPlacementOnly: Boolean,
    staleIntervalMs: Long,
    fallback: Boolean)

object GraftConf {
  val FastVerifyKey      = "graft.placement.fast-verify"
  val DoPlacementOnlyKey = "graft.placement.do-placement-only"
  val StaleIntervalKey   = "graft.placement.stale-interval"
  val FallbackKey        = "graft.placement.fallback"

  def fromSession(spark: SparkSession): GraftConf = GraftConf(
    fastVerify = spark.conf.get(FastVerifyKey, "true").toBoolean,
    doPlacementOnly = spark.conf.get(DoPlacementOnlyKey, "true").toBoolean,
    staleIntervalMs = spark.conf.get(StaleIntervalKey, "30000").toLong,
    fallback = spark.conf.get(FallbackKey, "false").toBoolean)
}
