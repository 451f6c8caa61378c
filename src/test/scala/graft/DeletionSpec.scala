package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Placement, Verification}
import graft.plans.{ClusterSnapshot, NodeMeta, PolicyEngine, StorageMeta}

/** P13–P14 chooseReplicasToDelete: reference edge cases
  * (`CrossAZBlockPlacementPolicy.java:295-363`) + the delete->re-verify
  * round-trip the reference tests (`TestCrossAZBlockPlacementPolicy.java:235-266`). */
class DeletionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 2 DCs x 3 racks x 2 nodes, one NORMAL DISK storage per node plus a
    * FAILED storage on one node. */
  private val snap: ClusterSnapshot = {
    val nodes = for {
      dc <- Vector("even", "odd")
      rack <- 0 until 3
      host <- 0 until 2
    } yield NodeMeta(s"dn-$dc-$rack-$host", s"/$dc/rack_$rack/10.0.$rack.$host",
      healthy = true, xceivers = 0)
    val normal = nodes.map(n => StorageMeta(s"st-${n.uuid}", n.uuid, "NORMAL",
      "DISK", remaining = (1 + n.uuid.length % 3) * 100L * 1024 * 1024 * 1024))
    val failed = Vector(
      StorageMeta("stf-dn-even-0-0", "dn-even-0-0", "FAILED", "DISK", 0L),
      StorageMeta("stf-dn-odd-0-0", "dn-odd-0-0", "FAILED", "DISK", 0L))
    ClusterSnapshot(nodes, normal ++ failed)
  }

  private def st(dc: String, rack: Int, host: Int) = s"st-dn-$dc-$rack-$host"

  test("candidates within quota: nothing to delete") {
    val out = PolicyEngine.chooseReplicasToDelete(snap,
      Seq(st("even", 0, 0), st("even", 1, 0), st("odd", 0, 0)), 3)
    assert(out.isEmpty)
  }

  test("2-DC special case caps expected at 4 when config_replica > 4") {
    val cands = Seq(st("even", 0, 0), st("even", 1, 0), st("even", 2, 0),
      st("odd", 0, 0), st("odd", 1, 0), st("odd", 2, 0))
    val out = PolicyEngine.chooseReplicasToDelete(snap, cands, 6)
    // expected = min(4, 6) = 4, so 6 - 4 = 2 removals despite config 6
    assert(out.size == 2)
  }

  test("FAILED storages are deleted first") {
    val cands = Seq("stf-dn-even-0-0", st("even", 1, 0), st("even", 2, 0),
      st("odd", 0, 0), st("odd", 1, 0))
    val out = PolicyEngine.chooseReplicasToDelete(snap, cands, 3)
    // expected = min(4,3) = 3 -> 2 removals, the FAILED one first
    assert(out.size == 2)
    assert(out.head.id == "stf-dn-even-0-0")
  }

  test("all-FAILED remainder yields no deletions") {
    val cands = Seq("stf-dn-even-0-0", "stf-dn-odd-0-0")
    val out = PolicyEngine.chooseReplicasToDelete(snap, cands, 1)
    assert(out.isEmpty)
  }

  test("same-node duplicate storages: less remaining space deleted first") {
    val extra = StorageMeta("st2-dn-even-0-1", "dn-even-0-1", "NORMAL", "DISK", 1L)
    val snap2 = ClusterSnapshot(snap.nodes, snap.storages :+ extra)
    val cands = Seq(st("even", 0, 1), "st2-dn-even-0-1",
      st("even", 1, 0), st("odd", 0, 0), st("odd", 1, 0))
    val out = PolicyEngine.chooseReplicasToDelete(snap2, cands, 3)
    assert(out.size == 2)
    // the crowded node loses its smaller storage first
    assert(out.map(_.id).contains("st2-dn-even-0-1"))
    assert(!out.map(_.id).contains(st("even", 0, 1)) ||
      out.indexOf("st2-dn-even-0-1") < out.indexOf(st("even", 0, 1)))
  }

  test("deletion drains the crowded datacenter first") {
    // 4 even + 2 odd, config 4 (expected 4): both removals must hit /even
    val cands = Seq(st("even", 0, 0), st("even", 1, 0), st("even", 2, 0),
      st("even", 0, 1), st("odd", 0, 0), st("odd", 1, 0))
    val out = PolicyEngine.chooseReplicasToDelete(snap, cands, 4)
    assert(out.size == 2)
    assert(out.forall(_.nodeUuid.startsWith("dn-even")))
  }

  test("metamorphic: delete then re-verify stays balanced-optimal") {
    val cands = Seq(st("even", 0, 0), st("even", 1, 0), st("even", 2, 0),
      st("odd", 0, 0), st("odd", 1, 0), st("odd", 2, 0))
    val out = PolicyEngine.chooseReplicasToDelete(snap, cands, 3)
    assert(out.size == 3) // expected = min(4,3) = 3
    val remainder = cands.filterNot(out.map(_.id).contains)
    val topoDf = snap.nodes.map(n => (n.uuid, n.path,
        n.path.split('/')(1), n.path.split('/')(2)))
      .toDF("datanode_uuid", "path", "dc", "rack")
    val replicas = remainder.zipWithIndex
      .map { case (id, i) => (1L, i, snap.storageById(id).nodeUuid) }
      .toDF("block_id", "replica_index", "datanode_uuid")
    val blocks = Seq((1L, 3)).toDF("block_id", "require_replica")
    val row = Verification.verifyBalancedOptimal(replicas, topoDf, blocks).head()
    assert(row.getAs[Boolean]("satisfied"),
      s"reason=${Option(row.getAs[String]("reason"))}")
  }

  test("Spark batch wrapper: chooseDeletions over grouped candidates") {
    val cands = Seq(
      (1L, 3, st("even", 0, 0)), (1L, 3, st("even", 1, 0)), (1L, 3, st("even", 2, 0)),
      (1L, 3, st("odd", 0, 0)), (1L, 3, st("odd", 1, 0)), (1L, 3, st("odd", 2, 0)),
      (2L, 3, st("even", 0, 0)), (2L, 3, st("odd", 0, 0)))
      .toDF("block_id", "require_replica", "storage_id")
    val out = Placement.chooseDeletions(spark, snap, cands)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.count(_._1 == 1L) == 3)
    assert(out.count(_._1 == 2L) == 0) // within quota
  }
}
