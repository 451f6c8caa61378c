package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Verification
import graft.plans.{ClusterSnapshot, NodeMeta, PlacementRequest, PolicyEngine, StorageMeta}
import graft.sources.MetaFixtures

/** P1–P9 chooseTarget: structure-level invariants + the reference's
  * metamorphic property (every allocation passes verification,
  * `TestCrossAZBlockPlacementPolicy.java:375-398`). */
class PlacementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Clean 2-DC x 5-rack x 5-node healthy snapshot, one DISK storage each. */
  private def cleanSnapshot: ClusterSnapshot = {
    val nodes = for {
      dc <- Vector("even", "odd")
      rack <- 0 until 5
      host <- 0 until 5
    } yield {
      val uuid = s"dn-$dc-$rack-$host"
      NodeMeta(uuid, s"/$dc/rack_$rack/10.0.$rack.$host", healthy = true,
        xceivers = (rack + host) % 7)
    }
    val storages = nodes.map { n =>
      StorageMeta(s"st-${n.uuid}", n.uuid, "NORMAL", "DISK",
        remaining = 1000L * MetaFixtures.GiB)
    }
    ClusterSnapshot(nodes, storages)
  }

  private def req(id: Long = 1, additional: Int, writer: Option[String] = None,
                  chosen: Seq[String] = Nil, returnChosen: Boolean = false,
                  excludes: Seq[String] = Nil,
                  favored: Seq[String] = Nil): PlacementRequest =
    PlacementRequest(id, additional, writer, chosen, returnChosen, excludes,
      blockSize = 12, policy = Map("DISK" -> additional.toLong),
      favored = favored)

  private val snap = cleanSnapshot

  test("picks are distinct healthy nodes, exactly `additional` of them") {
    val picks = PolicyEngine.chooseTarget(snap, req(additional = 3), new Random(7))
    assert(picks.size == 3)
    assert(picks.map(_.nodeUuid).distinct.size == 3)
  }

  test("3 replicas spread across both datacenters and distinct racks") {
    val picks = PolicyEngine.chooseTarget(snap, req(additional = 3), new Random(7))
    val dcs = picks.map(p => PolicyEngine.topRack(nodePath(p))).distinct
    assert(dcs.size == 2)
    val racks = picks.map(p => PolicyEngine.parentPath(nodePath(p))).distinct
    assert(racks.size == 3)
  }

  test("excluding a datacenter keeps all picks outside it") {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = 3, excludes = Seq("/odd")), new Random(7))
    assert(picks.nonEmpty)
    assert(picks.forall(p => nodePath(p).startsWith("/even")))
  }

  test("writer pins the selection subtree to its datacenter") {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = 2, writer = Some("dn-even-0-0")), new Random(7))
    assert(picks.size == 2)
    assert(picks.forall(p => nodePath(p).startsWith("/even")))
  }

  test("already-chosen replicas rebalance the next allocation") {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = 2, chosen = Seq("st-dn-even-0-0")), new Random(7))
    assert(picks.size == 2)
    // one pick must go to the untouched datacenter
    assert(picks.exists(p => nodePath(p).startsWith("/odd")))
    // chosen node is never re-picked
    assert(!picks.exists(_.nodeUuid == "dn-even-0-0"))
  }

  test("returnChosen appends the provided storages") {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = 1, chosen = Seq("st-dn-even-0-0"), returnChosen = true),
      new Random(7))
    assert(picks.size == 2)
    assert(picks.last.id == "st-dn-even-0-0")
  }

  test("allocation is capped by available distinct healthy nodes") {
    val tiny = ClusterSnapshot(snap.nodes.take(4), snap.storages.take(4))
    val picks = PolicyEngine.chooseTarget(tiny, req(additional = 10), new Random(7))
    assert(picks.size == 4)
    assert(picks.map(_.nodeUuid).distinct.size == 4)
  }

  test("same seed gives identical picks, different seeds may differ") {
    val a = PolicyEngine.chooseTarget(snap, req(additional = 3), new Random(42))
    val b = PolicyEngine.chooseTarget(snap, req(additional = 3), new Random(42))
    assert(a.map(_.id) == b.map(_.id))
  }

  test("unhealthy nodes are never picked") {
    val sick = ClusterSnapshot(
      snap.nodes.map(n => if (n.path.startsWith("/even")) n.copy(healthy = false) else n),
      snap.storages)
    val picks = PolicyEngine.chooseTarget(sick, req(additional = 4), new Random(7))
    assert(picks.nonEmpty)
    assert(picks.forall(p => nodePath(p).startsWith("/odd")))
  }

  test("non-preferred storage types are filtered out") {
    val archiveOnly = ClusterSnapshot(snap.nodes,
      snap.storages.map(s => if (s.nodeUuid.startsWith("dn-even")) s.copy(tpe = "ARCHIVE") else s))
    val picks = PolicyEngine.chooseTarget(archiveOnly, req(additional = 4), new Random(7))
    assert(picks.forall(p => nodePath(p).startsWith("/odd")))
  }

  test("metamorphic: chooseTarget outputs pass balanced-optimal verification") {
    // the reference asserts exactly this round-trip (ref test :375-398)
    val topoDf = snap.nodes.map(n => (n.uuid, n.path,
        n.path.split('/')(1), n.path.split('/')(2)))
      .toDF("datanode_uuid", "path", "dc", "rack")
    for (k <- 1 to 5; seed <- Seq(1L, 99L)) {
      val picks = PolicyEngine.chooseTarget(snap, req(additional = k), new Random(seed))
      assert(picks.size == k, s"k=$k seed=$seed")
      val replicas = picks.zipWithIndex
        .map { case (p, i) => (1L, i, p.nodeUuid) }
        .toDF("block_id", "replica_index", "datanode_uuid")
      val blocks = Seq((1L, k)).toDF("block_id", "require_replica")
      val row = Verification.verifyBalancedOptimal(replicas, topoDf, blocks).head()
      assert(row.getAs[Boolean]("satisfied"),
        s"k=$k seed=$seed picks=${picks.map(_.nodeUuid)}: ${row.getAs[String]("reason")}")
    }
  }

  // -------------------------------------------------------- favored nodes

  test("favored: eligible favored node is picked first, quota respected") {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = 3, favored = Seq("dn-odd-2-3")), new Random(7))
    assert(picks.size == 3)
    assert(picks.head.nodeUuid == "dn-odd-2-3")
    assert(picks.map(_.nodeUuid).distinct.size == 3)
  }

  test("favored: multiple favored fill the quota in preference order") {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = 2,
        favored = Seq("dn-even-1-1", "dn-odd-3-2", "dn-even-4-4")),
      new Random(7))
    assert(picks.map(_.nodeUuid) == Vector("dn-even-1-1", "dn-odd-3-2"))
  }

  test("favored: excluded or unhealthy favored nodes are skipped") {
    val unhealthy = snap.copy(nodes = snap.nodes.map(n =>
      if (n.uuid == "dn-even-0-0") n.copy(healthy = false) else n))
    val picks = PolicyEngine.chooseTarget(unhealthy,
      req(additional = 2, excludes = Seq("/odd"),
        favored = Seq("dn-odd-1-1", "dn-even-0-0", "dn-even-2-2")),
      new Random(7))
    // dn-odd-1-1 excluded, dn-even-0-0 unhealthy -> only dn-even-2-2 seeds
    assert(picks.head.nodeUuid == "dn-even-2-2")
    assert(picks.size == 2)
    assert(picks.forall(p => nodePath(p).startsWith("/even")))
    assert(!picks.exists(_.nodeUuid == "dn-even-0-0"))
  }

  test("favored: a favored node already holding a replica is not re-picked") {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = 2, chosen = Seq("st-dn-even-0-0"),
        favored = Seq("dn-even-0-0")), new Random(7))
    assert(!picks.exists(_.nodeUuid == "dn-even-0-0"))
    assert(picks.size == 2)
  }

  test("favored: favoredEligible matches the nodes chooseTarget seeds") {
    val r = req(additional = 4,
      favored = Seq("dn-even-1-1", "dn-odd-3-2", "dn-odd-3-2", "dn-even-4-4"))
    val eligible = PolicyEngine.favoredEligible(snap, r).map(_.uuid)
    assert(eligible == Vector("dn-even-1-1", "dn-odd-3-2", "dn-even-4-4"))
    val picks = PolicyEngine.chooseTarget(snap, r, new Random(7))
    assert(picks.take(3).map(_.nodeUuid) == eligible)
  }

  test("metamorphic: favored allocations still pass balanced verification") {
    val topo = snap.nodes.map(n => (n.uuid, n.path,
        n.path.split('/')(1), n.path.split('/')(2)))
      .toDF("datanode_uuid", "path", "dc", "rack")
    for (k <- 1 to 5; seed <- Seq(1, 42)) {
      val favored = Seq(s"dn-even-${seed % 5}-1", s"dn-odd-${(seed + 2) % 5}-3")
      val picks = PolicyEngine.chooseTarget(snap,
        req(additional = k, favored = favored), new Random(seed))
      assert(picks.size == k, s"k=$k seed=$seed")
      val replicas = picks.zipWithIndex
        .map { case (p, i) => (1L, i.toLong, p.nodeUuid) }
        .toDF("block_id", "replica_index", "datanode_uuid")
      val blocks = Seq((1L, k)).toDF("block_id", "require_replica")
      val row = Verification.verifyBalancedOptimal(replicas, topo, blocks).head()
      assert(row.getAs[Boolean]("satisfied"),
        s"k=$k seed=$seed picks=${picks.map(_.nodeUuid)}: ${row.getAs[String]("reason")}")
    }
  }

  private def nodePath(st: StorageMeta): String = snap.nodeByUuid(st.nodeUuid).path

  // -------------------------------------------------------------------
  // Existing-block patching scenarios transcribed from the reference
  // (`TestCrossAZBlockPlacementPolicy.java:475-611`): allocate `additional`
  // given already-placed replicas, then verify chosen ∪ picks.
  // -------------------------------------------------------------------

  private def st(dc: String, rack: Int, host: Int) = s"st-dn-$dc-$rack-$host"

  private def patchCase(expectOptimal: Boolean, replica: Int, additional: Int,
                        writer: Option[String], includeChosen: Boolean,
                        excludes: Seq[String], chosen: Seq[String],
                        clue: String): Unit = {
    val picks = PolicyEngine.chooseTarget(snap,
      req(additional = additional, writer = writer, chosen = chosen,
        returnChosen = includeChosen, excludes = excludes), new Random(5))
    val expectedLen = if (includeChosen) chosen.length + additional else additional
    assert(picks.size == expectedLen, s"$clue: got ${picks.size}")
    val combined = (picks.map(_.nodeUuid) ++
      (if (includeChosen) Nil
       else chosen.map(id => snap.storageById(id).nodeUuid))).zipWithIndex
    val topoDf = snap.nodes.map(n => (n.uuid, n.path,
        n.path.split('/')(1), n.path.split('/')(2)))
      .toDF("datanode_uuid", "path", "dc", "rack")
    val replicas = combined.map { case (u, i) => (1L, i, u) }
      .toDF("block_id", "replica_index", "datanode_uuid")
    val blocks = Seq((1L, replica)).toDF("block_id", "require_replica")
    val row = Verification.verifyBalancedOptimal(replicas, topoDf, blocks).head()
    assert(row.getAs[Boolean]("satisfied") == expectOptimal,
      s"$clue: reason=${Option(row.getAs[String]("reason"))} picks=${picks.map(_.nodeUuid)}")
  }

  test("patching: one more replica onto 2+1 spread is optimal") {
    patchCase(expectOptimal = true, 3, 1, None, includeChosen = false, Nil,
      Seq(st("even", 0, 0), st("even", 1, 0), st("odd", 0, 0)), "patch-1")
  }

  test("patching: excluding the under-filled DC breaks optimality") {
    patchCase(expectOptimal = false, 3, 1, None, includeChosen = false, Seq("/odd"),
      Seq(st("even", 0, 0), st("even", 1, 0), st("odd", 0, 0)), "patch-2")
  }

  test("patching: include_chosen returns chosen plus picks, still optimal") {
    patchCase(expectOptimal = true, 3, 1, None, includeChosen = true, Nil,
      Seq(st("even", 0, 0), st("even", 1, 0), st("odd", 0, 0)), "patch-3")
  }

  test("patching: writer hint with cross-DC chosen stays optimal") {
    patchCase(expectOptimal = true, 3, 1, Some("dn-even-0-0"),
      includeChosen = false, Nil,
      Seq(st("even", 0, 0), st("even", 1, 0), st("odd", 0, 0)), "patch-4")
  }

  test("fresh 3-replica allocation without writer is optimal") {
    patchCase(expectOptimal = true, 3, 3, None, includeChosen = false, Nil, Nil,
      "fresh-1")
  }

  test("fresh 3-replica allocation pinned to the writer DC is not optimal") {
    // the reference's replication-patching case: writer pins the selection
    // subtree, so all 3 land in one DC (ref :568-571)
    patchCase(expectOptimal = false, 3, 3, Some("dn-even-0-0"),
      includeChosen = false, Nil, Nil, "fresh-2")
  }

  test("patching: writer + same-DC chosen pins everything to one DC") {
    patchCase(expectOptimal = false, 3, 2, Some("dn-even-0-0"),
      includeChosen = false, Nil, Seq(st("even", 1, 0)), "patch-5")
  }

  test("patching: doubled rack with writer pin stays suboptimal") {
    patchCase(expectOptimal = false, 3, 2, Some("dn-even-0-0"),
      includeChosen = false, Nil,
      Seq(st("even", 1, 0), st("even", 1, 1)), "patch-6")
  }

  test("snapshot fails fast when the metadata relation is not fleet-sized") {
    import graft.operators.Placement
    import graft.sources.MetaFixtures
    val st = MetaFixtures.storages(spark)
    val dn = MetaFixtures.datanodes(spark)
    val tp = MetaFixtures.topology(spark)
    // the real fixtures sail under the default 2M-row envelope
    val ok = Placement.snapshot(st, dn, tp,
      MetaFixtures.AsOfMs, 600000L)
    assert(ok.nodes.nonEmpty && ok.storages.nonEmpty)
    // an accidentally data-sized "metadata" relation hits the named
    // contract instead of collecting to the driver
    val e = intercept[IllegalArgumentException] {
      Placement.snapshot(st, dn, tp, MetaFixtures.AsOfMs, 600000L,
        maxFleetRows = 3)
    }
    assert(e.getMessage.contains("maxFleetRows"))
  }
}
