package graft

import scala.util.Random

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{ClusterSnapshot, NodeMeta, PlacementRequest, PolicyEngine, StorageMeta}

/** ScalaCheck property fuzzing of the placement policy engine: random
  * topologies, health states, exclusion sets and replica workloads, with
  * the reference's metamorphic invariants as the properties —
  * choose→verify (`TestCrossAZBlockPlacementPolicy.java:375-398`) and
  * delete→re-verify (`:235-266`) — plus the structural safety rules every
  * selection must satisfy regardless of topology shape.
  *
  * Verification here is the INDEPENDENT in-memory model of the
  * balanced-optimal rules (same spec-derived model PropertySpec compares
  * the Spark operator against), generalized over arbitrary topologies, so
  * 100-case properties run engine-side in milliseconds instead of paying a
  * Spark job per case.
  *
  * The metamorphic properties generate SYMMETRIC topologies (equal racks
  * per DC, hosts per rack): on asymmetric trees a capacity-starved subtree
  * can make balanced placement impossible for large k — the reference has
  * the same behavior (selection truncates at subtree capacity), and its
  * own metamorphic tests likewise run on symmetric fixtures. The safety
  * properties (filters, exclusion, dedup, determinism) run on arbitrary
  * random health/exclusion states where no such feasibility caveat exists.
  */
class PolicyFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------- fixtures

  private def mkNodes(nDc: Int, racks: Int, hosts: Int): Vector[NodeMeta] =
    (for {
      d <- 0 until nDc; r <- 0 until racks; h <- 0 until hosts
    } yield NodeMeta(s"dn-$d-$r-$h", s"/dc$d/rack_$r/10.$d.$r.$h",
      healthy = true, xceivers = 0)).toVector

  private def mkSnap(nodes: Vector[NodeMeta],
      unhealthy: Set[String] = Set.empty): ClusterSnapshot =
    ClusterSnapshot(
      nodes.map(n => if (unhealthy(n.uuid)) n.copy(healthy = false) else n),
      nodes.map(n => StorageMeta(s"st-${n.uuid}", n.uuid, "NORMAL", "DISK", 1L << 40)))

  /** Independent balanced-optimal model over an arbitrary topology
    * (spec-derived; no code shared with PolicyEngine/Verification). */
  private def modelVerify(nodes: Vector[NodeMeta], replicaPaths: Seq[String],
      require: Int): Boolean = {
    if (replicaPaths.isEmpty) return false
    val edges = replicaPaths.flatMap(PolicyEngine.ancestorEdges)
    val perParentChild = edges.groupBy(identity).view.mapValues(_.size).toMap
    val byParent = perParentChild.groupBy(_._1._1)
    val rootTotal = byParent.get("").map(_.values.sum).getOrElse(0)
    if (rootTotal < require) return false
    val childrenOf = nodes.flatMap(n => PolicyEngine.ancestorEdges(n.path))
      .distinct.groupBy(_._1).view.mapValues(_.size).toMap
    byParent.forall { case (parent, cc) =>
      val groups = cc.size
      val leaf = cc.values.sum
      val available = childrenOf(parent)
      val spreadOk = if (leaf <= available) groups == leaf else groups == available
      spreadOk && cc.values.max - cc.values.min <= 1
    }
  }

  private val genSymTopo: Gen[Vector[NodeMeta]] = for {
    d <- Gen.choose(1, 4); r <- Gen.choose(1, 4); h <- Gen.choose(1, 4)
  } yield mkNodes(d, r, h)

  private def check(name: String, prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(100)
      .withInitialSeed(Seed(0xC0FFEE))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ------------------------------------------------------- properties

  test("property: choose→verify — picks on a healthy symmetric topology " +
    "are balanced-optimal (100 random topologies x workloads)") {
    check("choose-verify", Prop.forAllNoShrink(genSymTopo, Gen.choose(1, 48),
        Gen.choose(0L, 1L << 40)) { (nodes, kRaw, seed) =>
      val snap = mkSnap(nodes)
      val k = math.min(kRaw, nodes.size)
      val req = PlacementRequest(1L, k, None, Nil, returnChosen = false,
        excludes = Nil, blockSize = 1L << 20, policy = Map("DISK" -> k.toLong))
      val picks = PolicyEngine.chooseTarget(snap, req, new Random(seed))
      val paths = picks.map(st => snap.nodeByUuid(st.nodeUuid).path)
      (picks.size == k) :| s"size ${picks.size} != $k" &&
        modelVerify(nodes, paths, k) :| s"not balanced-optimal: $paths"
    })
  }

  test("property: choose safety — random health + exclusions never yield " +
    "an unhealthy, excluded, duplicate or space-starved pick") {
    val genCase = for {
      nodes <- genSymTopo
      unhealthy <- Gen.someOf(nodes.map(_.uuid))
      exclDcs <- Gen.someOf(nodes.map(n => PolicyEngine.topRack(n.path)).distinct)
      exclRacks <- Gen.someOf(nodes.map(n => PolicyEngine.parentPath(n.path)).distinct)
      k <- Gen.choose(1, 16)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (nodes, unhealthy.toSet, (exclDcs ++ exclRacks).toSeq, k, seed)
    check("choose-safety", Prop.forAllNoShrink(genCase) {
      case (nodes, unhealthy, excludes, k, seed) =>
        val snap = mkSnap(nodes, unhealthy)
        val req = PlacementRequest(1L, k, None, Nil, returnChosen = false,
          excludes = excludes, blockSize = 1L << 20,
          policy = Map("DISK" -> k.toLong))
        val picks = PolicyEngine.chooseTarget(snap, req, new Random(seed))
        val again = PolicyEngine.chooseTarget(snap, req, new Random(seed))
        val nodesOf = picks.map(st => snap.nodeByUuid(st.nodeUuid))
        (picks.size <= k) :| "over quota" &&
          (picks.map(_.nodeUuid).distinct.size == picks.size) :| "node reused" &&
          nodesOf.forall(_.healthy) :| "unhealthy pick" &&
          nodesOf.forall(n => !excludes.exists(n.path.startsWith)) :| "excluded pick" &&
          picks.forall(_.remaining >= req.blockSize) :| "space-starved pick" &&
          (again == picks) :| "nondeterministic under fixed seed"
    })
  }

  test("property: delete→re-verify — draining excess spread one-per-rack " +
    "restores balanced-optimal placement") {
    // Regime note (found BY this fuzzer, confirmed against the reference):
    // delete→re-verify is NOT unconditional. The deletion comparator sees
    // per-level OCCUPIED-CHILD counts (`getDatanodesInRack(...).size()`,
    // CrossAZBlockPlacementPolicy.java:566), never leaf counts — so when a
    // DC holds 4 replicas over 2 racks and its sibling holds 3 over 2
    // racks, every level ties and the comparator falls through to
    // space/id, which can drain the WRONG side and leave (2,2,4). The
    // reference's own test takes `satisfied_after_remove` as a per-case
    // parameter (TestCrossAZBlockPlacementPolicy.java:235-266) for exactly
    // this reason. With at most one occupied host per rack, occupied-child
    // counts EQUAL leaf counts at every level, the comparator sees true
    // crowding, and the invariant provably holds — that is the regime
    // fuzzed here (the engine-vs-reference parity of the blind spot itself
    // is pinned by the trace in DeletionSpec's comparator cases).
    val genCase = for {
      nodes <- genSymTopo
      k <- Gen.choose(1, 8)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (nodes, k, seed)
    check("delete-reverify", Prop.forAllNoShrink(genCase) {
      case (nodes, k, seed) =>
        val snap = mkSnap(nodes)
        val rnd = new Random(seed)
        // at most one occupied host per rack, each rack included w.p. ~2/3
        val candidates = nodes.groupBy(n => PolicyEngine.parentPath(n.path))
          .toVector.sortBy(_._1)
          .flatMap { case (_, hosts) =>
            if (rnd.nextInt(3) < 2) Some(s"st-${hosts(rnd.nextInt(hosts.size)).uuid}")
            else None
          }
        val expected =
          if (snap.numDcs == 2 && k > 1) math.min(4, k) else k
        // a balanced-optimal remainder of size `expected` exists iff the
        // per-DC candidate counts can cover the floor/ceil profile (or,
        // below DC count, `expected` distinct DCs are occupied) — deletion
        // can only RESTORE optimality when some subset has it
        val dcCount = candidates.groupBy(id =>
            PolicyEngine.topRack(snap.nodeByUuid(snap.storageById(id).nodeUuid).path))
          .view.mapValues(_.size).toMap
        val d = snap.numDcs
        val feasible =
          if (expected < d) dcCount.size >= expected
          else {
            val q = expected / d; val rem = expected % d
            val counts = (0 until d).map(i => dcCount.getOrElse(s"/dc$i", 0))
            counts.forall(_ >= q) && counts.count(_ >= q + 1) >= rem
          }
        val removed = PolicyEngine.chooseReplicasToDelete(snap, candidates, k)
        if (candidates.size <= expected)
          removed.isEmpty :| "within quota must remove nothing"
        else {
          val remaining = candidates.diff(removed.map(_.id))
          val remainingPaths = remaining
            .map(id => snap.nodeByUuid(snap.storageById(id).nodeUuid).path)
          (removed.size == candidates.size - expected) :|
            s"removed ${removed.size}, want ${candidates.size - expected}" &&
            removed.forall(st => candidates.contains(st.id)) :| "non-candidate removed" &&
            (removed.map(_.id).distinct.size == removed.size) :| "duplicate removal" &&
            (!feasible || modelVerify(nodes, remainingPaths, expected)) :|
              s"restorable but remainder not balanced-optimal: $remainingPaths"
        }
    })
  }

  test("property: delete safety — FAILED-only candidate sets are refused, " +
    "mixed sets keep a usable remainder") {
    val genCase = for {
      nodes <- genSymTopo.suchThat(_.size >= 3)
      nCand <- Gen.choose(3, 12).map(math.min(_, nodes.size))
      nFailed <- Gen.choose(0, nCand)
      k <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (nodes, nCand, nFailed, k, seed)
    check("delete-safety", Prop.forAllNoShrink(genCase) {
      case (nodes, nCand, nFailed, k, seed) =>
        val rnd = new Random(seed)
        val picked = rnd.shuffle(nodes).take(nCand)
        val failedUuids = picked.take(nFailed).map(_.uuid).toSet
        val snap = ClusterSnapshot(nodes,
          nodes.map(n => StorageMeta(s"st-${n.uuid}", n.uuid,
            if (failedUuids(n.uuid)) "FAILED" else "NORMAL", "DISK", 1L << 40)))
        val candidates = picked.map(n => s"st-${n.uuid}")
        val removed = PolicyEngine.chooseReplicasToDelete(snap, candidates, k)
        if (nFailed == nCand)
          removed.isEmpty :| "all-FAILED set must be refused"
        else {
          val remaining = candidates.diff(removed.map(_.id))
          removed.forall(st => candidates.contains(st.id)) :| "non-candidate" &&
            remaining.exists(id => snap.storageById(id).state != "FAILED") :|
              "no usable replica left" &&
            (removed.size == math.max(0, candidates.size -
              (if (snap.numDcs == 2 && k > 1) math.min(4, k) else k))) :| "quota"
        }
    })
  }

  test("property: favored seeding — picks start with the favoredEligible " +
    "prefix in caller order") {
    val genCase = for {
      nodes <- genSymTopo.suchThat(_.size >= 2)
      favored <- Gen.someOf(nodes.map(_.uuid))
      unhealthy <- Gen.someOf(nodes.map(_.uuid))
      k <- Gen.choose(1, 8)
      seed <- Gen.choose(0L, 1L << 40)
    } yield (nodes, favored.toSeq, unhealthy.toSet, k, seed)
    check("favored-prefix", Prop.forAllNoShrink(genCase) {
      case (nodes, favored, unhealthy, k, seed) =>
        val snap = mkSnap(nodes, unhealthy)
        val req = PlacementRequest(1L, k, None, Nil, returnChosen = false,
          excludes = Nil, blockSize = 1L << 20,
          policy = Map("DISK" -> k.toLong), favored = favored)
        val picks = PolicyEngine.chooseTarget(snap, req, new Random(seed))
        val eligible = PolicyEngine.favoredEligible(snap, req).map(_.uuid)
        val expectPrefix = eligible.take(math.min(k, eligible.size))
        picks.map(_.nodeUuid).startsWith(expectPrefix) :|
          s"picks ${picks.map(_.nodeUuid)} !startWith $expectPrefix"
    })
  }
}
