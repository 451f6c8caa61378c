package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Verification
import graft.sources.MetaFixtures

/** P10–P12 truth table transcribed from the reference's hand-drawn topology
  * cases (`TestCrossAZBlockPlacementPolicy.java:111-218`), evaluated over
  * the same 254-node fixture structure. */
class VerificationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val topo = MetaFixtures.topology(spark).cache()

  /** Node ids within (dc, rack), mirroring the reference's selectSubset. */
  private def subset(dc: String, rack: Int): Seq[Long] =
    (1 to MetaFixtures.NumNodes).filter { i =>
      (if (i % 2 == 0) "even" else "odd") == dc && i % 10 == rack
    }.map(_.toLong)

  private def verifyRow(require: Int, nodeIds: Seq[Long]): org.apache.spark.sql.Row = {
    val replicas = nodeIds.zipWithIndex
      .map { case (n, i) => (0L, i, s"dn-$n") }
      .toDF("block_id", "replica_index", "datanode_uuid")
    val blocks = Seq((0L, require)).toDF("block_id", "require_replica")
    Verification.verifyBalancedOptimal(replicas, topo, blocks).head()
  }

  private def verify(require: Int, nodeIds: Seq[Long]): (Boolean, String) = {
    val row = verifyRow(require, nodeIds)
    (row.getAs[Boolean]("satisfied"),
      Option(row.getAs[String]("reason_code")).getOrElse(""))
  }

  private def evenRack(r: Int) = subset("even", r)
  private def oddRack(r: Int) = subset("odd", r)

  test("under replication: single node, require 3") {
    val (ok, reason) = verify(3, Seq(1L))
    assert(!ok && reason == "not_enough")
  }

  test("null/empty replica set is never satisfied") {
    val (ok, reason) = verify(3, Nil)
    assert(!ok && reason == "not_enough")
  }

  test("same datanode three times, require 3") {
    val n = oddRack(1).head
    val (ok, reason) = verify(3, Seq(n, n, n))
    assert(!ok && reason == "not_optimal")
  }

  test("single datacenter across three racks, require 3") {
    val (ok, reason) = verify(3,
      Seq(evenRack(2).head, evenRack(4).head, evenRack(6).head))
    assert(!ok && reason == "not_optimal")
  }

  test("multi datacenter 2+1, require 3 is optimal") {
    val (ok, _) = verify(3,
      Seq(evenRack(2).head, evenRack(4).head, oddRack(1).head))
    assert(ok)
  }

  test("3 replicas but require 5 fails on count") {
    val (ok, reason) = verify(5,
      Seq(evenRack(2).head, evenRack(4).head, oddRack(1).head))
    assert(!ok && reason == "not_enough")
  }

  test("fully distributed 3+2 over 5 racks, require 5") {
    val (ok, _) = verify(5, Seq(evenRack(2).head, evenRack(4).head,
      evenRack(6).head, oddRack(1).head, oddRack(3).head))
    assert(ok)
  }

  test("doubled rack breaks rack-level spread, require 5") {
    val e4 = evenRack(4)
    val (ok, reason) = verify(5, Seq(evenRack(2).head, e4(0), e4(1),
      oddRack(1).head, oddRack(3).head))
    assert(!ok && reason == "not_optimal")
  }

  test("single-dc unbalanced racks, require 5") {
    val e2 = evenRack(2); val e4 = evenRack(4)
    val (ok, reason) = verify(5, Seq(e2(0), e2(1), e4(0), e4(1), e4(3)))
    assert(!ok && reason == "not_optimal")
  }

  test("over replication 2+2 with require 3 is satisfied") {
    val (ok, _) = verify(3, Seq(evenRack(2).head, evenRack(4).head,
      oddRack(1).head, oddRack(3).head))
    assert(ok)
  }

  test("P17: formatted violation messages match the reference shape") {
    // dn-1 lives at ip 10.202.77.1 (fixture arithmetic)
    val notEnough = verifyRow(3, Seq(1L))
    assert(notEnough.getAs[String]("reason") ==
      "not enough storage nodes:[(10.202.77.1)], require:3")
    // same node 3x -> count OK, spread violated; list has one entry per replica
    val n = oddRack(1).head
    val notOptimal = verifyRow(3, Seq(n, n, n))
    val ip = s"10.202.77.$n"
    assert(notOptimal.getAs[String]("reason") ==
      s"placement not optimal, datanodes:[($ip),($ip),($ip)], require replica:3")
    // empty replica set renders an empty node list
    assert(verifyRow(2, Nil).getAs[String]("reason") ==
      "not enough storage nodes:[], require:2")
    // satisfied placements carry no message (lazy-Supplier analog)
    assert(verifyRow(3,
      Seq(evenRack(2).head, evenRack(4).head, oddRack(1).head))
      .getAs[String]("reason") == null)
  }

  test("fast verify is a pure count check") {
    val replicas = Seq((1L, 0, "dn-1"), (1L, 1, "dn-1"), (2L, 0, "dn-3"))
      .toDF("block_id", "replica_index", "datanode_uuid")
    val blocks = Seq((1L, 2), (2L, 2), (3L, 1)).toDF("block_id", "require_replica")
    val res = Verification.verifyFast(replicas, blocks)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("satisfied")).toMap
    assert(res(1L) && !res(2L) && !res(3L))
  }

  test("dispatcher honors do-placement-only and fast-verify toggles") {
    val replicas = Seq((1L, 0, "dn-1")).toDF("block_id", "replica_index", "datanode_uuid")
    val blocks = Seq((1L, 3)).toDF("block_id", "require_replica")
    def run(): Boolean =
      Verification.verifyPlacements(spark, replicas, topo, blocks)
        .head().getAs[Boolean]("satisfied")
    spark.conf.set(GraftConf.DoPlacementOnlyKey, "true")
    assert(run()) // short-circuit: everything OK
    spark.conf.set(GraftConf.DoPlacementOnlyKey, "false")
    spark.conf.set(GraftConf.FastVerifyKey, "true")
    assert(!run()) // fast: 1 < 3
    spark.conf.set(GraftConf.FastVerifyKey, "false")
    assert(!run()) // full: under-replicated
    spark.conf.unset(GraftConf.DoPlacementOnlyKey)
    spark.conf.unset(GraftConf.FastVerifyKey)
  }
}
