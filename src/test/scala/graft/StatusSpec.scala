package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Status
import graft.sources.MetaFixtures

class StatusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("status JSON reflects live conf toggles and datanode census") {
    val topo = MetaFixtures.topology(spark)
    val dns = MetaFixtures.datanodes(spark)
    spark.conf.set(GraftConf.FastVerifyKey, "false")
    spark.conf.set(GraftConf.FallbackKey, "true")
    try {
      val json = Status.statusJson(spark, topo, dns)
      assert(json.contains(""""fast-verify":false"""))
      assert(json.contains(""""fallback":true"""))
      assert(json.contains(""""do-placement-only":true"""))
      assert(json.contains(""""policy":"graft.plans.PolicyEngine""""))
      // healthy nodes only: fewer than the full census but most of it
      val n = """"address":""".r.findAllIn(json).length
      assert(n > 100 && n < MetaFixtures.NumNodes)
      // flip a toggle: immediately visible
      spark.conf.set(GraftConf.FastVerifyKey, "true")
      assert(Status.statusJson(spark, topo, dns).contains(""""fast-verify":true"""))
    } finally {
      spark.conf.unset(GraftConf.FastVerifyKey)
      spark.conf.unset(GraftConf.FallbackKey)
    }
  }
}
