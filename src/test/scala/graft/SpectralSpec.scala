package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Spectral

/** Spectral direction: moment-matrix exactness, truncating-division
  * semantics (the DuckDB `//` contract), plan shape, and recovery of a
  * planted dominant axis. */
class SpectralSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def embs(rows: Seq[Float]*) =
    rows.map(Tuple1(_)).toDF("embedding")

  test("truncDiv truncates toward zero on every sign combination " +
      "(DuckDB // semantics: -7000000 // 3 = -2333333, NOT floor)") {
    assert(Spectral.truncDiv(BigInt(7), BigInt(2)) == BigInt(3))
    assert(Spectral.truncDiv(BigInt(-7), BigInt(2)) == BigInt(-3))
    assert(Spectral.truncDiv(BigInt(7), BigInt(-2)) == BigInt(-3))
    assert(Spectral.truncDiv(BigInt(-7), BigInt(-2)) == BigInt(3))
    assert(Spectral.truncDiv(BigInt(-6), BigInt(2)) == BigInt(-3))
    assert(Spectral.truncDiv(BigInt(-7000000), BigInt(3)) == BigInt(-2333333))
  }

  test("dominantDirection replays an in-test BigInt reference with " +
      "truncating renormalization on negative-component iterates") {
    // Mixed-sign fixture chosen so iterates carry NEGATIVE components
    // that are NOT divisible by the max-abs normalizer — exactly the
    // case where floor division would diverge from DuckDB's truncating
    // `//` (the round-8 latent bug: green only because the sf fixtures
    // never produced such a component).
    val rows = Seq(
      Seq(0.3f, -0.7f, 0.11f),
      Seq(-0.9f, 0.2f, 0.45f),
      Seq(0.17f, 0.5f, -0.33f))
    def mic(v: Float) = BigInt(math.floor(v.toDouble * 1e6).toLong)
    val m = Array.tabulate(3, 3) { (i, j) =>
      rows.map(x => mic(x(i)) * mic(x(j))).sum
    }
    var v = Array.fill[BigInt](3)(BigInt(1))
    var sawNegNonDivisible = false
    (1 to 3).foreach { _ =>
      val next = Array.tabulate(3)(i => (0 until 3).map(j => m(i)(j) * v(j)).sum)
      val mx = next.map(_.abs).max
      if (next.exists(x => x.signum < 0 && (x * BigInt(1000000)) % mx != 0))
        sawNegNonDivisible = true
      v = next.map(x => (x * BigInt(1000000)) / mx) // BigInt / truncates
    }
    assert(sawNegNonDivisible,
      "fixture must exercise the floor-vs-trunc divergence case")
    val got = Spectral.dominantDirection(embs(rows: _*), dims = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 3).foreach(i => assert(got(i.toLong) == v(i).toLong, s"dim $i"))
  }

  test("momentMatrix equals the brute-force outer-product sum") {
    val rows = Seq(Seq(1.0f, 2.0f, -0.5f), Seq(0.25f, -1.0f, 3.0f))
    val got = Spectral.momentMatrix(embs(rows: _*), 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap
    def mic(v: Float) = BigInt(math.floor(v.toDouble * 1e6).toLong)
    for (i <- 0 until 3; j <- 0 until 3) {
      val want = rows.map(x => mic(x(i)) * mic(x(j))).sum
      assert(got((i, j)) == want, s"entry ($i,$j)")
      assert(got((i, j)) == got((j, i))) // symmetry
    }
  }

  test("moment pass is shuffle-free up to the d^2-row final aggregate") {
    val df = Spectral.momentMatrix(embs(Seq(1f, 2f), Seq(3f, 4f)), 2)
    val plan = df.queryExecution.executedPlan.toString
    // exactly one exchange (the tiny (i, j) rollup), nothing corpus-sized
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("power iteration recovers a planted dominant axis") {
    // 40 vectors strongly aligned with dim 1, small noise on dim 0/2
    val rows = (0 until 40).map { k =>
      val s = if (k % 2 == 0) 1f else -1f
      Seq(0.01f * (k % 3), s * 0.9f, 0.02f * (k % 5))
    }
    val dir = Spectral.dominantDirection(embs(rows: _*), dims = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(dir(1L)) == 1000000L, dir) // dominant axis at full scale
    assert(math.abs(dir(0L)) < 100000L && math.abs(dir(2L)) < 100000L, dir)
  }

  test("iterates are deterministic across re-runs") {
    val rows = (0 until 10).map(k => Seq(k * 0.1f, 1f - k * 0.05f, -0.3f))
    val a = Spectral.dominantDirection(embs(rows: _*), 3).collect().toSeq
    val b = Spectral.dominantDirection(embs(rows: _*), 3).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
