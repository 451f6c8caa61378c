package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hilbert

/** ScalaCheck property fuzzing for the round-8 driver-side algorithms —
  * the pieces with non-trivial invariants that run engine-side in
  * microseconds, so 100-case properties cost nothing (the PolicyFuzzSpec
  * harness): the Hilbert walk, NFD bin packing, the Aho-Corasick
  * automaton, and the CMS inner-product estimator. Spark-side operators
  * keep their oracle + spec gates; these pin the algorithmic cores the
  * operators delegate to. */
class R8FuzzSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(100)
      .withInitialSeed(Seed(0xC0FFEE))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("property: hilbert index is injective and curve-adjacent on " +
      "random grids") {
    val gen = for {
      bits <- Gen.choose(2, 6)
      n = 1L << bits
    } yield (bits, n)
    check("hilbert", Prop.forAllNoShrink(gen) { case (bits, n) =>
      val cells = for (x <- 0L until n; y <- 0L until n)
        yield (Hilbert.index(x, y, bits), x, y)
      val sorted = cells.sortBy(_._1)
      val bijective = sorted.map(_._1) == (0L until n * n)
      val adjacent = sorted.sliding(2).forall {
        case Seq((_, x1, y1), (_, x2, y2)) =>
          math.abs(x1 - x2) + math.abs(y1 - y2) == 1
        case _ => true
      }
      (bijective :| "bijective onto [0, 4^bits)") &&
        (adjacent :| "consecutive positions grid-adjacent")
    })
  }

  test("property: NFD packing covers every item once, respects the " +
      "target, and is deterministic") {
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 120L))
      target <- Gen.choose(50L, 200L)
    } yield (sizes.zipWithIndex.map { case (s, i) => (f"f$i%03d", s) }, target)
    check("nfd", Prop.forAllNoShrink(gen) { case (items, target) =>
      val plan = graft.sources.Compaction
        .plan(items.toDF("item", "bytes"), target)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val byBin = plan.groupBy(_._1)
      val covered = plan.map(_._2).toSeq.sorted == items.map(_._1).sorted
      val sized = byBin.values.forall { bin =>
        bin.map(_._3).sum <= target || bin.length == 1
      }
      val contiguous = {
        val ids = byBin.keys.toSeq.sorted
        ids == (0L until ids.length.toLong)
      }
      val decreasingAcross = {
        // NFD: the largest item of bin i+1 is never larger than the
        // largest item of bin i (items arrive size-descending)
        val maxPer = byBin.toSeq.sortBy(_._1).map(_._2.map(_._3).max)
        maxPer.sliding(2).forall { case Seq(a, b) => b <= a; case _ => true }
      }
      (covered :| "every item exactly once") &&
        (sized :| "no multi-item bin over target") &&
        (contiguous :| "bin ids contiguous from 0") &&
        (decreasingAcross :| "size-descending across bins")
    })
  }

  test("property: automaton == brute-force position scan on random " +
      "pattern sets") {
    val gen = for {
      alpha <- Gen.const("ab")
      nPats <- Gen.choose(1, 8)
      pats <- Gen.listOfN(nPats,
        Gen.choose(1, 5).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf(alpha.toSeq)).map(_.mkString)))
      text <- Gen.choose(0, 300).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf(alpha.toSeq)).map(_.mkString))
    } yield (pats.distinct, text)
    check("aho-corasick", Prop.forAllNoShrink(gen) { case (pats, text) =>
      val got = new graft.pipeline.Blocklist.Automaton(pats)
        .countMatches(text).toSeq
      val want = pats.map { p =>
        (0 to text.length - p.length)
          .count(i => text.regionMatches(i, p, 0, p.length)).toLong
      }
      (got == want) :| s"pats=$pats got=$got want=$want"
    })
  }

  test("property: CMS inner product never undercounts the true join " +
      "size and is exact when wide") {
    import graft.functions.LongCms
    val gen = for {
      nA <- Gen.choose(1, 300)
      nB <- Gen.choose(1, 300)
      keyDomain <- Gen.choose(1L, 40L)
      a <- Gen.listOfN(nA, Gen.choose(0L, keyDomain))
      b <- Gen.listOfN(nB, Gen.choose(0L, keyDomain))
      width <- Gen.oneOf(16, 64, 4096)
    } yield (a, b, width)
    def sketch(vs: Seq[Long], width: Int): Array[Byte] = {
      val c = new Array[Long](4 * width)
      vs.foreach(v => LongCms.insert(c, 4, width, v))
      LongCms.serialize(c, 4, width)
    }
    check("cms-dot", Prop.forAllNoShrink(gen) { case (a, b, width) =>
      val est = LongCms.innerProduct(sketch(a, width), sketch(b, width))
      val ca = a.groupBy(identity).view.mapValues(_.size.toLong)
      val cb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
      ((est >= exact) :| s"undercount: est=$est exact=$exact") &&
        ((width < 4096 || est == exact) :| "wide sketch must be exact")
    })
  }
}
