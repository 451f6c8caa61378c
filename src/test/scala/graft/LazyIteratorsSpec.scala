package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.LazyIterators._

class LazyIteratorsSpec extends AnyFunSuite {

  test("concat is lazy: suppliers invoked only when reached") {
    var invoked = Vector.empty[Int]
    def part(i: Int) = () => { invoked :+= i; Iterator(i * 10, i * 10 + 1) }
    val it = concat(Iterator(part(1), part(2), part(3)))
    assert(invoked.isEmpty)
    assert(it.next() == 10)
    assert(invoked == Vector(1))
    assert(it.take(2).toList == List(11, 20))
    assert(invoked == Vector(1, 2))
  }

  test("mergeDedup merges sorted inputs, deduping equal heads across inputs") {
    val out = mergeDedup(Seq(Iterator(1, 3, 5), Iterator(1, 2, 5, 7), Iterator(3)))
    assert(out.toList == List(1, 2, 3, 5, 7))
  }

  test("mergeDedup preserves duplicates within a single input") {
    val out = mergeDedup(Seq(Iterator(1, 1, 2), Iterator(1, 4)))
    // round 1: both heads 1 -> emit once; round 2: head 1 (input A) again
    assert(out.toList == List(1, 1, 2, 4))
  }

  test("mergeDedup handles empty and exhausted inputs") {
    assert(mergeDedup(Seq.empty[Iterator[Int]]).toList == Nil)
    assert(mergeDedup(Seq(Iterator.empty[Int], Iterator(2, 4))).toList == List(2, 4))
  }

  test("unfold produces until None") {
    var i = 0
    val out = unfold(() => { i += 1; if (i <= 3) Some(i) else None })
    assert(out.toList == List(1, 2, 3))
  }

  test("unfoldCtx threads evolving context") {
    // fibonacci from (a, b) context
    val out = unfoldCtx((0L, 1L))(
      c => if (c._1 > 50) None else Some(c._1),
      (c: (Long, Long), _: Long) => (c._2, c._1 + c._2))
    assert(out.toList == List(0L, 1L, 1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L))
  }

  test("memorial iterator remembers the last delivered value") {
    val m = memorial(Iterator(1, 2, 3))
    assert(m.memory.isEmpty)
    m.next(); m.next()
    assert(m.memory.contains(2))
    assert(m.toList == List(3))
    assert(m.memory.contains(3))
  }

  test("stream bridges an iterator lazily") {
    val s = stream(Iterator.from(1))
    assert(s.take(4).toList == List(1, 2, 3, 4))
  }
}
