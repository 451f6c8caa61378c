package graft.util

/** Iterator/dataflow algebra — the Spark-free re-expression of the
  * reference's `com.fs.misc.LazyIterators` (`LazyIterators.java:17-218`).
  * The observable semantics are preserved; implementations are idiomatic
  * Scala iterators. (U5 async prefetch is intentionally absent: Spark's
  * pipelined vectorized readers subsume it, SURVEY §2.3.)
  */
object LazyIterators {

  /** U1: lazily flatten iterator suppliers — each supplier is invoked only
    * when the consumer reaches it (ref `:78-102`). */
  def concat[T](parts: Iterator[() => Iterator[T]]): Iterator[T] =
    parts.flatMap(supplier => supplier())

  /** U6: iterator remembering the last delivered element (ref `:17-41`). */
  final class MemorialIterator[T](underlying: Iterator[T]) extends Iterator[T] {
    private var lastOpt: Option[T] = None
    override def hasNext: Boolean = underlying.hasNext
    override def next(): T = { val v = underlying.next(); lastOpt = Some(v); v }
    /** Last value handed out, if any. */
    def memory: Option[T] = lastOpt
  }

  def memorial[T](it: Iterator[T]): MemorialIterator[T] = new MemorialIterator(it)

  /** U2: k-way sorted merge with *cross-input* dedup (ref `:104-140`): each
    * round emits the minimum head once and advances every input whose head
    * compares equal to it. Duplicates within a single input are preserved
    * (they surface on successive rounds); equal heads across inputs
    * collapse. Exhausted inputs drop out. */
  def mergeDedup[T](inputs: Seq[Iterator[T]])(implicit ord: Ordering[T]): Iterator[T] =
    new Iterator[T] {
      private val heads = scala.collection.mutable.ArrayBuffer.empty[scala.collection.BufferedIterator[T]]
      inputs.foreach { it => val b = it.buffered; if (b.hasNext) heads += b }
      override def hasNext: Boolean = heads.nonEmpty
      override def next(): T = {
        val min = heads.iterator.map(_.head).min(ord)
        var i = 0
        while (i < heads.length) {
          if (ord.equiv(heads(i).head, min)) {
            heads(i).next()
            if (!heads(i).hasNext) { heads.remove(i); i -= 1 }
          }
          i += 1
        }
        min
      }
    }

  /** U3: stateless unfold — produce until the supplier returns None
    * (ref `:142-162`). */
  def unfold[T](gen: () => Option[T]): Iterator[T] =
    Iterator.continually(gen()).takeWhile(_.isDefined).map(_.get)

  /** U4: contextful unfold — the context evolves with each produced element
    * (ref `:164-194`). */
  def unfoldCtx[C, T](init: C)(gen: C => Option[T], update: (C, T) => C): Iterator[T] =
    new Iterator[T] {
      private var ctx = init
      private var nextOpt: Option[T] = gen(ctx)
      override def hasNext: Boolean = nextOpt.isDefined
      override def next(): T = {
        val v = nextOpt.get
        ctx = update(ctx, v)
        nextOpt = gen(ctx)
        v
      }
    }

  /** U7: Iterator -> Scala LazyList bridge (the reference bridges to Java
    * Stream, ref `:212-218`). */
  def stream[T](it: Iterator[T]): LazyList[T] = LazyList.from(it)
}
