package graft.api

import scala.collection.mutable

/** Shared flush-on-limit combine primitive (Disco's user-managed combiner
  * flush, func.py:48-71): accumulate per-key state in insertion order, emit
  * everything + reset whenever the caller-defined size counter reaches
  * `cap`, and flush the tail lazily after the input drains. One copy of
  * the subtle body-plus-lazy-tail iterator, used by the Classic combiner
  * (bounds TOTAL buffered values) and Pipeline.combineStage (bounds
  * distinct keys).
  */
private[graft] object FlushBuffer {
  def run[T, K, A, O](it: Iterator[T])(key: T => K)(init: T => A)(
      merge: (A, T) => A)(sizeDelta: (Boolean, T) => Long)(cap: Long)(
      emit: (K, A) => Iterator[O]): Iterator[O] = {
    val buf = mutable.LinkedHashMap.empty[K, A]
    var size = 0L
    def flush(): Iterator[O] = {
      val out = buf.iterator.flatMap { case (k, a) => emit(k, a) }.toList
      buf.clear(); size = 0L
      out.iterator
    }
    val body = it.flatMap { t =>
      val k = key(t)
      val isNew = !buf.contains(k)
      buf(k) = if (isNew) init(t) else merge(buf(k), t)
      size += sizeDelta(isNew, t)
      if (size >= cap) flush() else Iterator.empty
    }
    body ++ new Iterator[O] {
      private var tail: Iterator[O] = null
      def hasNext = { if (tail == null) tail = flush(); tail.hasNext }
      def next() = { if (tail == null) tail = flush(); tail.next() }
    }
  }
}
