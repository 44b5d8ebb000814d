package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Distinct-set collector with a HARD buffer bound: keeps at most
  * cap+1 distinct values (sorted ascending), and once a buffer holds
  * cap+1 the overflow state is sticky (reduce/merge stop adding).
  * Behaviorally equivalent to `sort_array(collect_set(x))` followed by
  * a `size(...) <= cap` filter — except the aggregation buffer itself
  * is bounded, which is the property the at-scale plan actually needs:
  * plain `collect_set` materializes a mega-degree key's entire set on
  * the reduce side BEFORE any size filter can drop it (gigabytes for a
  * 10^8-degree node), so a post-agg cap bounds the OUTPUT but not the
  * MEMORY. Here the buffer never exceeds cap+1 elements regardless of
  * true degree; a group whose true distinct count exceeds cap surfaces
  * as an array of length cap+1 for the caller's existing size filter.
  *
  * Overflow stickiness: values are only discarded once a buffer holds
  * cap+1 elements, and any merge involving such a buffer yields a
  * buffer of cap+1 (|x ∪ y| >= cap+1, re-capped), so a truncated group
  * can never shrink back into the <= cap range — and a group that
  * never overflows never discards, so every surviving set is exact.
  * The buffer is kept sorted (binary-search insert over n <= cap+1),
  * so `finish` needs no sort and callers get `sort_array` semantics
  * for free. Nulls are ignored (callers aggregate non-null keys).
  *
  * Buffer representation is a primitive sorted `Array[Long]`: the
  * census calls `reduce` once per input EDGE (600k/row-census at
  * sf0.1, billions at scale), and an immutable-Vector insert allocates
  * three structural nodes per row where the flat array needs one
  * allocation + two `System.arraycopy` runs — measured ~3× on the
  * census leg. Exact sets stay exact: only the representation changed.
  */
class CappedSetAgg(cap: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val bound = cap + 1

  override def zero: Array[Long] = Array.emptyLongArray

  private def insert(b: Array[Long], v: Long): Array[Long] = {
    if (b.length >= bound) return b // sticky overflow
    val i = java.util.Arrays.binarySearch(b, v)
    if (i >= 0) b // already present
    else {
      val ip = -i - 1
      val out = new Array[Long](b.length + 1)
      System.arraycopy(b, 0, out, 0, ip)
      out(ip) = v
      System.arraycopy(b, ip, out, ip + 1, b.length - ip)
      out
    }
  }

  override def reduce(b: Array[Long], v: Long): Array[Long] = insert(b, v)

  /** Two-pointer union of two sorted distinct arrays, truncated at
    * [[bound]]. If either side already overflowed the merge is that
    * side (sticky); if the union overflows, the result has length
    * exactly [[bound]] (the caller's size filter drops it — WHICH
    * bound elements survive is unobservable). */
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length >= bound) x
    else if (y.length >= bound) y
    else if (y.isEmpty) x
    else if (x.isEmpty) y
    else {
      val out = new Array[Long](math.min(x.length + y.length, bound))
      var i = 0; var j = 0; var k = 0
      while (k < out.length && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && x(i) <= y(j))
        if (takeX) {
          if (j < y.length && x(i) == y(j)) j += 1 // shared value: one copy
          out(k) = x(i); i += 1
        } else {
          out(k) = y(j); j += 1
        }
        k += 1
      }
      if (k == out.length && (i < x.length || j < y.length)) out // truncated at bound
      else if (k == out.length) out
      else java.util.Arrays.copyOf(out, k) // dups shrank the union below the estimate
    }

  override def finish(r: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(r)

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    ExpressionEncoder()
}
