package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.Searching.{Found, InsertionPoint}

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
  */
class CappedSetAgg(cap: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val bound = cap + 1

  override def zero: Seq[Long] = Vector.empty

  private def insert(b: Seq[Long], v: Long): Seq[Long] =
    if (b.length >= bound) b
    else b.search(v) match {
      case Found(_)          => b
      case InsertionPoint(i) => (b.take(i) :+ v) ++ b.drop(i)
    }

  override def reduce(b: Seq[Long], v: Long): Seq[Long] = insert(b, v)

  // if either side already overflowed the merge is that side (sticky);
  // otherwise a fold of bounded inserts — O(min(|x|,|y|) * bound) worst
  // case with bound a small constant
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    if (x.length >= bound) x
    else if (y.length >= bound) y
    else if (x.length >= y.length) y.foldLeft(x)(insert)
    else x.foldLeft(y)(insert)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    ExpressionEncoder()
}
