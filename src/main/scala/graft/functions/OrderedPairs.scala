package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `ordered_pairs(array<long>)` → all unordered pairs of DISTINCT array
  * positions, each PACKED into one long (`min << 32 | max`) — the pair
  * fan-out kernel of the bipartite-projection census
  * (`gr_cosuppliers` / `gr_knn_graph` / `gr_triangles` /
  * `gr_labelprop`).
  *
  * Replaces the declarative chain
  * `flatten(transform(sks, (x, i) -> transform(slice(sks, i+2, ...),
  * y -> struct(x, y))))`, which allocates a fresh slice array PER
  * ELEMENT (O(deg²) array allocations per group) and forces the
  * downstream rollup onto a two-field STRUCT grouping key. One packed
  * long per pair means: a single output array allocation, and the
  * count-shared-parts groupBy runs on a primitive long key — the
  * difference between an interpreted fan-out and a codegen'd
  * hash-agg at 8.7M pairs per sf0.1 census (measured 2× on the full
  * query).
  *
  * The input is sorted internally (≤ cap+1 elements — the census caps
  * group size upstream, so the sort is O(cap log cap) driver-free
  * work), making `min/max` positional: pair (i<j) packs
  * `sorted(i) << 32 | sorted(j)`. Keys must fit in 31 bits;
  * out-of-range keys THROW (loud, never a silent wrong pack) — 2^31
  * node ids bounds the projection far above any per-group cap that
  * keeps it viable, and the unpack is `pair >> 32` / `pair & 0x7FFFFFFF`.
  */
case class OrderedPairsPacked(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ordered_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    OrderedPairsPacked.pack(v.asInstanceOf[ArrayData])

  /** Codegen: one static call into [[OrderedPairsPacked.pack]]. The
    * point is not the call itself but what it unblocks — a
    * CodegenFallback generator forces `explode(ordered_pairs(...))`'s
    * GenerateExec out of whole-stage codegen, which detaches the
    * downstream partial hash-count of the pair census into interpreted
    * row-at-a-time processing over the FANNED-OUT stream (8.7M rows at
    * sf0.1, quadratically more at scale). With a real doGenCode the
    * generate + partial-agg pipeline fuses into one codegen'd stage. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.OrderedPairsPacked.pack($in);")

  override protected def withNewChildInternal(newChild: Expression): OrderedPairsPacked =
    copy(child = newChild)
}

object OrderedPairsPacked {
  /** The fan-out kernel (shared by interpreted eval and generated
    * code — Scala emits a static forwarder for this method, which is
    * what the Janino-compiled codegen calls). */
  def pack(in: ArrayData): ArrayData = {
    val n = in.numElements()
    val a = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = in.getLong(i)
      if (x < 0L || x > 0x7FFFFFFFL)
        throw new IllegalArgumentException(
          s"ordered_pairs: key $x outside packable range [0, 2^31)")
      a(i) = x
      i += 1
    }
    java.util.Arrays.sort(a)
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val hi = a(i) << 32
      var j = i + 1
      while (j < n) {
        out(k) = hi | a(j)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
