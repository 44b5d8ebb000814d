package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `intersection_size(a, b)` ≡ `size(array_intersect(a, b))` without
  * materializing the intersection array.
  *
  * `array_intersect` hashes the right side, walks the left, and BUILDS
  * the distinct-common-elements array — which `size` immediately reduces
  * to a count. In the Jaccard verification kernel
  * (`graft.operators.Dedup.jaccardVerify`) that array is allocated once
  * per candidate pair, million-plus times per dedup run. This expression
  * keeps the two hash probes and drops the array construction.
  *
  * Semantics match `size(array_intersect(...))` exactly for the element
  * types the rewrite rule accepts (string/int/long — no NaN/-0.0
  * equality subtleties): count of DISTINCT elements of `a` that occur in
  * `b`, a null element counting if present in both; null array → null
  * (`size`'s non-legacy behavior).
  */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersection_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if a == b =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same element type, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  @transient private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val rb = b.asInstanceOf[ArrayData]
    val inRight = new java.util.HashSet[Any](rb.numElements() * 2)
    var rightHasNull = false
    var i = 0
    while (i < rb.numElements()) {
      if (rb.isNullAt(i)) rightHasNull = true
      else inRight.add(rb.get(i, elemType))
      i += 1
    }
    val counted = new java.util.HashSet[Any](la.numElements() * 2)
    var count = 0
    var countedNull = false
    i = 0
    while (i < la.numElements()) {
      if (la.isNullAt(i)) {
        if (rightHasNull && !countedNull) { count += 1; countedNull = true }
      } else {
        val v = la.get(i, elemType)
        if (inRight.contains(v) && counted.add(v)) count += 1
      }
      i += 1
    }
    count
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectionSize =
    copy(left = newLeft, right = newRight)
}

/** Injected optimizer rule: `Size(ArrayIntersect(a, b))` →
  * `IntersectionSize(a, b)` for atomic element types, under non-legacy
  * size-of-null semantics (legacy `size(NULL) = -1` would diverge —
  * those plans are left alone). Registered via
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions), so
  * user queries written the idiomatic way get the allocation-free form
  * automatically. */
object RewriteIntersectionSize extends Rule[LogicalPlan] {
  private def atomic(dt: DataType): Boolean = dt match {
    case ArrayType(StringType | IntegerType | LongType, _) => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), false)
          if atomic(l.dataType) && l.dataType == r.dataType =>
        IntersectionSize(l, r)
    }
}
