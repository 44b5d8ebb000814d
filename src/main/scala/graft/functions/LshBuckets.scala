package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The deterministic ±1 random-hyperplane family shared by the Scala
  * plan side and the DuckDB oracle rendering: plane (t, j) is seeded by
  * the fixed affine formula, so both engines (and every round) agree
  * bit-for-bit on the model without shipping it. */
object LshPlanes {
  val Dim = 64
  def plane(t: Int, j: Int): Array[Double] = {
    val rnd = new scala.util.Random(7919L * t + 104729L * j + 42)
    Array.fill(Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }
  /** Flat t-major / j-minor layout: offset ((t·bits)+j)·Dim. */
  def flat(tables: Int, bits: Int): Array[Double] = {
    val out = new Array[Double](tables * bits * Dim)
    var t = 0
    while (t < tables) {
      var j = 0
      while (j < bits) {
        System.arraycopy(plane(t, j), 0, out, ((t * bits) + j) * Dim, Dim)
        j += 1
      }
      t += 1
    }
    out
  }
}

/** All L sign-LSH bucket ids of a double vector in ONE expression:
  * `lsh_buckets(v, tables, bits)` returns `array<int>` of length
  * `tables`, element t = Σ_j 2^j · [dot(v, plane_tj) > 0].
  *
  * Exists because the one-expression-per-(t, j) composition this
  * replaces (96 `dot_prod(v, array(<64 literals>))` calls at the
  * k=8/L=12 design point) bloats the generated projection past
  * Janino's 64 KB method limit — whole-stage codegen either compiles
  * for seconds per action or fails outright and falls back to
  * interpreted evaluation (measured: 8-16 s per bucketing pass at
  * 20k rows; the round-15 scale audit's sim_* regression). Here the
  * plane matrix rides along as ONE reference object and the generated
  * code is a fixed triple loop, independent of (tables, bits). */
case class LshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  @transient private lazy val planes: Array[Double] =
    LshPlanes.flat(tables, bits)

  // The plane family is fixed at LshPlanes.Dim (64): a shorter/longer
  // input would silently compute a PARTIAL dot here while the DuckDB
  // oracle's list_zip NULL-pads the mismatch into a NULL dot (bit = 0)
  // — the engines would diverge. Fail fast instead (advice r15).
  private def requireDim(len: Int): Unit =
    if (len != LshPlanes.Dim) throw new IllegalArgumentException(
      s"lsh_buckets requires a ${LshPlanes.Dim}-dim vector, got $len")

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData].toDoubleArray()
    requireDim(x.length)
    val dim = LshPlanes.Dim
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        val off = ((t * bits) + j) * LshPlanes.Dim
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += x(i) * planes(off + i); i += 1 }
        if (dot > 0.0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val x = ctx.freshName("x"); val out = ctx.freshName("out")
      val dim = ctx.freshName("dim"); val t = ctx.freshName("t")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val bkt = ctx.freshName("bkt")
      val off = ctx.freshName("off")
      s"""
         |double[] $x = $a.toDoubleArray();
         |if ($x.length != ${LshPlanes.Dim})
         |  throw new IllegalArgumentException(
         |    "lsh_buckets requires a ${LshPlanes.Dim}-dim vector, got " + $x.length);
         |int $dim = ${LshPlanes.Dim};
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bkt = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $off = (($t * $bits) + $j) * ${LshPlanes.Dim};
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) { $dot += $x[$i] * $p[$off + $i]; }
         |    if ($dot > 0.0) $bkt |= (1 << $j);
         |  }
         |  $out[$t] = $bkt;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
