package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash60(text)` → the 60-bit SimHash signature, row-local.
  *
  * Why an Expression: the batch signature was an explode → 60 vote-sums
  * → bit-pack aggregation — partial-agg'd, but still one corpus-wide
  * shuffle of (doc_id, 60 ints) rows plus a token explode feeding it.
  * The signature is a pure function of one row's text, so the right
  * 100 TB plan is a NARROW projection: zero exchanges, scan-bound,
  * inside the whole-stage-codegen span (`doGenCode` emits a single
  * static call — no boxing, no Row conversion). The vote-aggregation
  * form survives as the differential reference in `DedupSpec`, and the
  * DuckDB oracle still replays the md5 bit votes independently.
  *
  * Same hash family as everything else in the dedup suite: per distinct
  * whitespace token, the first 60 bits of md5 vote ±1 per bit position;
  * positive votes set the bit. Bit-identical to the streaming path by
  * construction — [[graft.streaming.DedupStreams.simhash60]] delegates
  * to this kernel.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(t: Any): Any =
    SimHash60.hash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  // MessageDigest is stateful and not thread-safe; one per task thread,
  // reset per token — allocation-free on the hot path
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Codegen entry point (called from generated Java). */
  def hash(u: UTF8String): Long = hashText(u.toString)

  /** The ONE kernel rendering: distinct whitespace tokens, first 60
    * bits of each token's md5 vote ±1 per position, positive votes set
    * the bit. Shared by this expression and the streaming row-local
    * path, so batch and stream cannot drift. */
  def hashText(text: String): Long = {
    val toks = text.split(' ').filter(_.nonEmpty).distinct
    if (toks.isEmpty) return 0L
    val md = md5.get()
    val votes = new Array[Int](60)
    toks.foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var be = 0L
      var b = 0
      while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
      val h = be >>> 4
      var j = 0
      while (j < 60) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
