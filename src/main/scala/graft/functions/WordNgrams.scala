package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n)` → ALL word n-grams in position order, WITH
  * multiplicity — the non-distinct sibling of [[WordShingles]].
  *
  * [[WordShingles]] dedups (the dedup/similarity kernels key on
  * presence), but within-doc repetition measurement needs every
  * occurrence: a doc that repeats one trigram fifty times must yield
  * fifty array elements, not one. Same single-pass tokenizer
  * (split on ' ', drop empties — the reference's `str.split()` for
  * single-space text, count_functions.py:2), no set, no dedup.
  *
  * Output length is exactly `max(0, n_tokens - n + 1)`, so
  * `size(word_ngrams(text, 1))` is the token count — callers derive
  * position totals from `size()` instead of re-tokenizing.
  */
case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val n = right.eval().asInstanceOf[Int]
        if (n >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(t: Any, unused: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var start = 0; var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) toks += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < out.length) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(j + k))
          k += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}
