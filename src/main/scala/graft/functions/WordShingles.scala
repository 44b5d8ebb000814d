package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)` → distinct word n-grams, one pass.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * tok[i], ...)))` over `filter(split(text, ' '), t -> t <> '')` — but
  * that chain is five interpreted higher-order functions allocating
  * intermediate arrays per row; profiled at ~5 s per evaluation over a
  * 5k-doc corpus, and dedup plans evaluate the subtree several times.
  * This expression tokenizes, shingles, and dedups in a single scan
  * (~50× less work per row), which is what the 100 TB dedup path needs.
  *
  * n = 1 yields distinct tokens (the SimHash/unigram case).
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

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
    // split(text, ' ') + drop empties — same as the reference's
    // str.split() for single-space text (count_functions.py:2)
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
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      var j = 0
      val last = toks.length - n
      val sb = new java.lang.StringBuilder(64)
      while (j <= last) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(j + k))
          k += 1
        }
        seen.add(sb.toString)
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var m = 0
      while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}
