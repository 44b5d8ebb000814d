package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fingerprints(text, k, w)` → sorted distinct winnowing
  * fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the public
  * MOSS document-fingerprinting scheme):
  *
  *   1. tokenize on spaces (empties dropped),
  *   2. hash every word k-gram (positional — duplicates kept, unlike
  *      `word_shingles`): first 60 bits of md5 over the space-joined
  *      k-gram. md5 (not murmur/xx) so the whole pipeline is
  *      reproducible in any engine with an md5 builtin — the DuckDB
  *      oracle replays fingerprinting bit-for-bit,
  *   3. in each sliding window of w consecutive k-gram hashes, select
  *      the minimum (rightmost on ties — the selected VALUE is
  *      tie-invariant, which is what makes the SQL replay exact),
  *   4. return the distinct selected hashes, sorted.
  *
  * Guarantee: any shared token run of length ≥ k + w − 1 between two
  * documents produces at least one shared fingerprint, while storing
  * ~2/(w+1) of all k-gram hashes — the density/recall trade-off that
  * makes fingerprint-index dedup feasible at 100 TB.
  * One pass, O(tokens) window selection with a monotonic deque.
  */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        val k = second.eval().asInstanceOf[Int]
        val w = third.eval().asInstanceOf[Int]
        if (k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: k and w must be >= 1")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int literal, int literal)")
    }

  @transient private lazy val k: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val w: Int = third.eval().asInstanceOf[Int]

  override def nullSafeEval(t: Any, unused1: Any, unused2: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var start = 0; var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) toks += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])

    // positional k-gram hashes: 60-bit md5 prefix of the space-joined
    // k-gram (== DuckDB's CAST('0x' || substr(md5(g), 1, 15) AS BIGINT))
    val nGrams = toks.length - k + 1
    val hashes = new Array[Long](nGrams)
    val md = WinnowFingerprints.md5.get()
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(g + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = big-endian first 8 bytes, low nibble dropped
      var be = 0L
      var b = 0
      while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
      hashes(g) = be >>> 4
      g += 1
    }

    // winnow: min of each window of w (rightmost min on ties), deduped
    val picked = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var minIdx = 0
      var m = 1
      while (m < nGrams) { if (hashes(m) <= hashes(minIdx)) minIdx = m; m += 1 }
      picked.add(hashes(minIdx))
    } else {
      // monotonic deque of indices, increasing hash values
      val dq = new java.util.ArrayDeque[Int]()
      var idx = 0
      while (idx < nGrams) {
        while (!dq.isEmpty && hashes(dq.peekLast()) >= hashes(idx)) dq.pollLast()
        dq.addLast(idx)
        if (dq.peekFirst() <= idx - w) dq.pollFirst()
        if (idx >= w - 1) picked.add(hashes(dq.peekFirst()))
        idx += 1
      }
    }
    val out = new Array[Any](picked.size)
    val it = picked.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next().longValue(); m += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s2: Expression, t2: Expression): WinnowFingerprints =
    copy(first = f, second = s2, third = t2)
}

object WinnowFingerprints {
  // MessageDigest is stateful and not thread-safe; one per executor thread
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
