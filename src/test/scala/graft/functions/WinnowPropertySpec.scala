package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow

/** Pure expression-level properties of winnowing (no Spark jobs):
  * the shared-run guarantee and the density bound, over random corpora.
  * Evaluated directly through the Catalyst expression with Literal
  * children — the same code path executors run. */
class WinnowPropertySpec extends AnyFunSuite {

  private val K = 5; private val W = 4

  private def winnow(text: String): Set[Long] = {
    val e = WinnowFingerprints(Literal(text), Literal(K), Literal(W))
    e.eval(InternalRow.empty).asInstanceOf[ArrayData].toLongArray().toSet
  }

  private val token = Gen.oneOf(
    "key", "agg", "row", "scan", "fast", "table", "value", "part", "hash",
    "merge", "batch", "spark", "data", "window", "join", "query", "line")
  private def tokens(n: Int) = Gen.listOfN(n, token)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("shared run of >= K+W-1 tokens always yields a shared fingerprint") {
    (1 to 30).foreach { i =>
      val run = sample(tokens(K + W - 1), 1000L + i).mkString(" ")
      val pre1 = sample(tokens(10), 2000L + i).mkString(" ")
      val post1 = sample(tokens(10), 3000L + i).mkString(" ")
      val pre2 = sample(tokens(7), 4000L + i).mkString(" ")
      val post2 = sample(tokens(13), 5000L + i).mkString(" ")
      val a = winnow(s"$pre1 $run $post1")
      val b = winnow(s"$pre2 $run $post2")
      assert((a & b).nonEmpty, s"iteration $i: no shared fingerprint for shared run '$run'")
    }
  }

  test("fingerprint density stays near 2/(w+1) of k-grams") {
    (1 to 20).foreach { i =>
      val n = 80 + (i % 40)
      val text = sample(tokens(n), 7000L + i).mkString(" ")
      val kGrams = n - K + 1
      val fp = winnow(text).size
      assert(fp <= kGrams, s"more fingerprints than k-grams")
      // expected ~2/(w+1) ≈ 0.4; generous upper bound 0.8 (dups reduce it)
      assert(fp <= kGrams * 0.8, s"density ${fp.toDouble / kGrams} too high for n=$n")
      assert(fp >= kGrams / (2 * W), s"density ${fp.toDouble / kGrams} too low")
    }
  }

  test("winnowing is invariant to duplicate-free reordering only in set terms") {
    // regression pin: fingerprints are positional — reversing token order
    // changes the set (unlike word_shingles' set semantics)
    val t = "key agg row scan fast table value part hash merge batch spark"
    val rev = t.split(" ").reverse.mkString(" ")
    assert(winnow(t) != winnow(rev))
  }
}
