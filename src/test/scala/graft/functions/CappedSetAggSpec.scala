package graft.functions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** CappedSetAgg's contract: behaviorally identical to
  * sort_array(collect_set(x)) + size<=cap filter, with a buffer that
  * never exceeds cap+1 elements and sticky overflow under ANY
  * reduce/merge interleaving. The differential leg runs through Spark
  * (real partial-agg + merge paths over multiple partitions); the
  * unit legs exercise the Aggregator directly so the stickiness and
  * exactness arguments in the scaladoc are pinned, not just prosed.
  *
  * Raw ScalaCheck generators sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class CappedSetAggSpec extends SparkSpec {

  // groups with degrees straddling the cap: dups common, some groups
  // exactly AT the cap (the boundary the filter keeps), some over
  private def edgesGen(cap: Int): Gen[List[(Long, Long)]] = for {
    nGroups <- Gen.chooseNum(1, 8)
    es <- Gen.sequence[List[List[(Long, Long)]], List[(Long, Long)]](
      (1 to nGroups).toList.map { g =>
        for {
          deg <- Gen.oneOf(Gen.chooseNum(1, cap), Gen.const(cap),
                           Gen.chooseNum(cap + 1, cap * 3))
          dups <- Gen.chooseNum(0, 20)
          extra <- Gen.listOfN(dups, Gen.chooseNum(0L, deg - 1L))
        } yield ((0L until deg.toLong).toList ++ extra)
          .map(v => (g.toLong, v))
      })
  } yield es.flatten

  test("capped set ≡ collect_set + size filter across real partial/merge paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cap = 7
    val agg = udaf(new CappedSetAgg(cap),
      org.apache.spark.sql.Encoders.scalaLong)
    (1 to 6).foreach { i =>
      val edges = edgesGen(cap)(Gen.Parameters.default, Seed(97L * i)).get
      // repartition(5) forces multi-partition partials → real merges
      val df = edges.toDF("pk", "sk").repartition(5)
      val got = df.groupBy("pk").agg(agg(col("sk")).as("sks"))
        .where(size(col("sks")) <= cap)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = df.groupBy("pk")
        .agg(sort_array(collect_set(col("sk"))).as("sks"))
        .where(size(col("sks")) <= cap)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got == want, s"seed ${97L * i}")
    }
  }

  test("overflow is sticky and exact sets are order-invariant under direct merge") {
    val cap = 4
    val a = new CappedSetAgg(cap)
    // exact group (3 distinct) split across buffers in two orders
    val x = List(5L, 1L, 5L).foldLeft(a.zero)(a.reduce)
    val y = List(3L, 1L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(a.merge(x, y)) == Seq(1L, 3L, 5L))
    assert(a.finish(a.merge(y, x)) == Seq(1L, 3L, 5L))
    // overflowing group: any interleaving ends length cap+1 (dropped by
    // the caller's filter), never back inside the <= cap range
    val big = (0L until (cap + 3).toLong).toList
    val (l, r) = big.splitAt(2)
    val bufL = l.foldLeft(a.zero)(a.reduce)
    val bufR = r.foldLeft(a.zero)(a.reduce)
    assert(a.merge(bufL, bufR).length == cap + 1)
    assert(a.merge(bufR, bufL).length == cap + 1)
    val serial = big.foldLeft(a.zero)(a.reduce)
    assert(serial.length == cap + 1)
    // re-merging an overflowed buffer with a small exact one stays over
    assert(a.merge(a.merge(bufL, bufR), y).length == cap + 1)
  }
}
