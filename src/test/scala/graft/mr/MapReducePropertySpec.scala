package graft.mr

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (FIXTURES.md §3): façade ≡ relational groupBy.count for
  * arbitrary skewed token streams; combiner presence never changes the
  * result for algebraic aggregates.
  *
  * Raw ScalaCheck generators sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class MapReducePropertySpec extends SparkSpec {

  private val tokenGen = Gen.frequency(
    (5, Gen.const("the")), (3, Gen.const("a")),
    (2, Gen.oneOf("fox", "dog", "cat")),
    (1, Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))))

  private val linesGen: Gen[List[String]] =
    Gen.listOfN(8, Gen.listOf(tokenGen).map(_.mkString(" ")))

  private def samples(n: Int): Seq[List[String]] =
    (1 to n).flatMap(i => linesGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("façade word count ≡ DataFrame groupBy.count for arbitrary token streams") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    samples(10).foreach { lines =>
      val ds = spark.createDataset(lines.map(("t", _)))
      val mr = MapReduceJob[String, Long, Long](
        (_, v) => v.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
        (k, vs) => (k, vs.sum), Some((k, vs) => (k, vs.sum)))
        .run(ds).collect().toMap
      val df = spark.createDataset(lines).toDF("value")
        .select(explode(split(col("value"), "\\s+")).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mr == df, s"for input $lines")
    }
  }

  test("combiner presence/absence invariant for algebraic reduce") {
    import spark.implicits._
    samples(10).foreach { lines =>
      val ds = spark.createDataset(lines.map(("t", _)))
      val base = MapReduceJob[String, Long, Long](
        (_, v) => v.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
        (k, vs) => (k, vs.sum))
      val comb: Option[(String, Seq[Long]) => (String, Long)] =
        Some((k, vs) => (k, vs.sum))
      assert(base.run(ds).collect().toMap ==
        base.copy(combiner = comb).run(ds).collect().toMap,
        s"for input $lines")
    }
  }
}
