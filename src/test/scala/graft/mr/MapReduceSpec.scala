package graft.mr

import graft.SparkSpec

/** Tokenizers live outside the suite so Dataset closures don't capture
  * the (non-serializable) ScalaTest engine. */
object MrTestFns {
  def tokens(line: String): Seq[String] =
    line.split("\\s+").filter(_.nonEmpty).toSeq
}

/** Structured MR key for the keys-need-total-equality contract test
  * (`MapReduce.scala:28-29`): top-level so the Dataset encoder derives
  * cleanly (no outer-instance capture). */
case class Bigram(a: String, b: String)

/** Differential tests against in-process Scala oracles — the reference's
  * own test strategy (`counting_words.py:15-36`, `word_set_example.py:
  * 15-34`) industrialized (SURVEY.md §5). */
class MapReduceSpec extends SparkSpec {
  import MrTestFns.tokens

  // A corpus with the properties FIXTURES.md §1 calls for: repeats,
  // punctuation (so \s+ and \w+ tokenizers differ), empty lines,
  // multi-space runs.
  private val corpus: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the  quick   brown fox",
    "",
    "hello, world! hello again - again",
    "nodes store key/value pairs; keys are 160-bit identifiers",
    "   leading and trailing   ",
    "UPPER lower Mixed UPPER",
  )

  private def records = {
    import spark.implicits._
    spark.createDataset(corpus.map(l => ("test", l)))
  }

  test("word count matches in-process oracle (counting_words.py semantics)") {
    import spark.implicits._
    val job = MapReduceJob[String, Long, Long](
      mapper = (_, v) => tokens(v).iterator.map(_ -> 1L),
      reducer = (k, vs) => (k, vs.sum),
      combiner = Some((k, vs) => (k, vs.sum)))
    val got = job.run(records).collect().toMap
    val oracle = corpus.flatMap(tokens).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == oracle)
  }

  test("case-class key: grouping follows encoded equality (keys need a total equality/hash)") {
    import spark.implicits._
    // the documented contract (MapReduce.scala:28-29): any key with a
    // total equality works — Spark groups on the ENCODED form, so a
    // structured key must group exactly like its value-equality classes
    val job = MapReduceJob[Bigram, Long, Long](
      mapper = (_, v) => {
        val t = tokens(v)
        t.zip(t.drop(1)).iterator.map { case (a, b) => Bigram(a, b) -> 1L }
      },
      reducer = (k, vs) => (k, vs.sum),
      combiner = Some((k, vs) => (k, vs.sum)))
    val got = job.run(records).collect().toMap
    val oracle = corpus
      .flatMap { l => val t = tokens(l); t.zip(t.drop(1)) }
      .groupBy(identity).view
      .map { case ((a, b), hits) => Bigram(a, b) -> hits.size.toLong }.toMap
    assert(got == oracle)
    // combiner path and plain path agree on the structured key too
    val plain = MapReduceJob[Bigram, Long, Long](job.mapper, job.reducer, None)
      .run(records).collect().toMap
    assert(plain == got)
  }

  test("word count without combiner gives identical result") {
    import spark.implicits._
    val withC = MapReduceJob[String, Long, Long](
      (_, v) => tokens(v).iterator.map(_ -> 1L), (k, vs) => (k, vs.sum),
      Some((k, vs) => (k, vs.sum)))
    val withoutC = withC.copy(combiner = None)
    assert(withC.run(records).collect().toMap == withoutC.run(records).collect().toMap)
  }

  test("distinct words matches in-process set oracle (word_set_example.py semantics)") {
    import spark.implicits._
    val job = MapReduceJob[String, Boolean, Boolean](
      (_, v) => tokens(v).iterator.map(_ -> true), (k, _) => (k, true),
      Some((k, _) => (k, true)))
    val got = job.run(records).collect().map(_._1).toSet
    assert(got == corpus.flatMap(tokens).toSet)
    // the reference harness asserts no duplicate keys ("Se partiio")
    assert(job.run(records).collect().length == got.size)
  }

  test("regex \\w+ tokenizer differs from whitespace on punctuation (fernan semantics)") {
    import spark.implicits._
    val re = "\\w+".r
    val job = MapReduceJob[String, Boolean, Boolean](
      (_, v) => re.findAllIn(v).map(_ -> true), (k, _) => (k, true))
    val got = job.run(records).collect().map(_._1).toSet
    val oracle = corpus.flatMap(l => re.findAllIn(l)).toSet
    assert(got == oracle)
    assert(got.contains("hello") && !got.contains("hello,"))
    assert(got.contains("160") && got.contains("bit")) // \w splits 160-bit
  }

  test("group-by average via (sum,count) accumulator (README.md:25-36 recipe)") {
    import spark.implicits._
    val rows = Seq(("rex", "4"), ("rex", "6"), ("fido", "3"), ("rex", "5"), ("fido", "1"))
    val ds = spark.createDataset(rows)
    val job = MapReduceJob[String, (Long, Long), Double](
      (k, v) => Iterator.single(k -> (v.toLong, 1L)),
      (k, vs) => { val (s, c) = vs.reduce((a, b) => (a._1 + b._1, a._2 + b._2)); (k, s.toDouble / c) },
      Some((k, vs) => (k, vs.reduce((a, b) => (a._1 + b._1, a._2 + b._2)))))
    val got = job.run(ds).collect().toMap
    assert(got == Map("rex" -> 5.0, "fido" -> 2.0))
  }

  test("runReduced (streaming algebraic path) equals full-list reducer") {
    import spark.implicits._
    val full = MapReduceJob[String, Long, Long](
      (_, v) => tokens(v).iterator.map(_ -> 1L), (k, vs) => (k, vs.sum))
      .run(records).collect().toMap
    val reduced = MapReduce.runReduced[String, Long](records,
      (_, v) => tokens(v).iterator.map(_ -> 1L), _ + _).collect().toMap
    assert(full == reduced)
  }
}
