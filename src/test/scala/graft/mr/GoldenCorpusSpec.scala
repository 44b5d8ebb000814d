package graft.mr

import graft.SparkSpec

/** Golden-corpus differential tests — the reference's own validation
  * style: a fixed plain-text fixture plus a hard-coded golden answer
  * list (`word_set_example.py:15-34` checks the engine's distinct-word
  * set against an in-process oracle; `fernan/ans.py:1-3` ships ~1.5k
  * golden `(token, True)` pairs). The fixture here is original text with
  * the same structural traps as the reference corpus: repeated tokens,
  * punctuation glued to words, empty lines, indentation, multi-space
  * runs, and non-ASCII words (which Java's ASCII `\w` splits — pinned
  * below). Golden numbers were computed independently of the engine
  * (Python `str.split()` / `re.findall`, the reference's tokenizers).
  */
class GoldenCorpusSpec extends SparkSpec {

  private def fixture: String =
    getClass.getResource("/graft/corpus_small.txt").getPath

  private def records = MapReduce.textRecords(spark, fixture)

  test("golden word count over the fixture corpus") {
    import spark.implicits._
    val job = MapReduceJob[String, Long, Long](
      mapper = (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (k, vs) => (k, vs.sum),
      combiner = Some((k, vs) => (k, vs.sum)))
    val got = job.run(records).collect().toMap

    // golden totals (Python str.split() oracle over the fixture)
    assert(got.values.sum == 205L, "total token occurrences")
    assert(got.size == 152, "distinct whitespace tokens")
    // golden per-word counts, including the punctuation-glued traps
    val golden = Map(
      "the" -> 10L, "a" -> 8L, "The" -> 5L, "mesh" -> 5L, "peer" -> 5L,
      "A" -> 4L, "are" -> 4L, "peers." -> 3L, "block;" -> 2L, "Ring" -> 2L,
      "mesh." -> 1L, "log(n)" -> 1L, "key" -> 1L, "get(key)" -> 1L)
    golden.foreach { case (w, n) =>
      assert(got.get(w).contains(n), s"'$w': got ${got.get(w)}, want $n")
    }
    // each key appears exactly once in the result (the reference's
    // word_set_example duplicate check: "Se partio" assert)
    val keys = job.run(records).collect().map(_._1)
    assert(keys.length == keys.distinct.length, "duplicate keys in result")
  }

  test("golden distinct words: whitespace vs ASCII-regex tokenizers") {
    import spark.implicits._
    val wsJob = MapReduceJob[String, Boolean, Boolean](
      mapper = (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> true),
      reducer = (k, _) => (k, true),
      combiner = Some((k, _) => (k, true)))
    val ws = wsJob.run(records).collect().map(_._1).toSet
    assert(ws.size == 152)
    assert(ws.contains("log(n)") && ws.contains("peers."))

    val token = java.util.regex.Pattern.compile("\\w+")
    val rxJob = MapReduceJob[String, Boolean, Boolean](
      mapper = (_, line) => {
        val m = token.matcher(line)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
        while (m.find()) out += (m.group() -> true)
        out
      },
      reducer = (k, _) => (k, true))
    val rx = rxJob.run(records).collect().map(_._1).toSet
    // golden: 143 ASCII \w+ tokens; punctuation is stripped, and Java's
    // ASCII \w splits "Blöcke" into Bl + cke (pinned so a tokenizer
    // change can't slip by silently)
    assert(rx.size == 143, s"got ${rx.size}")
    assert(rx.contains("log") && rx.contains("n") && rx.contains("160"))
    assert(rx.contains("Bl") && rx.contains("cke") && !rx.contains("Blöcke"))
    assert(!rx.contains("peers.") && rx.contains("peers"))
  }

  test("runReduced agrees with the listful reducer on the fixture") {
    import spark.implicits._
    val listful = MapReduceJob[String, Long, Long](
      mapper = (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (k, vs) => (k, vs.sum)).run(records).collect().toMap
    val reduced = MapReduce.runReduced[String, Long](records,
      (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      _ + _).collect().toMap
    assert(listful == reduced)
  }
}
