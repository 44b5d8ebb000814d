package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.mr.{MapReduce, MapReduceJob}
import graft.sources.Tables

/** The reference's declared query set (SURVEY.md §2.2) — word count,
  * distinct words (whitespace + regex tokenizers), and the README
  * group-by-average recipe — run THROUGH the MapReduce façade over the
  * `documents` table, each with a DuckDB oracle.
  *
  * Semantics ported (not code): tokenizers match the reference's
  * `str.split()` (any whitespace, no empties — `count_functions.py:2`)
  * and `re.findall(r'\w+')` (`fernan/functions.py:5`); the avg recipe is
  * the `(sum, count)` accumulator of `README.md:25-36`.
  */
object MapReduceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Word count — reference `count_functions.py:1-17`. combiner = reducer
    * (algebraic sum), exactly the shipped contract. */
  private val wordCount: Q = (s, d) => {
    import s.implicits._
    val job = MapReduceJob[String, Long, Long](
      mapper = (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (k, vs) => (k, vs.sum),
      combiner = Some((k, vs) => (k, vs.sum)))
    job.run(MapReduce.columnRecords(Tables.documents(s, d), "doc_id", "text"))
      .toDF("word", "cnt")
  }

  /** Distinct words — reference `word_set_functions.py:1-13` (emit True
    * per token, reduce to one row per key; the bool is a placeholder we
    * drop at the end, as the harness does). */
  private val distinctWords: Q = (s, d) => {
    import s.implicits._
    val job = MapReduceJob[String, Boolean, Boolean](
      mapper = (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> true),
      reducer = (k, _) => (k, true),
      combiner = Some((k, _) => (k, true)))
    job.run(MapReduce.columnRecords(Tables.documents(s, d), "doc_id", "text"))
      .toDF("word", "present").select("word")
  }

  /** Regex-token distinct — reference `fernan/functions.py:1-15`
    * (`re.findall(r'\w+')` tokenizer; Java and RE2 agree on `\w` =
    * `[A-Za-z0-9_]` for this ASCII corpus). */
  private val regexTokens: Q = (s, d) => {
    import s.implicits._
    val token = java.util.regex.Pattern.compile("\\w+")
    val job = MapReduceJob[String, Boolean, Boolean](
      mapper = (_, line) => {
        val m = token.matcher(line)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
        while (m.find()) out += (m.group() -> true)
        out
      },
      reducer = (k, _) => (k, true))
    job.run(MapReduce.columnRecords(Tables.documents(s, d), "doc_id", "text"))
      .toDF("word", "present").select("word")
  }

  /** Group-by average via the `(sum, count)` accumulator — the exact
    * recipe `README.md:25-36` documents for `SELECT dog, AVG(age) FROM
    * dog GROUP BY dog`, here over (lang, n_chars). Integer sums → one
    * IEEE division → bit-deterministic vs DuckDB. */
  private val groupAvg: Q = (s, d) => {
    import s.implicits._
    val job = MapReduceJob[String, (Long, Long), Double](
      mapper = (lang, nChars) => Iterator.single(lang -> (nChars.toLong, 1L)),
      reducer = (k, vs) => { val (sum, cnt) = vs.reduce((a, b) => (a._1 + b._1, a._2 + b._2)); (k, sum.toDouble / cnt) },
      combiner = Some((k, vs) => (k, vs.reduce((a, b) => (a._1 + b._1, a._2 + b._2)))))
    job.run(MapReduce.columnRecords(Tables.documents(s, d), "lang", "n_chars"))
      .toDF("lang", "avg_chars")
  }

  /** Word count over a raw TEXT FILE through the full S1→S3→M1→M3→X1→R1
    * chain (`textRecords` line reader → façade job) — the reference's
    * primary input mode (`client.py:167-178` slices text files; the
    * other mr_* queries read parquet columns). Input is the committed
    * golden fixture, so the driver's DuckDB oracle reads the same bytes
    * via `read_text`. */
  private val fileWordCount: Q = (s, _) => {
    import s.implicits._
    val job = MapReduceJob[String, Long, Long](
      mapper = (_, line) => line.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      reducer = (k, vs) => (k, vs.sum),
      combiner = Some((k, vs) => (k, vs.sum)))
    job.run(MapReduce.textRecords(s, MapReduceQueries.FixturePath))
      .toDF("word", "cnt")
  }

  /** The golden corpus ships INSIDE the artifact (src/main/resources)
    * and is materialized once to a deterministic temp path, so the Spark
    * job and the DuckDB oracle read the same bytes from the same
    * absolute location regardless of checkout directory or packaging.
    * `SPARK_GRAFT_FIXTURE` overrides for external corpora. */
  private[graft] lazy val FixturePath: String =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE", {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val target = Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-corpus_small.txt")
      val in = getClass.getResourceAsStream("/graft/corpus_small.txt")
      require(in != null,
        "bundled corpus /graft/corpus_small.txt missing from the classpath")
      // stage to a unique temp file, then ATOMIC_MOVE into place: two
      // concurrent JVMs (Bench ∥ Verify, parallel CI forks) may race
      // this init, and a reader must never observe a missing/truncated
      // target mid-replace
      try {
        val tmp = Files.createTempFile(target.getParent, ".graft-corpus", ".tmp")
        Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING) }
      } finally in.close()
      target.toString
    })

  val queries: Map[String, Q] = Map(
    "mr_word_count" -> wordCount,
    "mr_distinct_words" -> distinctWords,
    "mr_regex_tokens" -> regexTokens,
    "mr_group_avg" -> groupAvg,
    "mr_file_word_count" -> fileWordCount,
    "mr_count_histogram" -> countHistogram,
  )

  /** CHAINED jobs — the canonical two-stage MR pipeline (word count →
    * count-of-counts frequency histogram). The reference chains jobs by
    * feeding one job's result files to the next submission
    * (`client.py` submit → collect → resubmit); here job 1's Dataset is
    * job 2's record source directly — no intermediate materialization,
    * and Catalyst plans the two shuffles as one pipeline. */
  private lazy val countHistogram: Q = (s, d) => {
    import s.implicits._
    val job2 = MapReduceJob[Long, Long, Long](
      mapper = (_, cnt) => Iterator.single(cnt.toLong -> 1L),
      reducer = (k, vs) => (k, vs.sum),
      combiner = Some((k, vs) => (k, vs.sum)))
    job2.run(MapReduce.columnRecords(wordCount(s, d), "word", "cnt"))
      .toDF("cnt", "n_words")
  }

  val oracle: Map[String, String] = Map(
    "mr_word_count" ->
      """SELECT w AS word, COUNT(*) AS cnt FROM (
           SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
         WHERE w <> '' GROUP BY w""",
    "mr_distinct_words" ->
      """SELECT DISTINCT w AS word FROM (
           SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
         WHERE w <> ''""",
    "mr_regex_tokens" ->
      """SELECT DISTINCT w AS word FROM (
           SELECT unnest(regexp_extract_all(text, '\w+')) AS w FROM documents)""",
    "mr_group_avg" ->
      """SELECT lang, CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
         FROM documents GROUP BY lang""",
    "mr_count_histogram" ->
      """WITH wc AS (
           SELECT w, COUNT(*) AS cnt FROM (
             SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
           WHERE w <> '' GROUP BY w)
         SELECT cnt, COUNT(*) AS n_words FROM wc GROUP BY cnt""",
    "mr_file_word_count" ->
      s"""SELECT w AS word, COUNT(*) AS cnt FROM (
            SELECT unnest(list_filter(string_split_regex(line, '\\s+'),
                                      t -> t <> '')) AS w
            FROM (SELECT unnest(string_split(content, chr(10))) AS line
                  FROM read_text('$FixturePath')))
          GROUP BY w""",
  )
}
