package graft.functions

import graft.SparkSpec

/** Null propagation + basic contracts of the injected native expressions
  * (cosine_sim, dot_prod, word_shingles, winnow_fingerprints). */
class ExpressionsSpec extends SparkSpec {

  test("all custom expressions propagate nulls") {
    val r = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1D)) AS c,
                dot_prod(array(1D), CAST(NULL AS ARRAY<DOUBLE>)) AS d,
                word_shingles(CAST(NULL AS STRING), 3) AS w,
                winnow_fingerprints(CAST(NULL AS STRING), 5, 4) AS f""").head
    assert((0 until 4).forall(r.isNullAt), r.toString)
  }

  test("dot_prod computes exact dot products") {
    val r = spark.sql("SELECT dot_prod(array(1D, 2D, 3D), array(4D, 5D, 6D))").head
    assert(r.getDouble(0) == 32.0)
  }

  test("winnow_fingerprints: guaranteed shared fingerprint for shared runs") {
    import spark.implicits._
    // two texts sharing a run of k+w-1 = 8 tokens must share a fingerprint
    val shared = "q w e r t y u i"
    val df = Seq(
      ("A1 B2 C3 " + shared + " D4 E5"),
      ("Z9 " + shared + " Y8 X7 W6 V5")).toDF("text")
    val fps = df.selectExpr("winnow_fingerprints(text, 5, 4) AS f")
      .collect().map(_.getSeq[Long](0).toSet)
    assert((fps(0) & fps(1)).nonEmpty)
  }

  test("word_shingles type errors are analysis-time failures") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(123, 3)").collect()
    }
    assert(e.getMessage.contains("word_shingles"))
  }

  test("word_ngrams ≡ the positional HOF chain (multiplicity kept, corpus-wide)") {
    // the declared chain word_ngrams replaced in ta_repetition — must
    // agree element-for-element including duplicate grams and order
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("tok", org.apache.spark.sql.functions.expr(
        "filter(split(text, ' '), t -> t <> '')"))
    for (n <- Seq(1, 2, 3)) {
      val diff = docs.selectExpr(
        s"word_ngrams(text, $n) AS fast",
        s"""CASE WHEN size(tok) < $n THEN array()
            ELSE transform(sequence(0, size(tok) - $n),
                   i -> concat_ws(' ', slice(tok, i + 1, $n))) END AS slow""")
        .where("fast <> slow")
      assert(diff.count() === 0, s"n=$n: ${diff.take(1).mkString}")
    }
    // edge cases: empty, all-spaces, exactly-n tokens, multiplicity
    import spark.implicits._
    val edge = Seq("", "   ", "a b", "a b a b").toDF("text")
      .selectExpr("word_ngrams(text, 2) AS g").collect().map(_.getSeq[String](0))
    assert(edge(0).isEmpty && edge(1).isEmpty)
    assert(edge(2) === Seq("a b"))
    assert(edge(3) === Seq("a b", "b a", "a b")) // duplicate KEPT
    // null propagates
    assert(spark.sql("SELECT word_ngrams(CAST(NULL AS STRING), 2)").head.isNullAt(0))
  }
}
