package graft.functions

import graft.SparkSpec

/** The injected optimizer rule + expression: plan rewrite fires, and
  * semantics are indistinguishable from size(array_intersect(...)). */
class IntersectionSizeSpec extends SparkSpec {

  test("optimizer rewrites size(array_intersect) to intersection_size") {
    // non-foldable input (a scan), or constant folding eats the evidence
    val df = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("word_shingles(text, 1) AS x", "array('the', 'a', 'data') AS y")
      .selectExpr("size(array_intersect(x, y)) AS n")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("intersection_size"), optimized)
    assert(df.collect().forall(_.getInt(0) >= 0))
  }

  test("legacy size-of-null semantics are left untouched") {
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      import spark.implicits._
      val df = Seq((Seq("a"), Seq("a"))).toDF("x", "y")
        .selectExpr("size(array_intersect(x, y)) AS n")
      assert(!df.queryExecution.optimizedPlan.toString.contains("intersection_size"))
    } finally spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
  }

  test("semantics match size(array_intersect) on random arrays incl nulls/dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(8))(
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(5).toString)
      (arr(), arr())
    }
    val df = rows.toDF("x", "y").selectExpr(
      "intersection_size(x, y) AS fast",
      "size(array_intersect(x, y)) AS slow")
    // note: the second column ALSO gets rewritten by the rule, so force
    // the built-in path via a no-rule session-level comparison instead:
    // compute the oracle locally
    val got = df.select("fast").collect().map(_.getInt(0))
    val want = rows.map { case (x, y) =>
      x.distinct.count(v =>
        if (v == null) y.contains(null) else y.contains(v))
    }
    assert(got.toSeq == want)
  }

  test("null arrays propagate null") {
    val r = spark.sql(
      "SELECT intersection_size(CAST(NULL AS ARRAY<STRING>), array('a'))").head
    assert(r.isNullAt(0))
  }
}
