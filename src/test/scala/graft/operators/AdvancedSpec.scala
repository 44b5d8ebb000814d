package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Advanced operators: approx-distinct error bound, salted-join
  * equivalence, word_shingles parity with the built-in HOF chain. */
class AdvancedSpec extends SparkSpec {

  test("approx_count_distinct within declared 2% rsd (loose 10% check)") {
    val rows = Advanced.queries("adv_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact <= 0.10,
        s"approx $approx vs exact $exact")
    }
  }

  test("percentile_approx tracks exact percentiles within 1%") {
    val rows = Advanced.queries("adv_percentiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (i <- 1 to 3) {
        val exact = r.getDouble(i); val approx = r.getDouble(i + 3)
        assert(math.abs(approx - exact) / exact <= 0.01,
          s"p$i approx $approx vs exact $exact")
      }
    }
  }

  test("stratified sample respects per-stratum fractions (seeded, deterministic)") {
    val totals = graft.sources.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Advanced.queries("adv_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic for a fixed seed
    val again = Advanced.queries("adv_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled == again)
    sampled.foreach { case (lang, n) =>
      val frac = if (lang == "en") 0.5 else 0.25
      assert(n <= totals(lang), s"$lang oversampled")
      // Bernoulli bound: loose 3-sigma window
      val exp = totals(lang) * frac
      val sigma = math.sqrt(totals(lang) * frac * (1 - frac))
      assert(math.abs(n - exp) <= 3 * sigma + 2, s"$lang: $n vs expected $exp")
    }
  }

  test("freqItems finds every genuinely frequent key") {
    val hot = Advanced.queries("adv_freq_items")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    // every key above the support threshold must be reported
    // (freqItems may over-report, never under-report)
    val truth = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("l_partkey % 100 AS k").groupBy("k").count()
    val total = truth.selectExpr("sum(count)").head.getLong(0)
    val mustHave = truth.where(s"count > ${total * 0.05}")
      .collect().map(_.getLong(0)).toSet
    assert(mustHave.subsetOf(hot), s"missing ${mustHave -- hot}")
  }

  test("salted join equals plain join") {
    val l = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    val p = graft.sources.Tables.part(spark, sfDir).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = l.join(p, "l_partkey")
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(l, p, "l_partkey", 8,
        saltFrom = Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("two-phase count equals plain groupBy count") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val plain = o.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Skew.twoPhaseCount(o, "o_orderstatus", 16, Seq("o_orderkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == plain)
  }

  test("word_shingles matches the built-in HOF chain on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val fast = docs.selectExpr("doc_id", "word_shingles(text, 3) AS sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val slow = docs
      .withColumn("tok", expr("filter(split(text, ' '), t -> t <> '')"))
      .selectExpr("doc_id",
        """CASE WHEN size(tok) < 3 THEN array()
           ELSE array_distinct(transform(sequence(0, size(tok) - 3),
             i -> concat_ws(' ', tok[i], tok[i+1], tok[i+2]))) END AS sh""")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(fast == slow)
  }

  test("word_shingles edge cases") {
    import spark.implicits._
    val df = Seq("a b", "", "  x  ", "one two three four", "t t t t")
      .toDF("text")
    val got = df.selectExpr("word_shingles(text, 3) AS sh")
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == Nil)                       // fewer tokens than n
    assert(got(1) == Nil)                       // empty
    assert(got(2) == Nil)                       // single token, padding
    assert(got(3) == List("one two three", "two three four"))
    assert(got(4) == List("t t t"))             // duplicates collapse
  }

  test("as-of join: every purchase matches its latest prior view") {
    val out = Advanced.queries("adv_asof_join")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // local oracle
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val views = ev.filter(_._4 == "view").groupBy(_._2)
    rows.foreach { r =>
      val (pid, uid) = (r.getLong(0), r.getLong(1))
      val pts = ev.find(_._1 == pid).get._3
      val expect = views.getOrElse(uid, Array.empty)
        .filter(v => !v._3.after(pts))
        .sortBy(v => (v._3.getTime, v._1)).lastOption
      if (r.isNullAt(2)) assert(expect.isEmpty)
      else assert(expect.exists(_._1 == r.getLong(2)),
        s"purchase $pid matched view ${r.getLong(2)}, expected ${expect.map(_._1)}")
    }
  }
}
