package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Advanced operators: approx-distinct error bound, salted-join
  * equivalence, word_shingles parity with the built-in HOF chain. */
class AdvancedSpec extends SparkSpec {

  test("approx_count_distinct lands within the declared 5% of exact") {
    val rows = Advanced.queries("adv_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: HLL drifted >5% off ${r.getLong(1)}")
    }
  }

  test("percentile_approx tracks exact percentiles within 1%") {
    val rows = Advanced.queries("adv_percentiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (i <- 4 to 6) assert(r.getBoolean(i), s"approx p-col $i off >1% in $r")
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("stratified sample: deterministic, per-stratum fractions hold") {
    val totals = graft.sources.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Advanced.queries("adv_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash-based: bit-identical on re-run, no RNG state
    val again = Advanced.queries("adv_stratified_sample")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled == again)
    sampled.foreach { case (lang, n) =>
      val frac = if (lang == "en") 0.5 else 0.25
      assert(n <= totals(lang), s"$lang oversampled")
      // multiplicative hash ~ uniform: loose 4-sigma Bernoulli window
      val exp = totals(lang) * frac
      val sigma = math.sqrt(totals(lang) * frac * (1 - frac))
      assert(math.abs(n - exp) <= 4 * sigma + 2, s"$lang: $n vs expected $exp")
    }
  }

  test("heavy hitters = exactly the keys above the 1% threshold") {
    val hot = Advanced.queries("adv_freq_items")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val truth = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("l_partkey % 100 AS k").groupBy("k").count()
    val total = truth.selectExpr("sum(count)").head.getLong(0)
    val expect = truth.where(s"count > ${total} * 0.01")
      .collect().map(_.getLong(0)).toSet
    assert(hot == expect, s"sketch+verify ${hot -- expect} / missing ${expect -- hot}")
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
