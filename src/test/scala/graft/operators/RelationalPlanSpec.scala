package graft.operators

import graft.SparkSpec

/** Physical-plan shape assertions — the plans we designed for, not just
  * the answers: pushdown reaches parquet, dims broadcast, partial
  * aggregation is present, top-k avoids full sorts. */
class RelationalPlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = Relational.queries(name)(spark, sfDir)
    df.collect() // execute THIS plan so AQE finalizes (count() would plan a new query)
    // formatted mode prints untruncated PushedFilters + codegen spans
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: all predicates pushed to the parquet scan") {
    val p = plan("q02_revenue_filter")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("LessThan(l_quantity,24.0)"), p)
    // column pruning: only the 4 needed columns in ReadSchema
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_orderkey") && read.contains("l_discount"), read)
  }

  test("q05: every dimension joins as broadcast (zero fact-side shuffle before agg)") {
    val p = plan("q05_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q01: partial (map-side) aggregation before the exchange") {
    val p = plan("q01_pricing_summary")
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs >= 2, s"expected partial+final HashAggregate:\n$p")
    assert(p.contains("partial_"), p)
    assert(p.contains("hashpartitioning"), p)
  }

  test("q10: top-k via TakeOrderedAndProject, not a global sort") {
    val p = plan("q10_top_customers")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort [total_spent"), p)
  }

  test("q04: semi join stays a semi join") {
    val p = plan("q04_priority_semi")
    assert(p.contains("LeftSemi"), p)
  }

  test("q29 approx twin: sort-free plan, bucket sizes within sketch tolerance") {
    val df = Relational.ntileApprox(spark, sfDir)
    val rows = df.collect()
    // the scale property: decile assignment is a narrow map + one tiny
    // agg — no window, no global sort anywhere in the plan
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
    // all 10 buckets present, sizes within the approxQuantile rank-error
    // bound (ε·N per boundary, two boundaries per bucket, +2 tie slack)
    assert(rows.map(_.getAs[Int]("decile")).sorted.sameElements(1 to 10))
    val total = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("n") - total / 10.0) <= 2 * 0.001 * total + 2,
        s"decile ${r.getAs[Int]("decile")}: n=${r.getAs[Long]("n")} of $total")
    }
    // buckets tile the value range in order: no overlap between
    // consecutive deciles' [lo, hi] spans
    val byDecile = rows.sortBy(_.getAs[Int]("decile"))
    byDecile.sliding(2).foreach { w =>
      assert(w(0).getAs[Double]("hi") <= w(1).getAs[Double]("lo"),
        s"deciles ${w(0).getAs[Int]("decile")}/${w(1).getAs[Int]("decile")} overlap")
    }
  }

  test("q31: LATERAL decorrelates to a ranked join, not a per-row subquery") {
    val p = plan("q31_lateral_topn")
    // decorrelation leaves a window/rank over a join — and never a
    // nested-loop per outer row over the full inner table
    assert(p.contains("Window") || p.contains("TakeOrdered"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup joins never degrade to cross products") {
    for (q <- Seq("dd_ngram_jaccard", "dd_minhash_lsh", "dd_winnow")) {
      val df = Dedup.queries(q)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q plan has a cross join:\n$p")
    }
  }

  test("whole-stage codegen covers the scan-filter-project pipelines") {
    val p = plan("q02_revenue_filter")
    // formatted final plans mark codegen'd operators with "codegen id"
    assert(p.contains("codegen id"), p)
  }

  test("similarity scale paths: no nested-loop/cartesian joins anywhere") {
    // sim_topk_cosine is deliberately exempt: the exact baseline IS a
    // broadcast nested loop over a 10-row query side (bounded by |Q|)
    for (q <- Seq("sim_cosine_pairs", "sim_topk_lsh", "sim_topk_ivf")) {
      val df = Similarity.queries(q)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q plan has a cross join:\n$p")
    }
  }

  test("ta_bpe_apply: the encode is one narrow projection — zero exchanges") {
    // the learned merges fold in as literals at plan build, so the
    // corpus pass must contain no shuffle and no join of any kind
    val df = TextAnalysis.queries("ta_bpe_apply")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
  }

  test("mm_frame_dupes: capped inverted index joins as hash joins, no cross product") {
    val df = Multimodal.queries("mm_frame_dupes")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("sim kmeans/trained-IVF: corpus assignment is a partial-aggregated argmin, not a window sort") {
    // the only BroadcastNestedLoop allowed is the k-row centroid
    // cross join (bounded by k=8); the corpus-wide argmin must plan as
    // a two-phase HashAggregate (partial_min before the exchange)
    val km = Similarity.queries("sim_kmeans_sq8")(spark, sfDir)
    km.collect()
    val kp = km.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(kp.contains("partial_min"), kp)
    assert(!kp.contains("Window"), kp)
    // trained IVF: the only Window nodes are the |Q|-side probe ranking
    // and the final per-query top-5 — never a corpus-wide window (the
    // shape assignNearest exists to avoid); centroids arrive as a
    // driver-materialized LocalRelation, so no training subtree either
    val tr = Similarity.queries("sim_topk_ivf_trained")(spark, sfDir)
    tr.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // Window operator nodes in the FINAL plan section only
    val tp = tr.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(tp.contains("partial_min"), tp)
    val windowNodes = tp.split('\n').count(_.matches("\\s*[+:|\\- ]*Window .*"))
    assert(windowNodes <= 2, s"expected <=2 Window operator nodes, plan:\n$tp")
  }

  test("sim_topk_ivf: corpus side never shuffles before the top-k window") {
    val df = Similarity.queries("sim_topk_ivf")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the list join must be broadcast (40-row query side), not sort-merge
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q30: correlated EXISTS decorrelates to a semi join") {
    val p = plan("q30_exists_semi")
    assert(p.contains("LeftSemi"), p)
  }

  test("gr_knn_graph/gr_triangles: one top-k window builds the graph; wedge joins stay hash-shaped") {
    // graph construction: exactly one row_number window (the per-node
    // top-k rank) — mutuality must plan as a groupBy, never a second
    // census+window subtree for a self-join build side
    val g = Graph.queries("gr_knn_graph")(spark, sfDir)
    g.collect()
    val gp = g.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windowNodes = gp.split('\n').count(_.matches("\\s*[+:|\\- ]*Window .*"))
    assert(windowNodes == 1, s"expected exactly 1 Window operator node, plan:\n$gp")
    // triangle census: the checkpointed edge list makes wedge + close
    // pure id hash joins — no cartesian, no window, no re-census
    val df = Graph.queries("gr_triangles")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Window "), p)
  }

  test("dd_components: propagation joins are hash joins on ids") {
    val df = Dedup.queries("dd_components")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q36: RANGE frame equals the day-window self-join recomputation") {
    import org.apache.spark.sql.functions._
    val got = Relational.queries("q36_range_frame")(spark, sfDir)
    val daily = graft.sources.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
    // decimal sums are order-free → the self-join recomputation must be
    // bit-equal after the same double cast
    val expected = daily.as("a").join(daily.as("b"),
        col("a.o_orderpriority") === col("b.o_orderpriority") &&
        col("b.day").between(date_sub(col("a.day"), 6), col("a.day")))
      .groupBy(col("a.o_orderpriority").as("o_orderpriority"),
        date_format(col("a.day"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("b.rev")).cast("double").as("rev_7d"))
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("adv_hll_merge: sketch union earns its tolerance against the exact count") {
    val r = Advanced.queries("adv_hll_merge")(spark, sfDir).head()
    assert(r.getAs[Long]("n_sources") === 20L)
    assert(r.getAs[Boolean]("merged_within_5pct") && r.getAs[Boolean]("direct_within_5pct"))
  }

  test("fn_fuzzy: length-band blocking plans as a hash join, not a nested loop") {
    val df = Functions.queries("fn_fuzzy")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q35: recursive walk depth equals the closed-form bit length") {
    val got = Relational.queries("q35_recursive_depth")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = graft.sources.Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => if (k <= 1) 0L else (63 - java.lang.Long.numberOfLeadingZeros(k)).toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got === expected)
  }

  test("q34: bounded top-k aggregate form reproduces the window form row-for-row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, sfDir)
    // O(k) heap per group replaces the full-frame sort: top-3 by
    // (price desc, orderkey), winner's payload re-joined by id
    val top3 = orders
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(new Advanced.TopKAgg(3).toColumn.name("top"))
      .toDF("o_orderpriority", "top")
    val mins = orders.groupBy("o_orderpriority")
      .agg(min(col("o_totalprice")).as("min_price"))
    val dates = orders.select(col("o_orderkey").as("top_key"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("top_order_date"))
    val bounded = top3
      .selectExpr("o_orderpriority", "top[0]._1 AS top_price",
        "top[0]._2 AS top_key", "top[2]._1 AS third_price")
      .join(broadcast(mins), "o_orderpriority")
      .join(dates, "top_key")
      .select("o_orderpriority", "top_price", "top_order_date",
        "min_price", "third_price")
    val window = Relational.queries("q34_order_stats")(spark, sfDir)
      .select("o_orderpriority", "top_price", "top_order_date",
        "min_price", "third_price")
    assert(window.exceptAll(bounded).count() === 0)
    assert(bounded.exceptAll(window).count() === 0)
  }

  test("q34: frame-wide selections are mutually consistent per priority") {
    import org.apache.spark.sql.functions._
    val rows = Relational.queries("q34_order_stats")(spark, sfDir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val top = r.getAs[Double]("top_price")
      val min = r.getAs[Double]("min_price")
      val third = r.getAs[Double]("third_price")
      assert(min <= third && third <= top,
        s"${r.getAs[String]("o_orderpriority")}: $min / $third / $top")
    }
  }

  test("ta_bpe_apply_scaled: one corpus pass — broadcast dict join, no corpus self-join") {
    // the finish must be explode_outer -> broadcast dictionary join ->
    // one partial-agg'd groupBy; a SortMergeJoin here means the
    // two-scan doc_id self-join crept back (two corpus-wide shuffles)
    val df = TextAnalysis.queries("ta_bpe_apply_scaled")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("sim_recall_report: every join broadcast — paths + the 50-row truth side") {
    val df = Similarity.queries("sim_recall_report")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q35_depth_unrolled: equals the native recursion; one shuffle, no UnionLoop") {
    // the per-job-tax attribution shipped as a capability (r13 verdict
    // item 6): the bounded-depth unroll must (a) answer exactly the
    // recursive form's histogram and (b) plan as chained conditional
    // projections — a single exchange for the final groupBy, no
    // per-level UnionLoop materialization, no joins
    val native = Relational.queries("q35_recursive_depth")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val unrolled = Relational.queries("q35_depth_unrolled")(spark, sfDir)
    val got = unrolled.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === native, s"unrolled diverges from the recursion")
    val p = unrolled.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("UnionLoop"), p)
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size === 1,
      s"exactly the final-histogram exchange expected:\n$p")
  }
}
