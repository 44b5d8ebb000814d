package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Aggregator, Window}
import graft.sources.Tables

/** Advanced relational operators beyond the Catalyst built-ins: as-of
  * join, bucketized range join, grouping sets, HLL approx-distinct, and a
  * typed top-k Aggregator — each chosen with a 100 TB execution shape.
  */
object Advanced {
  type Q = (SparkSession, String) => DataFrame

  /** AS-OF JOIN: for every purchase event, the most recent prior (or
    * simultaneous) view by the same user.
    *
    * Spark-first shape: NOT a range join (which explodes) — tag + union
    * both sides, one window pass per user ordered by time, carry the
    * last view via `last_value(ignoreNulls)`. One shuffle on user_id,
    * O(n log n) per key, no candidate blowup: the scalable as-of.
    * Tie at equal ts: views sort before purchases (tag order), so an
    * equal-ts view matches — same as ASOF JOIN's `>=` bound. */
  private val asofViewPurchase: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.union(purchases)
      .withColumn("last_view", last(
        when(col("tag") === 0, struct(col("ts").as("vts"), col("event_id").as("vid"))),
        ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("last_view.vid").as("view_id"), col("last_view.vts").as("view_ts"))
  }

  /** RANGE JOIN via bucketization: pairs of events from one user within
    * 5 minutes. Naive |Δt| ≤ g self-join is O(n²) per user; bucketizing
    * ts into g-width buckets and joining each event to its own + next
    * bucket bounds each comparison to a 2g window — the standard
    * interval-join shape (Flink/KDB style, public technique). */
  private val eventPairsWithin5m: Q = (s, d) => {
    val g = 300L * 1000000 // 5 min in µs
    val ev = Tables.events(s, d).where(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    // each row lands in its bucket and the next → any pair within g
    // shares at least one bucket id
    val buck = ev.withColumn("b",
      explode(array(expr(s"us div $g"), expr(s"us div $g") + 1)))
    buck.as("a").join(buck.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.b") === col("b.b") &&
        col("a.event_id") < col("b.event_id") &&
        abs(col("a.us") - col("b.us")) <= g)
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("ev_a"), col("b.event_id").as("ev_b"),
        (abs(col("a.us") - col("b.us")) / lit(1000000L)).as("gap_sec"))
      .distinct()
  }

  /** GROUPING SETS — finer than cube/rollup: chosen aggregation lattice
    * in one pass. */
  private val groupingSets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
  }

  /** HLL approx-distinct next to the exact answer — the sketch the
    * reference's exact distinct (word_set_functions.py) cannot afford at
    * scale. Rows-only check (HLL estimates are engine-specific);
    * AdvancedSpec pins the error bound. */
  private val approxDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  /** Typed top-k Aggregator (bounded min-heap, size k per group) — the
    * UDAF surface (reference's reducer ≈ UDAF, `tasktracker.py:228-271`).
    * Unlike window row_number over a full sort, state is O(k) per group
    * at any input size. */
  class TopKAgg(k: Int)
      extends Aggregator[(String, Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
    override def zero: Seq[(Double, Long)] = Seq.empty
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (v, id) => (-v, id) }.take(k)
    override def reduce(b: Seq[(Double, Long)], a: (String, Long, Double)): Seq[(Double, Long)] =
      trim(b :+ ((a._3, a._2)))
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-3 orders per priority through the Aggregator (vs q11's window
    * formulation — same oracle, different physical strategy: partial
    * O(k) heaps merge map-side, no full per-group sort or shuffle of
    * non-winners). */
  private val topkAggregator: Q = (s, d) => {
    import s.implicits._
    val ds = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)]
    ds.groupByKey(_._1)
      .agg(new TopKAgg(3).toColumn.name("top"))
      .flatMap { case (prio, top) =>
        top.zipWithIndex.map { case ((v, id), i) => (prio, id, v, i + 1) }
      }
      .toDF("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
  }

  /** Percentile family: exact `percentile` (full sort per group — fine
    * for low-cardinality groups) next to `percentile_approx`
    * (KLL-sketch-style bounded state, the 100 TB path). Rows-only:
    * interpolation arithmetic is engine-specific; AdvancedSpec bounds
    * approx-vs-exact drift instead. */
  private val percentiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("exact_pct"),
        expr("percentile_approx(l_extendedprice, array(0.25, 0.5, 0.75), 10000)").as("approx_pct"))
      .selectExpr("l_returnflag",
        "exact_pct[0] AS p25", "exact_pct[1] AS p50", "exact_pct[2] AS p75",
        "approx_pct[0] AS ap25", "approx_pct[1] AS ap50", "approx_pct[2] AS ap75")

  /** Stratified sampling — per-stratum fractions with a fixed seed
    * (deterministic WITHIN Spark: Bernoulli on a seeded hash per row;
    * rows-only for the driver, exactness specs pin the strata). The
    * training-data use: rebalancing a corpus by source/language without
    * a shuffle — sampling is a narrow operation. */
  private val stratifiedSample: Q = (s, d) =>
    Tables.documents(s, d)
      .stat.sampleBy("lang",
        Map("en" -> 0.5, "es" -> 0.25, "fr" -> 0.25, "de" -> 0.25, "zh" -> 0.25),
        seed = 42L)
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))

  /** Frequent items (Karp/Misra-Gries style, Spark's freqItems): single
    * pass, bounded state — the heavy-hitters sketch for hot-key
    * discovery before a skew-sensitive join. */
  private val frequentItems: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select((col("l_partkey") % 100).as("bucketed_part"))
      .stat.freqItems(Seq("bucketed_part"), 0.05)
      .select(explode(col("bucketed_part_freqItems")).as("hot_key"))

  val queries: Map[String, Q] = Map(
    "adv_stratified_sample" -> stratifiedSample,
    "adv_freq_items" -> frequentItems,
    "adv_percentiles" -> percentiles,
    "adv_asof_join" -> asofViewPurchase,
    "adv_range_join" -> eventPairsWithin5m,
    "adv_grouping_sets" -> groupingSets,
    "adv_approx_distinct" -> approxDistinct,
    "adv_topk_agg" -> topkAggregator,
  )

  val oracle: Map[String, String] = Map(
    "adv_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
           v.event_id AS view_id, v.ts AS view_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id AND p.ts >= v.ts""",
    "adv_range_join" ->
      """SELECT a.user_id, a.event_id AS ev_a, b.event_id AS ev_b,
           (abs(epoch_us(a.ts) - epoch_us(b.ts)) / 1000000) AS gap_sec
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300 * 1000000
         WHERE a.user_id < 20 AND b.user_id < 20""",
    "adv_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "adv_topk_agg" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) WHERE rnk <= 3""",
    // adv_approx_distinct: rows-only (engine-specific HLL).
  )
}
