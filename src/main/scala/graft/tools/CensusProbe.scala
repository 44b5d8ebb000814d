package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway-style leg profiler for the co-supplier census (kept out of
  * the declared surface; run by hand while tuning `Graph`). */
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.sources.Tables.lineitem(spark, d)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm the scan
    time("scan count")(e.count())
    time("scan count (warm)")(e.count())

    val cappedSet = udaf(new graft.functions.CappedSetAgg(256),
      org.apache.spark.sql.Encoders.scalaLong)
    val census = e.groupBy("pk").agg(cappedSet(col("sk")).as("sks"))
      .where(size(col("sks")) <= 256)
    time("census only")(census.count())
    time("census only (rep2)")(census.count())

    val exploded = census.select(explode(expr("ordered_pairs(sks)")).as("pp"))
    time("census+explode")(exploded.count())
    time("census+explode (rep2)")(exploded.count())

    val full = graft.operators.Graph.coSuppliersCore(e)
    time("full census")(full.count())
    time("full census (rep2)")(full.count())

    // A/B (optimization r16): ObjectHashAggregate falls back to
    // sort-based aggregation once a partition's hash map passes
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold
    // (default 128 keys) — the census groups by ~20k parts, so the
    // UDAF leg may be running as a de-facto sort aggregate.
    for (thr <- Seq("128", "1024", "131072")) {
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      time(s"census thr=$thr")(census.count())
      time(s"census thr=$thr (rep2)")(census.count())
      time(s"full thr=$thr")(full.count())
    }
    spark.conf.unset(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")

    // alternative A: collect_set + sort instead of the UDAF
    val censusB = e.groupBy("pk").agg(array_sort(collect_set(col("sk"))).as("sks"))
      .where(size(col("sks")) <= 256)
    val fullB = censusB.select(explode(expr(
      """flatten(transform(sks, (x, i) ->
           transform(slice(sks, i + 2, size(sks) - i - 1),
             y -> struct(x AS sa, y AS sb))))""")).as("p"))
      .groupBy(col("p.sa").as("supp_a"), col("p.sb").as("supp_b"))
      .agg(count(lit(1)).as("n_shared_parts"))
      .where(col("n_shared_parts") >= 2)
    time("B collect_set full")(fullB.count())
    time("B collect_set full (rep2)")(fullB.count())

    // alternative C: plain self-join (the shape the comment rejects)
    val ec = e.distinct()
    val fullC = ec.as("a").join(ec.as("b"),
        col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("supp_a"), col("b.sk").as("supp_b"))
      .agg(count(lit(1)).as("n_shared_parts"))
      .where(col("n_shared_parts") >= 2)
    time("C self-join full")(fullC.count())
    time("C self-join full (rep2)")(fullC.count())

    spark.stop()
  }
}
