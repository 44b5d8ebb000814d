package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sink layouts and the plans they buy: partition pruning and
  * shuffle-free bucketed joins — asserted on the physical plan, not just
  * on results. */
class SinksSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("partitioned parquet write → reader prunes partitions") {
    val dir = Files.createTempDirectory("graft-part").toString
    val o = Tables.orders(spark, sfDir)
    Sinks.partitionedParquet(o, dir, "o_orderstatus")
    val back = spark.read.parquet(dir).where(col("o_orderstatus") === "F")
    // correctness
    assert(back.count() == o.where(col("o_orderstatus") === "F").count())
    // pruning: only the o_orderstatus=F directory is read
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_orderstatus"), s"no partition filter in:\n$scan")
  }

  test("bucketed tables join with zero shuffle") {
    // clear orphan locations from any earlier crashed run
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    Sinks.bucketedTable(o, "orders_b", "o_orderkey", 8)
    Sinks.bucketedTable(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    // force the sort-merge path (tiny test tables would broadcast,
    // which hides the bucketing effect this test is about)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
      val plan = planOf(joined)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketing not used:\n$plan")
      // same answer as the shuffled join
      val expect = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compaction rewrites many small files into few") {
    val dir = Files.createTempDirectory("graft-compact").toString
    // fragment: 64 tiny files
    Tables.orders(spark, sfDir).repartition(64).write.parquet(s"$dir/frag")
    val before = new java.io.File(s"$dir/frag").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    Sinks.compact(spark, s"$dir/frag", s"$dir/compact")
    val after = new java.io.File(s"$dir/compact").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after < 8, s"still $after files")
    assert(spark.read.parquet(s"$dir/compact").count() ==
      Tables.orders(spark, sfDir).count())
  }

  test("orc round-trip through the catalog reader, pushdown intact") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val n = Tables.nation(spark, sfDir)
    Sinks.orc(n, s"$dir/orc")
    val back = Tables.orcTable(spark, s"$dir/orc")
    assert(back.collect().map(_.toSeq).toSet ==
      n.collect().map(_.toSeq).toSet)
    // ORC carries min/max stats like parquet: a filter must reach the
    // scan as a pushed filter, not evaluate post-scan only
    val filtered = back.where(col("n_nationkey") === 7)
    val scan = filtered.queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(scan.toLowerCase.contains("pushedfilters") &&
      scan.contains("n_nationkey"), s"no pushed filter in:\n$scan")
    assert(filtered.count() == 1)
  }

  test("zstd parquet and gzip text round-trip, codec visible on disk") {
    val dir = Files.createTempDirectory("graft-codec").toString
    val n = Tables.nation(spark, sfDir)
    Sinks.parquetCompressed(n, s"$dir/zstd", "zstd")
    assert(spark.read.parquet(s"$dir/zstd").collect().map(_.toSeq).toSet ==
      n.collect().map(_.toSeq).toSet)
    // codec is recorded in the filename convention Spark uses
    assert(new java.io.File(s"$dir/zstd").listFiles()
      .exists(_.getName.contains(".zstd.")), "expected zstd part files")
    val names = Tables.nation(spark, sfDir).select("n_name")
    Sinks.textGz(names, s"$dir/gz")
    assert(new java.io.File(s"$dir/gz").listFiles()
      .exists(_.getName.endsWith(".txt.gz")), "expected .gz part files")
    // .gz reads back transparently through the codec registry
    assert(spark.read.text(s"$dir/gz").collect().map(_.getString(0)).toSet ==
      names.collect().map(_.getString(0)).toSet)
  }

  test("csv and json round-trip") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val n = Tables.nation(spark, sfDir)
    Sinks.csv(n, s"$dir/csv")
    Sinks.json(n, s"$dir/json")
    val csvBack = spark.read.option("header", "true")
      .schema(n.schema).csv(s"$dir/csv")
    val jsonBack = spark.read.schema(n.schema).json(s"$dir/json")
    assert(csvBack.collect().map(_.toSeq).toSet == n.collect().map(_.toSeq).toSet)
    assert(jsonBack.collect().map(_.toSeq).toSet == n.collect().map(_.toSeq).toSet)
  }
}
