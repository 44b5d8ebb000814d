package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool (r14 verdict item 6): attribute the streaming as-of
  * chain's cost — `st_asof_join_mb` (~9.5 s committed) is the most
  * expensive declared query, and the question is whether that price is
  * a per-BATCH fixed tax (micro-batch scheduling × two chained state
  * stores) or a per-ROW cost a plan change could shrink. Protocol: the
  * q35 treatment — hold the DATA constant (full sf events corpus) and
  * vary only the EPOCH COUNT (time-ordered slice files, 1/2/4/8, plus
  * the typed per-side join sentinels that flush the final argmax
  * windows), run [[graft.streaming.EventStreams.asofAttribution]] to a
  * memory sink under AvailableNow, and time each run twice (the second
  * run is the steady-state read). A linear fit of seconds over batch
  * count separates the fixed per-batch cost from the data cost.
  * Optional second arg `rocksdb` swaps the state-store provider to
  * price provider overhead under the same protocol.
  *
  * Usage: runMain graft.tools.AsofChainProbe <sfDir> [rocksdb]
  */
object AsofChainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rocks = args.length > 1 && args(1) == "rocksdb"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (rocks) spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the parity suite's state-partition count, so batch costs match
    // the declared queries' shape
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    val base = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    def sent(id: Long, tpe: String) = base.limit(1).select(
      lit(id).as("event_id"),
      lit("2030-01-01 00:00:00").cast("timestamp").as("ts"),
      lit(-1L).as("user_id"), lit(tpe).as("event_type"),
      lit(0.0).as("value"), lit("").as("props"))
    val mm = base.agg(min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx")).head
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))

    var seq = 0
    def run(slices: Int): (Int, Double, Long, String) = {
      val dir = s"/tmp/graft-asof-probe/s$slices"
      val d = new java.io.File(dir)
      if (!d.exists()) {
        // time-ordered slice files (value-cut: ties never split) +
        // the typed join sentinels as the final file
        val bounds = (1 until slices).map(k => mn + (mx - mn) * k / slices)
        val cutoffs = (Seq(Long.MinValue) ++ bounds) :+ Long.MaxValue
        cutoffs.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), k) =>
          base.where(unix_micros(col("ts")) >= lo &&
              unix_micros(col("ts")) < hi)
            .coalesce(1).write.parquet(s"$dir/f$k")
        }
        sent(-1L, "view").unionByName(sent(-2L, "purchase"))
          .coalesce(1).write.parquet(s"$dir/f$slices")
        // flat drop-dir layout: one file per slice. The file source
        // orders by MODIFICATION TIME (not name) — explicit spaced
        // mtimes pin the arrival order (the materializeKeyedOrdered
        // discipline); same-ms copies would reorder slices and turn
        // time-ordered data into genuinely late rows
        val flat = new java.io.File(dir + "_flat"); flat.mkdirs()
        d.listFiles().sortBy(_.getName.stripPrefix("f").toInt)
          .zipWithIndex.foreach { case (sub, k) =>
            sub.listFiles().filter(_.getName.endsWith(".parquet"))
              .foreach { f =>
                val t = new java.io.File(flat, s"part_$k.parquet").toPath
                java.nio.file.Files.copy(f.toPath, t)
                java.nio.file.Files.setLastModifiedTime(t,
                  java.nio.file.attribute.FileTime.fromMillis(
                    1700000000000L + k * 60000L))
              }
          }
      }
      val ev = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir + "_flat")
      val out = graft.streaming.EventStreams.asofAttribution(
        ev.where(col("event_type") === "view"),
        ev.where(col("event_type") === "purchase"))
      seq += 1
      val qn = s"asof_probe_$seq"
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      require(q.awaitTermination(300000L), s"probe $qn wedged")
      val secs = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.count(_.numInputRows > 0)
      val rows = spark.table(qn).count()
      if (sys.env.get("ASOF_PROBE_DIFF").contains("1"))
        q.recentProgress.foreach { pr =>
          val drops = pr.stateOperators.map(so =>
            s"${so.operatorName}:dropped=${so.numRowsDroppedByWatermark}")
          println(s"  batch=${pr.batchId} in=${pr.numInputRows} " +
            s"wm=${pr.eventTime.get("watermark")} ${drops.mkString(" ")}")
        }
      (batches, secs, rows, qn)
    }

    println(s"provider=${if (rocks) "rocksdb" else "hdfs(default)"}")
    var tables = Map.empty[Int, String]
    Seq(1, 2, 4, 8).foreach { n =>
      val warm = run(n) // first run pays codegen/listing
      val timed = run(n)
      tables += n -> timed._4
      println(f"slices=$n%d batches=${timed._1}%d " +
        f"warm=${warm._2}%.2fs timed=${timed._2}%.2fs rows=${timed._3}%d")
    }
    // diagnostic: which purchases disappear as slicing deepens, and
    // where their p_ts sits relative to the 8-slice cut boundaries
    if (sys.env.get("ASOF_PROBE_DIFF").contains("1")) {
      val b1 = spark.table(tables(1)).select("purchase_id")
      val b8 = spark.table(tables(8)).select("purchase_id")
      val missing = b1.exceptAll(b8)
      val p = base.where(col("event_type") === "purchase")
        .join(missing, col("event_id") === col("purchase_id"))
      val bounds8 = (1 until 8).map(k => mn + (mx - mn) * k / 8)
      val withDist = p.select(col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
        .withColumn("dist_to_cut_min", bounds8.map(b =>
          abs(col("us") - lit(b))).reduce(least(_, _)) / lit(60000000L))
      println("missing purchases (1-slice minus 8-slice), distance to nearest cut in minutes:")
      withDist.orderBy("dist_to_cut_min").show(20, truncate = false)
    }
    spark.stop()
  }
}
