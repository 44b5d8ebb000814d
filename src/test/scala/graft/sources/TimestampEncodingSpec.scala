package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}
import java.nio.file.{Files, Paths}

/** Schema-drift proofing for the events loader (round-8 regression: a
  * driver-side testdata regeneration switched `ts` from
  * TIMESTAMP(NANOS) to un-adjusted timestamp[us] → Spark read
  * TIMESTAMP_NTZ → three declared queries threw AnalysisException).
  *
  * This spec round-trips the SAME rows through all three on-disk
  * encodings the generator has produced across rounds and asserts
  * (a) `Tables.events` always yields session-TZ TimestampType with
  * identical values, and (b) every timestamp-consuming declared query
  * (ev_* family, adv_range_join, adv_asof_join) analyzes AND executes
  * against each encoding. A future encoding drift breaks here, in
  * `sbt test`, instead of in the driver's correctness sweep. */
class TimestampEncodingSpec extends SparkSpec {

  private val tsQueries: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    graft.operators.Events.queries.toSeq ++ Seq(
      "adv_range_join" -> graft.operators.Advanced.queries("adv_range_join"),
      "adv_asof_join" -> graft.operators.Advanced.queries("adv_asof_join"))

  private val tempDirs = scala.collection.mutable.Buffer.empty[String]

  override def afterAll(): Unit = {
    // each run writes a re-encoded events.parquet copy per encoding —
    // delete them or repeated runs accumulate in /tmp
    tempDirs.foreach { d =>
      // never recurse through a symlink: listFiles on a link-to-dir
      // lists the TARGET, and the non-events tables here are symlinks
      // into the real read-only corpus — deleting through them would
      // reach real corpus files if those ever become directories
      def rm(p: java.io.File): Unit = {
        if (!Files.isSymbolicLink(p.toPath))
          Option(p.listFiles()).foreach(_.foreach(rm))
        p.delete(): Unit
      }
      rm(new java.io.File(d))
    }
    super.afterAll()
  }

  /** Build a per-encoding sf directory: events.parquet re-encoded,
    * every other table symlinked from the real sf0.001 corpus. */
  private def encodedDir(tag: String)(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft-tsenc-$tag").toString
    tempDirs += dir
    Tables.all.filterNot(_ == "events").foreach { t =>
      Files.createSymbolicLink(
        Paths.get(s"$dir/$t.parquet"), Paths.get(s"$sfDir/$t.parquet"))
    }
    write(Tables.events(spark, sfDir))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def checkEncoding(tag: String, dir: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"[$tag] loader must normalize ts to TimestampType, got ${ev.schema("ts").dataType}")
    // value-exactness vs the canonical read: micros must survive the trip
    val canon = Tables.events(spark, sfDir)
      .select(sum(unix_micros(col("ts")))).head.getLong(0)
    val got = ev.select(sum(unix_micros(col("ts")))).head.getLong(0)
    assert(got == canon, s"[$tag] micros drifted: $got vs $canon")
    tsQueries.foreach { case (name, q) =>
      val df = q(spark, dir)
      df.queryExecution.assertAnalyzed()
      // the REAL assertion: row count against this encoding equals the
      // count against the canonical corpus (the r8 drift failed with an
      // AnalysisException here; a silent row-drop would now fail too)
      val canonN = q(spark, sfDir).count()
      assert(df.count() == canonN,
        s"[$tag] $name row count drifted from canonical encoding")
    }
  }

  test("TIMESTAMP (UTC-adjusted micros) encoding: loader + all ts queries") {
    // Spark's default parquet writer emits int64 micros, adjustedToUTC
    checkEncoding("utc", encodedDir("utc")(identity))
  }

  test("TIMESTAMP_NTZ (un-adjusted micros) encoding: loader + all ts queries") {
    checkEncoding("ntz", encodedDir("ntz")(
      _.withColumn("ts", col("ts").cast(TimestampNTZType))))
  }

  test("nanos-as-long encoding: loader + all ts queries") {
    checkEncoding("nanos", encodedDir("nanos")(
      _.withColumn("ts", (unix_micros(col("ts")) * lit(1000L)).cast(LongType))))
  }
}
