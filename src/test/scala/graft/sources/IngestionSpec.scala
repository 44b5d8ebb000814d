package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** End-to-end ingestion paths: raw text through the MR façade (the
  * reference's S1 scan), binary files through the multimodal pipeline. */
class IngestionSpec extends SparkSpec {

  test("registerAll: spark.sql over the whole catalog, pushdown intact") {
    graft.sources.Tables.registerAll(spark, sfDir)
    // SQL view == DataFrame loader, including the events ts conversion
    val viaSql = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
         JOIN customer ON o_custkey = c_custkey GROUP BY 1""").collect()
    assert(viaSql.nonEmpty)
    val ts = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType, ts.toString)
    // filters still reach the parquet scan through the view
    val p = spark.sql("SELECT l_quantity FROM lineitem WHERE l_quantity < 5")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity"), p)
  }

  test("xml source: declared-schema read round-trips a parquet-written corpus slice") {
    val dir = Files.createTempDirectory("graft_xml").toString
    // collect ONCE (ordered — LIMIT without ORDER BY may pick different
    // rows per evaluation) and build both the XML and the expectation
    // from the same rows
    val rows = graft.sources.Tables.documents(spark, sfDir)
      .orderBy("doc_id").limit(20)
      .select("doc_id", "lang", "n_chars").collect()
    val xml = new StringBuilder("<docs>")
    rows.foreach { r =>
      xml.append(s"<doc><doc_id>${r.getAs[Long]("doc_id")}</doc_id>")
      xml.append(s"<lang>${r.getAs[String]("lang")}</lang>")
      xml.append(s"<n_chars>${r.getAs[Long]("n_chars")}</n_chars></doc>")
    }
    xml.append("</docs>")
    Files.write(Paths.get(dir, "docs.xml"), xml.toString.getBytes("UTF-8"))
    val df = graft.sources.Tables.xmlTable(spark, s"$dir/docs.xml", "doc",
      "doc_id LONG, lang STRING, n_chars LONG")
    val got = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_chars"))).toSet
    val expect = rows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_chars"))).toSet
    assert(got.size === 20)
    assert(got === expect)
  }

  test("lenient csv: clean rows parse, malformed rows quarantine, nothing is lost") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(Paths.get(dir, "feed.csv"),
      "1,alpha,10\n2,beta,not_a_number\n3,gamma,30\nbroken line\n4,delta,40\n"
        .getBytes("UTF-8"))
    // the helper writes the parsed split out once (no .cache() — the
    // feed is never held in memory) and returns a plain parquet
    // relation, so even corrupt-COLUMN-only queries are legal
    val df = graft.sources.Tables.csvTableLenient(
      spark, s"$dir/feed.csv", "id LONG, name STRING, n LONG")
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "write-out split must not cache the feed")
    val clean = df.where(col("_corrupt").isNull)
    val quarantined = df.where(col("_corrupt").isNotNull)
    assert(clean.count() === 3)
    assert(quarantined.count() === 2) // bad number + bad shape, both kept
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    assert(quarantined.select("_corrupt").collect().map(_.getString(0)).toSet ==
      Set("2,beta,not_a_number", "broken line"))
    // the raw-CSV restriction this used to work around: a query that
    // references ONLY _corrupt must work (and see the quarantine rows)
    assert(df.select("_corrupt").where(col("_corrupt").isNotNull).count() === 2)
    // a changed feed re-parses (snapshot key), never serves stale rows
    Thread.sleep(1100) // mtime granularity
    Files.write(Paths.get(dir, "feed.csv"),
      "1,alpha,10\nbroken line\n".getBytes("UTF-8"))
    val df2 = graft.sources.Tables.csvTableLenient(
      spark, s"$dir/feed.csv", "id LONG, name STRING, n LONG")
    assert(df2.count() === 2)
    assert(df2.where(col("_corrupt").isNotNull).count() === 1)
  }

  test("lenient csv: an EMPTY feed returns an empty frame, not a schema-inference error") {
    // r11 advice: the write-out-once entry for an empty feed is
    // `_SUCCESS` with zero data files; the read-back must use the
    // declared schema (it is fully determined by schemaDdl) — the old
    // .cache() path handled empty feeds and this must too
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_csv_empty").toString
    Files.write(Paths.get(dir, "feed.csv"), Array.empty[Byte])
    val df = graft.sources.Tables.csvTableLenient(
      spark, s"$dir/feed.csv", "id LONG, name STRING, n LONG")
    assert(df.count() === 0)
    assert(df.columns.toSeq === Seq("id", "name", "n", "_corrupt"))
    assert(df.where(col("_corrupt").isNotNull).count() === 0)
  }

  test("text file → textRecords → word count (S1 end-to-end)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-text")
    Files.writeString(Paths.get(s"$dir/a.txt"), "alpha beta\nalpha\n")
    Files.writeString(Paths.get(s"$dir/b.txt"), "beta gamma\n")
    val records = graft.mr.MapReduce.textRecords(spark, dir.toString)
    // k carries the input file (the reference's vestigial job url)
    assert(records.collect().forall(_._1.startsWith("file:")))
    val counts = graft.mr.MapReduceJob[String, Long, Long](
      (_, v) => v.split("\\s+").iterator.filter(_.nonEmpty).map(_ -> 1L),
      (k, vs) => (k, vs.sum), Some((k, vs) => (k, vs.sum)))
      .run(records).collect().toMap
    assert(counts == Map("alpha" -> 2L, "beta" -> 2L, "gamma" -> 1L))
  }

  test("binaryFile source → media features (multimodal ingestion end-to-end)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(Paths.get(s"$dir/img0.bin"), Array[Byte](3, 1, 4, 1, 5, 9, 2, 6))
    Files.write(Paths.get(s"$dir/img1.bin"), "some media payload".getBytes)
    val files = Tables.binaryFiles(spark, s"$dir/*.bin")
    assert(files.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val media = files.select(
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("path"))
          .cast("long").as("doc_id"),
        col("content").as("payload"), col("path").as("source"))
      .as[graft.operators.MediaRow]
    val feats = graft.operators.Multimodal.extractFeatures(media).collect()
    assert(feats.length == 2)
    assert(feats.forall(_.features.length == 8))
    assert(feats.map(_.n_bytes).sorted.sameElements(Array(8, 18)))
  }

  test("dedup operators tolerate null/empty text") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-nulls")
    Seq((1L, "a b c d e f", "en", "s", 11L), (2L, null.asInstanceOf[String], "en", "s", 0L),
        (3L, "", "en", "s", 0L), (4L, "a b c d e f", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Dedup.queries("dd_ngram_jaccard")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 4L))) // identical docs pair up; null/empty don't crash
  }
}
