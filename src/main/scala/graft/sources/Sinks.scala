package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks — the reference's only sink is one pickled result file per job
  * (`data_handler.py:106-140`, `jobtracker.py:351`); at 100 TB the sink
  * layout IS the performance of every downstream query, so the writers
  * here encode the three layouts that matter:
  *
  *   - plain columnar (parquet/csv/json interchange),
  *   - hive-partitioned by a predicate column → partition PRUNING:
  *     a reader filtering on the partition key opens only matching
  *     directories,
  *   - bucketed by a join/agg key → co-located JOINS: two tables
  *     bucketed the same way join with zero Exchange on either side.
  */
object Sinks {

  /** Plain columnar sink. */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def csv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Parquet with an explicit codec (`zstd`/`gzip`/`snappy`/`lz4`).
    * At 100 TB the codec choice is a first-order cost knob: zstd
    * typically halves storage vs snappy for ~equal scan CPU, and the
    * reader needs no configuration — the codec is recorded per column
    * chunk in the file footer. */
  def parquetCompressed(df: DataFrame, path: String, codec: String = "zstd"): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", codec).parquet(path)

  /** Gzip-compressed text lines — the wire format crawl corpora
    * actually arrive in (WET/WARC dumps are gzip members). Spark reads
    * `.gz` transparently via the codec registry; the scale caveat is
    * that gzip is NOT splittable, so one .gz file = one task — shard
    * uploads into many files (or recompress to a splittable layout)
    * before the first heavy scan. */
  def textGz(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").text(path)

  /** Small-files compaction: rewrite a parquet dataset into files of
    * ~`targetBytes`. Millions of kilobyte files are the classic slow
    * death of a 100 TB lake (footer reads + task-per-file scheduling);
    * periodic compaction keeps scan parallelism matched to data size.
    * Writes to `dest` (never in place — an in-place rewrite that fails
    * mid-way loses data). */
  def compact(spark: org.apache.spark.sql.SparkSession, src: String,
      dest: String, targetBytes: Long = 128L << 20): Unit = {
    val df = spark.read.parquet(src)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1, (bytes / BigInt(targetBytes)).toInt)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(dest)
  }

  /** Hive-style partitioned layout: one directory per distinct value of
    * `cols`. Readers with equality/range predicates on those columns
    * scan only matching partitions (partition pruning — verified in
    * SinksSpec via the plan's "partition filters"). Keep partition
    * cardinality ≤ ~10⁴: each value is a filesystem directory. */
  def partitionedParquet(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed managed table: rows hash-distributed into `n` buckets by
    * `key` at write time. A join or aggregation on `key` between tables
    * bucketed with the same (key, n) needs NO shuffle — the exchange
    * the reference pays per job (its per-key-file shuffle, X1) is paid
    * once at ingest here. `n` should be sized so one bucket ≈ one task's
    * worth of data at the target scale. */
  def bucketedTable(df: DataFrame, table: String, key: String, n: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    // When sort columns are given, pre-shuffle into exactly one
    // partition per bucket (repartition hashes the column with the
    // same Murmur3 scheme bucketing uses), so every bucket is ONE
    // sorted file — the layout under which the scan may legally
    // report its sort order (Spark checks files-per-bucket ≤ 1 before
    // claiming it; see GraftSession's
    // spark.sql.legacy.bucketedTableScan.outputOrdering note) and a
    // downstream merge join / as-of join plans neither Exchange nor
    // Sort: the true ingest-once shape.
    val src =
      if (sortCols.nonEmpty) df.repartition(n, df.col(key)) else df
    val w = src.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(n, key)
    val sorted =
      if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    def save(): Unit = sorted.saveAsTable(table)
    try save()
    catch {
      // Overwrite alone cannot clear an orphan LOCATION whose catalog
      // entry died with a previous session (fresh in-memory catalog,
      // surviving warehouse dir). Only when Spark itself names the
      // location as the blocker do we delete it and retry once — never
      // unconditionally (r14 advice: an unconditional delete of the
      // derived path could destroy an EXTERNAL table's data or an
      // unrelated object that happens to live there).
      case e: Throwable with org.apache.spark.SparkThrowable
          if e.getCondition == "LOCATION_ALREADY_EXISTS" =>
        // build the path with Hadoop Path (handles unescaped chars a
        // raw java.net.URI parse would throw on)
        val loc = new java.io.File(new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), table).toUri.getPath)
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
        save()
    }
  }
}
