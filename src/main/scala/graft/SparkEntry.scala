package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every query name has a
  * `queries` entry; SQL-expressible ones also carry a DuckDB oracle in
  * `oracleSql` (same column names/aliases on both sides — the driver
  * hash-compares after sorting columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
    operators.MapReduceQueries.queries ++
    operators.TextAnalysis.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.Events.queries ++
    operators.Functions.queries ++
    operators.Multimodal.queries ++
    operators.Advanced.queries ++
    operators.Pipeline.queries ++
    operators.Graph.queries ++
    fuzz.FuzzQueries.queries ++
    streaming.StreamParity.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
    operators.MapReduceQueries.oracle ++
    operators.TextAnalysis.oracle ++
    operators.Dedup.oracle ++
    operators.Similarity.oracle ++
    operators.Events.oracle ++
    operators.Functions.oracle ++
    operators.Multimodal.oracle ++
    operators.Advanced.oracle ++
    operators.Pipeline.oracle ++
    operators.Graph.oracle ++
    fuzz.FuzzQueries.oracle ++
    streaming.StreamParity.oracle
}
