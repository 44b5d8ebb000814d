package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.input_file_name
import scala.collection.mutable

/** Typed MapReduce façade — the reference engine's complete programming
  * model (reference `tasktracker.py:122-156, 209-296`) re-expressed as a
  * Spark Dataset pipeline.
  *
  * The reference contract:
  *   - `mapper(k, v) -> List[(K, V)]` — a flatMap over input records
  *     (reference `count_functions.py:1-6`; engine loop
  *     `tasktracker.py:122-139`),
  *   - `combiner(k, values) -> (K, V)` — applied once per map task over
  *     locally grouped output (`tasktracker.py:209-226, 273-278`),
  *   - `reducer(k, values) -> (K, R)` — applied to the fully shuffled
  *     value list per key (`tasktracker.py:228-271`).
  *
  * Spark mapping: `flatMap → mapPartitions(local combine) → groupByKey →
  * mapGroups`. The shuffle is Spark's hash exchange — NOT the reference's
  * one-file-per-distinct-key filesystem shuffle (`tasktracker.py:287-296`),
  * which is its central scalability bug. Partial (map-side) combining
  * keeps shuffled bytes proportional to distinct keys per partition, the
  * same property the reference's combiner provides.
  *
  * Contract notes carried over from the reference (SURVEY.md §7):
  *   - Keys need a total equality/hash (the reference silently requires
  *     hashability, `tasktracker.py:275`).
  *   - The combiner must be algebraic (commutative monoid): Spark may
  *     apply it per partition and the reducer then sees combined values —
  *     exactly like the reference, where every shipped example uses
  *     `combiner = reducer` (`count_functions.py:16-17`).
  *   - Output order is unspecified, matching the reference's set-union of
  *     per-key result files (`jobtracker.py:327-335`).
  *
  * At 100 TB: `mapGroups` requires all values of one key in memory — the
  * same requirement the reference has (it materializes `(k, [values])`
  * files). For algebraic aggregates prefer [[MapReduceJob.runReduced]]
  * (streaming reduce, no per-key materialization) or the relational
  * surface (`graft.operators.Relational`) where Catalyst does partial
  * aggregation with spill.
  */
final case class MapReduceJob[K, V, R](
    mapper: (String, String) => IterableOnce[(K, V)],
    reducer: (K, Seq[V]) => (K, R),
    combiner: Option[(K, Seq[V]) => (K, V)] = None) {

  /** Full reference semantics: reducer sees the complete (post-combine)
    * value list per key. */
  def run(records: Dataset[(String, String)])(implicit
      ekv: Encoder[(K, V)], ekr: Encoder[(K, R)], ek: Encoder[K]): Dataset[(K, R)] = {
    val m = mapper
    val r = reducer
    val mapped = records.flatMap { kv: (String, String) => m(kv._1, kv._2) }
    val combined = combiner match {
      case Some(c) => mapped.mapPartitions(localCombine(_, c))
      case None    => mapped
    }
    combined.groupByKey(_._1).mapGroups { (k, it) => r(k, it.map(_._2).toSeq) }
  }

  /** Map-task-local grouping + combine — the reference's
    * `_group_by_key` + combiner loop (`tasktracker.py:209-226, 273-278`),
    * bounded by distinct keys per partition instead of the whole job. */
  private def localCombine(it: Iterator[(K, V)],
      c: (K, Seq[V]) => (K, V)): Iterator[(K, V)] = {
    val acc = mutable.LinkedHashMap.empty[K, mutable.ArrayBuffer[V]]
    it.foreach { case (k, v) =>
      acc.getOrElseUpdate(k, mutable.ArrayBuffer.empty[V]) += v
    }
    acc.iterator.map { case (k, vs) => c(k, vs.toSeq) }
  }
}

object MapReduce {
  /** Pairwise-reduce variant for algebraic aggregates: no per-key value
    * list ever materializes (Spark's `reduceGroups` does partial
    * aggregation map-side). Use when `reduce` is associative+commutative —
    * true for every example the reference ships. */
  def runReduced[K, V](records: Dataset[(String, String)],
      mapper: (String, String) => IterableOnce[(K, V)],
      reduce: (V, V) => V)(implicit
      ekv: Encoder[(K, V)], ek: Encoder[K], ekkv: Encoder[(K, (K, V))]): Dataset[(K, V)] = {
    val m = mapper
    records.flatMap { kv: (String, String) => m(kv._1, kv._2) }
      .groupByKey(_._1)
      .reduceGroups((a: (K, V), b: (K, V)) => (a._1, reduce(a._2, b._2)))
      .map { case (_, kv) => kv }
  }

  /** Text-file records in the reference's shape: `(k, v)` with `k` the
    * input file (the reference's vestigial job url,
    * `tasktracker.py:111-117`) and `v` one line. */
  def textRecords(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.textFile(path).select(input_file_name(), org.apache.spark.sql.functions.col("value"))
      .as[(String, String)]
  }

  /** Records from two DataFrame columns (key column, value column). */
  def columnRecords(ds: org.apache.spark.sql.DataFrame, keyCol: String,
      valueCol: String): Dataset[(String, String)] = {
    import ds.sparkSession.implicits._
    ds.selectExpr(s"CAST($keyCol AS STRING)", s"CAST($valueCol AS STRING)")
      .as[(String, String)]
  }
}
