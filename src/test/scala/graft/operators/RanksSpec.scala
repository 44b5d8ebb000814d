package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase distributed rank ([[Ranks.globalRank]]) must equal the
  * one-task global-window form row for row — the window form is the
  * differential reference, same discipline as `lateArrivalsWindow` vs
  * `lateArrivalsScan`. */
class RanksSpec extends SparkSpec {

  test("globalRank equals the unpartitioned-window rank on a total key") {
    import spark.implicits._
    // keys deliberately non-uniform so range partitions are uneven and
    // several splits are empty-adjacent (lift coalesce path)
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i.toLong))
      .toDF("k", "id")
    val (ranked, handle) = Ranks.globalRank(df, Seq("k", "id"), "rn")
    val windowForm = df.withColumn("rn_w",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    val diff = ranked.join(windowForm, Seq("k", "id"))
      .where(col("rn") =!= col("rn_w")).count()
    assert(diff === 0L)
    assert(ranked.count() === 997L)
    graft.Checkpoints.drop(handle)
  }

  test("globalRank output preserves the input column order and appends the rank") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "b", 1.0)).toDF("id", "s", "v")
    val (ranked, handle) = Ranks.globalRank(df, Seq("v", "id"), "rn")
    assert(ranked.columns.toSeq === Seq("id", "s", "v", "rn"))
    assert(ranked.where(col("id") === 2L).select("rn").head.getLong(0) === 1L)
    graft.Checkpoints.drop(handle)
  }
}
