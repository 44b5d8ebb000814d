package graft.tools
import org.apache.spark.sql.functions._

/** Dev probe: as-of exec vs window composition under a NOOP sink —
  * the terminal that materializes every output column. Bench's
  * count() terminal lets Catalyst prune the window composition's
  * entire window computation (the count references no window column),
  * so count-based A/Bs under-measure the composed form; this probe is
  * the fair comparison (r15). */
object AsofProf {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = (1 to 4).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"$tag rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val qs = graft.operators.Advanced.queries
    time("window-noop")(noop(qs("adv_asof_join")(spark, d)))
    time("native-noop")(noop(qs("adv_asof_join_native")(spark, d)))
    time("nearest-noop")(noop(qs("adv_asof_join_nearest")(spark, d)))
    time("bucketed-noop")(noop(qs("adv_asof_join_bucketed")(spark, d)))
    spark.stop()
  }
}
