package graft

/** Dev scratchpad + entry smoke: runs the driver's flagship entry on
  * sf0.001 and prints the row count (must be > 0). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    df.show(10, false)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
