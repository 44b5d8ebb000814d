package graft.mr

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The reference's `data_type='table'` convention (`client.py:24-28`,
  * `README.md:25-36`): headerless CSV, schema supplied by the query —
  * exercised end-to-end with the documented dog/avg example, through
  * both the relational path and the MR façade's (sum, count) recipe. */
class CsvTableSpec extends SparkSpec {

  test("dogs.csv: SELECT dog, AVG(age) GROUP BY dog, both paths") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dogs")
    val rows = Seq(
      "rex,4", "fido,3", "rex,6", "bella,2", "fido,1", "rex,5", "bella,4")
    Files.writeString(Paths.get(s"$dir/dogs.csv"), rows.mkString("\n"))

    val oracle = rows.map(_.split(","))
      .groupBy(_(0)).view.mapValues(g => g.map(_(1).toDouble).sum / g.size).toMap

    // relational path
    val df = graft.sources.Tables.csvTable(spark, s"$dir/dogs.csv",
      "dog STRING, age INT")
    val rel = df.groupBy("dog").avg("age")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rel == oracle)

    // MR façade path: the README.md:25-36 (sum, count) accumulator
    val records = MapReduce.columnRecords(df, "dog", "age")
    val mr = MapReduceJob[String, (Long, Long), Double](
      (dog, age) => Iterator.single(dog -> (age.toLong, 1L)),
      (k, vs) => { val (s0, c) = vs.reduce((a, b) => (a._1 + b._1, a._2 + b._2)); (k, s0.toDouble / c) },
      Some((k, vs) => (k, vs.reduce((a, b) => (a._1 + b._1, a._2 + b._2)))))
      .run(records).collect().toMap
    assert(mr == oracle)
  }
}
