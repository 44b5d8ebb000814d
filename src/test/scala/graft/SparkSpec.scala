package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for ScalaTest suites. One session per JVM
  * (getOrCreate) keeps the suite wall-clock sane. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(4)

  /** sf0.001 corpus — the smoke-scale driver tables. */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // Session is shared across suites; don't stop it here.
    super.afterAll()
  }
}
