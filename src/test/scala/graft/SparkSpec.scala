package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM — suites run
  * sequentially in the forked test JVM, so getOrCreate dedupes).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
  lazy val sf001 = "/root/testdata/sf0.001"

  def rows(name: String, dir: String = sf001): Long =
    SparkEntry.queries(name)(spark, dir).count()
}
