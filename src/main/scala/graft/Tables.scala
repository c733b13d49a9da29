package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver fixture tables (see /root/repo/FIXTURES.md).
  *
  * All loads are plain parquet scans so Catalyst column pruning and filter
  * pushdown reach the file source. At cluster scale these would be
  * partitioned table locations; the API shape is identical.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every fixture as a temp view so the library's SQL surface
    * (spark.sql over the same tables DuckDB sees) is first-class.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS,false), which Spark's
    * micros-precision TimestampType cannot hold. With
    * spark.sql.legacy.parquet.nanosAsLong=true the column arrives as Long
    * nanoseconds; truncate to micros (floor — matches DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast) and rebuild a proper timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      // integral `div`, not `/`: ns-since-epoch (~1.7e18) overflows double's
      // 53-bit mantissa, so float division would corrupt low-order digits.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
