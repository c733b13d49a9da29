package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** The fixture's `ts` physical type is untrusted input — the driver has
    * shipped it both as INT64 TIMESTAMP(NANOS,false) and as plain
    * timestamp[us] with isAdjustedToUTC=false. Normalize every known shape
    * to session-UTC TimestampType so all downstream event-time operators
    * (cast-to-long, unix_micros, withWatermark) see one type:
    *  - Long (nanos via spark.sql.legacy.parquet.nanosAsLong=true):
    *    truncate to micros (floor — matches DuckDB's TIMESTAMP_NS cast)
    *    and rebuild a timestamp.
    *  - TIMESTAMP_NTZ (micros, not UTC-adjusted): cast to TimestampType;
    *    with spark.sql.session.timeZone=UTC this is value-preserving.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral `div`, not `/`: ns-since-epoch (~1.7e18) overflows double's
        // 53-bit mantissa, so float division would corrupt low-order digits.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
