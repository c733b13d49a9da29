package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DateFeatures

/** Deterministic synthetic regeneration of the reference workload's dataset
  * shape (Kaggle TPS Jan 2022 — FIXTURES.md §B): daily sales 2015-2018 for
  * 3 countries × 2 stores × 3 products, with additive trend + weekly/annual
  * seasonality + multiplicative series effects + hash-derived pseudo-noise.
  * Entirely Spark expressions (sequence/explode + crossJoin of literal
  * dims) — the generator itself distributes, so any SF is reachable by
  * widening the date range or the dim grid.
  */
object SalesData {

  val countries = Seq("Finland", "Norway", "Sweden")
  val stores    = Seq("KaggleMart", "KaggleRama")
  val products  = Seq("Kaggle Mug", "Kaggle Hat", "Kaggle Sticker")

  /** GDP side table in the reference's wide layout (gdp per year×country,
    * kaggle/kaggle.py:195-196), already unpivoted to long form — the shape
    * J1 prescribes for the broadcast join.
    */
  def gdpDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = Map("Finland" -> 234.0, "Norway" -> 386.0, "Sweden" -> 505.0)
    // wide year range so any generate() window finds its GDP — a missing
    // year would surface much later as a VectorAssembler null error
    (2010 to 2030).flatMap { y =>
      base.map { case (c, g) => (y, c, g * (1.0 + 0.02 * (y - 2015))) }
    }.toDF("year", "country", "gdp")
  }

  /** Train-shaped frame: (row_id, date, country, store, product, num_sold). */
  def generate(spark: SparkSession, lo: String = "2015-01-01", hi: String = "2018-12-31"): DataFrame = {
    import spark.implicits._
    val days = DateFeatures.dateAxis(spark, lo, hi)
    val dimSeq = countries.flatMap(c => stores.flatMap(st => products.map(p => (c, st, p))))
    val dims = dimSeq.zipWithIndex
      .map { case ((c, st, p), i) => (c, st, p, i) }
      .toDF("country", "store", "product", "dim_idx")
    val cMul = typedLit(Map("Finland" -> 0.9, "Norway" -> 1.15, "Sweden" -> 1.0))
    val sMul = typedLit(Map("KaggleMart" -> 1.2, "KaggleRama" -> 0.8))
    val pMul = typedLit(Map("Kaggle Mug" -> 1.0, "Kaggle Hat" -> 0.7, "Kaggle Sticker" -> 0.4))

    val doy = dayofyear(col("d"))
    val annual = lit(1.0) + lit(0.35) * sin(lit(2 * math.Pi) * doy / 365.25) +
      lit(0.15) * cos(lit(4 * math.Pi) * doy / 365.25)
    val weekly = lit(1.0) + lit(0.2) * (DateFeatures.weekdayMon0(col("d")) >= 5).cast("double")
    val trend = lit(1.0) + datediff(col("d"), to_date(lit(lo))) / lit(4000.0)
    // hash-derived noise in [0.9, 1.1): deterministic, seedless RNG
    val noise = lit(0.9) +
      (pmod(xxhash64(col("d").cast("string"), col("country"), col("store"), col("product")), lit(1000L))
        .cast("double") / lit(5000.0))

    // row_id is arithmetic — (day offset × |dims|) + dim index — so the
    // generator stays shuffle-free (a global row_number window would pull
    // every row through one task, the opposite of "the generator itself
    // distributes")
    val nDims = dimSeq.size
    days.crossJoin(dims)
      .select(
        (datediff(col("d"), to_date(lit(lo))).cast("long") * nDims + col("dim_idx")).as("row_id"),
        col("d").cast("timestamp").as("date"),
        col("country"), col("store"), col("product"),
        (lit(300.0) * cMul(col("country")) * sMul(col("store")) * pMul(col("product")) *
          annual * weekly * trend * noise).as("num_sold"))
  }
}
