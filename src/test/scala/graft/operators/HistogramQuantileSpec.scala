package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class HistogramQuantileSpec extends SparkSpec {

  test("histogram quantile estimates stay within one bin width of the exact percentile") {
    val li = Tables.lineitem(spark, sf001)
    val Array(lo, hi) = li.agg(min(col("l_extendedprice")), max(col("l_extendedprice")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val binWidth = (hi - lo) / 256
    val rows = HistogramQuantile.quantiles(li, "l_returnflag", "l_extendedprice",
        nBins = 256, ps = Seq(0.5, 0.9, 0.99))
      .collect()
    assert(rows.length == 9) // 3 flags × 3 quantiles
    rows.foreach { r =>
      val err = r.getAs[Double]("est_error")
      assert(err <= binWidth,
        s"${r.getString(0)} p=${r.getDouble(1)}: error $err exceeds bin width $binWidth")
    }
  }

  test("sketches of disjoint slices merge by addition into the sketch of the union") {
    val li = Tables.lineitem(spark, sf001)
    val bounds = li.agg(min(col("l_extendedprice").cast("double")).as("lo"),
      max(col("l_extendedprice").cast("double")).as("hi"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      HistogramQuantile.binCounts(df, "l_returnflag", "l_extendedprice", 64, bounds)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = cells(li)
    val even = cells(li.filter(col("l_orderkey") % 2 === 0))
    val odd = cells(li.filter(col("l_orderkey") % 2 =!= 0))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("a constant value column estimates every quantile as that constant, not NULL") {
    val const = Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), lit(42.5).as("cv"))
    val rows = HistogramQuantile.quantiles(const, "l_returnflag", "cv",
        nBins = 16, ps = Seq(0.5, 0.99)).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("est") == 42.5 && r.getAs[Double]("est_error") == 0.0,
        s"constant column: ${r.mkString(",")}")
    }
  }

  test("the exact column is Spark's own percentile (the sketch is judged against truth)") {
    val li = Tables.lineitem(spark, sf001)
    val got = HistogramQuantile.quantiles(li, "l_returnflag", "l_extendedprice",
        nBins = 64, ps = Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("exact")).toMap
    val direct = li.groupBy("l_returnflag")
      .agg(graft.functions.Metrics.canonRound(expr("percentile(l_extendedprice, 0.5)"), 4).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == direct)
  }
}
