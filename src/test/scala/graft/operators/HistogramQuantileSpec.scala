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
