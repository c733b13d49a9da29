package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConformalSpec extends SparkSpec {

  test("q205 q-hat is the exact conformal order statistic per brand") {
    val out = graft.SparkEntry.queries("q205_conformal_interval")(spark, sf001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nCal, qHat) = (r.getLong(2), r.getDouble(3))
      // the conformal rank must exist: 1 ≤ ⌈0.9(n+1)⌉ ≤ n requires
      // n ≥ 9; every brand clears it on the fixture
      val k = (9 * (nCal + 1) + 9) / 10
      assert(k >= 1 && k <= nCal, s"${r.getString(0)}: k=$k of $nCal")
      assert(qHat >= 0.0)
    }
  }

  test("q205 coverage honors the 1-alpha guarantee up to finite-sample noise") {
    val out = graft.SparkEntry.queries("q205_conformal_interval")(spark, sf001)
      .collect()
    // the 1-alpha guarantee is MARGINAL — in expectation over random
    // splits. With one fixed split, per-brand realized coverage carries
    // both the conditional-coverage beta spread (n_cal as small as 20
    // at sf0.001 → sd ≈ 0.07) and test-side binomial noise, and the
    // worst of 25 brands lands 3+ sd out (Brand#13: 0.714 measured).
    // Pin a loose per-brand floor; the sharp assertion is POOLED.
    out.foreach { r =>
      assert(r.getDouble(5) >= 0.6,
        s"${r.getString(0)}: coverage ${r.getDouble(5)} (n=${r.getLong(4)})")
    }
    val pooled = out.map(r => r.getDouble(5) * r.getLong(4)).sum /
      out.map(_.getLong(4)).sum
    assert(pooled >= 0.88, s"pooled coverage $pooled")
  }

  test("conformal interval widens as alpha tightens (monotone in the rank)") {
    // the same calibration set ranked at 0.9 vs 0.5: the 90% half-width
    // must dominate the median half-width — a sanity pin on the order
    // statistic's direction (a rank-reversal bug would flip this)
    val li = graft.Tables.lineitem(spark, sf001)
      .select(col("l_extendedprice").as("y"),
        ((col("l_orderkey") * 7919 + col("l_linenumber")) % 100).as("slot"))
    val mean = li.filter(col("slot") < 60).agg(avg("y")).head().getDouble(0)
    val res = li.filter(col("slot") >= 60 && col("slot") < 80)
      .select(abs(col("y") - mean).as("r")).orderBy("r")
      .collect().map(_.getDouble(0))
    val n = res.length
    val q90 = res(((9 * (n + 1) + 9) / 10 - 1).min(n - 1))
    val q50 = res(((5 * (n + 1) + 9) / 10 - 1).min(n - 1))
    assert(q90 > q50, s"q90=$q90 q50=$q50")
  }
}
