package graft.operators

import graft.SparkSpec

class GroupedOlsSpec extends SparkSpec {

  test("exact line recovers slope/intercept with r2 = 1") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("a", i.toDouble, 2.0 * i + 3.0))
      .toDF("g", "x", "y")
    val r = GroupedOls.fit(df, "g", "x", "y").collect().head
    assert(r.getLong(1) == 50)
    assert(r.getDouble(2) == 2.0, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) == 3.0, s"intercept ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"r2 ${r.getDouble(4)}")
  }

  test("zero x-variance group emits nulls, not a division blowup") {
    import spark.implicits._
    val df = Seq(("c", 5.0, 1.0), ("c", 5.0, 2.0), ("c", 5.0, 9.0))
      .toDF("g", "x", "y")
    val r = GroupedOls.fit(df, "g", "x", "y").collect().head
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), r.toString)
  }

  test("slope matches the covariance/variance definition on noisy data") {
    import spark.implicits._
    // deterministic residuals that sum to zero against x — slope exactly
    // 1.5, intercept exactly -2, but r2 < 1
    val pts = (0 until 40).map { i =>
      val x = i.toDouble
      val e = if (i % 2 == 0) 1.0 else -1.0 // ⟂ to x over pairs
      ("b", x, 1.5 * x - 2.0 + e)
    }
    val r = GroupedOls.fit(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    // Σe = 0 and Σx·e = -20 over this layout, so slope shifts by
    // n·(-20)/(n·Σx² - (Σx)²) = 40·(-20)/213200 — assert against the
    // closed form, not an approximation
    val n = 40.0
    val sx = (0 until 40).map(_.toDouble).sum
    val sxx = (0 until 40).map(i => i.toDouble * i).sum
    val sxe = (0 until 40).map(i => i.toDouble * (if (i % 2 == 0) 1.0 else -1.0)).sum
    val expected = 1.5 + n * sxe / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(2) - expected) < 1e-6,
      s"slope ${r.getDouble(2)} vs $expected")
    assert(r.getDouble(4) < 1.0 && r.getDouble(4) > 0.99, s"r2 ${r.getDouble(4)}")
  }

  test("q208 per-brand fits read the fixture honestly: defined fit, near-zero r2") {
    // the synthetic fixtures have NO cross-column dependence (measured
    // corr(quantity, price) ≈ 0.003) — a correct R² must say so; a
    // float-accumulation bug typically shows up as garbage r2 far from 0
    val out = graft.SparkEntry.queries("q208_grouped_ols")(spark, sf001)
      .collect()
    assert(out.length == 25)
    out.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3), r.toString)
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 < 0.1, s"${r.getString(0)}: r2 $r2")
    }
  }

  test("q217 quantile regression: ordered quantiles, exact-rank coverage floor") {
    val out = graft.SparkEntry.queries("q217_quantile_regression")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7), r.getDouble(8)))
    assert(out.length == 25)
    out.foreach { case (brand, n, q10, q50, q90, pinball, cov) =>
      assert(q10 <= q50 && q50 <= q90, s"$brand: $q10 / $q50 / $q90")
      assert(pinball >= 0.0, s"$brand pinball $pinball")
      // k = ceil(0.9n) smallest residual ⇒ AT LEAST 90% of rows sit at or
      // below q90, by the integer-rank definition — an exact invariant,
      // not a statistical one (ties can only push coverage up)
      assert(cov >= 0.9 - 1e-9, s"$brand cov $cov")
      assert(n > 0)
      // the median residual of an OLS fit sits near zero relative to the
      // quantile band (a sign-convention bug would shift it to a band edge)
      assert(math.abs(q50) < 0.5 * (q90 - q10), s"$brand q50 $q50 band ${q90 - q10}")
    }
  }
}
