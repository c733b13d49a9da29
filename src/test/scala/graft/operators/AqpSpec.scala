package graft.operators

import graft.{SparkSpec, Tables}

/** Statistical sanity for the AQP/error-bar family (q183-q185): the
  * DuckDB oracles prove Spark and DuckDB compute the SAME numbers; these
  * tests pin that the numbers mean what they claim — error bars bracket
  * the truth, resampling SE agrees with the CLT, flags are consistent.
  */
class AqpSpec extends SparkSpec {

  test("q184 bootstrap: CI brackets the mean, SE matches CLT within 2x") {
    val r = TableMaintenance.bootstrapCi(Tables.orders(spark, sf001), reps = 40)
      .collect().head
    val n = r.getAs[Long]("n_rows").toDouble
    val mean = r.getAs[Double]("mean_price")
    val se = r.getAs[Double]("se_boot")
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < mean && mean < hi, s"percentile CI [$lo,$hi] must bracket $mean")
    // CLT reference: sd(o_totalprice)/sqrt(n) from the real data
    val sd = Tables.orders(spark, sf001)
      .agg(org.apache.spark.sql.functions.stddev("o_totalprice"))
      .collect().head.getDouble(0)
    val seClt = sd / math.sqrt(n)
    assert(se > seClt / 2 && se < seClt * 2,
      s"bootstrap SE $se should be within 2x of CLT SE $seClt")
    // percentile interval should be on the same scale as +-1.96 SE
    assert(hi - lo > 2 * se && hi - lo < 8 * se, s"width ${hi - lo} vs se $se")
  }

  test("q185 group sampling: flags consistent, estimates near truth") {
    val rows = TableMaintenance.groupSampleCi(
      Tables.lineitem(spark, sf001), pPct = 10, targetRel = 0.05).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    rows.foreach { r =>
      val est = r.getAs[Double]("mean_est")
      val truth = r.getAs[Double]("mean_true")
      val hw = r.getAs[Double]("hw")
      val relHw = r.getAs[Double]("rel_hw")
      val covered = r.getAs[Int]("covered")
      assert(hw > 0)
      assert(covered == (if (math.abs(truth - est) <= hw) 1 else 0))
      assert(r.getAs[Int]("met_target") == (if (relHw <= 0.05) 1 else 0))
      // a 10% sample of a TPC-H group should land within 10% of truth
      assert(math.abs(est - truth) / truth < 0.1, s"est $est vs truth $truth")
    }
    // CLT 95% half-widths should cover the truth for most groups
    assert(rows.map(_.getAs[Int]("covered")).sum >= 4)
  }

  test("q185 degenerate samples fail loudly: null hw, met_target=0") {
    // pPct=0 keeps every group's sample empty (md5-derived h in [0,100)
    // is never < 0): the guard must emit explicit failure flags, not
    // nulls that read as success
    val rows = TableMaintenance.groupSampleCi(
      Tables.lineitem(spark, sf001), pPct = 0, targetRel = 0.05).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("m_sample") == 0L)
      assert(r.isNullAt(r.fieldIndex("hw")) && r.isNullAt(r.fieldIndex("rel_hw")))
      assert(r.getAs[Int]("met_target") == 0 && r.getAs[Int]("covered") == 0)
    }
  }
}
