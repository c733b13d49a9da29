package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Fellegi-Sunter record linkage (q241): model-shape and audit
  * invariants at sf0.001.
  */
class RecordLinkageSpec extends SparkSpec {

  private lazy val cust = Tables.customer(spark, sf001)
  private lazy val report = RecordLinkage.linkageReport(cust).cache()

  test("agreement weights are positive, disagreement weights negative") {
    val m = RecordLinkage.masterRecords(cust)
    val d = RecordLinkage.dirtyRecords(cust)
    val w = RecordLinkage.weights(m, d).head()
    for (i <- Seq(0, 2, 4)) assert(w.getDecimal(i).doubleValue() > 0,
      s"agreement weight $i must carry positive evidence")
    for (i <- Seq(1, 3, 5)) assert(w.getDecimal(i).doubleValue() < 0,
      s"disagreement weight $i must carry negative evidence")
    // name is near-unique on the master side: chance agreement is tiny,
    // so its agreement weight dominates both categorical fields'
    assert(w.getDecimal(0).doubleValue() > w.getDecimal(2).doubleValue())
    assert(w.getDecimal(0).doubleValue() > w.getDecimal(4).doubleValue())
  }

  test("verdict thresholds partition the reported score range") {
    assert(report.filter(col("verdict") === "match" && col("score") < 8).count() == 0)
    assert(report.filter(col("verdict") === "possible" &&
      (col("score") >= 8 || col("score") < 0)).count() == 0)
  }

  test("blocking_recall equals the fraction of dirty records whose block key survived") {
    val d = RecordLinkage.dirtyRecords(cust)
    val survived = d.join(cust, col("src_key") === col("c_custkey"))
      .filter(col("d_nation") === col("c_nationkey")).count()
    val total = d.count()
    val expected = math.floor(survived.toDouble / total * 1e4 + 0.5) / 1e4
    val got = report.select("blocking_recall").head().getDouble(0)
    assert(got == expected, s"blocking_recall $got != recomputed $expected")
    // the report drops sub-zero scores, so its true rows are a subset of
    // the blocked true candidates (a fully-corrupted twin scores < 0)
    assert(report.filter(col("is_true") === 1).count() <= survived)
  }

  test("matches are precise: no false positive crosses the 8-bit bar") {
    val fp = report.filter(col("verdict") === "match" && col("is_true") === 0).count()
    assert(fp == 0, "fixture corruption rates leave clear margin above 8 bits")
    assert(report.select("precision_match").head().getDouble(0) == 1.0)
  }
}
