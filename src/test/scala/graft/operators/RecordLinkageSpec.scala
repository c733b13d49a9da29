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

  test("EM recovers the generation parameters without labels") {
    val em = RecordLinkage.emReport(cust).cache()
    val r = em.select("em_m_name", "em_m_seg", "em_m_band",
      "em_u_name", "em_lambda").head()
    // generation corruption: name 20%, seg 15%, band 25% -> m ~ (.8,.85,.75)
    assert(r.getDouble(0) > 0.6 && r.getDouble(0) <= 1.0, "m_name")
    assert(r.getDouble(1) > 0.6 && r.getDouble(1) <= 1.0, "m_seg")
    assert(r.getDouble(2) > 0.55 && r.getDouble(2) <= 1.0, "m_band")
    // chance name agreement among non-matches is near zero
    assert(r.getDouble(3) < 0.05, "u_name")
    assert(r.getDouble(4) > 0 && r.getDouble(4) < 0.1, "lambda")
    // the corner patterns are decisive at every SF (the middle ones
    // honestly depend on corpus size — at sf0.001 the n=2 pattern
    // (1,0,0) posterior is 0.14): all-agree -> match, and no pattern
    // disagreeing on name classifies match
    assert(em.filter(col("a_name") === 1 && col("a_seg") === 1 &&
      col("a_band") === 1 && col("post_match") < 0.9).count() == 0)
    assert(em.filter(col("a_name") === 0 && col("verdict") === "match").count() == 0)
    em.unpersist()
  }

  test("emFit is invariant to pattern-row order (exact integer sums)") {
    val pat = Seq((0, 0, 0, 24968L), (0, 0, 1, 1153L), (0, 1, 0, 5117L),
      (0, 1, 1, 301L), (1, 0, 0, 12L), (1, 0, 1, 48L), (1, 1, 0, 75L),
      (1, 1, 1, 241L))
    val a = RecordLinkage.emFit(pat, RecordLinkage.EmRounds)
    val b = RecordLinkage.emFit(pat.reverse, RecordLinkage.EmRounds)
    assert(a._1 == b._1 && a._2.sameElements(b._2) && a._3.sameElements(b._3))
  }

  test("algebraic patternCounts equals the exhaustive pair-stream groupBy") {
    val m = RecordLinkage.masterRecords(cust)
    val d = RecordLinkage.dirtyRecords(cust)
    val algebraic = RecordLinkage.patternCounts(m, d).sorted
    val exhaustive = RecordLinkage.candidatePairs(m, d)
      .groupBy("a_name", "a_seg", "a_band")
      .agg(count(lit(1)).as("n"), sum(col("is_true").cast("long")).as("nt"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
    assert(algebraic == exhaustive,
      s"Möbius-inverted pattern table must equal the pair-stream one:\n$algebraic\nvs\n$exhaustive")
  }

  test("derived blocking passes find exactly the exhaustive report-eligible pairs") {
    val m = RecordLinkage.masterRecords(cust)
    val d = RecordLinkage.dirtyRecords(cust)
    val w = RecordLinkage.weights(m, d)
    val wr = w.head()
    // the fixtures must actually exercise the banded path
    val minimal = RecordLinkage.minimalQualifyingPatterns(wr)
    assert(!minimal.contains((0, 0, 0)), s"expected a real band, got $minimal")
    assert(minimal.nonEmpty)
    // banded scored stream ≥ 0 == exhaustive scored stream ≥ 0, row for row
    def wl(i: Int) = lit(wr.getDecimal(i))
    val score =
      when(col("a_name") === 1, wl(0)).otherwise(wl(1)) +
        when(col("a_seg") === 1, wl(2)).otherwise(wl(3)) +
        when(col("a_band") === 1, wl(4)).otherwise(wl(5))
    val banded = RecordLinkage.scoredPairs(m, d, w)
      .filter(col("score") >= 0).drop("score")
    val exhaustive = RecordLinkage.candidatePairs(m, d)
      .withColumn("score", score).filter(col("score") >= 0).drop("score")
    assert(banded.exceptAll(exhaustive).isEmpty && exhaustive.exceptAll(banded).isEmpty,
      "banded candidates must equal the exhaustive report-eligible set")
  }

  test("matches are precise: no false positive crosses the 8-bit bar") {
    val fp = report.filter(col("verdict") === "match" && col("is_true") === 0).count()
    assert(fp == 0, "fixture corruption rates leave clear margin above 8 bits")
    assert(report.select("precision_match").head().getDouble(0) == 1.0)
  }
}
