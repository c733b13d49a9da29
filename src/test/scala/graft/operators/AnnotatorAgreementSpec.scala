package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Fleiss' kappa (q234): hand-computed examples through the kappa math,
  * and the synthetic raters' noise profile.
  */
class AnnotatorAgreementSpec extends SparkSpec {

  test("hand-computed kappa: perfect agreement = 1, worked example = -0.25") {
    import spark.implicits._
    // source A: two unanimous docs (one all-1, one all-0) → κ = 1
    // source B: one doc labeled [1,1,1,0,0] → P̄ = 8/20, p₁ = 0.6,
    // Pe = 0.52, κ = (0.4 − 0.52)/0.48 = −0.25 exactly
    val ann = (Seq.fill(5)((1L, "A", 1)) ++ Seq.fill(5)((2L, "A", 0)) ++
      Seq((3L, "B", 1), (3L, "B", 1), (3L, "B", 1), (3L, "B", 0), (3L, "B", 0)))
      .toDF("doc_id", "source", "label")
    val got = AnnotatorAgreement.kappaFromAnnotations(ann)
      .select("source", "kappa_r").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("A") == 1.0)
    assert(got("B") == -0.25)
  }

  test("synthetic raters flip with strictly increasing noise") {
    val docs = Tables.documents(spark, sf001)
    val g = docs.select(col("doc_id"), (col("n_chars") >= 150).cast("int").as("g"))
    val rates = AnnotatorAgreement.annotations(docs)
      .join(g, "doc_id")
      .groupBy("rater")
      .agg(avg((col("label") =!= col("g")).cast("double")).as("fliprate"))
      .orderBy("rater").collect().map(_.getDouble(1))
    assert(rates.length == 5)
    assert(rates.sliding(2).forall { case Array(a, b) => a < b },
      s"flip rates must increase: ${rates.mkString(", ")}")
    // nominal rates 10%..30%; allow sampling spread at ~450 docs
    assert(rates.head > 0.05 && rates.head < 0.15)
    assert(rates.last > 0.25 && rates.last < 0.35)
  }

  test("kappa stays in [-1, 1] on the fixture and every source reports") {
    val out = AnnotatorAgreement.fleissKappa(Tables.documents(spark, sf001))
    assert(out.count() == 20)
    assert(out.filter(col("kappa_r") < -1.0 || col("kappa_r") > 1.0).count() == 0)
  }
}
