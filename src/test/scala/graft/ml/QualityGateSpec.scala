package graft.ml

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** ml.QualityGate — the learned (logistic over hashed token counts)
  * quality classifier. Pins: the model actually LEARNS the planted
  * keyword signal (not just the base rate), the codegen literal-weight
  * scoring expression reproduces MLlib's probabilities, and the τ-gate
  * behaves monotonically.
  */
class QualityGateSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)
  // fixed layout: MLlib L-BFGS is layout-sensitive (the documented GBT
  // class); coalesce pins partitioning so the fit is reproducible
  private lazy val feats = QualityGate.features(docs).coalesce(4).cache()
  private lazy val model = QualityGate.fit(feats)

  test("learns the planted keyword signal well above the base rate") {
    val n = feats.count().toDouble
    val posRate = feats.agg(sum("y")).head().getLong(0) / n
    val baseline = math.max(posRate, 1 - posRate)
    val scored = feats.select(col("y"),
      (model.scoreExpr(col("x")) >= 0.5).cast("int").as("pred"))
    val acc = scored.agg(sum(when(col("y") === col("pred"), 1L).otherwise(0L)))
      .head().getLong(0) / n
    // the label is (slow > fast) || long-doc — an OR of two rules, which
    // a LINEAR model cannot represent exactly: a grid search over
    // a·(slow−fast) + total > T tops out at 0.83 on this fixture (the
    // representational ceiling, measured 2026-08-14), and the keyword
    // half alone explains 0.80. The pin is therefore "does real work":
    // clear the majority-class baseline (0.568 here) by a wide margin
    // and sit near the linear ceiling, not above it.
    assert(acc > baseline + 0.15, s"acc=$acc baseline=$baseline")
    assert(acc > 0.75, s"acc=$acc (linear ceiling ≈ 0.83)")
  }

  test("codegen literal-weight scoring equals MLlib's probability column") {
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y").setMaxIter(100).setRegParam(0.001)
    val vecFrame = feats.select(col("doc_id"), col("y").cast("double").as("y"),
      array_to_vector(col("x")).as("features"), col("x"))
    val m = lr.fit(vecFrame)
    val gm = QualityGate.GateModel(m.coefficients.toArray, m.intercept)
    val both = m.transform(vecFrame)
      .select(col("doc_id"),
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("p_mllib"),
        gm.scoreExpr(col("x")).as("p_codegen"))
      .select(max(abs(col("p_mllib") - col("p_codegen")))).head().getDouble(0)
    assert(both < 1e-9, s"max |mllib - codegen| = $both")
  }

  test("gate is monotone in tau and emits one row per document") {
    val strict = QualityGate.gate(docs, model, tau = 0.9)
    val loose = QualityGate.gate(docs, model, tau = 0.1)
    val nStrict = strict.filter(col("pass")).count()
    val nLoose = loose.filter(col("pass")).count()
    assert(nStrict <= nLoose)
    assert(strict.count() === docs.count())
    assert(nLoose > 0)
  }

  test("calibration audit (q235): bins cover the holdout, ECE is the " +
      "weighted gap, values stay probabilities") {
    val out = graft.SparkEntry.queries("q235_gate_calibration")(spark, sf001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val holdoutN = QualityGate.twinBase(docs).filter(col("doc_id") % 4 === 3).count()
    assert(rows.map(_.getLong(1)).sum == holdoutN)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0) // conf
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0) // acc
    }
    val ece = rows.head.getDouble(5)
    val recomputed = rows.map(r => r.getDouble(4) * r.getLong(1)).sum / holdoutN
    assert(math.abs(ece - recomputed) < 1e-6)
    assert(rows.map(_.getDouble(5)).distinct.length == 1)
  }
}
