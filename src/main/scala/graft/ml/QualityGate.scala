package graft.ml

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Learned quality gate — the model-based document filter stage the
  * curation family was missing (q223's gate is a threshold RULE;
  * production pipelines put a fastText-style learned classifier over
  * hashed n-gram counts in that slot). Two faces, the q63/q213 pattern:
  *
  * 1. THE REAL MODEL ([[QualityGate]]): logistic regression over D
  *    hashed token-count features. Features are pure dataflow — explode
  *    tokens → bucket by xxhash64 mod D → one grouped pass of D
  *    codegen'd sum(when) aggregates into a dense array (no UDF, no
  *    per-row vector building); training is MLlib LogisticRegression
  *    (distributed L-BFGS); SCORING folds the trained weights into a
  *    literal Column expression σ(b + Σ wᵢ·xᵢ) — the MlpModel recipe —
  *    so gating a corpus is one codegen'd projection. Spec-pinned
  *    (QualityGateSpec): learns the planted keyword signal, codegen
  *    score ≡ MLlib transform, gate behavior.
  * 2. THE DETERMINISTIC TWIN (q228): same task, exact-arithmetic
  *    linear-probability model — closed-form OLS over two keyword-count
  *    features through 3×3 normal equations solved by Cramer's rule on
  *    exact DECIMAL sufficient statistics (the q213/GroupedOls
  *    discipline), τ-gate, per-source confusion report. Every step is
  *    one deterministic expression over exact integers, so the entire
  *    train→score→gate→report pipeline replays as DuckDB SQL and the
  *    driver hash-checks it — the cross-engine proof the seeded L-BFGS
  *    fit cannot give directly.
  *
  * The planted label (does 'slow' outnumber 'fast', with a length
  * backstop) is the fixture-scale stand-in for a human quality rating:
  * deterministic so both engines and every round agree, yet only
  * PARTIALLY expressible by the twin's two features (the length
  * backstop is withheld), so the confusion matrix is non-trivial and
  * the gate is measured doing real work.
  *
  * Scale shape: feature build is explode + one hash agg (map-side
  * combined, D-bounded rows per doc); the fit touches the feature frame
  * only; scoring/gating is a broadcast of D+1 doubles folded into
  * literals. Nothing grows with the corpus but the two scans.
  */
object QualityGate {

  val D = 64

  /** Tokens of the documents text — the q213 convention (split on single
    * space, exactly string_split's semantics).
    */
  private def toks: Column = split(col("text"), " ")

  /** Planted deterministic label: 'slow' strictly outnumbers 'fast', OR
    * the doc is long (the withheld-from-the-twin backstop).
    */
  def labeled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"),
      size(filter(toks, t => t === "slow")).as("x_slow"),
      size(filter(toks, t => t === "fast")).as("x_fast"),
      col("text"))
      .withColumn("y",
        (col("x_slow") > col("x_fast") || col("n_chars") >= 380).cast("int"))

  /** Dense hashed token-count features: (doc_id, y, x: array<double>).
    * One explode + ONE grouped aggregation of D codegen'd conditional
    * sums — the no-UDF dense-vector build.
    */
  def features(docs: DataFrame): DataFrame = {
    val ex = labeled(docs)
      .select(col("doc_id"), col("y"), explode(toks).as("tok"))
      .select(col("doc_id"), col("y"), pmod(xxhash64(col("tok")), lit(D)).as("b"))
    ex.groupBy("doc_id", "y")
      .agg(array((0 until D).map(i =>
        sum(when(col("b") === i, 1.0).otherwise(0.0))): _*).as("x"))
  }

  final case class GateModel(weights: Array[Double], intercept: Double) {
    /** σ(b + Σ wᵢ·xᵢ) as a literal codegen expression over the feature
      * array column — the MlpModel folded-weights recipe.
      */
    def scoreExpr(x: Column): Column = {
      val z = weights.zipWithIndex.foldLeft(lit(intercept): Column) {
        case (acc, (w, i)) => acc + lit(w) * element_at(x, i + 1)
      }
      lit(1.0) / (lit(1.0) + exp(-z))
    }
  }

  /** Distributed fit on the feature frame (deterministic up to MLlib
    * L-BFGS's documented layout sensitivity — the fixed-coalesce rule
    * from BENCH.md applies to callers needing bit-reproducibility).
    */
  def fit(feats: DataFrame, maxIter: Int = 100, regParam: Double = 0.001): GateModel = {
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("features").setLabelCol("y")
      .setMaxIter(maxIter).setRegParam(regParam)
    val m = lr.fit(feats.select(col("y").cast("double").as("y"),
      array_to_vector(col("x")).as("features")))
    GateModel(m.coefficients.toArray, m.intercept)
  }

  /** Gate a corpus with a trained model: doc_id, score, pass. */
  def gate(docs: DataFrame, model: GateModel, tau: Double = 0.5): DataFrame =
    features(docs)
      .select(col("doc_id"), col("y"), model.scoreExpr(col("x")).as("score"))
      .withColumn("pass", col("score") >= tau)

  // ---------------------------------------------------------------- twin

  /** The twin's feature/label base: (doc_id, source, x1, x2, y). */
  def twinBase(docs: DataFrame): DataFrame =
    labeled(docs)
      .select(col("doc_id"), col("source"),
        col("x_slow").cast("long").as("x1"),
        col("x_fast").cast("long").as("x2"),
        col("y").cast("long").as("y"))

  /** Exact-arithmetic LPM coefficients (b0, b1, b2) from the training
    * split — the q228 Cramer solve, factored so the calibration audit
    * (q235) scores with the identical model.
    */
  def lpmCoef(train: DataFrame): DataFrame = {
      // exact integer sufficient statistics for the 3×3 normal equations
      val st = train.agg(
        count(lit(1)).as("n"),
        sum(col("x1").cast("decimal(38,0)")).as("s1"),
        sum(col("x2").cast("decimal(38,0)")).as("s2"),
        sum((col("x1") * col("x1")).cast("decimal(38,0)")).as("s11"),
        sum((col("x1") * col("x2")).cast("decimal(38,0)")).as("s12"),
        sum((col("x2") * col("x2")).cast("decimal(38,0)")).as("s22"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x1") * col("y")).cast("decimal(38,0)")).as("s1y"),
        sum((col("x2") * col("y")).cast("decimal(38,0)")).as("s2y"))
      def d(c: String) = col(c).cast("double")
      // Cramer's rule over A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]],
      // rhs = [sy,s1y,s2y] — one IEEE expression per coefficient from
      // exact integers, identical text in the oracle
      val det =
        d("n") * (d("s11") * d("s22") - d("s12") * d("s12")) -
          d("s1") * (d("s1") * d("s22") - d("s12") * d("s2")) +
          d("s2") * (d("s1") * d("s12") - d("s11") * d("s2"))
      val det0 =
        d("sy") * (d("s11") * d("s22") - d("s12") * d("s12")) -
          d("s1") * (d("s1y") * d("s22") - d("s12") * d("s2y")) +
          d("s2") * (d("s1y") * d("s12") - d("s11") * d("s2y"))
      val det1 =
        d("n") * (d("s1y") * d("s22") - d("s12") * d("s2y")) -
          d("sy") * (d("s1") * d("s22") - d("s12") * d("s2")) +
          d("s2") * (d("s1") * d("s2y") - d("s1y") * d("s2"))
      val det2 =
        d("n") * (d("s11") * d("s2y") - d("s1y") * d("s12")) -
          d("s1") * (d("s1") * d("s2y") - d("s1y") * d("s2")) +
          d("sy") * (d("s1") * d("s12") - d("s11") * d("s2"))
      // singular-design guard (the q213 varx rule): degenerate corpora
      // produce an empty report, never NaN coefficients
      st.select(
        Metrics.canonRound(when(abs(det) > 1e-9, det0 / det), 6).as("b0"),
        Metrics.canonRound(when(abs(det) > 1e-9, det1 / det), 6).as("b1"),
        Metrics.canonRound(when(abs(det) > 1e-9, det2 / det), 6).as("b2"))
        .filter(col("b0").isNotNull)
  }

  /** The q228 oracle's model block (ends with `coef(b0, b1, b2)`),
    * kept as one string so q228 and the q235 calibration audit cannot
    * drift (the lmOracleCtes precedent).
    */
  private def twinCoefCtes: String =
    """base AS (
        SELECT doc_id, source,
          len(list_filter(string_split(text, ' '), t -> t = 'slow')) AS x1,
          len(list_filter(string_split(text, ' '), t -> t = 'fast')) AS x2,
          CAST(len(list_filter(string_split(text, ' '), t -> t = 'slow')) >
                 len(list_filter(string_split(text, ' '), t -> t = 'fast'))
               OR n_chars >= 380 AS INT) AS y
        FROM documents),
      train AS (SELECT * FROM base WHERE doc_id % 4 != 3),
      st AS (
        SELECT count(*) AS n,
          sum(x1) AS s1, sum(x2) AS s2,
          sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
          sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
        FROM train),
      dd AS (
        SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
          CAST(s2 AS DOUBLE) AS s2, CAST(s11 AS DOUBLE) AS s11,
          CAST(s12 AS DOUBLE) AS s12, CAST(s22 AS DOUBLE) AS s22,
          CAST(sy AS DOUBLE) AS sy, CAST(s1y AS DOUBLE) AS s1y,
          CAST(s2y AS DOUBLE) AS s2y
        FROM st),
      dets AS (
        SELECT
          n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s12 - s11 * s2) AS det,
          sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y) AS det0,
          n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2) AS det1,
          n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2) AS det2
        FROM dd),
      coef AS (
        SELECT floor(det0 / det * 1e6 + 0.5) / 1e6 AS b0,
               floor(det1 / det * 1e6 + 0.5) / 1e6 AS b1,
               floor(det2 / det * 1e6 + 0.5) / 1e6 AS b2
        FROM dets WHERE abs(det) > 1e-9)"""

  val q228 = GQuery(
    "q228_quality_gate_twin",
    (s, dir) => {
      val base = twinBase(Tables.documents(s, dir))
      val coef = lpmCoef(base.filter(col("doc_id") % 4 =!= 3))
      // score + τ-gate the FULL corpus with the rounded coefficients
      val scored = base.crossJoin(broadcast(coef))
        .withColumn("p", col("b0") + col("b1") * col("x1").cast("double") +
          col("b2") * col("x2").cast("double"))
        .withColumn("pass", (col("p") >= 0.5).cast("int"))
      scored.groupBy("source", "b0", "b1", "b2")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pass")).as("n_pass"),
          sum(when(col("pass") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pass") === 1 && col("y") === 0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("pass") === 0 && col("y") === 1, 1L).otherwise(0L)).as("fn"),
          sum(when(col("pass") === 0 && col("y") === 0, 1L).otherwise(0L)).as("tn"))
        .select(col("source"), col("n_docs"), col("n_pass"),
          Metrics.canonRound(col("n_pass").cast("double") / col("n_docs").cast("double"), 4)
            .as("pass_rate"),
          col("tp"), col("fp"), col("fn"), col("tn"),
          Metrics.canonRound((col("tp") + col("tn")).cast("double") /
            col("n_docs").cast("double"), 4).as("accuracy"),
          col("b0"), col("b1"), col("b2"))
        .orderBy("source")
    },
    Some(s"""WITH $twinCoefCtes,
      scored AS (
        SELECT b.source, b.y, c.b0, c.b1, c.b2,
          CAST(c.b0 + c.b1 * CAST(b.x1 AS DOUBLE) + c.b2 * CAST(b.x2 AS DOUBLE)
               >= 0.5 AS INT) AS pass
        FROM base b, coef c)
      SELECT source, count(*) AS n_docs, CAST(sum(pass) AS BIGINT) AS n_pass,
        floor(CAST(sum(pass) AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4 AS pass_rate,
        CAST(sum(CASE WHEN pass = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN pass = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN pass = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(sum(CASE WHEN pass = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        floor(CAST(sum(CASE WHEN pass = 1 AND y = 1 THEN 1 ELSE 0 END)
                 + sum(CASE WHEN pass = 0 AND y = 0 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*) * 1e4 + 0.5) / 1e4 AS accuracy,
        b0, b1, b2
      FROM scored
      GROUP BY source, b0, b1, b2
      ORDER BY source"""))

  /** Calibration audit of the gate (q235): reliability diagram +
    * expected calibration error (Naeini et al. 2015, "Obtaining well
    * calibrated probabilities using Bayesian binning"; the ECE as
    * commonly reported per Guo et al. 2017 — public literature) for the
    * LPM twin's clipped probabilities on the HELD-OUT quarter (doc_id %
    * 4 = 3 — the split q228 trains around). A learned gate that scores
    * 0.9 should be right 90% of the time; the per-bin (confidence,
    * accuracy) pairs and their weighted gap measure exactly that, and
    * are what decides whether the gate's τ can be trusted as a
    * probability or must be re-calibrated. Everything is IEEE
    * arithmetic over exact integers plus the established decimal-sum
    * idioms — same coefficients as q228 (shared twinCoefCtes, zero
    * drift possible).
    *
    * Scale shape: score+bin is one scan over the holdout with a 1-row
    * broadcast coef; the diagram is a ≤10-row aggregate; ECE a 1-row
    * rollup of that. Nothing beyond the q228 plan.
    */
  val q235 = GQuery(
    "q235_gate_calibration",
    (s, dir) => {
      val base = twinBase(Tables.documents(s, dir))
      val coef = lpmCoef(base.filter(col("doc_id") % 4 =!= 3))
      val holdout = base.filter(col("doc_id") % 4 === 3)
        .crossJoin(broadcast(coef))
        .withColumn("p", col("b0") + col("b1") * col("x1").cast("double") +
          col("b2") * col("x2").cast("double"))
        .withColumn("pc", least(greatest(col("p"), lit(0.0)), lit(1.0)))
        .withColumn("bin", least(floor(col("pc") * 10), lit(9L)).cast("int"))
      // ≤ 10 rows but its subtree is the whole holdout scoring pass —
      // cached because BOTH the ECE rollup and the final select consume
      // it (the q229 tiny-ranked-state rule)
      val bins = holdout.groupBy("bin")
        .agg(count(lit(1)).as("n"),
          Metrics.exactMean(col("pc")).as("conf"),
          (sum("y").cast("double") / count(lit(1)).cast("double")).as("acc"))
        .withColumn("conf_r", Metrics.canonRound(col("conf"), 6))
        .withColumn("acc_r", Metrics.canonRound(col("acc"), 6))
        .withColumn("gap_r", Metrics.canonRound(abs(col("conf_r") - col("acc_r")), 6))
        .cache()
      val tot = bins.agg(sum("n").as("nn"),
          sum((col("gap_r") * col("n")).cast("decimal(28,6)")).as("wg"))
        .select(Metrics.canonRound(
          col("wg").cast("double") / col("nn").cast("double"), 6).as("ece_r"))
      bins.crossJoin(broadcast(tot)) // 1-row scalar
        .select(col("bin"), col("n"), col("conf_r"), col("acc_r"),
          col("gap_r"), col("ece_r"))
        .orderBy("bin")
    },
    Some(s"""WITH $twinCoefCtes,
      holdout AS (
        SELECT b.y,
          least(greatest(c.b0 + c.b1 * CAST(b.x1 AS DOUBLE)
                + c.b2 * CAST(b.x2 AS DOUBLE), 0.0), 1.0) AS pc
        FROM base b CROSS JOIN coef c
        WHERE b.doc_id % 4 = 3),
      binned AS (
        SELECT CAST(least(floor(pc * 10), 9) AS INTEGER) AS bin, y, pc
        FROM holdout),
      bins AS (
        SELECT bin, count(*) AS n,
          floor((CAST(sum(CAST(floor((pc)*1e4+0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*)) * 1e6 + 0.5) / 1e6 AS conf_r,
          floor((CAST(sum(y) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS acc_r
        FROM binned GROUP BY 1),
      bins2 AS (
        SELECT bin, n, conf_r, acc_r,
          floor(abs(conf_r - acc_r) * 1e6 + 0.5) / 1e6 AS gap_r
        FROM bins),
      tot AS (
        SELECT floor((CAST(sum(CAST(gap_r * n AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ece_r
        FROM bins2)
      SELECT b.bin, b.n, b.conf_r, b.acc_r, b.gap_r, t.ece_r
      FROM bins2 b CROSS JOIN tot t ORDER BY b.bin"""))

  def all: Seq[GQuery] = Seq(q228, q235)
}
