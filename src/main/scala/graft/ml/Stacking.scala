package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stacking ensemble with time-ordered out-of-fold meta-features (E10,
  * kaggle/kaggle.py:791 — sklearn StackingRegressor has no MLlib
  * equivalent, so this is custom per SURVEY.md §7.3).
  *
  * Folds are ROLLING-ORIGIN (train on everything before the fold's date
  * range, predict the range — W4/E11), so meta-features never leak future
  * information: the failure mode §7.4 item 5 warns about. Every base fit
  * is a distributed MLlib job; only the fold boundaries (a handful of
  * dates) live on the driver.
  */
object Stacking {

  /** Model grid (E9): cartesian stage-1 linear variants × stage-2 GBT
    * depths, mirroring the reference's 12-combo PRODUCTION stack
    * (kaggle/kaggle.py:769-778) at test-friendly scale.
    */
  def defaultGrid: Seq[(String, BoostedHybrid)] =
    for {
      (l1name, enet, reg) <- Seq(("ridge", 0.0, 0.1), ("enet", 0.5, 0.05))
      (l2name, depth) <- Seq(("gbt4", 4), ("gbt6", 6))
    } yield (s"${l1name}_$l2name",
      BoostedHybrid(elasticNetParam = enet, regParam = reg, gbtMaxDepth = depth))

  /** The reference's full PRODUCTION grid shape (kaggle/kaggle.py:769-778):
    * 4 stage-1 variants × 3 GBM stage-2 variants = 12 BoostedHybrid
    * combos. The reference's stage-1 zoo is ElasticNet / Ridge /
    * LinearRegression / MLPRegressor (kaggle.py:731-743); the fourth slot
    * here is an FMRegressor — MLlib ships no regression MLP, and a
    * factorization machine is the library's closest distributed
    * nonlinear-interaction learner (SURVEY E7). The GBM profiles (three
    * distinct depth/iteration/learning-rate settings) stand in for XGB /
    * LGBM / CatBoost (kaggle.py:720-746), which have no MLlib jars in
    * this environment. Per-base budgets are bounded (≤20 trees vs the
    * reference's n_estimators=1000) so the 12×15-fold demo completes in
    * ~2 minutes on one node; the grid SHAPE, not the tree budget, is what
    * is mirrored.
    */
  def productionGrid: Seq[(String, BoostedHybrid)] =
    for {
      (l1name, bh0) <- Seq(
        ("ridge", BoostedHybrid(elasticNetParam = 0.0, regParam = 0.1)),
        ("enet", BoostedHybrid(elasticNetParam = 0.5, regParam = 0.05)),
        ("ols", BoostedHybrid(elasticNetParam = 0.0, regParam = 0.0)),
        ("fm", BoostedHybrid(stage1 = "fm", regParam = 0.01)))
      (l2name, iter, depth, step) <- Seq(
        ("gbtA", 15, 4, 0.1), ("gbtB", 20, 3, 0.15), ("gbtC", 10, 5, 0.2))
    } yield (s"${l1name}_$l2name",
      bh0.copy(gbtMaxIter = iter, gbtMaxDepth = depth, gbtStepSize = step))

  /** Rolling-origin VALIDATION fold boundaries: the date span splits
    * into k equal slices and every slice except the FIRST becomes a
    * validation fold (k − 1 folds returned — the first slice exists
    * only as training prefix; a fold with an empty training side would
    * be unusable). Callers sizing OOF coverage should count on k − 1
    * validation ranges (review finding, r15: the old doc promised "k
    * folds" and k = 1 crashed downstream on an empty reduce).
    */
  def timeFolds(df: DataFrame, dateCol: String, k: Int): Seq[(String, String)] = {
    require(k >= 2, s"rolling-origin folds need k >= 2 (k slices = k-1 validation folds), got $k")
    val head = df.agg(min(to_date(col(dateCol))).cast("string"),
      max(to_date(col(dateCol))).cast("string")).head()
    require(!head.isNullAt(0), s"timeFolds over an empty frame (no $dateCol values)")
    val Seq(lo, hi) = head.toSeq.map(_.toString)
    val (d0, d1) = (java.time.LocalDate.parse(lo), java.time.LocalDate.parse(hi))
    val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
    (1 until k).map { i =>
      val a = d0.plusDays(span * i / k)
      val b = d0.plusDays(span * (i + 1) / k - 1)
      (a.toString, if (i == k - 1) d1.toString else b.toString)
    }
  }

  final case class StackModel(
      baseModels: Seq[(String, BoostedHybridModel)],
      metaWeights: Array[Double],
      metaIntercept: Double) {

    def transform(df: DataFrame): DataFrame = {
      val withBase = baseModels.foldLeft(df) { case (acc, (name, m)) =>
        m.transform(acc).withColumnRenamed("prediction", s"oof_$name")
      }
      val meta = baseModels.map(_._1).zip(metaWeights)
        .map { case (n, w) => col(s"oof_$n") * w }
        .reduce(_ + _) + metaIntercept
      withBase.withColumn("prediction", meta)
    }
  }

  /** Fit: per fold, fit every base model on data strictly before the fold
    * and predict into it → OOF columns; ridge meta-learner on the OOF
    * matrix; final base models refit on the full training set.
    *
    * All (fold × model) base fits are independent, so they are submitted
    * CONCURRENTLY from a thread pool — Spark's scheduler interleaves the
    * jobs across the cluster (the same design as CrossValidator's
    * setParallelism; per-fit job-launch latency, not compute, dominates a
    * sequential loop). The final full-train base fits overlap with the
    * OOF assembly and meta fit. Results are identical to the sequential
    * order — each fit is an isolated estimator on a deterministic slice.
    */
  /** @param metaFolds how many of the LATEST folds feed the meta fit
    * (default: all, the classic stacking shape). Passing 1 trains the
    * meta-learner on the last fold's OOF rows only — early folds' models
    * train on short prefixes and systematically underpredict a trending
    * series, and meta weights learned on those rows over-scale the
    * full-trained final bases (a k=5 experiment made this worse, not
    * better), so the flagship sales query opts into metaFolds=1. Note
    * base models are only fitted for the folds that feed the meta fit.
    */
  def fit(train: DataFrame, grid: Seq[(String, BoostedHybrid)] = defaultGrid,
          k: Int = 3, dateCol: String = "date", labelCol: String = "num_sold",
          parallelism: Int = 8, metaFolds: Int = Int.MaxValue): StackModel = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // only the folds whose OOF rows feed the meta fit need base models —
    // fitting the earlier folds would be discarded compute
    val folds = timeFolds(train, dateCol, k).takeRight(metaFolds)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futFitted = Future.sequence(
        for (((a, _), i) <- folds.zipWithIndex; (name, bh) <- grid) yield Future {
          val tr = train.filter(to_date(col(dateCol)) < lit(a))
          ((i, name), bh.fit(tr))
        })
      val futFinal = Future.sequence(grid.map { case (n, bh) => Future((n, bh.fit(train))) })
      val fitted = Await.result(futFitted, Duration.Inf).toMap
      val oofParts = folds.zipWithIndex.map { case ((a, b), i) =>
        val va = train.filter(to_date(col(dateCol)).between(a, b))
        grid.foldLeft(va) { case (acc, (name, _)) =>
          fitted((i, name)).transform(acc).withColumnRenamed("prediction", s"oof_$name")
        }
      }
      val oof = oofParts.reduce(_.unionByName(_))
      val asm = new VectorAssembler()
        .setInputCols(grid.map { case (n, _) => s"oof_$n" }.toArray)
        .setOutputCol("meta_features")
      // fitIntercept=false: fold models trained on earlier data underpredict
      // trending series; a free intercept learned on those biased OOF rows
      // transfers badly to the full-trained final bases. A pure linear blend
      // is the stable choice (and what RidgeCV over predictions effectively
      // learns when the bases are unbiased).
      val ridge = new LinearRegression()
        .setFeaturesCol("meta_features").setLabelCol(labelCol)
        .setRegParam(0.1).setElasticNetParam(0.0).setFitIntercept(false)
      val metaModel = ridge.fit(asm.transform(oof))
      val finalBases = Await.result(futFinal, Duration.Inf)
      StackModel(finalBases, metaModel.coefficients.toArray, metaModel.intercept)
    } finally pool.shutdown()
  }
}
