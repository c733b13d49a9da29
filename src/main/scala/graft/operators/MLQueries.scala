package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** ML-adjacent dataflow queries (SURVEY.md §2.8): SMAPE evaluation, the
  * scale-correction weight grid, blending and geometric rounding — the
  * pieces of the reference's model workload that are pure dataflow. The
  * estimator pipeline itself (BoostedHybrid / stacking) lives in graft.ml
  * with its own rows-only queries and ScalaTest coverage.
  */
object MLQueries {

  /** SMAPE (E12, kaggle/kaggle.py:109-131) of a group-mean naive forecast:
    * per-group window average as ŷ, aggregate SMAPE per group.
    */
  val q60 = GQuery(
    "q60_smape",
    (s, dir) => {
      val w = Window.partitionBy("l_returnflag", "l_linestatus")
      Tables.lineitem(s, dir)
        .withColumn("pred", avg("l_quantity").over(w))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(graft.functions.Metrics.canonRound(Metrics.smape(col("l_quantity"), col("pred")), 4).as("smape"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""WITH p AS (
        SELECT l_returnflag, l_linestatus, l_quantity,
               avg(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus) AS pred
        FROM lineitem)
      SELECT l_returnflag, l_linestatus,
        floor((avg(CASE WHEN abs(l_quantity) + abs(pred) = 0 THEN 0.0
                       ELSE abs(l_quantity - pred) / ((abs(l_quantity) + abs(pred)) / 200.0)
                  END)) * 1e4 + 0.5)/1e4 AS smape,
        count(*) AS n
      FROM p GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** SMAPE-minimizing scale-correction sweep (E13, kaggle/kaggle.py:497-523):
    * predictions × weight grid cross join, SMAPE per weight. The grid is 51
    * rows — broadcast; the predictions side streams once.
    */
  val q61 = GQuery(
    "q61_weight_grid",
    (s, dir) => {
      import s.implicits._
      val grid = (0 until 51).map(i => math.rint((0.97 + i * 0.001) * 1000) / 1000).toDF("weight")
      val w = Window.partitionBy("l_returnflag")
      val preds = Tables.lineitem(s, dir)
        .withColumn("pred", avg("l_quantity").over(w))
        .select("l_quantity", "pred")
      preds.crossJoin(broadcast(grid))
        .groupBy("weight")
        .agg(graft.functions.Metrics.canonRound(Metrics.smape(col("l_quantity"), col("pred") * col("weight")), 4).as("smape"))
        .orderBy("weight")
    },
    Some("""WITH p AS (
        SELECT l_quantity, avg(l_quantity) OVER (PARTITION BY l_returnflag) AS pred
        FROM lineitem),
      grid AS (SELECT floor((0.97 + 0.001 * CAST(unnest(generate_series(0, 50)) AS DOUBLE)) * 1e3 + 0.5)/1e3 AS weight)
      SELECT weight,
        floor((avg(CASE WHEN abs(l_quantity) + abs(pred * weight) = 0 THEN 0.0
                       ELSE abs(l_quantity - pred * weight)
                            / ((abs(l_quantity) + abs(pred * weight)) / 200.0) END)) * 1e4 + 0.5)/1e4 AS smape
      FROM p CROSS JOIN grid GROUP BY weight ORDER BY weight"""))

  /** Ensemble blending (E15) + geometric rounding (E16): mean / median /
    * better-than-median over an array of per-"fold" predictions, built here
    * from three window forecasts at different grains.
    */
  val q62 = GQuery(
    "q62_blend_round",
    (s, dir) => {
      // The three per-grain means are GRAND aggregates (3 / 2 / 6 rows) —
      // computed as groupBy + broadcast joins back onto the fact scan. The
      // window form (partitionBy over near-whole-table keys) would shuffle
      // and sort the full fact table three times; at 100 TB that's three
      // full-data exchanges for what is semantically a 6-row lookup.
      val l = Tables.lineitem(s, dir)
      val byRf = l.groupBy("l_returnflag").agg(avg("l_quantity").as("p1"))
      val byLs = l.groupBy("l_linestatus").agg(avg("l_quantity").as("p2"))
      val byBoth = l.groupBy("l_returnflag", "l_linestatus").agg(avg("l_quantity").as("p3"))
      val preds = array(col("p1"), col("p2"), col("p3"))
      l.join(broadcast(byRf), Seq("l_returnflag"))
        .join(broadcast(byLs), Seq("l_linestatus"))
        .join(broadcast(byBoth), Seq("l_returnflag", "l_linestatus"))
        .select(col("l_orderkey"), col("l_linenumber"), preds.as("preds"))
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.Metrics.canonRound(Metrics.arrayMean(col("preds")), 4).as("blend_mean"),
          graft.functions.Metrics.canonRound(Metrics.arrayMedian(col("preds")), 4).as("blend_median"),
          graft.functions.Metrics.canonRound(Metrics.betterThanMedian(col("preds")), 4).as("blend_btm"),
          Metrics.geometricRound(Metrics.arrayMean(col("preds"))).as("blend_int"))
        // non-unique (orderkey, linenumber): sort by everything (see q02)
        .orderBy("l_orderkey", "l_linenumber", "blend_mean", "blend_median")
    },
    Some("""WITH p AS (
        SELECT l_orderkey, l_linenumber,
          [avg(l_quantity) OVER (PARTITION BY l_returnflag),
           avg(l_quantity) OVER (PARTITION BY l_linestatus),
           avg(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus)] AS preds
        FROM lineitem),
      m AS (
        SELECT l_orderkey, l_linenumber, preds,
          (preds[1] + preds[2] + preds[3])/3.0 AS bmean,
          list_sort(preds)[2] AS bmed
        FROM p)
      SELECT l_orderkey, l_linenumber,
        floor((bmean) * 1e4 + 0.5)/1e4 AS blend_mean,
        floor((bmed) * 1e4 + 0.5)/1e4 AS blend_median,
        floor((CASE WHEN list_max(preds) - list_min(preds) < 0.45 THEN bmean ELSE bmed END) * 1e4 + 0.5)/1e4 AS blend_btm,
        CASE WHEN bmean < sqrt(floor(bmean)*ceil(bmean)) THEN floor(bmean) ELSE ceil(bmean) END AS blend_int
      FROM m ORDER BY l_orderkey, l_linenumber, blend_mean, blend_median"""))

  /** BoostedHybrid end-to-end (E6): synthetic sales (the reference's own
    * dataset shape) → feature build → encoder pipeline → linear + GBT
    * residual fit → per-series validation SMAPE. Model fits aren't
    * SQL-expressible → rows-only check.
    */
  val q63 = GQuery(
    "q63_boosted_hybrid",
    (s, dir) => {
      val sales = graft.ml.SalesData.generate(s, "2018-01-01", "2019-03-31")
      val (prepared, _) = graft.ml.SalesFeatures.prepare(s, sales, coalesceTo = Some(8))
      val train = prepared.filter(to_date(col("date")) <= lit("2018-12-31"))
      val valid = prepared.filter(to_date(col("date")) > lit("2018-12-31"))
      val model = graft.ml.BoostedHybrid(gbtMaxIter = 8, gbtMaxDepth = 4).fit(train)
      model.transform(valid)
        .groupBy("country", "store", "product")
        .agg(Metrics.canonRound(Metrics.smape(col("num_sold"), col("prediction")), 2).as("smape"),
          count(lit(1)).as("n"))
        .orderBy("country", "store", "product")
    },
    None)

  /** OOF stacking + ridge meta + scale correction (E9/E10/E13) end-to-end;
    * output = one row of ensemble-level metrics. Rows-only check.
    */
  val q64 = GQuery(
    "q64_stacking",
    (s, dir) => {
      import s.implicits._
      // two training years so every rolling-origin fold's model sees at
      // least eight months — k=2 on one year starved fold 1 and the meta
      // learner with it (stack SMAPE 16.5 vs 6 for a single hybrid)
      val sales = graft.ml.SalesData.generate(s, "2017-01-01", "2019-03-31")
      val (prepared, _) = graft.ml.SalesFeatures.prepare(s, sales, coalesceTo = Some(8))
      val train = prepared.filter(to_date(col("date")) <= lit("2018-12-31"))
      val valid = prepared.filter(to_date(col("date")) > lit("2018-12-31"))
      // L1-leaning stage-1 models: on this wide one-hot + harmonic feature
      // set, L2-only ridge spreads trend weight onto features that
      // extrapolate badly past the training range (valid SMAPE ~13.6 vs
      // ~6.9 for elastic-net at matched strength; GBT depth is
      // irrelevant) — and the failure is invisible to the OOF meta fit,
      // which scores in-range. So every base gets the L1 component.
      val grid = Seq(
        ("enet_gbt4", graft.ml.BoostedHybrid(elasticNetParam = 0.5, regParam = 0.005,
          gbtMaxIter = 8, gbtMaxDepth = 4)),
        ("enet_gbt5", graft.ml.BoostedHybrid(elasticNetParam = 0.5, regParam = 0.005,
          gbtMaxIter = 8, gbtMaxDepth = 5)))
      // metaFolds=1: meta weights fit on the last fold's OOF rows only —
      // validated in round 2 (earlier short-prefix folds bias the blend)
      val stack = graft.ml.Stacking.fit(train, grid, k = 3, metaFolds = 1)
      val scored = stack.transform(valid).cache()
      val smape = scored.select(Metrics.smape(col("num_sold"), col("prediction"))).head().getDouble(0)
      val (bestW, bestSmape) = graft.ml.ScaleCorrection.bestWeight(
        scored.select("num_sold", "prediction"), "num_sold", "prediction")
      Seq((math.rint(smape * 100) / 100, bestW, math.rint(bestSmape * 100) / 100,
        grid.size.toLong)).toDF("smape", "best_weight", "smape_corrected", "n_base_models")
    },
    None)

  /** Univariate feature scoring (E17): per-feature Pearson correlation with
    * the target, computed as ONE aggregation pass (5 corr aggregates share
    * the scan/shuffle) then unpivoted with stack(). The SQL-expressible
    * face of feature selection; the MLlib selector itself is q67.
    */
  val q66 = GQuery(
    "q66_feature_corr",
    (s, dir) => {
      val feats = Seq("l_quantity", "l_discount", "l_tax", "p_retailprice", "p_size")
      val j = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      val wide = j.agg(
        corr(col(feats.head), col("l_extendedprice")).as(feats.head),
        feats.tail.map(f => corr(col(f), col("l_extendedprice")).as(f)): _*)
      val stackArgs = feats.map(f => s"'$f', $f").mkString(", ")
      wide.select(expr(s"stack(${feats.size}, $stackArgs) as (feature, r)"))
        .select(col("feature"), Metrics.canonRound(col("r"), 4).as("r"))
        .orderBy("feature")
    },
    Some("""WITH j AS (SELECT * FROM lineitem JOIN part ON l_partkey = p_partkey),
      w AS (SELECT
        corr(l_quantity, l_extendedprice) AS l_quantity,
        corr(l_discount, l_extendedprice) AS l_discount,
        corr(l_tax, l_extendedprice) AS l_tax,
        corr(p_retailprice, l_extendedprice) AS p_retailprice,
        corr(p_size, l_extendedprice) AS p_size
        FROM j)
      SELECT feature, floor((r) * 1e4 + 0.5)/1e4 AS r
      FROM (
        SELECT 'l_quantity' AS feature, l_quantity AS r FROM w
        UNION ALL SELECT 'l_discount', l_discount FROM w
        UNION ALL SELECT 'l_tax', l_tax FROM w
        UNION ALL SELECT 'p_retailprice', p_retailprice FROM w
        UNION ALL SELECT 'p_size', p_size FROM w)
      ORDER BY feature"""))

  /** MLlib UnivariateFeatureSelector (E17, f-regression flavor): top-5
    * features of the sales feature vector by F-test against num_sold.
    * Selector fit is iterative/MLlib-internal → rows-only check; the
    * deterministic generator makes the selected indices reproducible.
    */
  val q67 = GQuery(
    "q67_feature_selector",
    (s, dir) => {
      import s.implicits._
      val sales = graft.ml.SalesData.generate(s, "2018-01-01", "2018-12-31")
      val (prepared, _) = graft.ml.SalesFeatures.prepare(s, sales, coalesceTo = Some(8))
      val sel = new org.apache.spark.ml.feature.UnivariateFeatureSelector()
        .setFeatureType("continuous").setLabelType("continuous")
        .setSelectionMode("numTopFeatures").setSelectionThreshold(5)
        .setFeaturesCol("features").setLabelCol("num_sold").setOutputCol("selected")
      val model = sel.fit(prepared)
      model.selectedFeatures.sorted.toSeq.map(_.toLong).toDF("feature_idx")
    },
    None)

  def all: Seq[GQuery] = Seq(q60, q61, q62, q63, q64, q66, q67)
}
