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
      // Registry entry = the TRIAL-scale stack (the r10 VERDICT's bench
      // lever): 18 training months — with k=3 + metaFolds=1 the one
      // fitted fold still trains on 12 months, comfortably past the
      // 8-month starvation floor that killed k=2-on-one-year (stack
      // SMAPE 16.5 vs 6) — and a trimmed GBT budget (5 iters, depth
      // 3/4). The production shape (27 months, 8-iter bases, the full
      // 12-combo grid) lives in SalesMlSpec + BaselineParity; this
      // entry's job is to exercise OOF stacking + ridge meta + scale
      // correction end-to-end every round, not to re-train the flagship.
      val sales = graft.ml.SalesData.generate(s, "2017-07-01", "2019-03-31")
      val (prepared, _) = graft.ml.SalesFeatures.prepare(s, sales, coalesceTo = Some(8))
      val train = prepared.filter(to_date(col("date")) <= lit("2018-12-31"))
      val valid = prepared.filter(to_date(col("date")) > lit("2018-12-31"))
      // L1-leaning stage-1 models: on this wide one-hot + harmonic feature
      // set, L2-only ridge spreads trend weight onto features that
      // extrapolate badly past the training range (valid SMAPE ~13.6 vs
      // ~6.9 for elastic-net at matched strength; GBT depth is
      // irrelevant) — and the failure is invisible to the OOF meta fit,
      // which scores in-range. So every base gets the L1 component.
      // the third combo routes stage-1 through ml.MlpRegressor so the
      // Spark-native MLP trains under the driver's bench/correctness
      // gates every round like every other operator (r11 VERDICT item 4 —
      // E7's closure previously lived only in specs). Trial-scale epoch
      // budget: 40 full-batch treeAggregate epochs × 2 fits (one OOF
      // fold + final) ≈ +3s, launch latency per epoch-job dominating at
      // trial scale; the converged-quality config (150 epochs,
      // hidden 16, SMAPE 6.78 vs linear 13.59) stays pinned in
      // SalesMlSpec — this slot's job is exercising the estimator
      // end-to-end, not re-winning the grid.
      val grid = Seq(
        ("enet_gbt3", graft.ml.BoostedHybrid(elasticNetParam = 0.5, regParam = 0.005,
          gbtMaxIter = 5, gbtMaxDepth = 3)),
        ("enet_gbt4", graft.ml.BoostedHybrid(elasticNetParam = 0.5, regParam = 0.005,
          gbtMaxIter = 5, gbtMaxDepth = 4)),
        ("mlp_gbt4", graft.ml.BoostedHybrid(stage1 = "mlp", mlpHidden = 8,
          mlpEpochs = 20, mlpLr = 0.3, gbtMaxIter = 5, gbtMaxDepth = 4)))
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

  /** Univariate F-regression feature selection (E17), computed
    * explicitly: per-feature Pearson r against the label in ONE
    * aggregation pass, F = r²·(n−2)/(1−r²), rank by F. This is exactly
    * what MLlib's UnivariateFeatureSelector(continuous/continuous)
    * scores — but at text-feature correlation levels (r ≈ 0.95+) the
    * selector's p-values underflow to 0.0 and its "top-k" degenerates
    * to index order (measured: it returns features [0,1,2] regardless
    * of F), so the EXPLICIT statistic is the only trustworthy ranking;
    * MlSpec pins agreement with MLlib's FValueTest F-values. r is
    * snapped to 1e-4 BEFORE the F quotient on both engines (corr
    * agrees cross-engine at 1e-4; 1/(1−r²) would amplify anything
    * finer), making F bit-identical. Features are deliberately
    * collinear-with-length text stats over `documents` — the selection
    * a quality-scoring pipeline would run. MLlib's selector on the
    * sales frame stays pinned in SalesMlSpec (FeatureSelection).
    *
    * Scale: one scan, 7 aggregates, a 7-row ranking — nothing grows
    * with the corpus but the scan.
    */
  val q67 = GQuery(
    "q67_feature_selector",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      def cnt(ch: String) =
        (length(col("text")) - length(regexp_replace(col("text"), ch, ""))).cast("double")
      val feats = Seq(
        "f_spaces" -> cnt(" "), "f_e" -> cnt("e"), "f_t" -> cnt("t"),
        "f_a" -> cnt("a"), "f_id" -> col("doc_id").cast("double"),
        "f_en" -> (col("lang") === "en").cast("int").cast("double"))
      val lbl = col("n_chars").cast("double")
      val f = d.select(lbl.as("label") +: feats.map { case (n, c) => c.as(n) }: _*)
      val wide = f.agg(
        count(lit(1)).as("n"),
        feats.map { case (n, _) => Metrics.canonRound(corr(col(n), col("label")), 4).as(n) }: _*)
      val stackArgs = feats.map { case (n, _) => s"'$n', $n" }.mkString(", ")
      val fstat = col("r") * col("r") * (col("n") - 2).cast("double") /
        (lit(1.0) - col("r") * col("r"))
      wide.select(col("n"), expr(s"stack(${feats.size}, $stackArgs) as (feature, r)"))
        .select(col("feature"), col("r"), Metrics.canonRound(fstat, 4).as("f_stat"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("f_stat").desc, col("feature"))))
        .filter(col("rank") <= 3)
        .select(col("rank").cast("int").as("rank"), col("feature"), col("r"), col("f_stat"))
        .orderBy("rank")
    },
    Some("""WITH f AS (
        SELECT CAST(n_chars AS DOUBLE) AS label,
          CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS f_spaces,
          CAST(length(text) - length(replace(text, 'e', '')) AS DOUBLE) AS f_e,
          CAST(length(text) - length(replace(text, 't', '')) AS DOUBLE) AS f_t,
          CAST(length(text) - length(replace(text, 'a', '')) AS DOUBLE) AS f_a,
          CAST(doc_id AS DOUBLE) AS f_id,
          CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS f_en
        FROM documents),
      w AS (SELECT count(*) AS n,
        floor(corr(f_spaces, label)*1e4 + 0.5)/1e4 AS f_spaces,
        floor(corr(f_e, label)*1e4 + 0.5)/1e4 AS f_e,
        floor(corr(f_t, label)*1e4 + 0.5)/1e4 AS f_t,
        floor(corr(f_a, label)*1e4 + 0.5)/1e4 AS f_a,
        floor(corr(f_id, label)*1e4 + 0.5)/1e4 AS f_id,
        floor(corr(f_en, label)*1e4 + 0.5)/1e4 AS f_en
        FROM f),
      u AS (
        SELECT n, 'f_spaces' AS feature, f_spaces AS r FROM w
        UNION ALL SELECT n, 'f_e', f_e FROM w
        UNION ALL SELECT n, 'f_t', f_t FROM w
        UNION ALL SELECT n, 'f_a', f_a FROM w
        UNION ALL SELECT n, 'f_id', f_id FROM w
        UNION ALL SELECT n, 'f_en', f_en FROM w),
      scored AS (
        SELECT feature, r,
          floor((r*r*CAST(n-2 AS DOUBLE)/(1.0 - r*r))*1e4 + 0.5)/1e4 AS f_stat
        FROM u),
      ranked AS (
        SELECT feature, r, f_stat,
          CAST(row_number() OVER (ORDER BY f_stat DESC, feature) AS INTEGER) AS rank
        FROM scored)
      SELECT rank, feature, r, f_stat FROM ranked WHERE rank <= 3 ORDER BY rank"""))

  def all: Seq[GQuery] = Seq(q60, q61, q62, q63, q64, q66, q67)
}
