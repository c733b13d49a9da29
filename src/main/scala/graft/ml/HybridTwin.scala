package graft.ml

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Deterministic, oracle-checkable twin of the BoostedHybrid dataflow
  * (kaggle/kaggle.py:700-778's linear-plus-residual-GBM recipe, q63/q64's
  * MLlib implementation): stage-1 is an exact-integer OLS (the q208
  * GroupedOls discipline — integer sufficient statistics, one IEEE
  * division per coefficient) and stage-2 is a depth-1 regression stump
  * fitted on the 1e-4-snapped stage-1 residuals, with an exact-integer
  * split search. Every step is one deterministic expression over exact
  * integers, so the ENTIRE train→residual→boost→validate pipeline replays
  * as DuckDB SQL — closing the r10 VERDICT's largest no-oracle gap: the
  * ML family's dataflow is now hash-checked cross-engine, with q63/q64
  * keeping the real (seeded-iterative, rows-only) MLlib training.
  *
  * Dataset: documents' (n_tokens → n_chars) relation — the one strongly
  * linear pair the fixtures ship (r ≈ 0.998; chars-per-token is the
  * corpus' mean word length). Both columns are EXACT integers, so the
  * stage-1 sufficient statistics need no snapping at all. The stump
  * splits on the same feature, exactly how a boosting stage consumes the
  * predecessor's residuals; its gain is small on a near-linear relation —
  * the q208 precedent: the operator READING weak curvature is the
  * operator working, and the oracle pins the exact split either way.
  *
  * Scale shape: stage-1 is one map-side-combinable aggregation; the
  * residual pass is a broadcast of 2 scalar coefficients; the split
  * search aggregates per distinct feature value FIRST (groupBy x — a
  * shuffle keyed on ~hundreds of values) and only then runs an ordered
  * cumulative window over those per-value rows (post-aggregation scale,
  * never row scale); validation is one more grouped aggregation. No
  * driver loops, no per-row windows, nothing grows with the corpus but
  * the two hash aggregations.
  */
object HybridTwin {

  val q213 = GQuery(
    "q213_hybrid_twin",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(graft.operators.TextQueries.tokens(col("text"))).as("x"),
          col("n_chars").as("y"))
      val train = docs.filter(col("doc_id") % 4 =!= 3)
      val valid = docs.filter(col("doc_id") % 4 === 3)

      // stage-1: exact integer sufficient statistics -> closed-form OLS.
      // x, y are already integers; DECIMAL(38,0) accumulation is exact
      // and partition-order-free (GroupedOls' rule).
      val st = train.agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x").cast("long") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x").cast("long") * col("x")).cast("decimal(38,0)")).as("sxx"))
      val nD = col("n").cast("double")
      val (sxD, syD) = (col("sx").cast("double"), col("sy").cast("double"))
      val varx = nD * col("sxx").cast("double") - sxD * sxD
      val cov = nD * col("sxy").cast("double") - sxD * syD
      val rawSlope = cov / varx
      // zero-x-variance guard (GroupedOls' rule): a degenerate corpus
      // (all docs the same token count) yields an empty coef frame and
      // an empty report instead of NaN propagation
      val coef = st.select(
        Metrics.canonRound(when(varx > 0, rawSlope), 6).as("slope"),
        Metrics.canonRound(when(varx > 0, (syD - rawSlope * sxD) / col("n")), 6)
          .as("intercept"))
        .filter(col("slope").isNotNull)

      // stage-2 residuals on the 1e-4 grid: computed from the ROUNDED
      // coefficients (both engines see the identical doubles), snapped
      // to integers so the split search is exact-integer arithmetic.
      val res = train.crossJoin(broadcast(coef))
        .select(col("x"),
          floor((col("y").cast("double") -
            (col("intercept") + col("slope") * col("x").cast("double"))) * 1e4 + 0.5)
            .cast("long").as("ri"))

      // split search: per-value aggregation first (corpus-scale work ends
      // here), then a cumulative window over the ~O(distinct x) rows.
      val pv = res.groupBy(col("x").as("v"))
        .agg(count(lit(1)).as("nv"), sum(col("ri").cast("decimal(38,0)")).as("sv"))
      val tot = res.agg(count(lit(1)).as("nt"), sum(col("ri").cast("decimal(38,0)")).as("st"))
      val wCum = org.apache.spark.sql.expressions.Window.orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cum = pv.select(col("v"), sum("nv").over(wCum).as("nl"),
        sum("sv").over(wCum).as("sl"))
      // score(v) = SL^2/nL + SR^2/nR (the SSE-reduction argmax, exact
      // integer inputs, one IEEE expression). Right side must be
      // non-empty; ties break on the smallest threshold.
      val cand = cum.crossJoin(broadcast(tot)).filter(col("nl") < col("nt"))
        .select(col("v"), col("nl"), (col("nt") - col("nl")).as("nr"),
          col("sl").cast("double").as("sld"),
          (col("st") - col("sl")).cast("double").as("srd"))
      val scored = cand.withColumn("score",
        col("sld") * col("sld") / col("nl").cast("double") +
          col("srd") * col("srd") / col("nr").cast("double"))
      val best = scored.orderBy(col("score").desc, col("v").asc).limit(1)
        .select(col("v").cast("int").as("split_at"),
          Metrics.canonRound(col("sld") / col("nl").cast("double") / 1e4, 6).as("left_mean"),
          Metrics.canonRound(col("srd") / col("nr").cast("double") / 1e4, 6).as("right_mean"))

      // validation: stage-1 vs boosted predictions, RMSE per lang with
      // the exact-accumulation discipline (snap e^2 at 1e-4, DECIMAL sum).
      val pred = valid.crossJoin(broadcast(coef)).crossJoin(broadcast(best))
        .withColumn("p1", col("intercept") + col("slope") * col("x").cast("double"))
        .withColumn("p2", col("p1") +
          when(col("x").cast("double") <= col("split_at"), col("left_mean"))
            .otherwise(col("right_mean")))
        .select(col("lang"), col("split_at"), col("left_mean"), col("right_mean"),
          col("slope"), col("intercept"),
          ((col("y").cast("double") - col("p1")) * (col("y").cast("double") - col("p1"))).as("e1"),
          ((col("y").cast("double") - col("p2")) * (col("y").cast("double") - col("p2"))).as("e2"))
      pred
        .groupBy("lang", "slope", "intercept", "split_at", "left_mean", "right_mean")
        .agg(count(lit(1)).as("n_valid"),
          Metrics.canonRound(sqrt(Metrics.exactMean(col("e1"))), 4).as("stage1_rmse"),
          Metrics.canonRound(sqrt(Metrics.exactMean(col("e2"))), 4).as("hybrid_rmse"))
        .select("lang", "n_valid", "slope", "intercept", "split_at",
          "left_mean", "right_mean", "stage1_rmse", "hybrid_rmse")
        .orderBy("lang")
    },
    Some("""WITH docs AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS x, n_chars AS y
        FROM documents),
      train AS (SELECT * FROM docs WHERE doc_id % 4 != 3),
      valid AS (SELECT * FROM docs WHERE doc_id % 4 = 3),
      st AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM train),
      d AS (
        SELECT n,
          CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
          CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
          CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM st),
      coef AS (
        SELECT floor(cov / varx * 1e6 + 0.5) / 1e6 AS slope,
               floor((syd - cov / varx * sxd) / n * 1e6 + 0.5) / 1e6 AS intercept
        FROM d WHERE varx > 0),
      res AS (
        SELECT t.x,
          CAST(floor((CAST(t.y AS DOUBLE) -
            (c.intercept + c.slope * CAST(t.x AS DOUBLE))) * 1e4 + 0.5) AS BIGINT) AS ri
        FROM train t, coef c),
      pv AS (SELECT x AS v, count(*) AS nv, sum(ri) AS sv FROM res GROUP BY x),
      tot AS (SELECT count(*) AS nt, sum(ri) AS st FROM res),
      cum AS (
        SELECT v, sum(nv) OVER (ORDER BY v) AS nl, sum(sv) OVER (ORDER BY v) AS sl
        FROM pv),
      cand AS (
        SELECT c.v, c.nl, t.nt - c.nl AS nr,
               CAST(c.sl AS DOUBLE) AS sld, CAST(t.st - c.sl AS DOUBLE) AS srd
        FROM cum c, tot t WHERE c.nl < t.nt),
      scored AS (
        SELECT v, nl, nr, sld, srd,
               sld * sld / CAST(nl AS DOUBLE) + srd * srd / CAST(nr AS DOUBLE) AS score
        FROM cand),
      best AS (
        SELECT CAST(v AS INTEGER) AS split_at,
               floor(sld / CAST(nl AS DOUBLE) / 1e4 * 1e6 + 0.5) / 1e6 AS left_mean,
               floor(srd / CAST(nr AS DOUBLE) / 1e4 * 1e6 + 0.5) / 1e6 AS right_mean
        FROM scored ORDER BY score DESC, v LIMIT 1),
      p1s AS (
        SELECT d.lang, CAST(d.y AS DOUBLE) AS y, CAST(d.x AS DOUBLE) AS x,
               c.intercept + c.slope * CAST(d.x AS DOUBLE) AS p1,
               b.split_at, b.left_mean, b.right_mean, c.slope, c.intercept
        FROM valid d, coef c, best b),
      p2s AS (
        SELECT lang, y, slope, intercept, split_at, left_mean, right_mean, p1,
               p1 + CASE WHEN x <= split_at THEN left_mean ELSE right_mean END AS p2
        FROM p1s),
      err AS (
        SELECT lang, slope, intercept, split_at, left_mean, right_mean,
               (y - p1) * (y - p1) AS e1, (y - p2) * (y - p2) AS e2
        FROM p2s)
      SELECT lang, count(*) AS n_valid, slope, intercept, split_at,
        left_mean, right_mean,
        floor(sqrt(CAST(sum(CAST(floor(e1 * 1e4 + 0.5) / 1e4 AS DECIMAL(18,4))) AS DOUBLE)
          / count(*)) * 1e4 + 0.5) / 1e4 AS stage1_rmse,
        floor(sqrt(CAST(sum(CAST(floor(e2 * 1e4 + 0.5) / 1e4 AS DECIMAL(18,4))) AS DOUBLE)
          / count(*)) * 1e4 + 0.5) / 1e4 AS hybrid_rmse
      FROM err
      GROUP BY lang, slope, intercept, split_at, left_mean, right_mean
      ORDER BY lang"""))

  def all: Seq[GQuery] = Seq(q213)
}
