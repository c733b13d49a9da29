package graft.functions

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Registry queries exercising the calendar / seasonal feature library
  * (SURVEY.md §2.7). Easter and holiday oracles are literal golden VALUES —
  * DuckDB cannot compute Easter, so the oracle pins the expected output
  * (cross-checked against published calendars in DateFeaturesSpec).
  */
object FeatureQueries {

  /** Fourier seasonal features over a generated date axis (M1 + D10). */
  val q70 = GQuery(
    "q70_fourier_axis",
    (s, dir) => {
      val base = DateFeatures.dateAxis(s, "2018-01-01", "2018-12-31")
      val feats = DateFeatures.fourierFeatures(col("d"), order = 2)
        .map { case (n, c) => graft.functions.Metrics.canonRound(c, 6).as(n) }
      base.select((col("d").cast("timestamp_ntz").as("d") +: feats): _*).orderBy("d")
    },
    Some("""SELECT CAST(d AS TIMESTAMP) AS d,
      floor((sin(2*pi()*1*dayofyear(d)/365.25)) * 1e6 + 0.5)/1e6 AS sin_1,
      floor((cos(2*pi()*1*dayofyear(d)/365.25)) * 1e6 + 0.5)/1e6 AS cos_1,
      floor((sin(2*pi()*2*dayofyear(d)/365.25)) * 1e6 + 0.5)/1e6 AS sin_2,
      floor((cos(2*pi()*2*dayofyear(d)/365.25)) * 1e6 + 0.5)/1e6 AS cos_2
      FROM (SELECT unnest(generate_series(DATE '2018-01-01', DATE '2018-12-31', INTERVAL 1 DAY)) AS d)
      ORDER BY d"""))

  /** Season bucketing (J3/kaggle.py:203) applied to order dates. */
  val q71 = GQuery(
    "q71_season",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(DateFeatures.season(col("o_orderdate")).as("season"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Metrics.canonRound(graft.functions.Metrics.exactSum(col("o_totalprice")), 2).as("total"))
        .orderBy("season"),
    Some("""SELECT CASE ((month(o_orderdate) % 12 + 3) // 3)
        WHEN 1 THEN 'DJF' WHEN 2 THEN 'MAM' WHEN 3 THEN 'JJA' ELSE 'SON' END AS season,
      count(*) AS n,
      floor((CAST(sum(CAST(floor((o_totalprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS total
      FROM orders GROUP BY 1 ORDER BY season"""))

  /** Easter dates 2015-2025 from the Anonymous Gregorian algorithm (D8),
    * oracle = published Easter calendar as literals.
    */
  val q72 = GQuery(
    "q72_easter",
    (s, dir) => DateFeatures.easterDim(s, 2015 to 2025)
      .select(col("year"), col("easter").cast("timestamp_ntz").as("easter"))
      .orderBy("year"),
    Some("""SELECT year, CAST(easter AS TIMESTAMP) AS easter FROM (VALUES
      (2015, DATE '2015-04-05'), (2016, DATE '2016-03-27'), (2017, DATE '2017-04-16'),
      (2018, DATE '2018-04-01'), (2019, DATE '2019-04-21'), (2020, DATE '2020-04-12'),
      (2021, DATE '2021-04-04'), (2022, DATE '2022-04-17'), (2023, DATE '2023-04-09'),
      (2024, DATE '2024-03-31'), (2025, DATE '2025-04-20')) AS t(year, easter)
      ORDER BY year"""))

  /** Holiday dim-table generator (D9/J5): per-country/year holiday counts.
    * Oracle pins the generator's contract: FI 15, NO 12, SE 15 per year.
    */
  val q73 = GQuery(
    "q73_holiday_counts",
    (s, dir) =>
      DateFeatures.holidayDim(s, 2015 to 2019)
        .groupBy(year(col("date")).as("y"), col("country"))
        .agg(count(lit(1)).as("n_holidays"))
        .orderBy("y", "country"),
    Some("""SELECT CAST(y AS INT) AS y, country, CAST(n_holidays AS BIGINT) AS n_holidays
      FROM (VALUES
      (2015,'Finland',15),(2015,'Norway',12),(2015,'Sweden',15),
      (2016,'Finland',15),(2016,'Norway',12),(2016,'Sweden',15),
      (2017,'Finland',15),(2017,'Norway',12),(2017,'Sweden',15),
      (2018,'Finland',15),(2018,'Norway',12),(2018,'Sweden',15),
      (2019,'Finland',15),(2019,'Norway',12),(2019,'Sweden',15)) AS t(y, country, n_holidays)
      ORDER BY y, country"""))

  /** Easter-window anchor join (J6 composed with D8): lineitems shipped
    * within ±3 days of Easter Sunday, per year. Broadcast join against the
    * 7-row Easter dim — the Spark-shaped version of the reference's
    * per-row easter() UDF (kaggle/kaggle.py:326).
    */
  val q74 = GQuery(
    "q74_easter_window",
    (s, dir) => {
      val easter = DateFeatures.easterDim(s, 1995 to 2001)
      Tables.lineitem(s, dir)
        .join(broadcast(easter), year(col("l_shipdate")) === col("year") &&
          datediff(to_date(col("l_shipdate")), col("easter")).between(-3, 3))
        .groupBy("year")
        .agg(count(lit(1)).as("n_lines"), graft.functions.Metrics.canonRound(sum("l_quantity"), 2).as("qty"))
        .orderBy("year")
    },
    Some("""SELECT t.year, count(*) AS n_lines, floor((sum(l_quantity)) * 1e2 + 0.5)/1e2 AS qty
      FROM lineitem
      JOIN (VALUES
        (1995, DATE '1995-04-16'), (1996, DATE '1996-04-07'), (1997, DATE '1997-03-30'),
        (1998, DATE '1998-04-12'), (1999, DATE '1999-04-04'), (2000, DATE '2000-04-23'),
        (2001, DATE '2001-04-15')) AS t(year, easter)
      ON year(l_shipdate) = t.year
        AND date_diff('day', easter, CAST(l_shipdate AS DATE)) BETWEEN -3 AND 3
      GROUP BY t.year ORDER BY t.year"""))

  /** Weekday-window indicator features (P5/J2-style): pandas-convention
    * weekday plus boolean holiday-window flags as a single wide projection
    * (U2: column append as one select, not chained withColumn).
    */
  val q75 = GQuery(
    "q75_weekday_indicators",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          DateFeatures.weekdayMon0(col("o_orderdate")).as("wd"),
          (DateFeatures.weekdayMon0(col("o_orderdate")) === 4).as("wd4"),
          (DateFeatures.weekdayMon0(col("o_orderdate")) >= 5).as("wd56"),
          (month(col("o_orderdate")) === 12 && dayofmonth(col("o_orderdate")).between(24, 31))
            .as("dec24_31"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
      (isodow(o_orderdate) - 1 = 4) AS wd4,
      (isodow(o_orderdate) - 1 >= 5) AS wd56,
      (month(o_orderdate) = 12 AND day(o_orderdate) BETWEEN 24 AND 31) AS dec24_31
      FROM orders ORDER BY o_orderkey"""))

  /** Distributed periodogram (SURVEY W5 — the reference computes this
    * driver-side with scipy.signal.periodogram as a plot diagnostic; here
    * it is a genuine distributed query): brute-force DFT power spectrum of
    * the mean-centered daily order-count series over harmonics k=1..60.
    * O(N·K) as a crossJoin of the tiny per-day aggregate (366 rows) with
    * the harmonic axis — at 100 TB the per-day aggregate is still tiny
    * (the scan is the cost, and it is one map-side-combined groupBy).
    *
    * Both spectral sums go through Metrics.exactSum (invariant: sums of
    * non-integral doubles must be accumulation-order-independent or the
    * oracle hash breaks).
    */
  val q93 = GQuery(
    "q93_periodogram",
    (s, dir) => {
      val twoPi = 6.283185307179586
      val nDays = 366.0 // 1996 is a leap year
      val daily = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1996)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).cast("double").as("n"))
        .withColumn("t", (dayofyear(col("d")) - 1).cast("double"))
      val m = daily.agg(avg("n").as("mean")) // avg of integers: order-exact
      val ks = s.range(1, 61).select(col("id").cast("int").as("k"))
      val ang = lit(twoPi) * col("k") * col("t") / lit(nDays)
      daily.crossJoin(broadcast(m)).crossJoin(broadcast(ks))
        .withColumn("x", col("n") - col("mean"))
        .groupBy("k")
        .agg(
          graft.functions.Metrics.exactSum(col("x") * cos(ang)).as("c"),
          graft.functions.Metrics.exactSum(col("x") * sin(ang)).as("s"))
        .select(col("k"),
          graft.functions.Metrics.canonRound(col("c") * col("c") + col("s") * col("s"), 2)
            .as("power"))
        .orderBy("k")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS DOUBLE) AS n
        FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
      m AS (SELECT avg(n) AS mean FROM daily),
      cen AS (
        SELECT CAST(dayofyear(d) - 1 AS DOUBLE) AS t, n - mean AS x
        FROM daily, m),
      ks AS (SELECT unnest(generate_series(1, 60)) AS k),
      sums AS (
        SELECT k,
          CAST(sum(CAST(floor((x * cos(6.283185307179586 * k * t / 366.0)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE) AS c,
          CAST(sum(CAST(floor((x * sin(6.283185307179586 * k * t / 366.0)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE) AS s
        FROM cen, ks GROUP BY k)
      SELECT CAST(k AS INTEGER) AS k,
        floor((c * c + s * s) * 1e2 + 0.5)/1e2 AS power
      FROM sums ORDER BY k"""))

  /** Time-series gap filling: dense date axis, left join the sparse daily
    * aggregate, last-observation-carried-forward via last(_, ignoreNulls)
    * over an unbounded-preceding frame, with an is_imputed flag — the
    * standard imputation operator a feature pipeline runs before modeling.
    * Leading days before the first observation stay NULL (both engines).
    * The global orderBy window is per-SERIES in a real deployment
    * (partitionBy series key); the axis here is one year of days.
    */
  val q97 = GQuery(
    "q97_gap_fill",
    (s, dir) => {
      val axis = DateFeatures.dateAxis(s, "1996-01-01", "1996-12-31")
      val daily = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1996)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(graft.functions.Metrics.canonRound(
          graft.functions.Metrics.exactMean(col("o_totalprice")), 4).as("avg_spend"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      axis.join(daily, Seq("d"), "left")
        .select(col("d").cast("timestamp_ntz").as("d"),
          last(col("avg_spend"), ignoreNulls = true).over(w).as("avg_spend_filled"),
          col("avg_spend").isNull.as("is_imputed"))
        .orderBy("d")
    },
    Some("""WITH axis AS (
        SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-12-31', INTERVAL 1 DAY)) AS DATE) AS d),
      daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
          floor((CAST(sum(CAST(floor((o_totalprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)/count(*)) * 1e4 + 0.5)/1e4 AS avg_spend
        FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1)
      SELECT CAST(a.d AS TIMESTAMP) AS d,
        last_value(daily.avg_spend IGNORE NULLS)
          OVER (ORDER BY a.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_spend_filled,
        daily.avg_spend IS NULL AS is_imputed
      FROM axis a LEFT JOIN daily ON a.d = daily.d
      ORDER BY d"""))

  /** Moving-average crossover signals: 7-day vs 28-day trailing means of
    * the daily order count over a DENSE date axis (missing days count 0,
    * so ROWS frames equal day windows — the q97 gap-fill trick applied to
    * frame semantics), plus the crossover flag. Inputs are integer counts,
    * so the window means are bit-identical across engines without the
    * decimal-snap machinery. One small sort (366 rows) — per-series
    * windows partition by the series key at scale.
    */
  val q101 = GQuery(
    "q101_ma_crossover",
    (s, dir) => {
      val axis = DateFeatures.dateAxis(s, "1996-01-01", "1996-12-31")
      val daily = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1996)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n"))
      val win = org.apache.spark.sql.expressions.Window
      def ma(days: Int) = graft.functions.Metrics.canonRound(
        avg("n").over(win.orderBy("d").rowsBetween(-(days - 1), 0)), 4)
      axis.join(daily, Seq("d"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .select(col("d").cast("timestamp_ntz").as("d"), col("n"),
          ma(7).as("ma7"), ma(28).as("ma28"))
        .withColumn("bullish", col("ma7") > col("ma28"))
        .orderBy("d")
    },
    Some("""WITH axis AS (
        SELECT CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-12-31', INTERVAL 1 DAY)) AS DATE) AS d),
      daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
        FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
      dense AS (
        SELECT a.d, coalesce(daily.n, 0) AS n
        FROM axis a LEFT JOIN daily ON a.d = daily.d),
      ma AS (
        SELECT d, n,
          floor((avg(n) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) * 1e4 + 0.5)/1e4 AS ma7,
          floor((avg(n) OVER (ORDER BY d ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)) * 1e4 + 0.5)/1e4 AS ma28
        FROM dense)
      SELECT CAST(d AS TIMESTAMP) AS d, CAST(n AS BIGINT) AS n, ma7, ma28,
        ma7 > ma28 AS bullish
      FROM ma ORDER BY d"""))

  def all: Seq[GQuery] = Seq(q70, q71, q72, q73, q74, q75, q93, q97, q101)
}
