package graft.functions

import java.time.{DayOfWeek, LocalDate}
import java.time.temporal.TemporalAdjusters

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar / seasonal feature library mirroring the reference's feature
  * engineering surface (kaggle/kaggle.py:193-331) in declarative Spark.
  *
  * Convention trap (SURVEY.md §7.4 item 3): pandas `dt.weekday` is 0=Monday;
  * Spark `dayofweek` is 1=Sunday. [[weekdayMon0]] provides the pandas
  * convention explicitly.
  */
object DateFeatures {

  /** 0=Monday..6=Sunday, the pandas `dt.weekday` convention
    * (kaggle/kaggle.py:206-209).
    */
  def weekdayMon0(d: Column): Column = (dayofweek(d) + 5) % 7

  /** Meteorological season label from month, reference mapping
    * `(m % 12 + 3) // 3 → {1:DJF,2:MAM,3:JJA,4:SON}` (kaggle/kaggle.py:203).
    */
  def season(d: Column): Column = {
    // Column `/` is double division; pandas `//` is integer — cast restores it
    val bucket = ((month(d) % 12 + 3) / 3).cast("int")
    when(bucket === 1, "DJF")
      .when(bucket === 2, "MAM")
      .when(bucket === 3, "JJA")
      .otherwise("SON")
  }

  /** Fourier harmonic pair k over an arbitrary phase column. */
  def fourierPairOf(phase: Column, k: Int, period: Double): (Column, Column) = {
    val theta = lit(2.0 * math.Pi * k) * phase / lit(period)
    (sin(theta), cos(theta))
  }

  /** Fourier harmonic pair k over a day-of-year cycle of `period` days
    * (kaggle/kaggle.py:183-192, 214-234). Returns (sin_k, cos_k).
    */
  def fourierPair(d: Column, k: Int, period: Double = 365.25): (Column, Column) =
    fourierPairOf(dayofyear(d), k, period)

  /** Weekly harmonics phased on the actual weekday — day-of-year mod 7
    * resets phase every Jan 1 and decorrelates from the true weekly cycle
    * across years.
    */
  def weeklyFourierPair(d: Column, k: Int): (Column, Column) =
    fourierPairOf(weekdayMon0(d), k, 7.0)

  /** All harmonics 1..order as named columns sin_k/cos_k. */
  def fourierFeatures(d: Column, order: Int, period: Double = 365.25): Seq[(String, Column)] =
    (1 to order).flatMap { k =>
      val (s, c) = fourierPair(d, k, period)
      Seq(s"sin_$k" -> s, s"cos_$k" -> c)
    }

  /** Easter Sunday per the Anonymous Gregorian algorithm — replaces
    * `dateutil.easter.easter` (kaggle/kaggle.py:326) which is unavailable
    * on the JVM. Golden-tested for 2015-2019 in DateFeaturesSpec.
    */
  def easterDate(year: Int): LocalDate = {
    val a = year % 19; val b = year / 100; val c = year % 100
    val d = b / 4; val e = b % 4; val f = (b + 8) / 25; val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4; val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val mo = (h + l - 7 * m + 114) / 31
    val day = ((h + l - 7 * m + 114) % 31) + 1
    LocalDate.of(year, mo, day)
  }

  /** year → Easter date dim as a DataFrame, for broadcast joins (the
    * Spark-shaped replacement for the per-row UDF at kaggle/kaggle.py:326).
    */
  def easterDim(spark: SparkSession, years: Seq[Int]): DataFrame = {
    import spark.implicits._
    years.map(y => (y, java.sql.Date.valueOf(easterDate(y)))).toDF("year", "easter")
  }

  /** Holiday dim table (date, country, name) for Finland / Norway / Sweden,
    * replacing the Python `holidays` package (kaggle/kaggle.py:17, 237-243).
    * Fixed-date national days plus Easter-relative movable feasts plus the
    * Saturday-window holidays (Midsummer, All Saints).
    *
    * `observed=True` semantics (kaggle/kaggle.py:332,800-802): python-
    * holidays defines NO observed-substitute rules for FI/NO/SE — the flag
    * is a no-op for these calendars — so a weekend-falling holiday keeps
    * its calendar date and no shifted twin is added; DateFeaturesSpec pins
    * this on 2015-2019 weekend cases. (python-holidays' Sweden class also
    * lists every SUNDAY as a holiday by default — a library quirk, not a
    * store-closure signal, and the reference's Sweden branch is commented
    * out at kaggle.py:243 — deliberately not modeled here.)
    */
  def holidayRows(year: Int): Seq[(LocalDate, String, String)] = {
    val easter = easterDate(year)
    def satBetween(fromMonth: Int, fromDay: Int): LocalDate =
      LocalDate.of(year, fromMonth, fromDay).`with`(TemporalAdjusters.nextOrSame(DayOfWeek.SATURDAY))
    val midsummerDay = satBetween(6, 20)      // Saturday in Jun 20-26 (FI/SE)
    val allSaints    = satBetween(10, 31)     // Saturday in Oct 31 - Nov 6 (FI/SE)

    def common(cc: String) = Seq(
      (LocalDate.of(year, 1, 1), cc, "New Year's Day"),
      (easter.minusDays(2), cc, "Good Friday"),
      (easter, cc, "Easter Sunday"),
      (easter.plusDays(1), cc, "Easter Monday"),
      (easter.plusDays(39), cc, "Ascension Day"),
      (easter.plusDays(49), cc, "Whit Sunday"),
      (LocalDate.of(year, 5, 1), cc, "May Day"),
      (LocalDate.of(year, 12, 25), cc, "Christmas Day"),
      (LocalDate.of(year, 12, 26), cc, "Second Day of Christmas")
    )
    val fi = common("Finland") ++ Seq(
      (LocalDate.of(year, 1, 6), "Finland", "Epiphany"),
      (midsummerDay.minusDays(1), "Finland", "Midsummer Eve"),
      (midsummerDay, "Finland", "Midsummer Day"),
      (allSaints, "Finland", "All Saints' Day"),
      (LocalDate.of(year, 12, 6), "Finland", "Independence Day"),
      (LocalDate.of(year, 12, 24), "Finland", "Christmas Eve")
    )
    val no = common("Norway") ++ Seq(
      (easter.minusDays(3), "Norway", "Maundy Thursday"),
      (easter.plusDays(50), "Norway", "Whit Monday"),
      (LocalDate.of(year, 5, 17), "Norway", "Constitution Day")
    )
    val se = common("Sweden") ++ Seq(
      (LocalDate.of(year, 1, 6), "Sweden", "Epiphany"),
      (LocalDate.of(year, 6, 6), "Sweden", "National Day"),
      (midsummerDay.minusDays(1), "Sweden", "Midsummer Eve"),
      (midsummerDay, "Sweden", "Midsummer Day"),
      (allSaints, "Sweden", "All Saints' Day"),
      (LocalDate.of(year, 12, 24), "Sweden", "Christmas Eve")
    )
    fi ++ no ++ se
  }

  def holidayDim(spark: SparkSession, years: Seq[Int]): DataFrame = {
    import spark.implicits._
    years.flatMap(holidayRows)
      .map { case (d, c, n) => (java.sql.Date.valueOf(d), c, n) }
      .toDF("date", "country", "holiday_name")
  }

  /** Synthetic daily date axis lo..hi inclusive — `pd.date_range`
    * (kaggle/kaggle.py:432-433) as sequence + explode.
    */
  def dateAxis(spark: SparkSession, lo: String, hi: String): DataFrame =
    spark.range(1).select(
      explode(sequence(to_date(lit(lo)), to_date(lit(hi)), expr("interval 1 day"))).as("d"))
}
