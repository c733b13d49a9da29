package graft.functions

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DateFeaturesSpec extends SparkSpec {

  test("easter matches the published calendar 2015-2025 (SURVEY.md §7.4 item 2)") {
    val expected = Map(
      2015 -> "2015-04-05", 2016 -> "2016-03-27", 2017 -> "2017-04-16",
      2018 -> "2018-04-01", 2019 -> "2019-04-21", 2020 -> "2020-04-12",
      2021 -> "2021-04-04", 2022 -> "2022-04-17", 2023 -> "2023-04-09",
      2024 -> "2024-03-31", 2025 -> "2025-04-20")
    expected.foreach { case (y, d) =>
      assert(DateFeatures.easterDate(y) == LocalDate.parse(d), s"year $y")
    }
  }

  test("weekdayMon0 is the pandas convention (0=Mon .. 6=Sun)") {
    import spark.implicits._
    // 2024-01-01 was a Monday
    val df = (0 to 6).map(i => java.sql.Date.valueOf(LocalDate.of(2024, 1, 1).plusDays(i)))
      .toDF("d")
    val got = df.select(DateFeatures.weekdayMon0(col("d"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 2, 3, 4, 5, 6))
  }

  test("season mapping matches (m % 12 + 3) // 3 (kaggle.py:203)") {
    import spark.implicits._
    val df = (1 to 12).map(m => java.sql.Date.valueOf(LocalDate.of(2020, m, 15))).toDF("d")
    val got = df.select(DateFeatures.season(col("d"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("DJF", "DJF", "MAM", "MAM", "MAM", "JJA",
      "JJA", "JJA", "SON", "SON", "SON", "DJF"))
  }

  test("fourier features bounded in [-1, 1]") {
    val df = DateFeatures.dateAxis(spark, "2020-01-01", "2020-12-31")
    val feats = DateFeatures.fourierFeatures(col("d"), order = 3)
    val bad = df.select(feats.map { case (n, c) => c.as(n) }: _*)
      .filter(feats.map { case (n, _) => abs(col(n)) > 1.0 }.reduce(_ || _))
      .count()
    assert(bad == 0)
  }

  test("holiday dim spot checks against public calendars") {
    val rows2018 = DateFeatures.holidayRows(2018).map { case (d, c, n) => (d.toString, c, n) }
    // Norway Constitution Day
    assert(rows2018.contains(("2018-05-17", "Norway", "Constitution Day")))
    // Midsummer Day 2018 = Sat Jun 23 (FI/SE)
    assert(rows2018.contains(("2018-06-23", "Finland", "Midsummer Day")))
    assert(rows2018.contains(("2018-06-23", "Sweden", "Midsummer Day")))
    // Good Friday 2018 = Mar 30 (Easter Apr 1)
    assert(rows2018.contains(("2018-03-30", "Norway", "Good Friday")))
    // All Saints 2015 = Sat Oct 31 (first Saturday in Oct31..Nov6)
    val rows2015 = DateFeatures.holidayRows(2015).map { case (d, c, n) => (d.toString, c, n) }
    assert(rows2015.contains(("2015-10-31", "Finland", "All Saints' Day")))
    // counts per country stable: FI 15, NO 12, SE 15
    val byCountry = rows2018.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byCountry == Map("Finland" -> 15, "Norway" -> 12, "Sweden" -> 15))
  }

  test("dateAxis inclusive bounds") {
    assert(DateFeatures.dateAxis(spark, "2024-02-01", "2024-03-01").count() == 30)
  }

  test("observed=True semantics: weekend-falling holidays stay put, no substitute days (2015-2019)") {
    // The reference constructs python-holidays calendars with
    // observed=True (kaggle/kaggle.py:332,800-802). python-holidays
    // defines NO observed-substitute rules for Finland/Norway/Sweden —
    // the flag is a no-op there — so the semantics to pin are: a holiday
    // falling on a weekend keeps its calendar date, and no shifted
    // "(observed)" twin appears on the following Monday.
    val all = (2015 to 2019).flatMap(DateFeatures.holidayRows)
      .map { case (d, c, n) => (d, c, n) }
    def on(date: String, cc: String) =
      all.filter(r => r._1.toString == date && r._2 == cc).map(_._3)
    // 2017-01-01 New Year = SUNDAY: on Jan 1 for all three, Jan 2 empty
    for (cc <- Seq("Finland", "Norway", "Sweden")) {
      assert(on("2017-01-01", cc) == Seq("New Year's Day"), cc)
      assert(on("2017-01-02", cc).isEmpty, cc)
    }
    // 2015-05-17 Norway Constitution Day = SUNDAY: stays, May 18 empty
    assert(on("2015-05-17", "Norway") == Seq("Constitution Day"))
    assert(on("2015-05-18", "Norway").isEmpty)
    // 2015-12-06 Finland Independence Day = SUNDAY: stays, Dec 7 empty
    assert(on("2015-12-06", "Finland") == Seq("Independence Day"))
    assert(on("2015-12-07", "Finland").isEmpty)
    // 2016-12-25 Christmas = SUNDAY: Dec 26 (Monday) is its own holiday,
    // the Second Day of Christmas — NOT an observed substitute
    assert(on("2016-12-25", "Finland") == Seq("Christmas Day"))
    assert(on("2016-12-26", "Finland") == Seq("Second Day of Christmas"))
    // 2016-06-06 Sweden National Day = MONDAY (and 2015-06-06 = Saturday):
    // both stay on Jun 6
    assert(on("2015-06-06", "Sweden") == Seq("National Day"))
    assert(on("2016-06-06", "Sweden") == Seq("National Day"))
    // structural no-substitute check: every year has the SAME per-country
    // row count — observed shifting would inflate weekend-heavy years
    val counts = (2015 to 2019).map(y =>
      DateFeatures.holidayRows(y).groupBy(_._2).view.mapValues(_.size).toMap)
    assert(counts.distinct.size == 1,
      s"per-country counts vary across years: $counts")
    // at most one row per (date, country): no shifted twins anywhere
    val dup = all.groupBy(r => (r._1, r._2)).filter(_._2.size > 1)
    assert(dup.isEmpty, s"duplicate holiday rows: ${dup.keys.take(3)}")
  }
}
