package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ExactSelectSpec extends SparkSpec {

  test("narrowing selection returns the exact order statistic (vs sort)") {
    import spark.implicits._
    // odd count, even count, duplicates, negative values, one constant
    // group (lo == hi short-circuit)
    val rows =
      (1 to 101).map(i => ("odd", i * 0.5 - 20)) ++
      (1 to 100).map(i => ("even", -i * 1.25)) ++
      Seq.fill(50)(("dup", 7.0)) ++ Seq.fill(49)(("dup", 3.0)) ++
      Seq.fill(10)(("const", 42.0))
    val df = rows.toDF("g", "v")
    val got = ExactSelect.kthPerGroup(df, "g", "v", n => (n + 1) / 2,
      buckets = 8, leafLimit = 4) // tiny B forces several real rounds
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val k = (sorted.length + 1) / 2
      assert(got(g) == ((sorted.length.toLong, k.toLong, sorted(k - 1))),
        s"$g: ${got(g)} vs k=$k of ${sorted.length}")
    }
  }

  test("selection agrees with sort-based percentile on the events fixture") {
    val e = Tables.events(spark, sf001)
    val got = ExactSelect.kthPerGroup(e, "event_type", "value", n => (n + 1) / 2)
    val expected = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (g, n) =>
      val k = (n + 1) / 2
      val viaSort = e.filter(col("event_type") === g)
        .orderBy("value").select("value")
        .limit(k.toInt).collect().last.getDouble(0)
      assert(got(g) == ((n, k, viaSort)), s"$g: ${got(g)} vs $viaSort")
    }
  }

  test("extreme k values: k=1 and k=n hit the min and max") {
    import spark.implicits._
    val df = (1 to 500).map(i => ("a", i.toDouble)).toDF("g", "v")
    val lo = ExactSelect.kthPerGroup(df, "g", "v", _ => 1L, buckets = 8, leafLimit = 4)
    val hi = ExactSelect.kthPerGroup(df, "g", "v", n => n, buckets = 8, leafLimit = 4)
    assert(lo("a")._3 == 1.0 && hi("a")._3 == 500.0, s"$lo $hi")
  }
}
