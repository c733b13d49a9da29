package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.QuantileSketchQueries

/** plans.QuantileSketchAgg — the mergeable bottom-k quantile sketch.
  * Pins the properties the q225/q226 oracles rely on: merge ≡ one-shot
  * (associativity), bounded size, deterministic content, order-statistic
  * extraction, and SQL null/edge behavior.
  */
class QuantileSketchSpec extends SparkSpec {

  private def sketchRows(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Double)]] =
    df.collect().map { r =>
      r.getString(0) -> r.getSeq[Row](1).map(p => (p.getLong(0), p.getDouble(1)))
    }.toMap

  test("merged month sketches equal the one-shot quarter sketch (associativity)") {
    val b = QuantileSketchQueries.base(spark, sf001)
    val merged = sketchRows(
      QuantileSketchQueries.quarterSketches(QuantileSketchQueries.monthSketches(b))
        .select(col("qkey").cast("string"), col("sk")))
    val oneShot = sketchRows(
      b.groupBy(col("qkey").cast("string").as("qkey"))
        .agg(call_function("graft_qsketch", col("h"), col("v"),
          lit(QuantileSketchQueries.K)).as("sk"))
        .select(col("qkey"), col("sk")))
    assert(merged.keySet === oneShot.keySet)
    merged.keys.foreach(k => assert(merged(k) === oneShot(k), s"quarter $k"))
    assert(merged.nonEmpty)
  }

  test("sketch is bounded by k, sorted ascending by (h, v), and distinct") {
    val sks = sketchRows(
      QuantileSketchQueries.quarterSketches(
        QuantileSketchQueries.monthSketches(QuantileSketchQueries.base(spark, sf001)))
        .select(col("qkey").cast("string"), col("sk")))
    sks.values.foreach { pairs =>
      assert(pairs.length <= QuantileSketchQueries.K)
      assert(pairs == pairs.sorted)
      assert(pairs.distinct.length == pairs.length)
    }
  }

  test("order-statistic extraction matches a driver-side computation") {
    import spark.implicits._
    val rows = Tables.orders(spark, sf001)
      .select(md5(col("o_orderkey").cast("string")).as("hs"), col("o_totalprice"))
      .select(conv(substring(col("hs"), 1, 15), 16, 10).cast("long").as("h"),
        col("o_totalprice").as("v"))
    val k = 16
    val sk = rows.agg(call_function("graft_qsketch", col("h"), col("v"), lit(k)).as("sk"))
      .select(expr("transform(sk, x -> x.v)").as("vs")).head().getSeq[Double](0)
    // driver reference: bottom-k by (h, v), then p-th smallest value
    val ref = rows.as[(Long, Double)].collect().sorted.take(k).map(_._2).sorted
    assert(sk.sorted === ref.toSeq)
    Seq(0.5, 0.9).foreach { p =>
      val est = rows.agg(call_function("graft_qsketch", col("h"), col("v"), lit(k)).as("sk"))
        .select(element_at(array_sort(expr("transform(sk, x -> x.v)")),
          greatest(ceil(lit(p) * size(col("sk"))).cast("int"), lit(1))))
        .head().getDouble(0)
      assert(est == ref(math.max(math.ceil(p * ref.length).toInt, 1) - 1))
    }
  }

  test("SQL surface: null rows skipped, empty group yields empty array, k validated") {
    import spark.implicits._
    Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0)))
      .toDF("h", "v").createOrReplaceTempView("qsk_in")
    val out = spark.sql(
      "SELECT graft_qsketch(h, v, 8) AS sk FROM qsk_in").head().getSeq[Row](0)
    assert(out.map(r => (r.getLong(0), r.getDouble(1))) === Seq((1L, 2.0), (3L, 1.0)))
    val empty = spark.sql(
      "SELECT graft_qsketch(h, v, 8) AS sk FROM qsk_in WHERE h < 0").head().getSeq[Row](0)
    assert(empty.isEmpty)
    // merge agg over SQL: round-trips the struct array
    val merged = spark.sql(
      """SELECT graft_qsketch_merge(sk, 8) AS sk FROM
         (SELECT graft_qsketch(h, v, 8) AS sk FROM qsk_in GROUP BY h % 2)""")
      .head().getSeq[Row](0)
    assert(merged.map(r => (r.getLong(0), r.getDouble(1))) === Seq((1L, 2.0), (3L, 1.0)))
    // non-foldable k is an analysis error, not a runtime surprise
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_qsketch(h, v, CAST(h AS INT)) FROM qsk_in").collect()
    }
    assert(err.getMessage.contains("foldable"))
  }
}
