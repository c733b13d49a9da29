package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetricsSpec extends SparkSpec {

  private def evalD(c: org.apache.spark.sql.Column, pairs: (Double, Double)*): Seq[Double] = {
    import spark.implicits._
    pairs.toDF("y", "yhat").select(c.cast("double")).collect().map(_.getDouble(0)).toSeq
  }

  test("smape 0/0 guard (kaggle.py:130): both zero -> 0") {
    assert(evalD(Metrics.smapeTerm(col("y"), col("yhat")), (0.0, 0.0)) == Seq(0.0))
  }

  test("smape known values") {
    // |100-110| / ((100+110)/200) = 10 / 1.05
    val Seq(v) = evalD(Metrics.smapeTerm(col("y"), col("yhat")), (100.0, 110.0))
    assert(math.abs(v - 10.0 / 1.05) < 1e-12)
    // total miss = 200
    assert(evalD(Metrics.smapeTerm(col("y"), col("yhat")), (0.0, 5.0)) == Seq(200.0))
  }

  test("smape term bounded in [0, 200] (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.between(-1e6, 1e6), rnd.between(-1e6, 1e6)))
    val vs = evalD(Metrics.smapeTerm(col("y"), col("yhat")), pairs: _*)
    assert(vs.forall(v => v >= 0.0 && v <= 200.0 + 1e-9))
  }

  test("geometricRound lands on floor or ceil; fixed point on integers (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(rnd.between(0.0, 1e6)) :+ 42.0
    val vs = evalD(Metrics.geometricRound(col("y")), xs.map((_, 0.0)): _*)
    xs.zip(vs).foreach { case (x, v) =>
      assert(v == math.floor(x) || v == math.ceil(x), s"x=$x v=$v")
    }
    assert(vs.last == 42.0)
  }

  test("geometricRound threshold is the geometric mean (kaggle.py:839-840)") {
    // between 2 and 3 the cut is sqrt(6) ~ 2.449
    assert(evalD(Metrics.geometricRound(col("y")), (2.44, 0.0)) == Seq(2.0))
    assert(evalD(Metrics.geometricRound(col("y")), (2.45, 0.0)) == Seq(3.0))
  }

  test("canonRound rounds the binary double value, engine-agnostically") {
    // the double literal 1.005 is really 1.00499999999999989…, so it rounds
    // DOWN — by design: both comparison engines see the same binary value
    assert(evalD(Metrics.canonRound(col("y"), 2),
      (1.005, 0.0), (1.0051, 0.0), (1.004, 0.0), (2.675, 0.0), (-1.005, 0.0)) ==
      Seq(1.0, 1.01, 1.0, 2.68, -1.0)) // 2.675*100 rounds up to 267.5 in double
  }

  test("array blending: mean / median / better_than_median") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 6.0), 0)).toDF("a", "x")
    val Row(m: Double, md: Double, btm: Double) = df.select(
      Metrics.arrayMean(col("a")), Metrics.arrayMedian(col("a")),
      Metrics.betterThanMedian(col("a"))).head()
    assert(m == 3.0 && md == 2.0)
    assert(btm == 2.0) // spread 5 >= 0.45 -> median
    val Row(btm2: Double) = Seq(Tuple1(Array(1.0, 1.1, 1.2))).toDF("a")
      .select(Metrics.betterThanMedian(col("a"))).head()
    assert(math.abs(btm2 - 1.1) < 1e-12) // spread 0.2 < 0.45 -> mean
    val Row(md4: Double) = Seq(Tuple1(Array(4.0, 1.0, 3.0, 2.0))).toDF("a")
      .select(Metrics.arrayMedian(col("a"))).head()
    assert(md4 == 2.5) // even length -> interpolated
  }

  test("exactSum is partition-order independent") {
    import spark.implicits._
    val xs = (1 to 10000).map(i => 0.1 + i * 1e-4)
    val a = xs.toDF("v").repartition(13).agg(Metrics.exactSum(col("v"))).head().getDouble(0)
    val b = xs.reverse.toDF("v").repartition(3).agg(Metrics.exactSum(col("v"))).head().getDouble(0)
    assert(a == b)
  }
}
