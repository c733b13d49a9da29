package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PowerIterationSpec extends SparkSpec {

  test("recovers a planted dominant direction") {
    import spark.implicits._
    // 200 vectors along ±e_3 with amplitude 10 plus small deterministic
    // off-axis noise: the top singular direction is e_3 up to sign
    val dim = 8
    val data = (0 until 200).map { i =>
      val v = Array.tabulate(dim) { j =>
        val noise = (((i * 31 + j * 17) % 11) - 5) * 0.01f
        if (j == 3) (if (i % 2 == 0) 10.0f else -10.0f) + noise else noise
      }
      (i.toLong, v.toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val got = PowerIteration.topDirection(df, rounds = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(3)) > 0.99, s"dominant loading ${got(3)}")
    (0 until dim).filterNot(_ == 3)
      .foreach(j => assert(math.abs(got(j)) < 0.1, s"dim $j: ${got(j)}"))
  }

  test("q206 output is an L2-unit vector over all 64 dims") {
    val out = graft.SparkEntry.queries("q206_power_iteration")(spark, sf001)
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(out.length == 64)
    assert(out.map(_._1).toSeq == (0 until 64))
    val norm = math.sqrt(out.map { case (_, l) => l * l }.sum)
    // loadings are snapped to 1e-6, so the norm is 1 up to grid error
    assert(math.abs(norm - 1.0) < 1e-4, s"norm $norm")
  }

  test("the direction is stable: one more round barely moves it") {
    // stability pin, not exact convergence: the fixture's spectral gap
    // is modest (cos(round4, round5) ≈ 0.993 measured), so assert no
    // oscillation / sign-flip (cos stays close to 1, and POSITIVE —
    // XᵀX is PSD, so the iterate must not alternate)
    val e = graft.Tables.embeddings(spark, sf001)
    val a = PowerIteration.topDirection(e, rounds = 4)
      .collect().map(r => r.getDouble(1))
    val b = PowerIteration.topDirection(e, rounds = 5)
      .collect().map(r => r.getDouble(1))
    val cos = a.zip(b).map { case (x, y) => x * y }.sum
    assert(cos > 0.98, s"cos $cos")
  }
}
