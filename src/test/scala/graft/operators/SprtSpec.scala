package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class SprtSpec extends SparkSpec {

  private def stream(succ: Seq[Boolean]): Seq[(String, Timestamp, Long, Double)] =
    succ.zipWithIndex.map { case (s, i) =>
      ("t", new Timestamp(1700000000000L + i * 1000L), i.toLong,
        if (s) 60.0 else 40.0)
    }

  test("all-success stream accepts H1 at exactly n=11") {
    import spark.implicits._
    // 11·287682 = 3164502 ≥ 2944439; 10·287682 = 2876820 is still inside
    val df = stream(Seq.fill(30)(true))
      .toDF("event_type", "ts", "event_id", "value")
    val r = Sprt.decisions(df).collect().head
    assert(r.getString(1) == "accept_h1")
    assert(r.getLong(2) == 11 && r.getLong(3) == 11)
    assert(r.getLong(4) == 11L * 287682L)
  }

  test("all-failure stream accepts H0 at exactly n=20") {
    import spark.implicits._
    // 20·154151 = 3083020 ≥ 2944439; 19·154151 = 2928869 is still inside
    val df = stream(Seq.fill(30)(false))
      .toDF("event_type", "ts", "event_id", "value")
    val r = Sprt.decisions(df).collect().head
    assert(r.getString(1) == "accept_h0")
    assert(r.getLong(2) == 20 && r.getLong(3) == 0)
    assert(r.getLong(4) == -20L * 154151L)
  }

  test("an inconclusive short stream reports continue with end-of-stream state") {
    import spark.implicits._
    // alternating successes hover near zero LLR — no boundary in 10 steps
    val df = stream(Seq.tabulate(10)(_ % 2 == 0))
      .toDF("event_type", "ts", "event_id", "value")
    val r = Sprt.decisions(df).collect().head
    assert(r.getString(1) == "continue")
    assert(r.getLong(2) == 10 && r.getLong(3) == 5)
    assert(r.getLong(4) == 5L * 287682L - 5L * 154151L)
  }

  test("q207 fixture readout is internally consistent") {
    val out = graft.SparkEntry.queries("q207_sprt_decision")(spark, sf001)
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      val (dec, n, k, llr) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(Set("accept_h1", "accept_h0", "continue")(dec))
      assert(k >= 0 && k <= n)
      assert(llr == k * 287682L - (n - k) * 154151L, s"$r")
      if (dec == "accept_h1") assert(llr >= 2944439L)
      if (dec == "accept_h0") assert(llr <= -2944439L)
      if (dec == "continue") assert(math.abs(llr) < 2944439L)
    }
  }
}
