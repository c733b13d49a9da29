package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Bradley-Terry source ranking (q242): hand-computed MM round, planted
  * tier recovery, and conservation laws at sf0.001.
  */
class BradleyTerrySpec extends SparkSpec {

  private lazy val out =
    BradleyTerry.sourceRanking(Tables.documents(spark, sf001)).cache()

  test("one MM round on a two-item matrix matches the hand computation") {
    // items 0,1; 10 comparisons; 0 wins 7. w0 = w1 = 1, so both terms
    // are 10/2 scaled to 5e9. Smoothed wins: 2*7+1=15, 2*3+1=7.
    // raw: 1.5 and 0.7 -> v = 1.5e9, 0.7e9; total 2.2e9; normalize by
    // k/total and snap: 15/11 -> 1.363636, 7/11 -> 0.636364.
    val w = BradleyTerry.mmStrengths(Seq((0, 1, 10L, 7L)), rounds = 1)
    assert(w(0) == 1.363636)
    assert(w(1) == 0.636364)
  }

  test("orientation symmetry: flipping who is 'lo' mirrors the strengths") {
    val a = BradleyTerry.mmStrengths(Seq((0, 1, 10L, 7L)), BradleyTerry.Rounds)
    val b = BradleyTerry.mmStrengths(Seq((0, 1, 10L, 3L)), BradleyTerry.Rounds)
    assert(a(0) == b(1) && a(1) == b(0))
  }

  test("planted tier ordering is recovered in mean strength") {
    val byTier = out.groupBy("tier").agg(avg("bt_strength").as("s"))
      .orderBy("tier").collect().map(_.getDouble(1))
    assert(byTier.length == 5)
    byTier.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo < hi, s"tier means must increase: ${byTier.mkString(",")}")
    }
  }

  test("conservation: every comparison has one winner and two participants") {
    val m = BradleyTerry.comparisonMatrix(Tables.documents(spark, sf001))
    val total = m.agg(sum("n")).head().getLong(0)
    val r = out.agg(sum("n_wins"), sum("n_comp")).head()
    assert(r.getLong(0) == total)
    assert(r.getLong(1) == 2 * total)
  }

  test("streamed win-matrix state yields the batch ranking row-for-row") {
    val streamed = graft.streaming.PreferenceStreams
      .streamingBradleyTerry(spark, sf001).collect().toSeq
    val batch = out.collect().toSeq
    assert(streamed == batch)
  }

  test("strengths are positive with snapped mean 1") {
    assert(out.filter(col("bt_strength") <= 0).count() == 0)
    val k = out.count()
    val s = out.agg(sum("bt_strength")).head().getDouble(0)
    assert(math.abs(s - k) <= 2e-6 * k, s"sum $s vs k $k")
  }
}
