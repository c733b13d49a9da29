package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** DistributedRank — the shared production global-rank path (range
  * repartition + partition-local rank + broadcast per-partition offsets)
  * that q95/q125/q147/q260 route through. Pins (a) bitwise equality with
  * the single-partition window form for dense_rank / row_number / ntile,
  * including tie and N<buckets edge cases, and (b) the PLAN property the
  * helper exists for: no `Exchange SinglePartition` anywhere — asserted
  * on a real mid-round q260 frame, captured BEFORE the per-round
  * localCheckpoint that hid the r13 single-partition sorts from
  * end-of-query audits.
  */
class DistributedRankSpec extends SparkSpec {

  private def noSinglePartition(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"$label plans a single-partition exchange:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("denseRank matches the global-window form (with duplicate keys) and plans no single-partition exchange") {
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    // l_quantity has heavy duplication -> exercises equal-key co-location
    val got = DistributedRank.denseRank(li, Seq(col("l_quantity"), col("l_partkey")), "dr")
    val want = li.withColumn("dr",
      dense_rank().over(Window.orderBy(col("l_quantity"), col("l_partkey"))).cast("long"))
    assert(got.select("l_orderkey", "l_partkey", "dr").exceptAll(
      want.select("l_orderkey", "l_partkey", "dr")).isEmpty)
    noSinglePartition(got, "denseRank")
  }

  test("rowNumber over a total order matches the global-window form") {
    val o = Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_totalprice"))
    val got = DistributedRank.rowNumber(o, Seq(col("o_totalprice").desc, col("o_orderkey")), "rn")
    val want = o.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    noSinglePartition(got, "rowNumber")
  }

  test("ntile matches Spark's NTile split for uneven, even, and N<buckets cases") {
    import spark.implicits._
    for (n <- Seq(3, 4, 7, 64)) {
      val c = Tables.customer(spark, sf001).select(col("c_custkey"))
      val got = DistributedRank.ntile(c, Seq(col("c_custkey")), n, "b")
      val want = c.withColumn("b", ntile(n).over(Window.orderBy(col("c_custkey"))))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, s"buckets=$n")
    }
    // N < buckets: every row its own bucket
    val tiny = Seq(10L, 20L, 30L).toDF("k")
    val got = DistributedRank.ntile(tiny, Seq(col("k")), 8, "b")
      .orderBy("k").select("b").as[Int].collect()
    assert(got.toSeq == Seq(1, 2, 3))
    // empty input stays empty
    assert(DistributedRank.ntile(tiny.filter(col("k") < 0), Seq(col("k")), 4, "b").isEmpty)
  }

  test("q260 mid-round plan has no Exchange SinglePartition, pre-checkpoint plan included") {
    // rebuild the round-0 input exactly as q260 does, then run ONE real
    // doubling round and audit BOTH visible layers: the round's own plan
    // (lead window + offset joins) and the pre-checkpoint ranked frame
    // (range exchange + partition-local sort) that the helper's eager
    // checkpoint would otherwise hide — the r13 audit blind spot
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        concat(TextQueries.tokens(col("text")),
          array(concat(lit("~"), col("doc_id").cast("string")))).as("toks"))
    val positions = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    val seed = DistributedRank.denseRank(positions, Seq(col("tok")), "r")
      .select("doc_id", "pos", "r")
    val mid = SuffixRanks.rankRound(seed, 0)
    noSinglePartition(mid, "q260 mid-round rank")
    val pre = DistributedRank.localRankedForAudit(positions, Seq(col("tok")))
    pre.collect()
    val prePlan = pre.queryExecution.executedPlan.toString
    assert(!prePlan.contains("Exchange SinglePartition"),
      s"pre-checkpoint rank plan has a single-partition exchange:\n$prePlan")
    assert(prePlan.contains("rangepartitioning"),
      s"pre-checkpoint rank plan should range-partition:\n$prePlan")
    // and the seed rank itself agrees with the window form
    val want = positions.withColumn("r",
        dense_rank().over(Window.orderBy("tok")).cast("long"))
      .select("doc_id", "pos", "r")
    assert(seed.exceptAll(want).isEmpty)
  }
}
