package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** DistributedRank — the shared production global-rank path (range
  * repartition + in-partition numbering via the monotonic-id bit split +
  * broadcast per-partition offsets; dense_rank on the distinct key
  * domain) that q95/q125/q147/q260 route through. Pins (a) bitwise
  * equality with the single-partition window form for dense_rank /
  * row_number / ntile, including tie and N<buckets edge cases, and (b)
  * the PLAN properties the helper exists for: no `Exchange
  * SinglePartition` anywhere, and — on the pre-checkpoint frame, where
  * the r13 audit blind spot lived — exactly ONE exchange, the range one
  * (a window partitioned by spark_partition_id would silently add a
  * second full-data hash exchange; caught by plan audit in r14).
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
    // l_quantity has heavy duplication -> exercises the distinct-key path
    val got = DistributedRank.denseRank(li, Seq("l_quantity", "l_partkey"), "dr")
    val want = li.withColumn("dr",
      dense_rank().over(Window.orderBy(col("l_quantity"), col("l_partkey"))).cast("long"))
    assert(got.select("l_orderkey", "l_partkey", "dr").exceptAll(
      want.select("l_orderkey", "l_partkey", "dr")).isEmpty)
    noSinglePartition(got, "denseRank")
  }

  test("denseRank keeps NULL-key rows and ranks them first, like the window form") {
    // review finding (r14): a using-columns join-back is null-UNSAFE —
    // every null-key row would silently vanish. The <=> join-back must
    // reproduce dense_rank's nulls-first ascending semantics instead.
    import spark.implicits._
    val df = Seq((1, Some(10L)), (2, None), (3, Some(10L)), (4, None), (5, Some(3L)))
      .toDF("id", "k")
    val got = DistributedRank.denseRank(df, Seq("k"), "dr")
    assert(got.count() == 5, "null-key rows must survive the join-back")
    val want = df.withColumn("dr", dense_rank().over(Window.orderBy("k")).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("denseRank takes the unique-domain fast path: window parity, no join-back in the plan") {
    // r14 verdict item 1: when every key is unique, dense_rank ≡
    // row_number, so the distinct + <=> join-back must be skipped —
    // pinned by the absence of the join-back's mirror columns from the
    // executed plan (they exist ONLY on the slow path).
    val o = Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_totalprice"))
    val got = DistributedRank.denseRank(o, Seq("o_orderkey"), "dr")
    val want = o.withColumn("dr",
      dense_rank().over(Window.orderBy(col("o_orderkey"))).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("__dr9_k_"),
      "unique key domain must skip the distinct + join-back (mirror columns found in plan)")
  }

  test("rank matches the global-window RANK() form with ties and nulls, and emits tie counts") {
    import spark.implicits._
    // l_partkey repeats across orders -> real multi-row tie groups
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey"))
    val got = DistributedRank.rankWithTieCount(li, Seq("l_partkey"), "rk", "gc")
      .select("l_orderkey", "l_partkey", "rk", "gc")
    val want = li
      .withColumn("rk", rank().over(Window.orderBy(col("l_partkey"))).cast("long"))
      .withColumn("gc", count(lit(1)).over(Window.partitionBy(col("l_partkey"))))
      .select("l_orderkey", "l_partkey", "rk", "gc")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // nulls rank first, together, exactly as the window form
    val nf = Seq((1, Some(10L)), (2, None), (3, Some(10L)), (4, None), (5, Some(3L)))
      .toDF("id", "k")
    val gotN = DistributedRank.rank(nf, Seq("k"), "rk")
    val wantN = nf.withColumn("rk", rank().over(Window.orderBy("k")).cast("long"))
    assert(gotN.count() == 5)
    assert(gotN.exceptAll(wantN).isEmpty && wantN.exceptAll(gotN).isEmpty)
    // empty input stays empty
    assert(DistributedRank.rank(nf.filter(col("id") < 0), Seq("k"), "rk").isEmpty)
    // float keys are refused loudly (the normalization wrapper would
    // silently add a second full-data exchange instead)
    val err = intercept[IllegalArgumentException] {
      DistributedRank.rank(
        Tables.lineitem(spark, sf001).select(col("l_orderkey"), col("l_quantity")),
        Seq("l_quantity"), "rk")
    }
    assert(err.getMessage.contains("floating-point"))
  }

  test("rank plans the key window ON the range layout: one exchange, no re-sort, pre-checkpoint") {
    // the whole point of rank(): RangePartitioning(keys) satisfies the
    // key window's ClusteredDistribution and the in-partition sort its
    // ordering, so the pre-checkpoint frame — range exchange + sort +
    // id projection + head/tie window — must plan exactly ONE exchange
    // (the range one) and exactly ONE sort. A second hash exchange on
    // the keys here means the window stopped seeing the range layout
    // (the bug the checkpoint-first form had: LogicalRDD under AQE
    // drops the partitioning).
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey"))
    val pre = DistributedRank.rankedHeadForAudit(li, Seq("l_partkey"))
    pre.collect()
    val plan = pre.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"rank's pre-checkpoint frame must pay exactly the range exchange:\n" +
        exchanges.mkString("\n"))
    val sorts = plan.linesIterator.filter(_.trim.matches(".*\\bSort \\[.*")).toSeq
    assert(sorts.size == 1,
      s"the window must reuse the in-partition sort, not add its own:\n${sorts.mkString("\n")}")
    assert(plan.contains("Window"), "the key-group head must come from a window pass")
    // and the full rank() result is identical whether or not the audit
    // frame's extra columns are present — guard against drift between
    // rankImpl and the audit hook
    val got = DistributedRank.rank(li, Seq("l_partkey"), "rk")
    val want = li.withColumn("rk", rank().over(Window.orderBy(col("l_partkey"))).cast("long"))
    assert(got.exceptAll(want).isEmpty)
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

  test("pre-checkpoint rank plan has exactly ONE exchange, and it is the range one") {
    // the r14 plan-audit finding: a Window.partitionBy(spark_partition_id)
    // adds a second full-data hash exchange on top of the range shuffle
    // (RangePartitioning never satisfies the window's distribution
    // requirement). The monotonic-id bit split must keep the plan at ONE
    // exchange — this is the claim "same shuffle any orderBy pays".
    val o = Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_totalprice"))
    val pre = DistributedRank.localRankedForAudit(o, Seq(col("o_totalprice"), col("o_orderkey")))
    pre.collect()
    // the FINAL adaptive plan only — AdaptiveSparkPlanExec.toString
    // prints the initial plan too, double-counting every exchange
    val plan = pre.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1,
      s"pre-checkpoint frame must pay exactly one exchange, saw ${exchanges.size}:\n" +
        exchanges.mkString("\n"))
    assert(exchanges.head.contains("rangepartitioning"),
      s"the one exchange must be the range shuffle:\n${exchanges.head}")
    assert(!plan.contains("Window"), "no window function may run on the data frame")
  }

  test("q260 mid-round plan has no Exchange SinglePartition") {
    // rebuild the round-0 input exactly as q260 does, then run ONE real
    // doubling round and audit its plan (the per-round localCheckpoint
    // in q260's loop would hide it from end-of-query audits)
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        concat(TextQueries.tokens(col("text")),
          array(concat(lit("~"), col("doc_id").cast("string")))).as("toks"))
    val positions = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    val seed = DistributedRank.rank(positions, Seq("tok"), "r")
      .select("doc_id", "pos", "r")
    val mid = SuffixRanks.rankRound(seed, 0)
    noSinglePartition(mid, "q260 mid-round rank")
    // and the seed rank itself agrees with the window RANK() form (r15:
    // the ladder runs on tie-preserving rank(), not denseRank — see the
    // SuffixRanks scaladoc for why dense-ness is only needed, and
    // automatically holds, at termination)
    val want = positions.withColumn("r",
        rank().over(Window.orderBy("tok")).cast("long"))
      .select("doc_id", "pos", "r")
    assert(seed.exceptAll(want).isEmpty)
    // one real round on top: ties share ranks, gc counts the tie group
    assert(mid.filter(col("gc") < 1).isEmpty)
  }
}
