package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** HistGbm (q251) — the deterministic histogram-GBM twin closing SURVEY
  * §2 row E8. The DuckDB oracle pins cross-engine equality at 3 SFs; this
  * spec pins the ALGORITHM against an independent driver-side reference:
  * a brute-force split search over the collected sf0.001 residuals must
  * reproduce the distributed argmax exactly, and the boosting curve must
  * behave like boosting (train RMSE non-increasing, leaves partition the
  * train set every round).
  */
class HistGbmSpec extends SparkSpec {

  private lazy val report: Array[Row] =
    SparkEntry.queries("q251_hist_gbm")(spark, sf001)
      .orderBy("round", "leaf").collect()

  test("train RMSE is non-increasing across boosting rounds") {
    val byRound = report.groupBy(_.getAs[Int]("round")).toSeq.sortBy(_._1)
      .map { case (r, rows) => (r, rows.head.getAs[Double]("train_rmse")) }
    assert(byRound.size === 3)
    byRound.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b <= a + 1e-9, s"train RMSE rose: $byRound")
    }
    // and the model actually learned something in round 1 vs the base
    // prediction (RMSE of residuals r0 = sd of cents/100)
    assert(byRound.last._2 < byRound.head._2 * 1.01)
  }

  test("leaves partition the train set: sum(n_leaf) constant per round") {
    val trainN = Tables.lineitem(spark, sf001)
      .filter(col("l_orderkey") % 5 =!= 4).count()
    report.groupBy(_.getAs[Int]("round")).foreach { case (r, rows) =>
      assert(rows.map(_.getAs[Long]("n_leaf")).sum === trainN,
        s"round $r leaves do not partition train")
      // depth-2: at most 4 leaves, at least 2 (the root split is real)
      assert(rows.length >= 2 && rows.length <= 4)
    }
  }

  /** The exact round-1 feature prep q251 uses. */
  private def gbmInput = Tables.lineitem(spark, sf001).select(
    floor(col("l_quantity") / 5).cast("long").as("f1"),
    floor(col("l_discount") * 100 + 0.5).cast("long").as("f2"),
    month(col("l_shipdate")).cast("long").as("f3"),
    floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
    (col("l_orderkey") % 5).as("fold"))

  /** Collected integer-cents residuals vs the train-mean base. */
  private def collectedResiduals(): Array[(Array[Long], Long)] = {
    val train = gbmInput.filter(col("fold") =!= 4)
      .select("f1", "f2", "f3", "cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = math.floor(train.map(_._4).map(BigInt(_)).sum.toDouble /
      train.length + 0.5).toLong
    train.map { case (f1, f2, f3, c) => (Array(f1, f2, f3), c - base) }
  }

  // brute force: for every (feat, threshold) with a non-empty right
  // side, score = SL^2/nL + SR^2/nR; argmax with (score DESC, feat, v);
  // None when no candidate exists (single bin on every feature)
  private def best(rows: Array[(Array[Long], Long)]): Option[(Int, Long)] = {
    val cands = for {
      f <- 0 until 3
      v <- rows.map(_._1(f)).distinct.sorted.dropRight(1)
    } yield {
      val (l, r) = rows.partition(_._1(f) <= v)
      val (sl, sr) = (l.map(_._2).map(BigInt(_)).sum.toDouble,
        r.map(_._2).map(BigInt(_)).sum.toDouble)
      val score = sl * sl / l.length + sr * sr / r.length
      (score, f + 1, v)
    }
    if (cands.isEmpty) None
    else { // DESC, feat ASC, v ASC
      val w = cands.maxBy { case (s, f, v) => (s, -f, -v) }
      Some((w._2, w._3))
    }
  }

  test("round-1 root split and leaf values match a brute-force driver reference") {
    val res = collectedResiduals()
    val (rf, rv) = best(res).get
    val r1 = report.filter(_.getAs[Int]("round") == 1)
    assert(r1.forall(_.getAs[Int]("root_feat") == rf), s"root feat $rf vs ${r1.head}")
    assert(r1.forall(_.getAs[Long]("root_bin") == rv))

    // leaf values: lr=1/2 leaf-mean floored to the cents grid, for the
    // leaves implied by (root, per-side child) brute-force splits
    val (lRows, rRows) = res.partition(_._1(rf - 1) <= rv)
    Seq(("L", lRows), ("R", rRows)).foreach { case (side, rows0) =>
      val (cf, cv) = best(rows0).get
      Seq(("L", true), ("R", false)).foreach { case (tag, isLeft) =>
        val leafRows = rows0.filter(r => (r._1(cf - 1) <= cv) == isLeft)
        val expectW = math.floor(
          leafRows.map(_._2).map(BigInt(_)).sum.toDouble / (2.0 * leafRows.length) + 0.5).toLong
        val got = r1.find(_.getAs[String]("leaf") == side + tag).get
        assert(got.getAs[Long]("leaf_cents") === expectW, s"leaf $side$tag")
        assert(got.getAs[Long]("n_leaf") === leafRows.length.toLong)
        assert(got.getAs[Int]("child_feat") === cf)
        assert(got.getAs[Long]("child_bin") === cv)
      }
    }
  }

  test("depth-3 round-1 tree matches the brute-force driver reference (generalization proof)") {
    // r14 verdict item 5: the level-loop generalization is only a claim
    // until a non-default depth is pinned against an independent
    // reference. Grow the full depth-3 tree by brute force — root, two
    // level-1 splits, four level-2 splits, eight leaves — and demand the
    // distributed level loop lands on the identical structure, counts,
    // and leaf values.
    val depth = 3
    val res = collectedResiduals()
    val (rf, rv) = best(res).get
    // walk to the leaves; each leaf carries its PARENT (level depth-1)
    // split — what the report's child_ columns record
    def walk(rows: Array[(Array[Long], Long)], label: String, level: Int)
        : Seq[(String, Array[(Array[Long], Long)], Option[(Int, Long)])] =
      best(rows) match {
        case None =>
          if (level == depth - 1) Seq((label + "_", rows, None))
          else walk(rows, label + "_", level + 1)
        case Some((f, v)) =>
          val (l, r) = rows.partition(_._1(f - 1) <= v)
          if (level == depth - 1)
            Seq((label + "L", l, Some((f, v))), (label + "R", r, Some((f, v))))
          else walk(l, label + "L", level + 1) ++ walk(r, label + "R", level + 1)
      }
    val leaves = walk(res, "", 0)
    val r1 = HistGbm.trainReport(gbmInput, depth = depth)
      .orderBy("round", "leaf").collect()
      .filter(_.getAs[Int]("round") == 1)
    assert(r1.map(_.getAs[String]("leaf")).sorted.toSeq ===
      leaves.map(_._1).sorted, "leaf label sets differ")
    assert(r1.forall(_.getAs[Int]("root_feat") == rf))
    assert(r1.forall(_.getAs[Long]("root_bin") == rv))
    assert(r1.map(_.getAs[Long]("n_leaf")).sum === res.length.toLong,
      "depth-3 leaves must partition the train set")
    leaves.foreach { case (label, rows0, parent) =>
      val got = r1.find(_.getAs[String]("leaf") == label).get
      assert(got.getAs[Long]("n_leaf") === rows0.length.toLong, s"n at $label")
      val expectW = math.floor(
        rows0.map(_._2).map(BigInt(_)).sum.toDouble / (2.0 * rows0.length) + 0.5).toLong
      assert(got.getAs[Long]("leaf_cents") === expectW, s"leaf value at $label")
      parent match {
        case Some((cf, cv)) =>
          assert(got.getAs[Int]("child_feat") === cf, s"parent feat at $label")
          assert(got.getAs[Long]("child_bin") === cv, s"parent bin at $label")
        case None =>
          assert(got.isNullAt(got.fieldIndex("child_feat")), s"padded leaf $label")
      }
    }
  }
}
