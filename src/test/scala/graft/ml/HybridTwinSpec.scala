package graft.ml

import graft.SparkSpec

/** Pins the deterministic BoostedHybrid twin (q213): structural
  * invariants that must hold for ANY corpus, plus the known fixture
  * signal (chars-per-token slope). The cross-engine value check is the
  * DuckDB oracle gate; this spec guards the semantics the oracle can't
  * see — that the stump's split really is the SSE-reduction argmax and
  * that the pipeline degrades gracefully.
  */
class HybridTwinSpec extends SparkSpec {

  private lazy val out =
    graft.SparkEntry.queries("q213_hybrid_twin")(spark, sf001).collect()

  test("stage-1 recovers the chars-per-token slope on every lang row") {
    assert(out.nonEmpty)
    // documents text is space-joined words of 2-8 chars: the global
    // chars-per-token slope must sit near (mean word length + 1 space)
    out.foreach { r =>
      val slope = r.getDouble(2)
      assert(slope > 4.0 && slope < 7.0, s"slope $slope")
    }
  }

  test("split constants are global: identical across lang rows") {
    val splits = out.map(r => (r.getInt(4), r.getDouble(5), r.getDouble(6))).distinct
    assert(splits.length == 1, splits.mkString(", "))
    val slopes = out.map(r => (r.getDouble(2), r.getDouble(3))).distinct
    assert(slopes.length == 1)
  }

  test("rmse columns are non-negative and finite") {
    out.foreach { r =>
      val (s1, s2) = (r.getDouble(7), r.getDouble(8))
      assert(s1 >= 0 && s2 >= 0 && !s1.isNaN && !s2.isNaN, s"($s1, $s2)")
      assert(r.getLong(1) > 0)
    }
  }

  test("stump split is the SSE-reduction argmax over train residuals") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        size(graft.operators.TextQueries.tokens(col("text"))).as("x"),
        col("n_chars").as("y"))
      .filter(col("doc_id") % 4 =!= 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val (slope, intercept) = (out.head.getDouble(2), out.head.getDouble(3))
    val res = docs.map { case (x, y) =>
      (x, math.floor((y.toDouble - (intercept + slope * x)) * 1e4 + 0.5).toLong)
    }
    val vs = res.map(_._1).distinct.sorted
    val tot = res.map(_._2).sum
    val n = res.length
    val scores = vs.dropRight(1).map { v =>
      val left = res.filter(_._1 <= v)
      val (nl, sl) = (left.length, left.map(_._2).sum)
      val (nr, sr) = (n - nl, tot - sl)
      (v, sl.toDouble * sl / nl + sr.toDouble * sr / nr)
    }
    val bestV = scores.maxBy { case (v, s) => (s, -v) }._1
    assert(out.head.getInt(4) == bestV,
      s"query split ${out.head.getInt(4)} vs reference argmax $bestV")
  }
}
