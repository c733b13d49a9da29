package graft.operators

import graft.SparkSpec

/** Pins the KMV overlap sketch (q219): the estimator must actually see
  * the injected cross-source mass, stay silent on disjoint pairs, and
  * respect the sketch-theory error envelope. Cross-engine value parity
  * is the DuckDB oracle's job.
  */
class KmvSketchSpec extends SparkSpec {

  // columns: src_a, src_b, n_a, n_b, exact_intersection, exact_jaccard,
  // est_jaccard, est_intersection
  private lazy val rows =
    graft.SparkEntry.queries("q219_kmv_overlap")(spark, sf001).collect()

  test("injected consecutive-source pairs carry the known ~1/2 jaccard") {
    val injected = rows.filter { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (ai, bi) = (a.drop(3).toInt, b.drop(3).toInt)
      ai % 2 == 0 && bi == ai + 1
    }
    assert(injected.length == 10, s"${injected.length}")
    injected.foreach { r =>
      val exact = r.getDouble(5)
      val est = r.getDouble(6)
      assert(exact > 0.4 && exact <= 0.55, s"${r.getString(0)} exact $exact")
      // k=32 binomial noise: ±0.09 std — allow 3 sigma
      assert(math.abs(est - exact) < 0.3, s"${r.getString(0)} est $est vs $exact")
      assert(r.getDouble(7) > 0, "est_intersection must be positive on injected pairs")
    }
  }

  test("zero-overlap pairs estimate zero; estimates never go negative") {
    rows.foreach { r =>
      val (exactI, estJ, estI) = (r.getLong(4), r.getDouble(6), r.getDouble(7))
      if (exactI == 0) assert(estJ == 0.0 && estI == 0.0, r.toString)
      assert(estJ >= 0 && estI >= 0)
    }
  }

  test("sketch rows are the k smallest distinct hashes per source") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf001).select(col("source"), col("text"))
    val sk = KmvSketch.sketch(docs, k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = docs.select(col("source"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    all.groupBy(_._1).foreach { case (src, hs) =>
      val expect = hs.map(_._2).distinct.sorted.take(8).toSeq
      val got = sk.filter(_._1 == src).map(_._2).sorted.toSeq
      assert(got == expect, s"$src")
    }
  }
}
