package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Metrics

class PageRankOpSpec extends SparkSpec {

  private def ranksOf(edges: Seq[(Long, Long)], distributed: Boolean,
                      rounds: Int = 10): Map[Long, Double] = {
    import spark.implicits._
    val threshold = if (distributed) 0L else 1L << 20
    PageRankOp.ranks(edges.toDF("u", "v"), rounds, smallGraphThreshold = threshold)
      .select(col("vec_id"), Metrics.canonRound(col("pr"), 6).as("pr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("driver and distributed paths agree at canonical rounding") {
    val rnd = new scala.util.Random(11)
    val edges0 = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val sym = (edges0 ++ edges0.map(_.swap)).distinct
    val driver = ranksOf(sym, distributed = false)
    val dist = ranksOf(sym, distributed = true)
    assert(driver.keySet == dist.keySet)
    driver.foreach { case (k, v) =>
      assert(math.abs(v - dist(k)) <= 1e-6, s"node $k: driver $v vs distributed ${dist(k)}")
    }
  }

  test("ranks conserve mass and follow degree on a symmetric star") {
    // star: hub 1 — leaves 2,3,4 (symmetrized). Stationary mass is
    // degree-proportional on connected undirected graphs, so the hub
    // (deg 3) must outrank every leaf (deg 1). (A graph whose components
    // are each regular keeps the uniform start exactly — don't test
    // rank ordering on one of those.)
    val sym = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
    val pr = ranksOf(sym, distributed = false)
    // total mass = 1 (no dangling nodes: every node has out-edges);
    // ranksOf rounds each rank to the 1e-6 grid, so allow n ulps of that
    assert(math.abs(pr.values.sum - 1.0) < 1e-5)
    assert(pr(1L) > pr(2L) && pr(2L) == pr(3L) && pr(3L) == pr(4L))
  }

  test("q122's fixture graph gives identical output on both paths") {
    val e = Tables.embeddings(spark, sf001).filter(col("vec_id") % 5 === 0)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .filter(Metrics.canonRound(graft.functions.VectorOps.cosine(col("va"), col("vb")), 6) > 0.25)
      .select(col("id_a"), col("id_b"))
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
    def run(threshold: Long) = PageRankOp.ranks(edges, 10, smallGraphThreshold = threshold)
      .select(col("vec_id"), Metrics.canonRound(col("pr"), 6).as("pr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(0L) == run(1L << 20))
  }
}
