package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  /** threshold=0 forces the distributed star-contraction path;
    * default exercises the driver union-find fast path.
    */
  private def cc(edges: Seq[(Long, Long)], distributed: Boolean): Map[Long, Long] = {
    import spark.implicits._
    val threshold = if (distributed) 0L else 1L << 20
    ConnectedComponents.components(edges.toDF("u", "v"),
        smallGraphThreshold = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  for (distributed <- Seq(false, true)) {
    val tag = if (distributed) "distributed" else "driver"

    test(s"[$tag] chain collapses to its minimum") {
      val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), distributed)
      assert(got == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    }

    test(s"[$tag] two components plus isolated self-loop") {
      // self-loop (9,9) and duplicate/reversed edges must be tolerated
      val got = cc(Seq((10L, 11L), (11L, 10L), (3L, 7L), (7L, 5L), (9L, 9L), (3L, 7L)),
        distributed)
      assert(got == Map(11L -> 10L, 7L -> 3L, 5L -> 3L))
    }

    test(s"[$tag] empty edge set yields empty assignment") {
      assert(cc(Seq.empty, distributed).isEmpty)
    }

    test(s"[$tag] random graph matches reference union-find") {
      val rnd = new scala.util.Random(7)
      val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      val want = ConnectedComponents.unionFind(edges.toArray)
      assert(cc(edges, distributed) == want)
    }
  }

  test("driver union-find survives a deep descending chain (no recursion)") {
    // edges in descending order build the worst-case parent chain; a
    // recursive find would overflow the stack at this depth
    val n = 200000
    val edges = (n to 1 by -1).map(i => (i.toLong - 1, i.toLong)).toArray
    val got = ConnectedComponents.unionFind(edges)
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("long path converges within the round budget (log, not diameter)") {
    // a 200-node path has diameter 199: label propagation would need ~199
    // rounds; star-contraction must land well inside the default budget of
    // 25 — this is the distributed path's termination guarantee
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = cc(edges, distributed = true)
    assert(got.size == 199 && got.values.forall(_ == 0L))
  }

  test("both paths agree on a clustered random graph") {
    val rnd = new scala.util.Random(11)
    // dedup-shaped graph: many small cliques + noise edges
    val cliques = (0 until 40).flatMap { c =>
      val base = c * 10L
      Seq((base, base + 1), (base + 1, base + 2), (base, base + 2))
    }
    val noise = Seq.fill(60)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
    val edges = cliques ++ noise
    assert(cc(edges, distributed = false) == cc(edges, distributed = true))
  }
}
