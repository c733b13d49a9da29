package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChainResolveSpec extends SparkSpec {

  test("pointer doubling resolves chains, terminals, and loops on a constructed graph") {
    import spark.implicits._
    // 3 → 2 → 1 → 0 (terminal); 10 → 11 → 12 → 10 (pure 3-cycle);
    // 20 → 10 (tail draining into the cycle); 30 terminal singleton
    val succ = Seq(
      (0L, None), (1L, Some(0L)), (2L, Some(1L)), (3L, Some(2L)),
      (10L, Some(11L)), (11L, Some(12L)), (12L, Some(10L)),
      (20L, Some(10L)), (30L, None))
      .toDF("u", "ptr")
    val got = ChainResolve.resolve(succ, rounds = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)))))
      .toMap
    // a terminal resolves to itself in 0 hops — the fetcher's "already
    // canonical" case
    assert(got(0L) == (("terminal", Some(0L), Some(0L))))
    assert(got(30L) == (("terminal", Some(30L), Some(0L))))
    assert(got(1L) == (("resolved", Some(0L), Some(1L))))
    assert(got(2L) == (("resolved", Some(0L), Some(2L))))
    assert(got(3L) == (("resolved", Some(0L), Some(3L))))
    Seq(10L, 11L, 12L, 20L).foreach { u =>
      assert(got(u) == (("loop", None, None)), s"$u: ${got(u)}")
    }
  }

  test("doubling matches the sequential walk hop-for-hop on a long chain") {
    import spark.implicits._
    // one 40-hop path: 40 → 39 → … → 1 → 0 (terminal). 6 rounds cover
    // 2^6 = 64 ≥ 40; 5 rounds would too (32 + the seeded first hop) —
    // assert the exact hop counts, not just reachability.
    val succ = (0L to 40L).map(u => (u, if (u == 0) None else Some(u - 1)))
      .toDF("u", "ptr")
    val got = ChainResolve.resolve(succ, rounds = 6)
      .filter(col("status") === "resolved")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.size == 40)
    (1L to 40L).foreach(u => assert(got(u) == u, s"$u hops ${got(u)}"))
  }

  test("q204 exercises every status branch on the fixture") {
    val out = graft.SparkEntry.queries("q204_chain_resolve")(spark, sf001)
    val byStatus = out.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // measured on the regenerated 2026-08 fixtures: 30 terminals,
    // 434 resolved, 36 looping docs at sf0.001 (500 docs)
    assert(byStatus.getOrElse("terminal", 0L) > 0)
    assert(byStatus.getOrElse("resolved", 0L) > 0)
    assert(byStatus.getOrElse("loop", 0L) > 0)
    assert(byStatus.values.sum == 500)
  }
}
