package graft

import graft.registry.Registry

/** t1-style smoke over the whole registry at sf0.001: every query builds,
  * executes, and (except documented empties) returns rows. The hash-level
  * correctness gate is the driver's DuckDB compare (tools/check_oracle.py
  * mirrors it) — this spec guards plan-breaking regressions cheaply.
  */
class RegistrySpec extends SparkSpec {

  /** Legitimately empty at sf0.001 (all parts shipped). */
  private val mayBeEmpty = Set("q16_anti_join")

  /** Expensive model-fitting queries get their own suite (SalesMlSpec). */
  private val skipHere = Set("q63_boosted_hybrid", "q64_stacking")

  test("oracle keys are a subset of query keys") {
    val unknown = Registry.oracleSql.keySet -- Registry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("Bench retry references parse from BENCH_DETAIL.json and name live queries") {
    // thresholds are data-derived now (r12 verdict item 7): the committed
    // detail artifact must parse, its times must be positive, and (modulo
    // queries renamed THIS round, which legitimately fall back to the
    // default until the next sweep) its names must be live registry rows
    val refs = Bench.refSecFromDetail()
    if (refs.nonEmpty) { // absent on a fresh checkout — defaults apply
      assert(refs.values.forall(v => v >= 0.3 && v < 3600), refs.take(5))
      val live = refs.keySet.intersect(Registry.queries.keySet)
      assert(live.size >= refs.size / 2,
        s"detail artifact mostly names unknown queries: ${refs.keySet -- Registry.queries.keySet}")
    }
    // and a missing file degrades to empty (default thresholds), not a crash
    assert(Bench.refSecFromDetail("/nonexistent/detail.json").isEmpty)
  }

  test("Bench retry reference is the LOWER median of recorded attempts") {
    // the deferred pass stops at the first sub-threshold attempt, so the
    // dominant retried shape is exactly 2 attempts [contended, steady] —
    // the upper median would re-select the contended time the median was
    // adopted to exclude (review finding, r14)
    val f = java.nio.file.Files.createTempFile("bench_detail", ".json")
    java.nio.file.Files.write(f,
      """{"attempts":{"q_two":[[6.1,3.2,true],[2.0,0.4,false]],
        |"q_three":[[9.0,3.0,true],[2.0,0.5,false],[4.0,0.6,false]],
        |"q_floor":[[0.1,0.2,false]]}}""".stripMargin.getBytes("UTF-8"))
    val refs = Bench.refSecFromDetail(f.toString)
    assert(refs("q_two") == 2.0)   // lower median, not the contended 6.1
    assert(refs("q_three") == 4.0) // odd count: the true median
    assert(refs("q_floor") == 0.3) // jitter floor
    java.nio.file.Files.delete(f)
  }

  Registry.all.filterNot(q => skipHere(q.name)).foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = rows(q.name)
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
