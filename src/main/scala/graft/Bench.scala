package graft

/** Benchmark main: runs every registry query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name:sec,...}}.
  *
  * Each query executes through the noop sink — full plan execution
  * including projections and sorts (a bare .count() would let Catalyst
  * prune work the query claims to do). A warmup pass on the flagship query
  * absorbs JVM/codegen startup so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.getOrCreate()
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    try exec("q01_pricing_summary") catch { case _: Throwable => () } // warmup
    // A failed query reports -1 (never a normal-looking elapsed time) and
    // lands in "errors", so a regression can't masquerade as a speedup.
    def timedRun(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { exec(name); true } catch { case _: Throwable => false }
      val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // queries that cache intermediates (LSH banding, ML prepare) would
      // otherwise accumulate storage across the whole run; dropping the
      // cache between queries keeps each number self-contained
      spark.sharedState.cacheManager.clearCache()
      t
    }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t1 = timedRun(name)
      // transient box contention (GC pause, noisy neighbor) inflates a
      // single cold run 2-10×; a second attempt for slow-looking queries
      // bounds that error at ~30s added wall while leaving fast queries
      // single-run. min = best observed cold time (caches cleared per run).
      val t = if (t1 > 2.0) math.min(t1, timedRun(name)) else t1
      name -> t
    }
    def jsonLine(keyOf: String => String): String = {
      val qs = results.map { case (k, v) => "\"" + keyOf(k) + f"""":${v}%.3f""" }
        .mkString("{", ",", "}")
      val errors = results.collect { case (k, v) if v < 0 => "\"" + keyOf(k) + "\"" }
        .mkString("[", ",", "]")
      val total = results.map(_._2).filter(_ >= 0).sum
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    }
    // full names first for humans; the LAST line — the one the driver
    // parses — uses the qNN short keys, because the full-name line grew
    // past the driver's 4096-char output-tail capture at ~100 queries and
    // arrived truncated (BENCH_r03/r04 both recorded parsed:null)
    println(jsonLine(identity))
    println(jsonLine(_.split("_")(0)))
    spark.stop()
  }
}
