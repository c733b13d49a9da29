package graft

/** Benchmark main: runs every registry query against SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name:sec,...}}.
  *
  * Each query executes through the noop sink — full plan execution
  * including projections and sorts (a bare .count() would let Catalyst
  * prune work the query claims to do). A warmup pass on the flagship query
  * absorbs JVM/codegen startup so per-query numbers reflect steady state.
  *
  * Contention hardening: transient box contention (GC pause, noisy
  * neighbor, a concurrent build) can inflate a single cold run 2-10×, and
  * a SUSTAINED contention window defeats an immediate retry because both
  * attempts land inside it (r9: q105 read 11.0s serial vs 2.0s isolated on
  * identical code). So suspects are queued and re-run at the END of the
  * sweep — minutes later, when the contention window has usually passed —
  * and the reported number is the min over attempts (best observed COLD
  * time; caches are cleared between runs, so min is legitimate).
  */
object Bench {

  /** Isolated single-query medians (sec) for the heavy tail, measured on
    * the round-10 box via `runMain graft.Bench <names>` at sf0.1 with
    * nothing else running. These exist to make the retry policy
    * self-contained: a first-pass time > RetryFactor × median marks the
    * run contended, not the query slow. Values are a reference SCALE
    * (±20% box drift is fine), not a regression gate — re-measure when a
    * query's plan genuinely changes.
    */
  private[graft] val refMedianSec: Map[String, Double] = Map(
    "q64_stacking" -> 5.6,
    "q63_boosted_hybrid" -> 4.1,
    "q100_stream_neardup" -> 4.0,
    "q134_stream_session_evict" -> 3.5,
    "q107_ann_pq" -> 3.3,
    "q138_stream_attribution" -> 3.3,
    "q119_span_dedup" -> 2.9,
    "q49_rolling_fingerprint" -> 2.7,
    "q62_blend_round" -> 2.7,
    "q146_stream_windowed_dedup" -> 2.6,
    "q161_containment_pairs" -> 2.5,
    "q188_line_dedup" -> 2.5,
    "q85_fuzzy_match" -> 2.4,
    "q96_iqr_outliers" -> 2.3,
    "q105_incremental_neardup" -> 2.2,
    "q168_item_cf" -> 2.0,
    "q184_bootstrap_ci" -> 2.0,
    "q106_corpus_filter" -> 1.8,
    "q109_contamination" -> 1.5,
    // the 1.5-2.8s band (min of two clean full runs): without an entry
    // the 3.0s default threshold sits close enough that a warm-tail run
    // triggers wasted end-of-sweep retries; with one, the threshold is
    // ~3x the honest time and still catches real (5x+) contention
    "q102_ann_recall" -> 1.8,
    "q114_stream_contamination" -> 2.1,
    "q121_semantic_dedup" -> 1.7,
    "q126_bpe_merges" -> 1.9,
    "q127_kmeans_lloyd" -> 1.7,
    "q129_stream_sessions" -> 1.7,
    "q131_bpe_apply" -> 1.7,
    "q132_pit_enrich" -> 1.5,
    "q133_label_propagation" -> 1.7,
    "q135_pq_adc" -> 1.9,
    "q137_luby_mis" -> 2.2,
    "q139_histogram_quantile" -> 1.7,
    "q142_split_leakage" -> 1.9,
    "q151_kcore" -> 1.6,
    "q160_integrity_audit" -> 1.6,
    "q169_dbscan" -> 1.9,
    "q175_bfs_distance" -> 1.7,
    "q176_hits_scores" -> 1.9,
    "q177_mmr_rerank" -> 1.7,
    "q191_image_resize" -> 2.8,
    "q19_star_join" -> 1.6,
    "q27_approx_distinct" -> 2.0,
    "q46_ngram_jaccard" -> 2.2,
    "q47_minhash_dedup" -> 1.5,
    "q53_ann_ivf" -> 1.8,
    "q60_smape" -> 1.6,
    "q61_weight_grid" -> 1.7,
    "q69_quantiles" -> 1.9,
    "q83_dedup_clusters" -> 2.0,
    "q86_bloom_novelty" -> 1.7,
    "q87_setsim_join" -> 1.7,
    "q99_dedup_rate" -> 1.8,
    "q192_url_canonical" -> 1.5)

  /** Queries without a recorded median are treated as ~this fast; most of
    * the registry runs in 0.3-1.5s at sf0.1.
    */
  private val DefaultMedianSec = 1.0
  private val RetryFactor = 3.0
  private val MaxDeferredAttempts = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional arg (local debugging only — the driver passes none):
    // comma-separated name substrings; only matching queries are timed.
    val only = args.lift(0).map(_.split(",").toSeq)
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
    def threshold(name: String): Double =
      RetryFactor * refMedianSec.getOrElse(name, DefaultMedianSec)
    val firstPass = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.contains)))
      .map(name => name -> timedRun(name))
    // End-of-sweep deferred pass: errors are NOT retried (an error is a
    // regression signal, not noise); suspects get up to two more
    // attempts, stopping early once an attempt lands under the threshold.
    val results = firstPass.map { case (name, t1) =>
      var t = t1
      var attempts = 0
      while (t >= 0 && t > threshold(name) && attempts < MaxDeferredAttempts) {
        val r = timedRun(name)
        if (r >= 0) t = math.min(t, r)
        attempts += 1
      }
      name -> t
    }
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // full-name detail line first, for humans and for BENCH.md bookkeeping
    val qs = results.map { case (k, v) => "\"" + k + f"""":${v}%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    // The LAST line is the one the driver parses, and it only captures the
    // final ~2000 chars of stdout — at 175 queries even qNN-keyed pairs
    // overflow that (BENCH_r06 recorded parsed:null). Per-query times
    // therefore ship as a FIXED-ORDER 1-decimal array over the sorted
    // query names (the order of the detail line above): ~4-5 chars per
    // query keeps the line under 1000 chars up to ~300 queries. If the
    // registry ever grows past the budget anyway, drop the array rather
    // than ship a truncated, unparseable line.
    val tArr = results.map { case (_, v) => f"$v%.1f" }.mkString("[", ",", "]")
    val compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n":${results.size},"order":"sorted_names","errors":$errors,"t":$tArr}"""
    println(if (compact.length <= 1800) compact
            else f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n":${results.size},"errors":$errors}""")
    spark.stop()
  }
}
