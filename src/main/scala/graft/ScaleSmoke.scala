package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-headroom smoke: replicates the sf0.1 fixtures K× with shifted
  * keys (every replica keeps its own join/window structure) and times the
  * headline operator shapes at 1× and K×. The point is the RATIO: a shape
  * whose time grows ~linearly with data survives a cluster scale-up; one
  * that grows quadratically (or OOMs) does not — this is the local proxy
  * for the 100 TB question, run as `runMain graft.ScaleSmoke [sfDir] [K]`.
  */
object ScaleSmoke {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // decimal POINTS in every artifact (review finding, r15)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    // optional 3rd arg: comma-separated shape-name substrings — re-measure
    // one row without paying for the whole sweep
    val only = args.lift(2).map(_.split(",").toSeq).getOrElse(Nil)
    val spark = Session.getOrCreate()
    import spark.implicits._

    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val rep = df.withColumn("__rep", explode(sequence(lit(0L), lit(k - 1L))))
      keyCols.foldLeft(rep) { (acc, c) =>
        acc.withColumn(c, col(c) * k + col("__rep"))
      }.drop("__rep")
    }

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }

    // shapes under test, each parameterized by its inputs
    def scanAgg(l: DataFrame) = l
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))

    def joinAgg(l: DataFrame, o: DataFrame) = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))

    def lshPairs(docs: DataFrame) = {
      val sigs = operators.DedupQueries.minhashSignatures(docs)
      val bb = operators.DedupQueries.capBuckets(
        operators.DedupQueries.banded(sigs, 8, 2), cap = 50)
      val a = bb.select(col("band"), col("bh"), col("doc_id").as("id_a"))
      val b = bb.select(col("band"), col("bh"), col("doc_id").as("id_b"))
      a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b")).distinct()
    }

    def rangeJoin(e: DataFrame) = {
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
        .withColumn("lo", col("p_ts") - expr("INTERVAL 30 MINUTES"))
      operators.RangeJoin.pointInInterval(
        clicks, purchases, "click_ts", "lo", "p_ts", Seq("user_id"), 1800L)
        .groupBy("purchase_id").agg(count(lit(1)))
    }

    val l1 = Tables.lineitem(spark, sfDir); val o1 = Tables.orders(spark, sfDir)
    val d1 = Tables.documents(spark, sfDir); val e1 = Tables.events(spark, sfDir)
    val lk = replicate(l1, Seq("l_orderkey")); val ok = replicate(o1, Seq("o_orderkey"))
    // perturb each replica's text (post-shift doc_id % k = replica index):
    // identical replica texts would share MinHash signatures, multiplying
    // every LSH bucket by k — a structurally different workload than
    // "k× more documents"
    val dk = replicate(d1, Seq("doc_id"))
      .withColumn("text", concat(col("text"), lit(" repmark"), pmod(col("doc_id"), lit(k.toLong))))
    val ek = replicate(e1, Seq("user_id", "event_id"))
    val k4 = math.min(k, 4)
    val d4 = d1.withColumn("__rep", explode(sequence(lit(0L), lit(k4 - 1L))))
      .withColumn("doc_id", col("doc_id") * k4 + col("__rep")).drop("__rep")
      .withColumn("text", concat(col("text"), lit(" repmark"), pmod(col("doc_id"), lit(k4.toLong))))

    // top-k per group, both idioms — the window form shuffles+sorts every
    // row; the bounded-heap aggregator partial-aggregates map-side
    def topkWindow(l: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      l.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    }
    def topkAgg(l: DataFrame) = {
      val topk = functions.TopK.topK(5)
      l.groupBy("l_returnflag")
        .agg(topk(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")).as("top"))
    }

    // connected components, distributed path forced (threshold 0): round
    // count must stay logarithmic as the pair graph grows
    def ccDistributed(docs: DataFrame) = {
      val edges = lshPairs(docs).select(col("id_a").as("u"), col("id_b").as("v"))
      operators.ConnectedComponents.components(edges, smallGraphThreshold = 0L)
    }

    // exact set-similarity join (prefix+positional filtering). NOTE the
    // replica corpus is a stress case: replication grows the corpus
    // without growing the vocabulary, so token frequencies inflate k× and
    // prefix selectivity degrades quadratically (measured 41× time at 10×
    // data) — real corpora add rare tokens as they grow. Run at replica 4
    // to keep the smoke fast; the super-linear ratio is the finding.
    def setsim(docs: DataFrame, dfCap: Int = Int.MaxValue) = {
      // same set construction as q87: the fused graft_shingle_set scalar
      // (row-local distinct bigram hashes — zero shuffles before the
      // candidate join; it replaced generator→xxhash64→collect_set)
      val d = docs
        .select(col("doc_id"), call_function("graft_shingle_set", col("text")).as("sh"))
        .cache()
      d.count()
      operators.SetSimJoin.jaccardJoin(d, "doc_id", "sh", 0.8, dfCap = dfCap)
    }

    // bloom-prefiltered anti join: novel-document filter vs a 4×-larger
    // reference corpus
    def bloomAnti(docs: DataFrame) = {
      val dd = docs.withColumn("fp", md5(col("text")))
        .withColumn("sn", pmod(col("doc_id"), lit(5L)))
      operators.BloomJoin.anti(
        dd.filter(col("sn") === 0), dd.filter(col("sn") =!= 0), "fp", 1000000L)
    }

    // q109's decontamination shape: fused n-gram generator → 8-byte hash
    // keys → distinct → benchmark-set equi join. Replicated docs keep the
    // replica-perturbed text, so the benchmark n-gram set grows ~k× too —
    // the join stays selective; both sides scale linearly.
    def contamination(docs: DataFrame) = {
      val g = docs
        .select(col("doc_id"), call_function("graft_ngrams", col("text"), lit(8)).as("ngs"))
        .select(col("doc_id"), xxhash64(col("ngs")).as("ng"))
        .distinct().cache()
      g.count()
      val bench = g.filter(col("doc_id") % 17 === 0).select("ng").distinct()
      g.filter(col("doc_id") % 17 =!= 0).join(bench, "ng")
        .groupBy("doc_id").agg(count(lit(1)))
    }

    // q108's repetition-filter shape: generator → two map-side-combinable
    // hash aggs, no join anywhere — the pure scan+agg pipeline
    def repetition(docs: DataFrame) = docs
      .select(col("doc_id"), call_function("graft_shingles", col("text")).as("sh"))
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c"), count(lit(1)), max("c"))

    // q119's span-dedup shape: occurrences → hot-gram hash agg → cover
    // join → per-doc rebuild. Replication makes every original doc's
    // grams hot (k clones each), so the cover join emits ~all positions —
    // the worst case for this operator; every stage must still be linear.
    def spanDedup(docs: DataFrame) = {
      val kgram = 8
      val ds = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      val occ = ds.select(col("doc_id"),
          posexplode(operators.PipelineQueries.ngrams(col("ws"), kgram)))
        .toDF("doc_id", "p0", "g")
        .select(col("doc_id"), (col("p0") + 1).as("p"), xxhash64(col("g")).as("g"))
      val hot = occ.groupBy("g").agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2).select("g")
      val cov = occ.join(hot, "g")
        .select(col("doc_id"), explode(sequence(col("p"), col("p") + (kgram - 1))).as("cp"))
        .distinct()
      cov.groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
    }

    // q122's iteration shape: 10 PageRank rounds (equi join + hash agg
    // per round) over an edge list replicated with disjoint node ids —
    // isolates the per-round scaling from graph construction
    def pagerank(pairs: DataFrame) = {
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      val deg = edges.groupBy("u").agg(count(lit(1)).as("deg")).cache()
      val edgesD = edges.join(deg, "u").cache()
      val n = math.max(deg.count(), 1L)
      var rank = deg.select(col("u").as("vec_id"), lit(1.0 / n).as("pr"))
      for (_ <- 1 to 10) {
        val contrib = edgesD.join(rank, col("u") === col("vec_id"))
          .groupBy(col("v")).agg(sum(col("pr") / col("deg")).as("c"))
        rank = deg.select(col("u").as("vec_id"))
          .join(contrib, col("vec_id") === col("v"), "left")
          .select(col("vec_id"),
            (lit(0.15 / n) + lit(0.85) * coalesce(col("c"), lit(0.0))).as("pr"))
      }
      rank
    }
    val prPairs = {
      val em = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 5 === 0)
      val a = em.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = em.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .filter(functions.VectorOps.cosine(col("va"), col("vb")) > 0.25)
        .select("id_a", "id_b").cache()
    }
    prPairs.count()
    val prPairsK = replicate(prPairs, Seq("id_a", "id_b"))

    // q125's layout shape. The global ntiles route through
    // DistributedRank (range repartition + partition-offset ranking) —
    // no single-partition sort; this row measures the three range
    // shuffles (x code, y code, file cut) against data growth.
    def zorder(o: DataFrame) = {
      val coded = sources.ZOrderLayout.rankCoded(o,
        col("o_custkey"), to_date(col("o_orderdate")), col("o_orderkey"), 256)
      sources.ZOrderLayout.layoutStats(coded, nFiles = 16)
    }

    // q126's training loop at 3 steps: per step one map-side-combinable
    // pair-count agg + a 1-row collect + a narrow string map. Linear per
    // step by construction; the smoke pins it.
    def bpeRounds(docs: DataFrame) =
      operators.BpeMerge.learn(docs, "text", steps = 3)

    // q127's iteration shape: per round a broadcast assignment join + a
    // (cluster, dim) hash agg; centroids travel as literals. Embeddings
    // replicate ADDITIVELY so the k seed ids stay the original distinct
    // vectors (the multiplicative shift would seed 8 clones of vec 0 and
    // collapse every round onto one hot cluster key).
    def kmeansRounds(em: DataFrame) =
      operators.KMeansLloyd.fit(em, k = 8, rounds = 3)
    val em1 = Tables.embeddings(spark, sfDir)
    val emK = em1.withColumn("__rep", explode(sequence(lit(0L), lit(k - 1L))))
      .withColumn("vec_id", col("vec_id") + lit(500000L) * col("__rep")).drop("__rep")

    // q133's round shape: one edge join + one INTEGER hash agg per round
    // over the replicated near-dup graph (disjoint node ids, like the
    // pagerank row) — isolates per-round label-propagation scaling
    def labelProp(pairs: DataFrame) = {
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      val nodes = edges.select(col("u").as("vec_id")).distinct()
        .withColumn("seed_lbl",
          when(col("vec_id") % 4 === 0, pmod(col("vec_id"), lit(10L)).cast("int")))
      operators.LabelPropagation.propagate(nodes, edges, rounds = 3)
    }

    // q132's PIT shape: SCD-2 daily state build (one shuffle + window) →
    // as-of probe by every lineitem. Replication multiplies orders AND
    // lines per customer, so the per-customer ordered sweep partitions
    // grow k× — the stress that matters for the union+window as-of
    def pitEnrich(l: DataFrame, o: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("valid_from")
      val hist = o.groupBy(col("o_custkey"), col("o_orderdate").as("valid_from"))
        .agg(count(lit(1)).as("n_day"),
          sum(functions.Metrics.canonRound(col("o_totalprice"), 2).cast("decimal(18,2)")).as("sp_day"))
        .select(col("o_custkey"), col("valid_from"),
          sum("n_day").over(w).as("cum_orders"),
          sum("sp_day").over(w).cast("decimal(38,2)").as("cum_spend"))
      val fact = l.select(col("l_orderkey"), col("l_shipdate"))
        .join(o.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_shipdate"))
      operators.AsOfJoin.asof(fact, hist, "o_custkey", "l_shipdate", "valid_from",
          Seq("cum_orders", "cum_spend"), "pit_")
        .filter(col("pit_cum_orders").isNotNull)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_lines"), sum("pit_cum_spend").cast("double").as("s"))
    }

    // q135's two-stage PQ: all-subspace Lloyd training + broadcast
    // distance-table ADC + exact re-rank; additive replication keeps the
    // seed ids distinct (see kmeans_rounds)
    def pqAdc(em: DataFrame) = operators.PqLloyd.search(
      em, m = 8, k = 8, rounds = 2, dim = 64, probeMax = 5L, kNN = 10)

    // the as-of merge, both tiers: union+window composition vs the custom
    // AsOfJoinExec (one shuffle per side, streaming sweep)
    def asofClicks(e: DataFrame) = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
    def asofPurch(e: DataFrame) = e.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("value"))
    def asofComposed(e: DataFrame) =
      operators.AsOfJoin.asof(asofClicks(e), asofPurch(e), "user_id", "click_ts", "ts", Seq("value"))
    def asofNative(e: DataFrame) =
      plans.NativeAsOfJoin.asof(asofClicks(e), asofPurch(e), "user_id", "click_ts", "ts", Seq("value"))

    // q168's shape: the basket self-join runs ON THE ORDER KEY — pairs
    // are Σ lines² per order, so 10× orders must scale ~linearly (an
    // |items|² formulation would blow up instead)
    def itemCf(l: DataFrame) = operators.RelationalQueries.itemItemCf(
      l, topK = 3, maxBasket = 8, minCo = 2L) // registry q168 knobs

    // round-8 additions: MMR re-rank (per-probe-bounded shortlist — the
    // corpus scan grows, the greedy rounds don't), incremental rollup
    // (two hash aggs + delta-key join), compaction planning (window over
    // the file LISTING, which stays 400 rows as the data under it grows)
    def mmr(e: DataFrame) = operators.MmrRerank.rerank(e, shortK = 8, selectK = 4, lambda = 0.7)
    def rollup(o: DataFrame) = operators.TableMaintenance.incrementalRollup(o)
    def compaction(o: DataFrame) =
      operators.TableMaintenance.compactionPlan(o, nFiles = 400, targetBytes = 40_000_000L)

    // q167's shape: train-side count aggs + the (lang × vocab)
    // likelihood broadcast onto the test doc-term frame
    def naiveBayes(docs: DataFrame) = operators.TextQueries.naiveBayesConfusion(docs)

    // q175's frontier shape: per round one frontier join + one anti
    // join (monotone settled set, like kcore/luby)
    def bfsRounds(pairs: DataFrame) = {
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      val nodes = edges.select(col("u").as("vec_id")).distinct()
      operators.BfsDistance.distances(nodes, edges,
        nodes.filter(col("vec_id") % 4 === 0), rounds = 3)
    }

    // q151's peel shape: per round one degree agg + two semi joins onto
    // the shrinking edge frame (monotone state, like luby/label-prop)
    def kcoreRounds(pairs: DataFrame) = {
      val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionByName(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      val nodes = edges.select(col("u").as("vec_id")).distinct()
      operators.KCore.decompose(nodes, edges, k = 3, rounds = 4)
    }

    // q154's shape: ONE user_id shuffle for the lag window, then a
    // |types|²-bounded count agg — the transition matrix must stay
    // window-bound, never corpus-bound
    def markov(e: DataFrame) = operators.EventQueries.markovTransitions(e)

    // q141's shape: tiny per-source rate table broadcast onto the scan;
    // accept test is a per-row hash compare — must stay scan-bound
    def tempSample(docs: DataFrame) =
      operators.PipelineQueries.temperatureSample(docs)

    // q142's shape: the md5-MinHash band join ACROSS the hash split
    // (train side bucket-capped) — same sub-quadratic guarantee as
    // minhash_lsh, probed cross-split instead of self-joined
    def splitLeak(docs: DataFrame) =
      operators.DedupQueries.splitLeakage(docs)

    // q143's shape: posexplode → two per-vector hash aggs (integer-grid
    // error encoding) — pure scan+agg over dim× rows
    def int8Quant(em: DataFrame) =
      operators.SimilarityQueries.int8QuantStats(em)

    // q145's shape: two broadcast-probe brute-force scans (full dim +
    // prefix) + a top-10×top-10 recall join — linear in the corpus
    def matryoshka(em: DataFrame) =
      operators.SimilarityQueries.matryoshkaRecall(em, 16)

    // q146's dataflow as a batch join: canonical-fingerprint equi join
    // gated by the event-time band. Fingerprint groups are duplicate
    // clusters (bounded), so the join stays linear in the corpus
    def wdedupBatch(docs: DataFrame) = {
      val d = docs.select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))).as("fp"),
        (pmod(col("doc_id"), lit(2L)) === 0).as("is_ref"))
      val a = d.filter(col("is_ref")).select(col("doc_id").as("a_id"), col("fp"))
      val b = d.filter(!col("is_ref")).select(col("doc_id").as("b_id"), col("fp"))
      b.join(a, "fp")
        .filter(col("a_id") >= col("b_id") - 3600L && col("a_id") <= col("b_id"))
        .groupBy("b_id").agg(min("a_id").as("dup_of"), count(lit(1)).as("n"))
    }

    // q184's shape: ALL bootstrap replicates as one wide single-pass
    // aggregation (one md5/row + KM-derived weights) — pure scan+agg,
    // the no-R×-blowup property under test
    def bootCi(o: DataFrame) = operators.TableMaintenance.bootstrapCi(o, reps = 40)

    // q185's shape: per-group sampled + exact moments in one grouped scan
    def groupCi(l: DataFrame) =
      operators.TableMaintenance.groupSampleCi(l, pPct = 10, targetRel = 0.01)

    // q211's truth shape: inverted-index exact-overlap join (explode
    // distinct shingles → df-capped equi self-join → per-pair counts →
    // jaccard bands). The df cap is the scale guard: replication
    // multiplies every shingle's df by K so the UNCAPPED join cost grows
    // K² — exactly the blowup the cap (or a PPJoin prefix filter,
    // SetSimJoin) bounds at 100 TB, where ultra-common shingles carry no
    // jaccard signal anyway.
    def lshRecallTruth(d: DataFrame, dfCap: Int = 64) = {
      val sh = d.select(col("doc_id"),
          explode(array_distinct(operators.TextQueries.bigrams(split(col("text"), " ")))).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("s"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("s")
      val capped = sh.withColumn("df", count(lit(1)).over(w))
        .filter(col("df") <= dfCap).drop("df")
      val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val ia = capped.select(col("s"), col("doc_id").as("id_a"))
      val ib = capped.select(col("s"), col("doc_id").as("id_b"))
      ia.join(ib, "s").filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .select((col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double")).as("j"))
        .groupBy(floor(col("j") * 10).as("b")).agg(count(lit(1)))
    }

    // q188/q189's shape: explode docs to lines, hash-agg doc frequency,
    // long-keyed join back — the whole pipeline must stay ~linear in
    // corpus size (the df build side is the line vocabulary, not the
    // corpus)
    def lineDedup(d: DataFrame) =
      operators.CurationQueries.flaggedLines(d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_lines"),
          sum((!col("keep")).cast("int")).as("n_removed"))

    // q194/q195's shape: real PNG encode+decode+hash per row inside one
    // mapPartitions scan, then the fingerprint group-by — must stay
    // CPU-linear in the corpus (no shuffle grows with dup clusters)
    def phash(d: DataFrame) =
      multimodal.Multimodal.imagePerceptualHashes(
          spark, multimodal.Multimodal.syntheticImages(d))
        .groupBy("phash").agg(count(lit(1)))

    // q200's shape: per-(type,value) hash agg, then windows over DISTINCT
    // values — the window input must grow with the value vocabulary, not
    // the row count
    def ksDriftShape(e: DataFrame) = operators.EventQueries.ksDrift(e)

    // q196's shape: map-side-combinable hourly pre-agg, then windows on
    // the calendar-bounded dense series — the window input must NOT grow
    // with the row count at all
    def cusumShape(e: DataFrame) = operators.EventQueries.cusumChangepoint(e)

    // q204's shape: 13 pointer-doubling self-joins — wall time must grow
    // ~linearly with the node count (the ROUND count is pinned by log2 of
    // the longest chain, not by |V|; each round is one equi join)
    def chainResolve(d: DataFrame) = {
      val n = d.count()
      val succ = d.select(col("doc_id").as("u"),
        when(col("doc_id") % 17 === 0, lit(null).cast("long"))
          .otherwise((col("doc_id") * 37 + 11) % n).as("ptr"))
      operators.ChainResolve.resolve(succ, rounds = 13)
    }

    // q206's shape: 4 power-iteration rounds — per round two narrow aggs
    // (row-keyed dot products, then a dim-keyed second moment whose
    // output is CONSTANT 64 rows at any corpus size)
    def powerIter(e: DataFrame) =
      operators.PowerIteration.topDirection(e, rounds = 4)

    // q205's shape: grouped model mean + broadcast probe + per-group
    // window rank over the calibration slice + test-side coverage agg —
    // the rank's per-group sort is the only super-linear piece
    def conformalShape(l: DataFrame) = {
      val li = l.select((col("l_partkey") % 25).as("g"),
        col("l_extendedprice").as("y"),
        ((col("l_orderkey") * 7919 + col("l_linenumber")) % 100).as("slot"))
      val model = li.filter(col("slot") < 60).groupBy("g")
        .agg(functions.Metrics.exactMean(col("y")).as("yhat"))
      val cal = li.filter(col("slot") >= 60 && col("slot") < 80)
        .join(broadcast(model), "g")
        .select(col("g"),
          functions.Metrics.canonRound(abs(col("y") - col("yhat")), 4).as("r"))
      val n = cal.groupBy("g").agg(count(lit(1)).as("n_cal"))
      val ranked = cal.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("r")))
      val qhat = ranked.join(broadcast(n), "g")
        .filter(col("rk") === floor((lit(9) * (col("n_cal") + 1) + 9) / 10).cast("long"))
        .select(col("g"), col("r").as("q_hat"))
      li.filter(col("slot") >= 80)
        .join(broadcast(model), "g").join(broadcast(qhat), "g")
        .groupBy("g")
        .agg(sum(when(abs(col("y") - col("yhat")) <= col("q_hat"), 1L)
          .otherwise(0L)).as("n_cov"), count(lit(1)).as("n_test"))
    }

    // q217's shape: per-group OLS + residual scan + cumulative window over
    // DISTINCT residual values per group — the window is the super-linear
    // suspect (distinct residuals ≈ rows on continuous data); q202's
    // bucketed narrowing is the documented fallback if this ratio drifts
    def quantileReg(l: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
      val g = l.select((col("l_partkey") % 25).as("g"),
        col("l_quantity").as("x"), col("l_extendedprice").as("y"))
      val coefs = operators.GroupedOls.fit(g, "g", "x", "y")
        .filter(col("slope").isNotNull)
        .select(col("g"), col("slope"), col("intercept"))
      val res = g.join(broadcast(coefs), "g")
        .select(col("g"),
          floor((col("y") - (col("intercept") + col("slope") * col("x"))) * 1e4 + 0.5)
            .cast("long").as("ri"))
      val pv = res.groupBy("g", "ri").agg(count(lit(1)).as("c"))
      val cum = pv.withColumn("cum", sum("c").over(
        w.partitionBy("g").orderBy("ri").rowsBetween(w.unboundedPreceding, 0)))
      val tot = res.groupBy("g").agg(count(lit(1)).as("n"))
      cum.join(tot, "g").groupBy("g", "n")
        .agg(min(when(col("cum") >= floor((col("n") * 9 + 9).cast("double") / 10.0)
          .cast("long"), col("ri"))).as("q90i"))
    }

    // q218's shape: per-doc chunk explode (rows ≈ tokens/stride) + the
    // output projection — must stay linear in corpus size. Measures the
    // FUSED graft_chunks Generator, i.e. the plan the registered query
    // actually executes (the HOF composition it replaced is pinned
    // equivalent in ChunksGeneratorSpec).
    def docChunk(d: DataFrame) =
      d.select(col("doc_id"),
          call_function("graft_chunks", col("text"), lit(32), lit(24))
            .as(Seq("chunk_id", "chunk")))
        .groupBy("doc_id").agg(count(lit(1)), sum(length(col("chunk"))))

    // ml.MlpRegressor's shape: standardization pass + N full-batch
    // gradient epochs, each ONE treeAggregate over the persisted RDD —
    // must scale linearly in rows (the per-epoch reduce is a fixed
    // ~d·h-double vector regardless of corpus size). Short epoch count:
    // the RATIO is the certificate, not the converged model. Measured
    // 5.3× at 10× rows (t1 4.7s, tk 25.0s) — exactly the
    // fixed-overhead-plus-linear decomposition: with f≈2.5s of
    // job-launch/moments/build overhead and v≈2.2s of per-row epoch
    // work, (f+10v)/(f+v) predicts 5.2×. The per-row half scales 10/10.
    def mlpFit(l: DataFrame) = {
      val assembled = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("l_extendedprice", "l_discount", "l_tax"))
        .setOutputCol("features")
        .transform(l.select(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")))
      ml.MlpRegressor(labelCol = "l_quantity", hidden = 8, epochs = 10, lr = 0.3)
        .fit(assembled)
      ()
    }

    // r12 shapes: DSIR two-pass model fit + scoring; DLT bounded-heap
    // sampling; class-grain k-anonymity (customer and orders replicated
    // with a consistent custkey shift so the spend join structure holds)
    val c1 = Tables.customer(spark, sfDir)
    val cK = replicate(c1, Seq("c_custkey"))
    val oCk = replicate(o1, Seq("o_orderkey", "o_custkey"))
    def dsirShape(docs: DataFrame) = operators.DsirSelect.selectFrom(docs)
    def prioShape(docs: DataFrame) = operators.WeightedSample.prioritySample(docs)
    def kanonShape(c: DataFrame, o: DataFrame) = operators.KAnonymity.audit(c, o)
    def packShape(docs: DataFrame) = operators.SequencePacking.packManifest(docs)
    def kappaShape(docs: DataFrame) = operators.AnnotatorAgreement.fleissKappa(docs)
    // gshard write+read roundtrip with the text-consuming funnel — the
    // connector's end-to-end cost (stage + vectorized decode) vs data size
    def gshardShape(docs: DataFrame): DataFrame = {
      val stage = streaming.TempDirs.create("gshard-smoke-").toString
      sources.GShard.write(docs, stage, nShards = 8)
      spark.read.format("graft.sources.GShardSource").load(stage)
        .groupBy("source").agg(count(lit(1)).as("n"),
          sum(size(split(col("text"), " "))).as("toks"))
    }

    // record linkage: replicas get DISJOINT block-key universes
    // (nationkey shifted like custkey) so the blocked join's per-key
    // fan-out stays constant — the honest 100 TB shape, where the block
    // key's cardinality grows with the corpus. Keeping the 25 fixture
    // nations while replicating rows would grow pairs K² BY DESIGN of
    // blocking, not as an implementation defect.
    val cNat = {
      val rep = c1.withColumn("__rep", explode(sequence(lit(0L), lit(k - 1L))))
      rep.withColumn("c_custkey", col("c_custkey") * k + col("__rep"))
        .withColumn("c_nationkey", (col("c_nationkey") * k + col("__rep")).cast("int"))
        .drop("__rep")
    }
    def linkShape(c: DataFrame) = operators.RecordLinkage.linkageReport(c)
    // Bradley-Terry: corpus grows 10x, the source set (and so the win
    // matrix the MM iterations run on) stays fixed — only the one
    // map-side-combinable reduction should scale
    def btShape(docs: DataFrame) = operators.BradleyTerry.sourceRanking(docs)
    // triangle counting: replicas shift BOTH keys so the co-purchase
    // graphs stay disjoint (10x edges/wedges, same density) — shifting
    // only orderkey would densify one shared part universe superlinearly
    val lTri = replicate(l1, Seq("l_orderkey", "l_partkey"))
    def triShape(li: DataFrame) = operators.TriangleCount.triangleReport(li)

    val shapes: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("record_linkage", () => noop(linkShape(c1)), () => noop(linkShape(cNat))),
      ("bradley_terry", () => noop(btShape(d1)), () => noop(btShape(dk))),
      ("triangle_count", () => noop(triShape(l1)), () => noop(triShape(lTri))),
      ("cms_heavy_hitters",
        () => noop(operators.CountMinSketch.report(d1)),
        () => noop(operators.CountMinSketch.report(dk))),
      ("lm_perplexity",
        () => noop(operators.LmPerplexity.worstReport(d1)),
        () => noop(operators.LmPerplexity.worstReport(dk))),
      ("dsir_select", () => noop(dsirShape(d1)), () => noop(dsirShape(dk))),
      ("priority_sample", () => noop(prioShape(d1)), () => noop(prioShape(dk))),
      ("k_anonymity", () => noop(kanonShape(c1, o1)), () => noop(kanonShape(cK, oCk))),
      ("sequence_packing", () => noop(packShape(d1)), () => noop(packShape(dk))),
      ("fleiss_kappa", () => noop(kappaShape(d1)), () => noop(kappaShape(dk))),
      ("gshard_roundtrip", () => noop(gshardShape(d1)), () => noop(gshardShape(dk))),
      ("quantile_regression", () => noop(quantileReg(l1)), () => noop(quantileReg(lk))),
      ("doc_chunking", () => noop(docChunk(d1)), () => noop(docChunk(dk))),
      ("mlp_epochs", () => mlpFit(l1), () => mlpFit(lk)),
      ("chain_resolve", () => noop(chainResolve(d1)), () => noop(chainResolve(dk))),
      ("power_iteration", () => noop(powerIter(em1)), () => noop(powerIter(emK))),
      ("conformal", () => noop(conformalShape(l1)), () => noop(conformalShape(lk))),
      ("image_phash", () => noop(phash(d1)), () => noop(phash(dk))),
      ("ks_drift", () => noop(ksDriftShape(e1)), () => noop(ksDriftShape(ek))),
      ("cusum_changepoint", () => noop(cusumShape(e1)), () => noop(cusumShape(ek))),
      ("scan_agg", () => noop(scanAgg(l1)), () => noop(scanAgg(lk))),
      ("join_agg", () => noop(joinAgg(l1, o1)), () => noop(joinAgg(lk, ok))),
      ("minhash_lsh", () => noop(lshPairs(d1)), () => noop(lshPairs(dk))),
      ("range_join", () => noop(rangeJoin(e1)), () => noop(rangeJoin(ek))),
      ("topk_window", () => noop(topkWindow(l1)), () => noop(topkWindow(lk))),
      ("topk_agg", () => noop(topkAgg(l1)), () => noop(topkAgg(lk))),
      ("cc_distributed", () => noop(ccDistributed(d1)), () => noop(ccDistributed(dk))),
      ("bloom_anti", () => noop(bloomAnti(d1)), () => noop(bloomAnti(dk))),
      ("contamination", () => noop(contamination(d1)), () => noop(contamination(dk))),
      ("repetition", () => noop(repetition(d1)), () => noop(repetition(dk))),
      ("span_dedup", () => noop(spanDedup(d1)), () => noop(spanDedup(dk))),
      ("pagerank_rounds", () => noop(pagerank(prPairs)), () => noop(pagerank(prPairsK))),
      ("asof_composed", () => noop(asofComposed(e1)), () => noop(asofComposed(ek))),
      ("asof_native", () => noop(asofNative(e1)), () => noop(asofNative(ek))),
      ("zorder_layout", () => noop(zorder(o1)), () => noop(zorder(ok))),
      ("bpe_rounds", () => { bpeRounds(d1); () }, () => { bpeRounds(dk); () }),
      ("kmeans_rounds", () => noop(kmeansRounds(em1)), () => noop(kmeansRounds(emK))),
      ("label_prop_rounds", () => noop(labelProp(prPairs)), () => noop(labelProp(prPairsK))),
      ("kcore_rounds", () => noop(kcoreRounds(prPairs)), () => noop(kcoreRounds(prPairsK))),
      ("markov_transitions", () => noop(markov(e1)), () => noop(markov(ek))),
      ("item_cf", () => noop(itemCf(l1)), () => noop(itemCf(lk))),
      ("mmr_rerank", () => noop(mmr(em1)), () => noop(mmr(emK))),
      ("incr_rollup", () => noop(rollup(o1)), () => noop(rollup(ok))),
      ("compaction_plan", () => noop(compaction(o1)), () => noop(compaction(ok))),
      ("naive_bayes", () => noop(naiveBayes(d1)), () => noop(naiveBayes(dk))),
      ("bfs_rounds", () => noop(bfsRounds(prPairs)), () => noop(bfsRounds(prPairsK))),
      ("pit_enrich", () => noop(pitEnrich(l1, o1)), () => noop(pitEnrich(lk, ok))),
      ("pq_adc", () => noop(pqAdc(em1)), () => noop(pqAdc(emK))),
      ("temp_sample", () => noop(tempSample(d1)), () => noop(tempSample(dk))),
      ("split_leakage", () => noop(splitLeak(d1)), () => noop(splitLeak(dk))),
      ("int8_quant", () => noop(int8Quant(em1)), () => noop(int8Quant(emK))),
      ("matryoshka_recall", () => noop(matryoshka(em1)), () => noop(matryoshka(emK))),
      ("windowed_dedup", () => noop(wdedupBatch(d1)), () => noop(wdedupBatch(dk))),
      ("bootstrap_ci", () => noop(bootCi(o1)), () => noop(bootCi(ok))),
      ("group_sample_ci", () => noop(groupCi(l1)), () => noop(groupCi(lk))),
      ("line_dedup", () => noop(lineDedup(d1)), () => noop(lineDedup(dk))),
      ("lsh_recall_truth", () => noop(lshRecallTruth(d1)), () => noop(lshRecallTruth(dk))),
      (s"setsim_join_k$k4", () => noop(setsim(d1)), () => noop(setsim(d4))),
      // the df guard at FULL k: hot prefix tokens stop generating df²
      // candidates; sets holding them route through the MinHash fallback
      // band (SetSimJoin.jaccardJoin dfCap doc). This is the closed-vocab
      // stress the uncapped row above can only run at 4×.
      (s"setsim_capped_k$k", () => noop(setsim(d1, dfCap = 50)),
        () => noop(setsim(dk, dfCap = 50))))

    val selected =
      if (only.isEmpty) shapes
      else shapes.filter { case (n, _, _) => only.exists(n.contains) }
    noop(scanAgg(l1)) // warmup
    val results = selected.map { case (name, base, big) =>
      val (_, t1) = time(base())
      val (_, tk) = time(big())
      spark.sharedState.cacheManager.clearCache() // per-query caches (LSH)
      (name, t1, tk, tk / math.max(t1, 1e-9))
    }
    println(f"""{"smoke":"scale","k":$k,"shapes":{${
      results.map { case (n, t1, tk, r) =>
        f""""$n":{"t1":$t1%.2f,"tk":$tk%.2f,"ratio":${r}%.1f}"""
      }.mkString(",")
    }}}""")
    spark.stop()
  }
}
