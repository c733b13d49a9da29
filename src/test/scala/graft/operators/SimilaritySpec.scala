package graft.operators

import graft.SparkSpec
import graft.registry.Registry

class SimilaritySpec extends SparkSpec {

  private def topk(name: String): Map[Long, Seq[Long]] =
    Registry.queries(name)(spark, sf001)
      .select("q_id", "vec_id", "rank")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap

  test("MLlib IVF ANN recall@10 vs brute force is usable (nProbe=4 of 16 lists)") {
    // the MLlib-KMeans IVF path directly — the registry q53 now runs the
    // deterministic IvfLloyd twin, so this test keeps IvfAnn exercised
    val exact = topk("q50_knn_bruteforce")
    val (indexed, centroids) = IvfAnn.buildIndex(
      spark, graft.Tables.embeddings(spark, sf001), nList = 16)
    val ivf = IvfAnn.search(indexed, centroids,
        probeIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, nProbe = 4)
      .select("q_id", "vec_id", "rank")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).toSet
      val a = ivf.getOrElse(q, Nil).toSet
      (e intersect a).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean, per-probe $recalls")
  }

  test("PQ ANN recall@10 vs brute force is usable (8 subspaces x 16 codes, ADC shortlist + exact re-rank)") {
    val exact = topk("q50_knn_bruteforce")
    val pq = topk("q107_ann_pq")
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).toSet
      val a = pq.getOrElse(q, Nil).toSet
      (e intersect a).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean, per-probe $recalls")
  }

  test("deterministic PQ (q135) recall@10 vs exact L2 is usable, and re-rank orders by true distance") {
    import org.apache.spark.sql.functions._
    import graft.Tables
    // exact L2 top-10 ground truth (q135 quantizes RAW vectors, so the
    // baseline is L2, not q50's cosine)
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
    val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d"), col("vec_id"))
    val exact = e.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        call_function("graft_l2dist", col("v"), col("qv")).as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rows = Registry.queries("q135_pq_adc")(spark, sf001).collect()
    val pq = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.map(q => (exact(q) intersect pq(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean, per-probe $recalls")
    // within each probe, rank must follow the exact re-ranked distance
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val byRank = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "l2_dist not monotone in rank")
    }
  }

  test("IVF results are a subset of the probed lists' exact cosines (no fabrication)") {
    val exact = topk("q50_knn_bruteforce")
    val ivf = topk("q53_ann_ivf")
    // every IVF hit that IS in the exact top-10 must appear in the same order
    ivf.foreach { case (q, hits) =>
      val inExact = hits.filter(exact(q).contains)
      assert(inExact == exact(q).filter(inExact.contains), s"order broken for probe $q")
    }
    // and the deterministic quantizer's lists must be good enough to use
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).toSet
      (e intersect ivf.getOrElse(q, Nil).toSet).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"deterministic IVF mean recall@10 $mean, per-probe $recalls")
  }

  test("MMR re-rank: selections are a shortlist subset, first pick is pure relevance (q177)") {
    val exact = topk("q50_knn_bruteforce")
    val rows = Registry.queries("q177_mmr_rerank")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byProbe = rows.groupBy(_._1)
    byProbe.foreach { case (q, sel) =>
      assert(sel.length == 4 && sel.map(_._3).distinct.length == 4, s"probe $q")
      // every selection comes from the exact top-8 shortlist
      assert(sel.map(_._3).toSet.subsetOf(exact(q).take(8).toSet), s"probe $q out of shortlist")
      // greedy round 1 is pure relevance: the brute-force rank-1 hit
      assert(sel.minBy(_._2)._3 == exact(q).head, s"probe $q first pick")
    }
  }

  test("MMR at lambda=1 degenerates to pure relevance top-k (algebraic pin)") {
    // with the redundancy term weighted 0, greedy MMR must reproduce the
    // brute-force ranking exactly, order included
    val exact = topk("q50_knn_bruteforce")
    val mmr = MmrRerank.rerank(graft.Tables.embeddings(spark, sf001),
        shortK = 8, selectK = 4, lambda = 1.0)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    mmr.foreach { case (q, sel) =>
      assert(sel == exact(q).take(4), s"probe $q: $sel vs ${exact(q).take(4)}")
    }
  }

  test("SemDeDup kept set equals an independent greedy recomputation") {
    import graft.Tables
    val out = Registry.queries("q121_semantic_dedup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    // independent recomputation on the driver from raw embeddings
    val embs = Tables.embeddings(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / math.sqrt(na * nb) * 1e6 + 0.5) / 1e6
    }
    val anchors = embs.keys.filter(_ % 31 == 0).toSeq.sorted
    val assign = embs.keys.toSeq.sorted.map { id =>
      val best = anchors.map(a => (a, cos(embs(id), embs(a)))).maxBy { case (a, c) => (c, -a) }
      (id, best._1, best._2)
    }
    val expectedKeep = assign.groupBy(_._2).flatMap { case (_, members) =>
      val ordered = members.sortBy { case (id, _, c) => (c, id) }
      val kept = scala.collection.mutable.Buffer[Long]()
      val res = ordered.map { case (id, _, _) =>
        val dup = ordered.takeWhile(_._1 != id).exists { case (prev, _, _) =>
          cos(embs(prev), embs(id)) >= 0.3 }
        if (!dup) kept += id
        id -> (if (dup) 0 else 1)
      }
      res
    }
    out.foreach { case (id, _, keep) =>
      assert(expectedKeep(id) == keep, s"vec $id keep flag")
    }
    // every cluster keeps its rank-1 (least-central) member
    out.groupBy(_._2).foreach { case (c, ms) =>
      assert(ms.exists(_._3 == 1), s"cluster $c kept nothing") }
  }

  test("contrastive triples: positives share the anchor's label, negatives never do") {
    import org.apache.spark.sql.functions.col
    val labels = graft.Tables.embeddings(spark, sf001)
      .select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Registry.queries("q128_contrastive_pairs")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val anchor = r.getLong(0)
      val pos = r.getLong(1)
      assert(pos != anchor, s"anchor $anchor paired with itself")
      assert(labels(pos) == labels(anchor), s"positive $pos label mismatch for anchor $anchor")
      Seq(3, 4).foreach { i =>
        if (!r.isNullAt(i)) {
          val neg = r.getLong(i)
          assert(labels(neg) != labels(anchor), s"negative $neg shares anchor $anchor's label")
        }
      }
    }
  }

  test("contrastive triple generation plans with equi joins only (no cartesian)") {
    val plan = Registry.queries("q128_contrastive_pairs")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.filter(l => l.contains("Join")).mkString("\n"))
  }
  test("int8 quantization: integer-grid vectors reconstruct exactly, others within half a step (q143)") {
    import spark.implicits._
    val e = Seq(
      (0L, Seq(127.0f, -127.0f, 0.0f, 64.0f)),  // all multiples of scale=1.0 -> exact
      (1L, Seq(1.0f, 0.5f, -0.25f, 0.0f)))      // scale=1/127 -> sub-step errors
      .toDF("vec_id", "embedding")
    val got = SimilarityQueries.int8QuantStats(e).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (s0, mse0, me0) = got(0L)
    assert(s0 == 1.0 && mse0 == 0.0 && me0 == 0.0, s"exact vec: ${got(0L)}")
    val (s1, mse1, me1) = got(1L)
    assert(math.abs(s1 - 1.0 / 127) < 1e-8)
    // error can never exceed half a quantization step
    assert(mse1 > 0.0 && me1 > 0.0 && me1 <= s1 / 2 + 1e-9, s"approx vec: ${got(1L)}")
  }

  test("matryoshka recall: zero-padded tails make prefix ranking lossless -> recall 1.0 (q145)") {
    import spark.implicits._
    // 11 vectors, all signal in the first 2 of 4 dims; probes are vec_id < 5
    val e = (0 until 11).map { i =>
      val a = math.cos(i * 0.55); val b = math.sin(i * 0.55)
      (i.toLong, Seq(a.toFloat, b.toFloat, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val got = SimilarityQueries.matryoshkaRecall(e, 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == (0L until 5L).toSet)
    assert(got.values.forall(_ == 1.0), s"recalls: $got")
  }
  test("DBSCAN roles satisfy the density definitions on the fixture graph (q169)") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.embeddings(spark, sf001).filter(col("vec_id") % 5 === 0)
    val a = d.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = d.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val edges = a.join(b, col("id_a") < col("id_b"))
      .filter(graft.functions.Metrics.canonRound(
        graft.functions.VectorOps.cosine(col("va"), col("vb")), 6) > 0.25)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nb = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = graft.registry.Registry.queries("q169_dbscan")(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val core = rows.collect { case (v, ("core", _)) => v }.toSet
    rows.foreach { case (v, (role, cl)) =>
      val deg = nb.getOrElse(v, Set.empty).size
      role match {
        case "core" =>
          assert(deg >= 3, s"core $v has degree $deg")
          assert(cl >= 0 && cl <= v, s"core $v cluster must be a min-id label: $cl")
        case "border" =>
          assert(deg < 3 && nb.getOrElse(v, Set.empty).exists(core),
            s"border $v must be sub-dense but core-adjacent")
          val coreCls = nb(v).filter(core).map(rows(_)._2)
          assert(cl == coreCls.min, s"border $v must take the smallest adjacent core cluster")
        case "noise" =>
          assert(!nb.getOrElse(v, Set.empty).exists(core) && cl == -1L,
            s"noise $v must have no core neighbor")
      }
    }
    // core neighbors share a cluster (they are in the same component)
    edges.foreach { case (u, v) =>
      if (core(u) && core(v))
        assert(rows(u)._2 == rows(v)._2, s"adjacent cores $u,$v split clusters")
    }
  }

  test("BFS distances: path graph settles hop-by-hop, beyond-budget nodes stay -1 (q175)") {
    import spark.implicits._
    val nodes = (1L to 5L).toDF("vec_id")
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (p ++ p.map(_.swap)).toDF("u", "v")
    val seeds = Seq(1L).toDF("vec_id")
    val got = BfsDistance.distances(nodes, edges, seeds, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> -1), got.toSeq)
  }

  test("HITS: the pointed-at node takes authority 1, pure pointers take hub 1 (q176)") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L).toDF("vec_id")
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("u", "v")
    val got = SimilarityQueries.hitsScores(nodes, edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // unnormalized rounds: a(3)=2,4,8; h(1)=h(2)=2,4,8
    assert(got(3L) == ((8L, 0L, 1.0, 0.0)), s"authority: ${got(3L)}")
    assert(got(1L) == ((0L, 8L, 0.0, 1.0)) && got(2L) == ((0L, 8L, 0.0, 1.0)),
      s"hubs: ${got(1L)} ${got(2L)}")
  }

  test("embedding drift: constructed halves give the exact centroid L2 (q148)") {
    import spark.implicits._
    val e = Seq(
      (0L, Seq(1.0f, 0.0f), 7),   // half 0
      (1L, Seq(0.0f, 1.0f), 7),   // half 1 -> centroid diff (1,-1), L2 = sqrt(2)
      (2L, Seq(0.5f, 0.5f), 8),
      (3L, Seq(0.5f, 0.5f), 8))   // identical halves -> drift 0
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityQueries.embeddingDrift(e).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(7) == ((1L, 1L, 1.414214)), s"label 7: ${got(7)}")
    assert(got(8) == ((1L, 1L, 0.0)), s"label 8: ${got(8)}")
  }

  test("retrieval metrics: hand-computed precision/MRR/nDCG on an axis-aligned corpus (q198)") {
    import spark.implicits._
    // probe 0 along +x; candidates at known cosines: two relevant (label 1)
    // at ranks 1 and 3, one irrelevant (label 2) at rank 2, plus a far
    // same-label vector at rank 4 and padding vectors of label 3.
    // cosines: v1=(1,0)->1.0, v2=(.8,.6)->0.8, v3=(.6,.8)->0.6, v4=(0,1)->0.0
    val e = Seq(
      (0L, Seq(1f, 0f), 1),   // probe (vec_id % 25 == 0)
      (1L, Seq(1f, 0f), 1),   // rank 1, relevant
      (2L, Seq(0.8f, 0.6f), 2), // rank 2, not relevant
      (3L, Seq(0.6f, 0.8f), 1), // rank 3, relevant
      (4L, Seq(0f, 1f), 1))   // rank 4, relevant (same label, orthogonal)
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityQueries.retrievalMetrics(e).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L && r.getInt(1) == 1)
    assert(r.getInt(2) == 3 && r.getInt(3) == 3, s"3 of 3 relevant retrieved: $r")
    assert(r.getDouble(4) == 0.3, s"precision@10: $r")
    assert(r.getDouble(5) == 1.0, s"MRR, first hit at rank 1: $r")
    // DCG = w1 + w3 + w4, IDCG = w1 + w2 + w3 (only 3 relevant exist)
    val wm = (1 to 10).map(x => math.round(1e6 / (math.log(x + 1.0) / math.log(2.0))))
    val expNdcg = math.floor((wm(0) + wm(2) + wm(3)).toDouble / (wm(0) + wm(1) + wm(2)) * 1e4 + 0.5) / 1e4
    assert(r.getDouble(6) == expNdcg, s"nDCG: ${r.getDouble(6)} vs $expNdcg")
  }

  test("PqAnn (MLlib-codebook PQ) recall@10 vs brute force — the production trainer stays exercised") {
    val e = graft.Tables.embeddings(spark, sf001)
    val (encoded, books) = PqAnn.buildIndex(spark, e, m = 8, k = 16, dim = 64)
    val got = PqAnn.search(spark, e, encoded, books, probeIds = Seq(0L, 1L, 2L), kNN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    encoded.unpersist()
    val byProbe = got.groupBy(_._1)
    assert(byProbe.keySet == Set(0L, 1L, 2L))
    byProbe.values.foreach(rows => assert(rows.map(_._3).sorted.toSeq == (1 to 10)))
    // recall@10 vs the exact cosine top-10 (bruteForceTopK probes vec_id < 5)
    val exact = SimilarityQueries.bruteForceTopK(e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._1 < 3).groupBy(_._1)
    val recall = byProbe.map { case (p, rows) =>
      rows.map(_._2).toSet.intersect(exact(p).map(_._2).toSet).size / 10.0
    }
    assert(recall.sum / recall.size >= 0.5, s"mean recall ${recall.sum / recall.size}")
  }

  test("hybrid RRF: fused ranks follow the reciprocal-rank sums, rows come from a source list (q212)") {
    val out = graft.SparkEntry.queries("q212_hybrid_rrf")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4), r.getInt(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (probe, rows) =>
      // ranks are 1..n dense per probe and ordered by (rrf desc, doc_id)
      assert(rows.map(_._6).sorted.toSeq == (1 to rows.length), s"probe $probe ranks")
      val ordered = rows.sortBy(_._6)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._2 < b._2), s"probe $probe order: $a vs $b")
        case _ => ()
      }
      rows.foreach { case (_, doc, rb, rc, rrf, _) =>
        // every fused row cites at least one source list, never the probe itself
        assert(rb.nonEmpty || rc.nonEmpty, s"doc $doc in neither list")
        assert(doc != probe)
        val expected = rb.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          rc.map(r => 1.0 / (60 + r)).getOrElse(0.0)
        assert(rrf == math.floor(expected * 1e6 + 0.5) / 1e6, s"doc $doc rrf")
      }
    }
  }
}
