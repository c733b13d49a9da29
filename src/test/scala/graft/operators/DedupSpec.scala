package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("suppression weights: a k-copy cluster contributes exactly one doc of signal") {
    import spark.implicits._
    // src A: 'x y' ×3 (one cluster, 2 tokens) + 'a b c' ×1; src B: 'x y' ×1
    val d = Seq(
      (1L, "A", "x y"), (2L, "A", "x y"), (3L, "A", "x y"),
      (4L, "A", "a b c"), (5L, "B", "x y"))
      .toDF("doc_id", "source", "text")
    val got = DedupQueries.suppressionStats(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    // 'x y' cluster spans sources: n_copies = 4, weight 0.25 each
    assert(got("A") == ((4L, 2L, 1.75, 9L, 4.5)),   // 3·0.25 + 1 docs; 3·2·0.25 + 3 tokens
      s"A: ${got("A")}")
    assert(got("B") == ((1L, 1L, 0.25, 2L, 0.5)), s"B: ${got("B")}")
    // total effective docs across sources = number of distinct texts
    assert(got.values.map(_._3).sum == 2.0)
  }

  test("split leakage: holdout near-dup of a train doc is flagged, unique holdout is not (q142)") {
    import spark.implicits._
    // md5 first-hex split (q55 scheme): ids 4,6,7,9 -> train; 0,1,2,3,5,8 -> holdout
    val t = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (4L, t), (6L, t),                           // two train copies
      (5L, t),                                    // holdout near-dup -> leaked
      (8L, "one two three four five six seven"),  // unique holdout -> clean
      (7L, "eight nine ten eleven twelve"))       // unique train
      .toDF("doc_id", "text")
    val got = DedupQueries.splitLeakage(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
    assert(got.keySet == Set(5L), s"leaked set: ${got.keySet}")
    // witness is the lowest train id, full 8-slot agreement, both copies matched
    assert(got(5L) == ((4L, 8, 2L)), s"got ${got(5L)}")
  }

  test("minhash: identical texts -> identical signatures, est_jaccard 1.0") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank",
      2L -> "the quick brown fox jumps over the lazy dog near the river bank",
      3L -> "completely different words nothing shared at all here today friend ok")
    val sigs = DedupQueries.minhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhash est_jaccard tracks real shingle overlap") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = ((1 to 38).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val d = docs(1L -> base, 2L -> near)
    val sigs = DedupQueries.minhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val matching = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(matching >= DedupQueries.NumHashes / 2, s"matching=$matching") // true jaccard ~0.9
  }

  test("simhash: identical -> hamming 0; disjoint vocab -> large hamming") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight")
    val sh = DedupQueries.simhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 8)
  }

  test("dedupCorpus drops exact and near duplicates, keeps distinct docs") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val near = ((1 to 47).map(i => s"w$i") ++ Seq("x1", "x2", "x3")).mkString(" ")
    val other = (100 to 150).map(i => s"w$i").mkString(" ")
    val d = docs(
      1L -> base, 2L -> base, // exact dup pair
      3L -> near,             // near dup of 1
      4L -> other)            // distinct
    val survivors = DedupPipeline.dedupCorpus(d, estJaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 4L), s"survivors=$survivors")
  }

  test("clustered dedup applies transitive closure where greedy keeps hubs' spokes") {
    // hub shape: docs 1 and 2 each near-match hub 5 but not each other
    // (each shares a different half of 5's shingles)
    // token prefixes chosen so the seeded LSH finds BOTH spoke-hub pairs
    // (spoke-hub jaccard is only ~0.5; banding hit-rate ~0.9 per pair)
    val left = (1 to 30).map(i => s"aa$i").mkString(" ")
    val right = (1 to 30).map(i => s"bb$i").mkString(" ")
    val hub = ((1 to 30).map(i => s"aa$i") ++ (1 to 30).map(i => s"bb$i")).mkString(" ")
    val d = docs(1L -> left, 2L -> right, 5L -> hub)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // low threshold so BOTH ~0.5-jaccard spoke-hub pairs qualify (the
    // 16-slot estimate is deterministic but noisy; 0.3 lost one spoke)
    val greedy = ids(DedupPipeline.dedupCorpus(d, estJaccardThreshold = 0.2))
    val clustered = ids(DedupPipeline.dedupCorpusClustered(d, estJaccardThreshold = 0.2))
    assert(greedy == Set(1L, 2L), s"greedy=$greedy")
    assert(clustered == Set(1L), s"clustered=$clustered")
  }

  test("q214 simhash twin: hamming-0 pairs have identical distinct-token sets") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q214_simhash_twin")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty)
    assert(out.forall(_._3 <= 3))
    val zeros = out.filter(_._3 == 0)
    assert(zeros.nonEmpty, "no hamming-0 pairs — fixture exact dups missing")
    val tokSets = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // hamming 0 does NOT imply identical sets — SimHash is a similarity
    // sketch, and near-identical sets (e.g. 2 tokens of symmetric
    // difference out of 29 on this corpus) legitimately leave every vote
    // margin unflipped. The semantic pin is therefore a Jaccard FLOOR on
    // colliding pairs, plus the converse guarantee (identical sets MUST
    // collide at 0, which is exact by construction).
    zeros.foreach { case (a, b, _) =>
      val (sa, sb) = (tokSets(a).toSet, tokSets(b).toSet)
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j >= 0.7, s"pair ($a,$b) hamming 0 but token jaccard $j")
    }
    assert(zeros.exists { case (a, b, _) => tokSets(a) == tokSets(b) },
      "no identical-token-set pair at hamming 0")
  }

  test("q211 banding recall audit: high-j bands caught, low-j bands near theory") {
    val out = graft.SparkEntry.queries("q211_lsh_recall")(spark, sf001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // structural: counts consistent, recall is the rounded quotient
    out.foreach { case (lo, n, c, rec, exp) =>
      assert(c <= n, s"bucket $lo: caught $c > pairs $n")
      assert(math.abs(rec - math.floor(c.toDouble / n * 1e4 + 0.5) / 1e4) < 1e-12)
      assert(exp >= 0.0 && exp <= 1.0)
    }
    // the injected twins populate at least one band at j >= 0.7, and the
    // banding catches nearly all of that mass (the whole point of LSH)
    val high = out.filter(_._1 >= 0.7)
    assert(high.nonEmpty, "no high-j band — twin injection broken")
    val (hn, hc) = (high.map(_._2).sum, high.map(_._3).sum)
    assert(hc.toDouble / hn >= 0.9, s"high-j recall ${hc.toDouble / hn}")
    // the sub-0.2 mass must NOT be mostly caught (banding is selective)
    val low = out.filter(_._1 < 0.2)
    if (low.map(_._2).sum >= 20)
      assert(low.map(_._3).sum.toDouble / low.map(_._2).sum <= 0.3)
  }

  test("exact dedup groups identical documents (q40 logic)") {
    import spark.implicits._
    val dup = docs(1L -> "a b c", 2L -> "a b c", 3L -> "a b d")
    val grouped = dup.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(grouped == Map(1L -> 2L, 3L -> 1L))
  }
}
