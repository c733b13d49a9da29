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

  test("IVF ANN recall@10 vs brute force is usable (nProbe=4 of 16 lists)") {
    val exact = topk("q50_knn_bruteforce")
    val ivf = topk("q53_ann_ivf")
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

  test("IVF results are a subset of the probed lists' exact cosines (no fabrication)") {
    val exact = topk("q50_knn_bruteforce")
    val ivf = topk("q53_ann_ivf")
    // every IVF hit that IS in the exact top-10 must appear in the same order
    ivf.foreach { case (q, hits) =>
      val inExact = hits.filter(exact(q).contains)
      assert(inExact == exact(q).filter(inExact.contains), s"order broken for probe $q")
    }
  }
}
