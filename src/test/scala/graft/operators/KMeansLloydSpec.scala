package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Metrics

class KMeansLloydSpec extends SparkSpec {

  test("every point is assigned to its nearest final-round centroid (id-tiebroken)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf001)
    val (assigned, centroids) = KMeansLloyd.fitDetailed(e, k = 8, rounds = 3)
    val got = assigned.collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getDouble(2))).toMap
    assert(got.size == e.count())
    // independent recomputation: rounded distance to every centroid
    val cdf = centroids.toDF("cid", "c")
    val best = e.select(col("vec_id"), graft.functions.VectorOps.asDouble(col("embedding")).as("emb"))
      .crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("cid"),
        Metrics.canonRound(call_function("graft_l2dist", col("emb"), col("c")), 6).as("d"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getDouble(2), r.getLong(1))).min // (d, cid) lexicographic
      }
    best.foreach { case (id, (d, cid)) =>
      val (gotCid, gotD) = got(id)
      assert(gotCid == cid && gotD == d,
        s"vec $id: assigned ($gotCid, $gotD) but nearest is ($cid, $d)")
    }
  }

  test("seeding takes the k lowest vec_ids even when ids are sparse, and rounds=0 is rejected") {
    val e = Tables.embeddings(spark, sf001)
      .withColumn("vec_id", col("vec_id") * 10 + 3) // non-contiguous, not 0-based
    val (_, centroids) = KMeansLloyd.fitDetailed(e, k = 4, rounds = 1)
    assert(centroids.map(_._1) == Seq(3L, 13L, 23L, 33L))
    intercept[IllegalArgumentException] { KMeansLloyd.fit(e, k = 4, rounds = 0) }
  }

  test("cluster count stays at most k and all seeds own themselves at round 0") {
    val e = Tables.embeddings(spark, sf001)
    val assigned = KMeansLloyd.fit(e, k = 8, rounds = 1)
    val byCluster = assigned.collect().groupBy(_.getInt(1))
    assert(byCluster.keySet.subsetOf((0 until 8).toSet))
    // round-1 assignment is against the seed vectors themselves: each
    // seed's distance to its own centroid is 0
    assigned.filter(col("vec_id") < 8).collect().foreach { r =>
      assert(r.getInt(1) == r.getLong(0).toInt && r.getDouble(2) == 0.0,
        s"seed ${r.getLong(0)} not at distance 0 of its own centroid")
    }
  }
}
