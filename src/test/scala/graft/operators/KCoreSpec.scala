package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  // triangle {1,2,3} + pendant 4-1: degrees 1→3, 2→2, 3→2, 4→1
  private def fixture = {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("u", "v")
    (nodes, edges)
  }

  test("2-core keeps the triangle, peels the pendant in round 1") {
    val (nodes, edges) = fixture
    val got = KCore.decompose(nodes, edges, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L) == ((1, -1)) && got(2L) == ((1, -1)) && got(3L) == ((1, -1)), got.toSeq)
    assert(got(4L) == ((0, 1)), s"pendant must peel in round 1: ${got(4L)}")
  }

  test("3-core peel cascades: removing the periphery strips the hub next round") {
    val (nodes, edges) = fixture
    val got = KCore.decompose(nodes, edges, k = 3, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // round 1: 2, 3, 4 have degree < 3; round 2: 1 is then isolated
    assert(got(2L)._2 == 1 && got(3L)._2 == 1 && got(4L)._2 == 1, got.toSeq)
    assert(got(1L) == ((0, 2)), s"hub must cascade-peel in round 2: ${got(1L)}")
  }

  test("every converged core member keeps >= k neighbors inside the core (q151 graph)") {
    val d = graft.Tables.embeddings(spark, sf001).filter(col("vec_id") % 5 === 0)
    val rows = graft.registry.Registry.queries("q151_kcore")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = d.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = d.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val edges = a.join(b, col("id_a") < col("id_b"))
      .filter(graft.functions.Metrics.canonRound(
        graft.functions.VectorOps.cosine(col("va"), col("vb")), 6) > 0.25)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val core = rows.collect { case (v, 1) => v }.toSet
    val nb = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    core.foreach { v =>
      val inCore = nb.getOrElse(v, Set.empty).count(core)
      assert(inCore >= 3, s"core node $v has only $inCore core neighbors (k=3)")
    }
  }
}
