package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Triangle counting (q243): hand-worked graph, structural soundness of
  * every emitted triangle, and exactly-once coverage at sf0.001.
  */
class TriangleCountSpec extends SparkSpec {

  test("hand graph: one triangle plus a pendant edge") {
    import spark.implicits._
    // 1-2, 2-3, 1-3 close a triangle; 3-4 dangles
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val tri = TriangleCount.triangles(edges).collect()
    assert(tri.length == 1)
    // the triangle is reported from its orientation-smallest corner;
    // degrees are 2,2,3,1 so node 4 < 1 < 2 < 3 in (deg, id) order
    val r = tri.head
    assert(Set(r.getLong(0), r.getLong(1), r.getLong(2)) == Set(1L, 2L, 3L))
    val deg = TriangleCount.degrees(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(deg == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("every emitted corner triple is a real edge triangle, exactly once") {
    val li = Tables.lineitem(spark, sf001)
    val edges = TriangleCount.coPurchaseEdges(li).cache()
    val tri = TriangleCount.triangles(edges).cache()
    // no duplicate triangles under ANY corner ordering
    val canon = tri.select(
      least(col("a"), col("b"), col("c")).as("x"),
      greatest(col("a"), col("b"), col("c")).as("z"),
      (col("a") + col("b") + col("c")).as("s"))
    assert(canon.distinct().count() == tri.count())
    // each of the three corner pairs is an undirected edge
    def isEdge(l: String, r: String) = {
      val e = edges.select(
        least(col("u"), col("v")).as("p"), greatest(col("u"), col("v")).as("q"))
      tri.select(least(col(l), col(r)).as("p"), greatest(col(l), col(r)).as("q"))
        .join(e, Seq("p", "q"), "left_anti").count()
    }
    assert(isEdge("a", "b") == 0 && isEdge("a", "c") == 0 && isEdge("b", "c") == 0)
    edges.unpersist(); tri.unpersist()
  }

  test("report audit: corner sum is 3T and transitivity is bounded") {
    val out = TriangleCount.triangleReport(Tables.lineitem(spark, sf001)).cache()
    val r = out.select("n_triangles", "n_edges", "n_nodes", "transitivity").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    // the top-100 rows carry consistent local coefficients
    val bad = out.filter(col("local_cc") < 0 || col("local_cc") > 1).count()
    assert(bad == 0)
    out.unpersist()
  }
}
