package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference union-find on the driver — the oracle for small graphs. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).filter { case (n, r) => n != r }.toMap
  }

  test("chain collapses to its minimum") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components plus isolated self-loop") {
    // self-loop (9,9) and duplicate/reversed edges must be tolerated
    val got = cc(Seq((10L, 11L), (11L, 10L), (3L, 7L), (7L, 5L), (9L, 9L), (3L, 7L)))
    assert(got == Map(11L -> 10L, 7L -> 3L, 5L -> 3L))
  }

  test("empty edge set yields empty assignment") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("random graph matches driver-side union-find") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    assert(cc(edges) == unionFind(edges))
  }

  test("long path converges within the round budget (log, not diameter)") {
    // a 200-node path has diameter 199: label propagation would need ~199
    // rounds; star-contraction must land well inside the default budget
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.size == 199 && got.values.forall(_ == 0L))
  }
}
