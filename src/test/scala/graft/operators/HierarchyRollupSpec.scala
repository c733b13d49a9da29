package graft.operators

import graft.SparkSpec

class HierarchyRollupSpec extends SparkSpec {

  test("7-node heap rolls up exact subtree sizes, sums, and heights") {
    import spark.implicits._
    // perfect heap 0..6 with price = 10^k per node for exact sums
    (0L to 6L).map(k => (k, math.pow(10, k.toDouble)))
      .toDF("p_partkey", "p_retailprice")
      .createOrReplaceTempView("heap7")
    val got = spark.sql(HierarchyRollup.sql("heap7"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    assert(got(0L) == ((7L, 1111111.0, 2)))
    assert(got(1L) == ((3L, 11010.0, 1))) // 1 + its children 3,4
    assert(got(2L) == ((3L, 1100100.0, 1))) // 2,5,6 = 100+1e5+1e6
    assert(got(3L) == ((1L, 1000.0, 0)))
    assert(got(6L) == ((1L, 1000000.0, 0)))
  }

  test("q209 fixture rollup: root covers every part, leaves are singletons") {
    val out = graft.SparkEntry.queries("q209_hierarchy_rollup")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3))))
      .toMap
    assert(out(0L) == ((200L, 7))) // 200-node heap has depth ⌈log2⌉ = 7
    // every node appears as an ancestor of itself
    assert(out.size == 200)
    // a node in the last level is a leaf: subtree of exactly itself
    assert(out(199L) == ((1L, 0)))
    // internal consistency: child subtree counts sum to the parent's - 1
    (0L to 90L).foreach { k =>
      val kids = Seq(2 * k + 1, 2 * k + 2).filter(out.contains)
      assert(out(k)._1 == 1 + kids.map(out(_)._1).sum,
        s"node $k: ${out(k)} vs children $kids")
    }
  }
}
