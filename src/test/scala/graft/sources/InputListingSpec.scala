package graft.sources

import graft.SparkSpec

class InputListingSpec extends SparkSpec {

  test("list inventories every fixture table with its real size") {
    val got = InputListing.list(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    val expected = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(_ + ".parquet")
    expected.foreach { f =>
      assert(got.contains(f), s"missing $f in ${got.keys}")
      assert(got(f)._1 > 0 && !got(f)._2, s"$f: ${got(f)}")
    }
    // name-sorted determinism
    val names = InputListing.list(spark, sf001).collect().map(_.getString(0))
    assert(names.sorted.sameElements(names))
  }

  test("walk recurses and agrees with list on a flat directory") {
    val flat = InputListing.list(spark, sf001)
      .filter("not is_directory")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    val walked = InputListing.walk(spark, sf001)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(walked == flat)
  }
}
